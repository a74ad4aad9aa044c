"""RIFF/WAVE PCM parser — real byte-level audio decode, stdlib-only.

The audio-side analogue of the reference's block-walk discipline:
FLAC's {type, 24-bit len} metadata-block iteration
(/root/reference/flac.go:28-85) and the MP4 size+name atom walk
(/root/reference/mp4.go:86-136) become the RIFF chunk walk here —
fixed magic, little-endian size-prefixed chunks, skip-unknown-by-seek,
and EVERY declared length is bounds-checked before use (the 10 MB
up-front-allocation guard, /root/reference/util.go:44-54).

Supported: PCM (format tag 1) at 8-bit unsigned / 16-bit signed /
32-bit signed, and IEEE float32 (format tag 3), mono or interleaved
multi-channel. Anything else raises ``DecodeError`` — a violation row
upstream, never a task failure.
"""

from __future__ import annotations

import struct

import numpy as np

from tag_ray.codecs import DecodeError

MAX_CHUNK_BYTES = 10 * 1024 * 1024  # util.go:45 semantic: bound before trust

_FMT_PCM = 1
_FMT_IEEE_FLOAT = 3

_DTYPES = {
    (_FMT_PCM, 8): np.uint8,
    (_FMT_PCM, 16): np.dtype("<i2"),
    (_FMT_PCM, 32): np.dtype("<i4"),
    (_FMT_IEEE_FLOAT, 32): np.dtype("<f4"),
}


def read_header(data: bytes) -> dict:
    """Walk the RIFF chunks; return {sample_rate, n_channels,
    bits_per_sample, format_tag, n_samples, data_offset, data_len}
    without touching the sample payload (header-only, like
    codecs.<fmt>.read_header for images)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise DecodeError("not a RIFF/WAVE stream")
    riff_len = struct.unpack_from("<I", data, 4)[0]
    if riff_len + 8 > len(data) + 1:  # +1: some writers round oddly
        raise DecodeError(
            f"RIFF declares {riff_len + 8}B but stream has {len(data)}B")
    pos = 12
    fmt = None
    data_off = data_len = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        clen = struct.unpack_from("<I", data, pos + 4)[0]
        if clen > MAX_CHUNK_BYTES:
            raise DecodeError(f"chunk {cid!r} declares {clen}B "
                              f"(> {MAX_CHUNK_BYTES}B guard)")
        body = pos + 8
        if body + clen > len(data):
            raise DecodeError(f"chunk {cid!r} overruns stream "
                              f"({body + clen} > {len(data)})")
        if cid == b"fmt ":
            if clen < 16:
                raise DecodeError(f"fmt chunk too short ({clen}B)")
            tag, ch, rate, _byte_rate, block_align, bits = \
                struct.unpack_from("<HHIIHH", data, body)
            fmt = {"format_tag": tag, "n_channels": ch, "sample_rate": rate,
                   "bits_per_sample": bits, "block_align": block_align}
        elif cid == b"data":
            data_off, data_len = body, clen
        pos = body + clen + (clen & 1)  # RIFF pads chunks to even length
    if fmt is None:
        raise DecodeError("no fmt chunk")
    if data_off is None:
        raise DecodeError("no data chunk")
    if fmt["n_channels"] < 1:
        raise DecodeError("fmt declares 0 channels")
    if fmt["sample_rate"] < 1:
        raise DecodeError("fmt declares 0 sample rate")
    key = (fmt["format_tag"], fmt["bits_per_sample"])
    if key not in _DTYPES:
        raise DecodeError(
            f"unsupported format tag {fmt['format_tag']} at "
            f"{fmt['bits_per_sample']} bits")
    bytes_per_frame = fmt["n_channels"] * fmt["bits_per_sample"] // 8
    if bytes_per_frame == 0:
        raise DecodeError("zero-byte frame")
    fmt["n_samples"] = data_len // bytes_per_frame
    fmt["data_offset"] = data_off
    fmt["data_len"] = data_len
    return fmt


def decode(data: bytes) -> tuple[np.ndarray, int]:
    """→ (pcm float32 in [-1, 1] of shape (n_samples, n_channels),
    sample_rate)."""
    h = read_header(data)
    dt = _DTYPES[(h["format_tag"], h["bits_per_sample"])]
    n_vals = h["n_samples"] * h["n_channels"]
    raw = np.frombuffer(data, dtype=dt, count=n_vals,
                        offset=h["data_offset"])
    if h["format_tag"] == _FMT_IEEE_FLOAT:
        pcm = raw.astype(np.float32)
    elif h["bits_per_sample"] == 8:         # unsigned, midpoint 128
        pcm = (raw.astype(np.float32) - 128.0) / 128.0
    else:                                    # signed int16/int32
        pcm = raw.astype(np.float32) / float(1 << (h["bits_per_sample"] - 1))
    return pcm.reshape(h["n_samples"], h["n_channels"]), h["sample_rate"]


def encode(pcm: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """float [-1, 1] (n_samples,) or (n_samples, n_channels) → WAV bytes
    (PCM). The test-side synthesizer for round-trip gates — mirrors the
    reference corpora's 'same logical content, every format' recipe."""
    pcm = np.atleast_2d(np.asarray(pcm, dtype=np.float64))
    if pcm.shape[0] == 1 and pcm.ndim == 2 and pcm.size == pcm.shape[1]:
        pcm = pcm.T  # (n,) came in as (1, n)
    n, ch = pcm.shape
    if bits == 16:
        raw = np.clip(np.round(pcm * (1 << 15)), -(1 << 15),
                      (1 << 15) - 1).astype("<i2").tobytes()
    elif bits == 8:
        raw = np.clip(np.round(pcm * 128.0 + 128.0), 0, 255) \
            .astype(np.uint8).tobytes()
    else:
        raise DecodeError(f"encode supports 8/16 bits, got {bits}")
    block_align = ch * bits // 8
    fmt = struct.pack("<HHIIHH", _FMT_PCM, ch, sample_rate,
                      sample_rate * block_align, block_align, bits)
    chunks = b"".join([
        b"fmt ", struct.pack("<I", len(fmt)), fmt,
        b"data", struct.pack("<I", len(raw)), raw,
        b"" if len(raw) % 2 == 0 else b"\0",
    ])
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
