"""From-scratch PNG subset codec (8-bit RGB, filters 0-4).

Engine-side decoder. Mirrors the reference's header-walk discipline:
 - chunk walk = tag's TLV frame loop (id3v2.go:234-400, mp4.go:86-136)
 - per-chunk CRC32 verification = OGG page CRC check (ogg.go:20-47)
 - declared-length bounded before allocation = readBytes guard (util.go:44-54)

Only the subset we emit is decoded: bit depth 8, color type 2 (RGB),
no interlace, no palette. Anything else is a structured DecodeError —
never an uncaught exception (cmd/check/main.go:154-159 lesson: a poison
record becomes a violation row, not a task failure).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


class DecodeError(ValueError):
    """Structured decode failure; message becomes the violation detail."""


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode(pixels: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode an (h, w, 3) uint8 array. Filter type 0 on every scanline."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("png.encode expects (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # one filter byte (0) prepended to each scanline, fully vectorized
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def read_header(data: bytes, max_pixels: int = 1 << 26) -> tuple[int, int]:
    """Parse IHDR only and return (w, h). Cheap dims probe (tag.Identify, id.go:9-81)."""
    if len(data) < 33 or not data.startswith(PNG_SIGNATURE):
        raise DecodeError("png: bad signature or short header")
    (length,) = struct.unpack_from(">I", data, 8)
    if data[12:16] != b"IHDR" or length != 13:
        raise DecodeError("png: first chunk is not a 13-byte IHDR")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack_from(">IIBBBBB", data, 16)
    if depth != 8 or ctype != 2 or comp != 0 or filt != 0 or interlace != 0:
        raise DecodeError(f"png: unsupported IHDR (depth={depth} ctype={ctype} interlace={interlace})")
    if w == 0 or h == 0 or w * h > max_pixels:
        raise DecodeError(f"png: dims {w}x{h} out of bounds")
    return int(w), int(h)


def _walk_chunks(data: bytes):
    """Yield (tag, payload) verifying length bounds and CRC per chunk."""
    pos = len(PNG_SIGNATURE)
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        end = pos + 8 + length
        if length > n or end + 4 > n:  # declared length beyond actual bytes
            raise DecodeError(f"png: chunk {tag!r} declared {length} bytes past EOF")
        payload = data[pos + 8 : end]
        (crc,) = struct.unpack_from(">I", data, end)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise DecodeError(f"png: CRC mismatch in {tag!r} chunk")
        yield tag, payload
        pos = end + 4
        if tag == b"IEND":
            return
    raise DecodeError("png: missing IEND")


def decode(data: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    """Full decode → (h, w, 3) uint8. Supports scanline filters 0-4."""
    w, h = read_header(data, max_pixels=max_pixels)
    idat = bytearray()
    for tag, payload in _walk_chunks(data):
        if tag == b"IDAT":
            idat += payload
    if not idat:
        raise DecodeError("png: no IDAT chunk")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise DecodeError(f"png: IDAT inflate failed: {e}") from None
    stride = 1 + w * 3
    if len(raw) != h * stride:
        raise DecodeError(f"png: inflated size {len(raw)} != expected {h * stride}")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    filters = rows[:, 0]
    out = np.empty((h, w * 3), dtype=np.uint8)
    if not filters.any():  # fast path: all filter 0 (what our encoder emits)
        out[:] = rows[:, 1:]
        return out.reshape(h, w, 3)
    bpp = 3
    for y in range(h):
        f = filters[y]
        cur = rows[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y > 0 else np.zeros(w * 3, np.int32)
        if f == 0:
            rec = cur
        elif f == 2:  # Up — vectorizes fully
            rec = (cur + prior) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth — sequential in x
            rec = np.zeros(w * 3, np.int32)
            for x in range(w * 3):
                a = rec[x - bpp] if x >= bpp else 0
                b = prior[x]
                if f == 1:
                    rec[x] = (cur[x] + a) & 0xFF
                elif f == 3:
                    rec[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prior[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc_) else (b if pb <= pc_ else c)
                    rec[x] = (cur[x] + pred) & 0xFF
        else:
            raise DecodeError(f"png: unknown filter {f} on scanline {y}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, 3)
