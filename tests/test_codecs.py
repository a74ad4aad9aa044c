"""Codec unit tests — edge tables per kernel, mirroring the reference's
operator unit tests (util_test.go:12-120, id3v2_test.go:13-155)."""

from __future__ import annotations

import numpy as np
import pytest

from tag_ray import codecs
from tag_ray.codecs import DecodeError
from tag_ray.codecs.phash import hamming64, phash_bands

RNG = np.random.default_rng(7)
SHAPES = [(1, 1), (7, 5), (16, 16), (33, 47), (64, 31)]


@pytest.mark.parametrize("fmt", list(codecs.CODECS))
@pytest.mark.parametrize("shape", SHAPES)
def test_roundtrip(fmt, shape):
    px = RNG.integers(0, 256, (*shape, 3), dtype=np.uint8)
    data = codecs.encode(fmt, px)
    assert codecs.identify(data) == fmt
    assert codecs.read_header(fmt, data) == (shape[1], shape[0])
    dec = codecs.decode(fmt, data)
    ref = codecs.decode_reference(fmt, data)
    assert dec.shape == px.shape
    if fmt in codecs.LOSSLESS:
        assert (dec == px).all()
        assert (ref == px).all()
    else:
        assert codecs.psnr(dec, px) >= 40.0
    # engine and independent reference decoder must agree (exactly or >=40dB)
    assert codecs.psnr(dec, ref) >= 40.0


@pytest.mark.parametrize("fmt", list(codecs.CODECS))
def test_truncated_raises_decode_error_not_crash(fmt):
    px = RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = codecs.encode(fmt, px)
    for cut in [3, 10, len(data) // 2, len(data) - 1]:
        with pytest.raises(DecodeError):
            codecs.decode(fmt, data[:cut])


@pytest.mark.parametrize("junk", [b"", b"\x00", b"not an image", b"P6 oops"])
def test_garbage_bytes(junk):
    fmt = codecs.identify(junk)
    if fmt is not None:  # magic matched — decode must fail cleanly
        with pytest.raises(DecodeError):
            codecs.decode(fmt, junk)


def test_dims_guard():
    """Declared 2^60 pixels must be rejected before allocation
    (the util.go:44-54 up-front-allocation guard carried over)."""
    from tag_ray.fixtures import _huge_dims_bytes

    for fmt in codecs.CODECS:
        data = _huge_dims_bytes(fmt)
        with pytest.raises(DecodeError):
            codecs.read_header(fmt, data, max_pixels=1 << 26)


def test_png_crc_verification():
    px = RNG.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    data = bytearray(codecs.encode("png", px))
    data[40] ^= 0xFF  # flip a byte inside IDAT → CRC mismatch
    with pytest.raises(DecodeError, match="CRC"):
        codecs.decode("png", bytes(data))


def test_png_filters_all_types():
    """Decoder must handle filters 1-4 even though our encoder emits 0."""
    import struct
    import zlib

    from tag_ray.codecs.png import PNG_SIGNATURE, _chunk

    px = RNG.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    for ftype in (1, 2, 3, 4):
        # build scanlines with the chosen filter applied
        raw = bytearray()
        prev = np.zeros(4 * 3, np.int32)
        for y in range(5):
            cur = px[y].reshape(-1).astype(np.int32)
            line = np.zeros_like(cur)
            for x in range(12):
                a = cur[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                if ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                line[x] = (cur[x] - pred) & 0xFF
            raw.append(ftype)
            raw.extend(line.astype(np.uint8).tobytes())
            prev = cur
        ihdr = struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0)
        data = (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(bytes(raw)))
                + _chunk(b"IEND", b""))
        out = codecs.decode("png", data)
        ref = codecs.decode_reference("png", data)
        assert (out == px).all(), f"engine filter {ftype}"
        assert (ref == px).all(), f"reference filter {ftype}"


def test_phash_properties():
    px = RNG.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    h1 = codecs.phash64(px)
    assert h1 == codecs.phash64(px)  # deterministic
    near = np.clip(px.astype(np.int16) + 2, 0, 255).astype(np.uint8)
    far = RNG.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    d_near = hamming64(np.array([h1]), np.array([codecs.phash64(near)]))[0]
    d_far = hamming64(np.array([h1]), np.array([codecs.phash64(far)]))[0]
    assert d_near <= 4
    assert d_far > 10


def test_phash_bands_pigeonhole():
    h = np.int64(0x0123456789ABCDEF)
    flipped = np.int64(h ^ 0b101)  # 2 bit flips in band 0
    b1, b2 = phash_bands(np.array([h])), phash_bands(np.array([flipped]))
    assert (b1[0] == b2[0]).sum() >= 2  # >= n_bands - d bands intact


def test_hamming_vectorized():
    a = np.array([0, -1, 0x0F], dtype=np.int64)
    b = np.array([0, 0, 0x00], dtype=np.int64)
    assert hamming64(a, b).tolist() == [0, 64, 4]


def test_trailer_metadata_invariance():
    """A 128-byte TAGR trailer (the ID3v1-at-EOF analogue, id.go:60-81)
    must not change identification, decode, or the payload phash — the
    sum.go 'payload identity is metadata-invariant' semantic."""
    import pyarrow as pa

    from tag_ray import codecs
    from tag_ray.checks.row_checks import validate_batch

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    data = codecs.encode("png", px)
    trailer = codecs.TRAILER_MAGIC + b"note=hello" \
        + b"\x00" * (codecs.TRAILER_LEN - 14)
    assert len(trailer) == codecs.TRAILER_LEN
    wrapped = data + trailer

    assert codecs.identify(wrapped) == "png"
    payload, tr = codecs.split_trailer(wrapped)
    assert payload == data and tr == trailer
    assert codecs.split_trailer(data) == (data, None)

    # end-to-end: a trailer-annotated valid row produces NO violations
    ph = codecs.phash64(codecs.decode("png", data))
    batch = pa.Table.from_pydict({
        "image_id": ["t1"], "bytes": [wrapped],
        "w": pa.array([24], pa.int32()), "h": pa.array([24], pa.int32()),
        "fmt": ["png"], "caption": ["c"],
        "phash": pa.array([ph], pa.int64()),
        "partition_id": pa.array([0], pa.int32()),
    })
    out = validate_batch(batch)
    assert out.num_rows == 0, out.to_pydict()


def test_identify_eof_probe():
    """M2 parity: the reference's Identify falls back to an EOF-128
    probe when no prefix matches (id.go:60-81). With probe_eof=True an
    unrecognized payload carrying a valid TAGR trailer classifies as
    'tagr'; the default prefix-only behavior is unchanged."""
    from tag_ray import codecs

    junk = b"\xde\xad\xbe\xef" * 8
    trailer = codecs.TRAILER_MAGIC \
        + b"\x00" * (codecs.TRAILER_LEN - len(codecs.TRAILER_MAGIC))
    tagged = junk + trailer

    assert codecs.identify(tagged) is None              # default: prefix only
    assert codecs.identify(tagged, probe_eof=True) == "tagr"
    assert codecs.identify(junk, probe_eof=True) is None  # no trailer
    # recognized prefixes always win over the trailer probe
    png = codecs.encode("png", np.zeros((4, 4, 3), np.uint8))
    assert codecs.identify(png + trailer, probe_eof=True) == "png"
    # a pure 128-byte trailer is NOT an annotated payload (empty payload)
    assert codecs.identify(trailer, probe_eof=True) is None
