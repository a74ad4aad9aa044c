"""From-scratch binary PPM (P6) codec — the engine's "raw" lossless format.

Fixed-offset-style parse like the reference's ID3v1 trailer reader
(id3v1.go:45-110): tiny ASCII header, then raw bytes.
"""

from __future__ import annotations

import numpy as np

from tag_ray.codecs.png import DecodeError

MAGIC = b"P6"


def encode(pixels: np.ndarray) -> bytes:
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("ppm.encode expects (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def _parse_header(data: bytes) -> tuple[int, int, int]:
    """Return (w, h, payload_offset)."""
    if not data.startswith(MAGIC):
        raise DecodeError("ppm: bad magic")
    # header = magic, whitespace, w, whitespace, h, whitespace, maxval, single ws
    fields: list[int] = []
    i = 2
    n = len(data)
    while len(fields) < 3 and i < n:
        while i < n and data[i : i + 1].isspace():
            i += 1
        start = i
        while i < n and data[i : i + 1].isdigit():
            i += 1
        if i == start:
            raise DecodeError("ppm: malformed header")
        fields.append(int(data[start:i]))
    if len(fields) < 3 or i >= n:
        raise DecodeError("ppm: truncated header")
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise DecodeError(f"ppm: unsupported maxval {maxval}")
    return w, h, i


def read_header(data: bytes, max_pixels: int = 1 << 26) -> tuple[int, int]:
    w, h, _ = _parse_header(data)
    if w == 0 or h == 0 or w * h > max_pixels:
        raise DecodeError(f"ppm: dims {w}x{h} out of bounds")
    return w, h


def decode(data: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    w, h, off = _parse_header(data)
    if w == 0 or h == 0 or w * h > max_pixels:
        raise DecodeError(f"ppm: dims {w}x{h} out of bounds")
    need = w * h * 3
    if len(data) - off < need:  # declared size vs actual bytes (util.go:47-62)
        raise DecodeError(f"ppm: payload {len(data) - off} bytes < declared {need}")
    return np.frombuffer(data, dtype=np.uint8, count=need, offset=off).reshape(h, w, 3)
