"""From-scratch 24-bit uncompressed BMP codec (BITMAPINFOHEADER).

Little-endian struct header parse, analogous to the reference's OGG page
header (ogg.go:49-58) and LE readers (util.go:96-102).
"""

from __future__ import annotations

import struct

import numpy as np

from tag_ray.codecs.png import DecodeError

MAGIC = b"BM"
_HEADER = 14 + 40  # file header + BITMAPINFOHEADER


def _row_stride(w: int) -> int:
    return (w * 3 + 3) & ~3  # rows padded to 4 bytes


def encode(pixels: np.ndarray) -> bytes:
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("bmp.encode expects (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    stride = _row_stride(w)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    size = _HEADER + h * stride
    file_hdr = struct.pack("<2sIHHI", MAGIC, size, 0, 0, _HEADER)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, h * stride, 2835, 2835, 0, 0)
    return file_hdr + info_hdr + rows.tobytes()


def read_header(data: bytes, max_pixels: int = 1 << 26) -> tuple[int, int]:
    if len(data) < _HEADER or not data.startswith(MAGIC):
        raise DecodeError("bmp: bad magic or short header")
    off, hdr_size, w, h, planes, bpp, compression = struct.unpack_from("<IIiiHHI", data, 10)
    if hdr_size != 40 or bpp != 24 or compression != 0 or planes != 1:
        raise DecodeError(f"bmp: unsupported (hdr={hdr_size} bpp={bpp} comp={compression})")
    if w <= 0 or h <= 0 or w * h > max_pixels:
        raise DecodeError(f"bmp: dims {w}x{h} out of bounds")
    return int(w), int(h)


def decode(data: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    w, h = read_header(data, max_pixels=max_pixels)
    (off,) = struct.unpack_from("<I", data, 10)
    stride = _row_stride(w)
    need = h * stride
    if len(data) - off < need:
        raise DecodeError(f"bmp: payload {len(data) - off} bytes < declared {need}")
    rows = np.frombuffer(data, dtype=np.uint8, count=need, offset=off).reshape(h, stride)
    return rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1].copy()  # BGR bottom-up → RGB
