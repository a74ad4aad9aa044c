"""Independent reference decoders — the second opinion for the decode invariant.

The reference repo checks payload identity two independent ways: a full
parse (``tag.ReadFrom``) and a metadata-skipping checksum (``tag.Sum``,
sum.go:14-44). The engine mirrors that two-sided discipline: every
format has an *engine* decoder (fast, vectorized — codecs/{png,ppm,bmp,
dctq}.py) and this module's *reference* decoder, written independently
(scalar loops / different arithmetic), so a bug in one implementation
surfaces as a ``decode_invariant`` violation rather than passing
silently. Slow is fine: these also run per-row only inside the
validation kernel.
"""

from __future__ import annotations

import re
import struct
import zlib

import numpy as np

from tag_ray.codecs.png import PNG_SIGNATURE, DecodeError
from tag_ray.codecs import dctq as _dctq


def decode_png(data: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    """Scalar per-pixel PNG decoder (filters 0-4), int arithmetic throughout."""
    if data[:8] != PNG_SIGNATURE:
        raise DecodeError("ref-png: bad signature")
    pos, w, h, idat = 8, None, None, b""
    while pos + 12 <= len(data):
        length, tag = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise DecodeError("ref-png: truncated chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise DecodeError("ref-png: crc mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", body, 0)
            if depth != 8 or ctype != 2:
                raise DecodeError("ref-png: unsupported format")
            if w == 0 or h == 0 or w * h > max_pixels:
                raise DecodeError("ref-png: dims out of bounds")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise DecodeError("ref-png: missing IHDR/IDAT")
    raw = zlib.decompress(idat)
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise DecodeError("ref-png: bad inflated size")
    if all(raw[y * (stride + 1)] == 0 for y in range(h)):
        # all scanlines filter 0: slice per scanline and stack (distinct route
        # from the engine's single reshape — still an independent code path)
        lines = [raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)] for y in range(h)]
        return np.stack([np.frombuffer(ln, dtype=np.uint8) for ln in lines]).reshape(h, w, 3)
    out = bytearray(h * stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        base = y * stride
        for x in range(stride):
            a = out[base + x - 3] if x >= 3 else 0
            b = out[base - stride + x] if y > 0 else 0
            c = out[base - stride + x - 3] if (y > 0 and x >= 3) else 0
            if f == 0:
                v = line[x]
            elif f == 1:
                v = line[x] + a
            elif f == 2:
                v = line[x] + b
            elif f == 3:
                v = line[x] + ((a + b) >> 1)
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                v = line[x] + (a if (pa <= pb and pa <= pc) else (b if pb <= pc else c))
            else:
                raise DecodeError("ref-png: unknown filter")
            out[base + x] = v & 0xFF
    return np.frombuffer(bytes(out), dtype=np.uint8).reshape(h, w, 3)


_PPM_HDR = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")


def decode_ppm(data: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    m = _PPM_HDR.match(data)
    if not m:
        raise DecodeError("ref-ppm: bad header")
    w, h, maxval = (int(g) for g in m.groups())
    if maxval != 255 or w == 0 or h == 0 or w * h > max_pixels:
        raise DecodeError("ref-ppm: unsupported header values")
    body = data[m.end() :]
    if len(body) < w * h * 3:
        raise DecodeError("ref-ppm: short payload")
    return np.frombuffer(body[: w * h * 3], dtype=np.uint8).reshape(h, w, 3).copy()


def decode_bmp(data: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    if data[:2] != b"BM" or len(data) < 54:
        raise DecodeError("ref-bmp: bad magic")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h <= 0 or w * h > max_pixels:
        raise DecodeError("ref-bmp: unsupported format")
    stride = ((w * 3 + 3) // 4) * 4
    if len(data) - off < h * stride:
        raise DecodeError("ref-bmp: short payload")
    out = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        row = data[off + y * stride : off + y * stride + w * 3]
        px = np.frombuffer(row, dtype=np.uint8).reshape(w, 3)
        out[h - 1 - y] = px[:, ::-1]  # bottom-up BGR → top-down RGB
    return out


def decode_dctq(data: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    return _dctq.decode_reference(data, max_pixels=max_pixels)
