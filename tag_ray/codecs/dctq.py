"""DCTQ — a from-scratch toy lossy format exercising the PSNR≥40dB path.

Layout: magic ``DCQ1`` | u32le w | u32le h | u8 qstep | zlib(int16le
coefficients). Per 8x8 block, per RGB channel: orthonormal DCT-II,
uniform quantization by ``qstep/4``.

This is the engine's stand-in for a real lossy codec: its decode result
is *close to* but not byte-identical with the source pixels, so the
decode-invariant check must use PSNR, mirroring the reference's
"payload identity independent of wrapper" Sum semantics (sum.go:14-44)
with a tolerance instead of exact SHA-1 equality.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from tag_ray.codecs.png import DecodeError

MAGIC = b"DCQ1"
_B = 8  # block size


def _dct_matrix(n: int = _B, dtype=np.float64) -> np.ndarray:
    k = np.arange(n, dtype=dtype)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m *= np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_D64 = _dct_matrix(dtype=np.float64)
_D32 = _dct_matrix(dtype=np.float32)


def _pad(pixels: np.ndarray) -> np.ndarray:
    h, w = pixels.shape[:2]
    ph, pw = (-h) % _B, (-w) % _B
    if ph or pw:
        pixels = np.pad(pixels, ((0, ph), (0, pw), (0, 0)), mode="edge")
    return pixels


def _blockify(ch: np.ndarray) -> np.ndarray:
    """(H, W) → (nby, nbx, 8, 8) without copying row data twice."""
    H, W = ch.shape
    return ch.reshape(H // _B, _B, W // _B, _B).transpose(0, 2, 1, 3)


def _unblockify(blocks: np.ndarray) -> np.ndarray:
    nby, nbx = blocks.shape[:2]
    return blocks.transpose(0, 2, 1, 3).reshape(nby * _B, nbx * _B)


def encode(pixels: np.ndarray, qstep: int = 4) -> bytes:
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("dctq.encode expects (h, w, 3) uint8")
    if not 1 <= qstep <= 255:
        raise ValueError("qstep must be in [1, 255]")
    h, w = pixels.shape[:2]
    padded = _pad(pixels).astype(np.float64) - 128.0
    step = qstep / 4.0
    coeffs = []
    for c in range(3):
        blocks = _blockify(padded[:, :, c])
        # forward DCT per block: D @ B @ Dᵀ, broadcast over (nby, nbx)
        f = (_D64 @ blocks) @ _D64.T
        coeffs.append(np.round(f / step).astype(np.int16))
    payload = np.stack(coeffs).tobytes()  # (3, nby, nbx, 8, 8) int16 native LE
    return MAGIC + struct.pack("<IIB", w, h, qstep) + zlib.compress(payload, 6)


def read_header(data: bytes, max_pixels: int = 1 << 26) -> tuple[int, int]:
    if len(data) < 13 or not data.startswith(MAGIC):
        raise DecodeError("dctq: bad magic or short header")
    w, h, qstep = struct.unpack_from("<IIB", data, 4)
    if w == 0 or h == 0 or w * h > max_pixels or qstep == 0:
        raise DecodeError(f"dctq: header out of bounds (w={w} h={h} q={qstep})")
    return int(w), int(h)


def _decode_with(data: bytes, dct: np.ndarray, max_pixels: int) -> np.ndarray:
    w, h = read_header(data, max_pixels=max_pixels)
    qstep = data[12]
    try:
        payload = zlib.decompress(data[13:])
    except zlib.error as e:
        raise DecodeError(f"dctq: inflate failed: {e}") from None
    nby, nbx = (h + _B - 1) // _B, (w + _B - 1) // _B
    need = 3 * nby * nbx * _B * _B * 2
    if len(payload) != need:
        raise DecodeError(f"dctq: payload {len(payload)} bytes != declared {need}")
    q = np.frombuffer(payload, dtype=np.int16).reshape(3, nby, nbx, _B, _B)
    step = dct.dtype.type(qstep / 4.0)
    f = q.astype(dct.dtype) * step
    # inverse DCT for all 3 channels at once: Dᵀ @ F @ D broadcast over
    # (3, nby, nbx) — measured 10-25× faster than the einsum equivalent
    blocks = (dct.T @ f) @ dct
    out = np.empty((nby * _B, nbx * _B, 3), dtype=dct.dtype)
    for c in range(3):
        out[:, :, c] = _unblockify(blocks[c])
    return np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)[:h, :w]


def decode(data: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    """Engine decoder: float32 IDCT."""
    return _decode_with(data, _D32, max_pixels)


def decode_reference(data: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    """Independent reference decoder: float64 IDCT (different arithmetic path)."""
    return _decode_with(data, _D64, max_pixels)
