"""Codec registry + magic-byte sniffing.

The registry is the engine's analogue of the reference's format dispatch
table (``tag.ReadFrom``'s sniff switch, tag.go:41-56, and ``Identify``,
id.go:9-81): a static magic-prefix table consulted per row, plus
per-format encode / header-probe / decode / reference-decode entries.
Module-level constants are loaded once per Ray worker process — the same
posture as the reference's package-level lookup tables
(SURVEY.md §2.3 T1); no actor state needed for dispatch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

from tag_ray.codecs import bmp, dctq, png, ppm, reference
from tag_ray.codecs.png import DecodeError
from tag_ray.codecs.phash import hamming64, phash64, phash_bands

__all__ = [
    "CODECS", "MAGIC_TABLE", "LOSSLESS", "DecodeError",
    "TRAILER_MAGIC", "TRAILER_LEN", "split_trailer",
    "identify", "encode", "decode", "decode_reference", "read_header",
    "phash64", "hamming64", "phash_bands", "psnr",
]


@dataclass(frozen=True)
class Codec:
    fmt: str
    magic: bytes
    lossless: bool
    encode: Callable[..., bytes]
    read_header: Callable[..., tuple[int, int]]
    decode: Callable[..., np.ndarray]
    decode_reference: Callable[..., np.ndarray]


CODECS: dict[str, Codec] = {
    "png": Codec("png", png.PNG_SIGNATURE, True, png.encode, png.read_header,
                 png.decode, reference.decode_png),
    "ppm": Codec("ppm", ppm.MAGIC, True, ppm.encode, ppm.read_header,
                 ppm.decode, reference.decode_ppm),
    "bmp": Codec("bmp", bmp.MAGIC, True, bmp.encode, bmp.read_header,
                 bmp.decode, reference.decode_bmp),
    "dctq": Codec("dctq", dctq.MAGIC, False, dctq.encode, dctq.read_header,
                  dctq.decode, reference.decode_dctq),
}

# longest-prefix-first so PNG's 8-byte signature wins over shorter magics
MAGIC_TABLE: list[tuple[bytes, str]] = sorted(
    ((c.magic, c.fmt) for c in CODECS.values()), key=lambda kv: -len(kv[0])
)
MAX_MAGIC_LEN = max(len(m) for m, _ in MAGIC_TABLE)
LOSSLESS = frozenset(c.fmt for c in CODECS.values() if c.lossless)


# Trailing annotation block: fixed 128 bytes at EOF starting with the
# trailer magic — the engine's ID3v1 analogue (a 128-byte "TAG" trailer
# probed at EOF-128, /root/reference/id.go:60-81). Payload identity is
# metadata-invariant: decode/phash operate on the payload with the
# trailer stripped (the sum.go:117-134 "hash everything except the last
# 128 bytes" semantic).
TRAILER_MAGIC = b"TAGR"
TRAILER_LEN = 128


def split_trailer(data: bytes | None) -> tuple[bytes | None, bytes | None]:
    """(payload, trailer-or-None). A trailer is exactly the last 128
    bytes when they start with ``TRAILER_MAGIC`` and a NON-EMPTY payload
    precedes them (strict ``>`` length check, so a 128-byte pure-trailer
    cell is not mistaken for an empty payload with annotation; payload
    magic validity is the caller's concern — checks/row_checks.py judges
    the stripped payload on its own)."""
    if data is not None and len(data) > TRAILER_LEN \
            and data[-TRAILER_LEN:][:len(TRAILER_MAGIC)] == TRAILER_MAGIC:
        return data[:-TRAILER_LEN], data[-TRAILER_LEN:]
    return data, None


def identify(data: bytes | None, probe_eof: bool = False) -> str | None:
    """Magic-byte classification only (no parse) — tag.Identify (id.go:9-81).

    A trailing annotation block does not change a RECOGNIZED format:
    the trailer sits at EOF, so the payload's prefix IS the data's
    prefix and one prefix scan covers both. ``probe_eof=True`` adds the
    reference's second probe (id.go:60-81 checks "TAG" at EOF-128 when
    the prefix matches nothing): a cell whose prefix is unrecognized
    but which ends in a valid 128-byte ``TAGR`` trailer classifies as
    ``"tagr"`` — annotation-only, payload format unknown — instead of
    None. Off by default so format checks keep treating such cells as
    unidentified payloads."""
    if not data:
        return None
    for magic, fmt in MAGIC_TABLE:
        if data[: len(magic)] == magic:
            return fmt
    if probe_eof and split_trailer(data)[1] is not None:
        return "tagr"
    return None


def encode(fmt: str, pixels: np.ndarray, **kw) -> bytes:
    return CODECS[fmt].encode(pixels, **kw)


def read_header(fmt: str, data: bytes, max_pixels: int = 1 << 26) -> tuple[int, int]:
    return CODECS[fmt].read_header(data, max_pixels=max_pixels)


def decode(fmt: str, data: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    return CODECS[fmt].decode(data, max_pixels=max_pixels)


def decode_reference(fmt: str, data: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    return CODECS[fmt].decode_reference(data, max_pixels=max_pixels)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 pixel arrays.

    inf when identical — lossless formats must hit inf, lossy must clear
    the configured floor (EngineConfig.psnr_min_db, default 40 dB).
    """
    if a.shape != b.shape:
        return float("-inf")
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0.0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))
