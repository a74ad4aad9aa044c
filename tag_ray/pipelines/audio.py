"""Paged-audio validation pipeline over the OGG container codec.

The distributed analogue of the reference's OGG path — page CRC
verification and cross-page packet reassembly as a STREAMING Ray Data
stage (/root/reference/ogg.go:60-134 behavior; implementation from the
public RFC 3533 spec in tag_ray/codecs/oggp.py). The corpus is
synthesized deterministically per scale factor (seeded per-row, no
external data), with planted corruption classes so the validator's
violation taxonomy is pinned:

  id % 10 == 3   payload byte flipped, CRC left stale  → crc_mismatch
  id % 10 == 6   stream cut mid-page                   → truncated
  id % 10 == 9   capture pattern overwritten           → not_ogg
  otherwise                                             → ok

Generation and validation run as ONE streaming pipeline
(range → map_batches(synth) → map_batches(AudioPageValidate)) — blobs
never materialize, and the validator is an actor pool so per-process
state (the module CRC table import) is paid once per actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

_SF_AUDIO_ROWS = {"sf0.001": 240, "sf0.01": 800, "sf0.1": 3000}


def _sf_rows(sf_dir: str) -> int:
    import os

    return _SF_AUDIO_ROWS.get(
        os.path.basename(os.path.normpath(sf_dir)), 240)


def synth_blob(audio_id: int) -> bytes:
    """Deterministic per-id paged-audio blob (possibly corrupted)."""
    from tag_ray.codecs import oggp

    rng = np.random.default_rng(9000 + audio_id)
    n = int(rng.integers(800, 4000))
    ch = int(rng.integers(1, 3))
    rate = int(rng.choice([8000, 16000, 22050]))
    t = np.arange(n)[:, None]
    freq = rng.uniform(80, 2000, ch)[None, :]
    pcm = (6000 * np.sin(2 * np.pi * freq * t / rate)
           + rng.normal(0, 300, (n, ch))).astype(np.int16)
    blob = bytearray(oggp.encode_audio(
        pcm, rate, {"id": str(audio_id), "lang": "en"},
        page_payload=1500))
    mode = audio_id % 10
    if mode == 3:       # stale CRC: flip a byte inside page 0's payload
        # (a fixed tail offset can land in a lacing table and read as a
        # structural overrun instead of a CRC mismatch)
        body_off = 27 + blob[26]
        blob[body_off + 2] ^= 0x55
    elif mode == 6:     # truncated mid-page
        del blob[len(blob) // 2:]
    elif mode == 9:     # not an OGG stream at all
        blob[:4] = b"JUNK"
    return bytes(blob)


_OUT_SCHEMA = pa.schema([
    ("audio_id", pa.int64()), ("status", pa.string()),
    ("n_packets", pa.int64()), ("n_samples", pa.int64()),
    ("n_channels", pa.int64()), ("sample_rate", pa.int64()),
    ("duration_us", pa.int64()), ("n_comments", pa.int64()),
])


class AudioPageValidate:
    """Actor-pool stage: parse pages, verify CRCs, reassemble packets,
    classify failures. DecodeError ⇒ a violation row, never a task
    failure (the engine-wide codec discipline)."""

    def __init__(self):
        from tag_ray.codecs import oggp  # CRC table built once per actor

        self._oggp = oggp

    def __call__(self, batch: pa.Table) -> pa.Table:
        from tag_ray.codecs import DecodeError

        ids = batch["audio_id"].to_numpy(zero_copy_only=False)
        cols: dict[str, list] = {name: [] for name in _OUT_SCHEMA.names}
        for aid, blob in zip(ids, batch["bytes"].to_pylist()):
            row = {"audio_id": int(aid), "status": "ok", "n_packets": 0,
                   "n_samples": 0, "n_channels": 0, "sample_rate": 0,
                   "duration_us": 0, "n_comments": 0}
            try:
                out = self._oggp.parse_audio(blob)
                row.update(
                    n_packets=out["n_packets"],
                    n_samples=int(len(out["pcm"])),
                    n_channels=out["n_channels"],
                    sample_rate=out["sample_rate"],
                    duration_us=out["duration_us"],
                    n_comments=len(out["comments"]))
            except DecodeError as e:
                msg = str(e)
                row["status"] = (
                    "crc_mismatch" if "crc mismatch" in msg
                    else "not_ogg" if "capture pattern" in msg
                    else "truncated")
            for k, v in row.items():
                cols[k].append(v)
        return pa.Table.from_pydict(cols, schema=_OUT_SCHEMA)


def audio_ogg_validate(sf_dir: str) -> rd.Dataset:
    """Per-file page-validation rows over the deterministic corpus."""
    n = _sf_rows(sf_dir)

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "audio_id": pa.array(ids.astype(np.int64)),
            "bytes": pa.array([synth_blob(int(i)) for i in ids],
                              pa.binary())})

    blobs = rd.range(n, override_num_blocks=max(4, min(32, n // 60))) \
        .map_batches(synth, batch_format="pyarrow")
    return blobs.map_batches(AudioPageValidate, batch_format="pyarrow",
                             concurrency=(1, 8), batch_size=64)
