"""Multimodal actor-pool stages: image resize (real), audio features and
video frame sampling (decode STUBBED — no audio/video libs offline).

Posture per BASELINE.json input_hint: every modality is an opaque
``binary`` column plus typed metadata columns; each transform is a
callable class for ``map_batches(Cls, concurrency=N, batch_size=small)``
so per-actor setup happens once (the reference loads its lookup tables
once per process the same way, SURVEY.md §2.3 T1).

STUB CONTRACT: ``AudioDecodeStub._pcm`` / ``FrameSampler._frame`` are
deterministic fakes (seeded from the payload bytes) standing in for
libsndfile/ffmpeg. Swapping in a real decoder changes ONLY those two
private methods — schemas, batch plumbing, actor signatures and output
layout are the real, tested surface. Construct with ``strict=True`` to
get the clearly-marked NotImplementedError instead of fake data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tag_ray import codecs
from tag_ray.codecs import DecodeError

# ---------------------------------------------------------------------------
# image resize: fully real (from-scratch codecs) — decode → resize → re-encode


RESIZED_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),      # re-encoded at target size
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
])


def _resize_nearest(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = px.shape[:2]
    yi = (np.arange(out_h) * (h / out_h)).astype(np.int64)
    xi = (np.arange(out_w) * (w / out_w)).astype(np.int64)
    return px[yi][:, xi]


class ImageResize:
    """Decode each row's payload, nearest-neighbor resize to
    ``(out_h, out_w)``, re-encode as ``out_fmt`` (default ppm —
    lossless, cheap). Undecodable rows are dropped (they already
    surfaced as violations in the validation sweep)."""

    def __init__(self, out_h: int, out_w: int, out_fmt: str = "ppm",
                 max_pixels: int = 64 * 1024 * 1024):
        self.out_h, self.out_w, self.out_fmt = out_h, out_w, out_fmt
        self.max_pixels = max_pixels

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, blobs = batch["image_id"].to_pylist(), batch["bytes"].to_pylist()
        out = {k: [] for k in RESIZED_SCHEMA.names}
        for i in range(batch.num_rows):
            data = blobs[i]
            fmt = codecs.identify(data) if data is not None else None
            if fmt is None:
                continue
            try:
                px = codecs.decode(fmt, data, max_pixels=self.max_pixels)
            except DecodeError:
                continue
            small = _resize_nearest(px, self.out_h, self.out_w)
            out["image_id"].append(ids[i])
            out["bytes"].append(codecs.encode(self.out_fmt, small))
            out["w"].append(self.out_w)
            out["h"].append(self.out_h)
            out["fmt"].append(self.out_fmt)
        return pa.Table.from_pydict(out, schema=RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# audio: opaque binary + (sample_rate, n_samples) metadata → feature vector


AUDIO_FEATURE_SCHEMA = pa.schema([
    ("audio_id", pa.string()),
    ("duration_s", pa.float64()),
    ("rms", pa.float64()),
    ("zero_crossings", pa.int64()),
    ("features", pa.list_(pa.float32())),   # fixed-size embedding slot
])


class AudioFeatures:
    """binary audio + declared (sample_rate, n_samples) → features.

    RIFF/WAVE payloads get a REAL byte-level decode (codecs/wav.py —
    chunk walk, PCM 8/16/32-bit + float32, 10 MB declared-size guard,
    VERDICT r3 Missing #2; channels are averaged to mono before
    feature extraction, and the PARSED sample rate / length override
    the declared metadata columns). OGG paged streams get a real
    decode too (codecs/oggp.py: page CRC verify + cross-page packet
    reassembly). Remaining formats (mp3/flac/aac) keep the stub
    contract: deterministic payload-seeded fake when ``strict=False``,
    clearly-marked NotImplementedError when ``strict=True`` (those
    decoders need libs this container doesn't have)."""

    N_FEATURES = 16

    def __init__(self, strict: bool = False):
        self.strict = strict

    def _pcm(self, data: bytes, n_samples: int,
             declared_rate: int) -> tuple[np.ndarray, int]:
        if data[:4] == b"RIFF":
            from tag_ray.codecs import wav

            pcm, rate = wav.decode(data)  # DecodeError on malformed RIFF
            mono = pcm.mean(axis=1).astype(np.float32) if pcm.shape[1] > 1 \
                else pcm[:, 0]
            if mono.size == 0:
                mono = np.zeros(1, np.float32)
            return mono, rate
        if data[:4] == b"OggS":
            # real paged-container decode (round 5): page CRC verify +
            # cross-page packet reassembly, codecs/oggp.py. DecodeError
            # (bad CRC / truncation) contains to the row like WAV.
            from tag_ray.codecs import oggp

            out = oggp.parse_audio(data)
            pcm = out["pcm"].astype(np.float32)
            mono = pcm.mean(axis=1) if pcm.shape[1] > 1 else pcm[:, 0]
            if mono.size == 0:
                mono = np.zeros(1, np.float32)
            return mono, out["sample_rate"]
        if self.strict:
            raise NotImplementedError(
                "non-WAV audio decode requires libsndfile/ffmpeg — not "
                "available offline; deterministic fake used when "
                "strict=False")
        # deterministic fake: payload-seeded noise, same length contract
        seed = int.from_bytes(data[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
        rng = np.random.default_rng(seed)
        return (rng.standard_normal(max(n_samples, 1)).astype(np.float32),
                declared_rate)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["audio_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        rates = batch["sample_rate"].to_pylist()
        counts = batch["n_samples"].to_pylist()
        out = {k: [] for k in AUDIO_FEATURE_SCHEMA.names}
        for i in range(batch.num_rows):
            try:
                pcm, rate = self._pcm(blobs[i] or b"", int(counts[i] or 0),
                                      int(rates[i] or 1))
            except DecodeError:
                continue  # malformed payload: row-level containment
            out["audio_id"].append(ids[i])
            out["duration_s"].append(len(pcm) / max(rate, 1))
            out["rms"].append(float(np.sqrt(np.mean(pcm * pcm))))
            out["zero_crossings"].append(int((np.diff(np.sign(pcm)) != 0).sum()))
            # banded energy profile as the fixed-size feature vector
            bands = np.array_split(pcm, self.N_FEATURES)
            out["features"].append(
                np.array([float(np.abs(b).mean()) if b.size else 0.0
                          for b in bands], np.float32))
        return pa.Table.from_pydict(out, schema=AUDIO_FEATURE_SCHEMA)


# back-compat alias (the round-3 stub name; WAV decode is now real)
AudioDecodeStub = AudioFeatures


# ---------------------------------------------------------------------------
# video: opaque binary + (n_frames, fps) metadata → sampled frame rows


FRAME_SCHEMA = pa.schema([
    ("video_id", pa.string()),
    ("frame_idx", pa.int32()),
    ("t_s", pa.float64()),
    ("frame_bytes", pa.binary()),   # encoded still (ppm here)
])


class FrameSampler:
    """flat-map style: one input video row → ``k`` sampled frame rows,
    uniformly spaced over declared n_frames. Frame decode is a STUB
    (deterministic solid-color still seeded by payload+index)."""

    def __init__(self, k: int = 4, frame_h: int = 32, frame_w: int = 32,
                 strict: bool = False):
        self.k, self.h, self.w = k, frame_h, frame_w
        self.strict = strict

    def _frame(self, data: bytes, idx: int) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "video frame decode requires ffmpeg — not available "
                "offline; deterministic fake used when strict=False")
        seed = (int.from_bytes(data[:8].ljust(8, b"\0"), "little") + idx) & 0x7FFFFFFF
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (self.h, self.w, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["video_id"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        n_frames = batch["n_frames"].to_pylist()
        fps = batch["fps"].to_pylist()
        out = {k: [] for k in FRAME_SCHEMA.names}
        for i in range(batch.num_rows):
            total = int(n_frames[i] or 0)
            if total <= 0:
                continue
            rate = float(fps[i] or 1.0)
            picks = np.unique(np.linspace(0, total - 1, min(self.k, total),
                                          dtype=np.int64))
            for f in picks:
                out["video_id"].append(ids[i])
                out["frame_idx"].append(int(f))
                out["t_s"].append(float(f) / rate)
                out["frame_bytes"].append(
                    codecs.encode("ppm", self._frame(blobs[i] or b"", int(f))))
        return pa.Table.from_pydict(out, schema=FRAME_SCHEMA)
