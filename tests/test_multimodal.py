"""Multimodal stage plumbing: schemas, actor signatures, determinism,
strict-mode NotImplementedError. Decode itself is stubbed for audio and
video (no ffmpeg/libsndfile offline); image resize is real end-to-end
through the from-scratch codecs."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from tag_ray import codecs
from tag_ray.stages.multimodal import (
    AUDIO_FEATURE_SCHEMA, FRAME_SCHEMA, RESIZED_SCHEMA,
    AudioDecodeStub, FrameSampler, ImageResize)


def _image_rows(n=6):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(n):
        px = rng.integers(0, 256, (20 + i, 17 + i, 3), dtype=np.uint8)
        rows.append({"image_id": f"img-{i}", "bytes": codecs.encode("png", px)})
    rows.append({"image_id": "img-bad", "bytes": b"\x00garbage"})
    return rows


def test_image_resize_real(ray_session):
    ds = rd.from_items(_image_rows()).map_batches(
        ImageResize, fn_constructor_kwargs={"out_h": 8, "out_w": 8},
        batch_format="pyarrow", batch_size=4, concurrency=1)
    out = ds.take_all()
    assert len(out) == 6  # garbage row dropped, not crashed
    for r in out:
        assert (r["w"], r["h"], r["fmt"]) == (8, 8, "ppm")
        px = codecs.decode("ppm", r["bytes"])
        assert px.shape == (8, 8, 3)


def test_audio_stub_plumbing(ray_session):
    rows = [{"audio_id": f"a{i}", "bytes": bytes([i]) * 64,
             "sample_rate": 8000, "n_samples": 8000 * 2} for i in range(5)]
    ds = rd.from_items(rows).map_batches(
        AudioDecodeStub, batch_format="pyarrow", batch_size=2, concurrency=1)
    tbl = pa.Table.from_pylist(ds.take_all())
    assert set(AUDIO_FEATURE_SCHEMA.names) == set(tbl.column_names)
    assert all(len(f) == AudioDecodeStub.N_FEATURES for f in tbl["features"].to_pylist())
    assert all(abs(d - 2.0) < 1e-9 for d in tbl["duration_s"].to_pylist())
    # determinism: same payload → same features
    again = pa.Table.from_pylist(
        rd.from_items(rows).map_batches(
            AudioDecodeStub, batch_format="pyarrow", concurrency=1).take_all())
    assert tbl.sort_by("audio_id").equals(again.sort_by("audio_id"))


def test_frame_sampler_plumbing(ray_session):
    rows = [{"video_id": f"v{i}", "bytes": bytes([i]) * 32,
             "n_frames": 100, "fps": 25.0} for i in range(3)]
    ds = rd.from_items(rows).map_batches(
        FrameSampler, fn_constructor_kwargs={"k": 4},
        batch_format="pyarrow", concurrency=1)
    out = ds.take_all()
    assert len(out) == 12  # 3 videos × 4 frames
    per_video = {}
    for r in out:
        per_video.setdefault(r["video_id"], []).append(r["frame_idx"])
        px = codecs.decode("ppm", r["frame_bytes"])
        assert px.shape == (32, 32, 3)
        assert abs(r["t_s"] - r["frame_idx"] / 25.0) < 1e-9
    assert all(sorted(v) == [0, 33, 66, 99] for v in per_video.values())


def test_strict_mode_raises():
    with pytest.raises(NotImplementedError):
        AudioDecodeStub(strict=True)._pcm(b"x", 10, 8000)
    with pytest.raises(NotImplementedError):
        FrameSampler(strict=True)._frame(b"x", 0)


def test_img_thumbnails_query(ray_session):
    """The driver-visible wrapper around ImageResize: registration,
    pruned read, actor-pool plumbing, summary schema."""
    import __ray_entry__ as entrymod

    df = entrymod.queries()["img_thumbnails"]("/root/testdata/sf0.001").to_pandas()
    assert len(df) > 900  # 1000 images minus undecodable violation rows
    assert list(df.columns) == ["image_id", "fmt", "w", "h", "n_bytes"]
    assert (df["w"] == 16).all() and (df["h"] == 16).all()
    assert (df["fmt"] == "ppm").all()
    assert (df["n_bytes"] > 0).all()


def test_wav_codec_roundtrip():
    """Real RIFF/WAVE parse: synthesize → encode → decode must
    round-trip samples within quantization error, 8/16-bit, mono and
    stereo (the reference's 'same logical content, every format'
    recipe, testdata/README.md)."""
    from tag_ray.codecs import wav

    t = np.linspace(0, 1, 8000, endpoint=False)
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    for bits, tol in ((16, 1e-4), (8, 1e-2)):
        for pcm in (sig, np.stack([sig, -sig], axis=1)):
            data = wav.encode(pcm, 8000, bits=bits)
            got, rate = wav.decode(data)
            assert rate == 8000
            want = pcm if pcm.ndim == 2 else pcm[:, None]
            assert got.shape == want.shape
            assert np.abs(got - want).max() < tol
    h = wav.read_header(wav.encode(sig, 8000))
    assert (h["n_samples"], h["sample_rate"], h["n_channels"]) == (8000, 8000, 1)


def test_wav_codec_malformed():
    """Every declared length is bounds-checked before trust
    (util.go:44-54 guard); malformed inputs raise DecodeError, never
    anything else."""
    import struct

    from tag_ray.codecs import DecodeError, wav

    good = wav.encode(np.zeros(64), 8000)
    cases = [
        b"RIFX" + good[4:],                      # bad magic
        good[:8] + b"WAVX" + good[12:],          # bad wave id
        good[:40],                               # truncated data chunk
        # chunk length over the 10 MB guard
        good[:16].replace(b"fmt ", b"fmt ")[:12]
        + b"fmt " + struct.pack("<I", 64 * 1024 * 1024) + good[20:],
        b"RIFF\x10\x00\x00\x00WAVEdata\x00\x00\x00\x00",  # no fmt chunk
    ]
    for i, data in enumerate(cases):
        with pytest.raises(DecodeError):
            wav.read_header(data)


def test_audio_features_real_wav(ray_session):
    """The audio stage decodes synthesized WAV payloads for REAL: the
    parsed rate/length drive duration, and a pure DC signal has zero
    crossings == 0 while a 440 Hz tone has ~2·440 per second — values a
    payload-seeded fake cannot produce."""
    from tag_ray.codecs import wav
    from tag_ray.stages.multimodal import AudioFeatures

    t = np.linspace(0, 2, 16000, endpoint=False)
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    dc = np.full(16000, 0.25)
    rows = [
        {"audio_id": "tone", "bytes": wav.encode(tone, 8000),
         "sample_rate": 999, "n_samples": 5},   # declared metadata wrong
        {"audio_id": "dc", "bytes": wav.encode(dc, 8000),
         "sample_rate": 8000, "n_samples": 16000},
        {"audio_id": "bad", "bytes": b"RIFF\xff\xff", "sample_rate": 1,
         "n_samples": 1},                        # malformed → dropped
    ]
    out = pa.Table.from_pylist(
        rd.from_items(rows).map_batches(
            AudioFeatures, batch_format="pyarrow", batch_size=2,
            concurrency=1).take_all())
    got = {r["audio_id"]: r for r in out.to_pylist()}
    assert set(got) == {"tone", "dc"}
    assert abs(got["tone"]["duration_s"] - 2.0) < 1e-9  # parsed, not declared
    assert abs(got["dc"]["duration_s"] - 2.0) < 1e-9
    assert got["dc"]["zero_crossings"] == 0
    # ~2·440·2 = 1760 ideal; int16 quantization of exact-zero samples
    # adds sign wobble (measured 1919) — far from a seeded-noise fake's
    # ~n/2 ≈ 8000, which is what this pin is for
    assert 1700 <= got["tone"]["zero_crossings"] <= 2100
    assert abs(got["dc"]["rms"] - 0.25) < 1e-3


def test_audio_strict_mode_non_wav_only(ray_session):
    """strict=True: WAV still decodes (it's real); non-RIFF raises the
    clearly-marked NotImplementedError."""
    from tag_ray.codecs import wav
    from tag_ray.stages.multimodal import AudioFeatures

    a = AudioFeatures(strict=True)
    pcm, rate = a._pcm(wav.encode(np.zeros(32), 8000), 32, 8000)
    assert rate == 8000 and len(pcm) == 32
    with pytest.raises(NotImplementedError):
        a._pcm(b"\x00not-riff", 10, 8000)
