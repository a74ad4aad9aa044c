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
        AudioDecodeStub(strict=True)._pcm(b"x", 10)
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
