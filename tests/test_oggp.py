"""OGG paged container: CRC table, page walk, cross-page packet
reassembly, audio round-trip, corruption taxonomy, pipeline counts."""

import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from tag_ray.codecs import DecodeError, oggp


def _crc_bitwise(data: bytes) -> int:
    """Independent bit-by-bit CRC (forward 0x04C11DB7, init/xorout 0)
    — cross-checks the table-driven implementation."""
    crc = 0
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF \
                if crc & 0x80000000 else (crc << 1) & 0xFFFFFFFF
    return crc


def test_crc_table_matches_bitwise():
    rng = np.random.default_rng(1)
    for n in (0, 1, 27, 300):
        v = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert oggp.page_crc(v) == _crc_bitwise(v)


def test_packet_roundtrip_and_flags():
    rng = np.random.default_rng(2)
    pkts = [b"", b"x", bytes(rng.integers(0, 256, 9000, dtype=np.uint8)),
            b"a" * 510,  # multiple of 255 → nil lacing terminator
            b"tail"]
    blob = oggp.encode_pages(pkts, page_payload=2048)
    assert oggp.read_packets(blob) == pkts
    hdrs = [h for h, _, _ in oggp.iter_pages(blob)]
    assert hdrs[0]["bos"] and hdrs[-1]["eos"]
    assert any(h["continued"] for h in hdrs)  # the 9 KB packet spans pages
    assert [h["seq"] for h in hdrs] == list(range(len(hdrs)))


def test_audio_roundtrip_mono_stereo_empty():
    rng = np.random.default_rng(3)
    for ch in (1, 2):
        pcm = rng.integers(-2**15, 2**15, (3777, ch)).astype(np.int16)
        blob = oggp.encode_audio(pcm.squeeze() if ch == 1 else pcm,
                                 22050, {"génre": "électro", "a": ""})
        out = oggp.parse_audio(blob)
        assert (out["pcm"] == pcm.reshape(-1, ch)).all()
        assert out["sample_rate"] == 22050
        assert out["comments"] == {"génre": "électro", "a": ""}
        assert out["duration_us"] == round(3777 * 1_000_000 / 22050)
    empty = oggp.parse_audio(oggp.encode_audio(
        np.zeros((0, 1), np.int16), 8000))
    assert len(empty["pcm"]) == 0 and empty["duration_us"] == 0


def test_crc_mismatch_names_page():
    pcm = np.zeros((4000, 1), np.int16)
    blob = bytearray(oggp.encode_audio(pcm, 8000, page_payload=1024))
    blob[-2] ^= 0xFF
    with pytest.raises(DecodeError, match=r"page \d+: crc mismatch"):
        oggp.parse_audio(bytes(blob))
    # verify_crc=False parses the (structurally intact) stream
    assert len(oggp.parse_audio(bytes(blob),
                                verify_crc=False)["pcm"]) == 4000


def test_truncation_and_sequence_gap():
    pcm = np.zeros((6000, 1), np.int16)
    blob = oggp.encode_audio(pcm, 8000, page_payload=1024)
    with pytest.raises(DecodeError):
        oggp.read_packets(blob[: len(blob) // 2])
    # drop a middle page → sequence jump (and/or continuation loss)
    pages = []
    mv = memoryview(blob)
    for hdr, lacing, payload in oggp.iter_pages(blob):
        pages.append((hdr["seq"], lacing, payload))
    # rebuild raw page extents to splice one out
    bounds = []
    pos = 0
    while pos < len(blob):
        nseg = blob[pos + 26]
        body = sum(blob[pos + 27:pos + 27 + nseg])
        end = pos + 27 + nseg + body
        bounds.append((pos, end))
        pos = end
    assert len(bounds) >= 4
    spliced = blob[: bounds[1][0]] + blob[bounds[2][0]:]
    with pytest.raises(DecodeError):
        oggp.read_packets(spliced)


def test_guards():
    with pytest.raises(DecodeError, match="guard"):
        list(oggp.iter_pages(b"\0" * (oggp.MAX_DECODE_BYTES + 1)))
    with pytest.raises(DecodeError, match="capture pattern"):
        oggp.read_packets(b"JUNKJUNKJUNKJUNKJUNKJUNKJUNKJUNK")
    # comment packet declaring an absurd count must not allocate
    head = oggp._AUDIO_MAGIC + struct.pack("<BBIB", 0, 1, 8000, 16)
    com = struct.pack("<I", 0) + struct.pack("<I", 2**31)
    blob = oggp.encode_pages([head, com, b""])
    with pytest.raises(DecodeError, match="comments declared"):
        oggp.parse_audio(blob)


def test_pipeline_counts(ray_session):
    from tag_ray.pipelines.audio import audio_ogg_validate

    out = audio_ogg_validate("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 240
    counts = out["status"].value_counts().to_dict()
    assert counts == {"ok": 240 - 3 * 24, "crc_mismatch": 24,
                      "truncated": 24, "not_ogg": 24}
    ok = out[out["status"] == "ok"]
    assert (ok["n_samples"] > 0).all()
    assert (ok["n_comments"] == 2).all()
    assert set(ok["sample_rate"].unique()) <= {8000, 16000, 22050}
    # determinism: a second run is byte-identical
    again = audio_ogg_validate("/root/testdata/sf0.001").to_pandas()
    assert again.sort_values("audio_id").reset_index(drop=True).equals(
        out.sort_values("audio_id").reset_index(drop=True))


def test_audio_features_ogg_path(ray_session):
    """AudioFeatures decodes OGG paged streams for real: parsed rate
    overrides declared metadata, and a corrupted page contains to the
    row (dropped) instead of failing the task."""
    import pyarrow as pa
    import ray.data as rd

    from tag_ray.codecs import oggp
    from tag_ray.stages.multimodal import AudioFeatures

    rng = np.random.default_rng(7)
    pcm = rng.integers(-8000, 8000, (2200, 2)).astype(np.int16)
    good = oggp.encode_audio(pcm, 16000)
    bad = bytearray(good)
    bad[27 + bad[26] + 1] ^= 0x55  # page-0 payload byte → CRC mismatch
    ds = rd.from_arrow(pa.table({
        "audio_id": ["good", "bad"],
        "bytes": pa.array([good, bytes(bad)], pa.binary()),
        "sample_rate": [999, 999],     # wrong on purpose
        "n_samples": [1, 1],
    }))
    out = ds.map_batches(AudioFeatures, batch_format="pyarrow",
                         concurrency=1, batch_size=8,
                         fn_constructor_kwargs={"strict": True}).to_pandas()
    assert list(out["audio_id"]) == ["good"]
    assert abs(out["duration_s"].iloc[0] - 2200 / 16000) < 1e-9
