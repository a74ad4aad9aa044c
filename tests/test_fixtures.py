"""Fixture-generator determinism + golden-sidecar consistency."""

from __future__ import annotations

import glob
import hashlib

import pyarrow.parquet as pq

from tag_ray import codecs, fixtures


def _digest(d: str) -> str:
    h = hashlib.sha1()
    for f in sorted(glob.glob(d + "/**/*.parquet", recursive=True)):
        tbl = pq.read_table(f)
        for col in sorted(tbl.column_names):
            for chunk in tbl.column(col).chunks:
                h.update(str(chunk.to_pylist()).encode())
    return h.hexdigest()


def test_deterministic(tmp_path):
    a = fixtures.generate(str(tmp_path / "a"), n_rows=120, n_partitions=4, force=True)
    b = fixtures.generate(str(tmp_path / "b"), n_rows=120, n_partitions=4, force=True)
    assert _digest(a) == _digest(b)


def test_sidecars_consistent(smoke_corpus):
    imgs = pq.read_table(glob.glob(smoke_corpus + "/images/*.parquet")[0])
    assert imgs.schema.names == ["image_id", "bytes", "w", "h", "fmt",
                                 "caption", "phash", "partition_id",
                                 "caption_raw", "caption_enc"]
    ev = pq.read_table(smoke_corpus + "/expected_violations.parquet").to_pandas()
    st = pq.read_table(smoke_corpus + "/expected_partition_status.parquet").to_pandas()
    per_part = ev.groupby("partition_id").size().reindex(st.partition_id, fill_value=0)
    assert (per_part.values == st.violation_count.values).all()
    assert (st["pass"] == (st.violation_count == 0)).all()


def test_valid_rows_decode_clean(smoke_corpus):
    """Rows without expected violations must pass every per-row invariant."""
    import numpy as np
    import pyarrow as pa

    files = sorted(glob.glob(smoke_corpus + "/images/*.parquet"))
    imgs = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    ev = pq.read_table(smoke_corpus + "/expected_violations.parquet").to_pandas()
    bad_ids = set(ev.image_id)
    clean = imgs[~imgs.image_id.isin(bad_ids)].head(200)
    assert len(clean) > 50
    for _, r in clean.iterrows():
        assert codecs.identify(r["bytes"]) == r.fmt
        assert codecs.read_header(r.fmt, r["bytes"]) == (r.w, r.h)
        px = codecs.decode(r.fmt, r["bytes"])
        ph = codecs.phash64(px)
        assert codecs.hamming64(np.array([ph]), np.array([r.phash]))[0] <= 2
