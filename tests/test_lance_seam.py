"""Contract tests for the storage-dispatch seam (SURVEY.md §2.1 S1).

No lance wheel ships offline, so the production `.lance` path is pinned
with a stubbed ``ray.data.read_lance`` / ``Dataset.write_lance``: the
dispatcher must (a) route ``.lance`` URIs to the lance reader with
columns forwarded verbatim, (b) route everything else to parquet, and
(c) surface a clear RuntimeError when the wheel is absent — so swapping
the backend in prod cannot silently change pipeline semantics."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd


def test_read_table_dispatches_lance(ray_session, monkeypatch):
    calls = {}
    sentinel = rd.from_arrow(pa.table({"image_id": ["a"], "w": [4]}))

    def fake_read_lance(uri, columns=None, **kw):
        calls["uri"], calls["columns"] = uri, columns
        return sentinel

    monkeypatch.setattr(rd, "read_lance", fake_read_lance, raising=False)
    from tag_ray import sources

    out = sources.read_table("/data/images.lance", columns=["image_id", "w"])
    assert out is sentinel
    assert calls == {"uri": "/data/images.lance",
                     "columns": ["image_id", "w"]}


def test_read_table_lance_missing_is_clear(ray_session, monkeypatch):
    def raising_read_lance(uri, columns=None, **kw):
        raise ImportError("no module named 'lance'")

    monkeypatch.setattr(rd, "read_lance", raising_read_lance, raising=False)
    from tag_ray import sources

    with pytest.raises(RuntimeError, match="lance"):
        sources.read_table("/data/images.lance")


def test_read_table_parquet_fallthrough(ray_session, tmp_path):
    from tag_ray import sources

    p = tmp_path / "t.parquet"
    pq.write_table(pa.table({"x": [1, 2, 3], "y": [4, 5, 6]}), str(p))
    ds = sources.read_table(str(p), columns=["x"])
    got = ds.to_pandas()
    assert list(got.columns) == ["x"] and len(got) == 3


def test_flagship_read_images_dispatches_lance(ray_session, monkeypatch):
    """The FLAGSHIP's reader goes through the same dispatch seam —
    pointing the validation sweep at a .lance table must reach
    read_lance with columns and the partition filter forwarded."""
    calls = {}
    sentinel = rd.from_arrow(pa.table({"image_id": ["a"]}))

    def fake_read_lance(uri, columns=None, **kw):
        calls["uri"], calls["columns"] = uri, columns
        calls["has_filter"] = kw.get("filter") is not None
        return sentinel

    monkeypatch.setattr(rd, "read_lance", fake_read_lance, raising=False)
    from tag_ray.pipelines import validate as V

    out = V.read_images("/data/corpus.lance", columns=["image_id"],
                        partitions=[0, 1])
    assert out is sentinel
    assert calls == {"uri": "/data/corpus.lance",
                     "columns": ["image_id"], "has_filter": True}


def test_write_table_dispatches_lance(ray_session, monkeypatch):
    ds = rd.from_arrow(pa.table({"x": [1]}))
    calls = {}

    def fake_write_lance(self, uri, **kw):
        calls["uri"] = uri

    monkeypatch.setattr(type(ds), "write_lance", fake_write_lance,
                        raising=False)
    from tag_ray import sources

    sources.write_table(ds, "/out/violations.lance")
    assert calls == {"uri": "/out/violations.lance"}


def test_combine_num_blocks_byte_floor():
    """The combine-read block cap can never force oversized blocks: when
    bytes/target_max_block_size exceeds the ~CPUs/2 hint, the byte floor
    wins (at 100 TB this degrades to Ray's own sizing)."""
    from ray.data import DataContext

    from tag_ray.config import join_num_partitions
    from tag_ray.sources import combine_num_blocks, table_rows

    sf = "/root/testdata/sf0.001"
    base = combine_num_blocks(sf, "lineitem")
    assert base >= join_num_partitions() >= 8

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 1024  # force the byte floor to win
        floored = combine_num_blocks(sf, "lineitem")
        assert floored > base  # tiny target ⇒ many more blocks than CPUs/2
    finally:
        ctx.target_max_block_size = old

    assert table_rows(sf, "lineitem") == 6000  # footer metadata, no scan


def test_csv_json_roundtrip_through_dispatcher(ray_session, tmp_path):
    """CSV and JSON route through the same read_table/write_table seam
    as parquet/lance: column pruning works (CSV pushed into Arrow
    convert options, JSON post-read) and a write→read roundtrip
    preserves values."""
    import pandas as pd
    import ray.data as rd

    from tag_ray.sources import read_table, write_table

    df = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"],
                       "c": [0.5, 1.5, 2.5]})
    src = rd.from_pandas(df)

    for ext in ("csv", "json"):
        out = str(tmp_path / f"t_{ext}.{ext}")
        write_table(src, out)
        full = read_table(out).to_pandas().sort_values("a")
        assert list(full["b"]) == ["x", "y", "z"]
        pruned = read_table(out, columns=["a", "c"]).to_pandas()
        assert sorted(pruned.columns) == ["a", "c"]
        assert sorted(pruned["a"].tolist()) == [1, 2, 3]
