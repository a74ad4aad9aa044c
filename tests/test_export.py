"""Training-set export gates: determinism, dedup+gate math vs a local
oracle, and crash-resume (finished shards skipped on re-run)."""

from __future__ import annotations

import os
import shutil

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def _expected_rows() -> int:
    """Quality gate + keep-first dedup, computed independently in SQL."""
    return duckdb.sql(rf"""
        SELECT COUNT(*) FROM (
          SELECT MIN(doc_id) FROM read_parquet('{SF_DIR}/documents.parquet')
          WHERE length(text) > 0
            AND len(regexp_extract_all(text, '\S+')) >= 5
            AND CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
                / length(text) >= 0.5
          GROUP BY md5(text))
    """).fetchone()[0]


def test_export_counts_and_determinism(ray_session, tmp_path):
    from tag_ray.pipelines.export import export_training_set

    out = str(tmp_path / "exp")
    m1 = export_training_set(SF_DIR, out, num_shards=4)
    assert m1["rows"].sum() == _expected_rows()
    assert m1["written_this_run"].all()

    # re-export into a fresh dir → identical manifest AND identical bytes
    out2 = str(tmp_path / "exp2")
    m2 = export_training_set(SF_DIR, out2, num_shards=4)
    assert m1[["shard", "rows"]].equals(m2[["shard", "rows"]])
    for s in range(4):
        a = open(os.path.join(out, f"shard={s}", "part-0.parquet"), "rb").read()
        b = open(os.path.join(out2, f"shard={s}", "part-0.parquet"), "rb").read()
        assert a == b

    # exported rows are unique docs with no duplicate text
    df = pd.concat([pd.read_parquet(os.path.join(out, f"shard={s}"))
                    for s in range(4)])
    assert df["doc_id"].is_unique
    assert df["text"].is_unique


def test_export_resume_skips_finished_shards(ray_session, tmp_path):
    from tag_ray.pipelines.export import export_training_set

    out = str(tmp_path / "exp")
    export_training_set(SF_DIR, out, num_shards=4)

    # simulate a crash that lost shard 2
    shutil.rmtree(os.path.join(out, "shard=2"))
    m = export_training_set(SF_DIR, out, num_shards=4)
    assert set(m.loc[m["written_this_run"], "shard"]) == {2}
    assert m["rows"].sum() == _expected_rows()
