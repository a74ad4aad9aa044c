"""Pins the distinctive semantics of doc_containment_near_dups: a
short document quoted verbatim inside a much longer one has tiny
symmetric Jaccard (misses any sane threshold) but max-containment 1.0
— the partial-duplicate case the containment operator exists for.
Also cross-checks the planted corpus against the DuckDB oracle."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def cont_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cont_sf")
    big = " ".join(f"a{i}" for i in range(30))      # 28 word-3-shingles
    quoted = " ".join(f"a{i}" for i in range(9))    # 7 shingles, all ⊂ big
    # J(big, quoted) = 7/28 = 0.25 — far below any jaccard threshold;
    # containment = 7/min(28,7) = 1.0
    partial = " ".join(f"a{i}" for i in range(5)) + " b0 b1 b2 b3"
    # partial: 9 words → 7 shingles, 3 shared with big ("a0..a4" gives
    # shingles a0a1a2, a1a2a3, a2a3a4) → containment 3/7 ≈ 0.4286 < 0.8
    other = " ".join(f"c{i}" for i in range(12))    # disjoint filler
    texts = [(1, big), (2, quoted), (3, partial), (4, other)]
    docs = pa.table({
        "doc_id": pa.array([t[0] for t in texts], pa.int64()),
        "text": pa.array([t[1] for t in texts], pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["cont"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t[1]) for t in texts], pa.int64()),
    })
    pq.write_table(docs, str(d / "documents.parquet"))
    return str(d)


def test_containment_catches_partial_dup_jaccard_misses(ray_session,
                                                        cont_dir):
    from tag_ray.pipelines.dedup import (doc_containment_near_dups,
                                         doc_ngram_jaccard_near_dups)

    cont = doc_containment_near_dups(cont_dir, threshold=0.8)
    pairs = set(zip(cont["doc_id_a"].astype(int),
                    cont["doc_id_b"].astype(int)))
    assert pairs == {(1, 2)}, pairs
    score = float(cont.loc[0, "containment"])
    assert score == 1.0
    # symmetric Jaccard at its default threshold sees nothing
    jac = doc_ngram_jaccard_near_dups(cont_dir, threshold=0.7)
    assert len(jac) == 0


def test_containment_matches_oracle_on_planted_corpus(ray_session,
                                                      cont_dir):
    import __ray_entry__ as entrymod

    ray_df = entrymod.queries()["doc_containment_near_dups"](cont_dir)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{cont_dir}/documents.parquet')")
    sql_df = con.execute(
        entrymod.oracle_sql()["doc_containment_near_dups"]).fetchdf()
    a = ray_df.sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    b = sql_df.sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True)
    assert sorted(a.columns) == sorted(b.columns)
    assert len(a) == len(b)
    assert np.allclose(a["containment"], b["containment"])
    assert (a["doc_id_a"].to_numpy() == b["doc_id_a"].to_numpy()).all()
    assert (a["doc_id_b"].to_numpy() == b["doc_id_b"].to_numpy()).all()


def test_below_threshold_pair_excluded(ray_session, cont_dir):
    """Doc 3 shares 3 of its 7 shingles with doc 1 (containment
    ~0.4286): present at threshold 0.4, absent at the default 0.8
    (already pinned above)."""
    from tag_ray.pipelines.dedup import doc_containment_near_dups

    lo = doc_containment_near_dups(cont_dir, threshold=0.4)
    pairs = set(zip(lo["doc_id_a"].astype(int), lo["doc_id_b"].astype(int)))
    assert (1, 3) in pairs and (1, 2) in pairs
    got = lo.set_index(["doc_id_a", "doc_id_b"])["containment"]
    assert abs(float(got.loc[(1, 3)]) - round(3 / 7, 4)) < 1e-9
