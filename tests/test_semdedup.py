"""Semantic dedup (SemDeDup-shaped cluster-then-prune) gates.

Planted corpus: orthogonal direction families in R^8 — within-family
cosine ≈ 1, cross-family cosine ≈ 0 — so the cluster stage separates
families for any sane spherical k-means and the operator's output can
be pinned EXACTLY against the brute-force global keep-first rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

THRESH = 0.45


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory) -> str:
    rng = np.random.default_rng(11)
    dim = 8
    rows: list[tuple[int, np.ndarray]] = []
    # three families along e0/e1/e2: base + 3 noisy near-copies each
    for fam in range(3):
        base = np.zeros(dim)
        base[fam] = 1.0
        for k in range(4):
            v = base + rng.normal(scale=0.01, size=dim)
            rows.append((fam + 10 * k, v))  # interleaved ids
    # four singletons along e4..e7 (no neighbor above the threshold)
    for j in range(4):
        v = np.zeros(dim)
        v[4 + j] = 2.0
        rows.append((100 + j, v))
    rows.sort(key=lambda r: r[0])
    d = tmp_path_factory.mktemp("semdedup")
    pq.write_table(pa.Table.from_pydict({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1].tolist() for r in rows],
                              pa.list_(pa.float32()))}),
        str(d / "embeddings.parquet"))
    return str(d)


def _brute_force(sf_dir: str, threshold: float,
                 segment: int | None = None) -> pd.DataFrame:
    """Global keep-first rule over ALL pairs (numpy, driver-side):
    drop i iff some j < i (by vec_id) has cos(i, j) >= threshold;
    dup_of = the smallest such j. With ``segment``, comparisons are
    restricted to id-sorted segments of that size (the operator's
    documented max_cluster cutoff)."""
    from tag_ray.functions.rounding import round_half_away

    t = pq.read_table(sf_dir + "/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    m = np.stack([np.asarray(v, dtype=np.float64)
                  for v in t["embedding"].to_pylist()])[order]
    # identical normalization expression to the operator (ulp parity)
    mn = m / np.sqrt((m * m).sum(axis=1))[:, None]
    out = []
    seg = segment or len(ids)
    for s in range(0, len(ids), seg):
        sid, sm = ids[s:s + seg], mn[s:s + seg]
        sims = sm @ sm.T
        for i in range(1, len(sid)):
            js = np.flatnonzero(sims[i, :i] >= threshold)
            if len(js):
                out.append((int(sid[i]), int(sid[js[0]]),
                            float(round_half_away(
                                np.array([sims[i, js[0]]]), 4)[0])))
    return pd.DataFrame(out, columns=["vec_id", "dup_of", "cos"]).astype(
        {"vec_id": "int64", "dup_of": "int64", "cos": "float64"})


def test_matches_brute_force_single_cluster(ray_session, planted_dir):
    from tag_ray.pipelines.dedup import emb_semantic_dedup

    got = emb_semantic_dedup(planted_dir, threshold=THRESH,
                             n_clusters=1).to_pandas()
    want = _brute_force(planted_dir, THRESH)
    assert len(want) == 9  # 3 non-first members × 3 families
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_matches_brute_force_clustered(ray_session, planted_dir):
    """Well-separated families ⇒ the clustered path loses nothing vs
    the global rule (each family lands whole in one cluster)."""
    from tag_ray.pipelines.dedup import emb_semantic_dedup

    got = emb_semantic_dedup(planted_dir, threshold=THRESH,
                             n_clusters=3).to_pandas()
    want = _brute_force(planted_dir, THRESH)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_deterministic(ray_session, planted_dir):
    from tag_ray.pipelines.dedup import emb_semantic_dedup

    a = emb_semantic_dedup(planted_dir, threshold=THRESH,
                           n_clusters=3).to_pandas()
    b = emb_semantic_dedup(planted_dir, threshold=THRESH,
                           n_clusters=3).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_segment_cutoff_is_deterministic_recall_loss(ray_session,
                                                     planted_dir):
    """max_cluster segments an oversized cluster by sorted id; drops are
    exactly the per-segment keep-first rule — no more, no less."""
    from tag_ray.pipelines.dedup import emb_semantic_dedup

    got = emb_semantic_dedup(planted_dir, threshold=THRESH, n_clusters=1,
                             max_cluster=5).to_pandas()
    want = _brute_force(planted_dir, THRESH, segment=5)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    assert len(want) < 9  # the cutoff really bit on this corpus


def test_empty_table(ray_session, tmp_path):
    from tag_ray.pipelines.dedup import emb_semantic_dedup

    pq.write_table(pa.Table.from_pydict({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float32()))}),
        str(tmp_path / "embeddings.parquet"))
    got = emb_semantic_dedup(str(tmp_path))  # typed frame (all-empty)
    assert len(got) == 0
    assert list(got.columns) == ["vec_id", "dup_of", "cos"]
