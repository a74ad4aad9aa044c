"""IVF ANN recall gate: the approximate scale path must recover most of
the brute-force top-k (the baseline emb_cosine_topk is itself
oracle-checked against DuckDB)."""

from tag_ray.pipelines.embeddings import emb_cosine_topk, emb_ivf_topk

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_recall_vs_bruteforce(ray_session):
    exact = emb_cosine_topk(SF_DIR, query_vec_id=0, k=10)
    approx = emb_ivf_topk(SF_DIR, query_vec_id=0, k=10,
                          n_clusters=16, nprobe=4)
    assert len(approx) == 10
    recall = len(set(exact.vec_id) & set(approx.vec_id)) / len(exact)
    # The synthetic embeddings are near-uniform on the sphere (top-1
    # cosine ≈ 0.33), so high absolute recall is impossible for ANY
    # bucketing. Gate on LIFT instead: scanning nprobe/n_clusters = 25%
    # of the data must recover well over 25% of the true top-k.
    assert recall >= 0.4, f"IVF recall {recall}: no lift over random scan"
    # every returned cosine must be the true cosine (scores are exact,
    # only the candidate set is approximate)
    merged = approx.merge(exact, on="vec_id", suffixes=("_a", "_e"))
    assert (merged.cos_a == merged.cos_e).all()


def test_ivf_deterministic(ray_session):
    a = emb_ivf_topk(SF_DIR, query_vec_id=3, k=5)
    b = emb_ivf_topk(SF_DIR, query_vec_id=3, k=5)
    assert a.equals(b)


def test_lsh_near_pairs_recall_vs_bruteforce(ray_session):
    """The banded-LSH near-dup path (candidates + distributed cosine
    verify) must recover ≥0.9 of the exact pair set, with every reported
    cosine exact (scores are recomputed, only recall is approximate)."""
    from tag_ray.pipelines.dedup import emb_lsh_near_pairs, emb_near_pairs

    exact = emb_near_pairs(SF_DIR, threshold=0.45)
    approx = emb_lsh_near_pairs(SF_DIR, threshold=0.45)
    e = set(zip(exact.vec_id_a, exact.vec_id_b))
    a = set(zip(approx.vec_id_a, approx.vec_id_b))
    assert a <= e, f"false positives: {a - e}"  # verify stage is exact
    recall = len(a & e) / len(e) if e else 1.0
    assert recall >= 0.9, f"LSH near-pair recall {recall}"
    merged = approx.merge(exact, on=["vec_id_a", "vec_id_b"],
                          suffixes=("_a", "_e"))
    assert (merged.cos_a == merged.cos_e).all()
