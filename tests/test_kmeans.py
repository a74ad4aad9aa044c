"""Distributed k-means + near-dup dedup-apply gates.

Both are approximate/iterative (no SQL oracle); these tests pin the
properties the driver's rows-only check cannot: determinism, exact
partitioning of the input, inertia descent, and drop-set consistency
with the cluster detection stage.
"""

from __future__ import annotations

import numpy as np

SF_DIR = "/root/testdata/sf0.001"


def test_kmeans_partitions_and_deterministic(ray_session):
    from tag_ray.pipelines.embeddings import emb_kmeans
    from tag_ray.sources import table

    a = emb_kmeans(SF_DIR, n_clusters=4, iters=3)
    b = emb_kmeans(SF_DIR, n_clusters=4, iters=3)
    assert a.equals(b)  # same seed, same data → identical floats

    n_rows = table(SF_DIR, "embeddings", columns=["vec_id"]).count()
    assert int(a["n"].sum()) == n_rows  # every vector in exactly one cluster
    assert (a["inertia"] >= 0).all()
    assert (a["n"] > 0).sum() >= 2  # not all mass in one cluster


def test_kmeans_inertia_descends(ray_session):
    from tag_ray.pipelines.embeddings import emb_kmeans

    short = emb_kmeans(SF_DIR, n_clusters=4, iters=1)
    long = emb_kmeans(SF_DIR, n_clusters=4, iters=5)
    # Lloyd's never increases total SSE between assignment passes
    assert long["inertia"].sum() <= short["inertia"].sum() + 1e-6


def test_minhash_dedup_apply_consistent(ray_session):
    from tag_ray.pipelines.dedup import (doc_minhash_dedup_apply,
                                         doc_near_dup_clusters)
    from tag_ray.sources import table

    comp = doc_near_dup_clusters(SF_DIR).to_pandas()
    dropped = set(comp.loc[~comp["keep"], "doc_id"])
    kept = doc_minhash_dedup_apply(SF_DIR).to_pandas()
    n_docs = table(SF_DIR, "documents", columns=["doc_id"]).count()

    assert len(kept) == n_docs - len(dropped)
    assert not (set(kept["doc_id"]) & dropped)  # no dropped id survives
    # every cluster keeps exactly its representative
    reps = set(comp.loc[comp["keep"], "doc_id"])
    assert reps <= set(kept["doc_id"])
    assert kept["doc_id"].is_unique


def test_minhash_candidates_local_path_matches_distributed(ray_session):
    """The n_docs-gated single-block candidate kernel (pair generation +
    cross-band dedup fused, no bucket shuffle) is bit-identical to the
    distributed coarse-bucket path on the same corpus."""
    import pandas as pd

    from tag_ray.pipelines.dedup import (_LOCAL_BANDED_LIMIT,
                                         doc_minhash_candidates)
    from tag_ray.sources import table, table_rows

    docs = table(SF_DIR, "documents", columns=["doc_id", "text"])
    n_docs = table_rows(SF_DIR, "documents")
    assert n_docs * 16 <= _LOCAL_BANDED_LIMIT  # fixture takes local path

    def _sorted(ds):
        return (ds.to_pandas()
                .sort_values(["doc_id_a", "doc_id_b"])
                .reset_index(drop=True))

    local = _sorted(doc_minhash_candidates(docs, n_docs=n_docs))
    dist = _sorted(doc_minhash_candidates(docs, n_docs=None))
    pd.testing.assert_frame_equal(local, dist, check_dtype=True)
    assert len(local) > 0  # the fixture corpus has planted near-dups
