"""connected_components vs a union-find reference, including chains
(multi-hop transitivity) and multiple separate clusters."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from tag_ray.functions.components import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id canonical labels
    return {x: find(x) for x in list(parent)}


def test_components_match_union_find(ray_session):
    rng = np.random.default_rng(17)
    # long chains force multi-round propagation
    edges = [(i, i + 1) for i in range(0, 40)]          # one 41-node chain
    edges += [(100 + 2 * i, 101 + 2 * i) for i in range(20)]  # 20 two-cliques
    extra = rng.integers(200, 260, (30, 2))
    edges += [(int(a), int(b)) for a, b in extra if a != b]
    ref = _union_find(edges)

    ds = rd.from_arrow(pa.Table.from_pydict({
        "a": np.array([e[0] for e in edges], np.int64),
        "b": np.array([e[1] for e in edges], np.int64)}))
    # small path (union-find) and distributed path (forced via threshold=0)
    for thresh in (1_000_000, 0):
        got = connected_components(ds, "a", "b",
                                   small_threshold=thresh).to_pandas()
        got_map = dict(zip(got["node"], got["component"]))
        assert got_map == ref, f"threshold={thresh}"


def test_clusters_query_small(ray_session):
    from tag_ray.pipelines.dedup import doc_near_dup_clusters

    df = doc_near_dup_clusters("/root/testdata/sf0.001").to_pandas()
    # keep-flag marks exactly one representative per cluster
    assert (df.groupby("cluster_id")["keep"].sum() == 1).all()
    assert (df[df["keep"]]["doc_id"] == df[df["keep"]]["cluster_id"]).all()
