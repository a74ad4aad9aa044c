"""Distributed connected components by iterative min-label propagation.

Dedup needs cluster ids, not just pairs: "keep the first of each
near-dup CLUSTER" requires the transitive closure of the pair relation.
This is the engine's iterative-algorithm primitive: labels start as the
node id; each round every edge pulls both endpoints down to the edge's
minimum label (two hash joins + a groupby-min); fixpoint in O(cluster
diameter) rounds — near-dup clusters are shallow, so a handful.

The edge list entering this op is already the SMALL verified-pair set
(LSH candidates → verify), not the raw table, so per-round shuffles are
tiny; the round count is capped and convergence is checked with a
1-row aggregate (sum of labels strictly decreases until fixpoint).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Min, Sum

from tag_ray.config import join_num_partitions as _np_
from tag_ray.functions.joins import safe_join


def union_find(pairs) -> dict[int, int]:
    """Driver-side union-find with min-id canonical labels."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def connected_components(edges: rd.Dataset, a: str, b: str,
                         max_rounds: int = 25,
                         small_threshold: int = 1_000_000) -> rd.Dataset:
    """(a, b) edge Dataset → (node, component) with component = min node
    id reachable; isolated nodes absent from edges are absent here.

    Adaptive execution (the broadcast-join principle applied to graphs):
    a verified near-dup edge list is usually tiny relative to the table,
    so below ``small_threshold`` edges the transitive closure runs as
    driver-side union-find — exact same result, none of the per-round
    join fixed costs. The iterative distributed path takes over above
    the threshold."""
    e = edges.map_batches(
        lambda t: pa.Table.from_pydict(
            {"src": t[a].cast(pa.int64()), "dst": t[b].cast(pa.int64())}),
        batch_format="pyarrow").materialize()

    if e.count() <= small_threshold:
        tbl = pa.concat_tables(
            [pa.Table.from_pydict(batch) if isinstance(batch, dict) else batch
             for batch in e.iter_batches(batch_format="pyarrow", batch_size=None)]
        ) if e.count() else pa.Table.from_pydict(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        labels_map = union_find(zip(tbl["src"].to_pylist(), tbl["dst"].to_pylist()))
        nodes = sorted(labels_map)
        return rd.from_arrow(pa.Table.from_pydict({
            "node": pa.array(nodes, pa.int64()),
            "component": pa.array([labels_map[n] for n in nodes], pa.int64())}))

    from tag_ray.functions.grouping import grouped_aggregate

    # grouped_aggregate throughout: node cardinality = corpus size, the
    # exact regime where native groupby.aggregate pays Python per group
    nodes = grouped_aggregate(
        e.map_batches(
            lambda t: pa.Table.from_pydict(
                {"node": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()])}),
            batch_format="pyarrow"),
        ["node"], {"label": ("node", "min")})
    labels = nodes.materialize()

    prev_sum = None
    for _ in range(max_rounds):
        # edge → min(label[src], label[dst]) for both endpoints
        with_src = safe_join(e, labels, "inner", num_partitions=_np_(),
                          on=("src",), right_on=("node",))
        with_both = safe_join(
            with_src.rename_columns({"label": "l_src"}), labels,
            "inner", num_partitions=_np_(),
            on=("dst",), right_on=("node",))

        def emit(t: pa.Table) -> pa.Table:
            import numpy as np
            ls = t["l_src"].to_numpy(zero_copy_only=False)
            ld = t["label"].to_numpy(zero_copy_only=False)
            m = np.minimum(ls, ld)
            return pa.Table.from_pydict({
                "node": pa.concat_arrays([t["src"].combine_chunks(),
                                          t["dst"].combine_chunks()]),
                "label": pa.array(np.concatenate([m, m])),
            })

        proposals = with_both.map_batches(emit, batch_format="pyarrow")
        labels = grouped_aggregate(proposals.union(labels), ["node"],
                                   {"label": ("label", "min")}).materialize()

        # pointer jumping: label ← label(label), halving chain depth per
        # round → O(log diameter) total rounds instead of O(diameter)
        jumped = safe_join(labels,
            labels.map_batches(
                lambda t: pa.Table.from_pydict(
                    {"jnode": t["node"], "jlabel": t["label"]}),
                batch_format="pyarrow"),
            "inner", num_partitions=_np_(), on=("label",), right_on=("jnode",))

        def jump(t: pa.Table) -> pa.Table:
            import numpy as np
            l1 = t["label"].to_numpy(zero_copy_only=False)
            l2 = t["jlabel"].to_numpy(zero_copy_only=False)
            return pa.Table.from_pydict(
                {"node": t["node"], "label": pa.array(np.minimum(l1, l2))})

        labels = jumped.map_batches(jump, batch_format="pyarrow").materialize()
        s = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if s == prev_sum:
            break
        prev_sum = s
    return labels.map_batches(
        lambda t: pa.Table.from_pydict(
            {"node": t["node"], "component": t["label"]}),
        batch_format="pyarrow")
