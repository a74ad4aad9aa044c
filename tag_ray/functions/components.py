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


def connected_components(edges: rd.Dataset, a: str, b: str,
                         max_rounds: int = 25) -> rd.Dataset:
    """(a, b) edge Dataset → (node, component) with component = min node
    id reachable; isolated nodes absent from edges are absent here."""
    e = edges.map_batches(
        lambda t: pa.Table.from_pydict(
            {"src": t[a].cast(pa.int64()), "dst": t[b].cast(pa.int64())}),
        batch_format="pyarrow").materialize()

    nodes = (
        e.map_batches(
            lambda t: pa.Table.from_pydict(
                {"node": pa.concat_arrays(
                    [t["src"].combine_chunks(), t["dst"].combine_chunks()])}),
            batch_format="pyarrow")
        .groupby("node").aggregate(Min("node", alias_name="label")))
    labels = nodes.materialize()

    prev_sum = None
    for _ in range(max_rounds):
        # edge → min(label[src], label[dst]) for both endpoints
        with_src = e.join(labels, "inner", num_partitions=8,
                          on=("src",), right_on=("node",))
        with_both = with_src.rename_columns({"label": "l_src"}) \
            .join(labels, "inner", num_partitions=8,
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
        labels = proposals.union(labels) \
            .groupby("node").aggregate(Min("label", alias_name="label")) \
            .materialize()

        # pointer jumping: label ← label(label), halving chain depth per
        # round → O(log diameter) total rounds instead of O(diameter)
        jumped = labels.join(
            labels.map_batches(
                lambda t: pa.Table.from_pydict(
                    {"jnode": t["node"], "jlabel": t["label"]}),
                batch_format="pyarrow"),
            "inner", num_partitions=8, on=("label",), right_on=("jnode",))

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
