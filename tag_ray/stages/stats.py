"""Streaming column-statistics stage: actor pool emitting mergeable partials.

The engine's upgrade of the reference's single-consumer counter maps
(cmd/check/main.go:127-131, SURVEY.md §2.3 T2/T3): per-batch partial
sketches (Welford + t-digest + HLL) flow out-of-band as small
(key, column, sketch-bytes) rows; a tiny groupby merges them. The
partials are the checkpoint artifact — merge-idempotent by construction
(SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tag_ray.functions.sketches import ColumnSketch

PARTIAL_SCHEMA = pa.schema(
    [("key", pa.int32()), ("column", pa.string()), ("sketch", pa.binary())]
)
GLOBAL_KEY = -1


class SketchStats:
    """``map_batches(SketchStats, concurrency=N)`` over numeric columns.

    One partial row per (key, column) per batch; ``key_column=None``
    emits a single global key. Sketch construction is vectorized per
    batch; actor state is only config (cheap), but the actor form keeps
    the option of carrying across-batch partials later.
    """

    def __init__(self, columns: list[str], key_column: str | None = None,
                 delta: int = 128, hll_p: int = 12):
        self.columns = columns
        self.key_column = key_column
        self.delta = delta
        self.hll_p = hll_p

    def _sketch(self, x: np.ndarray) -> bytes:
        s = ColumnSketch(self.delta, self.hll_p)
        s.add_numeric(x)
        return s.to_bytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys_out, cols_out, sk_out = [], [], []
        if self.key_column is None:
            groups = {GLOBAL_KEY: np.arange(batch.num_rows)}
        else:
            kv = batch[self.key_column].to_numpy(zero_copy_only=False)
            groups = {int(k): np.flatnonzero(kv == k) for k in np.unique(kv)}
        for col in self.columns:
            x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            for k, idx in groups.items():
                keys_out.append(k)
                cols_out.append(col)
                sk_out.append(self._sketch(x[idx]))
        return pa.Table.from_pydict(
            {"key": keys_out, "column": cols_out, "sketch": sk_out},
            schema=PARTIAL_SCHEMA,
        )


def merge_partials_group(g: pd.DataFrame) -> pd.DataFrame:
    """groupby((key, column)).map_groups merge → one summary row + merged
    sketch bytes (kept for checkpoint/drift use)."""
    it = iter(g["sketch"])
    acc = ColumnSketch.from_bytes(next(it))
    for b in it:
        acc.merge(ColumnSketch.from_bytes(b))
    s = acc.summary()
    return pd.DataFrame(
        {
            "key": [g["key"].iloc[0]],
            "column": [g["column"].iloc[0]],
            **{k: [v] for k, v in s.items()},
            "sketch": [acc.to_bytes()],
        }
    )


def column_stats(ds, columns: list[str], key_column: str | None = None,
                 batch_size: int = 4096, concurrency=2):
    """Dataset in → small Dataset of per-(key, column) stat rows.

    Pre-aggregation discipline: full rows never shuffle — only
    batch-sized sketch partials enter the groupby (ray_guide
    'Aggregation at scale')."""
    partials = ds.map_batches(
        SketchStats,
        fn_constructor_kwargs={"columns": columns, "key_column": key_column},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return partials.groupby(["key", "column"]).map_groups(
        merge_partials_group, batch_format="pandas")
