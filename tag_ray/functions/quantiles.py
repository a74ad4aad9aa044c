"""Exact grouped quantiles via mergeable value histograms.

For value columns with bounded distinct values (quantities, lengths,
scores on a grid) the exact quantile needs no sort: per-batch
(key, value) → count partials merge exactly in any order, the exchange
carries histogram cells (dictionary-sized, never row-sized), and the
quantile is interpolated from cumulative counts on the driver.

``_interp`` replicates DuckDB ``quantile_cont`` bit-for-bit:
``lo*(ceil(h)-h) + hi*(h-floor(h))`` with ``h=(n-1)·q`` (the recipe
pinned in CLAUDE.md; any oracle-compared quantile MUST go through this
one implementation — a second copy once drifted and hash-mismatched)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _interp(vals: np.ndarray, cum: np.ndarray, p: float) -> float:
    n = cum[-1]
    h = (n - 1) * p
    fl, ce = np.floor(h), np.ceil(h)
    lo = vals[np.searchsorted(cum, fl, side="right")]
    hi = vals[np.searchsorted(cum, ce, side="right")]
    if fl == ce:
        return float(lo)
    return float(lo * (ce - h) + hi * (h - fl))


def grouped_histogram_quantiles(ds: rd.Dataset, key_col: str, val_col: str,
                                probs: dict[str, float],
                                row_cap: int = 100_000) -> pd.DataFrame:
    """One row per distinct ``key_col``: ``n`` plus one column per
    ``probs`` entry (name → quantile). Exact for any value column whose
    (key, value) cell count fits the driver (bounded dictionaries)."""
    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key_col: b[key_col].to_pandas(),
            "v": b[val_col].to_numpy(zero_copy_only=False)})
        # NULL values: quantile_cont ignores them but COUNT(*) does not
        # — carry them as explicit null-cells so ``n`` mirrors COUNT(*)
        g = df.groupby([key_col, "v"], sort=False, dropna=False) \
              .size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    # bounded driver collect (ADVICE r4): the partial stream is
    # O(blocks × cells-per-block) unmerged rows — fine at today's block
    # counts, but the driver term grows with blocks × value grid at
    # north-star scale. collect_partial_sums pre-combines one tree
    # level inside the dataset above its row cap; integer counts merge
    # associatively so the result is bit-identical either way.
    from tag_ray.functions.grouping import collect_partial_sums

    parts = collect_partial_sums(
        ds.map_batches(partial, batch_format="pyarrow"), [key_col, "v"],
        ["n"], row_cap=row_cap)
    if parts.empty:
        # 0-row Datasets lose their schema through to_pandas() (columns
        # []) — collapse to the typed empty result before the groupby
        out = {key_col: pd.Series([], dtype=object),
               "n": pd.Series([], dtype="int64")}
        for name in probs:
            out[name] = pd.Series([], dtype=float)
        return pd.DataFrame(out)
    hist = parts.groupby([key_col, "v"], sort=True, dropna=False)["n"] \
                .sum().reset_index()

    rows = []
    for key, g in hist.groupby(key_col, sort=True):
        null_mask = g["v"].isna().to_numpy()
        gv = g[~null_mask]
        vals = gv["v"].to_numpy()
        cum = gv["n"].to_numpy().cumsum()
        row = {key_col: key, "n": int(g["n"].sum())}
        for name, p in probs.items():
            row[name] = _interp(vals, cum, p) if len(vals) else float("nan")
        rows.append(row)
    return pd.DataFrame(rows)
