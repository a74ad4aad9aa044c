"""Salted two-phase aggregation for skewed grouping keys.

north_rule requires skew "handled explicitly": a groupby on a key with
few hot values (event_type: 5 distinct, caption: zipf-distributed)
funnels every row of a hot key through ONE reducer — at 10^12 rows that
single task is the job. Standard fix (SURVEY.md §4):

  phase 1: groupby((key, salt)) with salt = stable_hash(row key') % S
           → S partial rows per hot key, spread over S reducers
  phase 2: groupby(key) merges the S partials — tiny input

Supported aggregate kinds and their merge rules:
  count → sum of partial counts          sum → sum of partial sums
  min   → min of partial mins            max → max of partial maxes
  mean  → (sum of sums) / (sum of counts), decomposed automatically

Results are exactly equal to the unsalted groupby (tested both paths,
SURVEY.md §7 hard part 4); Ray Data's own per-block pre-aggregation
already helps counts, but salting also covers map_groups-style custom
logic and keeps EVERY reducer bounded by total_rows/S.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from tag_ray.functions.hashing import bucket_of

SALT_COL = "_salt"


def salted_aggregate(ds: rd.Dataset, key: str,
                     specs: list[tuple[str, str | None, str]],
                     salt_buckets: int = 8,
                     salt_source: str | None = None) -> rd.Dataset:
    """``specs``: (kind, column, alias) with kind in
    {count, sum, min, max, mean}; column ignored for count.

    ``salt_source``: column whose hash spreads the hot key (default: a
    per-batch round-robin — deterministic given block layout is not
    required since the salt only routes rows, never changes results)."""
    for kind, _c, _a in specs:
        if kind not in ("count", "sum", "min", "max", "mean"):
            raise ValueError(f"unsupported aggregate kind: {kind}")

    mean_cols = [(col, alias) for kind, col, alias in specs if kind == "mean"]

    def add_salt(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if salt_source is not None:
            salt = bucket_of(b[salt_source], salt_buckets)
        else:
            salt = (np.arange(b.num_rows) % salt_buckets).astype(np.int32)
        b = b.append_column(SALT_COL, pa.array(salt))
        # mean = Sum(col)/Count(non-null col): Sum ignores nulls, so the
        # denominator must too — a per-row validity indicator summed in
        # phase 1 keeps salted mean exactly equal to the plain groupby
        # mean even with null values (ADVICE r1).
        for col, alias in mean_cols:
            b = b.append_column(
                f"{alias}__valid", pc.is_valid(b[col]).cast(pa.int64()))
        return b

    phase1_aggs = []
    for kind, col, alias in specs:
        if kind == "count":
            phase1_aggs.append(Count(alias_name=f"{alias}__cnt"))
        elif kind == "sum":
            phase1_aggs.append(Sum(col, alias_name=f"{alias}__sum"))
        elif kind == "min":
            phase1_aggs.append(Min(col, alias_name=f"{alias}__min"))
        elif kind == "max":
            phase1_aggs.append(Max(col, alias_name=f"{alias}__max"))
        elif kind == "mean":
            phase1_aggs.append(Sum(col, alias_name=f"{alias}__msum"))
            phase1_aggs.append(Sum(f"{alias}__valid", alias_name=f"{alias}__mcnt"))

    partial = ds.map_batches(add_salt, batch_format="pyarrow") \
        .groupby([key, SALT_COL]).aggregate(*phase1_aggs)

    phase2_aggs = []
    for kind, col, alias in specs:
        if kind == "count":
            phase2_aggs.append(Sum(f"{alias}__cnt", alias_name=alias))
        elif kind == "sum":
            phase2_aggs.append(Sum(f"{alias}__sum", alias_name=alias))
        elif kind == "min":
            phase2_aggs.append(Min(f"{alias}__min", alias_name=alias))
        elif kind == "max":
            phase2_aggs.append(Max(f"{alias}__max", alias_name=alias))
        elif kind == "mean":
            phase2_aggs.append(Sum(f"{alias}__msum", alias_name=f"{alias}__tsum"))
            phase2_aggs.append(Sum(f"{alias}__mcnt", alias_name=f"{alias}__tcnt"))

    merged = partial.groupby(key).aggregate(*phase2_aggs)

    mean_aliases = [(a, f"{a}__tsum", f"{a}__tcnt")
                    for k, _c, a in specs if k == "mean" for a in [a]]
    if not mean_aliases:
        return merged

    def finalize(b: pa.Table) -> pa.Table:
        for alias, s, c in mean_aliases:
            with np.errstate(invalid="ignore", divide="ignore"):
                vals = b[s].to_numpy(zero_copy_only=False) \
                    / b[c].to_numpy(zero_copy_only=False)
            b = b.append_column(alias, pa.array(vals))
            b = b.drop_columns([s, c])
        return b

    return merged.map_batches(finalize, batch_format="pyarrow")
