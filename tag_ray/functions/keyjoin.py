"""Byte-gated semi/anti join on a key column.

The referential / EXISTS checks (SURVEY.md §2.4 J1/J2 — the role the
reference's manifest lookup plays, /root/reference/cmd/check/main.go)
filter a fact table by membership of one key column in a dimension key
set. Two regimes:

* **broadcast** (small side fits one process): distinct keys collected
  once, shipped via ``ray.put``, membership is one zero-copy
  ``pc.is_in`` kernel per batch — no shuffle at all;
* **distributed** (10^12-row dimension: the key set does NOT fit the
  driver): the key side stays a Dataset — distinct keys via the coarse
  hash-bucket aggregate, marked ``_present=1``, LEFT OUTER hash-joined
  onto the fact side, then one validity filter per batch. Both sides
  shuffle once on the key; the driver never sees a key.

The gate is an estimated ROW COUNT the caller supplies (parquet
metadata is free) or, absent that, a metadata ``count()`` of the key
Dataset; the limit corresponds to tens of MB of int64 keys — the same
small-side principle as functions/verify.py's feature-bytes gate.
Results are identical on both paths (pinned by tests/test_keyjoin.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from tag_ray.config import join_num_partitions
from tag_ray.functions.joins import safe_join

# ≈ 32 MB of int64 keys on the driver / per worker via plasma — far
# under worker heap, far over every sandbox scale factor. Tests force
# the distributed path by passing broadcast_limit=0.
BROADCAST_KEY_LIMIT = 4_000_000

_PRESENT = "_kj_present"
_KEY = "_kj_key"


def collect_distinct_keys(keys_ds: rd.Dataset, key_col: str) -> pa.Array:
    """Stream the (gated-small) key column to one distinct Arrow array."""
    chunks: list[pa.Array] = []
    for t in keys_ds.select_columns([key_col]).iter_batches(
            batch_format="pyarrow", batch_size=None):
        chunks.append(pc.unique(pc.drop_null(t[key_col].combine_chunks())))
    if not chunks:
        return pa.array([], pa.int64())
    return pc.unique(pa.concat_arrays(chunks))


def _broadcast_filter(ds: rd.Dataset, col: str, keys: pa.Array,
                      anti: bool) -> rd.Dataset:
    handle = ray.put(keys)

    def fn(b: pa.Table) -> pa.Table:
        ks = ray.get(handle)  # zero-copy plasma read per batch
        m = pc.is_in(b[col], value_set=ks)
        return b.filter(pc.invert(m) if anti else m)

    return ds.map_batches(fn, batch_format="pyarrow")


def _distributed_filter(ds: rd.Dataset, col: str, keys_ds: rd.Dataset,
                        key_col: str, anti: bool) -> rd.Dataset:
    from tag_ray.functions.grouping import grouped_aggregate

    # distinct keys (high-cardinality ⇒ coarse buckets, never native
    # aggregate), marked with a presence flag under a private name so
    # no fact column can collide
    distinct = grouped_aggregate(
        keys_ds.map_batches(
            lambda b: pa.Table.from_pydict(
                {_KEY: pc.drop_null(b[key_col].combine_chunks())}),
            batch_format="pyarrow"),
        [_KEY], {_PRESENT: (None, "count")})
    marked = distinct.map_batches(
        lambda b: pa.Table.from_pydict({
            _KEY: b[_KEY],
            _PRESENT: pa.array(np.ones(b.num_rows, np.int8))}),
        batch_format="pyarrow")

    out_cols = ds.columns()
    if _KEY in out_cols or _PRESENT in out_cols:
        raise ValueError(
            f"fact table uses reserved keyjoin columns: {out_cols}")
    # materialize once: the count below and the join both consume it
    marked = marked.materialize()
    # a 0-row right side is legal (e.g. a filter that matched nothing):
    # semi → nothing survives, anti → everything does — short-circuit
    # instead of handing an empty dataset to the hash join
    if marked.count() == 0:
        if anti:
            return ds
        return ds.map_batches(lambda b: b.slice(0, 0),
                              batch_format="pyarrow")
    joined = safe_join(ds, marked, "left_outer",
                     num_partitions=join_num_partitions(),
                     on=(col,), right_on=(_KEY,))

    def pick(b: pa.Table) -> pa.Table:
        # NULL fact keys match nothing on either path (pc.is_in(null)
        # is false; an outer join key of null joins nothing): semi
        # drops them, anti KEEPS them — a null foreign key IS an
        # orphan. Deliberately not ANSI NOT-IN's null-propagation.
        present = pc.is_valid(b[_PRESENT])
        return b.filter(pc.invert(present) if anti else present) \
            .select(out_cols)

    return joined.map_batches(pick, batch_format="pyarrow")


def filter_by_key_set(ds: rd.Dataset, col: str, keys_ds: rd.Dataset,
                      key_col: str, *, anti: bool = False,
                      est_rows: int | None = None,
                      broadcast_limit: int | None = None) -> rd.Dataset:
    """Rows of ``ds`` whose ``col`` is (``anti``: is NOT) in
    ``keys_ds[key_col]``.

    ``keys_ds`` should be projected to (at least) the key column;
    multiplicity is ignored (set semantics). Null handling, identical
    on both paths and pinned by tests: null KEY-SIDE rows are ignored
    (a referential check's key set is the non-null id universe — the
    ANSI "NOT IN with a NULL never matches" footgun is deliberately
    not reproduced), and a null FACT key matches nothing — semi drops
    it, anti reports it (a null foreign key IS an orphan). ``est_rows``
    is a cheap UPPER BOUND on the key-side row count (parquet
    metadata) used for the gate — absent, a metadata ``count()`` of
    ``keys_ds`` decides.
    """
    limit = BROADCAST_KEY_LIMIT if broadcast_limit is None else broadcast_limit
    n = est_rows if est_rows is not None else keys_ds.count()
    if n <= limit:
        keys = collect_distinct_keys(keys_ds, key_col)
        # 0-key short-circuit, mirroring the distributed path: the
        # collected placeholder is typed int64 regardless of the key
        # column's type, and pc.is_in raises on a type mismatch
        if len(keys) == 0:
            if anti:
                return ds
            return ds.map_batches(lambda b: b.slice(0, 0),
                                  batch_format="pyarrow")
        return _broadcast_filter(ds, col, keys, anti)
    return _distributed_filter(ds, col, keys_ds, key_col, anti)
