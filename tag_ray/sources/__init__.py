"""Table sources. Parquet in-sandbox; the interface is storage-agnostic
so the prod path can swap in ``ray.data.read_lance`` (SURVEY.md §2.1 S1
— no lance wheel available offline)."""

from __future__ import annotations

import os

import ray.data as rd


def table(sf_dir: str, name: str, columns: list[str] | None = None,
          num_blocks: int | None = None) -> rd.Dataset:
    """Read one named table from a scale-factor dir, pruned at the read.

    ``num_blocks`` caps the block count for consumers whose per-block
    work is trivial (map-side-combine aggregates): Ray's default split
    (2×CPUs) pays a per-block handoff that dominates when each block's
    UDF runs ~10 ms (measured: 64→16 blocks cuts the warm lineitem
    read 0.37→0.22 s). Leave None for compute-heavy or shuffle-bound
    consumers."""
    kw = {} if num_blocks is None else {"override_num_blocks": num_blocks}
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                           columns=columns, **kw)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def combine_num_blocks(sf_dir: str, name: str) -> int:
    """Block hint for map-side-combine consumers (per-block UDF ~ms):
    ~CPUs/2 so handoffs don't dominate and read→map fusion isn't
    blocked by SplitBlocks — but never fewer blocks than
    bytes / target_max_block_size, so the cap can't force multi-GB
    blocks on a genuinely large table (at 100 TB the byte floor wins
    and this degrades to Ray's own sizing)."""
    import pyarrow.parquet as pq
    from ray.data import DataContext

    from tag_ray.config import join_num_partitions

    md = pq.ParquetFile(table_path(sf_dir, name)).metadata
    nbytes = sum(md.row_group(i).total_byte_size
                 for i in range(md.num_row_groups))
    target = DataContext.get_current().target_max_block_size \
        or (128 * 1024 * 1024)
    return max(join_num_partitions(), -(-nbytes // target))


def ctable(sf_dir: str, name: str,
           columns: list[str] | None = None) -> rd.Dataset:
    """Capped read (~CPUs/2 blocks, byte-floored — combine_num_blocks):
    the read shape for cheap-UDF consumers (map-side combines, skinny
    derives, signature kernels) whose ~10 ms per-block work would be
    dominated by per-block handoffs at Ray's default 2×CPUs split.
    Compute-heavy stages (winnowing, sketching, contamination) should
    call ``table`` with the default split instead — their per-block UDF
    amortizes handoffs and wants full-width parallelism. One shared
    definition so the capping rule can't drift between pipelines
    (pipelines import it as ``_ctable``)."""
    return table(sf_dir, name, columns=columns,
                 num_blocks=combine_num_blocks(sf_dir, name))


def table_rows(sf_dir: str, name: str) -> int:
    """Exact row count from parquet footer metadata — no data read.

    The cheap size signal the adaptive small-side gates key off
    (functions/keyjoin.py does the same for key-set bytes): at any
    scale this is one footer fetch, never a scan."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(table_path(sf_dir, name)).metadata.num_rows


def read_table(uri: str, columns: list[str] | None = None,
               **kwargs) -> rd.Dataset:
    """Storage-dispatching reader: ``.lance`` datasets go through
    ``ray.data.read_lance`` when the (optional) ``lance`` wheel is
    present; ``.csv`` and ``.json``/``.jsonl`` go through the native
    Ray readers (CSV pruning pushed into Arrow's convert options, JSON
    pruned post-read — the format has no column projection); everything
    else reads as Parquet. All paths surface the same Arrow-block
    Dataset, so pipelines never branch on storage."""
    u = uri.rstrip("/")
    if u.endswith(".lance"):
        try:
            return rd.read_lance(uri, columns=columns, **kwargs)
        except (AttributeError, ImportError) as e:  # no lance offline
            raise RuntimeError(
                "Lance storage requested but the 'lance' wheel is not "
                "installed in this environment") from e
    if u.endswith(".csv"):
        kw = dict(kwargs)
        if columns:
            from pyarrow import csv as pacsv
            kw.setdefault("convert_options",
                          pacsv.ConvertOptions(include_columns=columns))
        return rd.read_csv(uri, **kw)
    if u.endswith((".json", ".jsonl")):
        ds = rd.read_json(uri, **kwargs)
        return ds.select_columns(columns) if columns else ds
    return rd.read_parquet(uri, columns=columns, **kwargs)


def write_table(ds: rd.Dataset, uri: str, **kwargs) -> None:
    """Mirror of read_table for sinks (violations, reports, features)."""
    u = uri.rstrip("/")
    if u.endswith(".lance"):
        try:
            ds.write_lance(uri, **kwargs)
            return
        except (AttributeError, ImportError) as e:
            raise RuntimeError(
                "Lance storage requested but the 'lance' wheel is not "
                "installed in this environment") from e
    if u.endswith(".csv"):
        ds.write_csv(uri, **kwargs)
        return
    if u.endswith((".json", ".jsonl")):
        ds.write_json(uri, **kwargs)
        return
    ds.write_parquet(uri, **kwargs)
