"""Flagship pipeline: full constraint sweep over an image+caption table.

The distributed ``cmd/check`` (cmd/check/main.go:39-194): source →
per-record validation → error aggregation — except the source is a
Lance/Parquet table streamed as Arrow blocks, per-record validation is
an actor-pool ``map_batches`` over zero-copy batches, and the
"histogram maps in one consumer goroutine" (main.go:127-131) become
grouped aggregations executed as Ray Data shuffles.

Stages:
  1. read (column-pruned where possible)
  2. RowValidator map_batches  → per-row violation rows
  3. dup_id groupby(image_id)  → multiplicity violations   (main.go:190)
  4. near_dup banded groupby   → phash-cluster violations  (J3 approximate)
  5. union → violations Dataset; per-partition status aggregate
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

from tag_ray.checks.row_checks import RowValidator
from tag_ray.codecs.phash import hamming64, phash_bands
from tag_ray.config import DEFAULT_CONFIG, EngineConfig, scale_concurrency
from tag_ray.schema import VIOLATION_SCHEMA, Check
from tag_ray.functions.joins import safe_join


def keycol_num_blocks() -> int:
    """Block-count hint for skinny key-column reads feeding a shuffle.

    Ray sizes read blocks by BYTES, so a pruned 3-column read of an
    image table yields dozens of near-empty blocks — and sort/groupby
    task counts grow with input×output blocks, turning a tiny shuffle
    into pure orchestration overhead. Cap skinny reads at ~CPUs/2
    blocks (measured 2.5× faster at 32 CPUs on sf0.1)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(8, cpus // 2)


def read_images(path: str, columns: list[str] | None = None,
                partitions: list[int] | None = None,
                num_blocks: int | None = None) -> rd.Dataset:
    """Storage-dispatched read (sources.read_table): Parquet in-sandbox,
    ``ray.data.read_lance`` for ``.lance`` URIs in prod behind the SAME
    call (SURVEY.md §2.1 S1 — no lance wheel offline; the dispatch seam
    is contract-tested in tests/test_lance_seam.py).

    ``partitions`` prunes at the read via predicate pushdown — the
    resume path (tag_ray.job) never re-scans completed partitions."""
    import pyarrow.compute as pc

    from tag_ray.sources import read_table

    filt = None
    if partitions is not None:
        filt = pc.field("partition_id").isin(pa.array(partitions, pa.int32()))
    kwargs = {}
    if num_blocks is not None:
        kwargs["override_num_blocks"] = num_blocks
    return read_table(path, columns=columns, filter=filt, **kwargs)


def load_ref_table(path: str) -> pa.Table:
    import pyarrow.parquet as pq

    return pq.read_table(path)


# Broadcast gate for the reference lookup table (rows; ≈ a few hundred
# MB of (string id, md5) pairs at the limit — the same small-side
# principle as functions/keyjoin.BROADCAST_KEY_LIMIT). Below: one
# ray.put + per-worker RefIndex (zero shuffles). Above (the 10^12-row
# reference): the ref table is NOT broadcastable — the referential +
# caption checks run as a distributed LEFT OUTER hash join instead
# (ref_violations below). Tests force the distributed regime by
# monkeypatching this to 0; both paths emit identical violation rows
# (tests/test_validate_e2e.py::test_ref_distributed_matches_broadcast).
REF_BROADCAST_MAX_ROWS = 4_000_000


def _ref_table_rows(path: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


_REF_HANDLE_MEMO: dict = {}


def load_ref_handle(path: str):
    """Broadcast handle for the reference lookup table, memoized per
    (path, mtime, Ray job): repeated sweeps/shards reuse ONE object-store
    copy instead of re-putting tens of MB per run — and a stable handle
    keeps each worker's lookup-dict cache (row_checks._REF_TASK_CACHE)
    warm across sweeps instead of rebuilding it per sweep per worker."""
    import os

    jid = ray.get_runtime_context().get_job_id() if ray.is_initialized() else None
    key = (os.path.abspath(path), os.path.getmtime(path), jid)
    h = _REF_HANDLE_MEMO.get(key)
    if h is None:
        h = ray.put(load_ref_table(path).select(["image_id", "caption_md5"]))
        _REF_HANDLE_MEMO.clear()
        _REF_HANDLE_MEMO[key] = h
    return h


def row_violations(images: rd.Dataset, cfg: EngineConfig = DEFAULT_CONFIG,
                   ref_table: pa.Table | None = None,
                   ref_handle=None) -> rd.Dataset:
    """Stage 2: stateless suite; reference table broadcast once via
    ray.put (J1 small-side pattern), fetched once per worker not per
    batch.

    Default execution is a TASK pool over Ray's shared warm workers
    (checks/row_checks.make_row_suite_task): successive sweeps reuse
    live worker processes, where a per-Dataset actor pool pays spin-up
    every run and its teardown/spin-up churn between consecutive sweeps
    caused multi-10-second stalls (measured 43.9 s vs a 13-19 s sweep).
    An explicit ``cfg.validate_concurrency`` still selects the actor
    pool (tests pin it for determinism; per-actor memory caps).

    Custom checks registered via checks/registry.py are snapshot here
    and shipped to the workers by value — a user extension needs no
    edit to the built-in suite (SURVEY.md §2.9)."""
    from tag_ray.checks.registry import DEFAULT_REGISTRY

    registry = DEFAULT_REGISTRY if DEFAULT_REGISTRY.checks else None
    if ref_handle is None and ref_table is not None:
        # broadcast the Arrow table (zero-copy into the object store);
        # each worker builds its lookup dict ONCE — in parallel,
        # instead of serially on the driver per run
        ref_handle = ray.put(ref_table.select(["image_id", "caption_md5"]))
    remote_args = {"num_cpus": cfg.validate_actor_num_cpus}
    if cfg.validate_actor_memory is not None:
        remote_args["memory"] = cfg.validate_actor_memory
    common = {"batch_format": "pyarrow", "batch_size": cfg.validate_batch_size,
              "zero_copy_batch": True, **remote_args}
    if cfg.validate_concurrency is not None:
        kwargs = {"cfg": cfg}
        if registry is not None:
            kwargs["registry"] = registry
        if ref_handle is not None:
            kwargs["ref_handle"] = ref_handle
        return images.map_batches(
            RowValidator, fn_constructor_kwargs=kwargs,
            concurrency=scale_concurrency(cfg.validate_concurrency),
            **common)
    from tag_ray.checks.row_checks import make_row_suite_task

    return images.map_batches(
        make_row_suite_task(cfg, ref_handle, registry), **common)


def ref_violations(images: rd.Dataset, ref: rd.Dataset) -> rd.Dataset:
    """Distributed referential + caption checks — the above-the-gate
    regime of the flagship's J1 lookup (SURVEY.md §2.4; the reference's
    manifest-driven sweep, cmd/check/main.go:100-125,160-164).

    One LEFT OUTER hash join of the fact (image_id, caption-md5,
    partition_id) projection against the reference (image_id,
    caption_md5) side: a join miss is a REF_ORPHAN, a hit whose stored
    md5 disagrees with the recomputed caption md5 is a CAPTION_REF —
    byte-identical details to the broadcast RefIndex path
    (checks/row_checks.validate_batch). Null fact ids are skipped
    (they are NULL_FIELD violations already, broadcast-path parity);
    null ref-side ids are ignored; a null stored md5 means "id known,
    caption unchecked", exactly like RefIndex.has. Assumes reference
    ids are unique (the manifest contract; duplicates would fan out
    the join)."""
    import hashlib

    import pyarrow.compute as pc

    from tag_ray.config import join_num_partitions

    def fact_md5(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["image_id"]))
        caps = b["caption"].to_pylist()
        md5s = [None if c is None else hashlib.md5(c.encode()).hexdigest()
                for c in caps]
        return pa.Table.from_pydict({
            "image_id": b["image_id"].cast(pa.string()),
            "partition_id": b["partition_id"].cast(pa.int32()),
            "cap_md5": pa.array(md5s, pa.string())})

    def mark(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["image_id"]))
        return pa.Table.from_pydict({
            "_ref_id": b["image_id"].cast(pa.string()),
            "_ref_md5": b["caption_md5"].cast(pa.string()),
            "_ref_present": pa.array(np.ones(b.num_rows, np.int8))})

    fact = images.map_batches(fact_md5, batch_format="pyarrow")
    marked = ref.map_batches(mark, batch_format="pyarrow")
    joined = safe_join(fact, marked, "left_outer",
                       num_partitions=join_num_partitions(),
                       on=("image_id",), right_on=("_ref_id",))

    def to_violations(b: pa.Table) -> pa.Table:
        present = pc.is_valid(b["_ref_present"]).to_numpy(zero_copy_only=False)
        ids = b["image_id"].to_pylist()
        parts = b["partition_id"].to_pylist()
        got = b["cap_md5"].to_pylist()
        exp = b["_ref_md5"].to_pylist()
        o_ids, o_parts, o_checks, o_details = [], [], [], []
        for i in np.flatnonzero(~present):
            o_ids.append(ids[i])
            o_parts.append(parts[i])
            o_checks.append(Check.REF_ORPHAN)
            o_details.append("id not in reference table")
        for i in np.flatnonzero(present):
            if got[i] is not None and exp[i] is not None and got[i] != exp[i]:
                o_ids.append(ids[i])
                o_parts.append(parts[i])
                o_checks.append(Check.CAPTION_REF)
                o_details.append(f"md5={got[i][:8]} expected={exp[i][:8]}")
        return pa.Table.from_pydict(
            {"image_id": o_ids, "partition_id": o_parts,
             "check": o_checks, "detail": o_details},
            schema=VIOLATION_SCHEMA)

    return joined.map_batches(to_violations, batch_format="pyarrow")


def dup_violations(images: rd.Dataset) -> rd.Dataset:
    """Stage 3: exact uniqueness on image_id — groupby multiplicity
    (the ``hashes[h]++`` histogram, cmd/check/main.go:190). Expects a
    dataset pruned to (image_id, partition_id) at the read — the binary
    payload must never enter this shuffle.

    Shuffles on a coarse int32 hash bucket of the id (every id lands
    wholly in one bucket) rather than the string id itself: the sort
    exchange moves/compares int32 keys, and multiplicity inside a
    bucket is one C-level pandas groupby — the same whole-bucket
    pattern as the near-dup stage, identical results to the per-id
    groupby."""
    from tag_ray.functions.grouping import COARSE_COL, default_num_buckets
    from tag_ray.functions.hashing import hash_strings64

    buckets = default_num_buckets()

    def add_coarse(b: pa.Table) -> pa.Table:
        h = hash_strings64(b["image_id"].to_pylist())
        return b.append_column(
            COARSE_COL, pa.array((h % np.uint64(buckets)).astype(np.int32)))

    def bucket_dups(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby("image_id", sort=True).agg(
            n=("partition_id", "size"), pid=("partition_id", "min"))
        dup = agg[agg["n"] > 1].reset_index()
        # emit Arrow with the exact violation schema so the downstream
        # union with the other (Arrow-block) families needs no cast
        return pa.Table.from_pydict({
            "image_id": dup["image_id"].to_numpy(dtype=object),
            "partition_id": dup["pid"].to_numpy(dtype="int32"),
            "check": [Check.DUP_ID] * len(dup),
            "detail": dup["n"].astype("int64").astype(str).to_numpy(dtype=object),
        }, schema=VIOLATION_SCHEMA)

    return (images.map_batches(add_coarse, batch_format="pyarrow")
            .groupby(COARSE_COL)
            .map_groups(bucket_dups, batch_format="pandas"))


_ND_GROUP_CAP = 50_000  # skew guard: cap on one (band, value) run


def _nd_members_bucket(g: pd.DataFrame, max_hamming: int,
                       cap: int = _ND_GROUP_CAP) -> pd.DataFrame:
    """All ids in one COARSE bucket participating in a near-dup pair.

    Processes every (band_id, band_val) run of the bucket in one pass:
    sort, run-detect, build all within-run pair indices (index
    arithmetic only — runs with pairs are a small minority), then ONE
    vectorized Hamming call over every pair at once. Replaces the
    per-run pandas slice + Python call, which dominated the 8-CPU
    flagship profile (per-run fn: ~13 s of a 41 s stage at 200k rows).

    A pathological run larger than ``cap`` (e.g. constant-band images)
    is truncated rather than silently exploding — skew handled
    explicitly per north_rule."""
    band_id = g["band_id"].to_numpy()
    band_val = g["band_val"].to_numpy()
    ids = g["image_id"].to_numpy()
    ph = g["phash"].to_numpy(dtype=np.int64)
    parts = g["partition_id"].to_numpy()

    def runs(bi, bv):
        new = np.empty(len(bi), dtype=bool)
        new[0] = True
        new[1:] = (bi[1:] != bi[:-1]) | (bv[1:] != bv[:-1])
        return new

    order = np.lexsort((ids, band_val, band_id))
    band_id, band_val, ids, ph, parts = (
        a[order] for a in (band_id, band_val, ids, ph, parts))
    new = runs(band_id, band_val)
    # drop duplicate image_id within a run (injected exact-dup rows)
    dup = np.zeros(len(ids), dtype=bool)
    dup[1:] = ~new[1:] & (ids[1:] == ids[:-1])
    if dup.any():
        keep = ~dup
        band_id, band_val, ids, ph, parts = (
            a[keep] for a in (band_id, band_val, ids, ph, parts))
        # no runs() recompute: run_pair_indices re-derives run bounds
        # itself — the second pass was pure wasted work in the hot path
    n = len(ids)
    from tag_ray.functions.grouping import run_pair_indices

    # size-class-batched pair indices (one triu per distinct run size)
    pi, pj = run_pair_indices([band_id, band_val], cap=cap)
    if pi.size == 0:
        return pd.DataFrame({"image_id": [], "partition_id": []})
    hit = hamming64(ph[pi], ph[pj]) <= max_hamming
    member = np.zeros(n, dtype=bool)
    member[pi[hit]] = True
    member[pj[hit]] = True
    return pd.DataFrame({"image_id": ids[member], "partition_id": parts[member]})


def near_dup_violations(images: rd.Dataset,
                        cfg: EngineConfig = DEFAULT_CONFIG) -> rd.Dataset:
    """Stage 4: approximate near-dup via banded phash LSH.

    shingle→band explode (vectorized, 4× small rows, coarse bucket id
    attached inline) → shuffle on the coarse bucket only → whole-bucket
    vectorized Hamming (_nd_members_bucket) → global distinct on
    image_id. Full recall for Hamming ≤ 3 by pigeonhole
    (codecs/phash.py:phash_bands); every (band, value) run lands wholly
    in one bucket, so results equal the per-fine-key groupby."""
    from tag_ray.functions.grouping import (COARSE_COL, _combined_key,
                                            default_num_buckets)

    buckets = default_num_buckets()
    # pigeonhole: d+1 bands give full recall at Hamming ≤ d; extra bands
    # only add shuffle volume and chance collisions (16-bit bands on a
    # 200k corpus collide ~3 rows/value by birthday; 21-bit bands ~0.1)
    n_bands = cfg.near_dup_max_hamming + 1

    def explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.is_valid(batch["phash"]))
        if batch.num_rows == 0:
            return pa.Table.from_pydict(
                {"band_id": pa.array([], pa.int32()), "band_val": pa.array([], pa.int64()),
                 "image_id": pa.array([], pa.string()), "phash": pa.array([], pa.int64()),
                 "partition_id": pa.array([], pa.int32()),
                 COARSE_COL: pa.array([], pa.int32())})
        ph = batch["phash"].to_numpy(zero_copy_only=False).astype(np.int64)
        bands = phash_bands(ph, n_bands)
        pieces = []
        for b in range(n_bands):
            piece = pa.Table.from_pydict({
                "band_id": pa.array(np.full(len(ph), b, np.int32)),
                "band_val": pa.array(bands[:, b]),
                "image_id": batch["image_id"],
                "phash": batch["phash"],
                "partition_id": batch["partition_id"],
            })
            h = _combined_key(piece, ["band_id", "band_val"])
            pieces.append(piece.append_column(
                COARSE_COL, pa.array((h % np.uint64(buckets)).astype(np.int32))))
        return pa.concat_tables(pieces)

    exploded = images.map_batches(explode, batch_format="pyarrow")
    members = exploded.groupby(COARSE_COL).map_groups(
        lambda g: _nd_members_bucket(g.drop(columns=[COARSE_COL]),
                                     cfg.near_dup_max_hamming),
        batch_format="pandas")
    # distinct member ids (an id can appear via several bands);
    # grouped_aggregate — image_id cardinality scales with the corpus
    from tag_ray.functions.grouping import grouped_aggregate

    distinct = grouped_aggregate(members, ["image_id"],
                                 {"pid": ("partition_id", "min")})

    def to_violations(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "image_id": batch["image_id"],
                "partition_id": batch["pid"].cast(pa.int32()),
                "check": pa.array([Check.NEAR_DUP] * batch.num_rows, pa.string()),
                "detail": pa.array(["pair"] * batch.num_rows, pa.string()),
            },
            schema=VIOLATION_SCHEMA,
        )

    return distinct.map_batches(to_violations, batch_format="pyarrow")


def validate(images_path: str, ref_path: str | None = None,
             cfg: EngineConfig = DEFAULT_CONFIG,
             partitions: list[int] | None = None) -> rd.Dataset:
    """Full sweep → one violations Dataset (union of all check families).

    Each branch gets its own column-pruned read: the MB-scale ``bytes``
    column is read exactly once (row suite) and never enters a shuffle;
    the groupby branches read only their 2-3 key columns.

    ``partitions`` restricts the sweep (resume path). NOTE: dup/near-dup
    checks then only see those partitions — cross-shard duplicates are
    caught by the job's final full-table pass over pruned key columns.

    The three families run as THREE CONCURRENT streaming executions
    (one driver thread each, each materialized — outputs are violation
    rows, small by design), NOT as one 3-branch union topology: a fixed
    actor pool plus two all-to-all ops inside a single execution starve
    each other on small clusters (observed wedging at 8 CPUs), but
    separate executions time-share the scheduler cleanly. Overlap
    matters for scaling: the row suite is compute-bound and scales at
    the hardware ceiling, while the dup/near-dup shuffles carry ~1 s of
    fixed orchestration each that would otherwise sit on the critical
    path at every cluster size (measured: sequential 16.3 s vs
    overlapped ~12.5 s at 32 CPUs on the 800k corpus — the shuffle
    stages hide entirely behind the decode suite)."""
    from concurrent.futures import ThreadPoolExecutor

    # byte-gated reference lookup (VERDICT r3 "What's wrong" #3): below
    # the gate, ONE broadcast RefIndex inside the row suite (zero
    # shuffles); above it — a 10^12-row reference is not broadcastable —
    # the referential+caption checks become a fourth concurrent branch
    # running a distributed LEFT OUTER hash join (ref_violations)
    ref_broadcast = (ref_path is not None
                     and _ref_table_rows(ref_path) <= REF_BROADCAST_MAX_ROWS)
    ref_handle = load_ref_handle(ref_path) if ref_broadcast else None
    nb = keycol_num_blocks()
    # plan construction stays sequential — read_parquet schema inference
    # trips a thread-unsafe lazy fsspec import when three reads are
    # created at once; only the materializations overlap
    rows_ds = row_violations(
        read_images(images_path, partitions=partitions), cfg,
        ref_handle=ref_handle)
    dup_ds = dup_violations(
        read_images(images_path, columns=["image_id", "partition_id"],
                    partitions=partitions, num_blocks=nb))
    near_ds = near_dup_violations(
        read_images(images_path, columns=["image_id", "phash", "partition_id"],
                    partitions=partitions, num_blocks=nb), cfg)
    branches = [rows_ds, dup_ds, near_ds]
    if ref_path is not None and not ref_broadcast:
        from tag_ray.sources import read_table

        branches.append(ref_violations(
            read_images(images_path,
                        columns=["image_id", "caption", "partition_id"],
                        partitions=partitions, num_blocks=nb),
            read_table(ref_path, columns=["image_id", "caption_md5"])))
    with ThreadPoolExecutor(max_workers=len(branches)) as ex:
        mats = [f.result()
                for f in [ex.submit(b.materialize) for b in branches]]
    out = mats[0]
    for m in mats[1:]:
        out = out.union(m)
    return out


def partition_status(images_path: str, violations: rd.Dataset) -> pd.DataFrame:
    """Per-partition pass/fail matrix — the analogue of the reference's
    golden ``testMetadata`` matrix (tag_test.go:55-84), aggregated.

    Small result (one row per partition) → driver-side join is fine."""
    rows = (
        read_images(images_path, columns=["partition_id"],
                    num_blocks=keycol_num_blocks())
        .groupby("partition_id").aggregate(Count(alias_name="rows"))
        .to_pandas()
    )
    viol = (
        violations.groupby("partition_id").aggregate(Count(alias_name="violation_count"))
        .to_pandas()
    )
    out = rows.merge(viol, on="partition_id", how="left")
    out["violation_count"] = out["violation_count"].fillna(0).astype("int64")
    out["pass"] = out["violation_count"] == 0
    out["rows"] = out["rows"].astype("int64")
    return out.sort_values("partition_id")[
        ["partition_id", "rows", "pass", "violation_count"]
    ].reset_index(drop=True)


# ---------------------------------------------------------------------------
# Image similarity search: top-k nearest stored phashes to a query
# image, by Hamming distance. The image-side mirror of
# embeddings.emb_cosine_topk: a skinny (image_id, phash) read, one
# vectorized XOR-popcount per batch, associative per-batch partial
# top-k (k rows per block cross the wire, never the corpus), exact
# driver merge. Deterministic ties: (distance, image_id) ascending.


def phash_topk(images_path: str, query_image_id: str,
               k: int = 10) -> "pd.DataFrame":
    import pandas as pd
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from tag_ray.codecs.phash import hamming64

    # query row via a row-filtered pruned read — never a full-table scan
    q = pads.dataset(images_path).to_table(
        columns=["phash"],
        filter=pc.field("image_id") == query_image_id)
    if q.num_rows == 0:
        raise KeyError(f"unknown image_id {query_image_id!r}")
    qhash = np.int64(q["phash"][0].as_py())

    def partial_topk(b: pa.Table) -> pa.Table:
        ids = b["image_id"].to_numpy(zero_copy_only=False)
        keep = ids != query_image_id
        ids = ids[keep]
        hs = b["phash"].to_numpy(zero_copy_only=False)[keep]
        d = hamming64(hs, np.full(len(hs), qhash))
        if len(d) > k:
            # keep everything at or under the k-th distance — ties at
            # the cutoff must ALL survive the partial, or the driver
            # merge could miss the winner of an id tiebreak
            kth = np.partition(d, k - 1)[k - 1]
            idx = np.flatnonzero(d <= kth)
        else:
            idx = np.arange(len(d))
        sel = idx[np.lexsort((ids[idx], d[idx]))]
        return pa.Table.from_pydict({
            "image_id": pa.array(ids[sel]),
            "hamming": pa.array(d[sel].astype(np.int64))})

    parts = read_images(images_path, columns=["image_id", "phash"]) \
        .map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["hamming", "image_id"], kind="mergesort")
    return parts.head(k).reset_index(drop=True)
