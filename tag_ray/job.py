"""Resumable validation job: ``python -m tag_ray.job --images ... --out ...``.

The engine-scale analogue of ``cmd/check`` (cmd/check/main.go:39-194)
with the checkpointing the reference lacks (it reruns from scratch;
SURVEY.md §4 "Checkpoint / resume"). Submitted unchanged via
``ray job submit -- python -m tag_ray.job ...`` on a real cluster; the
driver loop below only coordinates shards — all heavy work is Ray Data
streaming execution.

Plan per run:
  1. enumerate input partitions (distinct ``partition_id``); subtract
     partitions already recorded in ``out/lineage/`` (resume)
  2. for each shard of K pending partitions:
       - predicate-pushdown read of just that shard
       - row-constraint suite (actor pool, zero-copy Arrow) → violations
         written to ``violations/shard=S/`` (partitioned, resumable)
       - per-partition mergeable ColumnSketch partials → ``sketches/``
       - per-partition lineage record (rows, violations, wall_s) written
         ATOMICALLY only after the shard's writes finished
  3. cross-partition checks (exact dup on image_id, phash near-dup) run
     once over the FULL table's pruned key columns (image_id, phash,
     partition_id — a few bytes/row, so a resumed rerun is cheap and
     always sees all partitions) → ``violations/global/``
  4. merge sketch partials → drift report + ``_SUMMARY.json``

Crash at any point: rerun with the same ``--out`` and only unfinished
shards are reprocessed (step 3/4 recompute — they are O(key columns)).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import time

import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count

from tag_ray.config import DEFAULT_CONFIG, EngineConfig, scale_concurrency
from tag_ray.pipelines import validate as V
from tag_ray.stages.stats import column_stats
from tag_ray.state import LineageRecord, LineageStore

SKETCH_COLUMNS = ["w", "h", "phash"]


def _config_fingerprint(cfg: EngineConfig) -> str:
    return hashlib.sha1(repr(cfg).encode()).hexdigest()[:12]


def list_partitions(images_path: str) -> list[int]:
    """Distinct partition ids via a column-pruned scan.

    On a real Lance/Hive-partitioned table this comes from table
    metadata without a scan; the sandbox parquet corpus is small enough
    that a single-column scan is the honest stand-in."""
    from tag_ray.functions.grouping import grouped_aggregate

    ds = V.read_images(images_path, columns=["partition_id"],
                       num_blocks=V.keycol_num_blocks())
    # grouped_aggregate, not native groupby: the key is O(partitions)-
    # cardinal and Ray's native aggregate pays a Python accumulate per
    # distinct group (CLAUDE.md lesson). The per-shard aggregates in
    # run_shard stay native — their group count is bounded by
    # shard_size, never the corpus.
    out = grouped_aggregate(ds, ["partition_id"],
                            {"n": (None, "count")}).to_pandas()
    return sorted(int(p) for p in out["partition_id"])


def run_shard(images_path: str, ref_path: str | None, out_dir: str,
              shard_idx: int, partitions: list[int], store: LineageStore,
              cfg: EngineConfig) -> None:
    t0 = time.perf_counter()
    shard_dir = os.path.join(out_dir, "violations", f"shard={shard_idx}")
    # A crash between a shard's writes and its lineage record reruns the
    # shard on resume; clear any partial output first so write_parquet's
    # append mode can never double the shard's rows (ADVICE r1).
    shutil.rmtree(shard_dir, ignore_errors=True)

    images = V.read_images(images_path, partitions=partitions)
    ref_handle = V.load_ref_handle(ref_path) if ref_path else None
    viols = V.row_violations(images, cfg, ref_handle=ref_handle).materialize()
    viols.write_parquet(shard_dir)

    # mergeable sketch partials, keyed by partition (checkpoint artifact)
    sk = column_stats(
        V.read_images(images_path, columns=SKETCH_COLUMNS + ["partition_id"],
                      partitions=partitions),
        SKETCH_COLUMNS, key_column="partition_id",
        batch_size=cfg.stats_batch_size, concurrency=scale_concurrency(cfg.stats_concurrency))
    sk_dir = os.path.join(out_dir, "sketches", f"shard={shard_idx}")
    shutil.rmtree(sk_dir, ignore_errors=True)
    sk.write_parquet(sk_dir)

    # per-partition metrics for lineage
    rows_pp = (
        V.read_images(images_path, columns=["partition_id"], partitions=partitions)
        .groupby("partition_id").aggregate(Count(alias_name="rows")).to_pandas())
    v_pp = (viols.groupby("partition_id").aggregate(Count(alias_name="v"))
            .to_pandas().set_index("partition_id")["v"] if viols.count() else {})
    wall = time.perf_counter() - t0
    fp = _config_fingerprint(cfg)
    for _, r in rows_pp.iterrows():
        pid = int(r["partition_id"])
        store.record(LineageRecord(
            partition_id=pid, rows=int(r["rows"]),
            violation_count=int(v_pp.get(pid, 0)) if len(v_pp) else 0,
            wall_s=round(wall / max(len(rows_pp), 1), 3),
            shard=shard_idx, config_fingerprint=fp))


def run_global_checks(images_path: str, out_dir: str, cfg: EngineConfig) -> int:
    """Cross-partition dup + near-dup over pruned key columns only."""
    nb = V.keycol_num_blocks()
    v_dup = V.dup_violations(
        V.read_images(images_path, columns=["image_id", "partition_id"],
                      num_blocks=nb))
    v_near = V.near_dup_violations(
        V.read_images(images_path, columns=["image_id", "phash", "partition_id"],
                      num_blocks=nb),
        cfg)
    both = v_dup.union(v_near).materialize()
    gdir = os.path.join(out_dir, "violations", "global")
    shutil.rmtree(gdir, ignore_errors=True)  # finalize-crash rerun safety
    both.write_parquet(gdir)
    return both.count()


def merge_sketches(out_dir: str) -> None:
    """Merge per-shard partials into one checkpoint table (idempotent)."""
    import glob

    sk_root = os.path.join(out_dir, "sketches")
    shards = sorted(glob.glob(os.path.join(sk_root, "shard=*", "*.parquet")))
    if not shards:
        return
    from tag_ray.functions.grouping import coarse_grouped_apply
    from tag_ray.stages.stats import merge_partials_group

    ds = rd.read_parquet(shards)
    # coarse buckets, not native groupby().map_groups: the key is
    # (partition × column)-cardinal (VERDICT r4 item 5). min_size=1 —
    # a column with a single shard partial must still pass through the
    # merge (map_groups semantics), never be dropped.
    merged = coarse_grouped_apply(ds, ["key", "column"],
                                  merge_partials_group, min_size=1)
    mdir = os.path.join(sk_root, "merged")
    shutil.rmtree(mdir, ignore_errors=True)  # recomputed from partials, never appended
    merged.write_parquet(mdir)


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--ref", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--shard-size", type=int, default=4,
                    help="input partitions per shard (checkpoint granularity)")
    ap.add_argument("--max-shards", type=int, default=None,
                    help="stop after N shards (crash-simulation for tests)")
    args = ap.parse_args(argv)
    cfg = DEFAULT_CONFIG

    store = LineageStore(args.out)
    all_parts = list_partitions(args.images)
    done = store.done_partitions()
    pending = [p for p in all_parts if p not in done]
    shards = [pending[i:i + args.shard_size]
              for i in range(0, len(pending), args.shard_size)]
    if args.max_shards is not None:
        shards = shards[: args.max_shards]

    base = max((r.shard for r in store.load()), default=-1) + 1
    for i, shard in enumerate(shards):
        run_shard(args.images, args.ref, args.out, base + i, shard, store, cfg)

    summary: dict = {"resumed_partitions": len(done),
                     "processed_partitions": sum(len(s) for s in shards)}
    summary_path = os.path.join(args.out, "_SUMMARY.json")
    if len(store.done_partitions()) == len(all_parts):
        if os.path.exists(summary_path) and not shards:
            # already finalized and nothing reprocessed: idempotent no-op
            # (rerunning the finalize would recompute identical artifacts
            # for nothing; ADVICE r1 resume-idempotence)
            with open(summary_path) as f:
                summary = {**json.load(f), **summary}
        else:
            summary["global_violations"] = run_global_checks(
                args.images, args.out, cfg)
            merge_sketches(args.out)
            write_report(args.out)
            summary = store.write_summary(summary)
    print(json.dumps(summary))
    return summary


def write_report(out_dir: str) -> None:
    """Check-histogram report — the distributed ``processor.String()``
    (cmd/check/main.go:133-149): violation counts by check × partition,
    as JSON next to the data artifacts."""
    import glob

    files = glob.glob(os.path.join(out_dir, "violations", "**", "*.parquet"),
                      recursive=True)
    if not files:
        return
    # grouped_aggregate, not native groupby().aggregate (VERDICT r4
    # item 5): the key is (check × partition_id) — bounded by checks but
    # O(partitions)-cardinal, and Ray's native aggregate pays a Python
    # accumulate per distinct group (CLAUDE.md: 237 s for 138k groups);
    # at 10^6 partitions this report would be every job's slow stage.
    from tag_ray.functions.grouping import grouped_aggregate

    counts = grouped_aggregate(
        rd.read_parquet(files, columns=["check", "partition_id"]),
        ["check", "partition_id"], {"n": (None, "count")}).to_pandas()
    by_check = counts.groupby("check")["n"].sum().to_dict()
    by_partition = counts.groupby("partition_id")["n"].sum().to_dict()
    with open(os.path.join(out_dir, "_REPORT.json"), "w") as f:
        json.dump({
            "violations_by_check": {str(k): int(v) for k, v in sorted(by_check.items())},
            "violations_by_partition": {str(int(k)): int(v)
                                        for k, v in sorted(by_partition.items())},
        }, f, indent=1)


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():  # driver initialises under ray job submit
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)
    main()
