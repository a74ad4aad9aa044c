#!/usr/bin/env python
"""Benchmark entry: headline pipelines over $GRAFT_SF_DIR.

Default mode: one Ray session (``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)``, default 32), run each headline pipeline to
completion, print ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N}

``--scaling``: run the flagship validation sweep twice in FRESH
subprocesses at two parallelism levels (default 8 and 32 logical CPUs —
the sandbox stand-in for N vs 4N nodes, SURVEY.md §4) over the SAME
input, and report throughput at both plus efficiency = T_lo/(R·T_hi).

Only this script owns the Ray session (never the library).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Headline pipelines: one per engine family (SURVEY.md §2 coverage).
HEADLINE = [
    "img_validate",          # flagship: full constraint sweep (north metric)
    "q1_pricing_summary",    # scan → derive → groupby aggregate
    "q5_region_revenue",     # multi-way broadcast join
    "events_sessions",       # stateful windowed sessionization
    "doc_token_stats",       # text analysis (token counting / quality)
    "doc_minhash_near_dups", # MinHash+LSH near-dup shuffle
    "emb_cosine_topk",       # brute-force ANN over embeddings
    "stats_lineitem_global", # mergeable sketches (Welford/t-digest/HLL)
]


def _consume(result) -> int:
    """Force execution; return row count."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.count()
    if isinstance(result, pa.Table):
        return result.num_rows
    if isinstance(result, pd.DataFrame):
        return len(result)
    return 0


def run_suite(sf_dir: str, num_cpus: int, names: list[str]) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    import __ray_entry__ as ent

    if any(n.startswith("img_") for n in names):
        ent._image_corpus(sf_dir)  # warm the deterministic fixture cache
    qs = ent.queries()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
        t0 = time.perf_counter()
        rows[name] = _consume(qs[name](sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
    ray.shutdown()
    return {"timings": timings, "rows": rows}


def _flagship_rows(sf_dir: str) -> int:
    """Input size of the flagship sweep (for images/sec throughput)."""
    import __ray_entry__ as ent

    return ent._SF_IMAGE_ROWS.get(
        os.path.basename(os.path.normpath(sf_dir)), (1_000, 4))[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--cpus", type=int, default=NUM_CPUS)
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset of headline queries")
    args = ap.parse_args()
    sf = os.path.basename(os.path.normpath(args.sf_dir))

    if args.child:
        # fresh-process flagship run for the scaling protocol
        res = run_suite(args.sf_dir, args.cpus, ["img_validate"])
        el = res["timings"]["img_validate"]
        print(json.dumps({"sec": el, "images_per_sec":
                          round(_flagship_rows(args.sf_dir) / el, 2)}))
        return

    if args.scaling:
        lo, hi = 8, 32
        # warm the deterministic corpus cache so generation isn't timed
        import __ray_entry__ as ent
        ent._image_corpus(args.sf_dir)
        out = {}
        for cpus in (lo, hi):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 "--sf-dir", args.sf_dir, "--cpus", str(cpus)],
                capture_output=True, text=True, check=True)
            out[cpus] = json.loads(p.stdout.strip().splitlines()[-1])
        ratio = hi / lo
        eff = out[hi]["images_per_sec"] / (ratio * out[lo]["images_per_sec"])
        print(json.dumps({
            "metric": "scaling efficiency (fresh ray.init at "
                      f"{lo} vs {hi} logical CPUs; sandbox stand-in for N vs 4N nodes)",
            "value": round(eff, 3), "unit": "efficiency", "sf": sf,
            "throughput_lo": out[lo]["images_per_sec"],
            "throughput_hi": out[hi]["images_per_sec"],
            "num_cpus_lo": lo, "num_cpus_hi": hi,
            "physical_cpus": os.cpu_count(),
        }))
        return

    names = args.queries.split(",") if args.queries else HEADLINE
    res = run_suite(args.sf_dir, args.cpus, names)
    total = round(sum(res["timings"].values()), 3)
    print(json.dumps({
        "metric": "headline pipeline suite wall time (validation + relational "
                  "+ text + dedup + embeddings)",
        "value": total, "unit": "sec",
        "queries": res["timings"], "sf": sf, "num_cpus": args.cpus,
        "flagship_images_per_sec": round(
            _flagship_rows(args.sf_dir) / res["timings"]["img_validate"], 2)
        if "img_validate" in res["timings"] else None,
    }))


if __name__ == "__main__":
    main()
