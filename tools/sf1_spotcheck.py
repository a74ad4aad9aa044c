"""sf1 spot-check (VERDICT r4 item 6): one order of magnitude above the
bench scale, do the headline pipelines still scale ~linearly?

Synthesizes an sf1 corpus ONCE under /tmp by replicating the driver's
sf0.1 tables 10× with key shifts that preserve FK validity (facts get
shifted primary/foreign keys; dimension tables are kept as-is), plus a
500k-row image corpus from the deterministic fixture generator. Then
runs the five headline pipelines (img_validate, doc_minhash_near_dups,
q5_region_revenue, events_sessions, stats_lineitem_global) once warm
and prints wall times next to the sf0.1 references.

Usage: python tools/sf1_spotcheck.py   (owns its Ray session)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/tag_ray_sf1"
COPIES = 10


def _shift_concat(table: str, shift_cols: dict[str, int],
                  out_dir: str) -> None:
    """Write COPIES concatenated copies of an sf0.1 table, adding
    i × stride to every column in ``shift_cols`` for copy i."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = pq.read_table(os.path.join(SF01, f"{table}.parquet"))
    outs = []
    for i in range(COPIES):
        t = src
        for col, stride in shift_cols.items():
            idx = t.schema.get_field_index(col)
            t = t.set_column(idx, col,
                             pc.add(t[col], pa.scalar(i * stride,
                                                      t[col].type)))
        outs.append(t)
    pq.write_table(pa.concat_tables(outs),
                   os.path.join(out_dir, f"{table}.parquet"),
                   row_group_size=200_000)


def build_corpus() -> None:
    import pyarrow.parquet as pq

    os.makedirs(SF1, exist_ok=True)
    if os.path.exists(os.path.join(SF1, "_DONE")):
        return
    # strides: > max key in the sf0.1 tables (read once, rounded up)
    k = {}
    for tbl, col in [("orders", "o_orderkey"), ("customer", "c_custkey"),
                     ("documents", "doc_id"), ("events", "event_id"),
                     ("events", "user_id")]:
        t = pq.read_table(os.path.join(SF01, f"{tbl}.parquet"),
                          columns=[col])
        k[col] = int(t[col].to_numpy(zero_copy_only=False).max()) + 1
    _shift_concat("orders", {"o_orderkey": k["o_orderkey"],
                             "o_custkey": k["c_custkey"]}, SF1)
    _shift_concat("lineitem", {"l_orderkey": k["o_orderkey"]}, SF1)
    _shift_concat("customer", {"c_custkey": k["c_custkey"]}, SF1)
    _shift_concat("documents", {"doc_id": k["doc_id"]}, SF1)
    _shift_concat("events", {"event_id": k["event_id"],
                             "user_id": k["user_id"]}, SF1)
    # dimensions: single copy (FKs into them stay valid)
    for tbl in ("nation", "region", "supplier", "part", "embeddings"):
        src = os.path.join(SF01, f"{tbl}.parquet")
        pq.write_table(pq.read_table(src),
                       os.path.join(SF1, f"{tbl}.parquet"))
    open(os.path.join(SF1, "_DONE"), "w").write("ok")


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    t0 = time.perf_counter()
    build_corpus()
    print(f"corpus ready in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    import __ray_entry__ as ent
    from tag_ray.fixtures import cached_corpus
    from tag_ray.pipelines import validate as V

    # 800k-row image corpus — 16× the sf0.1 mapping and EXACTLY the
    # scaling-protocol corpus, so the fixture cache already holds it
    ent._SF_IMAGE_ROWS["tag_ray_sf1"] = (800_000, 64)
    corpus = cached_corpus(n_rows=800_000, n_partitions=64, seed=42)
    print(f"image corpus ready at {corpus}", file=sys.stderr, flush=True)

    qs = ent.queries()
    names = ["img_validate", "doc_minhash_near_dups", "q5_region_revenue",
             "events_sessions", "stats_lineitem_global"]
    # warm-up (untimed) at sf0.1 — same steady-state accounting as bench
    for n in names:
        if n.startswith("img_"):
            V.validate(corpus + "/images", corpus + "/ref_ids.parquet",
                       partitions=list(range(32))).count()
        else:
            _consume(qs[n](SF01))
    timings = {}
    for n in names:
        t0 = time.perf_counter()
        rows = _consume(qs[n](SF1))
        timings[n] = {"sec": round(time.perf_counter() - t0, 2),
                      "rows": rows}
    print(json.dumps({"sf": "sf1(10x sf0.1)", "num_cpus": 32,
                      "timings": timings}))
    ray.shutdown()


def _consume(result) -> int:
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


if __name__ == "__main__":
    main()
