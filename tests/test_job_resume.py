"""Checkpoint/resume semantics of the job runner (north_rule: resumable
from checkpoint with per-partition lineage + metrics).

Crash-simulation: run with --max-shards 1, assert partial lineage and
no summary; resume, assert completion; compare the union of violation
rows against an uninterrupted run — must be identical. A third run must
process nothing (idempotence)."""

import glob
import json
import os

import pandas as pd

from tag_ray import fixtures
from tag_ray.job import main as job_main


def _violations(out_dir: str) -> pd.DataFrame:
    files = glob.glob(os.path.join(out_dir, "violations", "**", "*.parquet"),
                      recursive=True)
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    return df.sort_values(["image_id", "check", "detail"]).reset_index(drop=True)


def test_job_interrupt_resume(tmp_path, ray_session):
    corpus = fixtures.cached_corpus(n_rows=300, n_partitions=6)
    images, ref = corpus + "/images", corpus + "/ref_ids.parquet"
    interrupted = str(tmp_path / "interrupted")
    clean = str(tmp_path / "clean")
    base = ["--images", images, "--ref", ref, "--shard-size", "2"]

    # "crash" after one shard
    s1 = job_main(base + ["--out", interrupted, "--max-shards", "1"])
    assert s1["processed_partitions"] == 2
    assert not os.path.exists(os.path.join(interrupted, "_SUMMARY.json"))
    done_after_crash = {
        int(f.split("=")[1].split(".")[0])
        for f in os.listdir(os.path.join(interrupted, "lineage"))}
    assert len(done_after_crash) == 2

    # resume: only the remaining 4 partitions run; job completes
    s2 = job_main(base + ["--out", interrupted])
    assert s2["resumed_partitions"] == 2
    assert s2["partitions_done"] == 6
    assert os.path.exists(os.path.join(interrupted, "_SUMMARY.json"))
    assert os.path.exists(os.path.join(interrupted, "sketches", "merged"))
    report = json.load(open(os.path.join(interrupted, "_REPORT.json")))
    assert sum(report["violations_by_check"].values()) > 0

    # uninterrupted reference run → identical violation rows
    s3 = job_main(base + ["--out", clean])
    assert s3["partitions_done"] == 6
    vi, vc = _violations(interrupted), _violations(clean)
    pd.testing.assert_frame_equal(vi, vc)
    assert s3["violations"] == s2["violations"]

    # idempotence: nothing left to process
    s4 = job_main(base + ["--out", interrupted])
    assert s4["processed_partitions"] == 0

    # lineage metrics cover every row exactly once (incl. injected dups)
    n_rows = sum(
        len(pd.read_parquet(f, columns=["partition_id"]))
        for f in glob.glob(os.path.join(images, "*.parquet")))
    recs = [json.load(open(os.path.join(interrupted, "lineage", f)))
            for f in os.listdir(os.path.join(interrupted, "lineage"))]
    assert sum(r["rows"] for r in recs) == n_rows
