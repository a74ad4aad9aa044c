"""Per-partition lineage records + resumable-output layout.

The reference reruns from scratch on failure (SURVEY.md §4 —
``cmd/check`` has no checkpointing). The engine's north_rule requires
"resumable from checkpoint with per-partition lineage + metrics": every
completed input partition leaves behind

  out_dir/
    violations/shard=<S>/...parquet     violation rows for that shard
    sketches/shard=<S>.parquet          mergeable ColumnSketch partials
    lineage/partition=<P>.json          LineageRecord (atomic rename)
    _SUMMARY.json                       written once all partitions done

A restarted job lists ``lineage/`` and filters completed partitions out
of the read (predicate pushdown on ``partition_id``), so already-paid
work is never recomputed. Sketch partials are merge-idempotent
(functions/sketches.py) — the merged checkpoint is recomputed from
partials at finalize, never updated in place (SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass


@dataclass
class LineageRecord:
    partition_id: int
    rows: int
    violation_count: int
    wall_s: float
    shard: int
    status: str = "done"
    config_fingerprint: str = ""


class LineageStore:
    """Filesystem-backed lineage (one JSON per partition, atomic rename).

    Works on any fsspec-style mounted path; at cluster scale the same
    layout lands on shared storage so any driver can resume.
    """

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.lineage_dir = os.path.join(out_dir, "lineage")
        os.makedirs(self.lineage_dir, exist_ok=True)

    def done_partitions(self) -> set[int]:
        done = set()
        for name in os.listdir(self.lineage_dir):
            if name.startswith("partition=") and name.endswith(".json"):
                done.add(int(name[len("partition="):-len(".json")]))
        return done

    def record(self, rec: LineageRecord) -> None:
        path = os.path.join(self.lineage_dir, f"partition={rec.partition_id}.json")
        fd, tmp = tempfile.mkstemp(dir=self.lineage_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(asdict(rec), f)
        os.replace(tmp, path)  # atomic: a crash leaves no partial record

    def load(self) -> list[LineageRecord]:
        out = []
        for name in sorted(os.listdir(self.lineage_dir)):
            if name.startswith("partition=") and name.endswith(".json"):
                with open(os.path.join(self.lineage_dir, name)) as f:
                    out.append(LineageRecord(**json.load(f)))
        return out

    def write_summary(self, extra: dict) -> dict:
        recs = self.load()
        summary = {
            "partitions_done": len(recs),
            "rows": sum(r.rows for r in recs),
            "violations": sum(r.violation_count for r in recs),
            "wall_s_total": round(sum(r.wall_s for r in recs), 3),
            **extra,
        }
        with open(os.path.join(self.out_dir, "_SUMMARY.json"), "w") as f:
            json.dump(summary, f, indent=1)
        return summary
