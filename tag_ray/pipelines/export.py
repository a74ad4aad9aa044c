"""Training-set export: the end-to-end materialization a training
pipeline runs after analysis — quality gate → exact dedup → shard
assignment → resumable partitioned parquet write.

The write layout follows the task brief's resumable-output rule: one
directory per shard with a ``_SUCCESS`` marker written only after the
shard's data landed, so a crashed or re-run export skips finished
shards (mirrors the job runner's per-shard lineage records,
tag_ray/job.py; the reference analogue is ``cmd/check``'s independent
per-file processing, /root/reference/cmd/check/main.go:151-194).

Shard assignment is a deterministic key hash, not ``random_shuffle``:
at 100 TB a seeded all-to-all shuffle costs a full extra pass over the
payload, while hash sharding rides the SAME pass as the write, is
reproducible row-for-row, and still decorrelates rows from input order
(the hash is uniform). Training-time randomness comes from per-epoch
shard/row sampling, which is the standard division of labor.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from tag_ray.functions.hashing import hash_strings64
from tag_ray.sources import table


def _quality_mask(texts: list, min_words: int, min_alpha_frac: float):
    # THE shared gate arithmetic — same kernel as the oracle-checked
    # doc_quality_filter_apply, so the exported set can never silently
    # diverge from the pinned filter semantics
    from tag_ray.pipelines.text import quality_stats

    n_words, alpha_frac = quality_stats(texts)
    return (n_words >= min_words) & (alpha_frac >= min_alpha_frac)


def export_training_set(sf_dir: str, out_dir: str, num_shards: int = 8,
                        min_words: int = 5, min_alpha_frac: float = 0.5,
                        force: bool = False) -> pd.DataFrame:
    """Materialize the deduped, quality-gated corpus as ``num_shards``
    parquet directories under ``out_dir``; returns the shard manifest
    (shard, rows). Finished shards (``_SUCCESS`` present) are skipped
    on re-run unless ``force``.

    Dedup is keep-first-per-fingerprint resolved WITHIN each shard:
    the shard key is the text fingerprint itself, so all copies of a
    duplicate text land in one shard and the whole dedup needs no
    second shuffle — assignment, dedup, and write share one exchange.
    """
    import hashlib as _hl

    import pyarrow.compute as pc

    from tag_ray.functions.grouping import COARSE_COL

    os.makedirs(out_dir, exist_ok=True)

    def gate_and_key(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        keep = _quality_mask(texts, min_words, min_alpha_frac)
        b = b.filter(pa.array(keep))
        fps = [_hl.md5((t or "").encode()).hexdigest()
               for t, k in zip(texts, keep) if k]
        shard = (hash_strings64(fps) % np.uint64(num_shards)).astype(np.int32)
        return b.append_column("fingerprint", pa.array(fps, pa.string())) \
                .append_column(COARSE_COL, pa.array(shard))

    pending = [s for s in range(num_shards) if force or not
               os.path.exists(os.path.join(out_dir, f"shard={s}", "_SUCCESS"))]

    def dedup_write(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g[COARSE_COL].iloc[0])
        if shard not in pending:
            return pd.DataFrame({"shard": pd.Series([], dtype="int64"),
                                 "rows": pd.Series([], dtype="int64")})
        g = g.sort_values(["fingerprint", "doc_id"], kind="mergesort")
        first = np.ones(len(g), dtype=bool)
        fp = g["fingerprint"].to_numpy()
        first[1:] = fp[1:] != fp[:-1]
        out = g.loc[first].drop(columns=[COARSE_COL, "fingerprint"]) \
               .sort_values("doc_id")
        d = os.path.join(out_dir, f"shard={shard}")
        os.makedirs(d, exist_ok=True)
        out.to_parquet(os.path.join(d, "part-0.parquet"), index=False)
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write(json.dumps({"rows": len(out)}))
        return pd.DataFrame({"shard": [shard], "rows": [len(out)]})

    docs = table(sf_dir, "documents",
                 columns=["doc_id", "text", "lang", "n_chars"])
    written = docs.map_batches(gate_and_key, batch_format="pyarrow") \
        .groupby(COARSE_COL).map_groups(dedup_write, batch_format="pandas") \
        .to_pandas()

    manifest = []
    for s in range(num_shards):
        marker = os.path.join(out_dir, f"shard={s}", "_SUCCESS")
        rows = json.loads(open(marker).read())["rows"] \
            if os.path.exists(marker) else 0
        manifest.append({"shard": s, "rows": rows})
    mf = pd.DataFrame(manifest).astype({"shard": "int64", "rows": "int64"})
    written_set = set(written["shard"]) if len(written) else set()
    mf["written_this_run"] = mf["shard"].isin(written_set)
    return mf


def export_training_set_query(sf_dir: str) -> pd.DataFrame:
    """queries() wrapper: export into a scratch dir keyed by the input
    (fresh per sf tier), return the manifest. Deterministic rows →
    stable under the driver's rows-only check."""
    key = sf_dir.strip("/").replace("/", "_")
    out = os.path.join("/tmp", "tag_ray_export", key)
    return export_training_set(sf_dir, out, force=True)
