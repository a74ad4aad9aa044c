"""Distribution-drift checks: KS + PSI on per-partition t-digest sketches.

north_star requirement with no reference analogue (SURVEY.md §2.5 A4):
each partition's feature distribution is sketched in-stream (one
t-digest partial per batch, merged per partition), then compared
against the global merged digest driver-side — the compare touches only
P small sketches, never row data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from tag_ray.config import DEFAULT_CONFIG, EngineConfig, scale_concurrency
from tag_ray.functions.sketches import ColumnSketch
from tag_ray.stages.features import PixelFeatures
from tag_ray.stages.stats import GLOBAL_KEY, column_stats


def psi(ref: ColumnSketch, cur: ColumnSketch, bins: int = 10) -> float:
    """Population-stability index over reference-digest decile bins."""
    qs = np.linspace(0, 1, bins + 1)[1:-1]
    edges = np.array([ref.tdigest.quantile(q) for q in qs])
    ref_frac = np.full(bins, 1.0 / bins)
    cdf = cur.tdigest.cdf(edges)
    cur_frac = np.diff(np.r_[0.0, cdf, 1.0])
    eps = 1e-6
    ref_frac = np.clip(ref_frac, eps, None)
    cur_frac = np.clip(cur_frac, eps, None)
    return float(np.sum((cur_frac - ref_frac) * np.log(cur_frac / ref_frac)))


def ks_stat(ref: ColumnSketch, cur: ColumnSketch, grid: int = 64) -> float:
    """Approximate two-sample KS statistic on digest CDFs."""
    lo = min(ref.welford.min, cur.welford.min)
    hi = max(ref.welford.max, cur.welford.max)
    if not np.isfinite(lo) or not np.isfinite(hi) or hi <= lo:
        return 0.0
    xs = np.linspace(lo, hi, grid)
    return float(np.abs(ref.tdigest.cdf(xs) - cur.tdigest.cdf(xs)).max())


def feature_drift(images_ds: rd.Dataset, cfg: EngineConfig = DEFAULT_CONFIG,
                  feature: str = "brightness") -> pd.DataFrame:
    """images → PixelFeatures actor pool → per-partition sketches →
    driver-side PSI/KS vs the all-partition merge. Returns one row per
    partition with psi / ks / drifted flag."""
    feats = images_ds.map_batches(
        PixelFeatures,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.validate_batch_size,
        concurrency=scale_concurrency(cfg.validate_concurrency),
    )
    per_part = column_stats(feats, [feature], key_column="partition_id",
                            batch_size=cfg.stats_batch_size,
                            concurrency=scale_concurrency(cfg.stats_concurrency)).to_pandas()
    sketches = {int(r.key): ColumnSketch.from_bytes(r.sketch)
                for r in per_part.itertuples()}
    merged = None
    for s in sketches.values():
        merged = ColumnSketch.from_bytes(s.to_bytes()) if merged is None \
            else merged.merge(ColumnSketch.from_bytes(s.to_bytes()))
    rows = []
    for k in sorted(sketches):
        rows.append({
            "partition_id": k,
            "feature": feature,
            "n": int(sketches[k].welford.n),
            "mean": sketches[k].welford.mean,
            "psi": psi(merged, sketches[k], DEFAULT_CONFIG.drift_bins),
            "ks": ks_stat(merged, sketches[k]),
        })
    out = pd.DataFrame(rows)
    # A drifted partition contaminates ANY reference built from the data
    # itself (global or leave-one-out), inflating clean partitions' PSI
    # vs the mixture. Robust gating: absolute threshold AND a 3× outlier
    # margin over the median partition PSI, so only genuinely deviant
    # partitions flag while a no-drift table never flags at all.
    med = float(out["psi"].median())
    out["drifted"] = (out["psi"] > cfg.psi_threshold) & (out["psi"] > 3.0 * med)
    return out
