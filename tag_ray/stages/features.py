"""Pixel-feature extraction stage (actor pool, decode-once).

Decodes each row's payload and emits small numeric features — the
input to drift detection and any downstream model stage. Rows that
fail to decode are dropped here (they already surfaced as violations
in the validation sweep; cmd/check prints the error once and moves on,
main.go:168-177)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tag_ray import codecs
from tag_ray.codecs import DecodeError
from tag_ray.config import DEFAULT_CONFIG, EngineConfig

FEATURE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("partition_id", pa.int32()),
        ("brightness", pa.float64()),   # mean luma
        ("contrast", pa.float64()),     # luma std
        ("edge_density", pa.float64()),  # mean |dx|+|dy| of luma
    ]
)

_LUMA = np.array([0.299, 0.587, 0.114])


class PixelFeatures:
    """``map_batches(PixelFeatures, concurrency=N, batch_size=small)``."""

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        parts = batch["partition_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        out = {k: [] for k in FEATURE_SCHEMA.names}
        for i in range(batch.num_rows):
            fmt, data = fmts[i], blobs[i]
            if fmt is None or data is None or codecs.identify(data) != fmt:
                continue
            try:
                px = codecs.decode(fmt, data, max_pixels=self.cfg.max_pixels)
            except DecodeError:
                continue
            luma = px.astype(np.float64) @ _LUMA
            out["image_id"].append(ids[i])
            out["partition_id"].append(parts[i])
            out["brightness"].append(float(luma.mean()))
            out["contrast"].append(float(luma.std()))
            gy, gx = np.gradient(luma) if min(luma.shape) > 1 else (luma * 0, luma * 0)
            out["edge_density"].append(float(np.abs(gx).mean() + np.abs(gy).mean()))
        return pa.Table.from_pydict(out, schema=FEATURE_SCHEMA)
