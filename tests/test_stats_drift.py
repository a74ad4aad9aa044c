"""Distributed stats stage + drift detection e2e."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tag_ray.stages.stats import GLOBAL_KEY, column_stats


def test_column_stats_matches_exact(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"a": rng.normal(10, 2, 5000), "b": rng.uniform(0, 1, 5000)})
    ds = rd.from_pandas(df).repartition(8)
    out = column_stats(ds, ["a", "b"]).to_pandas().set_index("column")
    for col in ("a", "b"):
        r = out.loc[col]
        assert r["key"] == GLOBAL_KEY
        assert r["count"] == 5000
        assert r["mean"] == pytest.approx(df[col].mean(), abs=0.01)
        assert r["variance"] == pytest.approx(df[col].var(ddof=0), rel=0.01)
        assert r["min"] == df[col].min() and r["max"] == df[col].max()
        assert r["approx_distinct"] == pytest.approx(5000, rel=0.06)
        assert r["q50"] == pytest.approx(df[col].median(), abs=0.1)


def test_drift_detects_shifted_partition(ray_session, smoke_corpus):
    from tag_ray.pipelines.drift import feature_drift
    from tag_ray.pipelines.validate import read_images

    out = feature_drift(read_images(smoke_corpus + "/images"))
    # generator shifts brightness +40 in the last partition (drift_partition=3)
    drifted = set(out[out.drifted].partition_id)
    assert drifted == {3}, out.to_string()
    assert out[out.partition_id == 3].psi.iloc[0] > 3 * out[out.partition_id == 0].psi.iloc[0]
