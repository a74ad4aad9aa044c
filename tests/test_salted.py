"""Salted two-phase aggregation must equal the unsalted groupby exactly
(SURVEY.md §7 hard part 4), for every supported aggregate kind and for
both salt sources (round-robin and key-hash)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from tag_ray.functions.salted import salted_aggregate


def _skewed_ds():
    rng = np.random.default_rng(11)
    n = 5000
    # zipf-ish skew: one key holds ~70% of rows
    keys = np.array(["hot", "warm", "cool", "cold"])[
        np.minimum(rng.geometric(0.7, n) - 1, 3)]
    return rd.from_arrow(pa.Table.from_pydict({
        "k": keys,
        "v": rng.integers(-50, 1000, n),
        "u": [f"u{i}" for i in range(n)],
    }))


@pytest.mark.parametrize("salt_source", [None, "u"])
def test_salted_equals_unsalted(ray_session, salt_source):
    ds = _skewed_ds()
    salted = salted_aggregate(
        ds, "k",
        [("count", None, "n"), ("sum", "v", "s"), ("min", "v", "lo"),
         ("max", "v", "hi"), ("mean", "v", "avg")],
        salt_buckets=8, salt_source=salt_source).to_pandas()
    plain = _skewed_ds().groupby("k").aggregate(
        Count(alias_name="n"), Sum("v", alias_name="s"),
        Min("v", alias_name="lo"), Max("v", alias_name="hi"),
        Mean("v", alias_name="avg")).to_pandas()
    a = salted.sort_values("k").reset_index(drop=True)[
        ["k", "n", "s", "lo", "hi", "avg"]]
    b = plain.sort_values("k").reset_index(drop=True)[
        ["k", "n", "s", "lo", "hi", "avg"]]
    pd.testing.assert_frame_equal(
        a.astype({"n": "int64", "s": "int64"}),
        b.astype({"n": "int64", "s": "int64"}), check_dtype=False)


def test_salted_rejects_unknown_kind(ray_session):
    with pytest.raises(ValueError):
        salted_aggregate(_skewed_ds(), "k", [("median", "v", "m")])
