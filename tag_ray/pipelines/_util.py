"""Small pipeline helpers."""

from __future__ import annotations

import pandas as pd

import ray.data as rd


def small_result(ds: rd.Dataset, columns: dict[str, str]) -> pd.DataFrame:
    """Materialize a small (possibly empty) result with a stable schema.

    ``Dataset.to_pandas()`` on a fully-empty dataset returns a frame with
    ZERO columns — downstream schema comparison (the driver's correctness
    gate) then fails even though both sides are empty. ``columns`` maps
    name → pandas dtype in output order."""
    df = ds.to_pandas()
    if df.shape[1] == 0:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in columns.items()})
    return df[list(columns)].astype(columns)
