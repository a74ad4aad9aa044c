"""Replicates the driver's correctness gate locally: every queries()
entry with an oracle_sql() entry runs both ways at sf0.001 and must
match on row count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if df[c].dtype == object:
            continue
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(4)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _compare(name, ray_df, sql_df):
    a, b = _normalize(ray_df), _normalize(sql_df)
    assert list(a.columns) == list(b.columns), \
        f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            ok = np.allclose(av.astype(float), bv.astype(float), atol=1e-9, equal_nan=True)
        else:
            ok = (av == bv).all() if len(av) else True
        assert ok, f"{name}: column {c} values differ\n{a[c].head()}\n{b[c].head()}"
    _hash_compare(name, ray_df, sql_df)


def _hash_compare(name, ray_df, sql_df):
    """DTYPE-SENSITIVE gate, hashing raw (un-rounded) values per column
    the way the driver does (pd.util.hash_pandas_object) — the tolerant
    compare above passed HUGEINT→float64 divergences (docs_cube /
    doc_mean_term_freq, CLAUDE.md r3 pitfall) that only the driver's
    hash exposed; this closes the blind spot for window-deferred
    entries (ADVICE r3 #4)."""
    a = ray_df.reindex(sorted(ray_df.columns), axis=1).copy()
    b = sql_df.reindex(sorted(sql_df.columns), axis=1).copy()
    for df in (a, b):
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = df[c].astype("int64")
    a = a.sort_values(list(a.columns)).reset_index(drop=True)
    b = b.sort_values(list(b.columns)).reset_index(drop=True)
    for c in a.columns:
        ha = pd.util.hash_pandas_object(a[c], index=False).to_numpy()
        hb = pd.util.hash_pandas_object(b[c], index=False).to_numpy()
        assert (ha == hb).all(), (
            f"{name}: column {c} dtype-sensitive hash mismatch "
            f"(engine dtype {a[c].dtype} vs oracle dtype {b[c].dtype})")


def _oracle_pairs():
    import __ray_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q), "oracle_sql keys must be a subset of queries"
    return sorted(o)


@pytest.mark.parametrize("name", _oracle_pairs())
def test_query_matches_oracle(ray_session, con, name):
    import __ray_entry__ as entrymod

    ray_df = _to_pandas(entrymod.queries()[name](SF_DIR))
    sql_df = con.execute(entrymod.oracle_sql()[name]).fetchdf()
    _compare(name, ray_df, sql_df)


def test_entry_smoke(ray_session):
    import __ray_entry__ as entrymod

    res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) >= 0
    assert set(df.columns) == {"image_id", "partition_id", "check", "detail"}


def test_rows_only_queries_run(ray_session):
    """Queries without oracles must still execute and return a result."""
    import __ray_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    for name in sorted(set(q) - set(o)):
        if name.startswith("img_"):
            continue  # exercised by the golden-matrix e2e suite (costly here)
        df = _to_pandas(q[name](SF_DIR))
        assert df is not None, name
