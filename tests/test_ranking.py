"""Pin the global-ranking primitive: exact ranks under ties and skew,
NTILE bucket arithmetic vs DuckDB for awkward n/k combinations."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from tag_ray.functions.ranking import global_rank, ntile_of


def test_global_rank_exact_with_ties(ray_session):
    rng = np.random.default_rng(7)
    n = 5_000
    key = rng.integers(0, 40, n).astype(np.int64)  # heavy ties
    tie = rng.permutation(n).astype(np.int64)      # unique ids
    df = pd.DataFrame({"k": key, "id": tie})
    ds = rd.from_pandas(df).repartition(8)
    ranked, total = global_rank(ds, "k", "id", num_buckets=16)
    out = ranked.to_pandas().sort_values("id").reset_index(drop=True)
    assert total == n
    expect = np.empty(n, dtype=np.int64)
    order = np.lexsort((tie, key))
    expect[order] = np.arange(n)
    got = out.sort_values("id")["rank"].to_numpy()
    want = pd.DataFrame({"id": tie, "e": expect}).sort_values("id")["e"].to_numpy()
    assert (got == want).all()
    # ranks are a permutation of 0..n-1
    assert (np.sort(out["rank"].to_numpy()) == np.arange(n)).all()


def test_global_rank_exact_under_sample_cap(ray_session, monkeypatch):
    """Force the doubling-decimation path (driver sample cap smaller
    than the per-block sample volume): ranks must stay exact — the cap
    only moves bucket boundaries, never correctness."""
    from tag_ray.functions import ranking

    monkeypatch.setattr(ranking, "_MAX_SAMPLE", 8)
    rng = np.random.default_rng(11)
    n = 4_000
    key = rng.integers(0, 25, n).astype(np.int64)
    tie = rng.permutation(n).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"k": key, "id": tie})).repartition(8)
    ranked, total = global_rank(ds, "k", "id", num_buckets=16)
    out = ranked.to_pandas()
    assert total == n
    expect = np.empty(n, dtype=np.int64)
    expect[np.lexsort((tie, key))] = np.arange(n)
    want = pd.DataFrame({"id": tie, "e": expect}).sort_values("id")["e"].to_numpy()
    got = out.sort_values("id")["rank"].to_numpy()
    assert (got == want).all()


def test_global_rank_single_hot_key(ray_session):
    # one value dominates: every row must still get a distinct exact rank
    n = 2_000
    key = np.zeros(n, dtype=np.int64)
    key[:10] = np.arange(10)
    tie = np.arange(n, dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"k": key, "id": tie})).repartition(4)
    ranked, total = global_rank(ds, "k", "id", num_buckets=8)
    out = ranked.to_pandas()
    assert total == n
    assert (np.sort(out["rank"].to_numpy()) == np.arange(n)).all()


@pytest.mark.parametrize("n,k", [(10, 4), (15, 4), (3, 5), (1, 1),
                                 (100, 7), (6, 6)])
def test_ntile_matches_duckdb(n, k):
    con = duckdb.connect()
    got = ntile_of(np.arange(n), n, k)
    want = con.execute(
        f"SELECT NTILE({k}) OVER (ORDER BY i) FROM range({n}) t(i)"
    ).fetchnumpy()
    want = next(iter(want.values()))
    assert (got == np.asarray(want)).all(), (n, k, got, want)


def test_ntile_matches_duckdb_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    @settings(max_examples=40, deadline=None)
    @given(n=st.integers(1, 400), k=st.integers(1, 20))
    def check(n, k):
        got = ntile_of(np.arange(n), n, k)
        want = next(iter(con.execute(
            f"SELECT NTILE({k}) OVER (ORDER BY i) FROM range({n}) t(i)"
        ).fetchnumpy().values()))
        assert (got == np.asarray(want)).all(), (n, k)

    check()


def test_global_running_sum_exact_with_ties(ray_session):
    """Exclusive prefix sums over ORDER BY (key, tie) must equal the
    single-process cumsum for every row, under heavy key ties and a
    forced multi-bucket split (cross-bucket offsets exercised)."""
    from tag_ray.functions.ranking import global_running_sum

    rng = np.random.default_rng(23)
    n = 5_000
    key = rng.integers(0, 40, n).astype(np.int64)
    tie = rng.permutation(n).astype(np.int64)
    val = rng.integers(0, 1_000, n).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"k": key, "id": tie, "v": val})) \
        .repartition(8)
    out = global_running_sum(ds, "k", "id", "v", out_col="pre",
                             num_buckets=16).to_pandas()
    order = np.lexsort((tie, key))
    expect = np.empty(n, dtype=np.int64)
    expect[order] = np.cumsum(val[order]) - val[order]
    got = out.sort_values("id")["pre"].to_numpy()
    want = pd.DataFrame({"id": tie, "e": expect}).sort_values("id")["e"].to_numpy()
    assert (got == want).all()
    # the final prefix + value reaches the global total exactly
    assert (out["pre"] + out["v"]).max() == val.sum()


def test_global_running_sum_empty(ray_session):
    from tag_ray.functions.ranking import global_running_sum

    ds = rd.from_pandas(pd.DataFrame(
        {"k": pd.Series([], dtype="int64"),
         "id": pd.Series([], dtype="int64"),
         "v": pd.Series([], dtype="int64")}))
    out = global_running_sum(ds, "k", "id", "v").to_pandas()
    assert len(out) == 0
