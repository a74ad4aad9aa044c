"""Referentially-dirty inputs must match the oracle's inner joins.

This engine's whole domain is validating dirty data (ref_orphan_orders
exists because orphan keys occur), so analytic operators that attach
dimensions via broadcast sorted-array lookups must DROP orphan keys the
way the SQL inner join does — not IndexError past the array end (an
orphan key above the max) or silently mislabel (an orphan key between
two present keys). Pinned on a corpus carrying all three orphan shapes
through q7's supplier, customer and nation attach points, in both the
broadcast and partitioned-join regimes.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dirty_sf")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["NA", "NB"], pa.string()),
    }), str(d / "nation.parquet"))
    # suppkey 5 carries an ORPHAN nationkey (7): survives the supplier
    # attach, must drop at the nation-name lookup
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 5], pa.int64()),
        "s_nationkey": pa.array([0, 1, 7], pa.int64()),
    }), str(d / "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 20], pa.int64()),
        "c_nationkey": pa.array([1, 0], pa.int64()),
    }), str(d / "customer.parquet"))
    # order 200 has an ORPHAN custkey
    pq.write_table(pa.table({
        "o_orderkey": pa.array([100, 200, 300], pa.int64()),
        "o_custkey": pa.array([10, 99, 20], pa.int64()),
    }), str(d / "orders.parquet"))
    ship = pa.array([pd.Timestamp("1995-03-05")] * 6, pa.timestamp("us"))
    pq.write_table(pa.table({
        # suppkey 9 is an orphan ABOVE the max (the IndexError shape);
        # suppkey 3 is an orphan BETWEEN present keys (the silent-
        # mislabel shape); both must drop like the oracle's inner join
        "l_orderkey": pa.array([100, 100, 100, 200, 300, 300], pa.int64()),
        "l_suppkey": pa.array([1, 9, 3, 2, 5, 2], pa.int64()),
        "l_extendedprice": pa.array([100.0, 50.0, 60.0, 70.0, 80.0, 90.0]),
        "l_discount": pa.array([0.1, 0.0, 0.0, 0.05, 0.0, 0.02]),
        "l_shipdate": ship,
    }), str(d / "lineitem.parquet"))
    return str(d)


def _oracle(dirty_dir) -> pd.DataFrame:
    from tag_ray.pipelines.relational import Q7_SQL

    con = duckdb.connect()
    for t in ("nation", "supplier", "customer", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{dirty_dir}/{t}.parquet')")
    out = con.execute(Q7_SQL).fetchdf()
    con.close()
    return out


def _sorted(df):
    return (df.sort_values(["supp_nation", "cust_nation", "l_year"])
            .reset_index(drop=True))


def test_q7_drops_orphan_keys_like_the_oracle(ray_session, dirty_dir,
                                              monkeypatch):
    from tag_ray.pipelines import relational as R

    want = _sorted(_oracle(dirty_dir))
    assert len(want) > 0  # the clean rows survive

    got_bc = _sorted(R.q7_nation_volume(dirty_dir))
    pd.testing.assert_frame_equal(got_bc, want, check_dtype=False)

    monkeypatch.setattr(R, "BROADCAST_JOIN_MAX_BYTES", 0)
    got_join = _sorted(R.q7_nation_volume(dirty_dir))
    pd.testing.assert_frame_equal(got_join, want, check_dtype=False)
