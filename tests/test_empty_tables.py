"""Zero-row inputs must yield empty results, not crashes.

An upstream filter (date gate, tenant partition, resumed shard) can
hand any operator a 0-row table; the sequence/analytics kernels and
the Pareto scan each have a driver-side finalize step that historically
assumed ≥1 row (pandas groupby on a column-less frame raises KeyError;
``Dataset.sum()`` returns None). Pinned here against schema-true empty
parquet files.
"""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    src = "/root/testdata/sf0.001"
    for t in ("events", "orders", "documents", "lineitem", "embeddings",
              "part", "customer", "supplier", "nation", "region"):
        schema = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name,want_rows", [
    # the funnel's oracle (three UNION ALL COUNT(*) arms) emits 3 zero
    # rows even over zero events — the pipeline must match, not vanish
    ("events_funnel", 3),
    ("events_retention", 0),
    ("events_transition_matrix", 0),
    ("events_rolling_active_users", 0),
    ("events_value_moving_sum", 0),
    ("orders_pareto_customers", 0),
    # PQ paths train on a head sample: zero rows must short-circuit,
    # not ZeroDivisionError inside the per-subspace k-means
    ("emb_pq_encode", 0),
    ("emb_ivfpq_topk", 0),
    # single-cell SQL aggregates over zero rows emit ONE NULL row — the
    # engines return a 1-row NaN frame to match
    ("q6_forecast_revenue", 1),
    ("q14_promo_share", 1),
    ("q19_bracket_revenue", 1),
    ("events_props_stats", 0),
    ("events_daily_anomaly", 0),
    ("doc_unigram_surprisal", 0),
    ("q4_priority_exists_count", 0),
    ("q13_order_count_distribution", 0),
    ("q17_small_quantity_revenue", 1),
    ("q22_idle_balance_customers", 0),
    ("doc_bigram_surprisal", 0),
    # Q15's oracle over zero rows: MAX(c) is NULL, c = NULL matches
    # nothing → 0 rows (not a NULL row — the filter precedes the agg)
    ("q18_large_volume_customers", 0),
    ("q15_top_supplier", 0),
    ("q8_market_share", 0),
    ("q21_sole_returned_supplier", 0),
    ("q12_shipping_sla", 0),
    ("events_latest_per_user", 0),
    ("doc_weighted_sample", 0),
    ("orders_range_join", 0),
    ("events_value_ohlc", 0),
    ("events_value_mad", 0),
    # the matrix always reports every FK edge; zero tables ⇒ 7 zero rows
    ("ref_integrity_matrix", 7),
    ("events_daily_gapfill", 0),
    ("events_type_share", 0),
])
def test_empty_input_matches_oracle_shape(ray_session, empty_dir, name,
                                          want_rows):
    import ray.data as rd

    import __ray_entry__ as entrymod

    res = entrymod.queries()[name](empty_dir)
    if isinstance(res, rd.Dataset):
        res = res.to_pandas()
    assert isinstance(res, (pd.DataFrame, pa.Table))
    assert len(res) == want_rows, (name, res)
    if name == "events_funnel":
        assert list(res["n_users"]) == [0, 0, 0]
