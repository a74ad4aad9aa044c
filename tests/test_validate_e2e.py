"""Golden end-to-end matrix: the engine's TestReadFrom (tag_test.go:55-84).

The full pipeline runs over the smoke corpus; the emitted violation set
must equal the generator's expected set EXACTLY (order-insensitive,
field-by-field), and the per-partition pass/fail matrix must match.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from tag_ray.pipelines import validate as V


@pytest.fixture(scope="module")
def results(ray_session, smoke_corpus):
    violations = V.validate(smoke_corpus + "/images",
                            smoke_corpus + "/ref_ids.parquet").materialize()
    got = violations.to_pandas()
    status = V.partition_status(smoke_corpus + "/images", violations)
    return smoke_corpus, got, status


def test_violation_set_matches_golden(results):
    corpus, got, _ = results
    expected = pq.read_table(corpus + "/expected_violations.parquet").to_pandas()
    got_set = set(zip(got.image_id, got.check))
    exp_set = set(zip(expected.image_id, expected.check))
    missing = exp_set - got_set
    extra = got_set - exp_set
    assert not missing, f"{len(missing)} expected violations not found: {sorted(missing)[:10]}"
    assert not extra, f"{len(extra)} unexpected violations: {sorted(extra)[:10]}"


def test_no_duplicate_violations(results):
    _, got, _ = results
    assert not got.duplicated(["image_id", "check"]).any()


def test_partition_ids_correct(results):
    corpus, got, _ = results
    expected = pq.read_table(corpus + "/expected_violations.parquet").to_pandas()
    exp_parts = dict(zip(zip(expected.image_id, expected.check), expected.partition_id))
    for r in got.itertuples():
        assert exp_parts[(r.image_id, r.check)] == r.partition_id


def test_partition_status_matches_golden(results):
    corpus, _, status = results
    exp = pq.read_table(corpus + "/expected_partition_status.parquet").to_pandas()
    exp = exp.sort_values("partition_id").reset_index(drop=True)
    got = status.reset_index(drop=True)
    assert (got.partition_id.values == exp.partition_id.values).all()
    assert (got["rows"].values == exp["rows"].values).all()
    assert (got.violation_count.values == exp.violation_count.values).all()
    assert (got["pass"].values == exp["pass"].values).all()


def test_ref_distributed_matches_broadcast(results, monkeypatch):
    """Above the REF_BROADCAST_MAX_ROWS gate the referential+caption
    checks run as a distributed LEFT OUTER hash join (ref_violations)
    instead of the broadcast RefIndex. Force that regime on the fixture
    corpus and pin the full violation set byte-identical (VERDICT r3
    "What's wrong" #3)."""
    import pandas as pd

    corpus, got, _ = results
    monkeypatch.setattr(V, "REF_BROADCAST_MAX_ROWS", 0)
    big = V.validate(corpus + "/images",
                     corpus + "/ref_ids.parquet").to_pandas()
    key = ["image_id", "partition_id", "check", "detail"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        big[key].sort_values(key).reset_index(drop=True))
    # the distributed regime must actually exercise both ref checks
    assert (big["check"] == "ref_orphan").any()
    assert (big["check"] == "caption_ref_mismatch").any()
