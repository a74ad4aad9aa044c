"""Sketch correctness: accuracy vs exact, merge associativity
(SURVEY.md §7 hard part 3), serialization round-trip."""

from __future__ import annotations

import numpy as np
import pytest

from tag_ray.functions.sketches import (ColumnSketch, HyperLogLog, TDigest,
                                        Welford, hash64_any)

RNG = np.random.default_rng(11)


class TestWelford:
    def test_matches_numpy(self):
        x = RNG.normal(10, 3, 10_000)
        w = Welford().add_array(x)
        assert w.n == 10_000
        assert w.mean == pytest.approx(x.mean())
        assert w.variance == pytest.approx(x.var())
        assert w.sample_variance == pytest.approx(x.var(ddof=1))
        assert w.min == x.min() and w.max == x.max()

    def test_merge_equals_single_pass(self):
        x = RNG.normal(0, 1, 9_999)
        whole = Welford().add_array(x)
        parts = [Welford().add_array(c) for c in np.array_split(x, 7)]
        merged = parts[0]
        for p in parts[1:]:
            merged.merge(p)
        assert merged.mean == pytest.approx(whole.mean)
        assert merged.variance == pytest.approx(whole.variance)

    def test_nan_and_empty(self):
        w = Welford().add_array(np.array([np.nan, 1.0, np.nan, 3.0]))
        assert w.n == 2 and w.mean == 2.0
        w2 = Welford().add_array(np.array([]))
        assert w2.n == 0


class TestTDigest:
    def test_quantile_accuracy(self):
        x = RNG.normal(0, 1, 50_000)
        t = TDigest().add_array(x)
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            exact = np.quantile(x, q)
            assert t.quantile(q) == pytest.approx(exact, abs=0.05)

    def test_merge_order_insensitive_accuracy(self):
        x = RNG.exponential(2.0, 30_000)
        chunks = np.array_split(x, 10)
        a = TDigest()
        for c in chunks:
            a.merge(TDigest().add_array(c))
        b = TDigest()
        for c in reversed(chunks):
            b.merge(TDigest().add_array(c))
        for q in (0.5, 0.9, 0.99):
            exact = np.quantile(x, q)
            assert a.quantile(q) == pytest.approx(exact, rel=0.1, abs=0.05)
            assert b.quantile(q) == pytest.approx(exact, rel=0.1, abs=0.05)

    def test_compression_bound(self):
        t = TDigest(delta=128).add_array(RNG.uniform(0, 1, 100_000))
        t._compress()
        assert t.means.size <= 2 * 128

    def test_cdf_monotone(self):
        t = TDigest().add_array(RNG.normal(0, 1, 10_000))
        xs = np.linspace(-4, 4, 100)
        cdf = t.cdf(xs)
        assert (np.diff(cdf) >= -1e-12).all()
        assert cdf[0] < 0.02 and cdf[-1] > 0.98


class TestHLL:
    @pytest.mark.parametrize("n", [100, 5_000, 200_000])
    def test_estimate_within_error(self, n):
        h = HyperLogLog(p=12)
        h.add_array(np.arange(n, dtype=np.int64))
        assert h.estimate() == pytest.approx(n, rel=0.05)

    def test_merge_is_union(self):
        a = HyperLogLog().add_array(np.arange(0, 10_000))
        b = HyperLogLog().add_array(np.arange(5_000, 15_000))
        a.merge(b)
        assert a.estimate() == pytest.approx(15_000, rel=0.05)

    def test_string_hashing(self):
        h = HyperLogLog()
        h.add_array(np.array([f"id-{i}" for i in range(2_000)]))
        assert h.estimate() == pytest.approx(2_000, rel=0.06)

    def test_hash_stability(self):
        a = hash64_any(np.array([1, 2, 3], dtype=np.int64))
        b = hash64_any(np.array([1, 2, 3], dtype=np.int64))
        assert (a == b).all()
        assert len(np.unique(a)) == 3


class TestColumnSketch:
    def test_summary_and_roundtrip(self):
        x = RNG.normal(5, 2, 20_000)
        s = ColumnSketch().add_numeric(x)
        t = ColumnSketch.from_bytes(s.to_bytes())
        for got in (s.summary(), t.summary()):
            assert got["count"] == 20_000
            assert got["mean"] == pytest.approx(x.mean(), abs=0.01)
            assert got["q50"] == pytest.approx(np.median(x), abs=0.05)

    def test_merge_idempotent_partials(self):
        """Checkpoint semantics: re-merging the SAME serialized partial
        into a fresh accumulator twice must be detectable/avoidable —
        here we assert merge of distinct partials in any grouping agrees."""
        x = RNG.uniform(0, 100, 12_000)
        chunks = np.array_split(x, 6)
        partials = [ColumnSketch().add_numeric(c).to_bytes() for c in chunks]
        acc1 = ColumnSketch.from_bytes(partials[0])
        for p in partials[1:]:
            acc1.merge(ColumnSketch.from_bytes(p))
        left = ColumnSketch.from_bytes(partials[0])
        for p in partials[1:3]:
            left.merge(ColumnSketch.from_bytes(p))
        right = ColumnSketch.from_bytes(partials[3])
        for p in partials[4:]:
            right.merge(ColumnSketch.from_bytes(p))
        acc2 = left.merge(right)
        assert acc1.summary()["count"] == acc2.summary()["count"] == 12_000
        assert acc1.summary()["mean"] == pytest.approx(acc2.summary()["mean"])
        assert acc1.summary()["approx_distinct"] == acc2.summary()["approx_distinct"]
        assert acc1.summary()["q50"] == pytest.approx(acc2.summary()["q50"], rel=0.02)
