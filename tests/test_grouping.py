"""coarse_grouped_apply must be exactly equivalent to a per-fine-key
groupby().map_groups() — it underpins phash/simhash/minhash/n-gram
bucket processing. (Helper fns live inside the tests: cloudpickle ships
closures by value, while module-level fns in tests/ are not importable
on Ray workers.)"""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from tag_ray.functions.grouping import coarse_grouped_apply


def _make(n=4000, keys=300, seed=5):
    rng = np.random.default_rng(seed)
    return pa.Table.from_pydict({
        "k1": rng.integers(0, 4, n).astype(np.int32),
        "k2": rng.integers(0, keys, n),
        "id": np.arange(n),
    })


def test_matches_plain_groupby(ray_session):
    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["id"].to_numpy())
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[a], "b": ids[b]})

    tbl = _make()
    got = coarse_grouped_apply(
        rd.from_arrow(tbl), ["k1", "k2"], pairs, num_buckets=7).to_pandas()
    ref = (tbl.to_pandas().groupby(["k1", "k2"])
           .apply(lambda g: pairs(g) if len(g) >= 2
                  else pd.DataFrame({"a": [], "b": []}))
           .reset_index(drop=True))
    key = lambda df: df.sort_values(["a", "b"]).reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(key(got), key(ref))


def test_grouped_aggregate_matches_native(ray_session):
    """grouped_aggregate must equal Dataset.groupby().aggregate() —
    it replaces the native path everywhere keys are high-cardinality
    (native pays a Python accumulate per distinct group)."""
    from ray.data.aggregate import Count, Min, Sum

    from tag_ray.functions.grouping import grouped_aggregate

    rng = np.random.default_rng(11)
    n = 5000
    tbl = pa.Table.from_pydict({
        "k": rng.integers(0, 900, n),
        "s": rng.choice(np.array(["ab", "cd", "ef", "gh"]), n),
        "v": rng.integers(-50, 50, n),
    })
    got = grouped_aggregate(
        rd.from_arrow(tbl), ["k", "s"],
        {"n": (None, "count"), "v_sum": ("v", "sum"), "v_min": ("v", "min")},
        num_buckets=13).to_pandas()
    ref = (rd.from_arrow(tbl).groupby(["k", "s"])
           .aggregate(Count(alias_name="n"), Sum("v", alias_name="v_sum"),
                      Min("v", alias_name="v_min")).to_pandas())
    key = lambda df: (df.sort_values(["k", "s"]).reset_index(drop=True)
                      [["k", "s", "n", "v_sum", "v_min"]]
                      .astype({"n": "int64", "v_sum": "int64", "v_min": "int64"}))
    pd.testing.assert_frame_equal(key(got), key(ref))


def test_run_pair_indices_property():
    """run_pair_indices (the pair-generation core of every near-dup
    family) must emit exactly the brute-force within-run (i<j) pairs
    for ANY sorted key layout, honoring min/max/cap semantics."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tag_ray.functions.grouping import run_pair_indices

    @settings(max_examples=120, deadline=None)
    @given(keys=st.lists(st.integers(0, 6), min_size=0, max_size=60),
           max_size=st.one_of(st.none(), st.integers(2, 8)),
           cap=st.one_of(st.none(), st.integers(2, 6)))
    def check(keys, max_size, cap):
        k = np.sort(np.asarray(keys, dtype=np.int64))
        pi, pj = run_pair_indices([k], max_size=max_size, cap=cap)
        got = set(zip(pi.tolist(), pj.tolist()))
        want = set()
        i = 0
        while i < len(k):
            j = i
            while j < len(k) and k[j] == k[i]:
                j += 1
            size = j - i
            if size >= 2 and (max_size is None or size <= max_size):
                eff = min(size, cap) if cap is not None else size
                for a in range(i, i + eff):
                    for b in range(a + 1, i + eff):
                        want.add((a, b))
            i = j
        assert got == want, (keys, max_size, cap)

    check()


def test_phash_bands_pigeonhole_property():
    """With d+1 bands, any two hashes within Hamming distance d MUST
    share at least one band (full recall of the banded candidate
    generation) — for every band count and flip pattern."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tag_ray.codecs.phash import hamming64, phash_bands

    @settings(max_examples=150, deadline=None)
    @given(h=st.integers(-(2**63), 2**63 - 1),
           flips=st.lists(st.integers(0, 63), min_size=0, max_size=5,
                          unique=True))
    def check(h, flips):
        a = np.array([h], dtype=np.int64)
        u = a.view(np.uint64).copy()
        for f in flips:
            u ^= np.uint64(1) << np.uint64(f)
        b = u.view(np.int64)
        d = int(hamming64(a, b)[0])
        assert d == len(flips)
        bands_a = phash_bands(a, n_bands=d + 1)
        bands_b = phash_bands(b, n_bands=d + 1)
        assert (bands_a == bands_b).any(), (hex(h), flips)

    check()


def test_min_size_skips_singletons(ray_session):
    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["id"].to_numpy())
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[a], "b": ids[b]})

    tbl = pa.Table.from_pydict({
        "k1": np.zeros(5, np.int32), "k2": np.arange(5), "id": np.arange(5)})
    got = coarse_grouped_apply(
        rd.from_arrow(tbl), ["k1", "k2"], pairs, num_buckets=3).to_pandas()
    assert len(got) == 0  # all groups singleton → nothing emitted


def test_collect_partial_sums_tree(ray_session):
    """The tree level (forced with row_cap=0) must be bit-identical to
    the direct collect, keyed and keyless."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tag_ray.functions.grouping import collect_partial_sums

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.integers(0, 7, 500),
                       "a": rng.integers(-100, 100, 500).astype("int64"),
                       "b": rng.integers(0, 10, 500).astype("int64")})
    ds = rd.from_pandas(df).repartition(13)

    def total(frame):
        return (frame.groupby("k")[["a", "b"]].sum().sort_index()
                if "k" in frame else frame[["a", "b"]].sum())

    direct = collect_partial_sums(ds, ["k"], ["a", "b"], row_cap=10**9)
    tree = collect_partial_sums(ds, ["k"], ["a", "b"], row_cap=0)
    pd.testing.assert_frame_equal(
        direct.groupby("k")[["a", "b"]].sum().sort_index(),
        tree.groupby("k")[["a", "b"]].sum().sort_index())

    d2 = collect_partial_sums(ds, [], ["a", "b"], row_cap=10**9)
    t2 = collect_partial_sums(ds, [], ["a", "b"], row_cap=0)
    assert d2[["a", "b"]].sum().equals(t2[["a", "b"]].sum())
    assert t2[["a", "b"]].dtypes.tolist() == [np.dtype("int64")] * 2


def test_histogram_quantiles_tree_bit_identical(ray_session):
    """grouped_histogram_quantiles' partial collect routes through the
    collect_partial_sums tree level (ADVICE r4): forced-tree (row_cap=0)
    must be bit-identical to the direct collect, INCLUDING null value
    cells (the tree combine must not drop NaN keys — n mirrors
    COUNT(*))."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tag_ray.functions.quantiles import grouped_histogram_quantiles

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 9, 400).astype("float64")
    vals[rng.integers(0, 400, 25)] = np.nan  # null cells
    df = pd.DataFrame({"k": rng.integers(0, 5, 400), "v": vals})
    ds = rd.from_pandas(df).repartition(9)
    probs = {"p25": 0.25, "med": 0.5, "p90": 0.9}

    direct = grouped_histogram_quantiles(ds, "k", "v", probs,
                                         row_cap=10**9)
    tree = grouped_histogram_quantiles(ds, "k", "v", probs, row_cap=0)
    pd.testing.assert_frame_equal(
        direct.sort_values("k").reset_index(drop=True),
        tree.sort_values("k").reset_index(drop=True))
    # n mirrors COUNT(*) — nulls counted
    exp_n = df.groupby("k").size().sort_index()
    got_n = direct.set_index("k")["n"].sort_index()
    assert (exp_n.to_numpy() == got_n.to_numpy()).all()
