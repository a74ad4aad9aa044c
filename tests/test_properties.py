"""Property-based tests (hypothesis) — the generative upgrade of the
reference's fuzz regression (sum_test.go:8-40: malformed input must
error, never panic) plus codec/sketch invariants."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tag_ray import codecs
from tag_ray.codecs import DecodeError
from tag_ray.functions.sketches import ColumnSketch

FMTS = ["png", "ppm", "bmp", "dctq"]


@settings(max_examples=80, deadline=None)
@given(data=st.binary(min_size=0, max_size=4096))
def test_arbitrary_bytes_never_crash(data):
    """identify → None or a format name; decode → pixels or DecodeError.
    No other exception type may escape (row-level containment depends
    on this contract)."""
    fmt = codecs.identify(data)
    assert fmt is None or fmt in FMTS
    for f in FMTS:
        try:
            px = codecs.decode(f, data, max_pixels=1 << 20)
            assert px.ndim == 3 and px.shape[2] == 3
        except DecodeError:
            pass


@settings(max_examples=80, deadline=None)
@given(data=st.binary(min_size=1, max_size=2048),
       fmt=st.sampled_from(FMTS))
def test_valid_prefix_with_garbage_tail(data, fmt):
    """magic prefix + garbage: must be DecodeError or a decode, never
    a crash (issue-73-style crasher class)."""
    blob = codecs.CODECS[fmt].magic + data
    try:
        codecs.decode(fmt, blob, max_pixels=1 << 20)
    except DecodeError:
        pass


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 24), w=st.integers(1, 24),
       seed=st.integers(0, 2**31 - 1), fmt=st.sampled_from(FMTS))
def test_roundtrip_property(h, w, seed, fmt):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    blob = codecs.encode(fmt, px)
    assert codecs.identify(blob) == fmt
    assert codecs.read_header(fmt, blob) == (w, h)
    out = codecs.decode(fmt, blob)
    ref = codecs.decode_reference(fmt, blob)
    assert out.shape == px.shape
    if codecs.CODECS[fmt].lossless:
        assert np.array_equal(out, px)
        assert np.array_equal(ref, px)
    else:
        assert codecs.psnr(out, px) >= 40.0
        assert codecs.psnr(out, ref) >= 50.0  # two decoders agree closely


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31 - 1),
       n=st.integers(2, 400),
       parts=st.integers(1, 7))
def test_sketch_merge_associative(seed, n, parts):
    """Any split/merge order of partials gives the same summary as one
    pass — the property exact resume depends on."""
    rng = np.random.default_rng(seed)
    x = rng.normal(50, 10, n)
    single = ColumnSketch().add_numeric(x)
    chunks = np.array_split(x, parts)
    acc = ColumnSketch()
    for c in chunks:
        acc.merge(ColumnSketch().add_numeric(c))
    a, b = single.summary(), acc.summary()
    assert a["count"] == b["count"]
    assert np.isclose(a["mean"], b["mean"], equal_nan=True)
    assert np.isclose(a["variance"], b["variance"], equal_nan=True)
    assert a["min"] == b["min"] and a["max"] == b["max"]
    assert a["approx_distinct"] == b["approx_distinct"]


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n=st.integers(1, 500))
def test_round_half_away_matches_duckdb(seed, n):
    """functions/rounding must agree with DuckDB ROUND bit-exactly on
    both the cents transform and 4-decimal rounding — the round-1 hash
    mismatches were exactly this class (VERDICT r1 #1)."""
    import duckdb

    from tag_ray.functions.rounding import round_half_away, to_cents

    rng = np.random.default_rng(seed)
    # mix smooth values with exact half-boundary cases at both scales
    x = np.r_[rng.uniform(-1e6, 1e6, n),
              np.round(rng.integers(-10**8, 10**8, n)) / 100.0 + 0.005,
              np.round(rng.integers(-10**8, 10**8, n)) / 10000.0 + 0.00005]
    con = duckdb.connect()
    df = con.execute(
        "SELECT CAST(round(x*100) AS BIGINT) AS c, round(x, 4) AS r4 "
        "FROM (SELECT unnest(?::DOUBLE[]) AS x)", [x.tolist()]).fetchdf()
    assert (to_cents(x) == df["c"].to_numpy()).all()
    assert (round_half_away(x, 4) == df["r4"].to_numpy()).all()


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**32 - 1), n=st.integers(1, 60))
def test_repetition_stats_match_duckdb(seed, n):
    """repetition_batch (the doc_repetition_stats kernel) is bit-exact
    vs the DuckDB oracle SQL on arbitrary token soups, including empty
    docs, single-token docs, and all-one-token docs."""
    import duckdb
    import pandas as pd

    from tag_ray.pipelines.text import REPETITION_SQL, repetition_batch

    rng = np.random.default_rng(seed)
    vocab = ["a", "bb", "ccc", "x1", "tok", "z"]
    texts = []
    for i in range(n):
        k = int(rng.integers(0, 12))
        texts.append(" ".join(rng.choice(vocab, size=k)) if k else "")
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})

    eng = repetition_batch(docs).sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute("SET threads=1")
    con.register("documents", docs)
    ora = (con.execute(REPETITION_SQL).df()
           .sort_values("doc_id").reset_index(drop=True))
    con.close()
    pd.testing.assert_frame_equal(eng, ora, check_dtype=True)


@settings(max_examples=50, deadline=None)
@given(texts=st.lists(st.text(
                          # ASCII plus 2-, 3- and 4-byte codepoints: the
                          # codepoint kernel must match CHARACTER slicing
                          # (the 🦆 > 0xFFFF exercises the 21-bit packing)
                          alphabet=st.sampled_from(list("ab x.é漢🦆")),
                          min_size=0, max_size=12),
                      min_size=1, max_size=12),
       langs=st.data())
def test_trigram_counts_match_bruteforce(texts, langs):
    """The packed-uint32 trigram kernel's doc-boundary masking must
    agree with per-string slicing for every corpus shape — empty
    strings, sub-trigram strings, adjacent docs whose bytes would
    otherwise fuse across the blob boundary."""
    import pyarrow as pa
    from collections import Counter

    from tag_ray.pipelines.text import trigram_counts_batch

    lang_list = [langs.draw(st.sampled_from(["aa", "bb"]))
                 for _ in texts]
    b = pa.table({"text": pa.array(texts, pa.string()),
                  "lang": pa.array(lang_list, pa.string())})
    got = trigram_counts_batch(b).to_pandas()
    got_map = {(r.lang, r.tri): r.n for r in got.itertuples()}
    want = Counter()
    for t, lg in zip(texts, lang_list):
        for i in range(len(t) - 2):
            want[(lg, t[i:i + 3])] += 1
    assert got_map == dict(want)


@settings(max_examples=50, deadline=None)
@given(n=st.integers(1, 60), frame=st.integers(1, 5),
       seed=st.integers(0, 2**31 - 1))
def test_moving_frames_match_pandas_rolling(n, frame, seed):
    """The cumsum + run-start-clamp frame kernel must equal pandas'
    per-user rolling sum for every (run shape, frame size)."""
    import pandas as pd

    from tag_ray.pipelines.relational import moving_frames_bucket

    rng = np.random.default_rng(seed)
    g = pd.DataFrame({
        "user_id": rng.integers(0, 5, n),
        "ts_us": rng.integers(0, 10, n).astype(np.int64),  # force ties
        "event_id": rng.permutation(n).astype(np.int64),
        "v_c": rng.integers(-1000, 1000, n).astype(np.int64),
    })
    got = (moving_frames_bucket(g, frame=frame)
           .sort_values("event_id").reset_index(drop=True))
    ref = g.sort_values(["user_id", "ts_us", "event_id"]).copy()
    ref["moving_sum"] = (ref.groupby("user_id")["v_c"]
                         .transform(lambda s: s.rolling(frame, min_periods=1)
                                    .sum()) / 100.0)
    ref = ref[["event_id", "moving_sum"]].sort_values(
        "event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)


@settings(max_examples=150, deadline=None)
@given(a=st.text(alphabet="abc", min_size=0, max_size=8),
       b=st.text(alphabet="abc", min_size=0, max_size=8))
def test_ed_is_1_matches_dp(a, b):
    """The O(n) 'edit distance == 1' decision must agree with full DP
    levenshtein on a tiny alphabet (dense in near-miss pairs)."""
    from tag_ray.pipelines.dedup import _ed_is_1

    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                   prev + (a[i - 1] != b[j - 1]))
    assert _ed_is_1(a, b) == (d[lb] == 1)
