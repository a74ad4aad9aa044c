"""Adversarial edge-corpus gate for the round-3 analytics operators.

The sf0.001 oracle gate (test_queries_oracle) exercises the happy
path; this corpus pins the boundary semantics the SQL contract
implies: funnel stage ties at identical timestamps (strictly-after
must reject), out-of-order stage events, greedy earliest-entry
chains, same-day event collapse in retention, and documents too short
to carry a trigram (empty, one-word, two-word, whitespace-padded) plus
within-doc-only n-gram repeats (df=1 ⇒ NOT duplicated) in the
dup-ngram coverage signal. Both engines read the SAME parquet files.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


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


def _compare(name, ray_res, sql_df):
    import ray.data as rd

    ray_df = ray_res.to_pandas() if isinstance(ray_res, rd.Dataset) else ray_res
    a, b = _normalize(ray_df), _normalize(sql_df)
    assert list(a.columns) == list(b.columns), (name, list(a.columns),
                                                list(b.columns))
    assert len(a) == len(b), (name, len(a), len(b))
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(a[c].dtype, np.floating) \
                or np.issubdtype(b[c].dtype, np.floating):
            ok = np.allclose(av.astype(float), bv.astype(float), atol=1e-9)
        else:
            ok = (av == bv).all() if len(av) else True
        assert ok, f"{name}: column {c} differs\n{a}\n{b}"


_TS0 = pd.Timestamp("2025-06-01 00:00:00")


def _hours(h):
    return _TS0 + pd.Timedelta(hours=h)


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_sf")

    texts = [
        (1, "", "en"),                          # empty: no tokens, no trigrams
        (2, "ab", "en"),                        # 2 chars: no char-trigram
        (3, "a b", "en"),                       # 1-char words, 3 chars total
        (4, "the cat sat on the mat", "en"),    # dup pair with 5
        (5, "the cat sat on the mat", "en"),
        (6, "x y z w x y z", "de"),             # repeats ONLY within itself
        (7, "  padded   spaces  ", "de"),       # trim + \s+ contract
        (8, "hello", "de"),                     # single word
        (9, "p q r s p", "de"),                 # no trigram shared with any doc
        # 10 normalizes to the same canonical text as 7 ("padded
        # spaces") but is SHORTER raw — keep-best must keep 7
        (10, "PADDED SPACES", "de"),
        # 11/12: a language whose [p05, p95] n_chars band (6.9, 95.1)
        # excludes BOTH its documents — the length-outlier filter must
        # still report the lang with n_kept = 0 (single-token texts so
        # the word-ngram queries are untouched)
        (11, "zz", "fr"),
        (12, "q" * 100, "fr"),
    ]
    docs = pa.table({
        "doc_id": pa.array([t[0] for t in texts], pa.int64()),
        "text": pa.array([t[1] for t in texts], pa.string()),
        "lang": pa.array([t[2] for t in texts], pa.string()),
        "source": pa.array(["edge"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t[1]) for t in texts], pa.int64()),
    })
    pq.write_table(docs, str(d / "documents.parquet"))

    ev = [
        # user 1: click ties view exactly → strictly-after rejects it
        (1, _hours(0), "view"), (1, _hours(0), "click"),
        (1, _hours(1), "purchase"),
        # user 2: click BEFORE first view → chain stops at view
        (2, _hours(0), "click"), (2, _hours(1), "view"),
        (2, _hours(2), "purchase"),
        # user 3: clean full funnel + noise types
        (3, _hours(0), "signup"), (3, _hours(1), "view"),
        (3, _hours(2), "click"), (3, _hours(3), "purchase"),
        (3, _hours(4), "error"),
        # user 4: purchase only → counted nowhere
        (4, _hours(0), "purchase"),
        # user 5: two clicks after view; greedy earliest (h2) admits the
        # h3 purchase even though the later click is at h5
        (5, _hours(0), "view"), (5, _hours(5), "click"),
        (5, _hours(2), "click"), (5, _hours(3), "purchase"),
        # retention shapes: user 6 active day0 ×3 (collapses to one),
        # day2; user 7 single day
        (6, _hours(0), "view"), (6, _hours(1), "view"),
        (6, _hours(2), "click"), (6, _hours(48), "view"),
        (7, _hours(72), "view"),
    ]
    events = pa.table({
        "event_id": pa.array(range(len(ev)), pa.int64()),
        "ts": pa.array([e[1] for e in ev], pa.timestamp("us")),
        "user_id": pa.array([e[0] for e in ev], pa.int64()),
        "event_type": pa.array([e[2] for e in ev], pa.string()),
        "value": pa.array([1.0] * len(ev), pa.float64()),
    })
    pq.write_table(events, str(d / "events.parquet"))

    # embeddings side for the cross-modal join: vec 1 is the EMPTY doc
    # (its token count must be 0 on both engines, not DuckDB's
    # split-of-empty artifact 1); label 2 has a single member
    emb_ids = [1, 2, 3, 4, 6, 8, 11]
    emb_labels = [0, 0, 1, 1, 0, 1, 2]
    embeddings = pa.table({
        "vec_id": pa.array(emb_ids, pa.int64()),
        "embedding": pa.array([[float(i), 0.0, 1.0, -1.0] for i in emb_ids],
                              pa.list_(pa.float32())),
        "label": pa.array(emb_labels, pa.int32()),
    })
    pq.write_table(embeddings, str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_con(edge_dir):
    c = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{edge_dir}/{t}.parquet')")
    return c


NEW_OPS = ["doc_char_trigrams_topk", "doc_length_outlier_filter",
           "doc_dup_ngram_coverage", "events_funnel", "events_retention",
           "events_transition_matrix", "events_value_moving_sum",
           "doc_dedup_keep_best", "events_rolling_active_users",
           # empty-doc token-count parity (0 tokens, not DuckDB's
           # split-of-'' artifact) + the cross-modal join over vec 1
           "doc_token_stats", "doc_pack_assign", "doc_label_quality",
           "doc_word_topk", "doc_unique_words",
           # round-4 ops: empty/one-word/sub-trigram docs hit BM25's
           # missing-tf rows, the novelty CTE's trim guard, and the
           # co-occurrence vocabulary boundary ties
           "doc_bm25_topk", "doc_ngram_novelty", "doc_word_cooccurrence"]


@pytest.mark.parametrize("name", NEW_OPS)
def test_edge_corpus_matches_oracle(ray_session, edge_dir, edge_con, name):
    import __ray_entry__ as entrymod

    ray_res = entrymod.queries()[name](edge_dir)
    sql_df = edge_con.execute(entrymod.oracle_sql()[name]).fetchdf()
    _compare(name, ray_res, sql_df)


def test_funnel_edge_semantics(ray_session, edge_dir):
    """The constructed corpus decides each rule on its own: view=6
    users (1,2,3,5,6,7), click strictly-after=3 (3,5,6 — user 1's tie
    and user 2's early click rejected), purchase after that click=2
    (3, 5 — user 5 via the greedy EARLIEST click at h2, not the later
    h5; user 6 never purchases)."""
    import __ray_entry__ as entrymod

    out = entrymod.queries()["events_funnel"](edge_dir)
    got = dict(zip(out["stage"], out["n_users"]))
    assert got == {"view": 6, "click": 3, "purchase": 2}


def test_dup_ngram_edge_semantics(ray_session, edge_dir):
    """Docs 1-3 and 7-8 carry no trigram (absent); docs 4/5 are exact
    dups (every position duplicated); doc 6's repeated 'x y z' has df=1
    (same doc) so nothing counts as duplicated."""
    import __ray_entry__ as entrymod

    out = entrymod.queries()["doc_dup_ngram_coverage"](edge_dir).to_pandas()
    got = {int(r.doc_id): (int(r.n_ngrams), int(r.n_dup))
           for r in out.itertuples()}
    assert set(got) == {4, 5, 6, 9}
    assert got[4] == (4, 4) and got[5] == (4, 4)
    assert got[6] == (5, 0) and got[9] == (3, 0)


def test_keep_best_edge_semantics(ray_session, edge_dir):
    """Docs 7 ('  padded   spaces  ', 19 chars) and 10 ('PADDED
    SPACES', 13 chars) canonicalize identically: keep-best keeps the
    LONGER raw doc 7. Exact dups 4/5 (equal length) fall to the min-id
    tiebreak. Everything else survives."""
    import __ray_entry__ as entrymod

    kept = set(entrymod.queries()["doc_dedup_keep_best"](edge_dir)
               .to_pandas()["doc_id"])
    assert 7 in kept and 10 not in kept
    assert 4 in kept and 5 not in kept
    assert {1, 2, 3, 6, 8, 9} <= kept


def test_length_outlier_reports_empty_band_lang(ray_session, edge_dir):
    """Lang 'fr' (two docs, n_chars 2 and 100) has a [6.9, 95.1] band
    that excludes both documents: the filter report must still carry
    the lang with n_kept = 0 rather than dropping the row."""
    import __ray_entry__ as entrymod

    out = entrymod.queries()["doc_length_outlier_filter"](edge_dir)
    fr = out[out["lang"] == "fr"]
    assert len(fr) == 1 and int(fr["n_kept"].iloc[0]) == 0


def test_canonical_text_matches_duckdb_on_adversarial_chars():
    """canonical_text must equal the oracle expression char-by-char on
    inputs where Python's Unicode-aware \\s/lower()/strip() and
    RE2/utf8proc disagree: \\v and NBSP and U+2028 (Python \\s, NOT
    RE2 \\s), İ (full vs simple lowercase mapping), and boundary
    whitespace mixes."""
    from tag_ray.pipelines.dedup import canonical_text

    cases = [
        "", "   ", "a\x0bb", "a\xa0b", "\xa0a\xa0", "a\u2028b",
        "İstanbul  CITY", "A\tB\nC", " \t mixed \x0b ends\xa0",
        "Straße  GROß", "ÀÉÎ  œÆ", "a  b\tc\nd\fe\rf",
        # conditional Final_Sigma: Python lowers word-final Σ to ς,
        # utf8proc always to σ; plus genuine ς that must SURVIVE and
        # late-Unicode uppers DuckDB leaves unmapped
        "ΝΙΚΟΣ ΣΟΦΙΑ", "ήδη ς σ Σ", "\u2c2f\ua7c0 \U00010570x",
    ]
    con = duckdb.connect()
    for t in cases:
        want = con.execute(
            r"SELECT trim(regexp_replace(lower(?), '\s+', ' ', 'g'))",
            [t]).fetchone()[0]
        assert canonical_text(t) == want, (repr(t), repr(canonical_text(t)),
                                           repr(want))
    con.close()


def test_duck_lower_full_parity():
    """_duck_lower must equal DuckDB lower() for EVERY codepoint —
    re-sweeps the whole space so the frozen _KEEP_UPPER divergence set
    can never silently rot against the installed DuckDB build."""
    from tag_ray.pipelines.dedup import _duck_lower

    con = duckdb.connect()
    step = 8192
    for lo in range(0x20, 0x110000, step):
        s = "".join(chr(c) for c in range(lo, min(lo + step, 0x110000))
                    if not (0xD800 <= c <= 0xDFFF))
        if not s:
            continue
        want = con.execute("SELECT lower(?)", [s]).fetchone()[0]
        got = _duck_lower(s)
        if got != want:
            bad = [hex(ord(ch)) for ch in s
                   if _duck_lower(ch) != con.execute(
                       "SELECT lower(?)", [ch]).fetchone()[0]]
            raise AssertionError(f"divergent codepoints: {bad[:20]}")
    con.close()
