"""Text-analysis queries over the documents table.

Language/quality/token analysis a training-data pipeline needs
(task brief), expressed as vectorized map_batches + small groupbys.
Tokenization contract shared with the oracle: split on whitespace runs
after trim — Python ``text.strip().split()`` ≡ DuckDB
``regexp_split_to_array(trim(text), '\\s+')``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from tag_ray.sources import table


def doc_lang_counts(sf_dir: str) -> rd.Dataset:
    return (table(sf_dir, "documents", columns=["lang"])
            .groupby("lang").aggregate(Count(alias_name="n")))


LANG_COUNTS_SQL = "SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang"


def doc_token_stats(sf_dir: str) -> rd.Dataset:
    docs = table(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def derive(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        n_tokens = np.fromiter((len(t.strip().split()) for t in texts),
                               dtype=np.int64, count=len(texts))
        n_uniq = np.fromiter((len(set(t.strip().split())) for t in texts),
                             dtype=np.int64, count=len(texts))
        return pa.Table.from_pydict({
            "doc_id": b["doc_id"],
            "n_tokens": pa.array(n_tokens),
            "n_uniq_tokens": pa.array(n_uniq),
            "n_chars": b["n_chars"],
        })

    return docs.map_batches(derive, batch_format="pyarrow")


TOKEN_STATS_SQL = r"""
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
       len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS n_uniq_tokens,
       n_chars
FROM documents
"""


def doc_sample_hash(sf_dir: str, hex_below: str = "1a") -> rd.Dataset:
    """Deterministic key-hash sampling (≈ int(hex_below,16)/256 of rows).

    The reproducible alternative to ``Dataset.random_sample`` for
    training-data splits: membership depends only on the key, so the
    sample is stable across runs, resumable shards, and engines — which
    is also what makes it oracle-checkable. Embarrassingly parallel
    (pure map_batches filter, no shuffle)."""

    docs = table(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def pick(b: pa.Table) -> pa.Table:
        keys = [hashlib.md5(str(d).encode()).hexdigest()[:2]
                for d in b["doc_id"].to_pylist()]
        mask = pa.array([k < hex_below for k in keys])
        return b.filter(mask)

    return docs.map_batches(pick, batch_format="pyarrow")


SAMPLE_HASH_SQL = """
SELECT doc_id, lang, n_chars FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
"""


def doc_fingerprint(sf_dir: str) -> rd.Dataset:
    """Per-row content fingerprint (md5) — the analogue of the reference's
    metadata-invariant checksum printed per file (cmd/sum/main.go:36)."""
    docs = table(sf_dir, "documents", columns=["doc_id", "text"])

    def derive(b: pa.Table) -> pa.Table:
        fps = [hashlib.md5(t.encode()).hexdigest() for t in b["text"].to_pylist()]
        return pa.Table.from_pydict(
            {"doc_id": b["doc_id"], "fingerprint": pa.array(fps, pa.string())})

    return docs.map_batches(derive, batch_format="pyarrow")


FINGERPRINT_SQL = "SELECT doc_id, md5(text) AS fingerprint FROM documents"


def doc_word_topk(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Global word frequency top-k: flat-map explode → pre-aggregated counts
    per batch → small groupby merge → sort/limit. The per-batch partial
    aggregation keeps the shuffle at vocabulary size, not corpus size."""
    docs = table(sf_dir, "documents", columns=["text"])

    def partial_counts(b: pa.Table) -> pa.Table:
        from collections import Counter
        c: Counter = Counter()
        for t in b["text"].to_pylist():
            c.update(t.strip().split())
        return pa.Table.from_pydict({
            "word": pa.array(list(c.keys()), pa.string()),
            "cnt": pa.array(list(c.values()), pa.int64()),
        })

    counts = (docs.map_batches(partial_counts, batch_format="pyarrow")
              .groupby("word").aggregate(Sum("cnt", alias_name="n")))
    top = counts.sort(["n", "word"], descending=[True, False]).limit(k).to_pandas()
    top["n"] = top["n"].astype("int64")
    return top[["word", "n"]]


WORD_TOPK_SQL = r"""
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word FROM documents)
GROUP BY word ORDER BY n DESC, word LIMIT 20
"""


def doc_lang_quality(sf_dir: str) -> rd.Dataset:
    """Per-language length/quality profile (grouped aggregate)."""
    docs = table(sf_dir, "documents", columns=["lang", "n_chars"])
    agg = docs.groupby("lang").aggregate(
        Count(alias_name="n"),
        Mean("n_chars", alias_name="avg_chars_raw"),
        Min("n_chars", alias_name="min_chars"),
        Max("n_chars", alias_name="max_chars"),
    )

    def finalize(b: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "lang": b["lang"], "n": b["n"],
            "avg_chars": pa.array(np.round(
                b["avg_chars_raw"].to_numpy(zero_copy_only=False), 4)),
            "min_chars": b["min_chars"], "max_chars": b["max_chars"],
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


LANG_QUALITY_SQL = """
SELECT lang, COUNT(*) AS n, ROUND(AVG(n_chars), 4) AS avg_chars,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM documents GROUP BY lang
"""


# --- heuristic language-ID (engine-side only; the `lang` column plays the
#     declared value, the n-gram heuristic the detected one — same
#     declared-vs-detected shape as fmt vs magic bytes) ------------------

_LANG_MARKERS = {
    "en": {"the", "and", "of", "a"},
    "es": {"el", "la", "de", "que"},
    "fr": {"le", "la", "et", "les"},
    "de": {"der", "die", "und", "das"},
    "zh": set(),
}


def doc_langid_heuristic(sf_dir: str) -> rd.Dataset:
    """Stopword-marker language scorer → (doc_id, lang, lang_detected,
    agree). Over synthetic word-soup text the detector mostly abstains
    ('und' = undetermined) — the point is the stage shape, not accuracy."""
    docs = table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def detect(b: pa.Table) -> pa.Table:
        out = []
        for t in b["text"].to_pylist():
            toks = set(t.strip().split())
            best, best_hits = "und", 0
            for lang, markers in _LANG_MARKERS.items():
                hits = len(toks & markers)
                if hits > best_hits:
                    best, best_hits = lang, hits
            out.append(best)
        det = pa.array(out, pa.string())
        import pyarrow.compute as pc
        return pa.Table.from_pydict({
            "doc_id": b["doc_id"], "lang": b["lang"], "lang_detected": det,
            "agree": pc.equal(b["lang"], det),
        })

    return docs.map_batches(detect, batch_format="pyarrow")
