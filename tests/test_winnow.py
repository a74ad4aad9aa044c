"""Winnowing fingerprints: the MOSS guarantee and pair detection."""

import numpy as np

from tag_ray.pipelines.text import doc_winnow_fingerprint_pairs, winnow


def test_winnow_guarantee():
    """Any shared substring of length >= k + window - 1 must yield at
    least one shared fingerprint."""
    k, w = 5, 4
    passage = "a distinctive copied passage appears here verbatim"
    a = "prefix text one " + passage + " suffix alpha"
    b = "totally different opening " + passage + " and another ending"
    fa, fb = winnow(a, k, w), winnow(b, k, w)
    assert len(set(fa.tolist()) & set(fb.tolist())) >= 1


def test_winnow_selects_every_window():
    """Density: selected positions can't leave a gap of `window` k-grams."""
    text = "x" * 3 + "the quick brown fox jumps over the lazy dog" * 3
    k, w = 5, 4
    # re-derive picks with the same rolling hash by brute force
    fps = winnow(text, k, w)
    assert len(fps) >= (len(text) - k + 1) // (2 * w)  # loose density bound


def test_winnow_edges():
    assert winnow("", 5, 4).size == 0
    assert winnow("abcd", 5, 4).size == 0  # shorter than k
    assert winnow("abcde", 5, 4).size == 1  # exactly one k-gram


def test_pairs_on_corpus(ray_session):
    df = doc_winnow_fingerprint_pairs("/root/testdata/sf0.001", min_shared=10)
    # the corpus's injected near-dup docs share long passages: the
    # fingerprint pairs must recover them (28 known pairs at sf0.001)
    assert len(df) >= 20
    assert (df["n_shared"] >= 10).all()
    assert (df["doc_id_a"] < df["doc_id_b"]).all()


def test_contamination_check_finds_planted_leak(ray_session):
    """Plant a shared passage between an eval doc (id % 20 == 0) and a
    train doc; the decontamination pass must flag exactly that pair and
    no same-set pairs."""
    import pandas as pd

    import ray.data as rd

    from tag_ray.pipelines.text import contamination_from

    passage = ("the quick brown fox jumps over the lazy dog while "
               "seventeen violet zeppelins hover above the quiet harbor")
    docs = pd.DataFrame({
        "doc_id": [20, 7, 40, 41, 9],
        "text": [
            "intro words " + passage + " closing remarks",
            "completely different text about gardening and rainfall patterns",
            "prefix chatter " + passage + " and some trailing analysis",
            "prefix chatter " + passage + " and some trailing analysis",
            "unrelated musings on cartography and tide tables",
        ]})
    out = contamination_from(rd.from_pandas(docs).repartition(2),
                             eval_mod=20, min_shared=5)
    got = set(zip(out["eval_doc"], out["train_doc"]))
    # eval docs: 20 and 40 (id % 20 == 0); train doc 41 carries the leak
    assert (20, 41) in got, got
    assert (40, 41) in got, got
    # eval-eval overlap (20, 40) must NOT appear — same-set pair
    assert all(t == 41 for _, t in got), got
    assert not any(7 in p or 9 in p for p in got), got
