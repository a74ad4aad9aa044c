"""Misra-Gries sketch: error bound, merge correctness, and the
distributed heavy-hitters query vs exact counts."""

import numpy as np
import pandas as pd

from tag_ray.functions.sketches import MisraGries


def _zipf_stream(n=50_000, vocab=2_000, seed=11):
    rng = np.random.default_rng(seed)
    return rng.zipf(1.3, n).clip(1, vocab).astype(str)


def test_mg_error_bound():
    s = _zipf_stream()
    k = 128
    mg = MisraGries(k)
    for chunk in np.array_split(s, 7):
        mg.update_batch(chunk)
    exact = pd.Series(s).value_counts()
    assert mg.n == len(s)
    for item, est in mg.counts.items():
        true = int(exact.get(item, 0))
        assert est <= true, (item, est, true)          # lower bound
        assert true - est <= len(s) / k + 1, (item, est, true)


def test_mg_merge_matches_single_pass_guarantee():
    s = _zipf_stream(n=60_000, seed=12)
    k = 128
    shards = np.array_split(s, 6)
    sketches = []
    for sh in shards:
        mg = MisraGries(k)
        mg.update_batch(sh)
        sketches.append(mg)
    merged = sketches[0]
    for mg in sketches[1:]:
        merged = merged.merge(mg)
    exact = pd.Series(s).value_counts()
    assert merged.n == len(s)
    # every item with true frequency > n/k must be present
    thr = len(s) / k
    for item, cnt in exact.items():
        if cnt > 2 * thr:  # comfortably heavy
            assert item in merged.counts, (item, cnt)
    for item, est in merged.counts.items():
        assert est <= int(exact.get(item, 0))


def test_doc_word_heavy_hitters_covers_exact_top(ray_session):
    from tag_ray.pipelines.text import doc_word_heavy_hitters, doc_word_topk

    sf = "/root/testdata/sf0.001"
    exact = doc_word_topk(sf, k=5)
    hh = doc_word_heavy_hitters(sf, k=512, min_frac=0.002)
    got = set(hh["item"])
    for w in exact["word"]:
        assert w in got, (w, sorted(got)[:10])
