"""Bloom prefilter: no false negatives ever, false-positive rate in the
expected band, and the prefilter→exact-verify join is oracle-identical."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data as rd

from tag_ray.functions.bloom import build_bloom, probe_mask


def test_bloom_no_false_negatives(ray_session):
    rng = np.random.default_rng(3)
    members = rng.choice(10_000_000, 20_000, replace=False).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"k": members})).repartition(4)
    handle = build_bloom(ds, "k", n_bits_log2=20)
    val = ray.get(handle)
    assert probe_mask(val, members).all()


def test_bloom_false_positive_rate(ray_session):
    rng = np.random.default_rng(4)
    members = rng.choice(10_000_000, 20_000, replace=False).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"k": members})).repartition(4)
    handle = build_bloom(ds, "k", n_bits_log2=20)
    val = ray.get(handle)
    non = np.setdiff1d(
        rng.choice(10_000_000, 50_000, replace=False).astype(np.int64),
        members)
    fpr = probe_mask(val, non).mean()
    # k=4 hashes, m=2^20 bits, n=20k keys: theoretical fpr ~ (1-e^{-kn/m})^k ~ 3e-5
    assert fpr < 0.01, fpr


def test_phash_topk_matches_bruteforce(ray_session):
    from tag_ray.codecs.phash import hamming64
    from tag_ray.fixtures import cached_corpus
    from tag_ray.pipelines import validate as V

    corpus = cached_corpus(n_rows=300, n_partitions=4, seed=42)
    got = V.phash_topk(corpus + "/images", "img-0000-000000", k=10)
    assert len(got) == 10
    import pyarrow.parquet as pq
    t = pq.read_table(corpus + "/images", columns=["image_id", "phash"])
    ids = np.asarray(t["image_id"].to_pylist())
    hs = t["phash"].to_numpy()
    qh = hs[ids == "img-0000-000000"][0]
    keep = ids != "img-0000-000000"
    d = hamming64(hs[keep], np.full(keep.sum(), qh))
    ref = pd.DataFrame({"image_id": ids[keep], "hamming": d.astype("int64")})
    ref = ref.sort_values(["hamming", "image_id"], kind="mergesort").head(10)
    assert list(got["image_id"]) == list(ref["image_id"])
    assert list(got["hamming"]) == list(ref["hamming"])
