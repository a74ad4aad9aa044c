"""Batched model inference as an actor-pool stage.

The LLM-pipeline quality-classifier pattern (CCNet/fastText-style
hashed-n-gram linear model scoring every document): the model table is
built ONCE per actor in ``__init__`` (never per batch), inference is
one vectorized pass per batch. In production the constructor would
load trained weights from a path; offline the weights are a seeded
deterministic table so the stage is fully testable — swapping in real
weights changes no plumbing (the multimodal-stub discipline of
stages/multimodal.py, with the difference that this kernel is real).

The reference analogue is T1 (static tables loaded once per process —
SURVEY.md §2.3, e.g. the genre table id3v2.go:19-55) combined with the
per-record scoring sweep of cmd/check (cmd/check/main.go:151-194).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from tag_ray.functions.hashing import hash_strings64
from tag_ray.functions.rounding import round_half_away

_TOKEN_RE = re.compile(r"[^\W_\d]+", re.UNICODE)


class HashedLinearScorer:
    """Callable-class stage for ``map_batches(..., concurrency=N)``:
    score = sigmoid(mean over token unigram+bigram features of w[h]).

    ``__init__`` materializes the 2^``log2_dim``-entry weight table
    (the "model load" — once per actor); ``__call__`` is per batch:
    tokenize, hash features (vectorized via hash_strings64), bucket,
    and mean-pool with one bincount-style reduceat per batch."""

    def __init__(self, seed: int = 1234, log2_dim: int = 18):
        rng = np.random.default_rng(seed)
        self.dim = 1 << log2_dim
        self.weights = rng.normal(scale=1.0, size=self.dim)
        self.mask = np.uint64(self.dim - 1)

    def _features(self, text: str) -> list[str]:
        toks = [t.lower() for t in _TOKEN_RE.findall(text or "")]
        return toks + [a + "_" + b for a, b in zip(toks, toks[1:])]

    def __call__(self, b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        feats: list[str] = []
        counts = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            f = self._features(t)
            counts[i] = len(f)
            feats.extend(f)
        sums = np.zeros(len(texts))
        nz = counts > 0
        if feats:
            idx = (hash_strings64(feats) & self.mask).astype(np.int64)
            vals = self.weights[idx]
            # reduceat over the NONZERO docs only: a zero-count doc's
            # degenerate span would otherwise steal its neighbor's tail
            bounds = np.concatenate(([0], np.cumsum(counts[nz])[:-1]))
            sums[nz] = np.add.reduceat(vals, bounds)
        mean = sums / np.maximum(counts, 1)
        score = 1.0 / (1.0 + np.exp(-mean))
        return pa.Table.from_pydict({
            "doc_id": b["doc_id"],
            "n_features": pa.array(counts, pa.int64()),
            "score": pa.array(round_half_away(score, 6), pa.float64())})
