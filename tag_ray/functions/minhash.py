"""MinHash signature + banding kernels (import-light by design).

These run inside Ray worker tasks on the hot path of every near-dup
pipeline. They live in their own module — importing ONLY numpy,
pyarrow and functions.hashing — so a cold worker executing the
signature UDF doesn't pay the full ``tag_ray.pipelines.dedup`` import
chain (pandas + ray.data aggregates + codecs: measured ~1.2 s per
worker, which multiplied into a ~4.7 s first-execution stall of the
banded stage at 32 CPUs — most of BENCH_r03's minhash regression).
Worker closures resolve the per-worker memo through their own
``import tag_ray.functions.minhash`` (cloudpickle gives shipped
closures fresh ``__globals__`` per task — CLAUDE.md r2 lesson).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tag_ray.functions.hashing import hash_strings64

_MERSENNE = np.uint64((1 << 61) - 1)

# per-worker MinHasher memo, keyed (num_perm, shingle_k)
_MH_CACHE: dict[tuple[int, int], "MinHasher"] = {}


class MinHasher:
    """128-permutation minhash over word k-shingles, vectorized.

    Permutations h_i(x) = (a_i·x + b_i) mod (2^61-1); signature matrix
    banded into ``bands`` of ``128/bands`` rows each (standard LSH)."""

    def __init__(self, num_perm: int = 128, shingle_k: int = 3, seed: int = 1):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 61, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, 1 << 61, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k

    def shingles(self, text: str) -> np.ndarray:
        toks = text.strip().split()
        if len(toks) < self.k:
            grams = [" ".join(toks)] if toks else []
        else:
            grams = [" ".join(toks[i : i + self.k])
                     for i in range(len(toks) - self.k + 1)]
        return np.unique(hash_strings64(grams)) if grams else np.empty(0, np.uint64)

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        if shingle_hashes.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, np.uint64)
        x = shingle_hashes[:, None]
        with np.errstate(over="ignore"):
            hv = (self.a[None, :] * x + self.b[None, :]) % _MERSENNE
        return hv.min(axis=0)

    def signatures_batch(self, texts: list[str],
                         chunk_grams: int = 100_000) -> np.ndarray:
        """(n_docs, num_perm) signature matrix, one vectorized pass:
        flatten every doc's shingles, hash once, permute once, and
        segment-min back per doc with ``np.minimum.reduceat`` — no
        per-doc Python in the hot loop. Identical results to
        ``signature(shingles(t))`` (duplicate shingles can't change a
        min, so the per-doc unique step is unnecessary here)."""
        grams: list[str] = []
        counts = np.zeros(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            toks = text.strip().split()
            if not toks:
                continue
            if len(toks) < self.k:
                grams.append(" ".join(toks))
                counts[i] = 1
            else:
                m = len(toks) - self.k + 1
                grams.extend(" ".join(toks[j:j + self.k]) for j in range(m))
                counts[i] = m
        out = np.full((len(texts), self.num_perm),
                      np.iinfo(np.uint64).max, np.uint64)
        if not grams:
            return out
        h = hash_strings64(grams)
        ends = np.cumsum(counts)
        starts = ends - counts
        nonempty = np.flatnonzero(counts)
        # chunk by docs so the (grams, num_perm) permute matrix stays small
        lo = 0
        while lo < len(nonempty):
            hi = lo
            total = 0
            while hi < len(nonempty) and total < chunk_grams:
                total += counts[nonempty[hi]]
                hi += 1
            docs = nonempty[lo:hi]
            seg = np.concatenate([h[starts[d]:ends[d]] for d in docs])
            with np.errstate(over="ignore"):
                hv = (self.a[None, :] * seg[:, None] + self.b[None, :]) % _MERSENNE
            offs = np.r_[0, np.cumsum(counts[docs])[:-1]]
            out[docs] = np.minimum.reduceat(hv, offs, axis=0)
            lo = hi
        return out


def band_rows(ids: list, sigs: np.ndarray, bands: int) -> pa.Table:
    """(band_id, band_val, doc_id) LSH rows for a signature matrix."""
    n, num_perm = sigs.shape
    rows_per = num_perm // bands
    out_band, out_val, out_id = [], [], []
    for b in range(bands):
        seg = sigs[:, b * rows_per : (b + 1) * rows_per]
        # one stable 64-bit value per band segment
        val = seg[:, 0].copy()
        for j in range(1, rows_per):
            with np.errstate(over="ignore"):
                val = val * np.uint64(1099511628211) ^ seg[:, j]  # FNV-style fold
        out_band.append(np.full(n, b, np.int32))
        out_val.append(val.view(np.int64))
        out_id.append(ids)
    return pa.Table.from_pydict({
        "band_id": pa.array(np.concatenate(out_band)),
        "band_val": pa.array(np.concatenate(out_val)),
        "doc_id": pa.array(np.concatenate([np.asarray(i) for i in out_id])),
    })


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct word-k-shingle hashes, sorted by hash (verification-side
    set representation; prefix ordering is handled separately)."""
    toks = text.strip().split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    if not grams:
        return np.empty(0, np.uint64)
    return np.sort(np.unique(hash_strings64(grams)))
