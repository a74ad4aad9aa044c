"""Near-duplicate pair semantics over 64-bit phashes.

Single source of truth for what counts as a near-dup pair — used by the
fixture generator (driver-side exact expectation), the distributed
pipeline (banded groupby; pipelines/dedup.py) and tests, so the golden
sets and the engine can never drift apart.

Definition: unordered pair (a, b) with ``a.image_id != b.image_id`` and
``hamming(phash_a, phash_b) <= max_hamming``. Candidate generation uses
4 16-bit bands (pigeonhole: full recall for Hamming <= 3, see
codecs/phash.py:phash_bands).
"""

from __future__ import annotations

import numpy as np

from tag_ray.codecs.phash import hamming64, phash_bands


def near_dup_pairs(ids: np.ndarray, phashes: np.ndarray,
                   max_hamming: int = 2) -> set[tuple[str, str]]:
    """Exact banded computation (single-process); returns {(id_lo, id_hi)}."""
    ids = np.asarray(ids)
    phashes = np.asarray(phashes, dtype=np.int64)
    bands = phash_bands(phashes, 4)
    pairs: set[tuple[str, str]] = set()
    for b in range(bands.shape[1]):
        order = np.argsort(bands[:, b], kind="stable")
        vals = bands[order, b]
        # contiguous runs of equal band values = candidate buckets
        starts = np.flatnonzero(np.r_[True, vals[1:] != vals[:-1]])
        ends = np.r_[starts[1:], len(vals)]
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            idx = order[s:e]
            for i in range(len(idx)):
                d = hamming64(phashes[idx[i]].repeat(len(idx) - i - 1),
                              phashes[idx[i + 1 :]])
                for j in np.flatnonzero(d <= max_hamming):
                    a, c = ids[idx[i]], ids[idx[i + 1 + j]]
                    if a != c:
                        pairs.add((a, c) if a < c else (c, a))
    return pairs


def near_dup_member_ids(ids, phashes, max_hamming: int = 2) -> set[str]:
    """Ids participating in at least one near-dup pair."""
    out: set[str] = set()
    for a, b in near_dup_pairs(ids, phashes, max_hamming):
        out.add(a)
        out.add(b)
    return out
