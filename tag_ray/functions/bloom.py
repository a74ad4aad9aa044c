"""Vectorized Bloom filter for shuffle-avoiding semi-joins.

At 100 TB the expensive part of ``big ⋉ medium`` is shuffling the big
side; when the medium side's key set is too large to broadcast exactly
but its *bitmap* is not, a Bloom prefilter drops most non-matching rows
before the exchange. The protocol is prefilter → exact verify: Bloom
false positives (never negatives) are removed by the downstream exact
join, so results stay oracle-identical — the filter only shrinks the
shuffle volume by the selectivity factor.

All bit math is numpy on uint64 words: k = 4 independent positions per
key via the suite's ``_mix64`` with distinct seed mixes; build is one
``np.bitwise_or.at`` per block, probe is k gathers + ANDs per batch.
Per-block bitmaps are OR-merged on the driver as a bounded stream (one
``n_bits/8``-byte row per block); a production cluster would tree-reduce
them instead — the seam is ``or_merge``, shape-compatible with a
``map_batches`` reduction tree.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from tag_ray.functions.sketches import _mix64

_SEEDS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                   0x165667B19E3779F9, 0x27D4EB2F165667C5],
                  dtype=np.uint64)


def _positions(keys: np.ndarray, n_bits_log2: int) -> np.ndarray:
    """(k, n) bit positions for int keys."""
    u = keys.astype(np.int64).view(np.uint64)
    mask = np.uint64((1 << n_bits_log2) - 1)
    with np.errstate(over="ignore"):
        return np.stack([_mix64(u ^ s) & mask for s in _SEEDS])


def build_bloom(keys_ds: rd.Dataset, key_col: str,
                n_bits_log2: int = 22) -> "ray.ObjectRef":
    """Build a Bloom bitmap over an integer key column; returns an
    ObjectRef to the uint64-word bitmap (``ray.put`` once — every probe
    task reads it zero-copy from the local object store)."""
    n_words = (1 << n_bits_log2) // 64

    def local_bitmap(b: pa.Table) -> pa.Table:
        bm = np.zeros(n_words, dtype=np.uint64)
        pos = _positions(b[key_col].to_numpy(zero_copy_only=False),
                         n_bits_log2)
        w = (pos >> 6).ravel()
        bit = np.uint64(1) << (pos & np.uint64(63)).ravel()
        np.bitwise_or.at(bm, w, bit)
        return pa.Table.from_pydict({"bm": pa.array([bm.tobytes()])})

    merged = np.zeros(n_words, dtype=np.uint64)
    # driver-side streaming OR of one small row per block (tree-reduce
    # in prod; the merge op is associative and commutative)
    for batch in keys_ds.map_batches(
            local_bitmap, batch_format="pyarrow",
            batch_size=None).iter_batches(  # one bitmap per BLOCK, not
            batch_size=None, batch_format="pyarrow"):  # per 1024 rows
        for buf in batch["bm"].to_pylist():
            merged |= np.frombuffer(buf, dtype=np.uint64)
    return ray.put((merged, n_bits_log2))


def probe_mask(handle_val, keys: np.ndarray) -> np.ndarray:
    """Boolean membership mask (true ⇒ key possibly present)."""
    bm, n_bits_log2 = handle_val
    pos = _positions(keys, n_bits_log2)
    ok = np.ones(keys.shape[0], dtype=bool)
    for row in pos:
        ok &= (bm[row >> 6] >> (row & np.uint64(63))) & np.uint64(1) != 0
    return ok
