"""Per-row constraint kernel: the engine's ``tag.ReadFrom``.

One pass over an Arrow batch runs the whole stateless suite:

  null/range (vectorized pyarrow.compute)
    → magic-vs-fmt sniff            (tag.go:41-56 / id.go:9-81)
    → header parse + declared-dims  (id3v2.go:68-135, vorbis.go:73-146)
    → full decode                   (format parsers, SURVEY.md §2.2)
    → engine-vs-reference invariant (sum.go:14-44, two-sided identity)
    → phash recompute vs declared   (cmd/check -sum mode, main.go:179-190)

Row-level error containment is absolute (cmd/check/main.go:154-159
lesson): a poison row yields a violation row, never a task failure.
The per-row byte loop is irreducible — each cell is an independent
variable-length binary payload, exactly like the reference's per-file
parse — but everything batch-shaped around it is vectorized, and the
loop only touches rows that survive the vectorized pre-filters.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from tag_ray import codecs
from tag_ray.codecs import DecodeError
from tag_ray.codecs.phash import hamming64
from tag_ray.config import DEFAULT_CONFIG, EngineConfig
from tag_ray.schema import VIOLATION_SCHEMA, Check

_REQUIRED_NONNULL = ("bytes", "w", "h", "fmt", "caption", "phash")


def _empty_violations() -> pa.Table:
    return VIOLATION_SCHEMA.empty_table()


class _Emit:
    """Violation accumulator for one batch."""

    __slots__ = ("ids", "parts", "checks", "details")

    def __init__(self):
        self.ids: list[str] = []
        self.parts: list[int] = []
        self.checks: list[str] = []
        self.details: list[str] = []

    def add(self, image_id: str, partition_id: int, check: str, detail: str):
        self.ids.append(image_id)
        self.parts.append(partition_id)
        self.checks.append(check)
        self.details.append(detail)

    def table(self) -> pa.Table:
        return pa.Table.from_pydict(
            {"image_id": self.ids, "partition_id": self.parts,
             "check": self.checks, "detail": self.details},
            schema=VIOLATION_SCHEMA,
        )


class RefIndex:
    """Vectorized reference lookup: sorted fixed-width id array plus
    aligned md5 bytes, queried with one ``np.searchsorted`` per batch.

    Replaces the per-worker Python dict of the broadcast table — at
    800k reference rows the dict held ~1.6M boxed objects (every gen-2
    GC pass scanned them under the allocation-heavy decode loop) and
    cost ~1.3 s to build per worker; the arrays are two flat buffers,
    build in ~0.1 s, and the id comparison is C memcmp."""

    __slots__ = ("ids", "md5", "has")

    def __init__(self, tbl: pa.Table):
        ids = np.asarray(tbl["image_id"].to_pylist(), dtype="U")
        md5v = tbl["caption_md5"].to_pylist()
        has = np.array([m is not None for m in md5v], dtype=bool)
        md5 = np.asarray([m or "" for m in md5v], dtype="S32")
        order = np.argsort(ids, kind="stable")
        self.ids = ids[order]
        self.md5 = md5[order]
        self.has = has[order]

    def lookup(self, ids_list: list) -> tuple[np.ndarray, np.ndarray]:
        """→ (present bool[n], index into the sorted arrays int64[n])."""
        q = np.asarray(["" if x is None else x for x in ids_list], dtype="U")
        if len(self.ids) == 0:
            return np.zeros(len(q), dtype=bool), np.zeros(len(q), np.int64)
        idx = np.minimum(np.searchsorted(self.ids, q), len(self.ids) - 1)
        return self.ids[idx] == q, idx


def validate_batch(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG,
                   ref_md5: dict[str, str | None] | None = None) -> pa.Table:
    """Run the full per-row suite on one Arrow batch → violations table.

    ``ref_md5``: broadcast reference-id lookup (image_id → caption_md5)
    for the referential + caption checks; None disables both (they then
    run via the distributed anti-join path, pipelines/validate.py).
    """
    n = batch.num_rows
    if n == 0:
        return _empty_violations()
    out = _Emit()

    ids = batch["image_id"].to_pylist()
    parts = batch["partition_id"].to_pylist() if "partition_id" in batch.column_names \
        else [-1] * n

    # ---- vectorized null checks ------------------------------------------
    null_mask = np.zeros(n, dtype=bool)  # rows with any required-field null
    for col in _REQUIRED_NONNULL:
        isnull = pc.is_null(batch[col]).to_numpy(zero_copy_only=False)
        if isnull.any():
            for i in np.flatnonzero(isnull):
                out.add(ids[i], parts[i], Check.NULL_FIELD, col)
            null_mask |= isnull

    # ---- vectorized range checks on declared dims ------------------------
    w_np = batch["w"].to_numpy(zero_copy_only=False).astype(np.float64)
    h_np = batch["h"].to_numpy(zero_copy_only=False).astype(np.float64)
    dims_bad = np.zeros(n, dtype=bool)
    with np.errstate(invalid="ignore"):
        for name, arr in (("w", w_np), ("h", h_np)):
            bad = (~np.isnan(arr)) & ((arr < cfg.min_dim) | (arr > cfg.max_dim))
            for i in np.flatnonzero(bad):
                out.add(ids[i], parts[i], Check.RANGE_FIELD, f"{name}={int(arr[i])}")
            dims_bad |= bad
    dims_usable = ~dims_bad & ~np.isnan(w_np) & ~np.isnan(h_np)

    # ---- per-row byte pipeline (only rows with fmt+bytes present) --------
    fmts = batch["fmt"].to_pylist()
    blobs = batch["bytes"].to_pylist()
    phs = batch["phash"].to_numpy(zero_copy_only=False)
    ph_null = pc.is_null(batch["phash"]).to_numpy(zero_copy_only=False)

    for i in range(n):
        fmt, data = fmts[i], blobs[i]
        if fmt is None or data is None:
            continue  # already a null_field violation
        # metadata-invariance: a trailing annotation block never changes
        # identification, decode, or payload hash (id.go:60-81 /
        # sum.go:117-134 semantics)
        data, _trailer = codecs.split_trailer(data)
        if len(data) > cfg.max_decode_bytes:
            out.add(ids[i], parts[i], Check.DECODE_ERROR,
                    f"cell {len(data)}B exceeds max_decode_bytes")
            continue
        detected = codecs.identify(data)
        if detected != fmt:
            out.add(ids[i], parts[i], Check.FMT_MAGIC,
                    f"declared={fmt} detected={detected or 'none'}")
            continue
        try:
            hw, hh = codecs.read_header(fmt, data, max_pixels=cfg.max_pixels)
        except DecodeError as e:
            out.add(ids[i], parts[i], Check.DECODE_ERROR, str(e))
            continue
        if dims_usable[i] and (int(w_np[i]) != hw or int(h_np[i]) != hh):
            out.add(ids[i], parts[i], Check.HEADER_DIMS,
                    f"declared={int(w_np[i])}x{int(h_np[i])} header={hw}x{hh}")
        try:
            px = codecs.decode(fmt, data, max_pixels=cfg.max_pixels)
        except DecodeError as e:
            out.add(ids[i], parts[i], Check.DECODE_ERROR, str(e))
            continue
        try:
            ref_px = codecs.decode_reference(fmt, data, max_pixels=cfg.max_pixels)
            if fmt in codecs.LOSSLESS:
                invariant_ok = px.shape == ref_px.shape and (px == ref_px).all()
                inv_detail = "lossless mismatch"
            else:
                p = codecs.psnr(px, ref_px)
                invariant_ok = p >= cfg.psnr_min_db
                inv_detail = f"psnr={p:.1f}dB<{cfg.psnr_min_db}"
        except DecodeError as e:
            invariant_ok, inv_detail = False, f"reference decoder: {e}"
        if not invariant_ok:
            out.add(ids[i], parts[i], Check.DECODE_INVARIANT, inv_detail)
        if not ph_null[i]:
            d = hamming64(np.array([codecs.phash64(px)]),
                          np.array([phs[i]], dtype=np.int64))[0]
            if d > cfg.phash_max_hamming:
                out.add(ids[i], parts[i], Check.PHASH_MISMATCH, f"hamming={int(d)}")

    # ---- declared-charset caption decode (M10 parity) --------------------
    # caption_raw bytes must decode under their declared caption_enc
    # label (ISO-8859-1 / UTF-8 / UTF-16 BOM/BE/LE — the reference's
    # text-frame decode, id3v2frames.go:323-418) and normalize to the
    # caption column. Nullable columns: tables without them skip this.
    if ("caption_raw" in batch.column_names
            and "caption_enc" in batch.column_names):
        from tag_ray.functions.textenc import decode_declared

        raws = batch["caption_raw"].to_pylist()
        encs = batch["caption_enc"].to_pylist()
        caps_enc = batch["caption"].to_pylist()
        for i in range(n):
            raw, enc = raws[i], encs[i]
            if raw is None or enc is None:
                continue
            try:
                decoded = decode_declared(raw, enc,
                                          cfg.utf16_default_order)
            except (UnicodeDecodeError, LookupError) as e:
                out.add(ids[i], parts[i], Check.CAPTION_ENC,
                        f"undecodable as {enc}: {e}")
                continue
            if caps_enc[i] is not None and decoded != caps_enc[i]:
                out.add(ids[i], parts[i], Check.CAPTION_ENC,
                        f"decoded({enc}) != caption")

    # ---- referential + caption checks against broadcast lookup -----------
    if isinstance(ref_md5, RefIndex):
        caps = batch["caption"].to_pylist()
        valid = np.array([x is not None for x in ids], dtype=bool)
        present, idx = ref_md5.lookup(ids)
        for i in np.flatnonzero(valid & ~present):
            out.add(ids[i], parts[i], Check.REF_ORPHAN, "id not in reference table")
        has_cap = np.array([c is not None for c in caps], dtype=bool)
        hit = valid & present
        hit[hit] &= ref_md5.has[idx[hit]]
        for i in np.flatnonzero(hit & has_cap):
            got = hashlib.md5(caps[i].encode()).hexdigest()
            expect = ref_md5.md5[idx[i]].decode()
            if got != expect:
                out.add(ids[i], parts[i], Check.CAPTION_REF,
                        f"md5={got[:8]} expected={expect[:8]}")
    elif ref_md5 is not None:  # plain-dict form (library API compat)
        caps = batch["caption"].to_pylist()
        for i in range(n):
            if ids[i] is None:
                continue
            if ids[i] not in ref_md5:
                out.add(ids[i], parts[i], Check.REF_ORPHAN, "id not in reference table")
                continue
            expect = ref_md5[ids[i]]
            if caps[i] is not None and expect is not None:
                got = hashlib.md5(caps[i].encode()).hexdigest()
                if got != expect:
                    out.add(ids[i], parts[i], Check.CAPTION_REF,
                            f"md5={got[:8]} expected={expect[:8]}")
    return out.table()


# Per-worker-process cache for the broadcast reference lookup used by
# the TASK form of the row suite (make_row_suite_task). Ray reuses
# worker processes across tasks, datasets and sweeps within a session,
# so the dict build is paid once per worker per job — the same
# amortization an actor's __init__ gives, without actor processes.
# Keyed by the ObjectRef id and cleared on change, so it never holds
# more than the current job's table.
_REF_TASK_CACHE: dict[str, dict] = {}


def make_row_suite_task(cfg: EngineConfig, ref_handle=None, registry=None):
    """TASK form of the row suite — the default execution mode.

    A plain function runs in Ray's shared warm worker pool: consecutive
    sweeps reuse live workers instead of spawning a fresh actor pool
    per Dataset. Measured at 32 CPUs on the 800k scaling corpus
    (interleaved trials): tasks 18.7 → 15.0 → 13.3 s across sweeps as
    workers warm, actors 18.8 / 19.2 / **43.9** s — the outlier is
    actor churn (a new pool spinning up while the previous pool tears
    down), the main source of trial-to-trial variance in the scaling
    protocol. The broadcast lookup is fetched zero-copy and memoized
    per worker via ``_REF_TASK_CACHE``."""

    def fn(batch: pa.Table) -> pa.Table:
        ref = None
        if ref_handle is not None:
            import ray

            # resolve the cache through the worker's OWN import of this
            # module, not the closure's global: cloudpickle ships the
            # closure by value, so its __globals__ are a fresh dict per
            # task deserialization and a direct global reference misses
            # once per task (measured: exactly one 1.3 s dict rebuild
            # added to every 0.8 s task at 8 CPUs)
            import tag_ray.checks.row_checks as _rc

            key = ref_handle.hex()
            ref = _rc._REF_TASK_CACHE.get(key)
            if ref is None:
                ref = RefIndex(ray.get(ref_handle))
                _rc._REF_TASK_CACHE.clear()
                _rc._REF_TASK_CACHE[key] = ref
        out = validate_batch(batch, cfg, ref)
        if registry is not None:
            extra = registry.run(batch)
            if extra is not None and extra.num_rows:
                out = pa.concat_tables([out, extra])
        return out

    return fn


class RowValidator:
    """Actor-pool form of the row suite (``map_batches(RowValidator,
    concurrency=N, ...)``) — kept for callers that pin an explicit
    actor count (test determinism, per-actor memory caps); the default
    path is ``make_row_suite_task``.

    __init__ runs once per actor (broadcast lookup fetched from the
    object store exactly once — SURVEY.md §2.4 J1 broadcast side); per
    batch it is pure compute.
    """

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG, ref_handle=None,
                 registry=None):
        self.cfg = cfg
        self.ref_md5: dict[str, str | None] | None = None
        # registered custom checks (checks/registry.py §2.9 surface)
        # arrive by value — snapshot taken at pipeline construction
        self.registry = registry
        if ref_handle is not None:
            import ray
            obj = ref_handle if isinstance(ref_handle, dict) else ray.get(ref_handle)
            if isinstance(obj, pa.Table):
                obj = RefIndex(obj)
            self.ref_md5 = obj

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = validate_batch(batch, self.cfg, self.ref_md5)
        if self.registry is not None:
            extra = self.registry.run(batch)
            if extra is not None and extra.num_rows:
                out = pa.concat_tables([out, extra])
        return out
