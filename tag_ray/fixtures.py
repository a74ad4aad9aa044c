"""Deterministic synthetic fixture generator (FIXTURES.md).

Mirrors the reference's test-corpus philosophy — the *same logical
content* written into *every supported format*, split into valid rows
("with_tags/") and per-class violation rows ("without_tags/" + fuzz,
tag_test.go:55-84, testdata/README.md) — as a seeded generator that
emits the ``input_hint`` image+caption table together with sidecar
golden-expectation tables (the analogue of the ``testMetadata`` structs,
tag_test.go:12-53).

Every row is derived from ``(seed, row_index)`` only, so any subset of
rows can be regenerated independently and the table is byte-stable
across runs and machines.
"""

from __future__ import annotations

import json
import os
import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tag_ray import codecs
from tag_ray.config import DEFAULT_CONFIG, EngineConfig
from tag_ray.functions.hashing import md5_hex
from tag_ray.schema import IMAGE_SCHEMA, REF_IDS_SCHEMA, Check

# ---------------------------------------------------------------------------
# deterministic vocabulary for captions (Zipf-skewed key space, FIXTURES.md §1)

_WORDS = (
    "amber bridge canyon dune ember fjord grove harbor inlet juniper kestrel "
    "lagoon meadow nebula orchard prairie quarry ridge summit tundra umber "
    "valley willow xenon yonder zephyr basalt cobalt delta echo flint"
).split()


def golden_caption(rng: np.random.Generator) -> str:
    """Deterministic sentence; Zipf-ranked head sentences repeat across rows."""
    zipf_rank = min(int(rng.zipf(1.3)), 200)
    srng = np.random.default_rng([7, zipf_rank])
    n = int(srng.integers(4, 9))
    return " ".join(srng.choice(_WORDS, size=n)) + f" #{zipf_rank}"


# ---------------------------------------------------------------------------
# violation-class schedule: deterministic function of row index (per 100 rows)

_SCHEDULE = (
    ["ok"] * 62
    + ["caption_enc_bad"] * 4
    + ["bad_magic"] * 4
    + ["truncated"] * 4
    + ["dim_mismatch"] * 4
    + ["pixel_corrupt"] * 4
    + ["caption_mismatch"] * 3
    + ["orphan_ref"] * 3
    + ["null_field"] * 3
    + ["range_field"] * 2
    + ["dup_id"] * 2
    + ["near_dup"] * 2
    + ["fuzz"] * 3
)
assert len(_SCHEDULE) == 100

_SIZES = np.array([16, 24, 32, 48, 64])
_FUZZ_KINDS = ("empty", "garbage_after_magic", "huge_dims")


def class_of(i: int) -> str:
    return _SCHEDULE[i % 100]


def _base_pixels(rng: np.random.Generator, brightness: float = 0.0) -> np.ndarray:
    """Structured content (gradient + blocks + noise) so phash is meaningful."""
    h = w = int(rng.choice(_SIZES))
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128
        + 80 * np.sin(xx / w * np.pi * rng.integers(1, 4))
        + 60 * np.cos(yy / h * np.pi * rng.integers(1, 4))
    )
    img = np.stack([base * s for s in rng.uniform(0.6, 1.0, 3)], axis=-1)
    img += rng.normal(0, 12, img.shape) + brightness
    return np.clip(img, 0, 255).astype(np.uint8)


def _huge_dims_bytes(fmt: str) -> bytes:
    """Valid magic + header declaring 2^30 pixels per side (fuzz: the
    declared-length DoS guard, util.go:44-54 / sum_test.go:8-40 spirit)."""
    import struct
    if fmt == "png":
        ihdr = struct.pack(">IIBBBBB", 1 << 30, 1 << 30, 8, 2, 0, 0, 0)
        chunk = struct.pack(">I", 13) + b"IHDR" + ihdr
        crc = struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        return codecs.CODECS["png"].magic + chunk + crc
    if fmt == "ppm":
        return b"P6\n1073741824 1073741824\n255\n"
    if fmt == "bmp":
        return (b"BM" + b"\x00" * 8 + struct.pack("<I", 54)
                + struct.pack("<IiiHHI", 40, 1 << 30, 1 << 30, 1, 24, 0) + b"\x00" * 16)
    return codecs.CODECS["dctq"].magic + struct.pack("<IIB", 1 << 30, 1 << 30, 4)


@dataclass
class _Row:
    image_id: str
    bytes_: bytes | None
    w: int | None
    h: int | None
    fmt: str | None
    caption: str | None
    phash: int
    partition_id: int
    in_ref: bool = True
    ref_caption: str | None = None  # caption the ref table carries (md5'd)
    expected: list[tuple[str, str]] = None  # (check, detail_hint)
    caption_raw: bytes | None = None   # declared-charset source bytes (M10)
    caption_enc: str | None = None


def _make_row(i: int, seed: int, n_partitions: int, cfg: EngineConfig,
              drift_partition: int) -> list[_Row]:
    """Generate the row(s) for base index ``i`` — pure function of (seed, i)."""
    rng = np.random.default_rng([seed, i])
    cls = class_of(i)
    part = i % n_partitions
    image_id = f"img-{part:04d}-{i:06d}"
    fmt = cfg.formats[int(rng.integers(len(cfg.formats)))]
    brightness = 40.0 if part == drift_partition else 0.0
    px = _base_pixels(rng, brightness)
    h, w = px.shape[:2]
    caption = golden_caption(rng)
    data = codecs.encode(fmt, px)
    ph = codecs.phash64(px)
    row = _Row(image_id, data, w, h, fmt, caption, ph, part,
               ref_caption=caption, expected=[])

    if cls == "ok":
        pass
    elif cls == "bad_magic":
        other = cfg.formats[(cfg.formats.index(fmt) + 1) % len(cfg.formats)]
        row.bytes_ = codecs.encode(other, px)
        row.expected.append((Check.FMT_MAGIC, other))
    elif cls == "truncated":
        keep = max(len(codecs.CODECS[fmt].magic) + 4,
                   int(len(data) * rng.uniform(0.2, 0.8)))
        row.bytes_ = data[:keep]
        row.expected.append((Check.DECODE_ERROR, "truncated"))
    elif cls == "dim_mismatch":
        row.w = w + int(rng.integers(1, 5))
        row.expected.append((Check.HEADER_DIMS, f"declared={row.w}x{h}"))
    elif cls == "pixel_corrupt":
        bad = px.copy()
        qh, qw = h // 2 or 1, w // 2 or 1
        bad[:qh, :qw] = 255 - bad[:qh, :qw]  # invert a quadrant: moves phash far
        row.bytes_ = codecs.encode(fmt, bad)
        row.expected.append((Check.PHASH_MISMATCH, "corrupt"))
    elif cls == "caption_mismatch":
        row.caption = caption + " CORRUPTED"
        row.expected.append((Check.CAPTION_REF, "mismatch"))
    elif cls == "caption_enc_bad":
        # M10 violation class: the declared-charset source bytes either
        # don't decode under their label or decode to something other
        # than the caption column (id3v2frames.go:323-418 semantics)
        if i % 2 == 0:
            row.caption_enc = "utf-8"
            row.caption_raw = b"\xc3\x28" + caption.encode()  # bad continuation
            row.expected.append((Check.CAPTION_ENC, "undecodable"))
        else:
            row.caption_enc = "utf-16-be"
            row.caption_raw = (caption + " ALTERED").encode("utf-16-be")
            row.expected.append((Check.CAPTION_ENC, "decoded mismatch"))
    elif cls == "orphan_ref":
        row.in_ref = False
        row.expected.append((Check.REF_ORPHAN, "missing"))
    elif cls == "null_field":
        col = ("caption", "w", "fmt")[int(rng.integers(3))]
        if col == "caption":
            row.caption = None
        elif col == "w":
            row.w = None
        else:
            row.fmt = None
        row.expected.append((Check.NULL_FIELD, col))
    elif cls == "range_field":
        row.w = int(rng.choice([-3, 0, cfg.max_dim + 1]))
        row.expected.append((Check.RANGE_FIELD, f"w={row.w}"))
    elif cls == "fuzz":
        kind = _FUZZ_KINDS[i % len(_FUZZ_KINDS)]
        if kind == "empty":
            row.bytes_ = b""
            row.expected.append((Check.FMT_MAGIC, "empty"))
        elif kind == "garbage_after_magic":
            row.bytes_ = codecs.CODECS[fmt].magic + bytes(rng.integers(0, 256, 64, dtype=np.uint8))
            row.expected.append((Check.DECODE_ERROR, "garbage"))
        else:  # huge_dims
            row.bytes_ = _huge_dims_bytes(fmt)
            row.expected.append((Check.DECODE_ERROR, "dims_guard"))
    elif cls == "dup_id":
        dup = _Row(image_id, data, w, h, fmt, caption, ph, part,
                   ref_caption=caption, expected=[])
        row.expected.append((Check.DUP_ID, "2"))
        return [row, dup]
    elif cls == "near_dup":
        near = px.copy().astype(np.int16)
        near[h // 2 :, :] += int(rng.integers(2, 6))
        near = np.clip(near, 0, 255).astype(np.uint8)
        ph2 = codecs.phash64(near)
        if codecs.hamming64(np.array([ph]), np.array([ph2]))[0] > cfg.near_dup_max_hamming:
            near, ph2 = px, ph  # fall back to exact pixel copy (Hamming 0)
        j = i + 10_000_000  # disjoint id space for partners
        part2 = j % n_partitions
        cap2 = golden_caption(rng)
        partner = _Row(f"img-{part2:04d}-{j:06d}", codecs.encode(fmt, near),
                       near.shape[1], near.shape[0], fmt, cap2,
                       ph2, part2, ref_caption=cap2, expected=[])
        # NEAR_DUP expectations are computed globally after generation (see
        # below): accidental phash collisions between unrelated rows count too.
        return [row, partner]
    return [row]


_CAPTION_ENCS = ("utf-8", "iso-8859-1", "utf-16", "utf-16-be", "utf-16-le")


def _assign_caption_enc(rows: list[_Row], seed: int, i: int) -> None:
    """Give every generated row a declared-charset source column pair
    (caption_raw, caption_enc) consistent with its FINAL caption —
    ISO-8859-1 / UTF-8 / UTF-16 bare-LE (the BOM-less default-order
    path) / UTF-16 LE-BOM / UTF-16 BE-BOM / explicit BE/LE, chosen by a
    FRESH rng stream ([seed, i, 77]) so existing draws are untouched.
    Rows the class logic already assigned (caption_enc_bad) keep their
    adversarial values; null captions carry null source columns."""
    from tag_ray.functions.textenc import encode_declared

    rng = np.random.default_rng([seed, i, 77])
    for r in rows:
        if r.caption is None or r.caption_enc is not None:
            continue
        enc = _CAPTION_ENCS[int(rng.integers(len(_CAPTION_ENCS)))]
        if enc == "utf-16":
            v = int(rng.integers(3))
            if v == 0:      # bare LE: exercises the default-order knob
                raw = encode_declared(r.caption, "utf-16")
            elif v == 1:    # LE BOM
                raw = encode_declared(r.caption, "utf-16", with_bom=True)
            else:           # BE BOM under the bare "utf-16" label
                raw = encode_declared(r.caption, "utf-16-be", with_bom=True)
        else:
            raw = encode_declared(r.caption, enc)
        r.caption_enc, r.caption_raw = enc, raw


def generate(out_dir: str, n_rows: int = 1000, n_partitions: int = 4,
             seed: int | None = None, cfg: EngineConfig = DEFAULT_CONFIG,
             drift_partition: int | None = None, force: bool = False) -> str:
    """Write the fixture corpus under ``out_dir``; returns ``out_dir``.

    Layout (resumable-output shape the engine itself uses — one parquet
    file per partition under ``images/``):
        images/part-{k:04d}.parquet
        ref_ids.parquet
        expected_violations.parquet
        expected_partition_status.parquet
        manifest.json
    """
    seed = cfg.seed if seed is None else seed
    if drift_partition is None:
        drift_partition = n_partitions - 1
    manifest_path = os.path.join(out_dir, "manifest.json")
    params = {"n_rows": n_rows, "n_partitions": n_partitions, "seed": seed,
              "drift_partition": drift_partition, "version": 5}
    if not force and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            if json.load(f) == params:
                return out_dir
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)

    rows: list[_Row] = []
    for i in range(n_rows):
        rs = _make_row(i, seed, n_partitions, cfg, drift_partition)
        _assign_caption_enc(rs, seed, i)
        rows.extend(rs)

    # global near-dup expectation: same semantics as the pipeline
    # (functions/neardup.py) over the declared phash column, so accidental
    # collisions between unrelated rows are part of the golden set too.
    from tag_ray.functions.neardup import near_dup_member_ids
    nd_ids = near_dup_member_ids(
        np.array([r.image_id for r in rows]),
        np.array([r.phash for r in rows], dtype=np.int64),
        cfg.near_dup_max_hamming,
    )
    emitted_nd: set[str] = set()
    for r in rows:
        if r.image_id in nd_ids and r.image_id not in emitted_nd:
            r.expected.append((Check.NEAR_DUP, "pair"))
            emitted_nd.add(r.image_id)

    # --- images, one file per partition ---
    by_part: dict[int, list[_Row]] = {}
    for r in rows:
        by_part.setdefault(r.partition_id, []).append(r)
    for k in range(n_partitions):
        prows = by_part.get(k, [])
        tbl = pa.Table.from_pydict(
            {
                "image_id": [r.image_id for r in prows],
                "bytes": [r.bytes_ for r in prows],
                "w": [r.w for r in prows],
                "h": [r.h for r in prows],
                "fmt": [r.fmt for r in prows],
                "caption": [r.caption for r in prows],
                "phash": [r.phash for r in prows],
                "partition_id": [r.partition_id for r in prows],
                "caption_raw": [r.caption_raw for r in prows],
                "caption_enc": [r.caption_enc for r in prows],
            },
            schema=IMAGE_SCHEMA,
        )
        pq.write_table(tbl, os.path.join(out_dir, "images", f"part-{k:04d}.parquet"))

    # --- reference id table (dedup ids: dup rows appear once) ---
    seen: dict[str, str | None] = {}
    for r in rows:
        if r.in_ref and r.image_id not in seen:
            seen[r.image_id] = r.ref_caption
    ref = pa.Table.from_pydict(
        {
            "image_id": list(seen),
            "source": ["synthetic" for _ in seen],
            "caption_md5": [None if c is None else md5_hex(c) for c in seen.values()],
        },
        schema=REF_IDS_SCHEMA,
    )
    pq.write_table(ref, os.path.join(out_dir, "ref_ids.parquet"))

    # --- expected violations (per-row + cross-row; drift is partition-level) ---
    ev = {"image_id": [], "check": [], "partition_id": []}
    for r in rows:
        for check, _hint in r.expected:
            ev["image_id"].append(r.image_id)
            ev["check"].append(check)
            ev["partition_id"].append(r.partition_id)
    ev_tbl = pa.Table.from_pydict(ev).cast(
        pa.schema([("image_id", pa.string()), ("check", pa.string()),
                   ("partition_id", pa.int32())]))
    pq.write_table(ev_tbl, os.path.join(out_dir, "expected_violations.parquet"))

    # --- expected per-partition status ---
    counts: dict[int, int] = {k: 0 for k in range(n_partitions)}
    nrows: dict[int, int] = {k: 0 for k in range(n_partitions)}
    for r in rows:
        nrows[r.partition_id] += 1
        counts[r.partition_id] += len(r.expected)
    status = pa.Table.from_pydict(
        {
            "partition_id": list(range(n_partitions)),
            "rows": [nrows[k] for k in range(n_partitions)],
            "pass": [counts[k] == 0 for k in range(n_partitions)],
            "violation_count": [counts[k] for k in range(n_partitions)],
        },
        schema=pa.schema([("partition_id", pa.int32()), ("rows", pa.int64()),
                          ("pass", pa.bool_()), ("violation_count", pa.int64())]),
    )
    pq.write_table(status, os.path.join(out_dir, "expected_partition_status.parquet"))

    with open(manifest_path, "w") as f:
        json.dump(params, f)
    return out_dir


def cached_corpus(n_rows: int, n_partitions: int, seed: int = 42,
                  root: str = "/tmp/tag_ray_fixtures") -> str:
    """Generate-once cache keyed by params; safe to call from tests/bench."""
    out = os.path.join(root, f"n{n_rows}_p{n_partitions}_s{seed}_v5")
    return generate(out, n_rows=n_rows, n_partitions=n_partitions, seed=seed)
