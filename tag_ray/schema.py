"""Arrow schemas + check-name vocabulary.

The input table shape is authoritative from BASELINE.json ``input_hint``:
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)``. The violation row is the engine's
``Raw()``-style dynamic escape hatch (tag.go:144-146): a fixed envelope
``(image_id, partition_id, check, detail)`` whose ``detail`` carries
check-specific payload as a string.
"""

from __future__ import annotations

import pyarrow as pa

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("partition_id", pa.int32()),
        # declared-charset caption source (M10 parity, round 4): the
        # raw bytes a caption was ingested from plus their declared
        # encoding label; nullable — tables without them skip the
        # caption_encoding check
        ("caption_raw", pa.binary()),
        ("caption_enc", pa.string()),
    ]
)

VIOLATION_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("partition_id", pa.int32()),
        ("check", pa.string()),
        ("detail", pa.string()),
    ]
)

REF_IDS_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("source", pa.string()),
        ("caption_md5", pa.string()),
    ]
)


class Check:
    """Check-name vocabulary (violation ``check`` column values).

    Each maps to a reference behavior — see SURVEY.md §2 and FIXTURES.md §2.
    """

    FMT_MAGIC = "fmt_magic"              # declared fmt vs magic bytes (id.go:9-81)
    DECODE_ERROR = "decode_error"        # parse/decode failure (util.go:44-62 errors)
    HEADER_DIMS = "header_dims"          # declared w/h vs encoded header (id3v2.go:277-280)
    DECODE_INVARIANT = "decode_invariant"  # engine vs reference decoder (sum.go:14-44)
    PHASH_MISMATCH = "phash_mismatch"    # declared phash vs recomputed (sum.go concept)
    CAPTION_REF = "caption_ref_mismatch"  # caption md5 vs reference table (manifest check)
    REF_ORPHAN = "ref_orphan"            # id missing from reference table (cmd/check/main.go:160-164)
    CAPTION_ENC = "caption_encoding"     # declared-charset decode vs caption (id3v2frames.go:323-418)
    NULL_FIELD = "null_field"            # nulls in required columns
    RANGE_FIELD = "range_field"          # declared dims outside sane range
    DUP_ID = "dup_id"                    # image_id multiplicity > 1 (cmd/check/main.go:190)
    NEAR_DUP = "near_dup"                # phash Hamming <= tol, distinct ids
    DRIFT = "drift"                      # partition-level distribution drift (north_star)

    PER_ROW = (FMT_MAGIC, DECODE_ERROR, HEADER_DIMS, DECODE_INVARIANT,
               PHASH_MISMATCH, CAPTION_REF, REF_ORPHAN, CAPTION_ENC,
               NULL_FIELD, RANGE_FIELD)
    CROSS_ROW = (DUP_ID, NEAR_DUP, DRIFT)
