"""OGG paged container — real page walk, table-driven CRC32, and
stateful cross-page packet reassembly (RFC 3533 page format, public).

This is the engine's analogue of the reference's OGG demuxer: the
page-level CRC verification and the packet reassembly that must carry
state ACROSS reads (a packet whose lacing ends in 255 continues into
the next page's payload) — the one reference mechanism
(/root/reference/ogg.go:60-134, table-driven CRC ogg.go:20-47, T2
stateful demux in SURVEY.md §2) that had no engine counterpart until
round 5. Implementation is from the public RFC 3533 spec, not a port.

Page layout (RFC 3533 §6):

  0   "OggS"             capture pattern
  4   version            0
  5   header_type        0x01 continued | 0x02 BOS | 0x04 EOS
  6   granule_position   8B LE
  14  serial             4B LE
  18  page_sequence      4B LE
  22  crc                4B LE (poly 0x04C11DB7, init 0, no reflection,
                          no xor-out; computed with this field zeroed)
  26  n_segments         1B
  27  segment table      n_segments lacing values (255 ⇒ packet continues)
  …   payload            sum(lacing) bytes

The audio payload convention here ("OggPCM-ish", honest and
self-describing — this container does NOT implement Vorbis):

  packet 0: b"\\x7fOPCM" + version(1B=0) + channels(1B) +
            sample_rate(4B LE) + bits(1B=16)
  packet 1: comment packet — vendor(4B LE len + utf8) +
            n_comments(4B LE) + per comment (4B LE len + "key=value")
            (the vorbis-comment KV structure, reference ogg.go/M25)
  packet 2…: int16 LE interleaved PCM frames

Every declared length is bounds-checked before allocation (the
reference's 10 MB guard discipline, util.go:44-54).
"""

from __future__ import annotations

import struct

import numpy as np

from tag_ray.codecs import DecodeError

MAGIC = b"OggS"
MAX_DECODE_BYTES = 10 * 1024 * 1024
_HDR = struct.Struct("<4sBBqIIIB")  # through n_segments
_F_CONT, _F_BOS, _F_EOS = 0x01, 0x02, 0x04

_AUDIO_MAGIC = b"\x7fOPCM"


def _make_crc_table() -> np.ndarray:
    """256-entry table for the OGG CRC-32: forward (non-reflected)
    polynomial 0x04C11DB7, init 0, xor-out 0 — NOT zlib's crc32.
    Module-level singleton: static tables build once per process (T1)."""
    tab = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        r = np.uint32(i << 24)
        for _ in range(8):
            r = np.uint32((r << 1) ^ 0x04C11DB7) if r & 0x80000000 \
                else np.uint32(r << 1)
        tab[i] = r
    return tab


_CRC_TABLE = _make_crc_table()


def page_crc(page: bytes | bytearray) -> int:
    """CRC over a full page with its CRC field already zeroed —
    vectorized table walk (one numpy gather per byte would still be a
    Python loop; pages are ≤ 65 KB so the per-byte loop over a
    memoryview is bounded and this is never a hot corpus path)."""
    crc = 0
    tab = _CRC_TABLE
    for b in page:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ int(tab[((crc >> 24) & 0xFF) ^ b])
    return crc


def _build_page(payload_segments: list[bytes], header_type: int,
                granule: int, serial: int, seq: int) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for seg in payload_segments:
        lacing.append(len(seg))
        body += seg
    page = bytearray(_HDR.pack(MAGIC, 0, header_type, granule, serial,
                               seq, 0, len(lacing)))
    page += lacing
    page += body
    crc = page_crc(page)
    struct.pack_into("<I", page, 22, crc)
    return bytes(page)


def encode_pages(packets: list[bytes], serial: int = 1,
                 page_payload: int = 4096,
                 granules: list[int] | None = None) -> bytes:
    """Lace ``packets`` into pages. Packets larger than the page budget
    span pages: a 255 lacing value ends the page mid-packet and the next
    page carries the continuation flag — exactly the state the reader's
    assembler must track. A packet whose length is a multiple of 255
    terminates with an explicit 0 lacing value (RFC 3533 nil lacing)."""
    # split every packet into ≤255-byte segments (255 ⇒ continues)
    out = []
    seq = 0
    segs: list[bytes] = []   # segments staged for the current page
    page_bytes = 0
    cont_next = False        # next flushed page continues a packet

    def flush(last_packet_done: bool, eos: bool = False,
              granule: int = -1):
        nonlocal seq, segs, page_bytes, cont_next
        ht = (_F_CONT if cont_next else 0) | (_F_BOS if seq == 0 else 0) \
            | (_F_EOS if eos else 0)
        out.append(_build_page(segs, ht, granule, serial, seq))
        seq += 1
        cont_next = not last_packet_done
        segs = []
        page_bytes = 0

    n = len(packets)
    for pi, pkt in enumerate(packets):
        g = granules[pi] if granules else pi
        mv = memoryview(pkt)
        pieces = [bytes(mv[i:i + 255]) for i in range(0, len(pkt), 255)]
        if not pieces or len(pieces[-1]) == 255:
            pieces.append(b"")  # nil lacing terminator
        for si, piece in enumerate(pieces):
            segs.append(piece)
            page_bytes += len(piece)
            last_of_packet = si == len(pieces) - 1
            if len(segs) == 255 or page_bytes >= page_payload \
                    or (last_of_packet and pi == n - 1):
                flush(last_of_packet, eos=(last_of_packet and pi == n - 1),
                      granule=g if last_of_packet else -1)
    return b"".join(out)


class PacketAssembler:
    """Cross-page packet reassembly — the stateful demux core (T2).

    ``feed(lacing, payload, continued)`` consumes one page and returns
    the packets COMPLETED by that page; a packet still open when the
    page ends stays buffered in ``self._partial`` until a later feed
    closes it. Feeding a non-continuation page while a partial packet
    is open (a lost page) raises — silent resync would corrupt the
    payload downstream."""

    def __init__(self):
        self._partial = bytearray()
        self._open = False

    def feed(self, lacing: bytes, payload: memoryview,
             continued: bool) -> list[bytes]:
        if self._open and not continued:
            raise DecodeError("continuation state lost: previous page "
                              "left a packet open but this page does not "
                              "carry the continuation flag")
        if continued and not self._open:
            raise DecodeError("page carries the continuation flag but "
                              "no packet is open")
        done: list[bytes] = []
        pos = 0
        for lace in lacing:
            self._partial += payload[pos:pos + lace]
            pos += lace
            self._open = True
            if lace < 255:
                done.append(bytes(self._partial))
                self._partial = bytearray()
                self._open = False
        return done

    @property
    def open(self) -> bool:
        return self._open


def iter_pages(data: bytes, verify_crc: bool = True):
    """Walk pages: yields (header dict, lacing bytes, payload memoryview).
    Every declared size is bounds-checked before use; a CRC mismatch
    raises with the page index (⇒ a violation row upstream, never a
    task failure)."""
    if len(data) > MAX_DECODE_BYTES:
        raise DecodeError(f"stream declares {len(data)}B "
                          f"(> {MAX_DECODE_BYTES}B guard)")
    mv = memoryview(data)
    pos = 0
    idx = 0
    while pos < len(data):
        if pos + _HDR.size > len(data):
            raise DecodeError(f"page {idx}: truncated header")
        magic, ver, htype, granule, serial, seq, crc, nseg = \
            _HDR.unpack_from(data, pos)
        if magic != MAGIC:
            raise DecodeError(f"page {idx}: bad capture pattern "
                              f"{bytes(magic)!r}")
        if ver != 0:
            raise DecodeError(f"page {idx}: unsupported version {ver}")
        lace_off = pos + _HDR.size
        if lace_off + nseg > len(data):
            raise DecodeError(f"page {idx}: truncated segment table")
        lacing = bytes(mv[lace_off:lace_off + nseg])
        body_len = sum(lacing)
        body_off = lace_off + nseg
        if body_off + body_len > len(data):
            raise DecodeError(f"page {idx}: payload overruns stream "
                              f"({body_len}B declared)")
        if verify_crc:
            page = bytearray(mv[pos:body_off + body_len])
            struct.pack_into("<I", page, 22, 0)
            actual = page_crc(page)
            if actual != crc:
                raise DecodeError(f"page {idx}: crc mismatch "
                                  f"(declared {crc:#010x}, "
                                  f"computed {actual:#010x})")
        yield ({"header_type": htype, "granule": granule, "serial": serial,
                "seq": seq, "index": idx,
                "bos": bool(htype & _F_BOS), "eos": bool(htype & _F_EOS),
                "continued": bool(htype & _F_CONT)},
               lacing, mv[body_off:body_off + body_len])
        pos = body_off + body_len
        idx += 1


def read_packets(data: bytes, verify_crc: bool = True) -> list[bytes]:
    """Pages → packets via the stateful assembler. Sequence gaps and a
    stream ending mid-packet raise (truncation is a violation)."""
    asm = PacketAssembler()
    packets: list[bytes] = []
    expect_seq = None
    for hdr, lacing, payload in iter_pages(data, verify_crc=verify_crc):
        if expect_seq is not None and hdr["seq"] != expect_seq:
            raise DecodeError(f"page {hdr['index']}: sequence jump "
                              f"{expect_seq} → {hdr['seq']}")
        expect_seq = hdr["seq"] + 1
        packets.extend(asm.feed(lacing, payload, hdr["continued"]))
    if asm.open:
        raise DecodeError("stream ended mid-packet (truncated)")
    return packets


# ---------------------------------------------------------------------------
# audio payload convention (OggPCM-ish)


def encode_audio(pcm: np.ndarray, sample_rate: int,
                 comments: dict[str, str] | None = None,
                 serial: int = 1, page_payload: int = 4096,
                 frames_per_packet: int = 1024) -> bytes:
    """int16 PCM (n,) or (n, channels) → paged stream."""
    pcm = np.asarray(pcm)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    if pcm.dtype != np.int16:
        raise ValueError("encode_audio takes int16 PCM")
    n, ch = pcm.shape
    head = _AUDIO_MAGIC + struct.pack("<BBIB", 0, ch, sample_rate, 16)
    com = bytearray()
    vendor = b"tag_ray oggp"
    com += struct.pack("<I", len(vendor)) + vendor
    items = sorted((comments or {}).items())
    com += struct.pack("<I", len(items))
    for k, v in items:
        kv = f"{k}={v}".encode()
        com += struct.pack("<I", len(kv)) + kv
    packets = [head, bytes(com)]
    granules = [0, 0]
    raw = pcm.astype("<i2").tobytes()
    stride = frames_per_packet * ch * 2
    done_frames = 0
    for off in range(0, len(raw), stride):
        packets.append(raw[off:off + stride])
        done_frames = min(n, done_frames + frames_per_packet)
        granules.append(done_frames)
    if len(packets) == 2:  # zero-length audio still carries one packet
        packets.append(b"")
        granules.append(0)
    return encode_pages(packets, serial=serial, page_payload=page_payload,
                        granules=granules)


def parse_audio(data: bytes, verify_crc: bool = True) -> dict:
    """Full parse: header + comments + reassembled PCM.
    Raises ``DecodeError`` on any structural violation."""
    packets = read_packets(data, verify_crc=verify_crc)
    if len(packets) < 2:
        raise DecodeError("missing header/comment packets")
    head = packets[0]
    if len(head) != len(_AUDIO_MAGIC) + 7 or \
            head[:len(_AUDIO_MAGIC)] != _AUDIO_MAGIC:
        raise DecodeError("bad audio header packet")
    ver, ch, rate, bits = struct.unpack_from("<BBIB", head,
                                             len(_AUDIO_MAGIC))
    if ver != 0 or bits != 16 or ch == 0:
        raise DecodeError(f"unsupported audio params v{ver}/{bits}b/{ch}ch")
    com = packets[1]
    pos = 0

    def take(n: int, what: str) -> bytes:
        nonlocal pos
        if pos + n > len(com):
            raise DecodeError(f"comment packet truncated at {what}")
        out = com[pos:pos + n]
        pos += n
        return out

    vlen = struct.unpack("<I", take(4, "vendor length"))[0]
    if vlen > len(com):
        raise DecodeError(f"vendor declares {vlen}B (> packet)")
    take(vlen, "vendor")
    ncom = struct.unpack("<I", take(4, "comment count"))[0]
    if ncom > len(com):  # each comment needs ≥4 bytes
        raise DecodeError(f"{ncom} comments declared (> packet bound)")
    comments: dict[str, str] = {}
    for _ in range(ncom):
        clen = struct.unpack("<I", take(4, "comment length"))[0]
        if clen > len(com):
            raise DecodeError(f"comment declares {clen}B (> packet)")
        kv = take(clen, "comment").decode("utf-8", errors="strict")
        k, _, v = kv.partition("=")
        comments[k] = v
    body = b"".join(packets[2:])
    if len(body) % (2 * ch):
        raise DecodeError("PCM payload not a whole number of frames")
    pcm = np.frombuffer(body, dtype="<i2").reshape(-1, ch)
    return {"sample_rate": int(rate), "n_channels": int(ch),
            "comments": comments, "pcm": pcm,
            "n_packets": len(packets),
            "duration_us": int(round(len(pcm) * 1_000_000 / rate))}
