"""From-spec metadata parsers + deterministic encoders for compressed
A/V containers: MPEG-1 Layer III (MP3), ISO BMFF (MP4), Ogg/Vorbis.

Metadata-FIRST decode (r6 verdict #3): a real crawl corpus's audio and
video columns arrive in entropy-coded containers this environment has
no codec libraries for. What a 100 TB ingest pipeline needs from them
FIRST is header metadata — duration, sample rate, codec id, dims,
payload size — and that is pure structural parsing (sync-word walks,
box walks, page walks) fully specified by public documents:

- MP3:  ISO/IEC 11172-3 frame header (11-bit sync, version, layer,
        bitrate index, sample-rate index, padding); Layer III frame
        length = 144 * bitrate / sample_rate + padding, 1152 samples
        per MPEG-1 frame.
- MP4:  ISO/IEC 14496-12 box structure (ftyp / moov / mvhd / trak /
        mdia / mdhd / hdlr / minf / stbl / stsd, mdat); duration =
        mvhd duration / mvhd timescale; codec = first stsd sample
        entry's fourcc; dims from the VisualSampleEntry.
- Ogg:  RFC 3533 pages (capture pattern "OggS", 27-byte header,
        lacing table, CRC-32 poly 0x04C11DB7 init 0 non-reflected)
        + the Vorbis I identification header (channels, sample rate);
        duration = last-page granule position / sample rate.

SAMPLE decode of these containers remains the documented loud gate
(multimodal._gray_series / _cell_series raise) — nothing here fakes
PCM or pixels. Parsers VERIFY structure (sync bits per frame, box
size arithmetic, page CRCs), so corrupt payloads fail loudly instead
of yielding garbage metadata.

The encoders build structurally valid containers around md5-chain
payload bytes (deterministic, cross-session reproducible) so the
parsers are exercised against real byte layouts — and every geometry
field is a pure formula of media_id, which is what lets the DuckDB
oracle replay mm_decode_stats arithmetically (overhead constants are
derived from the encoders at oracle-build time, see mp4_overhead).

Reference parity note: lime-etl is orchestration-only (no media
surface); this extends SURVEY §2H beyond the reference.
"""

from __future__ import annotations

import hashlib
import struct

# ---------------------------------------------------------------------------
# shared deterministic payload bytes
# ---------------------------------------------------------------------------


def _chain(seed: str, nbytes: int) -> bytes:
    """md5-chain byte stream — same construction as the base media
    fixture's _payload, namespaced by a string seed so AV payloads
    never collide with the PPM/WAV/Y4M streams."""
    out = bytearray()
    counter = 0
    while len(out) < nbytes:
        out += hashlib.md5(f"{seed}:{counter}".encode()).digest()
        counter += 1
    return bytes(out[:nbytes])


# ---------------------------------------------------------------------------
# MP3 — ISO/IEC 11172-3 frame headers
# ---------------------------------------------------------------------------

# MPEG-1 Layer III tables (the slices the fixture exercises).
_MP3_BITRATES = {9: 128_000}  # index 0b1001
_MP3_RATES = {2: 32_000}  # index 0b10
MP3_SAMPLE_RATE = 32_000
MP3_BITRATE = 128_000
MP3_FRAME_SAMPLES = 1152  # MPEG-1 Layer III
# 144 * 128000 / 32000 = 576 exactly -> no padding bit needed
MP3_FRAME_BYTES = 144 * MP3_BITRATE // MP3_SAMPLE_RATE
# per-frame milliseconds: 1152 * 1000 / 32000 = 36 exactly
MP3_FRAME_MS = MP3_FRAME_SAMPLES * 1000 // MP3_SAMPLE_RATE

# sync 11111111 111 | version 11 (MPEG-1) | layer 01 (III) | no-CRC 1
_MP3_H0, _MP3_H1 = 0xFF, 0xFB
# bitrate idx 1001 | rate idx 10 | padding 0 | private 0
_MP3_H2 = (9 << 4) | (2 << 2)
# mono 11 | mode-ext 00 | copyright 0 | original 1 | emphasis 00
_MP3_H3 = 0xC4


def encode_mp3(media_id: int, n_frames: int) -> bytes:
    """Structurally valid CBR MPEG-1 Layer III stream: n_frames frames
    of 576 bytes each (4-byte header + md5-chain side/main data)."""
    header = bytes((_MP3_H0, _MP3_H1, _MP3_H2, _MP3_H3))
    return b"".join(
        header + _chain(f"mp3:{media_id}:{ix}", MP3_FRAME_BYTES - 4)
        for ix in range(n_frames)
    )


def _skip_id3v2(raw: bytes) -> int:
    """Offset of the first audio byte past an ID3v2 tag (ID3v2.4 §3.1:
    10-byte header, 4-byte SYNCHSAFE size excluding header, optional
    10-byte footer flagged by bit 4). 0 when no tag is present —
    real-world MP3s are usually ID3-tagged, and routing them to the
    frame walk without skipping the tag would misreport a valid file
    as corrupt."""
    if raw[:3] != b"ID3" or len(raw) < 10:
        return 0
    size = (
        ((raw[6] & 0x7F) << 21)
        | ((raw[7] & 0x7F) << 14)
        | ((raw[8] & 0x7F) << 7)
        | (raw[9] & 0x7F)
    )
    return 10 + size + (10 if raw[5] & 0x10 else 0)


def mp3_info(raw: bytes) -> dict:
    """Walk the frame chain validating every header's sync/version/
    layer bits; duration from the frame count and the header's
    sample-rate index — never from trusting the caller. A leading
    ID3v2 tag is skipped (not parsed — tag text is metadata the
    pipeline doesn't need)."""
    pos, n_frames = _skip_id3v2(raw), 0
    rate = None
    while pos < len(raw):
        h = raw[pos : pos + 4]
        if len(h) < 4 or h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
            raise ValueError(f"MP3 sync lost at byte {pos}")
        if (h[1] >> 3) & 0x3 != 0x3 or (h[1] >> 1) & 0x3 != 0x1:
            raise NotImplementedError("only MPEG-1 Layer III parsed")
        br = _MP3_BITRATES.get(h[2] >> 4)
        sr = _MP3_RATES.get((h[2] >> 2) & 0x3)
        if br is None or sr is None:
            raise NotImplementedError("bitrate/sample-rate index outside fixture slice")
        rate = sr
        padding = (h[2] >> 1) & 0x1
        pos += 144 * br // sr + padding
        n_frames += 1
    if pos != len(raw) or n_frames == 0:
        raise ValueError("truncated MP3 frame chain")
    return {
        "codec": "mp3",
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_ms": n_frames * MP3_FRAME_SAMPLES * 1000 // rate,
    }


# ---------------------------------------------------------------------------
# MP4 — ISO/IEC 14496-12 boxes (video track, mp4v sample entry)
# ---------------------------------------------------------------------------

MP4_MVHD_TIMESCALE = 1000  # ms-granular movie clock
MP4_MDHD_TIMESCALE = 90_000  # conventional video media clock


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _mp4_boxes(duration_ms: int, width: int, height: int, mdat_payload: bytes) -> bytes:
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"mp41")
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x2I", 0, 0, 0)  # version 0, flags, creation, modification
        + struct.pack(">II", MP4_MVHD_TIMESCALE, duration_ms)
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)  # volume 1.0
        + b"\x00" * 10  # reserved
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">B3B2I", 0, 0, 0, 7, 0, 0)  # v0, flags=enabled|in-movie|preview
        + struct.pack(">I4xI", 1, duration_ms)  # track_ID, reserved, duration
        + b"\x00" * 8  # reserved
        + struct.pack(">hhhh", 0, 0, 0, 0)  # layer, group, volume, reserved
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed dims
    )
    mdhd = _box(
        b"mdhd",
        struct.pack(">B3x2I", 0, 0, 0)
        + struct.pack(
            ">II", MP4_MDHD_TIMESCALE, duration_ms * (MP4_MDHD_TIMESCALE // 1000)
        )
        + struct.pack(">HH", 0x55C4, 0),  # language 'und', pre_defined
    )
    hdlr = _box(b"hdlr", struct.pack(">B3x4x", 0) + b"vide" + b"\x00" * 12 + b"\x00")
    entry = _box(
        b"mp4v",
        b"\x00" * 6  # SampleEntry reserved
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # VisualSampleEntry pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4  # reserved
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + entry)
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    mdat = _box(b"mdat", mdat_payload)
    return ftyp + moov + mdat


def encode_mp4(media_id: int, duration_ms: int, width: int, height: int, payload_bytes: int) -> bytes:
    """Structurally valid ISO BMFF file: ftyp + full moov hierarchy
    (movie duration, one video track with real dims in tkhd AND the
    mp4v VisualSampleEntry) + an mdat of md5-chain bytes standing in
    for the entropy-coded samples this environment cannot produce."""
    return _mp4_boxes(duration_ms, width, height, _chain(f"mp4:{media_id}", payload_bytes))


def mp4_overhead() -> int:
    """Container bytes around the mdat payload — constant by
    construction (all box fields fixed-width); derived from the
    encoder so the oracle formula can never drift from the code."""
    return len(_mp4_boxes(500, 320, 240, b""))


def _walk_boxes(raw: bytes, start: int, end: int):
    pos = start
    while pos < end:
        if end - pos < 8:
            raise ValueError("truncated box header")
        size = struct.unpack(">I", raw[pos : pos + 4])[0]
        typ = raw[pos + 4 : pos + 8]
        if size < 8 or pos + size > end:
            raise ValueError(f"corrupt box size {size} for {typ!r} at {pos}")
        yield typ, pos + 8, pos + size
        pos += size
    if pos != end:
        raise ValueError("box sizes do not tile the file")


def mp4_info(raw: bytes) -> dict:
    """Box-walk the file: duration from mvhd (version 0/1), dims from
    the first VisualSampleEntry, codec from the stsd entry fourcc.
    Box-size arithmetic is verified at every level."""
    top = {typ: (a, b) for typ, a, b in _walk_boxes(raw, 0, len(raw))}
    if b"ftyp" not in top or b"moov" not in top:
        raise ValueError("not an ISO BMFF file (missing ftyp/moov)")
    out: dict = {"codec": None, "duration_ms": None, "width": None, "height": None}
    moov_a, moov_b = top[b"moov"]
    for typ, a, b in _walk_boxes(raw, moov_a, moov_b):
        if typ == b"mvhd":
            version = raw[a]
            if version == 0:
                timescale, duration = struct.unpack(">II", raw[a + 12 : a + 20])
            else:
                timescale = struct.unpack(">I", raw[a + 20 : a + 24])[0]
                duration = struct.unpack(">Q", raw[a + 24 : a + 32])[0]
            out["duration_ms"] = duration * 1000 // timescale
        elif typ == b"trak":
            for t2, a2, b2 in _walk_boxes(raw, a, b):
                if t2 != b"mdia":
                    continue
                for t3, a3, b3 in _walk_boxes(raw, a2, b2):
                    if t3 != b"minf":
                        continue
                    for t4, a4, b4 in _walk_boxes(raw, a3, b3):
                        if t4 != b"stbl":
                            continue
                        for t5, a5, b5 in _walk_boxes(raw, a4, b4):
                            if t5 != b"stsd":
                                continue
                            entry_a = a5 + 8  # ver/flags + entry_count
                            fourcc = raw[entry_a + 4 : entry_a + 8]
                            out["codec"] = fourcc.decode("ascii")
                            # VisualSampleEntry dims (after the 8-byte
                            # entry header: 6 reserved + 2 dri + 16
                            # pre_defined/reserved)
                            w, h = struct.unpack(
                                ">HH", raw[entry_a + 32 : entry_a + 36]
                            )
                            if w and h:
                                out["width"], out["height"] = w, h
    if out["duration_ms"] is None or out["codec"] is None:
        raise ValueError("moov missing mvhd/stsd")
    return out


# ---------------------------------------------------------------------------
# Ogg — RFC 3533 pages + Vorbis I identification header
# ---------------------------------------------------------------------------

OGG_SAMPLE_RATE = 8000

_OGG_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if _r & 0x80000000 else (_r << 1) & 0xFFFFFFFF
    _OGG_CRC_TABLE.append(_r)


def _ogg_crc(data: bytes) -> int:
    """RFC 3533 CRC-32: poly 0x04C11DB7, init 0, NOT reflected, no
    final xor (deliberately different from zlib.crc32)."""
    crc = 0
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[((crc >> 24) & 0xFF) ^ byte]
    return crc


def _ogg_page(header_type: int, granule: int, serial: int, seq: int, packet: bytes) -> bytes:
    laces = [255] * (len(packet) // 255) + [len(packet) % 255]
    head = (
        b"OggS"
        + struct.pack("<BBq", 0, header_type, granule)
        + struct.pack("<III", serial, seq, 0)  # crc patched below
        + struct.pack("<B", len(laces))
        + bytes(laces)
    )
    page = bytearray(head + packet)
    struct.pack_into("<I", page, 22, _ogg_crc(bytes(page)))
    return bytes(page)


def _vorbis_id_packet(channels: int, rate: int) -> bytes:
    return (
        b"\x01vorbis"
        + struct.pack("<I", 0)  # vorbis_version
        + struct.pack("<B", channels)
        + struct.pack("<I", rate)
        + struct.pack("<iii", 0, 0, 0)  # bitrate max/nominal/min
        + struct.pack("<B", (11 << 4) | 8)  # blocksizes 2^8, 2^11
        + b"\x01"  # framing bit
    )


def encode_ogg(media_id: int, duration_ms: int, payload_bytes: int) -> bytes:
    """Two-page Ogg/Vorbis stream: a BOS page carrying the real
    Vorbis I identification header, then an EOS page whose granule
    position encodes the clip length in samples and whose body is
    md5-chain bytes standing in for the entropy-coded audio packets.
    Page CRCs are genuine RFC 3533 checksums — the parser verifies
    them."""
    granule = duration_ms * OGG_SAMPLE_RATE // 1000
    serial = media_id & 0xFFFFFFFF
    bos = _ogg_page(0x02, 0, serial, 0, _vorbis_id_packet(1, OGG_SAMPLE_RATE))
    eos = _ogg_page(0x04, granule, serial, 1, _chain(f"ogg:{media_id}", payload_bytes))
    return bos + eos


def ogg_info(raw: bytes) -> dict:
    """Page-walk with CRC verification; channels + sample rate from
    the Vorbis identification header; duration from the final page's
    granule position."""
    pos, n_pages, last_granule = 0, 0, 0
    rate = channels = None
    saw_eos = False
    while pos < len(raw):
        if raw[pos : pos + 4] != b"OggS":
            raise ValueError(f"Ogg capture pattern lost at byte {pos}")
        if len(raw) < pos + 27:
            raise ValueError("truncated Ogg page header")
        _ver, htype, granule = struct.unpack("<BBq", raw[pos + 4 : pos + 14])
        crc_stored = struct.unpack("<I", raw[pos + 22 : pos + 26])[0]
        nsegs = raw[pos + 26]
        body_len = sum(raw[pos + 27 : pos + 27 + nsegs])
        page_end = pos + 27 + nsegs + body_len
        if page_end > len(raw):
            raise ValueError("truncated Ogg page body")
        page = bytearray(raw[pos:page_end])
        struct.pack_into("<I", page, 22, 0)
        if _ogg_crc(bytes(page)) != crc_stored:
            raise ValueError(f"Ogg page CRC mismatch at byte {pos}")
        body = raw[pos + 27 + nsegs : page_end]
        if n_pages == 0:
            if body[:7] != b"\x01vorbis":
                raise NotImplementedError("only Vorbis-in-Ogg parsed")
            channels = body[11]
            rate = struct.unpack("<I", body[12:16])[0]
        if granule >= 0:
            last_granule = granule
        saw_eos = saw_eos or bool(htype & 0x04)
        n_pages += 1
        pos = page_end
    if rate is None or not saw_eos:
        raise ValueError("missing Vorbis ID header or EOS page")
    return {
        "codec": "vorbis",
        "sample_rate": rate,
        "channels": channels,
        "n_pages": n_pages,
        "duration_ms": last_granule * 1000 // rate,
    }


# ---------------------------------------------------------------------------
# Matroska/WebM — RFC 8794 EBML + the Matroska element vocabulary
# ---------------------------------------------------------------------------
# Metadata-first, same contract as MP3/MP4/Ogg (r6 verdict #3 extended
# r8): duration / dims / codec-id come from a strict EBML element walk
# (VINT-coded sizes verified to tile every master element exactly);
# SAMPLE decode stays gated — the payload codec (VP9 etc.) is entropy
# code this environment cannot decode.

MKV_TIMESTAMP_SCALE = 1_000_000  # ns per tick -> Duration is in ms


def _vint(n: int) -> bytes:
    """EBML VINT encoding of a size (RFC 8794 §4): the marker bit in
    the first byte says how many bytes follow."""
    for nbytes in range(1, 9):
        if n < (1 << (7 * nbytes)) - 1:  # all-ones is reserved ("unknown")
            marker = 1 << (8 - nbytes)
            body = n | (marker << (8 * (nbytes - 1)))
            return body.to_bytes(nbytes, "big")
    raise ValueError("EBML size too large")


def _read_vint(raw: bytes, pos: int) -> tuple[int, int]:
    first = raw[pos]
    if first == 0:
        raise ValueError(f"invalid EBML VINT at byte {pos}")
    nbytes = 9 - first.bit_length()
    val = int.from_bytes(raw[pos : pos + nbytes], "big")
    val &= (1 << (7 * nbytes)) - 1  # strip the marker bit
    if val == (1 << (7 * nbytes)) - 1:
        # RFC 8794 §4.1: all-ones is the reserved "unknown size" VINT
        # (streamed Matroska's unknown-size Segment/Cluster). Treating
        # it as a concrete huge size would fail later with a misleading
        # overruns-its-parent error; gate it loudly instead.
        raise NotImplementedError(
            f"EBML unknown-size (all-ones VINT) master element at byte {pos}"
            " — streamed Matroska/WebM with unsized Segment/Cluster is not"
            " supported by the strict size-tiling walk"
        )
    return val, pos + nbytes


def _el(eid: bytes, payload: bytes) -> bytes:
    return eid + _vint(len(payload)) + payload


def _uint_el(eid: bytes, n: int) -> bytes:
    nbytes = max(1, (n.bit_length() + 7) // 8)
    return _el(eid, n.to_bytes(nbytes, "big"))


def encode_mkv(
    media_id: int, duration_ms: int, width: int, height: int, payload_bytes: int
) -> bytes:
    """Structurally valid Matroska file: EBML header (DocType
    matroska), Segment with Info (TimestampScale + float Duration),
    one VP9 video TrackEntry with real pixel dims, and a Cluster
    carrying one SimpleBlock of md5-chain bytes standing in for the
    entropy-coded samples."""
    ebml = _el(
        b"\x1a\x45\xdf\xa3",
        _uint_el(b"\x42\x86", 1)  # EBMLVersion
        + _uint_el(b"\x42\xf7", 1)  # EBMLReadVersion
        + _uint_el(b"\x42\xf2", 4)  # EBMLMaxIDLength
        + _uint_el(b"\x42\xf3", 8)  # EBMLMaxSizeLength
        + _el(b"\x42\x82", b"matroska")  # DocType
        + _uint_el(b"\x42\x87", 4)  # DocTypeVersion
        + _uint_el(b"\x42\x85", 2),  # DocTypeReadVersion
    )
    info = _el(
        b"\x15\x49\xa9\x66",
        _uint_el(b"\x2a\xd7\xb1", MKV_TIMESTAMP_SCALE)
        + _el(b"\x44\x89", struct.pack(">d", float(duration_ms))),
    )
    video = _el(
        b"\xe0", _uint_el(b"\xb0", width) + _uint_el(b"\xba", height)
    )
    track = _el(
        b"\xae",
        _uint_el(b"\xd7", 1)  # TrackNumber
        + _uint_el(b"\x73\xc5", media_id & 0xFFFFFFFF)  # TrackUID
        + _uint_el(b"\x83", 1)  # TrackType video
        + _el(b"\x86", b"V_VP9")  # CodecID
        + video,
    )
    tracks = _el(b"\x16\x54\xae\x6b", track)
    block = b"\x81" + struct.pack(">h", 0) + b"\x80" + _chain(
        f"mkv:{media_id}", payload_bytes
    )
    cluster = _el(
        b"\x1f\x43\xb6\x75", _uint_el(b"\xe7", 0) + _el(b"\xa3", block)
    )
    segment = _el(b"\x18\x53\x80\x67", info + tracks + cluster)
    return ebml + segment


_MKV_IDS = {
    "ebml": b"\x1a\x45\xdf\xa3",
    "doctype": b"\x42\x82",
    "segment": b"\x18\x53\x80\x67",
    "info": b"\x15\x49\xa9\x66",
    "tscale": b"\x2a\xd7\xb1",
    "duration": b"\x44\x89",
    "tracks": b"\x16\x54\xae\x6b",
    "track": b"\xae",
    "tracktype": b"\x83",
    "codec": b"\x86",
    "video": b"\xe0",
    "pixw": b"\xb0",
    "pixh": b"\xba",
}


def _read_element(raw: bytes, pos: int, end: int) -> tuple[bytes, int, int]:
    """(element id bytes, payload start, payload end) — size arithmetic
    verified against the enclosing element."""
    first = raw[pos]
    id_len = 9 - (first.bit_length() if first else 0)
    if not first or id_len > 4:
        raise ValueError(f"invalid EBML element id at byte {pos}")
    eid = raw[pos : pos + id_len]
    size, body = _read_vint(raw, pos + id_len)
    if body + size > end:
        raise ValueError(f"EBML element at byte {pos} overruns its parent")
    return eid, body, body + size


def _walk_ebml(raw: bytes, start: int, end: int):
    pos = start
    while pos < end:
        eid, a, b = _read_element(raw, pos, end)
        yield eid, a, b
        pos = b
    if pos != end:
        raise ValueError("EBML elements do not tile the parent")


def mkv_info(raw: bytes) -> dict:
    """Strict EBML walk: DocType validated, duration from
    Info(TimestampScale × float Duration), dims from the first video
    TrackEntry, codec from its CodecID."""
    top = list(_walk_ebml(raw, 0, len(raw)))
    if not top or top[0][0] != _MKV_IDS["ebml"]:
        raise ValueError("not an EBML stream (missing header)")
    ha, hb = top[0][1], top[0][2]
    doctype = None
    for eid, a, b in _walk_ebml(raw, ha, hb):
        if eid == _MKV_IDS["doctype"]:
            doctype = raw[a:b].rstrip(b"\x00").decode("ascii")
    if doctype not in ("matroska", "webm"):
        raise NotImplementedError(f"EBML DocType {doctype!r} is not Matroska/WebM")
    out: dict = {
        "codec": None, "duration_ms": None, "width": None, "height": None,
        "doctype": doctype,
    }
    tscale, duration_ticks = MKV_TIMESTAMP_SCALE, None
    for eid, a, b in top[1:]:
        if eid != _MKV_IDS["segment"]:
            continue
        for e2, a2, b2 in _walk_ebml(raw, a, b):
            if e2 == _MKV_IDS["info"]:
                for e3, a3, b3 in _walk_ebml(raw, a2, b2):
                    if e3 == _MKV_IDS["tscale"]:
                        tscale = int.from_bytes(raw[a3:b3], "big")
                    elif e3 == _MKV_IDS["duration"]:
                        n = b3 - a3
                        duration_ticks = struct.unpack(
                            ">d" if n == 8 else ">f", raw[a3:b3]
                        )[0]
            elif e2 == _MKV_IDS["tracks"]:
                for e3, a3, b3 in _walk_ebml(raw, a2, b2):
                    if e3 != _MKV_IDS["track"]:
                        continue
                    for e4, a4, b4 in _walk_ebml(raw, a3, b3):
                        if e4 == _MKV_IDS["codec"] and out["codec"] is None:
                            out["codec"] = raw[a4:b4].decode("ascii").lower()
                        elif e4 == _MKV_IDS["video"]:
                            for e5, a5, b5 in _walk_ebml(raw, a4, b4):
                                if e5 == _MKV_IDS["pixw"]:
                                    out["width"] = int.from_bytes(raw[a5:b5], "big")
                                elif e5 == _MKV_IDS["pixh"]:
                                    out["height"] = int.from_bytes(raw[a5:b5], "big")
    if duration_ticks is None or out["codec"] is None:
        raise ValueError("Matroska segment missing Info duration / track codec")
    out["duration_ms"] = int(duration_ticks * tscale / 1_000_000)
    return out
