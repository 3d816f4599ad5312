"""From-spec FLAC codec (RFC 9639) — the integer-exact compressed-audio
leg of the multimodal family (r7 verdict #1).

FLAC is the right "first entropy-coded SAMPLE decode" for this
environment because it is lossless and integer-exact: fixed linear
predictors + Rice-coded residuals reconstruct PCM bit-for-bit, so the
PCM-reconstruction oracle pattern that hash-matches mm_audio_energy
extends directly — DuckDB recomputes every decoded sample from the
fixture's md5-chain formula while Spark recovers it from REAL FLAC
bytes, and a single bit of codec drift breaks the int64 energy sums.

Implemented surface (the slice the encoder emits, decoded strictly):

- stream:     "fLaC" magic + STREAMINFO metadata block (RFC 9639 §8.2):
              block sizes, frame-size bounds, 20-bit sample rate,
              channels, bits-per-sample, 36-bit total samples, and the
              MD5 of the unencoded PCM (verified after decode).
- frames:     fixed-blocksize strategy (sync 0xFFF8), blocksize spelled
              as the explicit 16-bit (n-1) form, sample rate deferred
              to STREAMINFO, UTF-8-coded frame number, header CRC-8
              (poly 0x07) and whole-frame CRC-16 (poly 0x8005) — both
              generated AND verified.
- subframes:  CONSTANT, VERBATIM, and FIXED predictors of order 0-4
              (§9.2.3: the binomial-coefficient predictors), residuals
              Rice-coded (§9.2.7) with one partition per subframe and
              the 4-bit parameter chosen by EXACT coded-size
              minimization (deterministic; no escape codes needed for
              16-bit input by construction — cost selection bounds the
              parameter).
- not built:  LPC subframes, wasted bits, stereo decorrelation,
              variable blocksize — the decoder raises the documented
              loud gate on them rather than guessing (same honesty
              contract as jpeg_codec's exotic-variant gates).

Mono / 16-bit only: that is the fixture's audio shape, and every gate
is explicit. Encoder and size-predictor share ONE cost function
(_best_encoding), so the import-time oracle byte totals cannot drift
from the emitted bytes; pytest pins len(encode) == predicted size.

Reference parity note: lime-etl is orchestration-only (no media
surface); this extends SURVEY §2H beyond the reference.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"
BLOCK_SIZE = 4096  # samples per frame (last frame shorter)

# --- CRCs (RFC 9639 §9.1/§9.3: CRC-8 poly 0x07, CRC-16 poly 0x8005,
# both init 0, non-reflected) -----------------------------------------------

_CRC8_TABLE = []
for _i in range(256):
    _r = _i
    for _ in range(8):
        _r = ((_r << 1) ^ 0x07) & 0xFF if _r & 0x80 else (_r << 1) & 0xFF
    _CRC8_TABLE.append(_r)

_CRC16_TABLE = []
for _i in range(256):
    _r = _i << 8
    for _ in range(8):
        _r = ((_r << 1) ^ 0x8005) & 0xFFFF if _r & 0x8000 else (_r << 1) & 0xFFFF
    _CRC16_TABLE.append(_r)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[((crc >> 8) & 0xFF) ^ b]
    return crc


# --- coded number (RFC 9639 §9.1.5: UTF-8-style, up to 36 bits) -------------


def _coded_number(n: int) -> bytes:
    if n < 0x80:
        return bytes((n,))
    if n >= (1 << 36):
        raise ValueError(f"FLAC coded number overflows 36-bit capacity: {n}")
    out = []
    # choose byte length: 2..7 bytes cover 11..36 payload bits
    for nbytes in range(2, 8):
        capacity = (7 - nbytes) + 6 * (nbytes - 1)
        if n < (1 << capacity):
            break
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for k in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * k)) & 0x3F))
    return bytes(out)


def _read_coded_number(raw: bytes, pos: int) -> tuple[int, int]:
    b0 = raw[pos]
    if b0 < 0x80:
        return b0, pos + 1
    nbytes = 0
    while (b0 << nbytes) & 0x80:
        nbytes += 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid FLAC coded number")
    n = b0 & (0x7F >> nbytes)
    for k in range(1, nbytes):
        bk = raw[pos + k]
        if bk & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded-number continuation")
        n = (n << 6) | (bk & 0x3F)
    return n, pos + nbytes


# --- fixed predictors (§9.2.3) ----------------------------------------------


def _zigzag(r: np.ndarray) -> np.ndarray:
    r = r.astype(np.int64)
    return np.where(r >= 0, 2 * r, -2 * r - 1)


def _rice_cost(u: np.ndarray, m: int) -> int:
    return int(np.sum(u >> m)) + u.size * (m + 1)


def _best_rice_param(u: np.ndarray) -> tuple[int, int]:
    """(param, bits) minimizing exact coded size over m = 0..14."""
    best_m, best_bits = 0, _rice_cost(u, 0)
    for m in range(1, 15):
        bits = _rice_cost(u, m)
        if bits < best_bits:
            best_m, best_bits = m, bits
    return best_m, best_bits


def _best_encoding(block: np.ndarray) -> tuple[str, int, int, int]:
    """Deterministic subframe choice for one block of int16-range
    samples: (kind, order, rice_param, subframe_bits). The single
    source of truth shared by the bit emitter AND the size predictor
    (flac_stream_size), so oracle byte totals can never drift from
    the encoder."""
    n = block.size
    if n == 0:
        raise ValueError("empty FLAC block")
    if np.all(block == block[0]):
        return "constant", 0, 0, 8 + 16
    best = ("verbatim", 0, 0, 8 + 16 * n)
    d = block.astype(np.int64)
    for order in range(0, 5):
        if order:
            d = np.diff(d)
        if d.size == 0:
            break
        m, rice_bits = _best_rice_param(_zigzag(d))
        bits = 8 + 16 * order + 2 + 4 + 4 + rice_bits
        if bits < best[3]:
            best = ("fixed", order, m, bits)
    return best


# --- bit emission ------------------------------------------------------------


def _emit_subframe(block: np.ndarray) -> str:
    """Subframe bits for one block as a '0'/'1' string."""
    kind, order, m, _bits = _best_encoding(block)
    if kind == "constant":
        return "00000000" + format(int(block[0]) & 0xFFFF, "016b")
    if kind == "verbatim":
        return "00000010" + "".join(
            format(int(s) & 0xFFFF, "016b") for s in block
        )
    # fixed predictor of `order`
    head = "0" + format(0b001000 | order, "06b") + "0"
    warm = "".join(format(int(s) & 0xFFFF, "016b") for s in block[:order])
    res = block.astype(np.int64)
    for _ in range(order):
        res = np.diff(res)
    u = _zigzag(res)
    q = (u >> m).astype(np.int64)
    rem = (u & ((1 << m) - 1)).astype(np.int64)
    if m:
        codes = [
            "0" * int(qi) + "1" + format(int(ri), f"0{m}b")
            for qi, ri in zip(q, rem)
        ]
    else:
        codes = ["0" * int(qi) + "1" for qi in q]
    # residual coding method 00 (4-bit rice), partition order 0000,
    # then the single partition's 4-bit parameter + codes
    return head + warm + "00" + "0000" + format(m, "04b") + "".join(codes)


def _frame_bytes(frame_ix: int, block: np.ndarray) -> bytes:
    header = bytearray(b"\xff\xf8")
    header.append(0b0111 << 4 | 0b0000)  # 16-bit (n-1) blocksize; rate=STREAMINFO
    header.append(0b0000 << 4 | 0b100 << 1)  # mono; 16 bps; reserved 0
    header += _coded_number(frame_ix)
    header += struct.pack(">H", block.size - 1)
    header.append(_crc8(bytes(header)))
    bits = _emit_subframe(block)
    if len(bits) % 8:
        bits += "0" * (8 - len(bits) % 8)
    body = int(bits, 2).to_bytes(len(bits) // 8, "big") if bits else b""
    frame = bytes(header) + body
    return frame + struct.pack(">H", _crc16(frame))


def _streaminfo(
    n_samples: int, sample_rate: int, md5_digest: bytes, min_fs: int, max_fs: int
) -> bytes:
    body = struct.pack(">HH", BLOCK_SIZE, BLOCK_SIZE)
    body += min_fs.to_bytes(3, "big") + max_fs.to_bytes(3, "big")
    packed = (sample_rate << 44) | (0 << 41) | (15 << 36) | n_samples  # mono, 16bps
    body += packed.to_bytes(8, "big")
    body += md5_digest
    return b"\x80" + len(body).to_bytes(3, "big") + body  # last-block | type 0


def encode_flac(pcm: np.ndarray, sample_rate: int) -> bytes:
    """Real FLAC stream from int16 mono PCM: STREAMINFO (with the PCM
    MD5 the decoder must reproduce) + fixed-predictor/Rice frames."""
    pcm = np.asarray(pcm, dtype=np.int16)
    frames = [
        _frame_bytes(ix, pcm[start : start + BLOCK_SIZE].astype(np.int64))
        for ix, start in enumerate(range(0, pcm.size, BLOCK_SIZE))
    ]
    sizes = [len(f) for f in frames]
    md5_digest = hashlib.md5(pcm.astype("<i2").tobytes()).digest()
    return (
        FLAC_MAGIC
        + _streaminfo(pcm.size, sample_rate, md5_digest, min(sizes), max(sizes))
        + b"".join(frames)
    )


def predicted_frame_size(frame_ix: int, block: np.ndarray) -> int:
    """Exact byte size of _frame_bytes WITHOUT emitting bits — shares
    _best_encoding with the emitter, plus the fixed header arithmetic
    (2 sync/strategy + 2 packed + coded number + 2 blocksize + 1 CRC8
    ... + 2 CRC16)."""
    _kind, _order, _m, sub_bits = _best_encoding(block.astype(np.int64))
    header = 2 + 1 + 1 + len(_coded_number(frame_ix)) + 2 + 1
    return header + (sub_bits + 7) // 8 + 2


def flac_stream_size(pcm: np.ndarray) -> int:
    """Exact len(encode_flac(pcm, rate)) via the shared cost path —
    used to derive oracle byte totals at import time without paying
    bit emission; pytest pins it equal to the real encoder output."""
    pcm = np.asarray(pcm, dtype=np.int16)
    total = 4 + 4 + 34  # magic + metadata header + STREAMINFO body
    for ix, start in enumerate(range(0, pcm.size, BLOCK_SIZE)):
        total += predicted_frame_size(ix, pcm[start : start + BLOCK_SIZE].astype(np.int64))
    return total


# --- decoder ------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over bytes, backed by a '0'/'1' string so
    the Rice unary scan is a C-speed str.index."""

    def __init__(self, raw: bytes, start_byte: int):
        self.bits = format(int.from_bytes(raw[start_byte:], "big"), f"0{(len(raw) - start_byte) * 8}b") if len(raw) > start_byte else ""
        self.pos = 0
        self.base = start_byte

    def take(self, n: int) -> int:
        v = int(self.bits[self.pos : self.pos + n], 2)
        self.pos += n
        return v

    def unary(self) -> int:
        one = self.bits.index("1", self.pos)
        q = one - self.pos
        self.pos = one + 1
        return q

    def align(self) -> None:
        if self.pos % 8:
            pad = self.bits[self.pos : self.pos + (8 - self.pos % 8)]
            if pad.strip("0"):
                raise ValueError("nonzero FLAC frame padding")
            self.pos += 8 - self.pos % 8

    def byte_pos(self) -> int:
        return self.base + self.pos // 8


_FIXED_WARMUP_UNSUPPORTED = "FLAC feature outside the encoder's slice"


def parse_streaminfo(raw: bytes) -> dict:
    """STREAMINFO metadata (no sample decode): rate, channels, bps,
    total samples, duration, PCM md5."""
    if raw[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC stream (missing fLaC magic)")
    pos, saw_streaminfo, out = 4, False, {}
    while True:
        hdr = raw[pos]
        btype, last = hdr & 0x7F, bool(hdr & 0x80)
        blen = int.from_bytes(raw[pos + 1 : pos + 4], "big")
        body = raw[pos + 4 : pos + 4 + blen]
        if btype == 0:
            if blen != 34:
                raise ValueError("corrupt STREAMINFO length")
            packed = int.from_bytes(body[10:18], "big")
            out = {
                "codec": "flac",
                "min_blocksize": struct.unpack(">H", body[0:2])[0],
                "max_blocksize": struct.unpack(">H", body[2:4])[0],
                "sample_rate": packed >> 44,
                "channels": ((packed >> 41) & 0x7) + 1,
                "bits_per_sample": ((packed >> 36) & 0x1F) + 1,
                "n_samples": packed & ((1 << 36) - 1),
                "pcm_md5": body[18:34],
                "frames_offset": pos + 4 + blen,
            }
            out["duration_ms"] = out["n_samples"] * 1000 // out["sample_rate"]
            saw_streaminfo = True
        pos += 4 + blen
        if last:
            break
    if not saw_streaminfo:
        raise ValueError("FLAC stream missing STREAMINFO")
    out["frames_offset"] = pos
    return out


_BLOCKSIZE_FIXED = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_FIXED = {4: 8000, 5: 16000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}


def _decode_frame(raw: bytes, pos: int, info: dict) -> tuple[np.ndarray, int]:
    start = pos
    if raw[pos] != 0xFF or (raw[pos + 1] & 0xFE) != 0xF8:
        raise ValueError(f"FLAC frame sync lost at byte {pos}")
    if raw[pos + 1] & 0x01:
        raise NotImplementedError(f"{_FIXED_WARMUP_UNSUPPORTED}: variable blocksize")
    bs_bits, rate_bits = raw[pos + 2] >> 4, raw[pos + 2] & 0xF
    ch_bits, sz_bits = raw[pos + 3] >> 4, (raw[pos + 3] >> 1) & 0x7
    if ch_bits != 0:
        raise NotImplementedError(f"{_FIXED_WARMUP_UNSUPPORTED}: non-mono channels")
    if sz_bits not in (0b100, 0b000):
        raise NotImplementedError(f"{_FIXED_WARMUP_UNSUPPORTED}: bps code {sz_bits}")
    _frame_ix, pos = _read_coded_number(raw, pos + 4)
    if bs_bits == 0b0110:
        blocksize = raw[pos] + 1
        pos += 1
    elif bs_bits == 0b0111:
        blocksize = struct.unpack(">H", raw[pos : pos + 2])[0] + 1
        pos += 2
    elif bs_bits in _BLOCKSIZE_FIXED:
        blocksize = _BLOCKSIZE_FIXED[bs_bits]
    else:
        raise ValueError("reserved FLAC blocksize code")
    if rate_bits == 0b1100:
        pos += 1
    elif rate_bits in (0b1101, 0b1110):
        pos += 2
    elif rate_bits and rate_bits not in _RATE_FIXED:
        raise ValueError("reserved FLAC sample-rate code")
    crc8_stored = raw[pos]
    if _crc8(raw[start:pos]) != crc8_stored:
        raise ValueError(f"FLAC frame-header CRC-8 mismatch at byte {start}")
    pos += 1

    br = _BitReader(raw, pos)
    if br.take(1):
        raise ValueError("nonzero subframe-header pad bit")
    sub_type = br.take(6)
    if br.take(1):
        raise NotImplementedError(f"{_FIXED_WARMUP_UNSUPPORTED}: wasted bits")
    if sub_type == 0b000000:  # constant
        v = br.take(16)
        samples = np.full(blocksize, v - 65536 if v >= 32768 else v, dtype=np.int64)
    elif sub_type == 0b000001:  # verbatim
        vals = np.array([br.take(16) for _ in range(blocksize)], dtype=np.int64)
        samples = np.where(vals >= 32768, vals - 65536, vals)
    elif 0b001000 <= sub_type <= 0b001100:  # fixed order 0-4
        order = sub_type & 0x7
        warm = np.array([br.take(16) for _ in range(order)], dtype=np.int64)
        warm = np.where(warm >= 32768, warm - 65536, warm)
        if br.take(2) != 0:
            raise NotImplementedError(f"{_FIXED_WARMUP_UNSUPPORTED}: rice2 residuals")
        part_order = br.take(4)
        if part_order != 0:
            raise NotImplementedError(f"{_FIXED_WARMUP_UNSUPPORTED}: partitioned residuals")
        m = br.take(4)
        if m == 15:
            raise NotImplementedError(f"{_FIXED_WARMUP_UNSUPPORTED}: escaped partition")
        n_res = blocksize - order
        u = np.empty(n_res, dtype=np.int64)
        take, unary = br.take, br.unary
        if m:
            for i in range(n_res):
                q = unary()
                u[i] = (q << m) | take(m)
        else:
            for i in range(n_res):
                u[i] = unary()
        res = np.where(u & 1, -(u >> 1) - 1, u >> 1)
        # undo diff^order: successive cumsums seeded by the warmup's
        # own difference pyramid
        seeds = [warm.copy()]
        for _ in range(order):
            seeds.append(np.diff(seeds[-1]))
        samples = res
        for lvl in range(order, 0, -1):
            lead = seeds[lvl - 1][-1:] if seeds[lvl - 1].size else np.array([], dtype=np.int64)
            samples = np.concatenate([lead, samples]).cumsum()[1:] if lead.size else samples.cumsum()
        samples = np.concatenate([warm, samples])
    elif sub_type >= 0b100000:
        raise NotImplementedError(f"{_FIXED_WARMUP_UNSUPPORTED}: LPC subframe")
    else:
        raise ValueError(f"reserved FLAC subframe type {sub_type:06b}")
    br.align()
    end = br.byte_pos()
    crc16_stored = struct.unpack(">H", raw[end : end + 2])[0]
    if _crc16(raw[start:end]) != crc16_stored:
        raise ValueError(f"FLAC frame CRC-16 mismatch at byte {start}")
    if samples.size != blocksize:
        raise ValueError("FLAC subframe sample-count drift")
    return samples, end + 2


def decode_flac(raw: bytes) -> tuple[int, np.ndarray]:
    """Full sample decode: (sample_rate, int16 PCM), with every frame
    CRC verified and the STREAMINFO PCM MD5 recomputed — bit-exactness
    is checked, not assumed."""
    info = parse_streaminfo(raw)
    pos, chunks, got = info["frames_offset"], [], 0
    while got < info["n_samples"]:
        samples, pos = _decode_frame(raw, pos, info)
        chunks.append(samples)
        got += samples.size
    if pos != len(raw):
        raise ValueError("trailing bytes after final FLAC frame")
    pcm64 = np.concatenate(chunks)[: info["n_samples"]]
    if np.any(pcm64 > 32767) or np.any(pcm64 < -32768):
        raise ValueError("decoded FLAC sample outside int16 range")
    pcm = pcm64.astype(np.int16)
    if hashlib.md5(pcm.astype("<i2").tobytes()).digest() != info["pcm_md5"]:
        raise ValueError("decoded PCM fails the STREAMINFO MD5 — codec bug")
    return int(info["sample_rate"]), pcm
