"""From-spec FLAC codec (RFC 9639) — the integer-exact compressed-audio
leg of the multimodal family (r7 verdict #1, extended to the full
fixed-blocksize surface in r9 per the r8 verdict #2).

FLAC is the right "first entropy-coded SAMPLE decode" for this
environment because it is lossless and integer-exact: linear
predictors + Rice-coded residuals reconstruct PCM bit-for-bit, so the
PCM-reconstruction oracle pattern that hash-matches mm_audio_energy
extends directly — DuckDB recomputes every decoded sample from the
fixture's md5-chain formula while Spark recovers it from REAL FLAC
bytes, and a single bit of codec drift breaks the int64 energy sums.

Implemented surface (encode AND strict decode):

- stream:     "fLaC" magic + STREAMINFO metadata block (RFC 9639 §8.2):
              block sizes, frame-size bounds, 20-bit sample rate,
              channels (1–8), bits-per-sample, 36-bit total samples,
              and the MD5 of the unencoded interleaved PCM (verified
              after decode).
- frames:     fixed-blocksize strategy (sync 0xFFF8), blocksize spelled
              as the explicit 16-bit (n-1) form, sample rate deferred
              to STREAMINFO, UTF-8-coded frame number, header CRC-8
              (poly 0x07) and whole-frame CRC-16 (poly 0x8005) — both
              generated AND verified. Channel assignments: independent
              (1–8 channels) and the three stereo decorrelations
              left/side, right/side, mid/side (§9.2.2 — the side
              channel carries bps+1 bits), chosen per frame by exact
              coded-size minimization.
- subframes:  CONSTANT, VERBATIM, FIXED predictors of order 0-4
              (§9.2.3: the binomial-coefficient predictors), and LPC
              subframes of configurable order (§9.2.4: quantized
              integer predictor — autocorrelation + Levinson-Durbin
              picks the coefficients, but decode is exact for ANY
              coefficients since the residual carries the error).
              Wasted-bits detection/encoding (§9.2.1: k low zero bits
              stripped, unary-coded k-1).
- residuals:  partitioned Rice (§9.2.7): partition orders 0..6 with
              per-partition parameters, BOTH coding methods (00 =
              4-bit params, 01 = "Rice2" 5-bit params) and the escape
              code (param 15/31 → 5-bit raw width, verbatim signed
              residuals), all chosen by EXACT coded-size minimization
              (deterministic; the per-partition sums build bottom-up
              from the deepest partition level, the libFLAC trick).

Encoder and size-predictor share ONE cost path (_best_subframe /
_frame_plan), so the import-time oracle byte totals cannot drift from
the emitted bytes; pytest pins len(encode) == predicted size for every
fixture clip, mono and stereo.

Still gated (documented loud NotImplementedError, same honesty
contract as jpeg_codec's exotic-variant gates): variable-blocksize
strategy, bits-per-sample other than 16 (frame-header codes other
than 16-bit/STREAMINFO).

Reference parity note: lime-etl is orchestration-only (no media
surface); this extends SURVEY §2H beyond the reference.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"
BLOCK_SIZE = 4096  # samples per frame (last frame shorter)
LPC_ORDERS = (2, 4, 8)  # candidate LPC orders the encoder prices
LPC_PRECISION = 12  # quantized coefficient precision (bits)
MAX_PARTITION_ORDER = 6  # deepest Rice partition level priced

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


# --- residual cost model (§9.2.7) -------------------------------------------


def _zigzag(r: np.ndarray) -> np.ndarray:
    r = r.astype(np.int64)
    return np.where(r >= 0, 2 * r, -2 * r - 1)


def _signed_width(res: np.ndarray) -> int:
    """Minimal two's-complement width holding every residual (0 for an
    all-zero partition — the escape code allows width 0)."""
    if res.size == 0 or (res.min() == 0 and res.max() == 0):
        return 0
    lo, hi = int(res.min()), int(res.max())
    w = 1
    while not (-(1 << (w - 1)) <= lo and hi < (1 << (w - 1))):
        w += 1
    return w


def _best_partitioned_rice(res: np.ndarray, blocksize: int, order: int) -> dict:
    """Exact-minimum residual coding plan over partition orders
    0..MAX_PARTITION_ORDER and both coding methods: per partition the
    best Rice parameter (m maximizing nothing — minimizing exact bits
    Σ(u>>m) + n(m+1)) or the 5-bit-width escape, whichever is smaller.
    Per-partition Σ(u>>m) builds once at the DEEPEST level via
    np.add.reduceat and aggregates bottom-up (parent = child+child),
    so the search is one pass per m, not one per (po, m).

    Returns {"method", "po", "params" (None = escape), "raws",
    "bits"} where bits = 2 + 4 + per-partition params/escapes +
    payload — the exact emitted size."""
    u = _zigzag(res)
    n = res.size
    # deepest partition order: blocksize divisible, first partition
    # (blocksize/2^po - order samples) non-empty
    max_po = 0
    for po in range(MAX_PARTITION_ORDER, -1, -1):
        nparts = 1 << po
        if blocksize % nparts == 0 and blocksize // nparts > order:
            max_po = po
            break
    m_cap = max(1, int(u.max()).bit_length() + 1) if n else 1
    m_cap = min(m_cap, 31)
    nparts = 1 << max_po
    psize = blocksize // nparts
    # partition start offsets within res (res is blocksize-order long;
    # partition 0 is short by `order`)
    starts = [0] + [k * psize - order for k in range(1, nparts)]
    # rice_sums[m][p] = Σ_{i in partition p} (u_i >> m)
    shifted = u.copy()
    rice_sums = []
    for _m in range(m_cap):
        rice_sums.append(
            np.add.reduceat(shifted, starts).astype(np.int64)
            if n
            else np.zeros(nparts, dtype=np.int64)
        )
        shifted = shifted >> 1
    rice_sums = np.stack(rice_sums)  # (m_cap, nparts)
    counts = np.diff(starts + [n]).astype(np.int64)
    # raw escape widths per deepest partition
    widths = np.array(
        [_signed_width(res[starts[p] : starts[p] + counts[p]]) for p in range(nparts)],
        dtype=np.int64,
    )

    best = None
    sums, cnts = rice_sums, counts
    wids = widths
    for po in range(max_po, -1, -1):
        k = 1 << po
        # per-partition best rice bits for each method's param range
        # cost(m) = sums[m] + cnts*(m+1)
        m_range = np.arange(sums.shape[0], dtype=np.int64)
        costs = sums + cnts[None, :] * (m_range[:, None] + 1)  # (m_cap, k)
        esc_payload = wids * cnts  # + 5-bit width field, added per method below
        for method, pbits, m_max in ((0, 4, 15), (1, 5, 31)):
            sub = costs[: min(m_max, sums.shape[0]), :]
            best_m = np.argmin(sub, axis=0)
            best_rice = sub[best_m, np.arange(k)]
            esc = esc_payload + 5
            use_esc = esc < best_rice
            total = (
                2
                + 4
                + k * pbits
                + int(np.where(use_esc, esc, best_rice).sum())
            )
            if best is None or total < best["bits"]:
                best = {
                    "method": method,
                    "po": po,
                    "params": [
                        None if use_esc[p] else int(best_m[p]) for p in range(k)
                    ],
                    "raws": [int(wids[p]) for p in range(k)],
                    "bits": total,
                }
        if po == 0:
            break
        # aggregate to the parent level: pairwise sums / max widths
        sums = sums[:, 0::2] + sums[:, 1::2]
        cnts = cnts[0::2] + cnts[1::2]
        wids = np.maximum(wids[0::2], wids[1::2])
    return best


# --- predictors -------------------------------------------------------------


def _fixed_residual(block: np.ndarray, order: int) -> np.ndarray:
    d = block.astype(np.int64)
    for _ in range(order):
        d = np.diff(d)
    return d


def _lpc_coefficients(block: np.ndarray, order: int) -> tuple[list[int], int] | None:
    """Quantized LPC predictor for one block: autocorrelation +
    Levinson-Durbin, coefficients rounded to LPC_PRECISION bits with
    error feedback. Returns (coeffs, shift) or None when the block is
    too short / degenerate. Estimation is float64 (deterministic IEEE
    on every platform); EXACTNESS never depends on it — the residual
    carries the difference, whatever the coefficients."""
    n = block.size
    if n <= order:
        return None
    x = block.astype(np.float64)
    autoc = np.array([float(np.dot(x[: n - k], x[k:])) for k in range(order + 1)])
    if autoc[0] == 0.0:
        return None
    err = autoc[0]
    lpc = np.zeros(order)
    for i in range(order):
        r = -autoc[i + 1]
        for j in range(i):
            r -= lpc[j] * autoc[i - j]
        r /= err
        lpc[i] = r
        for j in range(i >> 1):
            t = lpc[j]
            lpc[j] += r * lpc[i - 1 - j]
            lpc[i - 1 - j] += r * t
        if i & 1:
            lpc[i >> 1] += lpc[i >> 1] * r
        err *= 1.0 - r * r
        if err <= 0.0:
            return None
    coeffs = -lpc  # predictor convention: s[i] ≈ Σ c[j]·s[i-1-j]
    cmax = float(np.max(np.abs(coeffs)))
    if cmax == 0.0:
        return None
    shift = LPC_PRECISION - 1 - (int(np.floor(np.log2(cmax))) + 1)
    shift = max(0, min(15, shift))
    qmax = 1 << (LPC_PRECISION - 1)
    q, e = [], 0.0
    for c in coeffs:
        v = c * (1 << shift) + e
        qi = int(np.floor(v + 0.5))
        qi = max(-qmax, min(qmax - 1, qi))
        e = v - qi
        q.append(qi)
    return q, shift


def _lpc_residual(block: np.ndarray, coeffs: list[int], shift: int) -> np.ndarray:
    s = block.astype(np.int64)
    order = len(coeffs)
    pred = np.zeros(s.size - order, dtype=np.int64)
    for j, c in enumerate(coeffs):
        pred += c * s[order - 1 - j : s.size - 1 - j]
    return s[order:] - (pred >> shift)


# --- subframe planning (the single cost source) ------------------------------


def _wasted_bits(block: np.ndarray, sbps: int) -> int:
    """Shared low zero bits across the block (0 if any sample is odd
    or the block is all-zero — all-zero goes CONSTANT)."""
    nz = block[block != 0]
    if nz.size == 0:
        return 0
    k = 0
    v = np.bitwise_or.reduce(nz.astype(np.int64))
    while k < sbps - 1 and (v >> k) & 1 == 0:
        k += 1
    return k


def _best_subframe(block: np.ndarray, sbps: int) -> dict:
    """Deterministic minimum-exact-size subframe plan for one channel
    of one frame: CONSTANT / VERBATIM / FIXED 0-4 / LPC candidates,
    wasted-bits stripping, partitioned-Rice residual plan. The single
    source of truth shared by the bit emitter AND the size predictor
    (flac_stream_size), so oracle byte totals can never drift from the
    encoder. `bits` includes the 8-bit subframe header and wasted-bits
    unary."""
    n = block.size
    if n == 0:
        raise ValueError("empty FLAC block")
    block = block.astype(np.int64)
    if np.all(block == block[0]):
        return {
            "kind": "constant",
            "order": 0,
            "wasted": 0,
            "sbps": sbps,
            "block": block,
            "bits": 8 + sbps,
        }
    wasted = _wasted_bits(block, sbps)
    eff = block >> wasted if wasted else block
    esbps = sbps - wasted
    # 1 pad + 6 type + wasted field ("0", or "1" + unary(k-1) = k+1 bits)
    head = 8 + wasted
    best = {
        "kind": "verbatim",
        "order": 0,
        "wasted": wasted,
        "sbps": esbps,
        "block": eff,
        "bits": head + esbps * n,
    }
    for order in range(0, 5):
        if n <= order:
            break
        res = _fixed_residual(eff, order)
        rice = _best_partitioned_rice(res, n, order)
        bits = head + esbps * order + rice["bits"]
        if bits < best["bits"]:
            best = {
                "kind": "fixed",
                "order": order,
                "wasted": wasted,
                "sbps": esbps,
                "block": eff,
                "res": res,
                "rice": rice,
                "bits": bits,
            }
    for order in LPC_ORDERS:
        got = _lpc_coefficients(eff, order)
        if got is None:
            continue
        coeffs, shift = got
        res = _lpc_residual(eff, coeffs, shift)
        rice = _best_partitioned_rice(res, n, order)
        bits = head + esbps * order + 4 + 5 + LPC_PRECISION * order + rice["bits"]
        if bits < best["bits"]:
            best = {
                "kind": "lpc",
                "order": order,
                "wasted": wasted,
                "sbps": esbps,
                "block": eff,
                "res": res,
                "rice": rice,
                "coeffs": coeffs,
                "shift": shift,
                "bits": bits,
            }
    return best


# frame channel assignments: (tag, bits-code); side channel carries +1 bit
_STEREO_MODES = ("indep", "left_side", "right_side", "mid_side")
_STEREO_CH_BITS = {"indep": 0b0001, "left_side": 0b1000, "right_side": 0b1001, "mid_side": 0b1010}


def _frame_plan(frame: np.ndarray, bps: int = 16) -> dict:
    """Subframe plans + stereo-mode choice for one frame. `frame` is
    1-D (mono) or (n, nch). For stereo the four §9.2.2 assignments are
    priced exactly and the cheapest wins (ties resolve in
    _STEREO_MODES order — deterministic)."""
    if frame.ndim == 1:
        return {
            "mode": "mono",
            "ch_bits": 0b0000,
            "subframes": [_best_subframe(frame, bps)],
            "blocksize": frame.size,
        }
    nch = frame.shape[1]
    if nch == 2:
        left = frame[:, 0].astype(np.int64)
        right = frame[:, 1].astype(np.int64)
        side = left - right
        mid = (left + right) >> 1
        cand = {
            "indep": (_best_subframe(left, bps), _best_subframe(right, bps)),
            "left_side": (_best_subframe(left, bps), _best_subframe(side, bps + 1)),
            "right_side": (_best_subframe(side, bps + 1), _best_subframe(right, bps)),
            "mid_side": (_best_subframe(mid, bps), _best_subframe(side, bps + 1)),
        }
        mode = min(
            _STEREO_MODES, key=lambda m: (cand[m][0]["bits"] + cand[m][1]["bits"], _STEREO_MODES.index(m))
        )
        return {
            "mode": mode,
            "ch_bits": _STEREO_CH_BITS[mode],
            "subframes": list(cand[mode]),
            "blocksize": frame.shape[0],
        }
    return {
        "mode": "indep",
        "ch_bits": nch - 1,
        "subframes": [_best_subframe(frame[:, c].astype(np.int64), bps) for c in range(nch)],
        "blocksize": frame.shape[0],
    }


# --- bit emission ------------------------------------------------------------


def _sbits(v: int, width: int) -> str:
    return format(int(v) & ((1 << width) - 1), f"0{width}b") if width else ""


def _emit_residual(res: np.ndarray, blocksize: int, order: int, rice: dict) -> str:
    out = [format(rice["method"], "02b"), format(rice["po"], "04b")]
    pbits = 4 if rice["method"] == 0 else 5
    escape = (1 << pbits) - 1
    nparts = 1 << rice["po"]
    psize = blocksize // nparts
    pos = 0
    u = _zigzag(res)
    for p in range(nparts):
        cnt = psize - order if p == 0 else psize
        m = rice["params"][p]
        if m is None:
            w = rice["raws"][p]
            out.append(format(escape, f"0{pbits}b") + format(w, "05b"))
            if w:
                out.append("".join(_sbits(int(r), w) for r in res[pos : pos + cnt]))
        else:
            out.append(format(m, f"0{pbits}b"))
            q = (u[pos : pos + cnt] >> m).astype(np.int64)
            rem = (u[pos : pos + cnt] & ((1 << m) - 1)).astype(np.int64)
            if m:
                out.append(
                    "".join(
                        "0" * int(qi) + "1" + format(int(ri), f"0{m}b")
                        for qi, ri in zip(q, rem)
                    )
                )
            else:
                out.append("".join("0" * int(qi) + "1" for qi in q))
        pos += cnt
    return "".join(out)


def _emit_subframe(spec: dict) -> str:
    kind, wasted = spec["kind"], spec.get("wasted", 0)
    sbps, block = spec["sbps"], spec["block"]
    n = block.size
    if kind == "constant":
        return "0" + format(0b000000, "06b") + "0" + _sbits(int(block[0]), sbps)
    head = "0"
    if kind == "verbatim":
        head += format(0b000001, "06b")
    elif kind == "fixed":
        head += format(0b001000 | spec["order"], "06b")
    else:  # lpc
        head += format(0b100000 | (spec["order"] - 1), "06b")
    head += ("1" + "0" * (wasted - 1) + "1") if wasted else "0"
    if kind == "verbatim":
        return head + "".join(_sbits(int(s), sbps) for s in block)
    warm = "".join(_sbits(int(s), sbps) for s in block[: spec["order"]])
    body = ""
    if kind == "lpc":
        body = (
            format(LPC_PRECISION - 1, "04b")
            + format(spec["shift"], "05b")
            + "".join(_sbits(c, LPC_PRECISION) for c in spec["coeffs"])
        )
    return head + warm + body + _emit_residual(spec["res"], n, spec["order"], spec["rice"])


def _frame_header(frame_ix: int, blocksize: int, ch_bits: int) -> bytes:
    header = bytearray(b"\xff\xf8")
    header.append(0b0111 << 4 | 0b0000)  # 16-bit (n-1) blocksize; rate=STREAMINFO
    header.append(ch_bits << 4 | 0b100 << 1)  # 16 bps; reserved 0
    header += _coded_number(frame_ix)
    header += struct.pack(">H", blocksize - 1)
    header.append(_crc8(bytes(header)))
    return bytes(header)


def _frame_bytes(frame_ix: int, frame: np.ndarray) -> bytes:
    plan = _frame_plan(frame)
    header = _frame_header(frame_ix, plan["blocksize"], plan["ch_bits"])
    bits = "".join(_emit_subframe(s) for s in plan["subframes"])
    if len(bits) % 8:
        bits += "0" * (8 - len(bits) % 8)
    body = int(bits, 2).to_bytes(len(bits) // 8, "big") if bits else b""
    fr = header + body
    return fr + struct.pack(">H", _crc16(fr))


def predicted_frame_size(frame_ix: int, frame: np.ndarray) -> int:
    """Exact byte size of _frame_bytes WITHOUT emitting bits — shares
    _frame_plan with the emitter, plus the fixed header arithmetic
    (2 sync/strategy + 2 packed + coded number + 2 blocksize + 1 CRC8
    ... + 2 CRC16)."""
    plan = _frame_plan(frame)
    header = 2 + 1 + 1 + len(_coded_number(frame_ix)) + 2 + 1
    sub_bits = sum(s["bits"] for s in plan["subframes"])
    return header + (sub_bits + 7) // 8 + 2


def _streaminfo(
    n_samples: int,
    sample_rate: int,
    channels: int,
    md5_digest: bytes,
    min_fs: int,
    max_fs: int,
) -> bytes:
    body = struct.pack(">HH", BLOCK_SIZE, BLOCK_SIZE)
    body += min_fs.to_bytes(3, "big") + max_fs.to_bytes(3, "big")
    packed = (sample_rate << 44) | ((channels - 1) << 41) | (15 << 36) | n_samples
    body += packed.to_bytes(8, "big")
    body += md5_digest
    return b"\x80" + len(body).to_bytes(3, "big") + body  # last-block | type 0


def _as_frames(pcm: np.ndarray):
    for start in range(0, pcm.shape[0], BLOCK_SIZE):
        yield pcm[start : start + BLOCK_SIZE]


def encode_flac(pcm: np.ndarray, sample_rate: int) -> bytes:
    """Real FLAC stream from int16 PCM — 1-D mono or (n, nch) —
    STREAMINFO (with the PCM MD5 the decoder must reproduce) + frames
    with per-frame stereo-mode and per-subframe predictor/Rice plans
    from the shared exact cost path."""
    pcm = np.asarray(pcm, dtype=np.int16)
    channels = 1 if pcm.ndim == 1 else pcm.shape[1]
    frames = [
        _frame_bytes(ix, fr.astype(np.int64)) for ix, fr in enumerate(_as_frames(pcm))
    ]
    sizes = [len(f) for f in frames]
    md5_digest = hashlib.md5(pcm.astype("<i2").tobytes()).digest()
    return (
        FLAC_MAGIC
        + _streaminfo(
            pcm.shape[0], sample_rate, channels, md5_digest, min(sizes), max(sizes)
        )
        + b"".join(frames)
    )


def flac_stream_size(pcm: np.ndarray) -> int:
    """Exact len(encode_flac(pcm, rate)) via the shared cost path —
    used to derive oracle byte totals at import time without paying
    bit emission; pytest pins it equal to the real encoder output."""
    pcm = np.asarray(pcm, dtype=np.int16)
    total = 4 + 4 + 34  # magic + metadata header + STREAMINFO body
    for ix, fr in enumerate(_as_frames(pcm)):
        total += predicted_frame_size(ix, fr.astype(np.int64))
    return total


# --- decoder ------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over bytes, backed by a '0'/'1' string so
    the Rice unary scan is a C-speed str.index. The window is bounded
    per frame (`limit`, from STREAMINFO's max_frame_size) so decode
    stays O(file size) overall instead of O(frames × file size)."""

    def __init__(self, raw: bytes, start_byte: int, limit: int | None = None):
        end = len(raw) if limit is None else min(len(raw), limit)
        self.bits = (
            format(int.from_bytes(raw[start_byte:end], "big"), f"0{(end - start_byte) * 8}b")
            if end > start_byte
            else ""
        )
        self.pos = 0
        self.base = start_byte

    def take(self, n: int) -> int:
        if self.pos + n > len(self.bits):
            raise ValueError("FLAC frame overruns its bounded window")
        v = int(self.bits[self.pos : self.pos + n], 2) if n else 0
        self.pos += n
        return v

    def take_signed(self, n: int) -> int:
        v = self.take(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

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


_UNSUPPORTED = "FLAC feature outside the encoder's slice"


def parse_streaminfo(raw: bytes) -> dict:
    """STREAMINFO metadata (no sample decode): rate, channels, bps,
    total samples, duration, frame-size bounds, PCM md5."""
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
                "min_frame_size": int.from_bytes(body[4:7], "big"),
                "max_frame_size": int.from_bytes(body[7:10], "big"),
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


def _decode_residual(br: _BitReader, blocksize: int, order: int) -> np.ndarray:
    method = br.take(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.take(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("FLAC partition order does not divide blocksize")
    psize = blocksize // nparts
    if psize <= order and nparts > 1 or (nparts == 1 and blocksize <= order):
        raise ValueError("FLAC partition smaller than predictor order")
    res = np.empty(blocksize - order, dtype=np.int64)
    pos = 0
    take, unary, take_signed = br.take, br.unary, br.take_signed
    for p in range(nparts):
        cnt = psize - order if p == 0 else psize
        m = take(pbits)
        if m == escape:
            w = take(5)
            for i in range(cnt):
                res[pos + i] = take_signed(w) if w else 0
        elif m:
            for i in range(cnt):
                q = unary()
                u = (q << m) | take(m)
                res[pos + i] = -(u >> 1) - 1 if u & 1 else u >> 1
        else:
            for i in range(cnt):
                u = unary()
                res[pos + i] = -(u >> 1) - 1 if u & 1 else u >> 1
        pos += cnt
    return res


# fixed-predictor reconstruction: undo diff^order with the warmup's
# own difference pyramid (successive cumsums)
def _undo_fixed(warm: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    seeds = [warm.copy()]
    for _ in range(order):
        seeds.append(np.diff(seeds[-1]))
    samples = res
    for lvl in range(order, 0, -1):
        lead = seeds[lvl - 1][-1:] if seeds[lvl - 1].size else np.array([], dtype=np.int64)
        samples = (
            np.concatenate([lead, samples]).cumsum()[1:] if lead.size else samples.cumsum()
        )
    return np.concatenate([warm, samples])


def _decode_subframe(br: _BitReader, blocksize: int, sbps: int) -> np.ndarray:
    if br.take(1):
        raise ValueError("nonzero subframe-header pad bit")
    sub_type = br.take(6)
    wasted = 0
    if br.take(1):  # wasted-bits flag: unary-coded k-1
        wasted = br.unary() + 1
        sbps -= wasted
        if sbps <= 0:
            raise ValueError("FLAC wasted bits exceed sample width")
    if sub_type == 0b000000:  # constant
        samples = np.full(blocksize, br.take_signed(sbps), dtype=np.int64)
    elif sub_type == 0b000001:  # verbatim
        samples = np.array([br.take_signed(sbps) for _ in range(blocksize)], dtype=np.int64)
    elif 0b001000 <= sub_type <= 0b001100:  # fixed order 0-4
        order = sub_type & 0x7
        if blocksize <= order:
            raise ValueError("FLAC block shorter than fixed order")
        warm = np.array([br.take_signed(sbps) for _ in range(order)], dtype=np.int64)
        res = _decode_residual(br, blocksize, order)
        samples = _undo_fixed(warm, res, order)
    elif sub_type >= 0b100000:  # LPC order 1-32
        order = (sub_type & 0x1F) + 1
        if blocksize <= order:
            raise ValueError("FLAC block shorter than LPC order")
        warm = [br.take_signed(sbps) for _ in range(order)]
        prec = br.take(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC LPC precision code 1111")
        shift = br.take_signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coeffs = [br.take_signed(prec) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        samples = np.empty(blocksize, dtype=np.int64)
        samples[:order] = warm
        s = samples  # python-int loop: exact arithmetic shift on negatives
        for i in range(order, blocksize):
            acc = 0
            for j in range(order):
                acc += coeffs[j] * int(s[i - 1 - j])
            s[i] = int(res[i - order]) + (acc >> shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {sub_type:06b}")
    if samples.size != blocksize:
        raise ValueError("FLAC subframe sample-count drift")
    return samples << wasted if wasted else samples


def _decode_frame(raw: bytes, pos: int, info: dict) -> tuple[np.ndarray, int]:
    start = pos
    if raw[pos] != 0xFF or (raw[pos + 1] & 0xFE) != 0xF8:
        raise ValueError(f"FLAC frame sync lost at byte {pos}")
    if raw[pos + 1] & 0x01:
        raise NotImplementedError(f"{_UNSUPPORTED}: variable blocksize")
    bs_bits, rate_bits = raw[pos + 2] >> 4, raw[pos + 2] & 0xF
    ch_bits, sz_bits = raw[pos + 3] >> 4, (raw[pos + 3] >> 1) & 0x7
    if sz_bits not in (0b100, 0b000):
        raise NotImplementedError(f"{_UNSUPPORTED}: bps code {sz_bits}")
    bps = info["bits_per_sample"]
    if ch_bits <= 0b0111:
        mode, nch = "indep", ch_bits + 1
    elif ch_bits == 0b1000:
        mode, nch = "left_side", 2
    elif ch_bits == 0b1001:
        mode, nch = "right_side", 2
    elif ch_bits == 0b1010:
        mode, nch = "mid_side", 2
    else:
        raise ValueError(f"reserved FLAC channel assignment {ch_bits:04b}")
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

    limit = start + info["max_frame_size"] if info.get("max_frame_size") else None
    br = _BitReader(raw, pos, limit)
    chans = []
    for c in range(nch):
        sbps = bps
        if (mode == "left_side" and c == 1) or (mode == "right_side" and c == 0) or (
            mode == "mid_side" and c == 1
        ):
            sbps += 1  # the side channel carries one extra bit
        chans.append(_decode_subframe(br, blocksize, sbps))
    br.align()
    end = br.byte_pos()
    crc16_stored = struct.unpack(">H", raw[end : end + 2])[0]
    if _crc16(raw[start:end]) != crc16_stored:
        raise ValueError(f"FLAC frame CRC-16 mismatch at byte {start}")

    if mode == "left_side":
        left, side = chans
        chans = [left, left - side]
    elif mode == "right_side":
        side, right = chans
        chans = [right + side, right]
    elif mode == "mid_side":
        mid, side = chans
        m = (mid << 1) | (side & 1)
        chans = [(m + side) >> 1, (m - side) >> 1]
    samples = chans[0] if nch == 1 else np.stack(chans, axis=1)
    return samples, end + 2


def decode_flac(raw: bytes) -> tuple[int, np.ndarray]:
    """Full sample decode: (sample_rate, int16 PCM — 1-D mono or
    (n, nch)), with every frame CRC verified and the STREAMINFO PCM
    MD5 recomputed — bit-exactness is checked, not assumed."""
    info = parse_streaminfo(raw)
    pos, chunks, got = info["frames_offset"], [], 0
    while got < info["n_samples"]:
        samples, pos = _decode_frame(raw, pos, info)
        chunks.append(samples)
        got += samples.shape[0]
    if pos != len(raw):
        raise ValueError("trailing bytes after final FLAC frame")
    pcm64 = np.concatenate(chunks)[: info["n_samples"]]
    if np.any(pcm64 > 32767) or np.any(pcm64 < -32768):
        raise ValueError("decoded FLAC sample outside int16 range")
    pcm = pcm64.astype(np.int16)
    if hashlib.md5(pcm.astype("<i2").tobytes()).digest() != info["pcm_md5"]:
        raise ValueError("decoded PCM fails the STREAMINFO MD5 — codec bug")
    return int(info["sample_rate"]), pcm


def planned_frame_stats(pcm: np.ndarray) -> dict:
    """The ENCODER-side twin of flac_frame_stats: the same census
    derived from _frame_plan on raw PCM, without emitting a bit.
    Because emitter and size predictor consume the identical plan,
    decode-side flac_frame_stats over the real bytes must reproduce
    these numbers exactly — the encoder↔decoder agreement the
    mm_flac_subframe_mix oracle pins."""
    pcm = np.asarray(pcm, dtype=np.int16)
    stats = {
        "n_frames": 0,
        "n_indep": 0,
        "n_left_side": 0,
        "n_right_side": 0,
        "n_mid_side": 0,
        "n_constant": 0,
        "n_verbatim": 0,
        "n_fixed": 0,
        "n_lpc": 0,
        "n_wasted": 0,
        "n_escaped_parts": 0,
        "n_rice2": 0,
        "max_part_order": 0,
    }
    for fr in _as_frames(pcm):
        plan = _frame_plan(fr.astype(np.int64))
        stats["n_frames"] += 1
        mode = plan["mode"]
        if mode in ("indep", "mono"):
            stats["n_indep"] += 1
        else:
            stats[f"n_{mode}"] += 1
        for spec in plan["subframes"]:
            stats[f"n_{spec['kind']}"] += 1
            if spec.get("wasted"):
                stats["n_wasted"] += 1
            rice = spec.get("rice")
            if rice:
                if rice["method"] == 1:
                    stats["n_rice2"] += 1
                stats["max_part_order"] = max(stats["max_part_order"], rice["po"])
                stats["n_escaped_parts"] += sum(1 for m in rice["params"] if m is None)
    return stats


def flac_frame_stats(raw: bytes) -> dict:
    """Per-stream frame/subframe census from the BYTES (full strict
    decode under the hood — CRCs and MD5 still verified): counts of
    stereo modes and subframe kinds, wasted-bit subframes, and Rice
    method/partition usage. The encoder's _frame_plan derives the same
    numbers from PCM at import time, so encoder↔decoder agreement is
    oracle-checkable (mm_flac_subframe_mix)."""
    info = parse_streaminfo(raw)
    stats = {
        "n_frames": 0,
        "n_indep": 0,
        "n_left_side": 0,
        "n_right_side": 0,
        "n_mid_side": 0,
        "n_constant": 0,
        "n_verbatim": 0,
        "n_fixed": 0,
        "n_lpc": 0,
        "n_wasted": 0,
        "n_escaped_parts": 0,
        "n_rice2": 0,
        "max_part_order": 0,
    }
    pos, got = info["frames_offset"], 0
    while got < info["n_samples"]:
        frame_stats, samples, pos = _decode_frame_with_stats(raw, pos, info)
        stats["n_frames"] += 1
        for k, v in frame_stats.items():
            if k == "max_part_order":
                stats[k] = max(stats[k], v)
            else:
                stats[k] += v
        got += samples
    return stats


def _decode_frame_with_stats(raw: bytes, pos: int, info: dict) -> tuple[dict, int, int]:
    """Thin stats wrapper: re-walks the frame header + subframe
    headers while delegating sample decode to _decode_frame (which
    re-verifies CRCs) — the frame is small and already in memory, so
    the double walk costs microseconds and keeps ONE decode path."""
    start = pos
    ch_bits = raw[pos + 3] >> 4
    mode = {0b1000: "left_side", 0b1001: "right_side", 0b1010: "mid_side"}.get(
        ch_bits, "indep"
    )
    samples, end = _decode_frame(raw, pos, info)
    blocksize = samples.shape[0]
    nch = 1 if samples.ndim == 1 else samples.shape[1]
    # re-walk subframe headers for the census
    hdr_len = 4
    _ix, p2 = _read_coded_number(raw, pos + 4)
    hdr_len = p2 - pos
    bs_bits = raw[pos + 2] >> 4
    if bs_bits == 0b0110:
        hdr_len += 1
    elif bs_bits == 0b0111:
        hdr_len += 2
    rate_bits = raw[pos + 2] & 0xF
    if rate_bits == 0b1100:
        hdr_len += 1
    elif rate_bits in (0b1101, 0b1110):
        hdr_len += 2
    hdr_len += 1  # crc8
    limit = start + info["max_frame_size"] if info.get("max_frame_size") else None
    br = _BitReader(raw, pos + hdr_len, limit)
    out = {
        "n_indep": 1 if mode == "indep" else 0,
        "n_left_side": 1 if mode == "left_side" else 0,
        "n_right_side": 1 if mode == "right_side" else 0,
        "n_mid_side": 1 if mode == "mid_side" else 0,
        "n_constant": 0,
        "n_verbatim": 0,
        "n_fixed": 0,
        "n_lpc": 0,
        "n_wasted": 0,
        "n_escaped_parts": 0,
        "n_rice2": 0,
        "max_part_order": 0,
    }
    bps = info["bits_per_sample"]
    for c in range(nch):
        sbps = bps
        if (mode == "left_side" and c == 1) or (mode == "right_side" and c == 0) or (
            mode == "mid_side" and c == 1
        ):
            sbps += 1
        br.take(1)
        sub_type = br.take(6)
        wasted = 0
        if br.take(1):
            wasted = br.unary() + 1
            sbps -= wasted
            out["n_wasted"] += 1
        if sub_type == 0b000000:
            out["n_constant"] += 1
            br.take_signed(sbps)
            continue
        if sub_type == 0b000001:
            out["n_verbatim"] += 1
            for _ in range(blocksize):
                br.take_signed(sbps)
            continue
        if 0b001000 <= sub_type <= 0b001100:
            out["n_fixed"] += 1
            order = sub_type & 0x7
            for _ in range(order):
                br.take_signed(sbps)
        else:
            out["n_lpc"] += 1
            order = (sub_type & 0x1F) + 1
            for _ in range(order):
                br.take_signed(sbps)
            prec = br.take(4) + 1
            br.take_signed(5)
            for _ in range(order):
                br.take_signed(prec)
        method = br.take(2)
        if method == 1:
            out["n_rice2"] += 1
        pbits = 4 if method == 0 else 5
        escape = (1 << pbits) - 1
        po = br.take(4)
        out["max_part_order"] = max(out["max_part_order"], po)
        nparts = 1 << po
        psize = blocksize // nparts
        for p in range(nparts):
            cnt = psize - order if p == 0 else psize
            m = br.take(pbits)
            if m == escape:
                out["n_escaped_parts"] += 1
                w = br.take(5)
                for _ in range(cnt):
                    br.take_signed(w) if w else None
            else:
                for _ in range(cnt):
                    q = br.unary()
                    if m:
                        br.take(m)
    return out, blocksize, end
