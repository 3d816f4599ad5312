"""Pure-Python baseline JPEG codec (stdlib + numpy) for the multimodal lane.

The container ships no image libraries, so JPEG — the format a real
web/training corpus is MOSTLY made of — was gated behind
``NotImplementedError`` through r4. The baseline sequential DCT
process (ITU-T T.81 / ISO 10918-1, the public spec) needs nothing
beyond bit twiddling and an 8x8 inverse DCT, so a from-spec decoder
closes the gate with no dependencies.

Decoder scope (loud, not silently partial): baseline + extended
sequential Huffman (SOF0/SOF1) — interleaved or one-SOS-per-component
— and PROGRESSIVE Huffman (SOF2, T.81 Annex G: spectral selection +
successive approximation, EOB runs, AC refinement correction bits;
since r6). 8-bit samples, 1-component grayscale and 3-component
YCbCr (or RGB when an Adobe APP14 transform says so), restart
intervals, any integer subsampling ratio (4:4:4 / 4:2:2 / 4:2:0 /
4:1:1). Every scan accumulates into per-component coefficient
arrays; dequantization + a vectorized IDCT run once at the end.
Arithmetic coding, 12-bit, lossless, hierarchical, and 4-component
CMYK raise ``NotImplementedError``. Chroma upsampling is
nearest-neighbor block replication — the spec's reference method;
"fancy" triangular upsampling differs by a few codes on chroma
edges, which tests account for with a tolerance.

Encoder scope: baseline SOF0, grayscale or 4:4:4 YCbCr, Annex-K
quantization tables scaled by the libjpeg quality formula, and
GENERATED flat canonical Huffman tables (all 12 DC symbols at 4
bits, all 162 AC symbols at 8 bits) — valid prefix codes with the
all-ones codeword reserved per the spec, chosen over the Annex-K
statistics tables so there are no long recalled constant tables to
get silently wrong; the tables ride in the stream, so any conformant
decoder (tests use the JVM's javax.imageio as the independent
oracle) reads them.

Everything here derives from the public T.81 spec; no reference-repo
counterpart exists (the reference is a job-orchestration framework,
/root/reference/lime_etl — no media handling at all).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables (generated, not recalled)
# ---------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """Zigzag index of each (row, col): generated from the diagonal
    rule (even diagonals run bottom-left→top-right) instead of a
    recalled 64-entry constant table."""
    order = []
    for s in range(15):
        diag = [(r, s - r) for r in range(s + 1) if r < 8 and 0 <= s - r < 8]
        if s % 2 == 0:
            diag.reverse()
        order.extend(diag)
    zz = np.zeros(64, dtype=np.int64)
    for k, (r, c) in enumerate(order):
        zz[k] = r * 8 + c
    return zz


_ZZ = _zigzag_order()  # _ZZ[k] = raster index of k-th zigzag coefficient

# Orthonormal 8-point DCT-II basis: M[u, x] = c_u/2 * cos((2x+1)uπ/16).
# spatial = M.T @ coef @ M ; coef = M @ spatial @ M.T
_M = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# Annex K example quantization tables (public spec, Tables K.1/K.2).
_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


class _HuffTable:
    """Canonical Huffman table in the spec's (BITS, HUFFVAL) form with
    the standard MINCODE/MAXCODE/VALPTR decode procedure (F.2.2.3)."""

    def __init__(self, counts: list[int], symbols: bytes) -> None:
        self.counts = counts  # counts[l-1] = #codes of length l, l in 1..16
        self.symbols = symbols
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = counts[length - 1]
            self.valptr[length] = k
            self.mincode[length] = code
            self.maxcode[length] = code + n - 1 if n else -1
            code = (code + n) << 1
            k += n

    def encode_map(self) -> dict[int, tuple[int, int]]:
        out: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(self.counts[length - 1]):
                out[self.symbols[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1
        return out


def _flat_table(symbols: list[int]) -> _HuffTable:
    """All symbols at one code length L (smallest L with
    n <= 2^L - 1, reserving the all-ones codeword per the spec)."""
    n = len(symbols)
    length = 1
    while (1 << length) - 1 < n:
        length += 1
    counts = [0] * 16
    counts[length - 1] = n
    return _HuffTable(counts, bytes(symbols))


_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]


class _BitReader:
    """MSB-first bit reader over an already de-stuffed entropy segment."""

    __slots__ = ("data", "pos", "cur", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.cur = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                # A valid (de-stuffed) entropy segment contains every
                # bit its MCUs need; running dry mid-MCU means the scan
                # data was truncated — fail loudly, never fabricate
                # pixels from zero padding.
                raise ValueError("JPEG entropy data truncated")
            byte = self.data[self.pos]
            self.pos += 1
            self.cur = (self.cur << 8) | byte
            self.nbits += 8
        self.nbits -= n
        val = (self.cur >> self.nbits) & ((1 << n) - 1)
        self.cur &= (1 << self.nbits) - 1
        return val

    def decode_huff(self, table: _HuffTable) -> int:
        code = self.read(1)
        for length in range(1, 17):
            if table.maxcode[length] >= code:
                return table.symbols[
                    table.valptr[length] + code - table.mincode[length]
                ]
            code = (code << 1) | self.read(1)
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """RECEIVE/EXTEND (spec F.2.2.1): map an s-bit magnitude to the
    signed coefficient value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_SOF_GATES = {
    0xC3: "lossless JPEG (SOF3)",
    0xC5: "differential sequential JPEG",
    0xC6: "differential progressive JPEG",
    0xC7: "differential lossless JPEG",
    0xC9: "arithmetic-coded JPEG",
    0xCA: "arithmetic progressive JPEG",
    0xCB: "arithmetic lossless JPEG",
    0xCD: "differential arithmetic JPEG",
    0xCE: "differential arithmetic progressive JPEG",
    0xCF: "differential arithmetic lossless JPEG",
}


def _extract_entropy(raw: bytes, pos: int) -> tuple[list[bytes], int]:
    """De-stuffed entropy-coded segments starting at `pos`, split at
    RSTn markers; returns (segments, index of the next real marker)."""
    segments: list[bytes] = []
    buf = bytearray()
    i = pos
    while i < len(raw):
        b = raw[i]
        if b == 0xFF:
            nxt = raw[i + 1] if i + 1 < len(raw) else 0xD9
            if nxt == 0x00:
                buf.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytes(buf))
                buf = bytearray()
                i += 2
                continue
            break  # EOI or next real marker
        buf.append(b)
        i += 1
    segments.append(bytes(buf))
    return segments, i


def _decode_block_full(
    reader: _BitReader, block: np.ndarray, dc_t: _HuffTable, ac_t: _HuffTable, pred: list[int], ci: int
) -> None:
    """Baseline full-band data unit: DC diff + AC run-length (F.2.2)."""
    s = reader.decode_huff(dc_t)
    pred[ci] += _extend(reader.read(s), s)
    block[0] = pred[ci]
    k = 1
    while k < 64:
        rs = reader.decode_huff(ac_t)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                break
            k += 16
            continue
        k += r
        block[k] = _extend(reader.read(s), s)
        k += 1


def _decode_ac_first(
    reader: _BitReader,
    block: np.ndarray,
    ac_t: _HuffTable,
    ss: int,
    se: int,
    al: int,
    eobrun: list[int],
) -> None:
    """Progressive AC initial scan (G.1.2.2): run-length with EOBn
    (end-of-band run) symbols; values arrive scaled by 2^Al."""
    if eobrun[0] > 0:
        eobrun[0] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode_huff(ac_t)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:  # ZRL: 16 zero coefficients
                k += 16
                continue
            eobrun[0] = (1 << r) - 1 + (reader.read(r) if r else 0)
            break
        k += r
        block[k] = _extend(reader.read(s), s) << al
        k += 1


def _refine_nonzero(reader: _BitReader, block: np.ndarray, k: int, p1: int) -> None:
    """Correction bit for a coefficient with nonzero history
    (G.1.2.3): a 1-bit adds 2^Al toward larger magnitude if that bit
    is not already set."""
    if reader.read(1):
        a = abs(int(block[k]))
        if not (a & p1):
            block[k] = a + p1 if block[k] > 0 else -(a + p1)


def _decode_ac_refine(
    reader: _BitReader,
    block: np.ndarray,
    ac_t: _HuffTable,
    ss: int,
    se: int,
    al: int,
    eobrun: list[int],
) -> None:
    """Progressive AC refinement scan (G.1.2.3): newly-nonzero
    coefficients arrive as ±2^Al; every coefficient with nonzero
    history consumes a correction bit — including inside ZRL runs and
    EOB bands."""
    p1 = 1 << al
    k = ss
    if eobrun[0] == 0:
        while k <= se:
            rs = reader.decode_huff(ac_t)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eobrun[0] = (1 << r) + (reader.read(r) if r else 0)
                    break
                # ZRL: r stays 15 -> skip 16 zero-history positions below
            else:
                val = p1 if reader.read(1) else -p1
            while k <= se:
                if block[k] != 0:
                    _refine_nonzero(reader, block, k, p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val != 0 and k <= se:
                block[k] = val
            k += 1
    if eobrun[0] > 0:
        while k <= se:
            if block[k] != 0:
                _refine_nonzero(reader, block, k, p1)
            k += 1
        eobrun[0] -= 1


def _decode_scan(
    segments: list[bytes],
    scan: list[tuple[int, int, int]],
    comp_ix: dict[int, int],
    comps: list[tuple[int, int, int, int]],
    coefs: list[np.ndarray],
    dc_tables: dict[int, _HuffTable],
    ac_tables: dict[int, _HuffTable],
    geom: tuple[int, int, int, int, int, int],
    band: tuple[int, int, int, int],
    restart_interval: int,
    progressive: bool,
) -> None:
    """Decode ONE scan's entropy data into the per-component
    coefficient arrays. Handles every T.81 Huffman scan shape through
    one dispatch: baseline full-band (interleaved or one-component),
    progressive DC first/refine (Ss=0), progressive AC first/refine
    (single-component bands)."""
    h, w, hmax, vmax, mcux, mcuy = geom
    ss, se, ah, al = band
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")

    def unit(reader, ci, block, pred, eobrun, dc_t, ac_t):
        if not progressive:
            _decode_block_full(reader, block, dc_t, ac_t, pred, ci)
        elif ss == 0 and ah == 0:  # DC first
            s = reader.decode_huff(dc_t)
            pred[ci] += _extend(reader.read(s), s)
            block[0] = pred[ci] << al
        elif ss == 0:  # DC refinement: append one magnitude bit
            block[0] |= reader.read(1) << al
        elif ah == 0:
            _decode_ac_first(reader, block, ac_t, ss, se, al, eobrun)
        else:
            _decode_ac_refine(reader, block, ac_t, ss, se, al, eobrun)

    info = []
    for cs, td, ta in scan:
        ci = comp_ix[cs]
        _cid, hi, vi, _tq = comps[ci]
        dc_t = dc_tables.get(td) if (ss == 0) else None
        ac_t = ac_tables.get(ta) if (se > 0 or not progressive) else None
        info.append((ci, hi, vi, dc_t, ac_t))

    seg_ix = 0
    reader = _BitReader(segments[0])
    pred = [0] * len(comps)
    eobrun = [0]

    if len(scan) > 1:  # interleaved: frame MCU geometry
        n_units = mcux * mcuy
    else:  # non-interleaved: the component's own true block grid
        ci, hi, vi, _d, _a = info[0]
        comp_w = -(-(w * hi) // hmax)  # ceil(w*hi/hmax)
        comp_h = -(-(h * vi) // vmax)
        bw = -(-comp_w // 8)
        bh = -(-comp_h // 8)
        n_units = bw * bh

    for m in range(n_units):
        if restart_interval and m and m % restart_interval == 0:
            seg_ix += 1
            reader = _BitReader(segments[seg_ix])
            pred = [0] * len(comps)
            eobrun = [0]
        if len(scan) > 1:
            my, mx = divmod(m, mcux)
            for ci, hi, vi, dc_t, ac_t in info:
                for by in range(vi):
                    for bx in range(hi):
                        block = coefs[ci][my * vi + by, mx * hi + bx]
                        unit(reader, ci, block, pred, eobrun, dc_t, ac_t)
        else:
            ci, hi, vi, dc_t, ac_t = info[0]
            row, col = divmod(m, bw)
            unit(reader, ci, coefs[ci][row, col], pred, eobrun, dc_t, ac_t)


def decode_jpeg(raw: bytes) -> tuple[int, int, int, np.ndarray]:
    """(width, height, channels, uint8 pixels [h, w, ch]) — grayscale
    comes back ch=1, color ch=3 RGB.

    Multi-scan architecture (T.81 Annexes F and G): every SOS decodes
    into per-component zigzag coefficient arrays; dequantization, the
    IDCT (vectorized over all blocks), upsampling and the color
    transform run once at the end. This one path covers baseline
    interleaved, baseline non-interleaved (one SOS per component), and
    progressive (SOF2) spectral-selection + successive-approximation
    streams — the shape most web crawls actually serve."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qts: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffTable] = {}
    ac_tables: dict[int, _HuffTable] = {}
    frame = None  # (h, w, [(cid, hi, vi, tq)])
    progressive = False
    restart_interval = 0
    adobe_transform = None
    coefs: list[np.ndarray] | None = None
    geom = None
    comp_ix: dict[int, int] = {}
    pos = 2
    while pos < len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at offset {pos}")
        marker = raw[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", raw, pos + 2)
        seg = raw[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    qts[tq] = np.frombuffer(seg, np.uint8, 64, i).astype(np.int64)
                    i += 64
                else:
                    qts[tq] = np.frombuffer(seg, ">u2", 64, i).astype(np.int64)
                    i += 128
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                total = sum(counts)
                table = _HuffTable(counts, seg[i + 17 : i + 17 + total])
                (dc_tables if tc == 0 else ac_tables)[th] = table
                i += 17 + total
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 / SOF2
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG not supported")
            progressive = marker == 0xC2
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in _SOF_GATES:
            raise NotImplementedError(f"{_SOF_GATES[marker]} not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xEE and seg[:5] == b"Adobe":  # APP14
            adobe_transform = seg[11]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            h, w, comps = frame
            if len(comps) not in (1, 3):
                raise NotImplementedError(f"{len(comps)}-component JPEG not supported")
            ns = seg[0]
            scan = [
                (seg[1 + 2 * j], seg[2 + 2 * j] >> 4, seg[2 + 2 * j] & 15) for j in range(ns)
            ]
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            band = (ss, se, ahal >> 4, ahal & 15)
            if coefs is None:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                geom = (h, w, hmax, vmax, mcux, mcuy)
                comp_ix = {cid: ci for ci, (cid, _hi, _vi, _tq) in enumerate(comps)}
                coefs = [
                    np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
                    for _cid, hi, vi, _tq in comps
                ]
            segments, pos = _extract_entropy(raw, pos)
            _decode_scan(
                segments,
                scan,
                comp_ix,
                comps,
                coefs,
                dc_tables,
                ac_tables,
                geom,
                band,
                restart_interval,
                progressive,
            )
        # APPn / COM / others: skipped
    if frame is None or coefs is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = frame
    hmax, vmax = geom[2], geom[3]

    # dequantize + vectorized IDCT over every block, then upsample/crop
    full = []
    for ci, (_cid, hi, vi, tq) in enumerate(comps):
        deq = coefs[ci] * qts[tq][None, None, :]
        rows, cols = deq.shape[:2]
        raster = np.zeros((rows, cols, 64), dtype=np.float64)
        raster[:, :, _ZZ] = deq
        b = raster.reshape(rows, cols, 8, 8)
        spatial = np.einsum("ux,rcuv,vy->rcxy", _M, b, _M)
        plane = spatial.transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8)
        if hmax % hi or vmax % vi:
            raise NotImplementedError("non-integer chroma subsampling ratio")
        up = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(up[:h, :w] + 128.0)

    if len(full) == 1:
        px = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[:, :, None]
        return w, h, 1, px
    if adobe_transform == 0:  # Adobe APP14 says the 3 components are RGB
        rgb = np.stack(full, axis=2)
    else:
        y, cb, cr = full
        rgb = np.stack(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ],
            axis=2,
        )
    return w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.cur = (self.cur << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.cur >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.cur &= (1 << self.nbits) - 1

    def restart(self, n: int) -> None:
        """Byte-align (1-padding) and emit the RSTn marker unstuffed."""
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)
        self.out += bytes([0xFF, 0xD0 + (n % 8)])

    def flush(self) -> bytes:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)  # pad with 1s
        return bytes(self.out)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


def _dht_segment(tc: int, th: int, table: _HuffTable) -> bytes:
    payload = bytes([(tc << 4) | th]) + bytes(table.counts) + table.symbols
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    qt: np.ndarray,
    pred: int,
    dc_map: dict,
    ac_map: dict,
) -> int:
    coef = _M @ (block - 128.0) @ _M.T
    zz = coef.reshape(-1)[_ZZ]
    q = np.round(zz / qt).astype(np.int64)
    diff = int(q[0]) - pred
    s = int(abs(diff)).bit_length()
    writer.write(*dc_map[s])
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            writer.write(*ac_map[0xF0])
            run -= 16
        s = abs(v).bit_length()
        writer.write(*ac_map[(run << 4) | s])
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        writer.write(*ac_map[0x00])  # EOB
    return int(q[0])


def encode_jpeg(
    px: np.ndarray,
    quality: int = 90,
    restart_interval: int = 0,
    interleaved: bool = True,
) -> bytes:
    """uint8 pixels [h, w] or [h, w, ch] → baseline JPEG bytes.
    ch 1 → grayscale scan; 2 (GA) drops alpha to grayscale; 3 →
    4:4:4 YCbCr; 4 (RGBA) drops alpha. Flat generated Huffman tables
    (valid canonical codes; compression-suboptimal, spec-exact).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs — the error-resilience feature real camera files use.
    ``interleaved=False`` writes one SOS per component (the legal
    baseline shape some encoders emit), exercising the decoder's
    non-interleaved scan geometry."""
    if px.ndim == 2:
        px = px[:, :, None]
    if px.shape[2] == 2:
        px = px[:, :, :1]
    elif px.shape[2] == 4:
        px = px[:, :, :3]
    h, w, ch = px.shape
    gray = ch == 1
    f = px.astype(np.float64)
    if gray:
        planes = [f[:, :, 0]]
        qts = [_scaled_qt(_QT_LUMA, quality)[_ZZ]]
    else:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        # DQT entries (and _encode_block's divisor, which sees zigzag-
        # ordered coefficients) are spec-defined in ZIGZAG order; the
        # base tables are typed in raster order, so reorder here — this
        # is what makes the written tables actually Annex K.
        qts = [
            _scaled_qt(_QT_LUMA, quality)[_ZZ],
            _scaled_qt(_QT_CHROMA, quality)[_ZZ],
        ]

    dc_tbl = _flat_table(_DC_SYMBOLS)
    ac_tbl = _flat_table(_AC_SYMBOLS)
    dc_map, ac_map = dc_tbl.encode_map(), ac_tbl.encode_map()

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0])
    )
    for tq, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(qt.tolist())
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, dc_tbl) + _dht_segment(1, 0, ac_tbl)
    if not gray:
        out += _dht_segment(0, 1, dc_tbl) + _dht_segment(1, 1, ac_tbl)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    # pad planes to multiples of 8 by edge replication
    padded = []
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    for plane in planes:
        padded.append(np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge"))

    if interleaved or gray:
        sos = bytes([ncomp])
        for c in range(ncomp):
            t = 0 if c == 0 else 1
            sos += bytes([c + 1, (t << 4) | t])
        sos += bytes([0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        writer = _BitWriter()
        preds = [0] * ncomp
        mcu = 0
        rst = 0
        for by in range(ph // 8):
            for bx in range(pw // 8):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    writer.restart(rst)
                    rst += 1
                    preds = [0] * ncomp
                mcu += 1
                for ci in range(ncomp):
                    qt = qts[0] if ci == 0 else qts[1]
                    preds[ci] = _encode_block(
                        writer,
                        padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                        qt,
                        preds[ci],
                        dc_map,
                        ac_map,
                    )
        out += writer.flush()
    else:
        # one SOS per component; in a non-interleaved scan the MCU is a
        # single data unit, restart counting and DC prediction reset
        # per scan (4:4:4 here, so each component covers the full grid)
        for ci in range(ncomp):
            t = 0 if ci == 0 else 1
            sos = bytes([1, ci + 1, (t << 4) | t, 0, 63, 0])
            out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
            writer = _BitWriter()
            pred = 0
            unit = 0
            rst = 0
            qt = qts[0] if ci == 0 else qts[1]
            for by in range(ph // 8):
                for bx in range(pw // 8):
                    if restart_interval and unit and unit % restart_interval == 0:
                        writer.restart(rst)
                        rst += 1
                        pred = 0
                    unit += 1
                    pred = _encode_block(
                        writer,
                        padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                        qt,
                        pred,
                        dc_map,
                        ac_map,
                    )
            out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_dims(raw: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from the SOF header ALONE — the
    metadata stage must not pay a full Python Huffman+IDCT decode per
    payload (pixel-touching stages still decode and validate)."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at offset {pos}")
        marker = raw[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", raw, pos + 2)
        if marker in (0xC0, 0xC1, 0xC2):  # baseline / extended / progressive
            h, w = struct.unpack_from(">HH", raw, pos + 5)
            return w, h, raw[pos + 9]
        if marker in _SOF_GATES:
            raise NotImplementedError(f"{_SOF_GATES[marker]} not supported")
        if marker == 0xDA:
            break  # scan data before any SOF: malformed
        pos += 2 + seglen
    raise ValueError("JPEG missing SOF header")
