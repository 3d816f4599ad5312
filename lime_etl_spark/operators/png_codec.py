"""Pure-Python PNG codec (stdlib zlib + numpy) for the multimodal lane.

The container ships no image libraries, so compressed images were
gated behind ``NotImplementedError`` in r2–r4. PNG needs ONLY
zlib/Inflate — which IS stdlib — plus the public file format
(https://www.w3.org/TR/png-3/): signature, length-prefixed CRC'd
chunks, IHDR geometry, concatenated IDAT zlib stream, and five
per-row byte filters (None/Sub/Up/Average/Paeth). So a from-spec
decoder closes the gate for the most common lossless web format with
no dependencies.

Scope (loud, not silently partial): every legal bit depth — 1/2/4/8
for gray and palette, 8/16 for the other color types (16-bit samples
are returned scaled to 8 via the high byte); color types 0 (gray),
2 (RGB), 3 (palette → expanded to RGB), 4 (gray+alpha) and 6 (RGBA);
both non-interlaced and Adam7-interlaced streams (the seven-pass
sub-image geometry, each pass unfiltered independently per the
spec). CRCs are verified on every chunk — a corrupt payload fails
loudly, never decodes garbage.

The encoder emits filter-0 rows (valid, universally readable; a
production encoder would pick filters per row for compression) and is
used by the fixture builder and by ``resize_images`` to re-emit PNG
outputs in kind. JPEG/MP4 remain gated: DCT/entropy codecs without a
library are out of scope by design, documented in operators/
multimodal.py.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(raw: bytes):
    pos = 8
    while pos < len(raw):
        (length,) = struct.unpack_from(">I", raw, pos)
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", raw, pos + 8 + length)
        if crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Adam7 pass grid: (x0, y0, dx, dy) per the PNG spec's interlace table
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _unfilter(flat: bytes, pos: int, rows: int, stride: int, bpp: int) -> tuple[np.ndarray, int]:
    """Undo the five per-row byte filters over `rows` rows of `stride`
    filtered bytes each; `bpp` is the filter's left-neighbor distance
    (whole bytes — ceil'd to 1 for sub-byte depths, per the spec).
    Returns (uint8 [rows, stride], position after the last row)."""
    out = np.zeros((rows, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(rows):
        if pos >= len(flat):
            raise ValueError("PNG pixel data length mismatch")
        ftype = flat[pos]
        pos += 1
        row = np.frombuffer(flat, dtype=np.uint8, count=stride, offset=pos).astype(np.int32)
        pos += stride
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub: prior byte same row, per pixel unit
            cur = row.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                upleft = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (cur[i] + _paeth(left, int(prev[i]), upleft)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out, pos


def _to_samples(rows_bytes: np.ndarray, width: int, ch: int, bitdepth: int) -> np.ndarray:
    """Unfiltered row bytes → integer samples [rows, width, ch]
    (uint16 domain; 16-bit stays full-range until the final scale)."""
    rows = rows_bytes.shape[0]
    if bitdepth == 8:
        return rows_bytes[:, : width * ch].astype(np.uint16).reshape(rows, width, ch)
    if bitdepth == 16:
        u16 = rows_bytes.reshape(rows, -1)[:, : width * ch * 2]
        be = u16.reshape(rows, width * ch, 2).astype(np.uint16)
        return ((be[:, :, 0] << 8) | be[:, :, 1]).reshape(rows, width, ch)
    # 1/2/4-bit (gray or palette): rows are bit-packed, MSB first
    bits = np.unpackbits(rows_bytes, axis=1)
    spb = bits.shape[1] // bitdepth  # samples per row incl. padding
    grouped = bits[:, : spb * bitdepth].reshape(rows, spb, bitdepth)
    weights = (1 << np.arange(bitdepth - 1, -1, -1)).astype(np.uint16)
    samples = (grouped * weights).sum(axis=2).astype(np.uint16)
    return samples[:, : width * ch].reshape(rows, width, ch)


def decode_png(raw: bytes) -> tuple[int, int, int, np.ndarray]:
    """(width, height, channels, uint8 pixels [h, w, ch]) — palette
    images come back expanded to RGB; 16-bit samples scale to 8 via
    the high byte; sub-8-bit gray levels scale to the full 0–255
    range (exact: 255/(2^d − 1) is integral for d ∈ {1,2,4})."""
    if raw[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    width = height = bitdepth = colortype = interlace = None
    idat = bytearray()
    plte: bytes | None = None
    for ctype, data in _chunks(raw):
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
    if width is None:
        raise ValueError("PNG missing IHDR")
    if colortype not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {colortype} not supported")
    legal = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)}.get(colortype, (8, 16))
    if bitdepth not in legal:
        raise ValueError(f"illegal PNG bit depth {bitdepth} for color type {colortype}")
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    ch = _CHANNELS[colortype]
    flat = zlib.decompress(bytes(idat))

    def pass_samples(pw: int, ph: int, pos: int) -> tuple[np.ndarray, int]:
        stride = -(-(pw * ch * bitdepth) // 8)
        bpp = max(1, ch * bitdepth // 8)
        mat, pos = _unfilter(flat, pos, ph, stride, bpp)
        return _to_samples(mat, pw, ch, bitdepth), pos

    if interlace == 0:
        samples, pos = pass_samples(width, height, 0)
    elif interlace == 1:  # Adam7: seven independent sub-images
        samples = np.zeros((height, width, ch), dtype=np.uint16)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = max(0, -(-(width - x0) // dx))
            ph = max(0, -(-(height - y0) // dy))
            if pw == 0 or ph == 0:
                continue
            sub, pos = pass_samples(pw, ph, pos)
            samples[y0::dy, x0::dx] = sub
    else:
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if pos != len(flat):
        raise ValueError("PNG pixel data length mismatch")

    if colortype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if int(samples.max()) >= len(pal):
            raise ValueError("PNG palette index out of range")
        return width, height, 3, pal[samples[:, :, 0]]
    if bitdepth == 16:
        px = (samples >> 8).astype(np.uint8)
    elif bitdepth < 8:  # gray: expand levels to full range (exact)
        px = (samples * (255 // ((1 << bitdepth) - 1))).astype(np.uint8)
    else:
        px = samples.astype(np.uint8)
    return width, height, ch, px


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    """uint8 pixels [h, w] or [h, w, ch] (ch ∈ 1/2/3/4) → PNG bytes,
    filter-0 rows, one IDAT."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    body = bytearray()
    flat = np.ascontiguousarray(px.astype(np.uint8)).reshape(h, w * ch)
    for y in range(h):
        body += b"\x00" + flat[y].tobytes()
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(body), 6))
        + _chunk(b"IEND", b"")
    )


def png_dims(raw: bytes) -> tuple[int, int]:
    """(width, height) from the CRC-verified IHDR alone — no IDAT
    inflate, no filter pass; pixel-touching stages still run the full
    decoder and its gates."""
    if raw[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    (length,) = struct.unpack_from(">I", raw, 8)
    ctype = raw[12:16]
    if ctype != b"IHDR":
        raise ValueError("PNG first chunk is not IHDR")
    data = raw[16 : 16 + length]
    (crc,) = struct.unpack_from(">I", raw, 16 + length)
    if crc32(ctype + data) & 0xFFFFFFFF != crc:
        raise ValueError("PNG IHDR CRC mismatch")
    width, height = struct.unpack_from(">II", data, 0)
    return width, height
