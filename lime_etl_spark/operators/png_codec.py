"""Pure-Python PNG codec (stdlib zlib + numpy) for the multimodal lane.

The container ships no image libraries, so compressed images were
gated behind ``NotImplementedError`` in r2–r4. PNG needs ONLY
zlib/Inflate — which IS stdlib — plus the public file format
(https://www.w3.org/TR/png-3/): signature, length-prefixed CRC'd
chunks, IHDR geometry, concatenated IDAT zlib stream, and five
per-row byte filters (None/Sub/Up/Average/Paeth). So a from-spec
decoder closes the gate for the most common lossless web format with
no dependencies.

Scope (loud, not silently partial): 8-bit depth; color types 0
(gray), 2 (RGB), 3 (palette → expanded to RGB), 4 (gray+alpha) and
6 (RGBA); non-interlaced. 16-bit and Adam7 interlace raise
``NotImplementedError``. CRCs are verified on every chunk — a
corrupt payload fails loudly, never decodes garbage.

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


def decode_png(raw: bytes) -> tuple[int, int, int, np.ndarray]:
    """(width, height, channels, uint8 pixels [h, w, ch]) — palette
    images come back expanded to RGB."""
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
    if bitdepth != 8:
        raise NotImplementedError(f"only 8-bit PNG supported (got {bitdepth})")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if colortype not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {colortype} not supported")
    ch = _CHANNELS[colortype]
    stride = width * ch
    flat = zlib.decompress(bytes(idat))
    if len(flat) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(height):
        ftype = flat[pos]
        pos += 1
        row = np.frombuffer(flat, dtype=np.uint8, count=stride, offset=pos).astype(
            np.int32
        )
        pos += stride
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub: prior byte same row, per channel
            cur = row.copy()
            for i in range(ch, stride):
                cur[i] = (cur[i] + cur[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for i in range(stride):
                left = int(cur[i - ch]) if i >= ch else 0
                upleft = int(prev[i - ch]) if i >= ch else 0
                cur[i] = (cur[i] + _paeth(left, int(prev[i]), upleft)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(height, width, ch)
    if colortype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        px = pal[px[:, :, 0]]
        ch = 3
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
