"""Pure-Python BMP codec (stdlib struct + numpy) for the multimodal lane.

Windows BMP with BITMAPINFOHEADER is pixels plus a 40-byte header —
the simplest of the gated formats. Decoder scope: BI_RGB true color
at 16 (X1R5G5B5)/24/32-bit, palette at 1/4/8-bit, BI_RLE8 and
BI_RLE4 run-length compression (since r6 — runs, absolute mode,
end-of-line/bitmap escapes, position deltas), bottom-up or top-down
row order, 4-byte row padding. Other compression methods (e.g.
BI_BITFIELDS) raise loudly. Encoder emits 24-bit BI_RGB bottom-up.

Public file-format knowledge only; no reference-repo counterpart
(the reference is a job-orchestration framework with no media code).
"""

from __future__ import annotations

import struct

import numpy as np


def _decode_rle(data: bytes, w: int, h: int, depth: int) -> np.ndarray:
    """BI_RLE8/BI_RLE4 → palette-index matrix [h, w] in FILE row order
    (bottom-up; the caller flips). Pixels no escape reaches stay 0 —
    the spec leaves them undefined; index 0 is the conventional fill."""
    img = np.zeros((h, w), np.uint8)
    x = y = 0
    i = 0
    while i + 1 < len(data):
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            if y >= h or x + cnt > w:
                raise ValueError("BMP RLE run exceeds image bounds")
            if depth == 8:
                img[y, x : x + cnt] = val
            else:
                pix = ([val >> 4, val & 15] * ((cnt + 1) // 2))[:cnt]
                img[y, x : x + cnt] = pix
            x += cnt
        elif val == 0:  # end of line
            y += 1
            x = 0
        elif val == 1:  # end of bitmap
            return img
        elif val == 2:  # delta
            x += data[i]
            y += data[i + 1]
            i += 2
        else:  # absolute mode: val literal pixels, word-aligned
            n = val
            if y >= h or x + n > w:
                raise ValueError("BMP RLE absolute run exceeds image bounds")
            if depth == 8:
                img[y, x : x + n] = np.frombuffer(data, np.uint8, n, i)
                i += n + (n & 1)
            else:
                nbytes = (n + 1) // 2
                b = np.frombuffer(data, np.uint8, nbytes, i)
                nibbles = np.stack([b >> 4, b & 15], axis=1).reshape(-1)[:n]
                img[y, x : x + n] = nibbles
                i += nbytes + (nbytes & 1)
            x += n
    return img


def decode_bmp(raw: bytes) -> tuple[int, int, int, np.ndarray]:
    """(width, height, channels, uint8 RGB pixels [h, w, 3])."""
    if raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", raw, 10)
    (hdr_size,) = struct.unpack_from("<I", raw, 14)
    if hdr_size < 40:
        raise NotImplementedError(f"BMP header size {hdr_size} not supported")
    w, h_signed = struct.unpack_from("<ii", raw, 18)
    _planes, bpp = struct.unpack_from("<HH", raw, 26)
    (compression,) = struct.unpack_from("<I", raw, 30)
    if compression not in (0, 1, 2):
        raise NotImplementedError(f"compressed BMP (method {compression}) not supported")
    if compression == 1 and bpp != 8:
        raise ValueError("BI_RLE8 requires 8-bit depth")
    if compression == 2 and bpp != 4:
        raise ValueError("BI_RLE4 requires 4-bit depth")
    if bpp not in (1, 4, 8, 16, 24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP not supported")
    h = abs(h_signed)
    top_down = h_signed < 0

    def palette() -> np.ndarray:
        (n_colors,) = struct.unpack_from("<I", raw, 46)
        n_colors = n_colors or (1 << bpp)
        return np.frombuffer(raw, np.uint8, n_colors * 4, 14 + hdr_size).reshape(
            n_colors, 4
        )[:, [2, 1, 0]]  # BGRA -> RGB

    if compression in (1, 2):  # RLE: legal bottom-up only
        if top_down:
            raise ValueError("RLE BMP must be bottom-up")
        idx = _decode_rle(raw[data_offset:], w, h, bpp)
        px = palette()[idx]
    else:
        stride = ((w * bpp + 7) // 8 + 3) & ~3
        rows = np.frombuffer(raw, np.uint8, stride * h, data_offset).reshape(h, stride)
        if bpp in (1, 4):
            bits = np.unpackbits(rows, axis=1)
            spb = bits.shape[1] // bpp
            weights = (1 << np.arange(bpp - 1, -1, -1)).astype(np.uint8)
            idx = (bits[:, : spb * bpp].reshape(h, spb, bpp) * weights).sum(
                axis=2, dtype=np.uint8
            )[:, :w]
            px = palette()[idx]
        elif bpp == 8:
            px = palette()[rows[:, :w]]
        elif bpp == 16:  # BI_RGB 16-bit = X1R5G5B5, 5->8 via (v<<3)|(v>>2)
            u16 = rows[:, : w * 2].reshape(h, w, 2).astype(np.uint16)
            v = u16[:, :, 0] | (u16[:, :, 1] << 8)  # little-endian
            c5 = np.stack([(v >> 10) & 31, (v >> 5) & 31, v & 31], axis=2)
            px = (((c5 << 3) | (c5 >> 2)) & 0xFF).astype(np.uint8)
        else:
            ch = bpp // 8
            px = rows[:, : w * ch].reshape(h, w, ch)[:, :, [2, 1, 0]]  # BGR(A) -> RGB
    if not top_down:
        px = px[::-1]
    return w, h, 3, np.ascontiguousarray(px)


def encode_bmp(px: np.ndarray) -> bytes:
    """uint8 pixels [h, w] or [h, w, ch] → 24-bit BI_RGB BMP bytes."""
    if px.ndim == 2:
        px = px[:, :, None]
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    elif px.shape[2] == 4:
        px = px[:, :, :3]
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = px[::-1, :, [2, 1, 0]].reshape(h, w * 3)  # bottom-up BGR
    data = body.tobytes()
    header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data
