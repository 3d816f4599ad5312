"""Pure-Python BMP codec (stdlib struct + numpy) for the multimodal lane.

Windows BMP with BITMAPINFOHEADER is uncompressed pixels plus a
40-byte header — the simplest of the gated formats. Decoder scope:
BI_RGB 24/32-bit true color and 8-bit palette, bottom-up or top-down
row order, 4-byte row padding. RLE compression and 1/4/16-bit depths
raise loudly. Encoder emits 24-bit BI_RGB bottom-up.

Public file-format knowledge only; no reference-repo counterpart
(the reference is a job-orchestration framework with no media code).
"""

from __future__ import annotations

import struct

import numpy as np


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
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (method {compression}) not supported")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP not supported")
    h = abs(h_signed)
    top_down = h_signed < 0
    stride = (w * bpp // 8 + 3) & ~3
    if bpp == 8:
        (n_colors,) = struct.unpack_from("<I", raw, 46)
        n_colors = n_colors or 256
        pal = np.frombuffer(raw, np.uint8, n_colors * 4, 14 + hdr_size).reshape(
            n_colors, 4
        )[:, [2, 1, 0]]  # BGRA -> RGB
        rows = np.frombuffer(raw, np.uint8, stride * h, data_offset).reshape(h, stride)
        px = pal[rows[:, :w]]
    else:
        ch = bpp // 8
        rows = np.frombuffer(raw, np.uint8, stride * h, data_offset).reshape(h, stride)
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
