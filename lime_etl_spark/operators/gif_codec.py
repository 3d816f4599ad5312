"""Pure-Python GIF codec (stdlib + numpy) for the multimodal lane.

GIF87a/GIF89a (the public spec) is LZW over palette indices — no
external codec needed. Closes another r2–r4 ``NotImplementedError``
gate in the multimodal decode path.

Decoder scope: global/local color tables, interlaced images,
multi-frame animations with Graphic Control Extensions (delay,
transparency, and ALL disposal methods — 0/1 "leave", 2 "restore to
background", 3 "restore to previous" since r6), frames composited
onto the logical screen so every returned frame is a full canvas.

Encoder scope: single- or multi-frame, one global color table built
from the image's distinct colors (>256 distinct colors raises — a
real encoder would quantize; tests feed palette-sized fixtures), real
LZW with the spec's deferred code-size growth and a dictionary reset
at 4096 codes.

From the public GIF89a specification; the reference repo
(/root/reference/lime_etl — a job-orchestration framework) has no
media handling to mirror.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    out = np.zeros(n_pixels, dtype=np.uint8)
    n_out = 0
    # bit reader: LSB-first within bytes
    acc = 0
    nbits = 0
    pos = 0
    codes: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal codes, width, prev
        codes = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while n_out < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if prev is None:
            entry = codes[code]
        elif code < len(codes):
            entry = codes[code]
            codes.append(prev + entry[:1])
        elif code == len(codes):
            entry = prev + prev[:1]
            codes.append(entry)
        else:
            raise ValueError("invalid GIF LZW code")
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        n_out += len(entry)
        prev = entry
        if len(codes) == (1 << width) and width < 12:
            width += 1
    return out


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    s = b""
    for ix in indices.tobytes():
        c = bytes([ix])
        if s + c in table:
            s += c
            continue
        emit(table[s], width)
        table[s + c] = next_code
        next_code += 1
        if next_code > (1 << width):
            if width < 12:
                width += 1
            else:
                emit(clear, width)
                table = {bytes([i]): i for i in range(clear)}
                next_code = end + 1
                width = min_code_size + 1
        s = c
    if s:
        emit(table[s], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def decode_gif(raw: bytes) -> tuple[int, int, list[tuple[int, np.ndarray]]]:
    """(width, height, [(delay_ms, full-canvas RGB uint8 [h, w, 3])])."""
    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg_ix, _aspect = struct.unpack_from("<HHBBB", raw, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(raw, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_ix < len(gct):
        canvas[:, :] = gct[bg_ix]
    background = canvas.copy()
    frames: list[tuple[int, np.ndarray]] = []
    delay_ms = 0
    transparent: int | None = None
    disposal = 0
    while pos < len(raw):
        block = raw[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = raw[pos + 1]
            pos += 2
            if label == 0xF9:  # Graphic Control Extension
                size = raw[pos]
                packed, delay_cs, tix = struct.unpack_from("<BHB", raw, pos + 1)
                disposal = (packed >> 2) & 7
                transparent = tix if packed & 1 else None
                delay_ms = delay_cs * 10
                pos += 1 + size + 1  # size byte + payload + terminator
            else:  # skip sub-blocks
                while raw[pos]:
                    pos += 1 + raw[pos]
                pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", raw, pos + 1)
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = np.frombuffer(raw, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("GIF image without any color table")
            min_code_size = raw[pos]
            pos += 1
            data = bytearray()
            while raw[pos]:
                size = raw[pos]
                data += raw[pos + 1 : pos + 1 + size]
                pos += 1 + size
            pos += 1
            idx = _lzw_decode(min_code_size, bytes(data), iw * ih).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: reorder rows
                de = np.zeros_like(idx)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    rows = range(start, ih, step)
                    for r in rows:
                        de[r] = idx[src]
                        src += 1
                idx = de
            rgb = ct[np.minimum(idx, len(ct) - 1)]
            region = canvas[top : top + ih, left : left + iw]
            # disposal 3 restores the graphic's rectangle to its
            # PRE-RENDER state after the frame is shown (GIF89a §23)
            saved = region.copy() if disposal == 3 else None
            if transparent is not None:
                mask = (idx != transparent)[:, :, None]
                region[:] = np.where(mask, rgb, region)
            else:
                region[:] = rgb
            frames.append((delay_ms, canvas.copy()))
            if disposal == 2:
                canvas[top : top + ih, left : left + iw] = background[
                    top : top + ih, left : left + iw
                ]
            elif disposal == 3:
                canvas[top : top + ih, left : left + iw] = saved
            delay_ms = 0
            transparent = None
            disposal = 0
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    return w, h, frames


def encode_gif(frames: list[tuple[int, np.ndarray]] | np.ndarray) -> bytes:
    """[(delay_ms, RGB uint8 [h, w, 3])] (or one bare array) → GIF89a
    bytes. One global palette when all frames' distinct colors fit in
    256; otherwise each frame gets its own LOCAL color table (legal
    GIF89a — and exactly how multi-palette animations are authored),
    raising only when a SINGLE frame exceeds 256 distinct colors (a
    real encoder would quantize; this one never alters pixels)."""
    if isinstance(frames, np.ndarray):
        frames = [(0, frames)]
    h, w = frames[0][1].shape[:2]
    allpx = np.concatenate([f.reshape(-1, 3) for _, f in frames])
    colors = np.unique(allpx, axis=0)
    use_global = len(colors) <= 256

    def _table(cols: np.ndarray) -> tuple[dict, int, bytes]:
        lut = {tuple(c): i for i, c in enumerate(cols.tolist())}
        bits = max(1, (len(cols) - 1).bit_length())
        table = cols.astype(np.uint8).tobytes() + bytes(3 * ((1 << bits) - len(cols)))
        return lut, bits, table

    out = bytearray(b"GIF89a")
    if use_global:
        g_lut, g_bits, g_table = _table(colors)
        out += struct.pack("<HHBBB", w, h, 0x80 | ((g_bits - 1) & 7), 0, 0)
        out += g_table
    else:
        out += struct.pack("<HHBBB", w, h, 0, 0, 0)  # no global table
    animated = len(frames) > 1
    for delay_ms, f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all GIF frames must share the canvas size")
        if animated:
            out += b"\x21\xf9" + struct.pack("<BBHBB", 4, 0, delay_ms // 10, 0, 0)
        if use_global:
            lut, bits = g_lut, g_bits
            out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        else:
            fc = np.unique(f.reshape(-1, 3), axis=0)
            if len(fc) > 256:
                raise NotImplementedError(
                    f"GIF encoder needs palette-sized frames ({len(fc)} distinct colors)"
                )
            lut, bits, table = _table(fc)
            out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x80 | ((bits - 1) & 7))
            out += table
        idx = np.array(
            [lut[tuple(p)] for p in f.reshape(-1, 3).tolist()], dtype=np.uint8
        )
        min_code_size = max(2, bits)
        out.append(min_code_size)
        data = _lzw_encode(min_code_size, idx)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def gif_info(raw: bytes) -> tuple[int, int, int, int]:
    """(width, height, n_frames, total_duration_ms) by WALKING the
    block structure only — no LZW decode, no compositing; the metadata
    stage of a media sweep needs the container skeleton, not pixels."""
    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, _bg, _aspect = struct.unpack_from("<HHBBB", raw, 6)
    pos = 13
    if flags & 0x80:
        pos += (2 << (flags & 7)) * 3
    n_frames = 0
    duration_ms = 0
    pending_ms = 0  # decode_gif semantics: last GCE before a frame wins
    while pos < len(raw):
        block = raw[pos]
        if block == 0x3B:
            break
        if block == 0x21:
            label = raw[pos + 1]
            pos += 2
            if label == 0xF9:
                _packed, delay_cs, _tix = struct.unpack_from("<BHB", raw, pos + 1)
                pending_ms = delay_cs * 10
            while raw[pos]:
                pos += 1 + raw[pos]
            pos += 1
        elif block == 0x2C:
            _l, _t, _iw, _ih, iflags = struct.unpack_from("<HHHHB", raw, pos + 1)
            pos += 10
            if iflags & 0x80:
                pos += (2 << (iflags & 7)) * 3
            pos += 1  # LZW min code size
            while raw[pos]:
                pos += 1 + raw[pos]  # skip data sub-blocks unread
            pos += 1
            n_frames += 1
            duration_ms += pending_ms
            pending_ms = 0
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    return w, h, n_frames, duration_ms
