"""Property-based codec tests (hypothesis): random pixel arrays must
round-trip exactly through the lossless codecs (PNG/GIF/BMP), within
quantization bounds through JPEG, and exactly through GIF's LZW layer
— across random dims, channel counts and palette sizes, not just the
hand-picked fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lime_etl_spark.operators.bmp_codec import decode_bmp, encode_bmp
from lime_etl_spark.operators.gif_codec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)
from lime_etl_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg
from lime_etl_spark.operators.png_codec import decode_png, encode_png

_dims = st.tuples(st.integers(1, 40), st.integers(1, 40))


def _pixels(seed: int, h: int, w: int, ch: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31), dims=_dims, ch=st.sampled_from([1, 2, 3, 4]))
def test_png_roundtrip_exact(seed, dims, ch):
    h, w = dims
    px = _pixels(seed, h, w, ch)
    W, H, C, out = decode_png(encode_png(px))
    assert (W, H, C) == (w, h, ch)
    assert np.array_equal(out, px)


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 2**31), dims=_dims)
def test_bmp_roundtrip_exact(seed, dims):
    h, w = dims
    px = _pixels(seed, h, w, 3)
    W, H, _C, out = decode_bmp(encode_bmp(px))
    assert (W, H) == (w, h)
    assert np.array_equal(out, px)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    dims=_dims,
    n_colors=st.integers(1, 256),
)
def test_gif_roundtrip_exact(seed, dims, n_colors):
    h, w = dims
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    px = pal[rng.integers(0, n_colors, (h, w))]
    W, H, frames = decode_gif(encode_gif(px))
    assert (W, H, len(frames)) == (w, h, 1)
    assert np.array_equal(frames[0][1], px)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    n_sym=st.integers(2, 256),
    n=st.integers(1, 5000),
)
def test_lzw_layer_roundtrip(seed, n_sym, n):
    idx = np.random.default_rng(seed).integers(0, n_sym, n).astype(np.uint8)
    mcs = max(2, (n_sym - 1).bit_length())
    assert np.array_equal(_lzw_decode(mcs, _lzw_encode(mcs, idx), n), idx)


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31), dims=st.tuples(st.integers(8, 40), st.integers(8, 40)))
def test_jpeg_error_bounded_on_smooth_images(seed, dims):
    h, w = dims
    # smooth low-frequency content: quantization error stays small
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    phase = rng.uniform(0, 2 * np.pi, 3)
    freq = rng.uniform(0.02, 0.12, 3)
    px = np.stack(
        [127.5 + 120 * np.sin(freq[c] * (x + 2 * y) + phase[c]) for c in range(3)],
        axis=2,
    ).astype(np.uint8)
    W, H, C, out = decode_jpeg(encode_jpeg(px, quality=92))
    assert (W, H, C) == (w, h, 3)
    diff = np.abs(out.astype(int) - px.astype(int))
    assert diff.mean() < 6.0
    assert diff.max() <= 40


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2**31), dims=st.tuples(st.integers(1, 32), st.integers(1, 32)))
def test_jpeg_roundtrip_dims_any_size(seed, dims):
    # dims that are not multiples of 8 (incl. 1-pixel edges) must
    # decode back at the exact source geometry
    h, w = dims
    px = _pixels(seed, h, w, 3)
    W, H, C, _out = decode_jpeg(encode_jpeg(px, quality=85))
    assert (W, H, C) == (w, h, 3)


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    dims=st.tuples(st.integers(1, 32), st.integers(1, 32)),
    rst=st.sampled_from([0, 1, 3]),
)
def test_jpeg_non_interleaved_equals_interleaved(seed, dims, rst):
    # scan order must not change the decoded pixels: one SOS per
    # component carries the SAME coefficients as the interleaved form
    h, w = dims
    px = _pixels(seed, h, w, 3)
    inter = decode_jpeg(encode_jpeg(px, quality=85, restart_interval=rst))[3]
    non = decode_jpeg(
        encode_jpeg(px, quality=85, restart_interval=rst, interleaved=False)
    )[3]
    assert np.array_equal(inter, non)
