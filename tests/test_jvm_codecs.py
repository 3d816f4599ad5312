"""Parity tests for the JVM image-decode fast path (r5 verdict #2).

The from-spec Python codecs are the correctness reference; the
javax.imageio leg (`functions/jvm_codecs.py`) is the production
throughput leg. These tests prove the two legs agree on the same
payloads: bit-exact for the lossless containers (PNG/GIF/BMP, and
grayscale via raster samples so the gray->sRGB gamma ramp never
applies), bounded-error for JPEG whose IDCT is spec-bounded only.
"""

from __future__ import annotations

import shutil

import numpy as np
import pytest

from lime_etl_spark.functions.jvm_codecs import (
    build_decoder_jar,
    decode_image_jvm,
    ensure_jvm_decoder,
)
from lime_etl_spark.operators.bmp_codec import encode_bmp
from lime_etl_spark.operators.gif_codec import encode_gif
from lime_etl_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg
from lime_etl_spark.operators.png_codec import encode_png

pytestmark = pytest.mark.skipif(
    shutil.which("javac") is None, reason="no javac: JVM decode leg unavailable"
)


def _rgb(seed: int, h: int, w: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def _decode_all(spark, payloads: dict[int, bytes]) -> dict[int, dict]:
    ensure_jvm_decoder(spark)
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in sorted(payloads.items())],
        "media_id long, content binary",
    )
    out = {}
    for r in decode_image_jvm(df).collect():
        px = np.frombuffer(bytes(r["pixels"]), np.uint8)
        shape = (r["height"], r["width"], r["channels"])
        out[r["media_id"]] = {
            "w": r["width"],
            "h": r["height"],
            "ch": r["channels"],
            "px": px.reshape(shape if r["channels"] > 1 else shape[:2]),
        }
    return out


def test_lossless_containers_bit_exact(spark):
    rgb = _rgb(11, 21, 17)
    gray = np.random.default_rng(12).integers(0, 256, (9, 23), dtype=np.uint8)
    pal = np.random.default_rng(13).integers(0, 256, (16, 3), dtype=np.uint8)
    indexed = pal[np.random.default_rng(14).integers(0, 16, (14, 10))]
    payloads = {
        1: encode_png(rgb),
        2: encode_bmp(rgb),
        3: encode_gif(indexed),
        4: encode_png(gray),
    }
    got = _decode_all(spark, payloads)
    assert (got[1]["px"] == rgb).all() and got[1]["ch"] == 3
    assert (got[2]["px"] == rgb).all()
    assert (got[3]["px"] == indexed).all()
    # grayscale must come back via raster samples (no gamma), 1 channel
    assert got[4]["ch"] == 1 and (got[4]["px"] == gray).all()


def test_16bit_gray_uses_high_byte(spark):
    """r6 review finding: TYPE_USHORT_GRAY samples must scale via the
    high byte like the Python reference codec, not truncate to the
    low byte."""
    from tests.test_png_codec import _raw_png

    rng = np.random.default_rng(31)
    s = rng.integers(0, 65536, (6, 9, 1), dtype=np.uint16).astype(np.int64)
    got = _decode_all(spark, {1: _raw_png(s, 16, 0)})[1]
    assert got["ch"] == 1
    assert (got["px"] == (s[:, :, 0] >> 8).astype(np.uint8)).all()


def test_rgba_keeps_alpha_channel(spark):
    """r6 review finding: alpha payloads come back 4-channel RGBA like
    the Python reference leg, never silently flattened to RGB."""
    from lime_etl_spark.operators.png_codec import decode_png

    rng = np.random.default_rng(32)
    rgba = rng.integers(0, 256, (7, 11, 4), dtype=np.uint8)
    raw = encode_png(rgba)
    got = _decode_all(spark, {1: raw})[1]
    _w, _h, ch, ref = decode_png(raw)
    assert ch == 4 and got["ch"] == 4
    assert (got["px"] == ref).all()


def test_jpeg_within_idct_tolerance(spark):
    rgb = _rgb(21, 24, 32)
    raw = encode_jpeg(rgb, quality=92)
    got = _decode_all(spark, {1: raw})[1]
    _w, _h, _ch, own = decode_jpeg(raw)
    assert got["px"].shape == own.shape
    # both decode the SAME stream; IDCT/rounding differences only
    diff = np.abs(got["px"].astype(int) - own.astype(int))
    assert diff.max() <= 2, f"JPEG legs diverge: max {diff.max()}"


def test_jar_build_is_cached():
    assert build_decoder_jar() == build_decoder_jar()


def test_unparseable_payload_fails_loudly(spark):
    ensure_jvm_decoder(spark)
    df = spark.createDataFrame([(1, bytearray(b"not an image"))], "media_id long, content binary")
    with pytest.raises(Exception, match="(?i)cannot parse|SparkException"):
        decode_image_jvm(df).collect()


def test_plan_has_no_python_stage(spark):
    """The point of the leg: decode stays JVM-side. The physical plan
    must contain no Python/Arrow eval node."""
    ensure_jvm_decoder(spark)
    df = spark.createDataFrame([(1, bytearray(encode_png(_rgb(5, 8, 8))))],
                               "media_id long, content binary")
    plan = decode_image_jvm(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
