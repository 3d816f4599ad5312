"""Decode-throughput bench: Python from-spec codecs vs the JVM
imageio leg (r5 verdict #2 'bench both legs').

Builds a deterministic image corpus (PNG + JPEG + BMP + GIF, the four
containers both legs read), then times full-pixel decode through:

- **python leg** — `mapInArrow` + the from-spec decoders
  (`operators/*_codec.py`), i.e. the correctness-reference path: every
  payload crosses into the Python worker and is decoded in
  interpreted/numpy code.
- **jvm leg** — `decode_image_jvm` (`functions/jvm_codecs.py`):
  decode stays in the executor JVM, no Python boundary.

Both legs are forced to materialize every pixel via a crc32 over the
pixel buffer, aggregated JVM-side, so neither can skip work. Output:
one JSON line per leg + a ratio line — paste the result into
SURVEY §6. Run it alone (no concurrent Spark jobs) for stable times.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
from pyspark.sql import functions as F

from lime_etl_spark.session import get_spark


def build_corpus(spark, n: int = 240, side: int = 96):
    from lime_etl_spark.operators.bmp_codec import encode_bmp
    from lime_etl_spark.operators.gif_codec import encode_gif
    from lime_etl_spark.operators.jpeg_codec import encode_jpeg
    from lime_etl_spark.operators.png_codec import encode_png

    rows = []
    total_px = 0
    for i in range(n):
        rng = np.random.default_rng(1000 + i)
        h = side + (i % 5) * 8
        w = side + (i % 7) * 8
        total_px += h * w
        kind = i % 4
        if kind == 0:
            # smooth gradient: realistic PNG filter/JPEG DCT behavior
            y, x = np.mgrid[0:h, 0:w]
            px = np.stack([(y * 255 // h), (x * 255 // w), ((x + y) * 255 // (h + w))], 2).astype(
                np.uint8
            )
            raw = encode_png(px)
        elif kind == 1:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            raw = encode_jpeg(px, quality=85)
        elif kind == 2:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            raw = encode_bmp(px)
        else:
            pal = rng.integers(0, 256, (32, 3), dtype=np.uint8)
            raw = encode_gif(pal[rng.integers(0, 32, (h, w))])
        rows.append((i, bytearray(raw)))
    df = spark.createDataFrame(rows, "media_id long, content binary").repartition(32).persist()
    df.count()
    return df, total_px


def python_leg(df):
    """Full pixel decode through the from-spec codecs in the Python
    worker; crc32 of the pixel buffer forces materialization."""
    import pyarrow as pa

    def run(batches):
        import zlib

        from lime_etl_spark.operators.multimodal import _decode_image

        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            crcs = []
            for c in batch.column("content").to_pylist():
                _w, _h, _ch, px = _decode_image(bytes(c))
                crcs.append(zlib.crc32(px.tobytes()))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()), pa.array(crcs, pa.int64())],
                names=["media_id", "crc"],
            )

    out = df.mapInArrow(run, "media_id long, crc long")
    return out.agg(F.count("*").alias("n"), F.sum("crc").alias("s")).collect()[0]


def jvm_leg(df):
    from lime_etl_spark.functions.jvm_codecs import decode_image_jvm

    out = decode_image_jvm(df).select(F.crc32("pixels").alias("crc"))
    return out.agg(F.count("*").alias("n"), F.sum("crc").alias("s")).collect()[0]


def main() -> None:
    spark = get_spark(app_name="media-decode-bench", shuffle_partitions=32)
    from lime_etl_spark.functions.jvm_codecs import ensure_jvm_decoder

    ensure_jvm_decoder(spark)
    df, total_px = build_corpus(spark)
    n = df.count()
    results = {}
    for name, leg in (("jvm", jvm_leg), ("python", python_leg)):
        leg(df)  # warm-up: JIT / worker spin-up off the clock
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            row = leg(df)
            times.append(time.perf_counter() - t0)
            assert row["n"] == n
        best = min(times)
        results[name] = best
        print(
            json.dumps(
                {
                    "metric": f"decode_{name}_leg",
                    "value": round(best, 3),
                    "unit": "sec",
                    "images": n,
                    "mpixels": round(total_px / 1e6, 2),
                    "mpix_per_sec": round(total_px / 1e6 / best, 2),
                }
            )
        )
    print(
        json.dumps(
            {
                "metric": "jvm_speedup_vs_python",
                "value": round(results["python"] / results["jvm"], 2),
                "unit": "x",
            }
        )
    )


if __name__ == "__main__":
    main()
