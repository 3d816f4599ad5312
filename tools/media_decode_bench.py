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


def scale_main(k: int = 16) -> None:
    """The committed data-bound scale leg (r7 verdict #5): both decode
    legs at 1x and at k× the payload volume, MPix/s at each scale, the
    wall-ratio, and the corpus decode gate-rate measured over the
    images PLUS the entropy-A/V payloads a real crawl column carries.
    Emits ONE JSON line to append to SCALE_r{N}.json so the
    decode-throughput claim is reproducible without re-running the
    bench by hand. Run alone (no concurrent Spark jobs)."""
    spark = get_spark(app_name="media-decode-scale", shuffle_partitions=32)
    from lime_etl_spark.functions.jvm_codecs import ensure_jvm_decoder
    from lime_etl_spark.operators.multimodal import build_av_fixture, decode_media

    ensure_jvm_decoder(spark)
    legs = {}
    corpora = {}
    for kk, n in (("k1", 240), (f"k{k}", 240 * k)):
        corpora[kk] = build_corpus(spark, n=n)
    for name, leg in (("jvm", jvm_leg), ("python", python_leg)):
        rec = {}
        for kk, (df, total_px) in corpora.items():
            leg(df)  # warm-up
            runs = 3 if kk == "k1" else 2
            times = []
            for _ in range(runs):
                t0 = time.perf_counter()
                leg(df)
                times.append(time.perf_counter() - t0)
            rec[f"{kk}_sec"] = round(min(times), 3)
            rec[f"mpix_per_sec_{kk}"] = round(total_px / 1e6 / min(times), 2)
        rec["wall_ratio"] = round(rec[f"k{k}_sec"] / rec["k1_sec"], 2)
        legs[name] = rec

    # measured gate-rate over a mixed crawl-like column: the 1x image
    # corpus + the compressed A/V fixture (mp3/mp4/ogg header-only)
    img_df, img_px = corpora["k1"]
    mixed = img_df.unionByName(
        build_av_fixture(spark, n=120).select("media_id", "content")
    )
    dec = decode_media(mixed)
    agg = dec.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(~F.col("sample_decode"), 1).otherwise(0)).alias("gated"),
    ).collect()[0]
    print(
        json.dumps(
            {
                "metric": "scale_leg_media_decode",
                "k": k,
                "images_k1": 240,
                "mpix_k1": round(img_px / 1e6, 2),
                "mpix_k16": round(corpora[f"k{k}"][1] / 1e6, 2),
                "jvm": legs["jvm"],
                "python": legs["python"],
                "jvm_speedup_k1": round(legs["python"]["k1_sec"] / legs["jvm"]["k1_sec"], 2),
                f"jvm_speedup_k{k}": round(
                    legs["python"][f"k{k}_sec"] / legs["jvm"][f"k{k}_sec"], 2
                ),
                "mixed_corpus_rows": int(agg["n"]),
                "gate_rate": round(int(agg["gated"]) / int(agg["n"]), 4),
            }
        )
    )


if __name__ == "__main__":
    if "--scale" in sys.argv:
        scale_main()
    else:
        main()
