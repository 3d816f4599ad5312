"""Batch-8: perceptual media near-dup + count-min sketch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lime_etl_spark.plans.registry import get
from tests.oracle import assert_query_matches_oracle


def test_sketch_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "sketch_heavy_hitters")


def test_sketch_never_underestimates_and_bounded(spark, sf_dir):
    """CMS guarantees est >= exact; overestimate is bounded by εN with
    ε = e/w (here generously doubled — the bound is probabilistic)."""
    from lime_etl_spark.operators.profiling import CMS_WIDTH
    from lime_etl_spark.sources.readers import load_table

    rows = get("sketch_heavy_hitters").builder(spark, sf_dir).collect()
    assert rows
    n_total = load_table(spark, sf_dir, "events").count()
    bound = 2 * 2.718 * n_total / CMS_WIDTH
    for r in rows:
        assert r["est_n"] >= r["exact_n"]
        assert r["overestimate"] == r["est_n"] - r["exact_n"]
        assert r["overestimate"] <= bound


def test_image_near_dup_finds_planted_only(spark, sf_dir):
    rows = get("mm_image_near_dup").builder(spark, sf_dir).collect()
    planted = {(r["media_a"], r["media_b"]) for r in rows if r["media_b"] == r["media_a"] + 1_000_000}
    assert len(planted) == 20, "every perturbed copy must pair with its source"
    from lime_etl_spark.operators.multimodal import AHASH_HAMMING_TAU

    assert all(0 <= r["hamming"] <= AHASH_HAMMING_TAU for r in rows)
    # byte-perturbation flips few signature bits; unrelated payloads
    # sit near hamming 32 — no cross pairs at tau
    assert all((a, b) in planted for a, b in ((r["media_a"], r["media_b"]) for r in rows))


def test_ahash_banding_is_pigeonhole_exact(spark):
    """Any two signatures within tau=6 bits MUST share a 16-bit band
    (pigeonhole over 4 bands) — verify the candidate generator loses
    nothing vs brute force on a random signature set."""
    import random

    from lime_etl_spark.operators.multimodal import ahash_near_dup_pairs

    rng = random.Random(7)
    base = [rng.getrandbits(63) for _ in range(40)]
    sigs = base + [s ^ (1 << rng.randrange(60)) ^ (1 << rng.randrange(60)) for s in base[:10]]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(sigs)], "media_id long, ahash long")
    got = {(r["media_a"], r["media_b"]) for r in ahash_near_dup_pairs(df, tau=6).collect()}
    brute = {
        (i, j)
        for i in range(len(sigs))
        for j in range(i + 1, len(sigs))
        if bin(sigs[i] ^ sigs[j]).count("1") <= 6
    }
    assert got == brute


def test_audience_overlap_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "ev_audience_overlap")


def test_audience_overlap_bounds(spark, sf_dir):
    rows = get("ev_audience_overlap").builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_both"] <= min(r["n_a"], r["n_b"])
        assert 0.0 < r["jaccard"] <= 1.0


def test_stream_cms_equals_batch_sketch(spark, sf_dir, tmp_path):
    """Union of per-micro-batch sketches (merged by addition) must
    equal the batch sketch over the same rows — the mergeability
    property that makes sketches THE streaming state at scale."""
    from lime_etl_spark.operators.profiling import CMS_DEPTH, _cms_bucket
    from lime_etl_spark.sources.readers import load_table
    from lime_etl_spark.streaming import read_event_stream, stream_cms_sink

    src = str(tmp_path / "src")
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(src)

    sketch_path = str(tmp_path / "sketch")
    q = stream_cms_sink(
        read_event_stream(spark, src, max_files_per_trigger=1),
        sketch_path,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    got = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in spark.read.parquet(sketch_path).collect()
    }
    batch = (
        spark.read.parquet(src)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(j).alias("j"), _cms_bucket(F.col("user_id"), j).alias("bucket"))
                        for j in range(CMS_DEPTH)
                    ]
                )
            ).alias("v")
        )
        .groupBy("v.j", "v.bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    want = {(r["j"], r["bucket"]): r["cnt"] for r in batch.collect()}
    assert got == want


def test_boilerplate_lines_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "cur_boilerplate_lines")


def test_revenue_deciles_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "q_revenue_deciles")


def test_revenue_deciles_concentration(spark, sf_dir):
    rows = get("q_revenue_deciles").builder(spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    # decile 1 is the top spenders: revenues must be non-increasing
    revs = [r["decile_revenue"] for r in rows]
    assert all(a >= b for a, b in zip(revs, revs[1:]))
    # cumulative is a prefix sum ending at the total
    assert abs(rows[-1]["cumulative_revenue"] - sum(revs)) < 1e-6


def test_boilerplate_grams_are_8_words_and_cross_doc(spark, sf_dir):
    from lime_etl_spark.operators.curation import BOILER_MIN_DOCS

    rows = get("cur_boilerplate_lines").builder(spark, sf_dir).collect()
    for r in rows:
        assert len(r["gram"].split(" ")) == 8
        assert r["n_docs"] >= BOILER_MIN_DOCS
