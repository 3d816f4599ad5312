"""Product-quantization ANN: recall against exact L2 top-k, code
compactness, and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lime_etl_spark.operators.pq import (
    PQ_K,
    PQ_M,
    PQ_TOP_K,
    pq_encode,
    pq_fit,
)
from lime_etl_spark.operators.similarity import query_mod
from lime_etl_spark.plans.registry import all_queries
from lime_etl_spark.sources.readers import load_table


def _exact_l2_topk(spark, sf_dir, k):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % query_mod(emb) == 0).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").cast("array<double>").alias("q_vec"),
    )
    v = emb.select(
        F.col("vec_id").alias("n_vec_id"),
        F.col("embedding").cast("array<double>").alias("n_vec"),
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(v)
        .where(F.col("q_vec_id") != F.col("n_vec_id"))
        .select(
            "q_vec_id",
            "n_vec_id",
            F.aggregate(
                F.zip_with(
                    F.col("q_vec"), F.col("n_vec"), lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("sq_dist"),
        )
    )
    w = Window.partitionBy("q_vec_id").orderBy("sq_dist", "n_vec_id")
    return pairs.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def test_pq_recall_vs_exact(spark, sf_dir):
    """ADC shortlist + re-rank must recover most of the exact top-k
    (re-ranked results are exact distances, so every hit is correctly
    ordered; misses can only come from shortlist pruning)."""
    got = (
        all_queries()["ann_pq_topk"].builder(spark, sf_dir).collect()
    )
    exact = _exact_l2_topk(spark, sf_dir, PQ_TOP_K).collect()
    got_pairs = {(r.q_vec_id, r.n_vec_id) for r in got}
    exact_pairs = {(r.q_vec_id, r.n_vec_id) for r in exact}
    assert exact_pairs, "no queries found"
    recall = len(got_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.6, f"recall@{PQ_TOP_K} = {recall}"


def test_pq_codes_compact_and_deterministic(spark, sf_dir):
    # no persist: caching the raw table here would leak into other
    # tests' plans (InMemoryTableScan instead of the parquet scan)
    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_fit(emb)
    assert len(books) == PQ_M
    assert all(len(b) <= PQ_K for b in books)
    enc1 = {r.vec_id: tuple(r.codes) for r in pq_encode(emb, books).collect()}
    enc2 = {r.vec_id: tuple(r.codes) for r in pq_encode(emb, books).collect()}
    assert enc1 == enc2
    assert all(
        len(c) == PQ_M and all(0 <= x < PQ_K for x in c) for c in enc1.values()
    )
    # compression arithmetic: 8 codes × 4 bits vs 64 × float32
    assert (64 * 4 * 8) / (PQ_M * 4) == 64.0


def test_pq_reranked_distances_are_exact(spark, sf_dir):
    """Spot-check: the sq_dist the operator reports equals the exact
    pair distance (re-rank reads raw vectors, not codes)."""
    got = all_queries()["ann_pq_topk"].builder(spark, sf_dir).collect()
    exact = {
        (r.q_vec_id, r.n_vec_id): r.sq_dist
        for r in _exact_l2_topk(spark, sf_dir, 10_000).collect()
    }
    for r in got[:50]:
        assert abs(exact[(r.q_vec_id, r.n_vec_id)] - r.sq_dist) == 0.0
