"""Partition-count invariance: the determinism §3 claims rest on —
decimal-exact aggregation means results are BIT-IDENTICAL whatever
shuffle layout AQE or the cluster picks. This drives the same query
under different spark.sql.shuffle.partitions settings and compares
canonical row forms exactly (floats included: they only exist
post-aggregation)."""

from __future__ import annotations

import pytest

from lime_etl_spark.plans.registry import all_queries
from tests.oracle import canonical_rows

# A float-bearing cross-family sample: money aggs, window ratios,
# cosine pair scores, sessionized rates, percentiles.
INVARIANCE_QUERIES = [
    "q1_pricing_summary",
    "q_revenue_deciles",
    "dedup_embedding_cosine",
    "ev_bounce_rate",
    "q_price_quantiles",
    "ev_cohort_ltv",
    "q_weighted_median_price",
    # round-4 float-bearing additions: exact-integer Pearson/OLS,
    # sqrt-ratio forms, LOO integer decisions, and bridge divisions
    "q_nation_comovement",
    "q_nation_revenue_trend",
    "emb_fisher_ratio",
    "ev_burstiness_profile",
    "ev_hour_anomaly_exact",
    "q_revenue_bridge_yoy",
    "dedup_doc_yield_curve",
    "q_priority_region_independence",
    # round-7 additions (r6 verdict #7): the r6 float emitters —
    # Shapley credits (integer game values / C!·Q), Poisson-bootstrap
    # replicate lifts, minhash-estimator calibration means, and the
    # matryoshka truncation recall curve — re-checked under re-plans.
    "ev_shapley_attribution",
    "ev_lift_bootstrap_ci",
    "dedup_minhash_estimate_error",
    "emb_matryoshka_recall",
    # round-7 float emitters: CUSUM excursion shares, winnowing
    # fingerprint Jaccards, greedy k-center distances (argmax over
    # bitwise-identical doubles), and the 2x2 interaction chi-squares
    "ev_changepoint_cusum",
    "dedup_winnowing_overlap",
    "samp_kcenter_coreset",
    "ev_ab_interaction_check",
    # round-8 float emitters (r7 verdict #7): interpolated bigram-LM
    # bits/token means (per-pair log2 of integer-product ratios), SPRT
    # saved-share divisions, char-entropy grid chains, rich-club phi,
    # Gumbel-key shares, and FLAC compression ratios
    "cur_perplexity_bigram",
    "ev_sprt_gate",
    "txt_entropy_profile",
    "graph_rich_club",
    "samp_gumbel_topk",
    "mm_flac_compression_profile",
    "ev_offpolicy_ips",
    "emb_dim_variance_audit",
    "ev_next_event_entropy",
    "dedup_minhash_bbit",
    "samp_ks_split_drift",
    "q_theil_decomposition",
    # round-9 float emitters: the unigram-LM fertility/profile
    # divisions, hazard ratios, HT relative error, modularity Q
    "txt_unigram_fertility",
    "txt_unigram_segment_profile",
    "ev_hazard_rate",
    "samp_horvitz_thompson",
    "graph_modularity",
]


@pytest.mark.parametrize("name", INVARIANCE_QUERIES)
def test_results_invariant_to_shuffle_partitions(spark, sf_dir, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    builder = all_queries()[name].builder
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = canonical_rows(builder(spark, sf_dir).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = canonical_rows(builder(spark, sf_dir).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b, f"{name}: results differ across shuffle layouts"
