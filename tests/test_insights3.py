"""Round-4 batch 1 insights: exact-integer trend/co-movement, vocab
growth, reweight plan, centroid separation, tenure mix — oracle
cross-checks plus the semantic invariants the hash compare can't
express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lime_etl_spark.operators import insights3 as i3
from tests.oracle import assert_query_matches_oracle

NEW_QUERIES = [
    "q_nation_revenue_trend",
    "q_nation_comovement",
    "txt_vocab_growth",
    "samp_reweight_plan",
    "emb_centroid_separation",
    "ev_tenure_mix",
]


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_trend_slope_equals_division_of_exact_terms(spark, sf_dir):
    rows = i3.q_nation_revenue_trend(spark, sf_dir).collect()
    assert len(rows) == 25
    for r in rows:
        if r.slope_den > 0:
            assert r.slope_cents_per_month == r.slope_num / r.slope_den
        else:
            assert r.slope_cents_per_month == 0.0


def test_comovement_r_bounded_and_pairs_canonical(spark, sf_dir):
    rows = i3.q_nation_comovement(spark, sf_dir).collect()
    assert rows, "expected at least one nation pair"
    for r in rows:
        assert -1.0 - 1e-12 <= r.pearson_r <= 1.0 + 1e-12
        assert r.nation_a < r.nation_b  # canonical orientation, no dupes
    # descending by r (the ORDER BY contract the LIMIT depends on)
    rs = [r.pearson_r for r in rows]
    assert rs == sorted(rs, reverse=True)


def test_vocab_growth_conservation_and_monotone_cumsum(spark, sf_dir):
    rows = i3.txt_vocab_growth(spark, sf_dir).collect()
    assert [r.bucket for r in rows] == list(range(1, len(rows) + 1))
    # new_types can never exceed the types seen in the bucket
    assert all(r.new_types <= r.types_in_bucket for r in rows)
    # cum_types is the running sum and ends at the global vocab size
    running = 0
    for r in rows:
        running += r.new_types
        assert r.cum_types == running
    from lime_etl_spark.sources.readers import load_table

    vocab = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .agg(F.count_distinct("t"))
        .collect()[0][0]
    )
    assert rows[-1].cum_types == vocab
    # bucket 1 invents its entire vocabulary
    assert rows[0].new_types == rows[0].types_in_bucket


def test_reweight_mass_conservation(spark, sf_dir):
    rows = i3.samp_reweight_plan(spark, sf_dir).collect()
    n_total = sum(r.n_docs for r in rows)
    assert sum(r.target_permille for r in rows) == 1000
    # sum n_s * w_s == N (structural mass conservation)
    mass = sum(r.n_docs * r.weight for r in rows)
    assert mass == pytest.approx(n_total, rel=1e-12)
    assert sum(r.expected_docs for r in rows) == pytest.approx(n_total, rel=1e-12)
    boosted = {r.source: r for r in rows if r.source in i3.REWEIGHT_BOOSTED}
    assert all(r.target_permille == i3.REWEIGHT_BOOST_PM for r in boosted.values())


def test_centroid_separation_full_matrix_and_self_norms(spark, sf_dir):
    rows = i3.emb_centroid_separation(spark, sf_dir).collect()
    labels = sorted({r.label_a for r in rows} | {r.label_b for r in rows})
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2  # every unordered pair exactly once
    for r in rows:
        assert -1.0 - 1e-12 <= r.cosine <= 1.0 + 1e-12


def test_tenure_mix_partitions_weekly_actives(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.ev_tenure_mix(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    weekly = {
        r.week_start: r.n
        for r in ev.groupBy(
            F.date_trunc("week", "ts").cast("date").alias("week_start")
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    by_week: dict = {}
    for r in rows:
        by_week.setdefault(r.week_start, []).append(r)
    for wk, rs in by_week.items():
        # buckets partition the weekly actives: counts sum to the
        # week's distinct users and shares sum to 1
        assert sum(r.users for r in rs) == weekly[wk]
        assert sum(r.share for r in rs) == pytest.approx(1.0, rel=1e-12)
        assert len({r.tenure_bucket for r in rs}) == len(rs)


BATCH_B = [
    "q_backlog_aging",
    "q_discount_bands",
    "ev_active_days_hist",
    "emb_class_scatter",
    "pack_attention_waste",
]


@pytest.mark.parametrize("name", BATCH_B)
def test_batch_b_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_backlog_covers_exactly_open_orders(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.q_backlog_aging(spark, sf_dir).collect()
    n_open = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus").isin("O", "P"))
        .count()
    )
    assert sum(r.n_orders for r in rows) == n_open
    assert all(r.open_value > 0 for r in rows)


def test_discount_bands_conserve_lines(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.q_discount_bands(spark, sf_dir).collect()
    assert sum(r.n_lines for r in rows) == load_table(
        spark, sf_dir, "lineitem"
    ).count()
    for r in rows:
        assert 0 <= r.discount_pct <= 100
        assert r.avg_qty_per_line == r.total_qty / r.n_lines


def test_active_days_hist_shares_sum_to_one(spark, sf_dir):
    rows = i3.ev_active_days_hist(spark, sf_dir).collect()
    assert sum(r.user_share for r in rows) == pytest.approx(1.0, rel=1e-12)
    assert all(r.active_days >= 1 for r in rows)


def test_class_scatter_nonnegative_and_bounded(spark, sf_dir):
    rows = i3.emb_class_scatter(spark, sf_dir).collect()
    for r in rows:
        # Σ||x-μ||² ≥ 0, and ≤ Σ||x||² (mean removal can't add energy)
        assert -1e-9 <= r.scatter <= r.total_norm_sq
        assert r.centroid_num_sq <= r.n_vecs * r.total_norm_sq  # Cauchy-Schwarz


def test_attention_waste_consistent_with_pack_sequences(spark, sf_dir):
    from lime_etl_spark.operators.training import pack_sequences

    waste = {r.lang: r for r in i3.pack_attention_waste(spark, sf_dir).collect()}
    packs = pack_sequences(spark, sf_dir).collect()
    by_lang: dict = {}
    for p in packs:
        by_lang[p.lang] = by_lang.get(p.lang, 0) + 1
    # same placement ⇒ same pack counts per lang
    assert {k: v.n_packs for k, v in waste.items()} == by_lang
    for r in waste.values():
        assert 0.0 <= r.cross_doc_frac < 1.0
        assert r.cross_doc_pairs <= r.total_attn_pairs


BATCH_C = [
    "ev_type_affinity",
    "emb_covariance_topk",
    "graph_component_size_hist",
]


@pytest.mark.parametrize("name", BATCH_C)
def test_batch_c_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_type_affinity_lift_identity(spark, sf_dir):
    rows = i3.ev_type_affinity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b
        assert r.n_both <= min(r.n_sessions_a, r.n_sessions_b)
        assert r.lift > 0
    spark.catalog.clearCache()


def test_covariance_topk_corr_bounded_upper_triangle(spark, sf_dir):
    rows = i3.emb_covariance_topk(spark, sf_dir).collect()
    assert len(rows) == i3.COV_TOP_K
    for r in rows:
        assert r.dim_i < r.dim_j
        assert -1.0 - 1e-12 <= r.corr <= 1.0 + 1e-12
    # ordered by |corr| descending
    mags = [abs(r.corr) for r in rows]
    assert mags == sorted(mags, reverse=True)
    spark.catalog.clearCache()


def test_pca_matches_numpy_eigensolve(spark, sf_dir):
    """Power iteration on the exact scatter matrix must land on the
    numpy principal eigenvector of the SAME quantized data (up to
    sign, which the operator canonicalizes)."""
    np = pytest.importorskip("numpy")
    from lime_etl_spark.sources.readers import load_table

    pdf = i3.emb_pca_top_component(spark, sf_dir).toPandas()
    assert list(pdf.pos) == list(range(len(pdf)))
    v = pdf.loading.to_numpy()
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-9

    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    X = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    s = np.abs(X).max() / 127
    Q = np.clip(np.floor(X / s + 0.5), -127, 127)
    n = Q.shape[0]
    S = n * (Q.T @ Q) - np.outer(Q.sum(axis=0), Q.sum(axis=0))
    w, V = np.linalg.eigh(S)
    top = V[:, -1]
    if top[np.argmax(np.abs(top))] < 0:
        top = -top
    cos = float(abs(np.dot(v, top)))
    assert cos > 0.999, cos
    assert float(pdf.eigenvalue_cov[0]) == pytest.approx(
        float(w[-1]) / (n * n), rel=1e-6
    )
    spark.catalog.clearCache()


def test_component_size_hist_conserves_docs(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.graph_component_size_hist(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.n_docs == r.size * r.n_components
    spark.catalog.clearCache()


BATCH_D = [
    "ev_time_to_nth_purchase",
    "samp_quota_waterfall",
    "cur_dedup_vocab_loss",
    "dedup_similarity_hist",
]


@pytest.mark.parametrize("name", BATCH_D)
def test_batch_d_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_nth_purchase_monotone_and_shrinking(spark, sf_dir):
    rows = i3.ev_time_to_nth_purchase(spark, sf_dir).collect()
    assert [r.nth for r in rows] == sorted(r.nth for r in rows)
    for r in rows:
        assert 0 <= r.p50_days <= r.p90_days <= r.max_days
    # fewer users reach higher n (weakly monotone funnel)
    counts = [r.n_users for r in rows]
    assert counts == sorted(counts, reverse=True)
    spark.catalog.clearCache()


def test_quota_waterfall_caps_and_conservation(spark, sf_dir):
    rows = i3.samp_quota_waterfall(spark, sf_dir).collect()
    total_target = sum(r.target_docs for r in rows)
    total_final = sum(r.final_quota for r in rows)
    for r in rows:
        assert r.final_quota <= r.n_docs  # cap respected
        assert r.base_quota == min(r.n_docs, r.target_docs)
        assert r.spill_in >= 0
    # the waterfall can only close the gap, never overshoot targets
    total_base = sum(r.base_quota for r in rows)
    assert total_base <= total_final <= total_target
    # spill actually activated on this data (boosted sources overflow)
    assert any(r.spill_in > 0 for r in rows)
    spark.catalog.clearCache()


def test_vocab_loss_bounds(spark, sf_dir):
    rows = i3.cur_dedup_vocab_loss(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.vocab_kept <= r.vocab_full
        assert r.vocab_lost == r.vocab_full - r.vocab_kept
        assert 0.0 <= r.loss_rate < 1.0
    spark.catalog.clearCache()


def test_similarity_hist_covers_all_candidates(spark, sf_dir):
    from lime_etl_spark.operators.dedup import (
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )
    from lime_etl_spark.sources.readers import load_table

    rows = i3.dedup_similarity_hist(spark, sf_dir).collect()
    sh = doc_shingles(load_table(spark, sf_dir, "documents"))
    n_pairs = jaccard_pairs(
        sh, candidates=lsh_candidates(minhash_signatures(sh))
    ).count()
    assert sum(r.n_pairs for r in rows) == n_pairs
    for r in rows:
        assert 0 <= r.sim_bucket <= 9
        assert r.min_jaccard <= r.max_jaccard
        # bucket bounds hold (bucket 9 also holds jaccard == 1.0)
        assert r.min_jaccard >= r.sim_bucket / 10 - 1e-12
        hi = 1.0 if r.sim_bucket == 9 else (r.sim_bucket + 1) / 10
        assert r.max_jaccard <= hi + 1e-12
    spark.catalog.clearCache()


BATCH_E = [
    "dq_linenumber_gaps",
    "ev_burstiness_profile",
    "emb_label_outliers",
    "q_returns_by_discount",
]


@pytest.mark.parametrize("name", BATCH_E)
def test_batch_e_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_linenumber_classes_partition_orders(spark, sf_dir):
    r = i3.dq_linenumber_gaps(spark, sf_dir).collect()[0]
    # dup-numbered orders are counted once; gapped/contiguous split the rest
    assert r.n_dup_linenumbers + r.n_gapped + r.n_contiguous >= r.n_orders
    assert r.n_contiguous <= r.n_orders


def test_burstiness_buckets_bounded(spark, sf_dir):
    rows = i3.ev_burstiness_profile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.b_bucket <= 9
        assert r.n_users > 0


def test_label_outliers_rank_is_exact_integer_order(spark, sf_dir):
    rows = i3.emb_label_outliers(spark, sf_dir).collect()
    assert len(rows) == i3.OUTLIER_TOP_K
    nums = [r.dist_num for r in rows]
    assert nums == sorted(nums, reverse=True)
    for r in rows:
        assert r.dist_num >= 0
        assert r.dist_sq >= 0
    spark.catalog.clearCache()


def test_returns_by_discount_conserves_lines(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.q_returns_by_discount(spark, sf_dir).collect()
    assert sum(r.n_lines for r in rows) == load_table(
        spark, sf_dir, "lineitem"
    ).count()
    for r in rows:
        assert 0 <= r.n_returned <= r.n_lines
        assert r.return_rate == r.n_returned / r.n_lines


BATCH_F = [
    "ev_transition_latency",
    "dedup_cross_source_matrix",
    "q_ship_delay_trend",
]


@pytest.mark.parametrize("name", BATCH_F)
def test_batch_f_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_transition_latency_agrees_with_markov_counts(spark, sf_dir):
    """Same window, same transitions: the latency matrix's counts must
    sum to exactly (total events - users with events)."""
    from lime_etl_spark.sources.readers import load_table

    rows = i3.ev_transition_latency(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_transitions for r in rows) == n_events - n_users
    for r in rows:
        assert 0 <= r.p50_s <= r.p90_s


def test_cross_source_matrix_canonical_and_consistent(spark, sf_dir):
    from lime_etl_spark.operators.dedup import dedup_minhash_lsh

    rows = i3.dedup_cross_source_matrix(spark, sf_dir).collect()
    total = dedup_minhash_lsh(spark, sf_dir).count()
    assert sum(r.n_pairs for r in rows) == total
    for r in rows:
        assert r.source_x <= r.source_y
        if r.source_x == r.source_y:
            assert r.n_within == r.n_pairs  # diagonal cells are all within
        else:
            assert r.n_within == 0
    spark.catalog.clearCache()


def test_ship_delay_trend_division_identity(spark, sf_dir):
    r = i3.q_ship_delay_trend(spark, sf_dir).collect()[0]
    assert r.n_lines > 0
    if r.slope_den > 0:
        assert r.slope_days_per_month == r.slope_num / r.slope_den
    spark.catalog.clearCache()


BATCH_G = [
    "cur_gate_rule_matrix",
    "ev_hour_anomaly_exact",
]


@pytest.mark.parametrize("name", BATCH_G)
def test_batch_g_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_gate_matrix_consistent_with_gate_verdicts(spark, sf_dir):
    """killed_any must equal the gate's non-keep doc count, and each
    rule's fires decompose into unique + overlaps."""
    from lime_etl_spark.plans.registry import all_queries

    m = i3.cur_gate_rule_matrix(spark, sf_dir).collect()[0]
    gate = {
        r.verdict: r.n_docs
        for r in all_queries()["cur_quality_gate"].builder(spark, sf_dir).collect()
    }
    dropped = sum(n for v, n in gate.items() if v != "keep")
    assert m.killed_any == dropped
    # short and long are mutually exclusive by construction
    assert m.both_short_long == 0
    assert m.unique_short == m.fires_short - m.both_short_rep
    assert m.unique_long == m.fires_long - m.both_long_rep


def test_hour_anomaly_fires_on_planted_spike(spark, tmp_path):
    """5 Mondays with a flat 10 events at hour 9; the 5th Monday gets
    60 instead — the leave-one-out integer decision must flag exactly
    that hour, direction high (its LOO baseline is flat 10s)."""
    import datetime as dt

    rows = []
    eid = 0
    mondays = [dt.datetime(2024, 1, d, 9, 0, 0) for d in (1, 8, 15, 22, 29)]
    for wk, base in enumerate(mondays):
        n = 60 if wk == 4 else 10
        for i in range(n):
            eid += 1
            rows.append((eid, base + dt.timedelta(seconds=i), 1, "view", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "sf")
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = i3.ev_hour_anomaly_exact(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.d, r.h, r.c, r.direction) == (dt.date(2024, 1, 29), 9, 60, "high")
    assert r.n_weeks == 5
    assert r.baseline_mean == pytest.approx(10.0)  # LOO mean excludes the spike


BATCH_H = [
    "txt_langid_margin",
    "q_priority_region_independence",
    "ev_resurrection_gaps",
]


@pytest.mark.parametrize("name", BATCH_H)
def test_batch_h_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_langid_margin_shortlist_is_ambiguous_subset(spark, sf_dir):
    rows = i3.txt_langid_margin(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.margin <= i3.LANGID_MARGIN_MAX
        assert r.top_hits >= 0
    margins = [r.margin for r in rows]
    assert margins == sorted(margins)


def test_independence_residuals_identities(spark, sf_dir):
    rows = i3.q_priority_region_independence(spark, sf_dir).collect()
    assert len(rows) == 25  # 5 regions x 5 priorities
    # residual numerators sum to zero over the full table (marginal identity)
    assert sum(r.resid_num for r in rows) == 0
    n_total = sum(r.n_obs for r in rows)
    for r in rows:
        assert r.expected > 0
        # sign of the float residual agrees with the exact numerator
        if r.resid_num != 0:
            assert (r.pearson_resid > 0) == (r.resid_num > 0)
    assert sum(r.n_obs for r in rows) == n_total
    spark.catalog.clearCache()


def test_resurrection_gaps_bounded_by_window(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.ev_resurrection_gaps(spark, sf_dir).collect()
    assert rows, "expected some multi-day absences"
    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts")))
    ).collect()[0][0]
    for r in rows:
        assert 2 <= r.gap_days <= span
        assert r.n_users <= r.n_returns


BATCH_I = [
    "q_realized_discount_by_year",
    "txt_head_coverage",
    "q_monthly_whale_share",
    "cur_rep_length_bias",
]


@pytest.mark.parametrize("name", BATCH_I)
def test_batch_i_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_realized_rate_within_discount_domain(spark, sf_dir):
    rows = i3.q_realized_discount_by_year(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.realized_rate <= 0.10 + 1e-12  # discounts are 0..10%
        assert r.discount_amt <= r.gross


def test_head_coverage_monotone_in_k(spark, sf_dir):
    rows = i3.txt_head_coverage(spark, sf_dir).collect()
    assert [r.k for r in rows] == sorted(i3.HEAD_KS)
    covs = [r.coverage for r in rows]
    assert covs == sorted(covs)  # more head types can only cover more
    for r in rows:
        assert 0.0 < r.coverage <= 1.0
        # k >= n_types means full coverage
        if r.k >= r.n_types:
            assert r.head_tokens == r.n_tokens
    spark.catalog.clearCache()


def test_whale_share_bounds(spark, sf_dir):
    rows = i3.q_monthly_whale_share(spark, sf_dir).collect()
    for r in rows:
        # one order's share is at least 1/n and at most 1
        assert 1.0 / r.n_orders - 1e-12 <= r.whale_share <= 1.0 + 1e-12
        assert r.max_order <= r.total_value


def test_rep_length_bias_consistency(spark, sf_dir):
    r = i3.cur_rep_length_bias(spark, sf_dir).collect()[0]
    if r.n_multi_clusters:
        assert r.rep_is_longest + r.rep_is_shortest <= 2 * r.n_multi_clusters
        assert r.total_rep_chars <= r.total_best_chars
        assert 0.0 < r.rep_vs_best_ratio <= 1.0
    spark.catalog.clearCache()


BATCH_J = [
    "ann_bucket_balance",
    "ann_probe_cost",
]


@pytest.mark.parametrize("name", BATCH_J)
def test_batch_j_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_bucket_balance_conserves_vectors(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.ann_bucket_balance(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n
    assert sum(r.share for r in rows) == pytest.approx(1.0, rel=1e-9)
    assert all(0 <= r.bucket <= 255 for r in rows)


def test_probe_cost_ordering_and_consistency(spark, sf_dir):
    """Cost model must agree with the actual candidate counts the IVF
    operators generate: self-probe pairs == the ivf self-join size."""
    from lime_etl_spark.sources.readers import load_table
    from lime_etl_spark.operators.similarity import ivf_bucket

    rows = {r.strategy: r for r in i3.ann_probe_cost(spark, sf_dir).collect()}
    assert set(rows) == {"self", "self_hamming1", "brute"}
    assert (
        rows["self"].candidate_pairs
        <= rows["self_hamming1"].candidate_pairs
        <= rows["brute"].candidate_pairs
    )
    assert rows["brute"].scan_fraction == 1.0
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", ivf_bucket(F.col("embedding")).alias("bucket")
    )
    a, b = emb.alias("a"), emb.alias("b")
    actual_self = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).count()
    assert rows["self"].candidate_pairs == actual_self
    spark.catalog.clearCache()


BATCH_K = [
    "q_supplier_delay_scorecard",
    "q_aov_trend",
    "samp_split_balance",
]


@pytest.mark.parametrize("name", BATCH_K)
def test_batch_k_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_delay_scorecard_ordered_and_gated(spark, sf_dir):
    rows = i3.q_supplier_delay_scorecard(spark, sf_dir).collect()
    assert rows
    p90s = [r.p90_delay for r in rows]
    assert p90s == sorted(p90s, reverse=True)
    for r in rows:
        assert r.n_lines >= i3.DELAY_MIN_LINES
        assert r.p50_delay <= r.p90_delay <= r.max_delay


def test_aov_trend_delta_is_difference_of_reported_aovs(spark, sf_dir):
    rows = i3.q_aov_trend(spark, sf_dir).collect()
    assert rows[0].aov_mom_delta is None  # first month has no predecessor
    for prev, cur in zip(rows, rows[1:]):
        assert cur.aov_mom_delta == cur.aov - prev.aov
        assert cur.aov == cur.revenue / cur.n_orders


def test_split_balance_matches_hash_split_and_sums_zero(spark, sf_dir):
    from lime_etl_spark.plans.registry import all_queries

    rows = i3.samp_split_balance(spark, sf_dir).collect()
    # cells must be exactly the samp_hash_split table (same expression)
    split_rows = {
        (r.lang, r.split): r.n_docs
        for r in all_queries()["samp_hash_split"].builder(spark, sf_dir).collect()
    }
    for r in rows:
        assert split_rows[(r.lang, r.split)] == r.n_obs
    assert sum(r.resid_num for r in rows) == 0
    spark.catalog.clearCache()


BATCH_L = [
    "txt_rare_token_docs",
    "ev_conversion_by_depth",
    "ev_peakiness_by_weekday",
]


@pytest.mark.parametrize("name", BATCH_L)
def test_batch_l_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_rare_token_docs_shortlist_sane(spark, sf_dir):
    rows = i3.txt_rare_token_docs(spark, sf_dir).collect()
    assert rows, "relative rarity must produce a shortlist on any corpus"
    counts = [r.n_rare for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 0 < r.n_rare <= r.n_tokens
        assert r.rare_ratio == r.n_rare / r.n_tokens
    spark.catalog.clearCache()


def test_conversion_by_depth_consistent_with_sessions(spark, sf_dir):
    from lime_etl_spark.operators.events import sessionize
    from lime_etl_spark.sources.readers import load_table

    rows = i3.ev_conversion_by_depth(spark, sf_dir).collect()
    n_sessions = (
        sessionize(load_table(spark, sf_dir, "events"))
        .select("user_id", "session_seq")
        .distinct()
        .count()
    )
    assert sum(r.n_sessions for r in rows) == n_sessions
    for r in rows:
        assert 0 <= r.n_converted <= r.n_sessions
        assert 1 <= r.depth_bucket <= 10


def test_peakiness_ratio_at_least_one(spark, sf_dir):
    rows = i3.ev_peakiness_by_weekday(spark, sf_dir).collect()
    assert len(rows) == 7
    for r in rows:
        assert r.trough_avg <= r.peak_avg
        assert r.peak_trough_ratio >= 1.0


BATCH_M = [
    "q_reorder_cadence_by_segment",
    "q_customer_acquisition_curve",
]


@pytest.mark.parametrize("name", BATCH_M)
def test_batch_m_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_reorder_cadence_gap_count_identity(spark, sf_dir):
    """Sum of gaps = orders - customers-with-orders (one gap per
    consecutive pair), and percentiles are ordered."""
    from lime_etl_spark.sources.readers import load_table

    rows = i3.q_reorder_cadence_by_segment(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    n_orders = orders.count()
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r.n_gaps for r in rows) == n_orders - n_cust
    for r in rows:
        assert 0 <= r.p50_days <= r.p90_days


def test_acquisition_curve_cumulative_ends_at_customer_count(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.q_customer_acquisition_curve(spark, sf_dir).collect()
    n_active_cust = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    by_region: dict = {}
    for r in rows:
        by_region.setdefault(r.r_name, []).append(r)
    final_total = 0
    for rs in by_region.values():
        running = 0
        for r in rs:  # already ordered by month within region
            running += r.new_customers
            assert r.cum_customers == running
        final_total += rs[-1].cum_customers
    assert final_total == n_active_cust


def test_lateral_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "q_lateral_top_orders")
    spark.catalog.clearCache()


def test_lateral_row_identical_to_window_form(spark, sf_dir):
    """Catalyst decorrelates the LATERAL; the result must equal the
    idiomatic window top-3 exactly."""
    from pyspark.sql.window import Window
    from lime_etl_spark.sources.readers import load_table

    lat = i3.q_lateral_top_orders(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(
        F.desc("o_totalprice_d"), "o_orderkey"
    )
    win = (
        orders.where(F.col("o_custkey") % i3.LATERAL_CUST_MOD == 0)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias(
                "o_totalprice_d"
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "c_custkey", "o_orderkey", F.col("o_totalprice_d").alias("o_totalprice")
        )
    )
    a = {tuple(r) for r in lat.collect()}
    b = {tuple(r) for r in win.collect()}
    assert a == b
    spark.catalog.clearCache()


def test_observe_dq_counts_without_second_scan(spark, sf_dir):
    """In-flight DQ counters: one action yields both the data and the
    metrics, and the metrics match a direct audit."""
    from lime_etl_spark.operators.maintenance import observe_dq
    from lime_etl_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    observed, obs = observe_dq(
        orders, name="orders_dq", money_col="o_totalprice", key_col="o_custkey"
    )
    n = observed.count()  # the ONE action
    got = obs.get
    assert got["n_rows"] == n
    assert got["n_null_keys"] == 0
    assert got["n_negative_money"] == 0
    # metrics agree with an explicit audit pass
    audit = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("nk"),
    ).collect()[0]
    assert (audit.n, audit.nk) == (got["n_rows"], got["n_null_keys"])


BATCH_O = [
    "ev_habitual_users",
    "emb_fisher_ratio",
    "ev_first_session_vs_rest",
]


@pytest.mark.parametrize("name", BATCH_O)
def test_batch_o_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_habitual_users_conserve_users_and_events(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.ev_habitual_users(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert sum(r.n_users for r in rows) == ev.select("user_id").distinct().count()
    assert sum(r.n_events for r in rows) == ev.count()
    # modal-hour share is at least 1/24, so buckets 0 is impossible
    assert all(0 < r.habit_bucket <= 9 or r.habit_bucket == 0 for r in rows)


def test_fisher_ratio_positive_and_complete(spark, sf_dir):
    rows = i3.emb_fisher_ratio(spark, sf_dir).collect()
    labels = sorted({r.label_a for r in rows} | {r.label_b for r in rows})
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2
    ratios = [r.fisher_ratio for r in rows]
    assert ratios == sorted(ratios)  # ascending: most-confusable first
    for r in rows:
        assert r.between_sq >= 0 and r.within_sq > 0
        assert r.fisher_ratio == r.between_sq / r.within_sq
    spark.catalog.clearCache()


def test_first_vs_rest_consistent_with_depth_curve(spark, sf_dir):
    rows = {r.cohort: r for r in i3.ev_first_session_vs_rest(spark, sf_dir).collect()}
    assert set(rows) == {"first", "rest"}
    depth_rows = i3.ev_conversion_by_depth(spark, sf_dir).collect()
    # both views partition the same session universe
    assert rows["first"].n_sessions + rows["rest"].n_sessions == sum(
        r.n_sessions for r in depth_rows
    )
    for r in rows.values():
        assert r.avg_depth >= 1.0
        assert 0.0 <= r.conversion_rate <= 1.0
    spark.catalog.clearCache()


BATCH_P = [
    "txt_source_lang_purity",
    "pack_oversize_docs",
    "emb_exact_duplicates",
]


@pytest.mark.parametrize("name", BATCH_P)
def test_batch_p_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_lang_purity_bounds(spark, sf_dir):
    rows = i3.txt_source_lang_purity(spark, sf_dir).collect()
    for r in rows:
        assert 1.0 / r.n_langs - 1e-12 <= r.purity <= 1.0
        assert r.dominant_docs <= r.n_docs


def test_oversize_consistent_with_context_fit_inputs(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table
    from lime_etl_spark.operators.text import BPE_RE
    from lime_etl_spark.operators.training import PACK_BUDGET

    rows = i3.pack_oversize_docs(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    direct = (
        docs.where(F.regexp_count("text", F.lit(BPE_RE)) > PACK_BUDGET).count()
    )
    assert sum(r.n_oversize for r in rows) == direct
    for r in rows:
        assert 0.0 <= r.oversize_share <= 1.0
        if r.n_oversize == 0:
            assert r.overflow_tokens == 0


def test_exact_duplicates_accounting(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    r = i3.emb_exact_duplicates(spark, sf_dir).collect()[0]
    n = load_table(spark, sf_dir, "embeddings").count()
    # groups partition the vectors: sum(group_size) == N, so
    # collapse_rate == (N - n_groups) / N
    assert r.collapse_rate == pytest.approx((n - r.n_groups) / n, rel=1e-12)
    assert r.n_dup_vectors >= 2 * r.n_dup_groups or r.n_dup_groups == 0
    assert r.max_group >= 1
    spark.catalog.clearCache()


BATCH_Q = [
    "q_revenue_bridge_yoy",
    "samp_effective_epochs",
]


@pytest.mark.parametrize("name", BATCH_Q)
def test_batch_q_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_revenue_bridge_identity(spark, sf_dir):
    """volume + price effects must reconstruct the exact delta (the
    bridge identity, exact in the rationals, float-tight here)."""
    rows = i3.q_revenue_bridge_yoy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.delta_cents == r.r1 - r.r0
        assert r.volume_effect_cents + r.price_effect_cents == pytest.approx(
            float(r.delta_cents), rel=1e-9, abs=1e-6
        )


def test_effective_epochs_flag_consistent(spark, sf_dir):
    rows = i3.samp_effective_epochs(spark, sf_dir).collect()
    assert sum(r.target_permille for r in rows) == 1000
    for r in rows:
        assert r.effective_epochs > 0
        assert r.over_cap == (r.effective_epochs > i3.EPOCH_MEMORIZATION_CAP)


def test_steps_to_convert_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "ev_steps_to_convert")
    spark.catalog.clearCache()


def test_steps_to_convert_covers_early_converters(spark, sf_dir):
    """Users whose first event IS the purchase have zero prior steps
    and are absent; everyone counted has >= 1 step and appears once."""
    rows = i3.ev_steps_to_convert(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.steps_bucket <= 9
        assert 1 <= r.min_steps <= r.max_steps


BATCH_S = [
    "ev_session_pace",
    "dedup_pair_id_distance",
]


@pytest.mark.parametrize("name", BATCH_S)
def test_batch_s_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_session_pace_conserves_sessions(spark, sf_dir):
    from lime_etl_spark.operators.events import sessionize
    from lime_etl_spark.sources.readers import load_table

    rows = i3.ev_session_pace(spark, sf_dir).collect()
    n_sessions = (
        sessionize(load_table(spark, sf_dir, "events"))
        .select("user_id", "session_seq")
        .distinct()
        .count()
    )
    assert sum(r.n_sessions for r in rows) == n_sessions


def test_pair_id_distance_conserves_pairs(spark, sf_dir):
    from lime_etl_spark.operators.dedup import dedup_minhash_lsh

    rows = i3.dedup_pair_id_distance(spark, sf_dir).collect()
    assert sum(r.n_pairs for r in rows) == dedup_minhash_lsh(spark, sf_dir).count()
    for r in rows:
        assert 1 <= r.min_gap <= r.max_gap
    spark.catalog.clearCache()


def test_window_pass_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "dedup_window_pass")
    spark.catalog.clearCache()


def test_window_pass_equals_exhaustive_within_window(spark, sf_dir):
    """The window pass must EXACTLY equal the exhaustive all-pairs
    detector restricted to id distance <= W — exhaustive inside the
    window, nothing invented outside it."""
    from lime_etl_spark.operators.dedup import (
        JACCARD_TAU,
        doc_shingles,
        jaccard_pairs,
    )
    from lime_etl_spark.sources.readers import load_table

    sh = doc_shingles(load_table(spark, sf_dir, "documents"))
    exhaustive = (
        jaccard_pairs(sh)  # no candidates: all shared-shingle pairs
        .where(F.col("jaccard") >= JACCARD_TAU)
        .where(F.col("doc_b") - F.col("doc_a") <= i3.WINDOW_DEDUP_W)
    )
    win = i3.dedup_window_pass(spark, sf_dir)
    a = {(r.doc_a, r.doc_b, r.jaccard) for r in win.collect()}
    b = {(r.doc_a, r.doc_b, r.jaccard) for r in exhaustive.collect()}
    assert a == b
    spark.catalog.clearCache()


BATCH_U = [
    "emb_ingest_drift",
    "dedup_doc_yield_curve",
]


@pytest.mark.parametrize("name", BATCH_U)
def test_batch_u_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_ingest_drift_conserves_vectors_and_mass(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.emb_ingest_drift(spark, sf_dir).collect()
    assert [r.bucket for r in rows] == list(range(1, len(rows) + 1))
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n
    for r in rows:
        assert r.sum_norm_sq >= 0
        assert r.mean_norm_sq == r.sum_norm_sq / r.n_vecs
    spark.catalog.clearCache()


def test_yield_curve_counts_docs_once(spark, sf_dir):
    """Each doc appears in exactly one bucket (its best similarity),
    so doc totals can never exceed candidates' doc_b count."""
    from lime_etl_spark.operators.dedup import (
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )
    from lime_etl_spark.sources.readers import load_table

    rows = i3.dedup_doc_yield_curve(spark, sf_dir).collect()
    sh = doc_shingles(load_table(spark, sf_dir, "documents"))
    n_docs_with_cand = (
        jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh)))
        .select("doc_b")
        .distinct()
        .count()
    )
    assert sum(r.n_docs for r in rows) == n_docs_with_cand
    spark.catalog.clearCache()


def test_value_by_depth_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "ev_value_by_depth")
    spark.catalog.clearCache()


def test_value_by_depth_agrees_with_conversion_curve(spark, sf_dir):
    """Same session universe, same buckets: a bucket with zero
    conversions must have zero revenue and vice versa is not required
    (conversions can be zero-value), but session counts must match."""
    v = {r.depth_bucket: r for r in i3.ev_value_by_depth(spark, sf_dir).collect()}
    c = {r.depth_bucket: r for r in i3.ev_conversion_by_depth(spark, sf_dir).collect()}
    assert set(v) == set(c)
    for b in v:
        assert v[b].n_sessions == c[b].n_sessions
        if c[b].n_converted == 0:
            assert v[b].rev_cents == 0
    spark.catalog.clearCache()


BATCH_W = [
    "dq_empty_days",
    "pack_shard_balance",
]


@pytest.mark.parametrize("name", BATCH_W)
def test_batch_w_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_empty_days_finds_planted_gap(spark, tmp_path):
    """Three active days with the middle one missing: the spine
    anti-join must surface exactly that day."""
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 3, d, 12, 0, 0), 1, "view", 1.0, "{}")
        for i, d in enumerate([1, 1, 3, 3], start=1)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "sf")
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = i3.dq_empty_days(spark, d).collect()
    assert [r.missing_day for r in out] == [dt.date(2024, 3, 2)]


def test_shard_balance_conserves_tokens(spark, sf_dir):
    from lime_etl_spark.operators.text import BPE_RE
    from lime_etl_spark.sources.readers import load_table

    rows = i3.pack_shard_balance(spark, sf_dir).collect()
    total = (
        load_table(spark, sf_dir, "documents")
        .select(F.regexp_count("text", F.lit(BPE_RE)).alias("t"))
        .agg(F.sum("t"))
        .collect()[0][0]
    )
    assert sum(r.total_tokens for r in rows) == total
    for r in rows:
        assert r.min_shard_tokens <= r.max_shard_tokens
        assert r.skew_ratio >= 1.0


BATCH_X = [
    "q_supplier_credit_exposure",
    "q_split_shipment_profile",
]


@pytest.mark.parametrize("name", BATCH_X)
def test_batch_x_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_credit_exposure_covers_all_risky_suppliers(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.q_supplier_credit_exposure(spark, sf_dir).collect()
    n_risky = (
        load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).count()
    )
    assert len(rows) == n_risky  # LEFT semantics: zero-exposure rows stay
    for r in rows:
        assert r.acctbal < 0
        assert r.open_exposure >= 0


def test_split_shipment_counts_multiline_orders(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.q_split_shipment_profile(spark, sf_dir).collect()
    multi = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .count()
        .where(F.col("count") >= 2)
        .count()
    )
    assert sum(r.n_orders for r in rows) == multi


BATCH_Y = [
    "q_priority_sla_audit",
    "cur_gate_sensitivity",
]


@pytest.mark.parametrize("name", BATCH_Y)
def test_batch_y_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_priority_sla_covers_all_lines(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.q_priority_sla_audit(spark, sf_dir).collect()
    assert len(rows) == 5
    assert sum(r.n_lines for r in rows) == load_table(
        spark, sf_dir, "lineitem"
    ).count()
    for r in rows:
        assert r.p50_delay <= r.p90_delay
        assert r.late_rate == r.n_late / r.n_lines


def test_gate_sensitivity_monotone_and_anchored(spark, sf_dir):
    """Kill counts are monotone in the threshold, and the production
    MIN_WORDS row must agree with the gate's own verdict counts."""
    from lime_etl_spark.operators.curation import MIN_WORDS
    from lime_etl_spark.plans.registry import all_queries

    rows = i3.cur_gate_sensitivity(spark, sf_dir).collect()
    kills = [r.n_killed for r in rows]
    assert kills == sorted(kills)
    if MIN_WORDS in {r.threshold for r in rows}:
        at_prod = next(r for r in rows if r.threshold == MIN_WORDS)
        gate = {
            r.verdict: r.n_docs
            for r in all_queries()["cur_quality_gate"]
            .builder(spark, sf_dir)
            .collect()
        }
        assert at_prod.n_killed == gate.get("too_short", 0)
    spark.catalog.clearCache()


BATCH_Z = [
    "ev_type_mix_by_tenure",
    "q_winback_customers",
]


@pytest.mark.parametrize("name", BATCH_Z)
def test_batch_z_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_type_mix_by_tenure_conserves_events(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.ev_type_mix_by_tenure(spark, sf_dir).collect()
    assert sum(r.n_events for r in rows) == load_table(
        spark, sf_dir, "events"
    ).count()
    by_bucket: dict = {}
    for r in rows:
        by_bucket.setdefault(r.tenure_bucket, 0.0)
        by_bucket[r.tenure_bucket] += r.share
    for s in by_bucket.values():
        assert s == pytest.approx(1.0, rel=1e-12)


def test_winback_nonnegative_and_bounded(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    r = i3.q_winback_customers(spark, sf_dir).collect()[0]
    n_cust = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert 0 <= r.n_winback_customers <= n_cust
    if r.n_winback_customers:
        assert r.post_return_orders >= r.n_winback_customers
        assert r.post_return_revenue > 0
    spark.catalog.clearCache()


def test_incremental_topk_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "ann_incremental_topk")
    spark.catalog.clearCache()


def test_incremental_topk_equals_bruteforce(spark, sf_dir):
    """The merge re-rank must be ROW-IDENTICAL to the from-scratch
    brute-force top-k (the IVM correctness claim)."""
    from lime_etl_spark.operators.similarity import ann_bruteforce_topk

    inc = {tuple(r) for r in i3.ann_incremental_topk(spark, sf_dir).collect()}
    full = {tuple(r) for r in ann_bruteforce_topk(spark, sf_dir).collect()}
    assert inc == full
    spark.catalog.clearCache()


def test_return_day_conversion_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "ev_return_day_conversion")
    spark.catalog.clearCache()


def test_return_day_classes_partition_user_days(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.ev_return_day_conversion(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_user_days = ev.select("user_id", F.to_date("ts")).distinct().count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_user_days for r in rows) == n_user_days
    first = next(r for r in rows if r.day_kind == "a_first_day")
    assert first.n_user_days == n_users  # exactly one first day per user
    # gap-return days must agree with the resurrection-gap histogram
    gaps = sum(r.n_returns for r in i3.ev_resurrection_gaps(spark, sf_dir).collect())
    ret = next(r for r in rows if r.day_kind == "c_return_after_gap")
    assert ret.n_user_days == gaps


def test_bucket_label_purity_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "ann_bucket_label_purity")
    spark.catalog.clearCache()


def test_bucket_label_purity_consistent_with_balance(spark, sf_dir):
    """Same buckets, same vector totals as ann_bucket_balance."""
    purity = {r.bucket: r for r in i3.ann_bucket_label_purity(spark, sf_dir).collect()}
    balance = {r.bucket: r for r in i3.ann_bucket_balance(spark, sf_dir).collect()}
    assert set(purity) == set(balance)
    for b in purity:
        assert purity[b].n_vecs == balance[b].n_vecs
        assert 1.0 / purity[b].n_labels - 1e-12 <= purity[b].purity <= 1.0
    spark.catalog.clearCache()


def test_corpus_card_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "txt_corpus_card")
    spark.catalog.clearCache()


def test_corpus_card_agrees_with_component_queries(spark, sf_dir):
    """The card must agree with the operators that compute each number
    at finer grain."""
    card = i3.txt_corpus_card(spark, sf_dir).collect()[0]
    growth = i3.txt_vocab_growth(spark, sf_dir).collect()
    assert card.vocab_size == growth[-1].cum_types
    assert card.total_ws_tokens == sum(r.n_tokens for r in growth)
    purity = i3.txt_source_lang_purity(spark, sf_dir).collect()
    assert card.n_docs == sum(r.n_docs for r in purity)
    assert card.n_sources == len(purity)
    spark.catalog.clearCache()


def test_knn_confusion_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "emb_knn_confusion")
    spark.catalog.clearCache()


def test_knn_confusion_decomposes_consistency(spark, sf_dir):
    """The matrix diagonal must reproduce the consistency scalar's
    per-label hit counts exactly (same shard, same votes)."""
    from lime_etl_spark.plans.registry import all_queries

    matrix = i3.emb_knn_confusion(spark, sf_dir).collect()
    cons = {
        r.label: r
        for r in all_queries()["emb_knn_label_consistency"]
        .builder(spark, sf_dir)
        .collect()
    }
    diag = {r.label: r.n for r in matrix if r.label == r.voted_label}
    totals: dict = {}
    for r in matrix:
        totals[r.label] = totals.get(r.label, 0) + r.n
    for label, c in cons.items():
        assert totals[label] == c.n_vectors
        assert diag.get(label, 0) == c.n_consistent
    spark.catalog.clearCache()


BATCH_AE = [
    "dedup_borderline_pairs",
    "q_nation_lead_lag",
]


@pytest.mark.parametrize("name", BATCH_AE)
def test_batch_ae_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_borderline_queue_surfaces_planted_pairs(spark, tmp_path):
    """10 planted pairs at jaccard 7/13 ≈ 0.54 (within ±0.05 of tau):
    the md5 minhash is deterministic, so the banding-surfaced subset
    is stable — at least one pair must appear, every reported pair
    must be inside the band, and the jaccard must be exactly 7/13."""
    rows = []
    did = 0
    for p in range(10):
        base = [f"tok{p}_{i}" for i in range(12)]
        alt = base[:9] + [f"alt{p}_{i}" for i in range(3)]
        for toks in (base, alt):
            did += 1
            rows.append((did, " ".join(toks), "en", "srcX", len(" ".join(toks))))
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = i3.dedup_borderline_pairs(spark, d).collect()
    assert out, "deterministic banding must surface at least one planted pair"
    for r in out:
        assert abs(r.jaccard - 0.5) <= i3.BORDERLINE_EPS
        assert r.jaccard == pytest.approx(7 / 13)
        assert r.currently_kept  # 7/13 > tau=0.5
    spark.catalog.clearCache()


def test_lead_lag_bounded_and_directed(spark, sf_dir):
    rows = i3.q_nation_lead_lag(spark, sf_dir).collect()
    assert len(rows) == i3.LEADLAG_TOP_K
    mags = [abs(r.lag1_r) for r in rows]
    assert mags == sorted(mags, reverse=True)
    for r in rows:
        assert r.leader != r.follower
        assert -1.0 - 1e-12 <= r.lag1_r <= 1.0 + 1e-12
    spark.catalog.clearCache()


BATCH_AF = [
    "q_concentration_trend",
    "txt_tokenizer_stress",
]


@pytest.mark.parametrize("name", BATCH_AF)
def test_batch_af_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_concentration_trend_bounds(spark, sf_dir):
    rows = i3.q_concentration_trend(spark, sf_dir).collect()
    for r in rows:
        # HHI bounded by [1/n, 1]; n·HHI ≥ 1 with equality iff uniform
        assert 1.0 / r.n_customers - 1e-12 <= r.hhi <= 1.0 + 1e-12
        assert r.hhi_vs_uniform >= 1.0 - 1e-9


def test_tokenizer_stress_ordered_and_consistent_with_card(spark, sf_dir):
    rows = i3.txt_tokenizer_stress(spark, sf_dir).collect()
    assert len(rows) == i3.STRESS_TOP_K
    ratios = [r.tokens_per_char for r in rows]
    assert ratios == sorted(ratios, reverse=True)
    card = i3.txt_corpus_card(spark, sf_dir).collect()[0]
    # the worst doc's inflation must exceed the corpus mean rate
    corpus_rate = card.total_bpe_tokens / card.total_chars
    assert rows[0].tokens_per_char >= corpus_rate
    spark.catalog.clearCache()


def test_split_leak_matrix_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "samp_split_leak_matrix")
    spark.catalog.clearCache()


def test_split_leak_matrix_conserves_and_leaks(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.samp_split_leak_matrix(spark, sf_dir).collect()
    ev_n = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == ev_n
    assert sum(r.share for r in rows) == pytest.approx(1.0, rel=1e-12)
    # a user-hash split necessarily trains on future events
    leak = [r for r in rows if r.hash_split == "train" and r.time_split == "future"]
    assert leak and leak[0].n_events > 0


BATCH_AH = [
    "ev_cohort_quality_trend",
    "dq_outlier_mass",
    "emb_outlier_profile",
]


@pytest.mark.parametrize("name", BATCH_AH)
def test_batch_ah_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_cohort_quality_covers_every_user(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.ev_cohort_quality_trend(spark, sf_dir).collect()
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    # every user has a first day, hence at least one week-1 event
    assert sum(r.n_new_users for r in rows) == n_users
    for r in rows:
        assert r.w1_events_per_user >= 1.0
        assert 0.0 <= r.w1_purchase_rate <= 1.0


def test_outlier_mass_bounds(spark, sf_dir):
    r = i3.dq_outlier_mass(spark, sf_dir).collect()[0]
    assert 0 <= r.n_outliers <= r.n_orders
    assert 0 <= r.outlier_cents <= r.total_cents
    assert r.outlier_mass_share == r.outlier_cents / r.total_cents


def test_outlier_profile_nested_tails(spark, sf_dir):
    rows = i3.emb_outlier_profile(spark, sf_dir).collect()
    for r in rows:
        # the 4x tail is inside the 2x tail, both inside the label
        assert 0 <= r.n_over_4x_mean <= r.n_over_2x_mean <= r.n_vecs
    spark.catalog.clearCache()


BATCH_AI = [
    "dedup_shingle_skew",
    "q_returns_by_year",
    "emb_int4_vs_int8_error",
]


@pytest.mark.parametrize("name", BATCH_AI)
def test_batch_ai_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_shingle_skew_ordered_and_bounded(spark, sf_dir):
    rows = i3.dedup_shingle_skew(spark, sf_dir).collect()
    counts = [r.n_docs for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert sum(r.pair_cost_share for r in rows) <= 1.0 + 1e-9
    for r in rows:
        assert r.pair_contribution == r.n_docs * r.n_docs
    spark.catalog.clearCache()


def test_returns_by_year_conserves_lines(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.q_returns_by_year(spark, sf_dir).collect()
    assert sum(r.n_lines for r in rows) == load_table(
        spark, sf_dir, "lineitem"
    ).count()


def test_int4_strictly_worse_than_int8(spark, sf_dir):
    """Fewer levels can only lose precision: int4 error must dominate
    int8 error in both mean and max."""
    r = i3.emb_int4_vs_int8_error(spark, sf_dir).collect()[0]
    assert r.int8_mean_abs_err <= r.int4_mean_abs_err
    assert r.int8_max_abs_err <= r.int4_max_abs_err + 1e-12
    assert r.int8_mean_abs_err >= 0


BATCH_AJ = [
    "txt_ingest_drift",
    "dedup_cluster_source_spread",
]


@pytest.mark.parametrize("name", BATCH_AJ)
def test_batch_aj_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_txt_ingest_drift_conserves_mass(spark, sf_dir):
    rows = i3.txt_ingest_drift(spark, sf_dir).collect()
    card = i3.txt_corpus_card(spark, sf_dir).collect()[0]
    assert sum(r.n_docs for r in rows) == card.n_docs
    assert sum(r.total_chars for r in rows) == card.total_chars
    assert sum(r.total_bpe for r in rows) == card.total_bpe_tokens
    spark.catalog.clearCache()


def test_cluster_source_spread_consistent_with_size_hist(spark, sf_dir):
    """Multi-doc cluster totals must agree with the size histogram's
    multi-doc rows (same components, different rollup axis)."""
    spread = i3.dedup_cluster_source_spread(spark, sf_dir).collect()
    hist = i3.graph_component_size_hist(spark, sf_dir).collect()
    multi_clusters = sum(r.n_components for r in hist if r.size >= 2)
    multi_docs = sum(r.n_docs for r in hist if r.size >= 2)
    assert sum(r.n_clusters for r in spread) == multi_clusters
    assert sum(r.n_docs for r in spread) == multi_docs
    for r in spread:
        assert 1 <= r.n_sources
        assert r.max_cluster_size >= 2
    spark.catalog.clearCache()


def test_decontam_sensitivity_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "cur_decontam_sensitivity")
    spark.catalog.clearCache()


def test_decontam_sensitivity_monotone_and_anchored(spark, sf_dir):
    """Bigger n can only flag fewer docs (every (k+j)-gram match
    contains a k-gram match), and the k=13 row must equal the
    production detector's contaminated-doc count."""
    from lime_etl_spark.plans.registry import all_queries

    rows = i3.cur_decontam_sensitivity(spark, sf_dir).collect()
    counts = [r.n_contaminated for r in rows]  # ordered by gram_n asc
    assert counts == sorted(counts, reverse=True)
    prod = (
        all_queries()["cur_decontaminate"].builder(spark, sf_dir).count()
    )
    at13 = next(r for r in rows if r.gram_n == 13)
    assert at13.n_contaminated == prod
    spark.catalog.clearCache()


def test_at_risk_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "ev_at_risk_users")
    spark.catalog.clearCache()


def test_at_risk_flags_planted_lapse(spark, tmp_path):
    """User 1 has a daily cadence then goes silent for the rest of the
    month (27 days > 3x median gap 1); user 2 stays active daily —
    only user 1 must surface."""
    import datetime as dt

    rows = []
    eid = 0
    for d in (1, 2, 3):  # user 1: daily, then silence
        eid += 1
        rows.append((eid, dt.datetime(2024, 5, d, 10, 0, 0), 1, "view", 1.0, "{}"))
    for d in range(1, 31):  # user 2: active every day incl. the as-of day
        eid += 1
        rows.append((eid, dt.datetime(2024, 5, d, 11, 0, 0), 2, "view", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "sf")
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = i3.ev_at_risk_users(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.user_id, r.median_gap, r.days_silent) == (1, 1, 27)


def test_cross_sell_gaps_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "q_cross_sell_gaps")
    spark.catalog.clearCache()


def test_cross_sell_gaps_bounds(spark, sf_dir):
    rows = i3.q_cross_sell_gaps(spark, sf_dir).collect()
    assert len(rows) == i3.XSELL_TOP_PAIRS
    for r in rows:
        assert r.brand_a < r.brand_b
        # whitespace is bounded by the owning audience
        assert 0 <= r.a_not_b <= r.n_cust_a
        assert 0 <= r.b_not_a <= r.n_cust_b
        # overlap identity: owners of both = n_a - a_not_b = n_b - b_not_a
        assert r.n_cust_a - r.a_not_b == r.n_cust_b - r.b_not_a
    spark.catalog.clearCache()


def test_basket_breadth_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "q_basket_breadth")
    spark.catalog.clearCache()


def test_cross_sell_gaps_fully_penetrated_pair_survives(spark, tmp_path):
    """Regression (round-1 advice): a top pair whose whitespace is
    ZERO in both directions must still appear, with 0 gap counts —
    the old inner-join build silently dropped it. Fixture: two
    customers, both holding brands A and B."""
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(10, 1), (11, 2)], "o_orderkey bigint, o_custkey bigint"
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(100, "BrandA"), (101, "BrandB")], "p_partkey bigint, p_brand string"
    ).write.mode("overwrite").parquet(f"{d}/part.parquet")
    li = [(10, 100), (10, 101), (11, 100), (11, 101)]
    spark.createDataFrame(
        li, "l_orderkey bigint, l_partkey bigint"
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    rows = i3.q_cross_sell_gaps(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.brand_a, r.brand_b, r.n_both_orders) == ("BrandA", "BrandB", 2)
    assert (r.n_cust_a, r.n_cust_b) == (2, 2)
    assert (r.a_not_b, r.b_not_a) == (0, 0)
    spark.catalog.clearCache()


def test_basket_breadth_conserves_orders(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.q_basket_breadth(spark, sf_dir).collect()
    n_orders = (
        load_table(spark, sf_dir, "lineitem").select("l_orderkey").distinct().count()
    )
    assert sum(r.n_orders for r in rows) == n_orders
    for r in rows:
        assert r.n_brands >= 1
        assert r.avg_order_value == pytest.approx(r.total_value / r.n_orders)


def test_lsh_window_recall_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "dedup_lsh_window_recall")
    spark.catalog.clearCache()


def test_lsh_window_recall_detects_planted_miss(spark, tmp_path):
    """The planted borderline corpus (j ≈ 0.54) has in-window pairs
    the banding mostly misses — measured recall must be < 1 there,
    proving the audit can catch a lossy config, and found ⊆ truth."""
    rows = []
    did = 0
    for p in range(10):
        base = [f"tok{p}_{i}" for i in range(12)]
        alt = base[:9] + [f"alt{p}_{i}" for i in range(3)]
        for toks in (base, alt):
            did += 1
            rows.append((did, " ".join(toks), "en", "srcX", len(" ".join(toks))))
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    r = i3.dedup_lsh_window_recall(spark, d).collect()[0]
    assert r.n_truth_pairs == 10  # every planted pair is in-window truth
    assert r.n_lsh_found <= r.n_truth_pairs
    assert r.lsh_recall_in_window < 1.0  # banding provably lossy at j≈0.54
    spark.catalog.clearCache()


BATCH_AP = [
    "emb_label_norms",
    "dq_id_allocation_rate",
]


@pytest.mark.parametrize("name", BATCH_AP)
def test_batch_ap_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
    spark.catalog.clearCache()


def test_label_norms_decompose_class_scatter_energy(spark, sf_dir):
    """Per-label Σ||q||² must equal emb_class_scatter's total_norm_sq
    (same quantization, same partition of vectors)."""
    norms = {r.label: r for r in i3.emb_label_norms(spark, sf_dir).collect()}
    scatter = {r.label: r for r in i3.emb_class_scatter(spark, sf_dir).collect()}
    assert set(norms) == set(scatter)
    for lbl in norms:
        assert norms[lbl].sum_norm_sq == scatter[lbl].total_norm_sq
        assert norms[lbl].min_norm_sq <= norms[lbl].max_norm_sq
    spark.catalog.clearCache()


def test_id_allocation_identity_on_dense_ids(spark, sf_dir):
    """The synthetic events allocate ids densely per day, so the
    id_advance must equal the day's row count (gap 0) after day 1."""
    rows = i3.dq_id_allocation_rate(spark, sf_dir).collect()
    assert rows[0].id_advance is None  # first day has no predecessor
    for r in rows[1:]:
        assert r.id_advance == r.n_events
        assert r.id_gap == 0


def test_quarter_end_loading_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "q_quarter_end_loading")
    spark.catalog.clearCache()


def test_quarter_end_loading_bounds(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = i3.q_quarter_end_loading(spark, sf_dir).collect()
    assert sum(r.n_orders for r in rows) == load_table(
        spark, sf_dir, "orders"
    ).count()
    for r in rows:
        assert 0.0 <= r.final_week_share <= 1.0
        if r.final_week_value is not None:
            assert r.final_week_value <= r.total_value
