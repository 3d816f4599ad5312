"""Planted-effect tests for the experimentation family (r3 verdict #6):
like q_discount_elasticity's recovered-slope test, each operator must
recover a KNOWN injected effect from a synthetic events fixture —
exactly, because the pipelines are integer/decimal-exact by design."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

EV_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)

PRE_TS = dt.datetime(2024, 1, 10, 12, 0, 0)  # before both split dates
POST_TS = dt.datetime(2024, 1, 20, 12, 0, 0)  # after both split dates


def _arms(spark, user_ids):
    """The operators' own md5 arm assignment, replayed per user."""
    from lime_etl_spark.operators.training import hash_bucket

    df = spark.createDataFrame([(u,) for u in user_ids], "user_id bigint")
    rows = df.select(
        "user_id",
        F.when(hash_bucket(F.col("user_id"), 2) == 0, "control")
        .otherwise("treatment")
        .alias("arm"),
    ).collect()
    return {r["user_id"]: r["arm"] for r in rows}


def test_diff_in_diff_recovers_planted_lift(spark, tmp_path):
    """Every user buys $10.00 pre and post; treatment users get an
    extra $3.00 post. delta(treatment) − delta(control) must equal
    the planted $3.00 EXACTLY (decimal revenue, one double division
    per cell of exactly-representable values)."""
    from lime_etl_spark.operators.insights2 import ev_diff_in_diff

    users = list(range(1, 201))
    arm = _arms(spark, users)
    assert {"control", "treatment"} == set(arm.values())
    rows, eid = [], 0
    for u in users:
        eid += 1
        rows.append((eid, PRE_TS, u, "purchase", 10.0, "{}"))
        eid += 1
        post_v = 13.0 if arm[u] == "treatment" else 10.0
        rows.append((eid, POST_TS, u, "purchase", post_v, "{}"))
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, EV_SCHEMA).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )

    out = {r["arm"]: r for r in ev_diff_in_diff(spark, d).collect()}
    assert out["control"].pre_rev_per_user == 10.0
    assert out["control"].post_rev_per_user == 10.0
    assert out["control"].delta == 0.0
    assert out["treatment"].pre_rev_per_user == 10.0
    assert out["treatment"].post_rev_per_user == 13.0
    did_estimate = out["treatment"].delta - out["control"].delta
    assert did_estimate == 3.0  # the planted lift, recovered exactly


def test_experiment_power_planted_variance_and_perfect_cuped(spark, tmp_path):
    """Plant (a) a post metric with a KNOWN two-point variance and
    (b) a pre covariate that predicts post perfectly (y = 100·x_q
    cents). Then: the raw-metric MDE must equal the closed form
    z·sqrt(var·(1/n_c+1/n_t)) on the planted variance, and the
    CUPED-adjusted variance — hence its MDE — must be EXACTLY zero
    (theta lands on the exact slope, every adjusted value collapses
    to the same integer)."""
    from lime_etl_spark.operators.insights3 import (
        _Z_POWER_SUM,
        ev_experiment_power,
    )

    users = list(range(1, 241))
    # dollar outcomes alternate 20 / 40 by user parity (independent of
    # the md5 arm split); pre == post so the covariate is perfect
    dollars = {u: (20 if u % 2 == 0 else 40) for u in users}
    rows, eid = [], 0
    for u in users:
        eid += 1
        rows.append((eid, PRE_TS, u, "purchase", float(dollars[u]), "{}"))
        eid += 1
        rows.append((eid, POST_TS, u, "purchase", float(dollars[u]), "{}"))
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, EV_SCHEMA).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )

    out = {r["metric"]: r for r in ev_experiment_power(spark, d).collect()}
    post, cuped = out["post"], out["cuped_adjusted"]

    # planted population variance of the dollar-grain metric
    n = len(users)
    mean_d = sum(dollars.values()) / n
    var_planted = sum((v - mean_d) ** 2 for v in dollars.values()) / n
    assert post.variance == pytest.approx(var_planted, rel=1e-12)
    assert post.mean_value == pytest.approx(mean_d, rel=1e-12)

    n_c, n_t = post.n_control, post.n_treatment
    assert n_c + n_t == n and n_c > 0 and n_t > 0
    mde_expected = _Z_POWER_SUM * math.sqrt(
        var_planted * (1.0 / n_c + 1.0 / n_t)
    )
    assert post.mde_abs == pytest.approx(mde_expected, rel=1e-12)

    # perfect covariate ⇒ integer-exact theta ⇒ zero adjusted variance
    assert cuped.variance == 0.0
    assert cuped.mde_abs == 0.0
    assert cuped.mean_value == pytest.approx(mean_d, rel=1e-12)


def test_cuped_adjustment_full_variance_reduction(spark, tmp_path):
    """Same perfect-covariate fixture through ev_cuped_adjustment:
    var_reduction must be exactly 1.0 in both arms (all adjusted
    values identical) and adjusted means must equal the raw mean."""
    from lime_etl_spark.operators.insights3 import ev_cuped_adjustment

    users = list(range(1, 121))
    rows, eid = [], 0
    for u in users:
        v = float(10 + (u % 7) * 5)  # any deterministic dollar spread
        eid += 1
        rows.append((eid, PRE_TS, u, "purchase", v, "{}"))
        eid += 1
        rows.append((eid, POST_TS, u, "purchase", v, "{}"))
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, EV_SCHEMA).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )

    out = ev_cuped_adjustment(spark, d).collect()
    assert len(out) == 2
    pooled_mean = sum(10 + (u % 7) * 5 for u in users) / len(users)
    for r in out:
        assert r.var_adjusted == 0.0
        assert r.var_reduction == 1.0
        # a perfect covariate pulls EVERY arm's adjusted mean to the
        # pooled mean (the A/A-balance property) — up to the documented
        # cent-grain floor of xbar_c2
        assert r.mean_adjusted == pytest.approx(pooled_mean, abs=0.0100001)
    assert out[0].mean_adjusted == out[1].mean_adjusted


def test_uplift_deciles_recovers_planted_decile_effect(spark, tmp_path):
    """r4 verdict #3: plant a decile-CONCENTRATED effect — treatment
    users convert post-cutover iff they sit in the top 3 pre-activity
    deciles, control users never convert. The table must recover:
    uplift == conv rate of the treated == 1.0 exactly in deciles
    8–10 and 0.0 below; cumulative incremental conversions == the
    running count of treated users from decile 10 down (control rate
    is 0, so incremental == conv_t exactly at the 1e-6 grain)."""
    from lime_etl_spark.operators.insights3 import ev_uplift_deciles

    users = list(range(1, 101))  # pre_events = u → decile = ceil(u/10)
    arm = _arms(spark, users)
    rows, eid = [], 0
    for u in users:
        for _ in range(u):  # u pre-cutover events → deterministic decile
            eid += 1
            rows.append((eid, PRE_TS, u, "view", 0.0, "{}"))
        if arm[u] == "treatment" and u > 70:  # plant: top-3-decile effect
            eid += 1
            rows.append((eid, POST_TS, u, "purchase", 5.0, "{}"))
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, EV_SCHEMA).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )

    out = ev_uplift_deciles(spark, d).collect()
    assert [r["decile"] for r in out] == list(range(10, 0, -1))
    expected_cum = 0
    for r in out:
        lo = (r["decile"] - 1) * 10
        members = users[lo : lo + 10]  # NTILE(10) over (pre_events,user)
        n_t = sum(1 for u in members if arm[u] == "treatment")
        n_c = 10 - n_t
        conv_t = n_t if r["decile"] > 7 else 0
        assert (r["n_control"], r["n_treatment"]) == (n_c, n_t)
        assert (r["conv_control"], r["conv_treatment"]) == (0, conv_t)
        assert r["rate_control"] == 0.0
        assert r["rate_treatment"] == (conv_t / n_t if n_t else 0.0)
        assert r["uplift"] == (1.0 if r["decile"] > 7 and n_t else 0.0)
        expected_cum += conv_t  # incr == conv_t exactly when rate_c == 0
        assert r["cum_incremental"] == float(expected_cum)


def test_qini_auc_recovers_planted_targeting_value(spark, tmp_path):
    """Same planted top-3-decile effect through the capstone scalar:
    qini AUC must equal the exact trapezoid-minus-diagonal arithmetic
    replayed in Python from the known per-decile cells — positive,
    because the decile score genuinely concentrates the effect. A
    uniformly-spread effect (every treatment user converts) must
    score ~0: targeting by decile then buys nothing over random."""
    from lime_etl_spark.operators.insights3 import ev_uplift_qini_auc

    users = list(range(1, 101))
    arm = _arms(spark, users)

    def build(d, convert):
        rows, eid = [], 0
        for u in users:
            for _ in range(u):
                eid += 1
                rows.append((eid, PRE_TS, u, "view", 0.0, "{}"))
            if arm[u] == "treatment" and convert(u):
                eid += 1
                rows.append((eid, POST_TS, u, "purchase", 5.0, "{}"))
        spark.createDataFrame(rows, EV_SCHEMA).write.mode("overwrite").parquet(
            f"{d}/events.parquet"
        )

    d1 = str(tmp_path / "concentrated")
    build(d1, lambda u: u > 70)
    got = ev_uplift_qini_auc(spark, d1).collect()[0]

    # replay the exact integer pipeline on the known cells
    q_cum, q_prev, a2_curve, q_total = 0, 0, 0, 0
    for dec in range(10, 0, -1):
        members = users[(dec - 1) * 10 : dec * 10]
        n_t = sum(1 for u in members if arm[u] == "treatment")
        n_c = 10 - n_t
        conv_t = n_t if dec > 7 else 0
        if n_c == 0:
            incr = 0
        else:
            incr = (
                1000000 * (conv_t * n_c - 0 * n_t) + 1000000 * n_t * n_c
            ) // n_c - 1000000 * n_t
        q_prev, q_cum = q_cum, q_cum + incr
        q_total += incr
        a2_curve += (q_prev + q_cum) * 10
    expected = (a2_curve - q_total * 100) / (2 * 100 * 1000000)
    assert got.n_users == 100
    assert got.qini_auc == expected
    assert got.qini_auc > 0  # concentration IS targeting value
    assert got.q_total == q_total / 1000000

    # uniformly-spread effect: every treated converts, uplift flat
    d2 = str(tmp_path / "uniform")
    build(d2, lambda u: True)
    flat = ev_uplift_qini_auc(spark, d2).collect()[0]
    # per-decile incr == 1e6·n_t; curve vs diagonal differ only by the
    # ±arm-imbalance wiggle across deciles — an order of magnitude
    # below the concentrated signal
    assert abs(flat.qini_auc) < abs(got.qini_auc) / 5


def test_interaction_check_degenerate_marginal_guard(spark, tmp_path):
    """Degenerate experiment — every user in one arm of experiment 1 —
    zeroes a 2x2 marginal for every (1, j) pair, making chi-square
    undefined (den = 0). The guard must pin chi_square to 0.0 and
    interaction_flag to false on both engines rather than diverging
    NULL-vs-inf (r7 ADVICE). Users are mined so the operators' own md5
    arm hash assigns them all arm 0 of exp 1."""
    import hashlib

    from lime_etl_spark.operators.insights4 import SRM_EXPERIMENTS
    from lime_etl_spark.operators.insights5 import ev_ab_interaction_check

    def arm(exp: int, uid: int) -> int:
        return int(hashlib.md5(f"exp{exp}:{uid}".encode()).hexdigest()[:15], 16) % 2

    users = [u for u in range(1, 2000) if arm(1, u) == 0][:60]
    assert len(users) == 60
    rows = [(i + 1, PRE_TS, u, "view", 1.0, "{}") for i, u in enumerate(users)]
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, EV_SCHEMA).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )

    out = ev_ab_interaction_check(spark, d).collect()
    m = SRM_EXPERIMENTS
    assert len(out) == m * (m - 1) // 2
    degenerate = [r for r in out if r.exp_a == 1]
    assert len(degenerate) == m - 1
    for r in degenerate:
        assert r.n10 + r.n11 == 0  # zeroed marginal by construction
        assert r.chi_square == 0.0  # guarded, not NULL/inf
        assert r.interaction_flag is False
    # the non-degenerate pairs still compute real chi-squares
    assert any(r.chi_square > 0.0 for r in out if r.exp_a != 1)
