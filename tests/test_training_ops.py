"""Training-pipeline operators (sampling/split/as-of/packing) vs
DuckDB oracle at sf0.001, plus semantic invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lime_etl_spark.operators.training import PACK_BUDGET, SAMPLE_RATES
from lime_etl_spark.plans.registry import all_queries
from tests.oracle import assert_query_matches_oracle

KEYS = ["samp_stratified", "samp_hash_split", "ev_asof_attribution", "pack_sequences", "samp_mixture_stats", "samp_fixed_k", "samp_winsorize_audit"]


def test_fixed_k_is_exact_and_stable(spark, sf_dir):
    """Every stratum yields exactly min(k, stratum size) rows, and the
    draw is identical across runs (no randomness source)."""
    from lime_etl_spark.operators.training import FIXED_K
    from lime_etl_spark.sources.readers import load_table

    out = all_queries()["samp_fixed_k"].builder(spark, sf_dir).collect()
    totals = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    per_lang: dict = {}
    for r in out:
        per_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    for lang, n in totals.items():
        assert len(per_lang.get(lang, set())) == min(FIXED_K, n)
    again = all_queries()["samp_fixed_k"].builder(spark, sf_dir).collect()
    assert sorted((r["lang"], r["doc_id"]) for r in out) == sorted(
        (r["lang"], r["doc_id"]) for r in again
    )


@pytest.mark.parametrize("name", KEYS)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_stratified_rates_approximate(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    totals = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents").groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    sampled = {
        r["lang"]: r["n"]
        for r in all_queries()["samp_stratified"].builder(spark, sf_dir).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, rate in SAMPLE_RATES.items():
        got = sampled.get(lang, 0) / totals[lang]
        assert abs(got - rate) < 0.15, (lang, got, rate)


def test_split_is_deterministic_and_total(spark, sf_dir):
    df = all_queries()["samp_hash_split"].builder(spark, sf_dir)
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in all_queries()["samp_hash_split"].builder(spark, sf_dir).collect())
    assert a == b
    from lime_etl_spark.sources.readers import load_table

    assert sum(r[2] for r in a) == load_table(spark, sf_dir, "documents").count()


def test_asof_view_precedes_click(spark, sf_dir):
    rows = all_queries()["ev_asof_attribution"].builder(spark, sf_dir).collect()
    assert rows
    matched = [r for r in rows if r["view_us"] is not None]
    assert matched and all(r["gap_us"] >= 0 for r in matched)


def test_packs_respect_budget_start(spark, sf_dir):
    """Each pack's docs started while the running sum was inside the
    pack's budget window (greedy fill semantics)."""
    rows = all_queries()["pack_sequences"].builder(spark, sf_dir).collect()
    assert rows
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault((r["lang"], r["shard"]), []).append(r)
    for (_, _), packs in by_shard.items():
        packs.sort(key=lambda r: r["pack_id"])
        # pack ids are the running-total div budget: consecutive-ish, starting at 0
        assert packs[0]["pack_id"] == 0
        total = sum(p["total_tokens"] for p in packs)
        assert total >= PACK_BUDGET * (packs[-1]["pack_id"])


@pytest.mark.parametrize("name", ["samp_domain_budget", "samp_curriculum"])
def test_new_sampling_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_domain_budget_cuts_every_source(spark, sf_dir):
    """The budget must actually bind: each source keeps fewer docs
    than it has, but at least one, and kept tokens exceed the budget
    by at most one doc (greedy start-under-budget rule)."""
    from lime_etl_spark.operators.training import DOMAIN_BUDGET
    from lime_etl_spark.sources.readers import load_table

    per_source = {
        r["source"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    rows = all_queries()["samp_domain_budget"].builder(spark, sf_dir).collect()
    assert set(r["source"] for r in rows) == set(per_source)
    for r in rows:
        assert 0 < r["n_kept"] < per_source[r["source"]]
        assert r["kept_tokens"] >= DOMAIN_BUDGET  # last doc straddles the line


def test_curriculum_phases_ordered_by_difficulty(spark, sf_dir):
    """Within a source, phase k's max difficulty never exceeds phase
    k+1's min (ntile on a sorted order is monotone)."""
    rows = all_queries()["samp_curriculum"].builder(spark, sf_dir).collect()
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for src, phases in by_source.items():
        phases.sort(key=lambda r: r["phase"])
        assert [p["phase"] for p in phases] == list(range(1, len(phases) + 1))
        for a, b in zip(phases, phases[1:]):
            assert a["max_chars"] <= b["min_chars"], (src, a, b)


def test_negatives_match_oracle(spark, sf_dir):
    from tests.oracle import assert_query_matches_oracle

    assert_query_matches_oracle(spark, sf_dir, "samp_negatives_per_user")


def test_negatives_never_positive_and_deterministic(spark, sf_dir):
    from pyspark.sql import functions as F

    from lime_etl_spark.plans.registry import all_queries
    from lime_etl_spark.sources.readers import load_table

    build = all_queries()["samp_negatives_per_user"].builder
    neg1 = build(spark, sf_dir).collect()
    neg2 = build(spark, sf_dir).collect()
    assert neg1 == neg2  # rerun-identical
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pos = {
        (r.c_custkey, r.p_partkey)
        for r in orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("l_partkey").alias("p_partkey"),
        )
        .distinct()
        .collect()
    }
    assert all((r.c_custkey, r.p_partkey) not in pos for r in neg1)
    per_user = {}
    for r in neg1:
        per_user.setdefault(r.c_custkey, []).append(r.neg_rank)
    for ranks in per_user.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 4


def test_pps_systematic_invariants(spark, sf_dir, tmp_path):
    """r4 verdict #3: PPS invariants. (a) total picks telescope to
    EXACTLY total_tokens // stride (the cumulative-line identity);
    (b) every doc's multiplicity is floor or ceil of n_tokens/stride
    (pick probability proportional to token mass); (c) a doc heavier
    than one stride is picked with multiplicity ≥ 2; (d) the draw is
    rerun-identical (no randomness source)."""
    from lime_etl_spark.operators.training import PPS_K
    from lime_etl_spark.plans.registry import all_queries
    from lime_etl_spark.sources.readers import load_table

    build = all_queries()["samp_pps_systematic"].builder
    out = build(spark, sf_dir).collect()
    again = build(spark, sf_dir).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]

    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(
        F.sum(F.size(F.split("text", " ")).cast("bigint")).alias("t")
    ).collect()[0]["t"]
    stride = max(total // PPS_K, 1)
    # (a) telescoping total: sum(cum_i//s - prev_i//s) == cum_N//s
    assert sum(r["n_picks"] for r in out) == total // stride
    # (b) per-doc multiplicity brackets n_tokens/stride
    for r in out:
        lo, hi = r["n_tokens"] // stride, -(-r["n_tokens"] // stride)
        assert lo <= r["n_picks"] <= max(hi, 1), (r, stride)
    # heavier docs never get fewer picks than a doc > 2 strides lighter
    # (monotone-in-expectation, exact per the bracket above)

    # (c) planted oversize doc → multiplicity ≥ 2, on a tiny fixture
    rows = [(i, "s", "w " * 5 + "w") for i in range(1, 401)]
    rows.append((999, "s", "w " * (6 * 400)))  # ≈ half the total mass
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    picks = {r["doc_id"]: r["n_picks"] for r in build(spark, d).collect()}
    assert picks.get(999, 0) >= 2, picks.get(999)


def test_poisson_bootstrap_matches_pure_python_reference(spark, sf_dir):
    """Every weight recomputed INDEPENDENTLY (hashlib md5 + the
    Poisson(1) integer-CDF ladder on plain Python ints) must reproduce
    Spark's per-replicate n_eff and decimal-exact totals."""
    import hashlib
    from decimal import Decimal

    import duckdb

    from lime_etl_spark.operators.training import (
        _BOOT_REPS,
        _BOOT_SCALE,
        _poisson_thresholds,
    )
    from lime_etl_spark.plans.registry import get

    got = {r["rep"]: r for r in get("samp_poisson_bootstrap").builder(spark, sf_dir).collect()}
    orders = duckdb.connect().execute(
        f"SELECT o_orderkey, o_totalprice FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchall()
    thresholds = _poisson_thresholds()
    for rep in (0, 7, 31):
        n_eff = 0
        total = Decimal(0)
        for key, price in orders:
            u = int(hashlib.md5(f"{key}:{rep}".encode()).hexdigest()[:15], 16) % _BOOT_SCALE
            w = sum(1 for t in thresholds if u >= t)
            n_eff += w
            total += w * Decimal(str(price)).quantize(Decimal("0.01"))
        assert got[rep]["n_eff"] == n_eff, rep
        assert got[rep]["total_rev"] == float(total), rep
    assert len(got) == _BOOT_REPS


def test_poisson_bootstrap_statistical_invariants(spark, sf_dir):
    import math
    import statistics

    from lime_etl_spark.plans.registry import get

    rows = get("samp_poisson_bootstrap").builder(spark, sf_dir).collect()
    import duckdb

    n_orders = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/orders.parquet')"
    ).fetchone()[0]
    # E[n_eff] = N, sd = sqrt(N): every replicate within 5 sigma
    for r in rows:
        assert abs(r["n_eff"] - n_orders) < 5 * math.sqrt(n_orders), r
        assert r["mean_rev"] == r["total_rev"] / r["n_eff"]
    # replicates genuinely differ (the bootstrap measures spread)
    means = [r["mean_rev"] for r in rows]
    assert statistics.pstdev(means) > 0
    # deterministic: identical on rerun
    again = get("samp_poisson_bootstrap").builder(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_poisson_thresholds_are_a_valid_cdf_grid():
    from lime_etl_spark.operators.training import _BOOT_SCALE, _poisson_thresholds

    t = _poisson_thresholds()
    assert len(t) == 8
    assert t == sorted(t)
    assert 0 < t[0] < _BOOT_SCALE  # P(0) = e^-1
    # int-floor onto the 2^30 grid quantizes by up to 1/2^30 ≈ 9.3e-10
    assert abs(t[0] / _BOOT_SCALE - 0.36787944117144233) < 2e-9
    assert t[-1] <= _BOOT_SCALE and t[-1] / _BOOT_SCALE > 0.9999
