"""DataSketches-state operators: estimation error bounded against the
exact operators, and the state-merge property itself (union of daily
states == sketch of the whole period's data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lime_etl_spark.plans.registry import all_queries
from lime_etl_spark.sources.readers import load_table


def test_hll_daily_and_total_close_to_exact(spark, sf_dir):
    rows = {
        r.scope: r
        for r in all_queries()["sketch_hll_daily_users"].builder(spark, sf_dir).collect()
    }
    exact_total = rows.pop("total_exact").exact_users
    total = rows.pop("total")
    assert abs(total.est_users - exact_total) / exact_total < 0.05
    for r in rows.values():  # per-day rows carry their own exact twin
        assert abs(r.est_users - r.exact_users) / max(r.exact_users, 1) < 0.05


def test_theta_pairs_close_to_exact_jaccard(spark, sf_dir):
    """Theta intersection/union estimates vs the exact audience-overlap
    operator (same pair definition)."""
    exact = {
        (r.type_a, r.type_b): r
        for r in all_queries()["ev_audience_overlap"].builder(spark, sf_dir).collect()
    }
    got = all_queries()["sketch_theta_audience"].builder(spark, sf_dir).collect()
    assert got and set(exact) == {(r.type_a, r.type_b) for r in got}
    for r in got:
        e = exact[(r.type_a, r.type_b)]
        assert abs(r.est_intersection - e.n_both) / max(e.n_both, 1) < 0.05
        assert abs(r.est_jaccard - e.jaccard) < 0.05
        # set identity |A| = |A∩B| + |A−B| holds for estimates too
        assert abs(r.est_users_a - (r.est_intersection + r.est_a_minus_b)) < 1e-6


def test_kll_quantiles_within_rank_tolerance(spark, sf_dir):
    """KLL guarantees rank (not value) error: check the p50 estimate's
    true rank is within 2.5% of 0.5, per type and merged."""
    rows = all_queries()["sketch_kll_value_quantiles"].builder(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    for r in rows:
        vals = ev if r.scope == "total" else ev.where(F.col("event_type") == r.scope)
        n = vals.count()
        below = vals.where(F.col("value") <= r.p50).count()
        assert abs(below / n - 0.5) < 0.025, (r.scope, below / n)
        assert r.n == n


def test_hll_union_of_parts_equals_sketch_of_whole(spark):
    """The mergeability property itself: union of per-partition states
    == one state over all the data (same lgK)."""
    df = spark.range(20000).select(
        (F.col("id") % 4).alias("part"), (F.col("id") % 5000).alias("uid")
    )
    parts = df.groupBy("part").agg(F.hll_sketch_agg("uid", F.lit(12)).alias("sk"))
    merged = parts.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0].est
    whole = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("uid", F.lit(12))).alias("est")
    ).collect()[0].est
    assert merged == whole
