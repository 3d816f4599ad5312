"""Mergeable sketch-state operators (Spark 4.1 Apache DataSketches
surface: HLL, theta, KLL).

Why this family exists: exact DISTINCT and exact percentiles do not
RE-aggregate — distinct users per day can't be summed into distinct
users per month, so every new slice is a full scan at 100 TB. Sketch
STATES do re-aggregate: a binary HLL/theta/KLL cell per (day, dim)
can be unioned/merged into any coarser slice later — the cube is
computed once, every rollup after that reads sketch cells, not the
fact table. (Same design as the count-min family in
`sketch_heavy_hitters` / `stream_cms_sink`, now with the engine-native
DataSketches binary states.)

- `sketch_hll_daily_users`: per-day HLL user sketches + the UNION of
  those states == period distinct; per-day and total relative error
  vs exact is part of the output (the operator audits itself).
- `sketch_theta_audience`: theta sketches support INTERSECTION and
  DIFFERENCE — distinct-user overlap between event-type pairs
  straight from |types| sketch states (the 100 TB path for
  ev_audience_overlap, which self-joins distinct pairs exactly).
- `sketch_kll_value_lag`: per-type KLL quantile states over purchase
  values, merged to a global state; quantiles queried FROM STATE.

All rows-only: DataSketches binary encodings have no DuckDB twin;
pytest bounds the estimation error against the exact operators
instead (same check style as dq_sketch_accuracy).

lime-etl analog: these are the `test()`-style profile jobs a nightly
batch persists to the admin store — small state, mergeable across
batch runs (job_spec.py:60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_etl_spark.plans.registry import register
from lime_etl_spark.sources.readers import load_table

HLL_LGK = 12  # 2^12 registers — <1% typical error, 4 KB state


@register(
    "sketch_hll_daily_users",
    oracle=None,  # DataSketches binary state — pytest bounds error vs exact
    description="per-day HLL user sketches + state-union period rollup, self-auditing vs exact",
)
def sketch_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct users as HLL state, then the period total from
    UNIONING THE STATES — never re-reading events. The `scope='total'`
    row's estimate comes purely from the 1-row-per-day sketch table;
    exact counts ride along so the output itself shows the error the
    sketch path costs.

    Scale: the day×sketch table is |days| rows of ~4 KB; any coarser
    rollup (week, month, all-time) is a hll_union_agg over those rows.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    per_day = daily.select(
        F.col("d").cast("string").alias("scope"),
        F.hll_sketch_estimate("sk").alias("est_users"),
        "exact_users",
    )
    total = daily.agg(
        F.hll_union_agg("sk").alias("u"),
        F.sum(F.lit(0)).alias("_z"),  # keep agg non-empty shape stable
    ).select(
        F.lit("total").alias("scope"),
        F.hll_sketch_estimate("u").alias("est_users"),
        F.lit(None).cast("bigint").alias("exact_users"),
    )
    exact_total = ev.agg(
        F.countDistinct("user_id").alias("exact_users")
    ).select(
        F.lit("total_exact").alias("scope"),
        F.col("exact_users").cast("double").alias("est_users"),
        F.col("exact_users"),
    )
    return per_day.unionByName(total).unionByName(exact_total).orderBy("scope")


@register(
    "sketch_theta_audience",
    oracle=None,  # DataSketches binary state — pytest bounds error vs exact
    description="theta-sketch audience algebra: union/intersection/difference of per-type user sets from |types| states",
)
def sketch_theta_audience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra from sketch STATES: distinct users per
    event type as theta sketches, then for every type pair the
    estimated union, intersection (theta's superpower — HLL can't
    intersect) and a-minus-b difference, plus the derived Jaccard.

    Scale: the fact reduces to |types| sketch rows in one pass; the
    pair algebra runs on those rows alone (|types|² bounded), so
    adding a new pairwise report costs zero fact scans. The exact twin
    (ev_audience_overlap) self-joins the distinct pair set — this is
    its sub-1%-error constant-state replacement.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("sk")
    )
    a = per_type.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a")
    )
    b = per_type.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b")
    )
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    est_a = F.theta_sketch_estimate(F.col("sk_a"))
    est_b = F.theta_sketch_estimate(F.col("sk_b"))
    est_union = F.theta_sketch_estimate(F.theta_union(F.col("sk_a"), F.col("sk_b")))
    est_inter = F.theta_sketch_estimate(
        F.theta_intersection(F.col("sk_a"), F.col("sk_b"))
    )
    est_diff = F.theta_sketch_estimate(
        F.theta_difference(F.col("sk_a"), F.col("sk_b"))
    )
    return pairs.select(
        "type_a",
        "type_b",
        est_a.alias("est_users_a"),
        est_b.alias("est_users_b"),
        est_union.alias("est_union"),
        est_inter.alias("est_intersection"),
        est_diff.alias("est_a_minus_b"),
        (est_inter / est_union).alias("est_jaccard"),
    ).orderBy("type_a", "type_b")


@register(
    "sketch_kll_value_quantiles",
    oracle=None,  # DataSketches binary state — pytest bounds rank error vs exact
    description="KLL quantile sketch states per event type + state-merge global quantiles",
)
def sketch_kll_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-distribution quantiles FROM MERGEABLE STATE: one KLL
    sketch per event type, p50/p90/p99 queried from each state, plus a
    'total' row whose quantiles come from MERGING the per-type states
    — the exact-percentile operators (q_price_quantiles et al.) buffer
    every value per group; KLL state is a few KB per group forever.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value").alias("sk")
    )

    def quantiles(sk):
        return [
            F.kll_sketch_get_quantile_double(sk, F.lit(q)).alias(name)
            for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99"))
        ]

    typed = per_type.select(
        F.col("event_type").alias("scope"),
        F.kll_sketch_get_n_double("sk").alias("n"),
        *quantiles(F.col("sk")),
    )
    # kll_sketch_merge_double is a BINARY scalar (unlike hll_union_agg):
    # fold the per-type states pairwise — associative, so any merge
    # tree (here a left fold over |types| states) yields the same state
    # NB: [] indexing is 0-based but slice()/element_at() are 1-based —
    # element_at everywhere so init = first state, fold = the rest
    total = per_type.agg(F.collect_list("sk").alias("lst")).select(
        F.expr(
            "aggregate(slice(lst, 2, size(lst) - 1), element_at(lst, 1), "
            "(acc, x) -> kll_sketch_merge_double(acc, x))"
        ).alias("sk")
    ).select(
        F.lit("total").alias("scope"),
        F.kll_sketch_get_n_double("sk").alias("n"),
        *quantiles(F.col("sk")),
    )
    return typed.unionByName(total).orderBy("scope")
