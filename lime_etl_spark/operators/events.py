"""Event analytics: time bucketing, sessionization, funnels, JSON props.

All event-time arithmetic is integer microseconds (``unix_micros`` /
``epoch_us``): the source parquet stores nanoseconds, Spark truncates
to µs, and float-second epochs are not bit-reproducible across
engines. Scale notes:

- sessionization is two window passes over (user_id, ts) — one
  shuffle on user_id; skewed power users are handled by AQE skew
  splitting since the window partitions by user only.
- daily KPIs / funnels are plain partial-aggregable groupBys.
- JSON extraction uses ``get_json_object`` (JVM, codegen) — never a
  Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lime_etl_spark.functions.numeric import dec, to_double
from lime_etl_spark.plans.registry import register
from lime_etl_spark.sources.readers import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_us: F.Column | None = None,
    gap_us: int = SESSION_GAP_US,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the
    time since the previous event of the same user exceeds ``gap_us``.

    Classic lag→flag→cumsum: both windows share one (user) shuffle.
    """
    ts_us = ts_us if ts_us is not None else F.unix_micros("ts")
    w = Window.partitionBy(user_col).orderBy(ts_us, tiebreak)
    prev = F.lag(ts_us).over(w)
    new_session = F.when(prev.isNull() | ((ts_us - prev) > gap_us), 1).otherwise(0)
    return events.withColumn("__ts_us", ts_us).withColumn(
        "session_seq",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


@register(
    "ev_daily_kpis",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS event_date,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
    FROM events
    GROUP BY strftime(ts, '%Y-%m-%d')
    ORDER BY event_date
    """,
    description="event-time daily tumbling aggregate",
)
def ev_daily_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("event_date"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            to_double(F.sum(dec("value", 2, 12))).alias("total_value"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("n_purchases"),
        )
        .orderBy("event_date")
    )


@register(
    "ev_sessionize",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), sessions AS (
        SELECT user_id, ts_us,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
           MAX(ts_us) - MIN(ts_us) AS duration_us
    FROM sessions
    GROUP BY user_id, session_seq
    """,
    description="gap-based sessionization (lag→flag→cumsum) + per-session rollup",
)
def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(ev)
    return (
        sess.groupBy("user_id", F.col("session_seq").cast("bigint").alias("session_seq"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("__ts_us").alias("start_us"),
            F.max("__ts_us").alias("end_us"),
            (F.max("__ts_us") - F.min("__ts_us")).alias("duration_us"),
        )
    )


@register(
    "ev_funnel",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view,
               MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS first_click,
               MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase
        FROM events GROUP BY user_id
    )
    SELECT CAST(SUM(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click > first_view THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after_view,
           CAST(SUM(CASE WHEN first_view IS NOT NULL AND first_click > first_view
                          AND first_purchase > first_click THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_after_click
    FROM per_user
    """,
    description="view→click→purchase ordered funnel over first-touch times",
)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("first_view"),
        F.min(F.when(F.col("event_type") == "click", us)).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("first_purchase"),
    )
    stage1 = F.col("first_view").isNotNull()
    stage2 = stage1 & (F.col("first_click") > F.col("first_view"))
    stage3 = stage2 & (F.col("first_purchase") > F.col("first_click"))
    return per_user.agg(
        F.sum(F.when(stage1, 1).otherwise(0)).cast("bigint").alias("n_view"),
        F.sum(F.when(stage2, 1).otherwise(0)).cast("bigint").alias("n_click_after_view"),
        F.sum(F.when(stage3, 1).otherwise(0)).cast("bigint").alias("n_purchase_after_click"),
    )


@register(
    "ev_json_props",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    description="JSON property extraction (JVM get_json_object) + aggregate",
)
def ev_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            (to_double(F.sum(k)) / to_double(F.count(F.lit(1)))).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@register(
    "ev_top_users_by_spend",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_spend,
           COUNT(*) AS n_purchases
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    ORDER BY total_spend DESC, user_id
    LIMIT 20
    """,
    description="top-N users by purchase spend",
)
def ev_top_users_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    return (
        ev.groupBy("user_id")
        .agg(
            to_double(F.sum(dec("value", 2, 12))).alias("total_spend"),
            F.count(F.lit(1)).alias("n_purchases"),
        )
        .orderBy(F.desc("total_spend"), "user_id")
        .limit(20)
    )


@register(
    "ev_cohort_retention",
    oracle="""
    WITH firstw AS (
        SELECT user_id, MIN(date_trunc('week', ts)) AS cw
        FROM events GROUP BY user_id
    ),
    sizes AS (SELECT cw, COUNT(*) AS cohort_size FROM firstw GROUP BY cw)
    SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', f.cw, date_trunc('week', e.ts)) / 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_users,
           CAST(COUNT(DISTINCT e.user_id) AS DOUBLE) / s.cohort_size AS retention
    FROM events e
    JOIN firstw f USING (user_id)
    JOIN sizes s ON s.cw = f.cw
    GROUP BY f.cw, week_offset, s.cohort_size
    ORDER BY cohort_week, week_offset
    """,
    description="weekly cohort retention matrix (first-activity cohorts)",
)
def ev_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention matrix: users grouped by first-activity week, tracked
    across subsequent weeks. Three aggregations, all keyed compatibly:
    first-week per user and the retention rollup both shuffle on
    user_id-derived keys, and cohort sizes are a tiny aggregate that
    broadcasts back onto the matrix. week_offset divides day-diffs of
    Monday-truncated weeks — exact multiples of 7, so the int cast is
    engine-safe; retention divides two exact BIGINTs in IEEE double."""
    ev = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    # persist: firstw feeds BOTH the retention join and the cohort-size
    # aggregate — uncached, each consumer repeats the full events scan
    # and per-user aggregation. One row per user: MEMORY_AND_DISK-safe
    # at any scale (always ≪ the events fact it summarizes).
    firstw = ev.groupBy("user_id").agg(F.min(wk).alias("cw")).persist()
    sizes = firstw.groupBy("cw").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        ev.join(firstw, "user_id")
        .groupBy(
            F.col("cw"),
            (F.datediff(wk, F.col("cw")) / 7).cast("bigint").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .join(F.broadcast(sizes), "cw")
        .select(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_users",
            (F.col("n_users").cast("double") / F.col("cohort_size")).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "ev_user_lifecycle",
    oracle="""
    WITH uw AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events
    ),
    lab AS (
        SELECT user_id, wk,
               LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
               LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
        FROM uw
    )
    SELECT strftime(wk, '%Y-%m-%d') AS week,
           CAST(SUM(CASE WHEN prev_wk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN prev_wk IS NOT NULL
                          AND date_diff('day', prev_wk, wk) = 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
           CAST(SUM(CASE WHEN prev_wk IS NOT NULL
                          AND date_diff('day', prev_wk, wk) > 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
           CAST(SUM(CASE WHEN next_wk IS NULL
                          OR date_diff('day', wk, next_wk) > 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_churning
    FROM lab
    GROUP BY wk
    ORDER BY week
    """,
    description="weekly active-user lifecycle: new / retained / resurrected / churning",
)
def ev_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly user-lifecycle accounting — the growth dashboard behind
    every events pipeline: for each Monday-truncated active week, how
    many users are new (first-ever week), retained (also active the
    immediately preceding week), resurrected (returning after a gap),
    and churning (no activity the following week; the final corpus
    week is all-churning by construction, which the dashboard reads
    as right-censored).

    One shuffle on user_id serves both window functions (lag + lead
    share the same partitioning and ordering), and the per-week
    rollup that follows is a tiny map-side-combined aggregate over
    at most |users| x |weeks| distinct rows. All counts are exact
    BIGINTs - no float determinism concerns cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("wk")
    lab = uw.select(
        "wk",
        F.lag("wk").over(w).alias("prev_wk"),
        F.lead("wk").over(w).alias("next_wk"),
    )
    gap_in = F.datediff(F.col("wk"), F.col("prev_wk"))
    gap_out = F.datediff(F.col("next_wk"), F.col("wk"))
    return (
        lab.groupBy(F.date_format("wk", "yyyy-MM-dd").alias("week"))
        .agg(
            F.sum(F.when(F.col("prev_wk").isNull(), 1).otherwise(0)).alias("n_new"),
            F.sum(
                F.when(F.col("prev_wk").isNotNull() & (gap_in == 7), 1).otherwise(0)
            ).alias("n_retained"),
            F.sum(
                F.when(F.col("prev_wk").isNotNull() & (gap_in > 7), 1).otherwise(0)
            ).alias("n_resurrected"),
            F.sum(
                F.when(F.col("next_wk").isNull() | (gap_out > 7), 1).otherwise(0)
            ).alias("n_churning"),
        )
        .orderBy("week")
    )


@register(
    "ev_rolling_kpis",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               COUNT(*) AS n_events,
               SUM(CAST(value AS DECIMAL(12,2))) AS day_value_dec
        FROM events GROUP BY d
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           n_events,
           CAST(day_value_dec AS DOUBLE) AS day_value,
           CAST(SUM(n_events) OVER w AS BIGINT) AS n_events_7d,
           CAST(SUM(day_value_dec) OVER w AS DOUBLE) AS value_7d
    FROM daily
    WINDOW w AS (ORDER BY d RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
    ORDER BY day
    """,
    description="7-day rolling KPIs over the daily aggregate (RANGE sliding window)",
)
def ev_rolling_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day KPIs — the smoothing every ops dashboard applies
    to daily series. Two stages with very different scales: the daily
    rollup is the big one (full events scan, map-side partial combine
    down to one row per day), and the sliding window then runs over
    that ~hundreds-of-rows frame — its single-partition global sort is
    free BECAUSE the reduction happened first; at no scale does raw
    data enter the window. RANGE (not ROWS) framing so missing days
    don't silently stretch the window to 7 *observed* days. The rolled
    value sum stays DECIMAL through the window (exact, order-free) and
    casts to double only on output — float window sums would disagree
    across engines on accumulation order."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value", 2, 12)).alias("day_value_dec"),
    )
    dayn = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    w = Window.orderBy(dayn).rangeBetween(-6, 0)
    return (
        daily.select(
            F.col("d"),
            "n_events",
            to_double(F.col("day_value_dec")).alias("day_value"),
            F.sum("n_events").over(w).cast("bigint").alias("n_events_7d"),
            to_double(F.sum("day_value_dec").over(w)).alias("value_7d"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n_events",
            "day_value",
            "n_events_7d",
            "value_7d",
        )
        .orderBy("day")
    )


ANOM_WIN_DAYS = 28
ANOM_Z = 3.0


@register(
    "ev_anomaly_zscore",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
        FROM events GROUP BY d
    ),
    stats AS (
        SELECT d, n,
               CAST(SUM(n) OVER w AS BIGINT) AS s1,
               CAST(SUM(n * n) OVER w AS BIGINT) AS s2,
               CAST(COUNT(*) OVER w AS BIGINT) AS cnt
        FROM daily
        WINDOW w AS (ORDER BY d RANGE BETWEEN INTERVAL {ANOM_WIN_DAYS - 1} DAYS PRECEDING
                     AND CURRENT ROW)
    ),
    scored AS (
        SELECT d, n,
               CAST(s1 AS DOUBLE) / cnt AS mean_28d,
               sqrt(CASE WHEN CAST(s2 AS DOUBLE) / cnt
                              - (CAST(s1 AS DOUBLE) / cnt) * (CAST(s1 AS DOUBLE) / cnt) > 0
                         THEN CAST(s2 AS DOUBLE) / cnt
                              - (CAST(s1 AS DOUBLE) / cnt) * (CAST(s1 AS DOUBLE) / cnt)
                         ELSE 0 END) AS std_28d
        FROM stats
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(n AS BIGINT) AS n_events, mean_28d, std_28d,
           CASE WHEN std_28d > 0 THEN (n - mean_28d) / std_28d ELSE 0.0 END AS zscore,
           CASE WHEN std_28d > 0
                 AND abs((n - mean_28d) / std_28d) >= {ANOM_Z} THEN 1 ELSE 0 END AS is_anomaly
    FROM scored
    ORDER BY day
    """,
    description="daily-volume anomaly z-scores vs a trailing 28-day window (bit-stable manual stddev)",
)
def ev_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly scoring — the alerting query a scheduled data-test
    batch runs on every ingest series. The trailing mean/std come from
    EXACT integer window sums (Σn, Σn², count) so the double-precision
    formula evaluates identically on any engine — built-in STDDEV
    aggregates would not be bit-reproducible (accumulation order), the
    manual sum-of-squares form is. Variance is clamped at 0 before
    sqrt (float cancellation can dip epsilon-negative; DuckDB raises
    on sqrt of a negative where Spark yields NaN).

    Scale: identical shape to ev_rolling_kpis — the full scan reduces
    to one row per day map-side; the window runs over that tiny
    frame."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    dayn = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    w = Window.orderBy(dayn).rangeBetween(-(ANOM_WIN_DAYS - 1), 0)
    stats = daily.select(
        "d",
        "n",
        F.sum("n").over(w).cast("bigint").alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).cast("bigint").alias("s2"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("cnt"),
    )
    mean = F.col("s1").cast("double") / F.col("cnt")
    var = F.col("s2").cast("double") / F.col("cnt") - mean * mean
    std = F.sqrt(F.when(var > 0, var).otherwise(F.lit(0.0)))
    scored = stats.select(
        "d", "n", mean.alias("mean_28d"), std.alias("std_28d")
    )
    z = (F.col("n") - F.col("mean_28d")) / F.col("std_28d")
    return (
        scored.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("n").cast("bigint").alias("n_events"),
            "mean_28d",
            "std_28d",
            F.when(F.col("std_28d") > 0, z).otherwise(F.lit(0.0)).alias("zscore"),
            F.when(
                (F.col("std_28d") > 0) & (F.abs(z) >= ANOM_Z), 1
            ).otherwise(0).alias("is_anomaly"),
        )
        .orderBy("day")
    )


@register(
    "ev_power_users",
    oracle="""
    WITH spend AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(value AS DECIMAL(12,2))
                             ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS total_spend,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    ),
    thresh AS (SELECT quantile_cont(total_spend, 0.95) AS p95 FROM spend)
    SELECT user_id, total_spend, n_events,
           total_spend - (SELECT p95 FROM thresh) AS above_p95_by
    FROM spend
    WHERE total_spend > (SELECT p95 FROM thresh)
    ORDER BY total_spend DESC, user_id
    """,
    description="users above the global p95 spend (exact percentile threshold via 1-row broadcast)",
)
def ev_power_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-tail selection by an exact percentile threshold — the
    'power user' / outlier-cohort query. The p95 is a 1-row aggregate
    broadcast back over the per-user spend frame (the q15/q11 scalar-
    subquery pattern — never a collect); Spark `percentile` and DuckDB
    `quantile_cont` compute the same interpolated value, verified
    hash-identical (same guarantee q_price_quantiles relies on). The
    per-user rollup is the only full-data shuffle; the threshold probe
    is a broadcast nested-loop over ONE row — constant cost.

    At 100 TB swap the exact percentile for approx_percentile and the
    threshold becomes sketch-mergeable map-side; exact needs the full
    spend vector in one place (documented trade, as in
    q_price_quantiles)."""
    ev = load_table(spark, sf_dir, "events")
    spend = ev.groupBy("user_id").agg(
        to_double(
            F.sum(
                F.when(F.col("event_type") == "purchase", dec("value", 2, 12)).otherwise(
                    F.lit(0).cast("decimal(12,2)")
                )
            )
        ).alias("total_spend"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    thresh = spend.agg(F.percentile("total_spend", 0.95).alias("p95"))
    return (
        spend.join(F.broadcast(thresh))
        .where(F.col("total_spend") > F.col("p95"))
        .select(
            "user_id",
            "total_spend",
            "n_events",
            (F.col("total_spend") - F.col("p95")).alias("above_p95_by"),
        )
        .orderBy(F.desc("total_spend"), "user_id")
    )


@register(
    "ev_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ) AS prev_type
        FROM events
    ),
    cnt AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n_transitions
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n_transitions,
           CAST(n_transitions AS DOUBLE)
               / SUM(n_transitions) OVER (PARTITION BY prev_type) AS p_next
    FROM cnt
    ORDER BY prev_type, next_type
    """,
    description="event-type Markov transition matrix (per-user lag, corpus rollup, row-normalized)",
)
def ev_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral model of the event stream: for every
    (previous event type → next event type) pair, the transition count
    and row-normalized probability. The per-user ordering lag and the
    later per-prev_type normalization are the funnel/churn modeling
    primitive (what usually follows a view? how absorbing is
    purchase?).

    Scale: ONE shuffle on user_id for the lag window; the rollup
    collapses to |event_types|² counter rows before the tiny
    normalization window, so the second exchange carries a handful of
    rows regardless of corpus size. p_next is one IEEE-exact division
    of exact integer counts (sum of bigint counts, not of doubles)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    cnt = (
        ev.select(
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    )
    norm = Window.partitionBy("prev_type")
    return cnt.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(norm)
        ).alias("p_next"),
    ).orderBy("prev_type", "next_type")


FUNNEL_WINDOW_US = 7 * 86_400 * 1_000_000  # 7 days in integer micros


@register(
    "ev_funnel_windowed",
    oracle=f"""
    WITH fv AS (
        SELECT user_id, MIN(epoch_us(ts)) AS first_view_us
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    fc AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS first_click_us
        FROM events e JOIN fv ON e.user_id = fv.user_id
        WHERE e.event_type = 'click'
          AND epoch_us(e.ts) >= fv.first_view_us
          AND epoch_us(e.ts) <= fv.first_view_us + {FUNNEL_WINDOW_US}
        GROUP BY e.user_id
    ),
    fp AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS first_purchase_us
        FROM events e JOIN fc ON e.user_id = fc.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(e.ts) >= fc.first_click_us
          AND epoch_us(e.ts) <= fc.first_click_us + {FUNNEL_WINDOW_US}
        GROUP BY e.user_id
    )
    SELECT fv.user_id, fv.first_view_us, fc.first_click_us, fp.first_purchase_us,
           fc.user_id IS NOT NULL AS converted_click,
           fp.user_id IS NOT NULL AS converted_purchase
    FROM fv
    LEFT JOIN fc ON fv.user_id = fc.user_id
    LEFT JOIN fp ON fv.user_id = fp.user_id
    ORDER BY fv.user_id
    """,
    description="view→click→purchase funnel with a bounded 7-day conversion window per stage",
)
def ev_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel with the constraint real attribution demands: each
    stage must fire within 7 days of the previous one (ev_funnel's
    unconstrained ordering credits a purchase months after the view).
    Timestamps stay integer microseconds end-to-end — the window
    arithmetic is exact, never float seconds.

    Scale: three aggregations and two left joins, ALL hashing on
    user_id — one logical partitioning reused across every stage (no
    re-shuffle between stages under AQE exchange reuse); each stage's
    input is pre-filtered by event type at the scan, so the joins
    carry per-stage cohorts, not the event firehose."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    fv = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(us).alias("first_view_us"))
    )
    fc = (
        ev.where(F.col("event_type") == "click")
        .join(fv, "user_id")
        .where((us >= F.col("first_view_us")) & (us <= F.col("first_view_us") + FUNNEL_WINDOW_US))
        .groupBy("user_id")
        .agg(F.min(us).alias("first_click_us"))
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .where((us >= F.col("first_click_us")) & (us <= F.col("first_click_us") + FUNNEL_WINDOW_US))
        .groupBy("user_id")
        .agg(F.min(us).alias("first_purchase_us"))
    )
    return (
        fv.join(fc, "user_id", "left")
        .join(fp, "user_id", "left")
        .select(
            "user_id",
            "first_view_us",
            "first_click_us",
            "first_purchase_us",
            F.col("first_click_us").isNotNull().alias("converted_click"),
            F.col("first_purchase_us").isNotNull().alias("converted_purchase"),
        )
        .orderBy("user_id")
    )


DOUBLE_FIRE_GAP_US = 3600 * 1_000_000  # 1 hour


@register(
    "dq_double_fire",
    oracle=f"""
    SELECT event_id, user_id, event_type, ts_us, prev_ts_us,
           ts_us - prev_ts_us AS gap_us
    FROM (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
               LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY epoch_us(ts), event_id
               ) AS prev_ts_us
        FROM events
    )
    WHERE prev_ts_us IS NOT NULL
      AND ts_us - prev_ts_us <= {DOUBLE_FIRE_GAP_US}
    ORDER BY event_id
    """,
    description="telemetry double-fire detector: repeated (user, type) events within one hour",
)
def dq_double_fire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instrumentation-bug detector: the same user re-emitting the same
    event type within an hour is the retry/double-mounted-handler
    signature — the inflation a KPI pipeline quarantines before
    aggregation (the exact-key streaming twin is dedup_stream's
    dropDuplicatesWithinWatermark; this batch audit measures what it
    would remove, and surfaces the gap distribution for tuning the
    watermark horizon).

    Scale: one lag window partitioned by (user, type) —
    high-cardinality partitioning, no global sort; gap arithmetic in
    integer microseconds."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id", "event_type").orderBy(us, "event_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            us.alias("ts_us"),
            F.lag(us).over(w).alias("prev_ts_us"),
        )
        .where(
            F.col("prev_ts_us").isNotNull()
            & ((F.col("ts_us") - F.col("prev_ts_us")) <= DOUBLE_FIRE_GAP_US)
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            "ts_us",
            "prev_ts_us",
            (F.col("ts_us") - F.col("prev_ts_us")).alias("gap_us"),
        )
        .orderBy("event_id")
    )


MAU_WINDOW_DAYS = 28


@register(
    "ev_dau_mau",
    oracle=f"""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    days AS (SELECT DISTINCT d FROM ud)
    SELECT days.d AS day,
           COUNT(DISTINCT CASE WHEN ud.d = days.d THEN ud.user_id END) AS dau,
           COUNT(DISTINCT ud.user_id) AS mau,
           CAST(COUNT(DISTINCT CASE WHEN ud.d = days.d THEN ud.user_id END) AS DOUBLE)
               / COUNT(DISTINCT ud.user_id) AS stickiness
    FROM days JOIN ud
      ON ud.d BETWEEN days.d - {MAU_WINDOW_DAYS - 1} AND days.d
    GROUP BY days.d
    ORDER BY day
    """,
    description="DAU / trailing-28d MAU stickiness per active day",
)
def ev_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement stickiness: DAU(d) / MAU(d) where MAU counts distinct
    users active in [d−27, d].

    A trailing distinct count cannot ride a sliding window (distinct
    state is not subtractable), and the naive day×user-day range join
    is O(days·|user-days|). Instead each DISTINCT (user, day) pair is
    exploded into the ≤28 observation days it contributes to — fan-out
    is a fixed 28× of the *reduced* pair set, then one groupBy does
    both distinct counts. The semi join keeps only days that actually
    had activity (matching the oracle's ``days`` CTE); active-day count
    is tiny, so it broadcasts.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    days = ud.select(F.col("d").alias("day")).distinct()
    obs = ud.select(
        "user_id",
        "d",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), MAU_WINDOW_DAYS - 1))
        ).alias("day"),
    ).join(F.broadcast(days), "day", "left_semi")
    # dau needs NO distinct: (user_id, d) pairs are distinct upstream,
    # so each user contributes exactly one row with d == day per day —
    # a plain conditional count is the same number, and dropping the
    # second distinct aggregate removes the Expand that doubled every
    # exploded row through the groupBy shuffle (guide §2.3, r10).
    dau = F.count(F.when(F.col("d") == F.col("day"), F.lit(1)))
    return (
        obs.groupBy("day")
        .agg(dau.alias("dau"), F.countDistinct("user_id").alias("mau"))
        .select(
            "day",
            "dau",
            "mau",
            (F.col("dau").cast("double") / F.col("mau")).alias("stickiness"),
        )
        .orderBy("day")
    )


@register(
    "ev_event_path3",
    oracle="""
    SELECT path, COUNT(*) AS n_paths, COUNT(DISTINCT user_id) AS n_users
    FROM (
        SELECT user_id,
               LAG(event_type, 2) OVER w || '>' || LAG(event_type, 1) OVER w
                   || '>' || event_type AS path
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    WHERE path IS NOT NULL
    GROUP BY path
    ORDER BY n_paths DESC, path
    """,
    description="3-step event-type path frequencies (behavioral trigrams)",
)
def ev_event_path3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top behavioral trigrams: consecutive 3-event type sequences per
    user, counted corpus-wide — the input to funnel discovery (which
    ordered paths actually occur, before you hand-pick one to measure
    with ev_funnel).

    One (user) shuffle feeds both lags; the rollup output is bounded by
    |types|³ regardless of corpus size, so the final agg is a
    counters-only exchange. NULL lag rows (first two events per user)
    drop, matching the oracle's WHERE.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    path = F.concat_ws(
        ">",
        F.lag("event_type", 2).over(w),
        F.lag("event_type", 1).over(w),
        F.col("event_type"),
    )
    # concat_ws skips NULLs, so guard on the oldest lag explicitly.
    return (
        ev.select(
            "user_id",
            F.when(F.lag("event_type", 2).over(w).isNotNull(), path).alias("path"),
        )
        .where(F.col("path").isNotNull())
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_paths"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_paths"), "path")
    )


_LATENCY_BUCKETS_US = (
    ("lt_1h", 3600 * 1_000_000),
    ("lt_1d", 24 * 3600 * 1_000_000),
    ("lt_7d", 7 * 24 * 3600 * 1_000_000),
)


@register(
    "ev_purchase_latency",
    oracle=f"""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view_us,
               MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase_us
        FROM events
        GROUP BY user_id
    )
    SELECT COUNT(*) AS n_converted,
           MIN(lat) AS min_latency_us,
           MAX(lat) AS max_latency_us,
           CAST(quantile_cont(lat, 0.5) AS BIGINT) AS p50_latency_us,
           {", ".join(
               f"CAST(SUM(CASE WHEN lat < {us} THEN 1 ELSE 0 END) AS BIGINT) AS n_{name}"
               for name, us in _LATENCY_BUCKETS_US
           )}
    FROM (
        SELECT first_purchase_us - first_view_us AS lat
        FROM firsts
        WHERE first_view_us IS NOT NULL AND first_purchase_us IS NOT NULL
          AND first_purchase_us >= first_view_us
    )
    """,
    description="first-view→first-purchase conversion latency distribution",
)
def ev_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: for every user whose first
    purchase follows their first view, the time between the two —
    the number an acquisition team watches move.

    ONE conditional-aggregation pass computes both firsts per user
    (no per-type self-join); converting users reduce to a single
    latency value each, and the summary is one global aggregate.
    Exact median here (the reduced set is per-user, not per-event);
    approx_percentile is the documented swap at extreme user counts.
    Integer-microsecond arithmetic throughout.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("first_view_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("first_purchase_us"),
    )
    lat = (
        firsts.where(
            F.col("first_view_us").isNotNull()
            & F.col("first_purchase_us").isNotNull()
            & (F.col("first_purchase_us") >= F.col("first_view_us"))
        )
        .select((F.col("first_purchase_us") - F.col("first_view_us")).alias("lat"))
    )
    aggs = [
        F.count(F.lit(1)).alias("n_converted"),
        F.min("lat").alias("min_latency_us"),
        F.max("lat").alias("max_latency_us"),
        F.percentile("lat", F.lit(0.5)).cast("bigint").alias("p50_latency_us"),
    ]
    for name, bound in _LATENCY_BUCKETS_US:
        aggs.append(
            F.sum(F.when(F.col("lat") < bound, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{name}")
        )
    return lat.agg(*aggs)


ATTRIB_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day lookback


@register(
    "ev_attribution_touches",
    oracle=f"""
    WITH purchases AS (
        SELECT event_id, user_id, epoch_us(ts) AS p_us
        FROM events WHERE event_type = 'purchase'
    ),
    views AS (
        SELECT user_id, event_id AS v_id, epoch_us(ts) AS v_us
        FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id AS purchase_id, p.user_id,
           COUNT(v.v_id) AS n_touches,
           MIN(v.v_us) AS first_touch_us,
           MAX(v.v_us) AS last_touch_us,
           CAST(MIN(v.v_id) FILTER (WHERE v.v_us = ft.min_us) AS BIGINT) AS first_touch_id
    FROM purchases p
    JOIN views v
      ON v.user_id = p.user_id
     AND v.v_us <= p.p_us AND v.v_us > p.p_us - {ATTRIB_WINDOW_US}
    JOIN (
        SELECT p2.event_id, MIN(v2.v_us) AS min_us
        FROM purchases p2 JOIN views v2
          ON v2.user_id = p2.user_id
         AND v2.v_us <= p2.p_us AND v2.v_us > p2.p_us - {ATTRIB_WINDOW_US}
        GROUP BY p2.event_id
    ) ft ON ft.event_id = p.event_id
    GROUP BY p.event_id, p.user_id, ft.min_us
    ORDER BY purchase_id
    """,
    description="multi-touch attribution profile: views within 7d of each purchase",
)
def ev_attribution_touches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution input table: for every purchase, the count and the
    first/last of the user's views inside the 7-day lookback — the
    touch profile any credit model (first/last/U-shaped) consumes.
    Deliberately emits touch STRUCTURE, not float credit: credit
    division (0.2/(n-2) style) belongs downstream where the model
    choice lives, and float credit sums are not order-reproducible.

    One (user) equi-join carrying the time-range predicate — the range
    rides the hash join as a post-probe filter, so there is exactly one
    fact shuffle pair and never a cartesian; the rollup then groups on
    purchase id. Skewed power-users split under AQE. The oracle needs a
    second scan to recover the first-touch id; Spark gets it free via
    min_by.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    us = F.unix_micros("ts")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", us.alias("p_us")
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("v_id"), us.alias("v_us")
    )
    joined = purchases.join(views, "user_id").where(
        (F.col("v_us") <= F.col("p_us"))
        & (F.col("v_us") > F.col("p_us") - ATTRIB_WINDOW_US)
    )
    return (
        joined.groupBy("purchase_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.min("v_us").alias("first_touch_us"),
            F.max("v_us").alias("last_touch_us"),
            F.min_by("v_id", F.struct("v_us", "v_id")).cast("bigint").alias("first_touch_id"),
        )
        .orderBy("purchase_id")
    )


BUCKET_US = 3600 * 1_000_000  # 1-hour interval-join buckets


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str = "start_us",
    l_end: str = "end_us",
    r_start: str = "start_us",
    r_end: str = "end_us",
    bucket_us: int = BUCKET_US,
    extra_pred: F.Column | None = None,
) -> DataFrame:
    """Generic RANGE (interval-overlap) join as a bucketed equi-join.

    Spark executes a bare ``a.start <= b.end AND b.start <= a.end``
    condition as a broadcast-nested-loop — O(L×R) comparisons, the
    join that dies first at scale. The standard fix (same trick as
    DuckDB/Postgres range-join optimizations): explode each interval
    into the fixed-width time buckets it covers, equi-join on the
    bucket (hash join!), then verify the exact overlap predicate.
    Cost: O((L+R)·buckets_per_interval) fan-out + one hash join — and
    two overlapping intervals always share the bucket containing
    max(start), so recall is exact.

    Each matching (left, right) row pair is emitted EXACTLY ONCE by
    anchoring it to that shared max(start) bucket instead of
    deduplicating after the join: a pair that overlaps in k buckets
    matches k times, but only the anchor bucket survives the filter.
    This removes the whole-pair-set ``distinct()`` (one Exchange + two
    HashAggregates over every joined row) the first implementation
    paid — guide §2.4, remove shuffles outright. True join semantics:
    duplicate input rows produce duplicate output pairs.

    Bucket width tunes fan-out vs selectivity: ~the median interval
    length is the usual choice (1h here, matching the 30-min session
    gap upper bound).
    """
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col(l_start) / bucket_us).cast("bigint"),
                (F.col(l_end) / bucket_us).cast("bigint"),
            )
        ),
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col(r_start) / bucket_us).cast("bigint"),
                (F.col(r_end) / bucket_us).cast("bigint"),
            )
        ),
    )
    # Anchor: the one bucket BOTH intervals provably explode into when
    # they overlap (max(start) lies inside both, and the truncating
    # bucket expression is monotonic, so its bucket is in both
    # sequences). Replaces the post-join distinct().
    anchor = (
        F.greatest(F.col(f"l.{l_start}"), F.col(f"r.{r_start}")) / bucket_us
    ).cast("bigint")
    cond = (
        (F.col(f"l.{l_start}") <= F.col(f"r.{r_end}"))
        & (F.col(f"r.{r_start}") <= F.col(f"l.{l_end}"))
        & (F.col("__bucket") == anchor)
    )
    if extra_pred is not None:
        cond = cond & extra_pred
    return (
        lb.alias("l")
        .join(rb.alias("r"), on="__bucket")
        .where(cond)
        .drop("__bucket")
    )


@register(
    "ev_concurrent_sessions",
    oracle=f"""
    WITH sess AS (
        SELECT user_id, session_seq, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
        FROM (
            SELECT user_id, ts_us,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM (
                SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                       CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                                 OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
            )
        )
        GROUP BY user_id, session_seq
    )
    SELECT a.user_id, CAST(a.session_seq AS BIGINT) AS session_seq,
           a.start_us, a.end_us,
           CAST(COUNT(b.user_id) AS BIGINT) AS n_concurrent
    FROM sess a LEFT JOIN sess b
      ON a.start_us <= b.end_us AND b.start_us <= a.end_us
     AND a.user_id <> b.user_id
    GROUP BY a.user_id, a.session_seq, a.start_us, a.end_us
    ORDER BY a.user_id, session_seq
    """,
    description="per-session concurrency via bucketed interval-overlap join (range join)",
)
def ev_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many other users' sessions overlap each session — the
    concurrency/load profile (and the engine's RANGE-join showcase:
    the oracle writes the naive O(n²) overlap join; the Spark plan is
    the bucketed hash join from :func:`interval_overlap_join`, which
    is the only form that survives when sessions number in the
    billions).

    LEFT join semantics (sessions with zero overlap appear with 0)
    come for free WITHOUT rejoining onto the session table: same-user
    sessions are disjoint by construction (a new session only starts
    after a silence > the gap, so session k+1's first event is
    strictly later than session k's last), hence the oracle's
    ``a.user_id <> b.user_id`` exclusion removes exactly the self
    pair and nothing else. So we count ALL overlapping pairs — every
    session overlaps itself, so every session appears — and subtract
    one. ``start_us``/``end_us`` ride along in the pair row, which
    deletes the former LeftOuter SortMergeJoin back onto ``sess``
    (2 Exchanges + 2 Sorts) and the separate counts aggregate
    (guide §2.4).
    """
    ev = load_table(spark, sf_dir, "events")
    sess = (
        sessionize(ev)
        .groupBy("user_id", F.col("session_seq").cast("bigint").alias("session_seq"))
        .agg(F.min("__ts_us").alias("start_us"), F.max("__ts_us").alias("end_us"))
        .persist()
    )
    pairs = interval_overlap_join(
        sess.select(
            F.col("user_id").alias("a_user"),
            F.col("session_seq").alias("a_seq"),
            F.col("start_us").alias("a_start"),
            F.col("end_us").alias("a_end"),
        ),
        sess.select(
            F.col("user_id").alias("b_user"),
            F.col("start_us").alias("b_start"),
            F.col("end_us").alias("b_end"),
        ),
        l_start="a_start",
        l_end="a_end",
        r_start="b_start",
        r_end="b_end",
    )
    return (
        pairs.groupBy(
            F.col("a_user").alias("user_id"),
            F.col("a_seq").alias("session_seq"),
            F.col("a_start").alias("start_us"),
            F.col("a_end").alias("end_us"),
        )
        .agg((F.count(F.lit(1)) - F.lit(1)).cast("bigint").alias("n_concurrent"))
        .orderBy("user_id", "session_seq")
    )


@register(
    "ev_audience_overlap",
    oracle="""
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_both,
           MAX(na.n) AS n_a, MAX(nb.n) AS n_b,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(MAX(na.n) + MAX(nb.n) - COUNT(*) AS DOUBLE) AS jaccard
    FROM tu a
    JOIN tu b ON a.user_id = b.user_id AND a.event_type < b.event_type
    JOIN (SELECT event_type, COUNT(*) AS n FROM tu GROUP BY event_type) na
      ON na.event_type = a.event_type
    JOIN (SELECT event_type, COUNT(*) AS n FROM tu GROUP BY event_type) nb
      ON nb.event_type = b.event_type
    GROUP BY a.event_type, b.event_type
    ORDER BY type_a, type_b
    """,
    description="audience overlap: Jaccard of distinct-user sets per event-type pair",
)
def ev_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which behaviors share an audience: |users(A)∩users(B)| /
    |users(A)∪users(B)| for every event-type pair — the segmentation
    input for cross-sell and the sanity check that a new event type
    isn't just an alias of an old one (Jaccard ≈ 1).

    The fact reduces to DISTINCT (type, user) pairs first; the
    self-join hashes on user_id (each user contributes |their types|²
    pairs — bounded by the tiny type alphabet, never by event count),
    and the per-type audience sizes broadcast onto the |types|²
    rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct().persist()
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    na = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "ev_weekday_hour_profile",
    oracle="""
    SELECT strftime(ts, '%a') AS dow,
           CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY strftime(ts, '%a'), CAST(EXTRACT(hour FROM ts) AS INT)
    ORDER BY dow, hour
    """,
    description="day-of-week × hour activity heatmap input (seasonality profile)",
)
def ev_weekday_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality surface: events and distinct users per
    (weekday, hour) cell — capacity planning, anomaly baselines, and
    the scheduling input for when to run heavy batches. Weekday is the
    locale-independent 3-letter NAME ('Mon'), not a number: Spark and
    DuckDB disagree on whether Sunday is 0, 1 or 7, names are the
    cross-engine-safe spelling. 7×24-bounded output; counters-only
    shuffle with map-side combine.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format("ts", "E").alias("dow"),
            F.hour("ts").cast("int").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("dow", "hour")
    )


@register(
    "ev_bounce_rate",
    oracle=f"""
    WITH sess AS (
        SELECT user_id, session_seq, MIN(ts_us) AS start_us, COUNT(*) AS n_events
        FROM (
            SELECT user_id, ts_us,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM (
                SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                       CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                                 OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
            )
        )
        GROUP BY user_id, session_seq
    )
    SELECT CAST(to_timestamp(start_us // 1000000) AS DATE) AS day,
           COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS bounce_rate
    FROM sess
    GROUP BY CAST(to_timestamp(start_us // 1000000) AS DATE)
    ORDER BY day
    """,
    description="daily bounce rate: single-event sessions / sessions, on the session rollup",
)
def ev_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate per day (sessions that never got a second event) —
    the engagement-health headline that rides the SAME sessionization
    the other session metrics use, so definitions can't drift between
    dashboards. Day attribution is by session START (a session belongs
    to the day it began). One user shuffle for sessionize, then
    counters; the rate is one exact integer division.
    """
    ev = load_table(spark, sf_dir, "events")
    sess = (
        sessionize(ev)
        .groupBy("user_id", "session_seq")
        .agg(F.min("__ts_us").alias("start_us"), F.count(F.lit(1)).alias("n_events"))
    )
    day = F.to_date(F.timestamp_micros(F.col("start_us")))
    return (
        sess.groupBy(day.alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_bounces"),
        )
        .select(
            "day",
            "n_sessions",
            "n_bounces",
            (F.col("n_bounces").cast("double") / F.col("n_sessions")).alias("bounce_rate"),
        )
        .orderBy("day")
    )
