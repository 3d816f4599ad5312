"""ETL primitives — the data operations lime-etl jobs exist to perform.

lime-etl orchestrates jobs that do full/incremental refreshes of
destination tables and then run data tests (reference
lime_etl/domain/job_spec.py:49 ``run``/``test``; the admin example in
lime_etl/service/admin/delete_old_logs.py purges + asserts). Here each
of those data operations is a first-class distributed operator:

- ``snapshot_diff``: keyed diff of two table snapshots → added /
  deleted / changed rows. One full-outer shuffle join on the key; at
  100 TB both sides should be bucketed on the key so the join is
  shuffle-free; compare columns null-safely (no driver collect).
- ``upsert``: latest-wins merge of an increment into a base table via
  left-anti + union — no global window sort, so it scales linearly.
- ``scd2``: slowly-changing-dimension history from a change stream
  via lead() over (key, ts) — one shuffle on the key.
- ``dedup_latest``: keep the newest row per key (row_number desc).
- data-quality checks (row counts, referential orphans, null/dup
  stats) — lime-etl's ``JobTestResult`` analogs as DataFrames.

The registered ``etl_*``/``dq_*`` queries exercise these operators on
deterministic synthetic snapshots derived from the driver tables so a
DuckDB oracle can replay them exactly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lime_etl_spark.functions.numeric import dec, to_double
from lime_etl_spark.plans.registry import register
from lime_etl_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# generic operators
# ---------------------------------------------------------------------------


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed diff: one row per key present in either snapshot, with
    ``change_type`` ∈ {added, deleted, changed, unchanged}.

    Scale: a single full-outer hash join on the keys. With both
    snapshots bucketed/partitioned on the key this is co-located; AQE
    handles skew. Column compare is expression-level (JVM codegen).
    """
    compare_cols = compare_cols or [c for c in old.columns if c not in keys]
    o = old.select(*keys, *[F.col(c).alias(f"__old_{c}") for c in compare_cols])
    n = new.select(*keys, *[F.col(c).alias(f"__new_{c}") for c in compare_cols])
    joined = o.join(n, on=keys, how="full_outer")
    old_present = reduce(
        lambda a, b: a | b, [F.col(f"__old_{c}").isNotNull() for c in compare_cols]
    )
    new_present = reduce(
        lambda a, b: a | b, [F.col(f"__new_{c}").isNotNull() for c in compare_cols]
    )
    any_change = reduce(
        lambda a, b: a | b,
        [~F.col(f"__old_{c}").eqNullSafe(F.col(f"__new_{c}")) for c in compare_cols],
    )
    change = (
        F.when(~old_present & new_present, F.lit("added"))
        .when(old_present & ~new_present, F.lit("deleted"))
        .when(any_change, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        *keys,
        change.alias("change_type"),
        *[F.col(f"__old_{c}").alias(f"old_{c}") for c in compare_cols],
        *[F.col(f"__new_{c}").alias(f"new_{c}") for c in compare_cols],
    )


def upsert(base: DataFrame, increment: DataFrame, keys: list[str]) -> DataFrame:
    """Latest-wins merge: increment rows replace base rows on key.

    left-anti + union instead of window-over-union: two narrow
    shuffles on the key, no sort, partial aggregation unaffected.
    """
    survivors = base.join(increment.select(*keys), on=keys, how="left_anti")
    return survivors.unionByName(increment)


def scd2(
    changes: DataFrame, keys: list[str], ts_col: Column, tiebreak: list[str]
) -> DataFrame:
    """Build SCD-2 validity intervals from a change stream.

    ``ts_col`` must be a monotonic BIGINT event time (we use integer
    microseconds everywhere — float seconds are not reproducible).
    """
    w = Window.partitionBy(*keys).orderBy(ts_col, *tiebreak)
    return (
        changes.withColumn("effective_from_us", ts_col)
        .withColumn("effective_to_us", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("effective_to_us").isNull())
    )


def dedup_latest(df: DataFrame, keys: list[str], order_cols: list[Column]) -> DataFrame:
    """Keep exactly one newest row per key (deterministic tie-break)."""
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def referential_orphans(
    child: DataFrame, parent: DataFrame, fk: str, pk: str
) -> DataFrame:
    """Rows in child with no matching parent (left-anti join)."""
    return child.join(parent, child[fk] == parent[pk], "left_anti")


# ---------------------------------------------------------------------------
# deterministic synthetic snapshots (oracle-replayable)
# ---------------------------------------------------------------------------


def _old_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # "previous" snapshot: rows with o_orderkey % 13 == 3 do not exist yet
    return load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 13 != 3)


def _new_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # "current" snapshot: %10==0 rows deleted; %7==0 rows repriced +10%
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 != 0)
    repriced = to_double(dec("o_totalprice", 2, 12) * F.lit("1.1").cast("decimal(2,1)"))
    return orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 7 == 0, repriced).otherwise(F.col("o_totalprice")),
    )


_OLD_SQL = "SELECT * FROM orders WHERE o_orderkey % 13 <> 3"
_NEW_SQL = """
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % 7 = 0
                THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(2,1)) AS DOUBLE)
                ELSE o_totalprice END AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 10 <> 0
"""


@register(
    "etl_snapshot_diff",
    oracle=f"""
    WITH old AS ({_OLD_SQL}), new AS ({_NEW_SQL})
    SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'added'
                WHEN new.o_orderkey IS NULL THEN 'deleted'
                WHEN old.o_totalprice IS DISTINCT FROM new.o_totalprice
                  OR old.o_orderstatus IS DISTINCT FROM new.o_orderstatus THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           old.o_totalprice AS old_o_totalprice,
           new.o_totalprice AS new_o_totalprice
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    WHERE CASE WHEN old.o_orderkey IS NULL THEN 'added'
               WHEN new.o_orderkey IS NULL THEN 'deleted'
               WHEN old.o_totalprice IS DISTINCT FROM new.o_totalprice
                 OR old.o_orderstatus IS DISTINCT FROM new.o_orderstatus THEN 'changed'
               ELSE 'unchanged' END <> 'unchanged'
    """,
    description="keyed snapshot diff → added/deleted/changed (full-outer hash compare)",
)
def etl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    diff = snapshot_diff(
        _old_orders(spark, sf_dir),
        _new_orders(spark, sf_dir),
        keys=["o_orderkey"],
        compare_cols=["o_totalprice", "o_orderstatus"],
    )
    return diff.where(F.col("change_type") != "unchanged").select(
        "o_orderkey", "change_type", "old_o_totalprice", "new_o_totalprice"
    )


@register(
    "etl_upsert_incremental",
    oracle=f"""
    WITH base AS (SELECT o_orderkey, o_totalprice FROM ({_OLD_SQL})),
         inc  AS (SELECT o_orderkey, o_totalprice FROM ({_NEW_SQL}) new
                  WHERE new.o_orderdate >= TIMESTAMP '1999-01-01')
    SELECT o_orderkey, o_totalprice, 'inc' AS src FROM inc
    UNION ALL
    SELECT b.o_orderkey, b.o_totalprice, 'base' AS src
    FROM base b WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM inc)
    """,
    description="latest-wins keyed upsert via anti-join + union",
)
def etl_upsert_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _old_orders(spark, sf_dir).select("o_orderkey", "o_totalprice").withColumn(
        "src", F.lit("base")
    )
    inc = (
        _new_orders(spark, sf_dir)
        .where(F.col("o_orderdate") >= "1999-01-01")
        .select("o_orderkey", "o_totalprice")
        .withColumn("src", F.lit("inc"))
    )
    return upsert(base, inc, keys=["o_orderkey"])


@register(
    "etl_scd2_rebuild",
    oracle="""
    SELECT user_id, value,
           epoch_us(ts) AS effective_from_us,
           LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS effective_to_us,
           LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL AS is_current
    FROM events WHERE event_type = 'purchase'
    """,
    description="SCD-2 validity intervals from a change stream (lead over key,ts)",
)
def etl_scd2_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    out = scd2(
        ev.select("user_id", "value", "ts", "event_id"),
        keys=["user_id"],
        ts_col=F.unix_micros("ts"),
        tiebreak=["event_id"],
    )
    return out.select("user_id", "value", "effective_from_us", "effective_to_us", "is_current")


@register(
    "etl_dedup_latest",
    oracle="""
    SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM (
        SELECT user_id, event_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    description="newest row per key (deterministic dedup)",
)
def etl_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = dedup_latest(
        ev, keys=["user_id"], order_cols=[F.unix_micros("ts").desc(), F.col("event_id").desc()]
    )
    return out.select("user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us"))


# ---------------------------------------------------------------------------
# data-quality checks (lime-etl JobTestResult analogs)
# ---------------------------------------------------------------------------

_DQ_TABLES = ("orders", "lineitem", "customer", "part", "supplier", "events", "documents")


@register(
    "dq_row_counts",
    oracle=" UNION ALL ".join(
        f"SELECT '{t}' AS table_name, COUNT(*) AS n_rows FROM {t}" for t in _DQ_TABLES
    ),
    description="per-table row counts (data-test primitive)",
)
def dq_row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    dfs = [
        load_table(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
        )
        for t in _DQ_TABLES
    ]
    return reduce(lambda a, b: a.unionByName(b), dfs)


@register(
    "dq_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS check_name,
           (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS n_orphans
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT COUNT(*) FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
    UNION ALL
    SELECT 'lineitem->supplier',
           (SELECT COUNT(*) FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
    """,
    description="FK orphan counts via left-anti joins",
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    checks = [
        ("lineitem->orders", referential_orphans(li, orders, "l_orderkey", "o_orderkey")),
        ("orders->customer", referential_orphans(orders, cust, "o_custkey", "c_custkey")),
        ("lineitem->part", referential_orphans(li, part, "l_partkey", "p_partkey")),
        ("lineitem->supplier", referential_orphans(li, supp, "l_suppkey", "s_suppkey")),
    ]
    dfs = [
        df.agg(F.lit(name).alias("check_name"), F.count(F.lit(1)).alias("n_orphans"))
        for name, df in checks
    ]
    return reduce(lambda a, b: a.unionByName(b), dfs)


@register(
    "dq_null_uniqueness",
    oracle="""
    SELECT 'orders' AS table_name, 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           COUNT(DISTINCT o_orderkey) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'customer', 'c_custkey', COUNT(*),
           CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT c_custkey)
    FROM customer
    UNION ALL
    SELECT 'events', 'user_id', COUNT(*),
           CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT user_id)
    FROM events
    UNION ALL
    SELECT 'documents', 'text', COUNT(*),
           CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT text)
    FROM documents
    """,
    description="null-rate + key-uniqueness stats (lime-etl test() analog)",
)
def dq_null_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    specs = [
        ("orders", "o_orderkey"),
        ("customer", "c_custkey"),
        ("events", "user_id"),
        ("documents", "text"),
    ]
    dfs = [
        load_table(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"),
            F.lit(c).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
        )
        for t, c in specs
    ]
    return reduce(lambda a, b: a.unionByName(b), dfs)


def tombstone_delete(base: DataFrame, tombstones: DataFrame, keys: list[str]) -> DataFrame:
    """Propagate deletions: drop every base row whose key appears in
    the tombstone set (GDPR erasure, retention purges). LEFT ANTI
    join — the tombstone side is typically small (a deletion request
    table) and broadcasts; the base never shuffles."""
    return base.join(F.broadcast(tombstones.select(*keys).distinct()), keys, "left_anti")


@register(
    "etl_tombstone_delete",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
           CAST(SUM(CASE WHEN o_orderkey % 97 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    description="deletion propagation audit: anti/semi join against a tombstone table",
)
def etl_tombstone_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-propagation audit: per priority, how many orders a
    tombstone request (synthetic: every 97th key) removes vs keeps.
    The operator path is REAL anti/semi joins against a tombstone
    DataFrame (broadcast, base side unshuffled) — the oracle merely
    restates the membership test arithmetically."""
    orders = load_table(spark, sf_dir, "orders")
    tomb = orders.where(F.col("o_orderkey") % 97 == 0).select("o_orderkey")
    kept = (
        tombstone_delete(orders, tomb, ["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    deleted = (
        orders.join(F.broadcast(tomb), ["o_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_deleted"))
    )
    return (
        kept.join(deleted, "o_orderpriority", "full_outer")
        .select(
            "o_orderpriority",
            F.coalesce("n_deleted", F.lit(0)).alias("n_deleted"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "dq_freshness",
    oracle="""
    SELECT 'events' AS table_name, strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS max_event_time,
           COUNT(*) AS n_rows
    FROM events
    UNION ALL
    SELECT 'lineitem', strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S'), COUNT(*) FROM lineitem
    UNION ALL
    SELECT 'orders', strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S'), COUNT(*) FROM orders
    ORDER BY table_name
    """,
    description="data-test: freshness (max event time) per time-bearing table",
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness probe — the staleness alert every scheduled lime-etl
    batch wants next to its row-count test: latest event time per
    time-bearing table. One scalar agg per table on the pruned time
    column only (min/max parquet footer statistics make this a
    metadata-speed scan at 100 TB)."""
    from functools import reduce

    specs = [("events", "ts"), ("lineitem", "l_shipdate"), ("orders", "o_orderdate")]
    dfs = [
        load_table(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"),
            F.date_format(F.max(c), "yyyy-MM-dd HH:mm:ss").alias("max_event_time"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        for t, c in specs
    ]
    return reduce(lambda a, b: a.unionByName(b), dfs).orderBy("table_name")


from lime_etl_spark.operators.training import _bucket_sql, hash_bucket  # noqa: E402

DRIFT_WIDTH = 100
DRIFT_MAX = 2000  # lengths at/above this collapse into the overflow bucket


@register(
    "dq_distribution_drift",
    oracle=f"""
    WITH halves AS (
        SELECT CASE WHEN {_bucket_sql("doc_id", 100)} < 50 THEN 0 ELSE 1 END AS half,
               CASE WHEN n_chars >= {DRIFT_MAX} THEN {DRIFT_MAX // DRIFT_WIDTH}
                    ELSE CAST(FLOOR(CAST(n_chars AS DOUBLE) / {DRIFT_WIDTH}.0) AS BIGINT)
               END AS bucket
        FROM documents
    ),
    counts AS (
        SELECT bucket,
               CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS base_n,
               CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cur_n
        FROM halves GROUP BY bucket
    )
    SELECT bucket, base_n, cur_n,
           CAST(base_n AS DOUBLE) / CAST(SUM(base_n) OVER () AS DOUBLE) AS base_rate,
           CAST(cur_n AS DOUBLE) / CAST(SUM(cur_n) OVER () AS DOUBLE) AS cur_rate,
           CAST(cur_n AS DOUBLE) / CAST(SUM(cur_n) OVER () AS DOUBLE)
             - CAST(base_n AS DOUBLE) / CAST(SUM(base_n) OVER () AS DOUBLE) AS rate_delta
    FROM counts
    ORDER BY bucket
    """,
    description="distribution-drift profile: per-bucket rate delta between two corpus halves",
)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift data test: bucket the n_chars distribution of
    two deterministic corpus halves (md5-bucket split standing in for
    baseline-vs-current ingests) and report per-bucket counts and
    rate deltas. This is the profile a drift monitor (PSI / KS) is
    computed from; we surface per-bucket deltas rather than a single
    PSI scalar because ln() is not bit-stable cross-engine while
    exact-count ratios and their differences are.

    Scale: the scan reduces map-side to <= n_buckets x 2 counters, so
    the groupBy ships ~21 rows per task; the unpartitioned window for
    the totals runs on that already-tiny aggregate (single partition
    of ~21 rows at ANY corpus scale - the reduction happened first)."""
    docs = load_table(spark, sf_dir, "documents")
    half = F.when(hash_bucket(F.col("doc_id"), 100) < 50, 0).otherwise(1)
    nc = F.col("n_chars").cast("double")
    bucket = (
        F.when(F.col("n_chars") >= DRIFT_MAX, DRIFT_MAX // DRIFT_WIDTH)
        .otherwise(F.floor(nc / DRIFT_WIDTH).cast("bigint"))
        .cast("bigint")
    )
    counts = (
        docs.select(half.alias("half"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("base_n"),
            F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("cur_n"),
        )
    )
    w = Window.partitionBy()
    base_rate = F.col("base_n").cast("double") / F.sum("base_n").over(w).cast("double")
    cur_rate = F.col("cur_n").cast("double") / F.sum("cur_n").over(w).cast("double")
    return counts.select(
        "bucket",
        "base_n",
        "cur_n",
        base_rate.alias("base_rate"),
        cur_rate.alias("cur_rate"),
        (cur_rate - base_rate).alias("rate_delta"),
    ).orderBy("bucket")


# Accepted-value domains (the dbt-style "accepted_values" data test).
ACCEPTED: tuple[tuple[str, str, tuple[str, ...]], ...] = (
    ("orders", "o_orderstatus", ("O", "F", "P")),
    ("lineitem", "l_returnflag", ("R", "A", "N")),
    ("lineitem", "l_linestatus", ("O", "F")),
    ("events", "event_type", ("view", "click", "purchase", "signup", "error")),
    ("documents", "lang", ("en", "es", "de", "fr", "zh")),
)


@register(
    "dq_accepted_values",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{t}.{c}' AS check_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN {c} IN ({", ".join(repr(v) for v in vals)})
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_violations
    FROM {t}"""
        for t, c, vals in ACCEPTED
    )
    + "\nORDER BY check_name",
    description="data-test: accepted-value domain checks per coded column",
)
def dq_accepted_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain validation for every low-cardinality coded column — the
    `accepted_values` test a lime-etl job's ``test()`` hand-writes
    (reference job_spec.py:100 returns SimpleTestResults; DataTestJob
    wires this operator into that protocol). One scalar conditional
    aggregate per table: a full scan of just the checked column with
    map-side combine to a single row — no shuffle of data, only of
    per-task counters, at any scale. NULL counts as a violation (IN
    yields NULL, not TRUE)."""
    frames = []
    for t, c, vals in ACCEPTED:
        ok = F.col(c).isin(*vals)
        frames.append(
            load_table(spark, sf_dir, t).agg(
                F.lit(f"{t}.{c}").alias("check_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(ok, 0).otherwise(1)).cast("bigint").alias("n_violations"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), frames).orderBy("check_name")


@register(
    "etl_scd2_pit_join",
    oracle="""
    WITH dim AS (
        SELECT user_id, value,
               epoch_us(ts) AS f,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS t
        FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id, epoch_us(c.ts) AS click_us,
           d.value AS active_value, d.f AS version_from_us
    FROM events c JOIN dim d ON c.user_id = d.user_id
         AND epoch_us(c.ts) >= d.f AND (d.t IS NULL OR epoch_us(c.ts) < d.t)
    WHERE c.event_type = 'click'
    ORDER BY event_id
    """,
    description="point-in-time join: each fact row matched to the SCD2 dimension version valid at its event time",
)
def etl_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) dimension lookup — the query SCD-2 history
    exists to serve: each click joined to the purchase-value version
    whose [effective_from, effective_to) interval contains the click
    time. Clicks before a user's first version drop (inner join).

    Scale: the join key is the EQUI half (user_id) — Spark hashes on
    it and the validity-interval predicate evaluates inside the join,
    so this is one key shuffle, not a range-join explosion; version
    counts per key are small by construction (dimension history). At
    100 TB, bucket both sides on the key and the shuffle disappears
    too. Intervals are half-open integer micros — zero-width versions
    (same-timestamp changes) match nothing, identically on both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    dim = scd2(
        ev.where(F.col("event_type") == "purchase").select(
            "user_id", "value", "ts", "event_id"
        ),
        keys=["user_id"],
        ts_col=F.unix_micros("ts"),
        tiebreak=["event_id"],
    ).select(
        F.col("user_id").alias("d_user_id"),
        F.col("value").alias("active_value"),
        F.col("effective_from_us").alias("version_from_us"),
        F.col("effective_to_us").alias("version_to_us"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", F.unix_micros("ts").alias("click_us")
    )
    return (
        clicks.join(
            dim,
            (F.col("user_id") == F.col("d_user_id"))
            & (F.col("click_us") >= F.col("version_from_us"))
            & (
                F.col("version_to_us").isNull()
                | (F.col("click_us") < F.col("version_to_us"))
            ),
        )
        .select("event_id", "user_id", "click_us", "active_value", "version_from_us")
        .orderBy("event_id")
    )


def cdc_apply(
    base: DataFrame,
    changelog: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply an insert/update/delete changelog to a base snapshot —
    MERGE semantics, the general form of :func:`upsert` (which cannot
    express deletes): per key the highest-``seq_col`` change wins;
    an op of ``'D'`` removes the key; any other op's row becomes the
    new version; base rows with no change pass through.

    Scale: two hash ops on the key, no sort-merge — the per-key
    latest pick is a row_number window over the changelog ONLY
    (changelogs are increments, orders of magnitude smaller than the
    base), and the base side is one left-anti hash join; at 100 TB
    the base is never windowed, only probed.
    """
    latest = dedup_latest(
        changelog, keys, [F.col(seq_col).desc()]
    )
    survivors = base.join(changelog.select(*keys).distinct(), keys, "left_anti")
    applied = latest.where(F.col(op_col) != "D").drop(seq_col, op_col)
    return survivors.unionByName(applied)


_CDC_NEW_KEY_OFFSET = 100_000_000


def _orders_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic CDC feed over orders (oracle-replayable):
    %10==1 keys get TWO updates (seq 1: +10, seq 2: +20 — latest must
    win), %10==2 one update (+5), %10==0 a delete, %10==7 an insert
    under a fresh key. Built in ONE scan: each row emits an inline
    array of change structs and explodes it — never a 4-way union of
    projections of the same table (§6 rule: unions re-run the scan
    per branch)."""
    o = load_table(spark, sf_dir, "orders")
    key, price = F.col("o_orderkey"), F.col("o_totalprice")

    def entry(k: Column, seq: int, op: str, p: Column) -> Column:
        return F.struct(
            k.cast("bigint").alias("o_orderkey"),
            F.lit(seq).cast("bigint").alias("seq"),
            F.lit(op).alias("op"),
            p.cast("double").alias("o_totalprice"),
        )

    m = key % 10
    empty = F.array().cast(
        "array<struct<o_orderkey:bigint,seq:bigint,op:string,o_totalprice:double>>"
    )
    arr = (
        F.when(m == 1, F.array(entry(key, 1, "U", price + 10.0), entry(key, 2, "U", price + 20.0)))
        .when(m == 2, F.array(entry(key, 1, "U", price + 5.0)))
        .when(m == 0, F.array(entry(key, 1, "D", price)))
        .when(m == 7, F.array(entry(key + _CDC_NEW_KEY_OFFSET, 1, "I", price)))
        .otherwise(empty)
    )
    return o.select(F.explode(arr).alias("c")).select("c.*")


_CDC_CHG_SQL = f"""
    SELECT o_orderkey, CAST(1 AS BIGINT) AS seq, 'U' AS op,
           o_totalprice + 10.0 AS o_totalprice
    FROM orders WHERE o_orderkey % 10 = 1
    UNION ALL
    SELECT o_orderkey, CAST(2 AS BIGINT), 'U', o_totalprice + 20.0
    FROM orders WHERE o_orderkey % 10 = 1
    UNION ALL
    SELECT o_orderkey, CAST(1 AS BIGINT), 'U', o_totalprice + 5.0
    FROM orders WHERE o_orderkey % 10 = 2
    UNION ALL
    SELECT o_orderkey, CAST(1 AS BIGINT), 'D', o_totalprice
    FROM orders WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT o_orderkey + {_CDC_NEW_KEY_OFFSET}, CAST(1 AS BIGINT), 'I', o_totalprice
    FROM orders WHERE o_orderkey % 10 = 7
"""


@register(
    "etl_cdc_merge",
    oracle=f"""
    WITH chg AS ({_CDC_CHG_SQL}),
    latest AS (
        SELECT o_orderkey, op, o_totalprice FROM (
            SELECT o_orderkey, op, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
            FROM chg
        ) WHERE rn = 1
    )
    SELECT b.o_orderkey, b.o_totalprice
    FROM orders b
    WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM chg)
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM latest WHERE op <> 'D'
    """,
    description="I/U/D changelog MERGE onto a base snapshot (latest-seq wins, deletes drop)",
)
def etl_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final table state after applying a CDC changelog (inserts,
    multi-version updates, deletes) to the orders snapshot — the
    lakehouse MERGE INTO primitive, and the incremental-refresh path
    a lime-etl job would run against a transactional source
    (reference job pattern: lime_etl/domain/job_spec.py run() doing
    arbitrary ETL — here the ETL is the canonical one)."""
    base = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    chg = _orders_changelog(spark, sf_dir)
    return cdc_apply(base, chg, keys=["o_orderkey"])


from lime_etl_spark.functions.text import shingle_int, shingle_int_sql  # noqa: E402

# (table, row-identity columns) for the parity checksum. Columns are
# integers / strings / timestamps only: doubles are excluded because
# double→string rendering differs across engines, and the identity of
# a row is its keys + coded attributes anyway.
_CHECKSUM_SPECS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("orders", ("o_orderkey", "o_orderstatus", "o_orderpriority")),
    ("customer", ("c_custkey", "c_name", "c_mktsegment")),
    ("lineitem", ("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")),
)


# Mersenne prime 2^61-1: the checksum field modulus. Keeps the final
# checksum int64-representable on every engine (Spark emits BIGINT,
# DuckDB's HUGEINT sum reduces to BIGINT after the mod) while the sum
# itself stays exact in decimal(38,0) / int128 internally.
_CHECKSUM_MOD = 2305843009213693951


def table_checksum(df: DataFrame, cols: tuple[str, ...], table_name: str) -> DataFrame:
    """One-row (table_name, n_rows, row_checksum) content fingerprint:
    md5 each row's '|'-joined identity columns, take the 60-bit
    integer prefix, SUM exactly (decimal(38,0) internally), reduce
    mod 2^61-1, emit BIGINT. Order-insensitive (sum commutes),
    incremental-friendly (a partition's subtotal mod-sums into the
    total), and engine-portable: the OUTPUT type is int64 everywhere,
    so no decimal-vs-float rendering divergence across engines."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    return df.agg(
        F.lit(table_name).alias("table_name"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.sum(shingle_int(F.md5(key)).cast("decimal(38,0)")) % F.lit(_CHECKSUM_MOD))
        .cast("bigint")
        .alias("row_checksum"),
    )


def _checksum_sql(table: str, cols: tuple[str, ...]) -> str:
    key = " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    return f"""
    SELECT '{table}' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM({shingle_int_sql(f"md5({key})")}) % {_CHECKSUM_MOD} AS BIGINT) AS row_checksum
    FROM {table}
    """


@register(
    "dq_checksum_parity",
    oracle=" UNION ALL ".join(
        _checksum_sql(t, cols) for t, cols in _CHECKSUM_SPECS
    )
    + " ORDER BY table_name",
    description="order-insensitive per-table content checksums (cross-system migration parity)",
)
def dq_checksum_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content checksums for the core tables — the check a migration
    (or this engine replacing the reference, lime-etl's own use case:
    post-run `test()` validating the refreshed table) runs on both
    systems to prove the copy is faithful without moving data:
    matching (n_rows, row_checksum) pairs certify row-level parity.

    Scale: each table contributes one full scan reduced map-side to a
    single (count, sum) pair — no shuffle beyond the 1-row partial
    merge; the union is across DIFFERENT tables so no scan repeats.
    Timestamp columns are excluded here only because identity columns
    suffice; epoch_us casting makes them portable when needed."""
    parts = [
        table_checksum(load_table(spark, sf_dir, t), cols, t)
        for t, cols in _CHECKSUM_SPECS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name")


_INC_CUTOFF = "1998-06-01"


@register(
    "etl_incremental_agg",
    oracle=f"""
    WITH hist AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS revenue_dec
        FROM orders WHERE o_orderdate < TIMESTAMP '{_INC_CUTOFF}'
        GROUP BY order_month
    ),
    inc AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS revenue_dec
        FROM orders WHERE o_orderdate >= TIMESTAMP '{_INC_CUTOFF}'
        GROUP BY order_month
    ),
    both_parts AS (
        SELECT * FROM hist UNION ALL SELECT * FROM inc
    )
    SELECT order_month,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders,
           CAST(SUM(revenue_dec) AS DOUBLE) AS revenue
    FROM both_parts
    GROUP BY order_month
    ORDER BY order_month
    """,
    description="incremental aggregate maintenance: merge partial (count,sum) states, never re-scan history",
)
def etl_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a monthly revenue rollup: the
    history partition's aggregate state (count + decimal sum) is
    merged with the fresh increment's state by RE-AGGREGATING THE
    PARTIALS — the algebraic-aggregate merge property
    (agg(A ∪ B) == merge(agg(A), agg(B))) that lets a 100 TB pipeline
    refresh a rollup by scanning only the day's increment while the
    oracle proves equivalence to a full recompute. COUNT/SUM carry
    their own state; AVG rides as sum/count; the decimal sum keeps the
    merge exact (double partials would make it order-dependent).

    Scale: the history side would be a STORED aggregate in production
    (read |months| rows, not the fact table); here both partials are
    built from the same orders scan split by a date predicate that
    pushes down to the parquet reader. The merge groupBy touches
    |months| rows — driver-size, still done distributed."""
    orders = load_table(spark, sf_dir, "orders")

    def rollup(part: DataFrame) -> DataFrame:
        return part.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(dec("o_totalprice", 2, 12)).alias("revenue_dec"),
        )

    hist = rollup(orders.where(F.col("o_orderdate") < _INC_CUTOFF))
    inc = rollup(orders.where(F.col("o_orderdate") >= _INC_CUTOFF))
    return (
        hist.unionByName(inc)
        .groupBy("order_month")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            to_double(F.sum("revenue_dec")).alias("revenue"),
        )
        .orderBy("order_month")
    )


@register(
    "dq_sketch_accuracy",
    oracle=None,  # sketch internals (HLL++ registers, quantile summary
    # compaction) are engine-specific; pytest bounds the relative error
    description="approx-sketch accuracy audit: HLL distinct + approx percentile vs exact, relative error",
)
def dq_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit that justifies every 'approx_* is the scale path'
    note in this repo: run the sketch and the exact aggregate side by
    side and report the relative error. At 100 TB the exact forms are
    the problem — COUNT(DISTINCT) shuffles every key, exact
    percentiles buffer whole groups — while HLL++ and quantile
    summaries are tiny MERGEABLE partial states (map-side sketches,
    one reduce), so the question a pipeline owner needs answered is
    'what does the cheap path cost in accuracy?'. This keeps the
    answer measured, per corpus, not assumed.

    Scale note on the exact side here: it exists to CALIBRATE the
    sketch at test SF; production runs the sketch alone."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    distinct_users = ev.agg(
        F.lit("distinct_users").alias("metric"),
        F.countDistinct("user_id").cast("double").alias("exact_value"),
        F.approx_count_distinct("user_id").cast("double").alias("approx_value"),
    )
    p95 = orders.agg(
        F.lit("p95_order_value").alias("metric"),
        F.expr("percentile(o_totalprice, 0.95)").cast("double").alias("exact_value"),
        F.expr("approx_percentile(o_totalprice, 0.95, 10000)")
        .cast("double")
        .alias("approx_value"),
    )
    return (
        distinct_users.unionByName(p95)
        .select(
            "metric",
            "exact_value",
            "approx_value",
            (
                F.abs(F.col("approx_value") - F.col("exact_value"))
                / F.col("exact_value")
            ).alias("rel_err"),
        )
        .orderBy("metric")
    )


@register(
    "etl_backfill_plan",
    oracle="""
    WITH present AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d
        FROM events
        WHERE day(ts) % 7 <> 0   -- simulated checkpoint log with gaps
    ),
    bounds AS (
        SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi FROM events
    ),
    expected AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d FROM bounds
    )
    SELECT e.d AS missing_day
    FROM expected e
    LEFT JOIN present p ON p.d = e.d
    WHERE p.d IS NULL
    ORDER BY missing_day
    """,
    description="partition backfill planner: expected-date range anti-joined with the processed log",
)
def etl_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-refresh planner: which date partitions are
    missing between the table's bounds and the processed-partition log?
    This is the first step of every backfill job — lime-etl's
    refresh-interval logic answers "is the whole job due"; this
    operator answers "WHICH slices are due" so the TableRefreshJob can
    target only the gap (here the processed log is simulated by
    dropping every 7th day-of-month).

    Scale: the expected set is generated from a 1-row min/max
    aggregate (a metadata-only footer read on a date-partitioned
    lake table) — days count is tiny at any data size, so the
    anti join BROADCASTS the generated calendar against the distinct
    processed days; no fact-grain shuffle at all.
    """
    ev = load_table(spark, sf_dir, "events")
    present = (
        ev.where(F.dayofmonth("ts") % 7 != 0)
        .select(F.to_date("ts").alias("d"))
        .distinct()
    )
    bounds = ev.agg(
        F.to_date(F.min("ts")).alias("lo"), F.to_date(F.max("ts")).alias("hi")
    )
    expected = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("missing_day")
    )
    return (
        expected.join(
            present.select(F.col("d").alias("missing_day")), "missing_day", "left_anti"
        )
        .orderBy("missing_day")
    )


@register(
    "etl_dim_conformance",
    oracle="""
    WITH ck AS (SELECT DISTINCT c_nationkey AS k FROM customer),
    sk AS (SELECT DISTINCT s_nationkey AS k FROM supplier),
    nk AS (SELECT DISTINCT n_nationkey AS k FROM nation)
    SELECT 'customer_nations' AS side,
           (SELECT COUNT(*) FROM ck) AS n_keys,
           (SELECT COUNT(*) FROM ck WHERE k NOT IN (SELECT k FROM nk)) AS n_unconformed
    UNION ALL
    SELECT 'supplier_nations',
           (SELECT COUNT(*) FROM sk),
           (SELECT COUNT(*) FROM sk WHERE k NOT IN (SELECT k FROM nk))
    UNION ALL
    SELECT 'customer_only_nations',
           (SELECT COUNT(*) FROM ck WHERE k NOT IN (SELECT k FROM sk)),
           0
    ORDER BY side
    """,
    description="conformed-dimension audit: nation keysets across customer/supplier vs the dim",
)
def etl_dim_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conformed-dimension check (Kimball's rule for a star schema fed
    by several sources): every nation key used by customer and by
    supplier must exist in the nation dim, and the audit also surfaces
    keys one fact-feeding source uses that the other never does — the
    early signal of two sources disagreeing about a shared dimension.

    Each keyset reduces to DISTINCT keys first (tiny for any real
    dim); membership checks are anti joins over those reduced sets, so
    nothing fact-grain ever shuffles. Complements dq_referential_
    integrity (row-level orphans) at the keyset level.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k")
    ).distinct()
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k")
    ).distinct()
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k")
    ).distinct()

    def side(name: str, keys: DataFrame, universe: DataFrame) -> DataFrame:
        missing = keys.join(F.broadcast(universe), "k", "left_anti")
        return keys.agg(
            F.lit(name).alias("side"),
            F.count(F.lit(1)).alias("n_keys"),
        ).join(F.broadcast(missing.agg(F.count(F.lit(1)).alias("n_unconformed"))))

    cust_only = cust.join(F.broadcast(supp), "k", "left_anti")
    third = cust_only.agg(
        F.lit("customer_only_nations").alias("side"),
        F.count(F.lit(1)).alias("n_keys"),
        F.lit(0).cast("bigint").alias("n_unconformed"),
    )
    return (
        side("customer_nations", cust, nat)
        .unionByName(side("supplier_nations", supp, nat))
        .unionByName(third)
        .orderBy("side")
    )


@register(
    "etl_surrogate_keys",
    oracle=f"""
    WITH keyed AS (
        SELECT {shingle_int_sql("'cust:' || CAST(c_custkey AS VARCHAR)")} AS sk
        FROM customer
        UNION ALL
        SELECT {shingle_int_sql("'supp:' || CAST(s_suppkey AS VARCHAR)")} FROM supplier
        UNION ALL
        SELECT {shingle_int_sql("'part:' || CAST(p_partkey AS VARCHAR)")} FROM part
    )
    SELECT COUNT(*) AS n_keys,
           COUNT(DISTINCT sk) AS n_distinct,
           CAST(COUNT(*) - COUNT(DISTINCT sk) AS BIGINT) AS n_collisions,
           MIN(sk) AS min_sk, MAX(sk) AS max_sk
    FROM keyed
    """,
    description="hash surrogate keys across entity namespaces + collision audit",
)
def etl_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed surrogate-key assignment: a 60-bit content hash of
    ``namespace:natural_key`` — no sequence, no driver coordination,
    stable across reruns/engines (the same md5 bridge the sampling
    family uses), and namespaced so customer 17 and supplier 17 can
    never collide BY CONSTRUCTION while the audit proves they don't by
    accident either. The collision count over all three dims is the
    check you run before trusting hash keys in a warehouse load
    (birthday bound at 60 bits: ~1e-9 for a billion keys — and when a
    table outgrows that, widen to two hash columns, same plan shape).

    Scale: key derivation is row-local; the audit is one counters-only
    global aggregate per dim, unioned.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        shingle_int(F.concat(F.lit("cust:"), F.col("c_custkey").cast("string"))).alias("sk")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        shingle_int(F.concat(F.lit("supp:"), F.col("s_suppkey").cast("string"))).alias("sk")
    )
    part = load_table(spark, sf_dir, "part").select(
        shingle_int(F.concat(F.lit("part:"), F.col("p_partkey").cast("string"))).alias("sk")
    )
    keyed = cust.unionByName(supp).unionByName(part)
    return keyed.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.countDistinct("sk").alias("n_distinct"),
        (F.count(F.lit(1)) - F.countDistinct("sk")).cast("bigint").alias("n_collisions"),
        F.min("sk").alias("min_sk"),
        F.max("sk").alias("max_sk"),
    )


# --- late-arriving dimension remediation -------------------------------------

LATE_DIM_MOD = 20  # every 20th customer "arrives late" in the scenario


@register(
    "etl_late_arriving_dim",
    oracle=f"""
    WITH early_dim AS (
        SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % {LATE_DIM_MOD} <> 0
    ),
    phase1 AS (
        SELECT o.o_orderkey, o.o_custkey,
               CASE WHEN d.c_custkey IS NULL THEN 'pending' ELSE 'matched' END AS status
        FROM orders o LEFT JOIN early_dim d ON d.c_custkey = o.o_custkey
    ),
    phase2 AS (
        SELECT p.status, p.o_custkey,
               CASE WHEN p.status = 'pending' AND full_d.c_custkey IS NOT NULL
                    THEN 'backfilled'
                    WHEN p.status = 'pending' THEN 'orphaned'
                    ELSE 'matched' END AS final_status
        FROM phase1 p LEFT JOIN customer full_d ON full_d.c_custkey = p.o_custkey
    )
    SELECT final_status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM phase2 GROUP BY final_status ORDER BY final_status
    """,
    description="late-arriving dimension remediation: match/park/backfill ledger over a planted late-dim scenario",
)
def etl_late_arriving_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The late-arriving-dimension pattern (Kimball's classic ETL
    remediation): facts whose dimension key has not landed yet are
    PARKED instead of dropped or FK-violated, then BACKFILLED when the
    dimension completes. The scenario plants the lag deterministically
    (every 20th customer arrives after the first load); the output
    is the remediation ledger — matched in phase 1, backfilled in
    phase 2, orphaned forever (a real FK break dq_referential_
    integrity would page on).

    Scale: two broadcast joins against the dimension (dims broadcast
    at any corpus size); the pending set is carried as a STATUS
    column, not a separate shuffle — a production job would write the
    pending partition and re-drive only it. Counters-only rollup.
    """
    dim = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    early = dim.where(F.col("c_custkey") % LATE_DIM_MOD != 0).select(
        "c_custkey", "c_nationkey"
    )
    phase1 = orders.join(
        F.broadcast(early), orders.o_custkey == early.c_custkey, "left"
    ).select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("c_custkey").isNull(), "pending").otherwise("matched").alias(
            "status"
        ),
    )
    full = dim.select(F.col("c_custkey").alias("full_key"))
    phase2 = phase1.join(
        F.broadcast(full), phase1.o_custkey == full.full_key, "left"
    ).select(
        "o_custkey",
        F.when(
            (F.col("status") == "pending") & F.col("full_key").isNotNull(),
            "backfilled",
        )
        .when(F.col("status") == "pending", "orphaned")
        .otherwise("matched")
        .alias("final_status"),
    )
    return (
        phase2.groupBy("final_status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("final_status")
    )


# ---------------------------------------------------------------------------
# data-layout planning: Z-order clustering effectiveness
# ---------------------------------------------------------------------------

_Z_BITS = 16  # per-key rank resolution (32-bit Morton code)
_Z_BUCKETS = 64  # modeled file count


def _zorder_exprs() -> dict[str, str]:
    """Engine-specific but semantically identical integer expressions:
    Morton-interleave two 16-bit scaled keys into one 32-bit z-code.
    Spark spells bit shifts shiftleft/shiftright; DuckDB uses <</>>.
    Both operate on exact int64."""
    spark_terms, duck_terms = [], []
    for i in range(_Z_BITS):
        spark_terms.append(f"shiftleft(shiftright(xk, {i}) & 1, {2 * i})")
        spark_terms.append(f"shiftleft(shiftright(yk, {i}) & 1, {2 * i + 1})")
        duck_terms.append(f"(((xk >> {i}) & 1) << {2 * i})")
        duck_terms.append(f"(((yk >> {i}) & 1) << {2 * i + 1})")
    return {"spark": " + ".join(spark_terms), "duck": " + ".join(duck_terms)}


_ZORDER_LAYOUTS = ("natural", "keysort", "zorder")


def _zorder_oracle_sql() -> str:
    z = _zorder_exprs()["duck"]
    dom = 1 << _Z_BITS
    legs = []
    bucket_by = {
        "natural": f"(ok * {_Z_BUCKETS}) // (SELECT MAX(l_orderkey) + 1 FROM lineitem)",
        "keysort": f"(xk * {_Z_BUCKETS}) >> {_Z_BITS}",
        "zorder": f"(({z}) * {_Z_BUCKETS}) >> {2 * _Z_BITS}",
    }
    for layout in _ZORDER_LAYOUTS:
        for col, key in (("partkey", "xk"), ("suppkey", "yk")):
            legs.append(
                f"""SELECT '{layout}' AS layout, '{col}' AS probe_col,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(span) AS BIGINT) AS sum_span,
       CAST(SUM(span) AS DOUBLE) / ({dom}::BIGINT * COUNT(*)) AS avg_bucket_frac
FROM (
  SELECT {bucket_by[layout]} AS bucket, MAX({key}) - MIN({key}) + 1 AS span
  FROM scaled GROUP BY 1
)"""
            )
    return (
        f"""WITH scaled AS MATERIALIZED (
  SELECT l_orderkey AS ok,
         (l_partkey * {dom}) // (SELECT MAX(l_partkey) + 1 FROM lineitem) AS xk,
         (l_suppkey * {dom}) // (SELECT MAX(l_suppkey) + 1 FROM lineitem) AS yk
  FROM lineitem
)
SELECT * FROM (
"""
        + "\nUNION ALL\n".join(legs)
        + "\n) ORDER BY layout, probe_col"
    )


@register(
    "etl_zorder_layout",
    oracle=_zorder_oracle_sql(),
    description="Z-order clustering decision table: expected min/max-pruning fraction per probe column under natural / single-key-sort / Morton layouts",
)
def etl_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-layout planning for scan pruning — the decision a
    lakehouse table-optimizer makes before rewriting a 100 TB fact:
    cluster by ONE key (perfect pruning on it, none on others) or by
    a Morton/Z-order interleave (good pruning on BOTH filter columns).

    Models `repartitionByRange` into `_Z_BUCKETS` files purely with
    value arithmetic (bucket = scaled-key-prefix — no global sort, no
    window, no shuffle beyond one B-row partial agg per layout): for
    each layout it aggregates per-bucket min/max spans of both keys
    and reports the expected fraction of files a uniform point probe
    on each column must read (sum_span / (domain * n_buckets)) —
    min/max file skipping is exactly a span test. Everything is exact
    int64 (keys scaled to 16-bit ranks by integer division; 32-term
    interleave expression generated once and shared semantically with
    the DuckDB oracle); the one double division is the final ratio.

    At scale: z-codes are pure codegen over the scan; the layout
    write itself would be `repartitionByRange(z)` + sortWithinPartitions,
    with this table telling you whether it pays before you burn the
    rewrite."""
    dom = 1 << _Z_BITS
    li = load_table(spark, sf_dir, "lineitem")
    maxes = li.agg(
        F.max("l_orderkey").alias("mo"),
        F.max("l_partkey").alias("mp"),
        F.max("l_suppkey").alias("ms"),
    ).collect()[0]
    # integer division semantics: (a * dom) DIV (max+1) — Spark's `/`
    # is double division, so the scaling must use DIV to replay exactly
    from lime_etl_spark.plans.registry import track_persist

    scaled = track_persist(
        li.select(
            F.col("l_orderkey").alias("ok"),
            F.expr(f"CAST(l_partkey * {dom} DIV {int(maxes['mp']) + 1} AS BIGINT)").alias("xk"),
            F.expr(f"CAST(l_suppkey * {dom} DIV {int(maxes['ms']) + 1} AS BIGINT)").alias("yk"),
        ).persist()
    )
    z = _zorder_exprs()["spark"]
    bucket_by = {
        "natural": f"CAST(ok * {_Z_BUCKETS} DIV {int(maxes['mo']) + 1} AS BIGINT)",
        "keysort": f"shiftright(xk * {_Z_BUCKETS}, {_Z_BITS})",
        "zorder": f"shiftright(({z}) * {_Z_BUCKETS}, {2 * _Z_BITS})",
    }
    legs = []
    for layout in _ZORDER_LAYOUTS:
        spans = (
            scaled.select(F.expr(bucket_by[layout]).alias("bucket"), "xk", "yk")
            .groupBy("bucket")
            .agg(
                (F.max("xk") - F.min("xk") + 1).alias("span_x"),
                (F.max("yk") - F.min("yk") + 1).alias("span_y"),
            )
            # both probe-column legs read this 64-row rollup: persist so
            # the bucket aggregation over the fact runs once per layout,
            # not once per leg; tracked so non-hygienic callers can
            # release it too (release_tracked_persists)
            .persist()
        )
        spans = track_persist(spans)
        for col, span in (("partkey", "span_x"), ("suppkey", "span_y")):
            legs.append(
                spans.agg(
                    F.lit(layout).alias("layout"),
                    F.lit(col).alias("probe_col"),
                    F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
                    F.sum(span).cast("bigint").alias("sum_span"),
                    (
                        F.sum(span).cast("double")
                        / (F.lit(dom).cast("bigint") * F.count(F.lit(1)))
                    ).alias("avg_bucket_frac"),
                )
            )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("layout", "probe_col")
