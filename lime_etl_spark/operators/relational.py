"""Relational analytics core: TPC-H-style queries on the test schema.

These are the engine's headline scan/filter/join/aggregate/window
plans. Design notes for 100 TB:

- ``lineitem``/``orders`` are the scaling facts; filters are applied
  before joins so parquet pushdown + AQE handle the heavy lifting.
- ``region``/``nation`` are broadcast explicitly (they never scale);
  ``supplier``/``part``/``customer`` scale with SF, so they are left
  to AQE's size-based broadcast decision instead of a hard hint.
- All money/quantity aggregates run on exact DECIMAL and convert to
  DOUBLE afterwards (see lime_etl_spark.functions.numeric) so results
  are reproducible across partitionings and engines.
- Top-N plans always order by a unique key last → deterministic ties.

Reference parity: lime-etl itself has no query engine (jobs run
arbitrary SQL via SQLAlchemy, see reference lime_etl/domain/job_spec.py:49);
this module is the Spark-native query surface those jobs would use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_etl_spark.functions.numeric import dec, to_double
from lime_etl_spark.plans.registry import register
from lime_etl_spark.sources.readers import load_table, spread, spread_for_agg


def _rev() -> "F.Column":
    """Exact revenue term: price * (1 - discount) in DECIMAL."""
    return dec("l_extendedprice", 2, 12) * (F.lit(1).cast("decimal(3,2)") - dec("l_discount", 2, 4))


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({rev}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({rev} * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """.format(rev=_REV_SQL),
    description="scan→filter→groupBy with exact decimal aggregates (TPC-H Q1)",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread on a real key (hash partitioning): the single-row-group
    # test parquet scans as ONE task, which would run the whole
    # decimal partial aggregation serially. A keyless repartition
    # would pay a local sort of its input (sortBeforeRepartition);
    # hashing a column does not. The key is a column the query already
    # reads (l_extendedprice, ~100k distinct — spreads evenly), so the
    # scan schema stays pruned to the query's own columns. No-op
    # whenever the scan already has enough splits — any at-scale table.
    li = spread(
        load_table(spark, sf_dir, "lineitem").where(
            F.col("l_shipdate") <= "2001-09-02"
        ),
        "l_extendedprice",
    )
    qty = dec("l_quantity", 2, 12)
    price = dec("l_extendedprice", 2, 12)
    disc = dec("l_discount", 2, 4)
    charge = _rev() * (F.lit(1).cast("decimal(3,2)") + dec("l_tax", 2, 4))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            to_double(F.sum(qty)).alias("sum_qty"),
            to_double(F.sum(price)).alias("sum_base_price"),
            to_double(F.sum(_rev())).alias("sum_disc_price"),
            to_double(F.sum(charge)).alias("sum_charge"),
            (to_double(F.sum(qty)) / to_double(F.count(F.lit(1)))).alias("avg_qty"),
            (to_double(F.sum(price)) / to_double(F.count(F.lit(1)))).alias("avg_price"),
            (to_double(F.sum(disc)) / to_double(F.count(F.lit(1)))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM({rev}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """.format(rev=_REV_SQL),
    description="3-way join + agg + deterministic top-N (TPC-H Q3)",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-03-15")
    # spread: parallelize the broadcast-probe + partial-agg stage past
    # the single-split test scan (hash key → no pre-repartition sort)
    li = spread(
        load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1998-03-15"),
        "l_orderkey",
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(to_double(F.sum(_rev())).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, CAST(SUM({rev}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """.format(rev=_REV_SQL),
    description="6-way join with broadcast dims (TPC-H Q5)",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(to_double(F.sum(_rev())).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q6_revenue_forecast",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    description="pushdown-friendly range-filter scalar agg (TPC-H Q6)",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            to_double(F.sum(dec("l_extendedprice", 2, 12) * dec("l_discount", 2, 4))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM({rev}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """.format(rev=_REV_SQL),
    description="returned-item losers: join+filter+group+top-N (TPC-H Q10)",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-10-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(to_double(F.sum(_rev())).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_effect",
    oracle="""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {rev} ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                 / CAST(SUM({rev}) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """.format(rev=_REV_SQL),
    description="conditional aggregate ratio (TPC-H Q14)",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type").like("PROMO%"), _rev()).otherwise(F.lit(0).cast("decimal(12,2)"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (F.lit(100.0) * to_double(F.sum(promo)) / to_double(F.sum(_rev()))).alias(
                "promo_revenue_pct"
            )
        )
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    description="agg-then-semi-join HAVING subquery (TPC-H Q18)",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The HAVING aggregate ALREADY holds each big order's total
    # quantity — the textbook plan (filter ids, re-join raw lineitem,
    # re-aggregate) scans and shuffles the fact twice for a number it
    # computed in pass one. One lineitem pass: aggregate → filter →
    # join the (tiny) survivors to orders/customer. The group keys are
    # 1:1 with o_orderkey, so the second aggregate was a no-op anyway.
    # spread on the aggregation key itself, sized to shuffle.partitions
    # (spread_for_agg): the groupBy reuses the hash partitioning only
    # when key AND count match, so this adds parallelism without adding
    # an exchange under ANY conf split (and is a no-op once the scan
    # has real splits)
    li = spread_for_agg(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", 2, 12)).alias("_q"))
        .where(F.col("_q") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            to_double(F.col("_q")).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@register(
    "q_market_share",
    oracle="""
    SELECT strftime(o_orderdate, '%Y') AS order_year,
           100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {rev} ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                 / CAST(SUM({rev}) AS DOUBLE) AS promo_share_pct,
           CAST(SUM({rev}) AS DOUBLE) AS total_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA'
    GROUP BY strftime(o_orderdate, '%Y')
    ORDER BY order_year
    """.format(rev=_REV_SQL),
    description="yearly conditional-revenue share in one region (TPC-H Q8 flavor)",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA"))
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0).cast("decimal(12,2)"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy(F.date_format("o_orderdate", "yyyy").alias("order_year"))
        .agg(
            (F.lit(100.0) * to_double(F.sum(promo)) / to_double(F.sum(_rev()))).alias("promo_share_pct"),
            to_double(F.sum(_rev())).alias("total_revenue"),
        )
        .orderBy("order_year")
    )


@register(
    "q_top_parts_by_region",
    oracle="""
    WITH rev AS (
        SELECT r_name, p_name, p_partkey,
               CAST(SUM({rev}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, p_name, p_partkey
    )
    SELECT r_name, p_name, revenue, part_rank FROM (
        SELECT r_name, p_name, revenue,
               ROW_NUMBER() OVER (PARTITION BY r_name ORDER BY revenue DESC, p_partkey) AS part_rank
        FROM rev
    ) WHERE part_rank <= 3
    ORDER BY r_name, part_rank
    """.format(rev=_REV_SQL),
    description="window row_number top-3 parts per region",
)
def q_top_parts_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    # spread KEYED on l_orderkey (r10: the keyless round-robin form
    # paid sortBeforeRepartition's local sort of the whole fact —
    # measured 2.16 s vs 1.71 s keyed in an interleaved A/B). Both
    # NAME lookups are deferred past the top-3: the agg and the window
    # carry 1-byte n_regionkey instead of the r_name string (measured
    # a further 1.71 → 1.57 s; at scale it narrows the one full-fact
    # shuffle this query must do — guide §2.3 narrower types), and
    # p_name joins on only the ~(3 x regions) winners.
    li = spread(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_regionkey", F.col("l_partkey").alias("p_partkey"))
        .agg(to_double(F.sum(_rev())).alias("revenue"))
    )
    w = Window.partitionBy("n_regionkey").orderBy(F.desc("revenue"), "p_partkey")
    return (
        rev.withColumn("part_rank", F.row_number().over(w))
        .where(F.col("part_rank") <= 3)
        .join(F.broadcast(part.select("p_partkey", "p_name")), "p_partkey")
        .join(region, F.col("n_regionkey") == region.r_regionkey)
        .select("r_name", "p_name", "revenue", "part_rank")
        .orderBy("r_name", "part_rank")
    )


@register(
    "q_customer_ltv_window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders
    """,
    description="running per-customer spend (window running sum)",
)
def q_customer_ltv_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("order_seq"),
        to_double(F.sum(dec("o_totalprice", 2, 12)).over(wsum)).alias("running_spend"),
    )


@register(
    "q_order_priority_monthly",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS n_other,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY strftime(o_orderdate, '%Y-%m')
    ORDER BY order_month
    """,
    description="monthly pivot-style conditional counts (TPC-H Q4 flavor)",
)
def q_order_priority_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    urgent = F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
    high = F.when(F.col("o_orderpriority") == "2-HIGH", 1).otherwise(0)
    other = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0).otherwise(1)
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.sum(urgent).alias("n_urgent"),
            F.sum(high).alias("n_high"),
            F.sum(other).alias("n_other"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("order_month")
    )


@register(
    "q_rollup_revenue",
    oracle="""
    SELECT r_name, n_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
    """,
    description="ROLLUP multi-level aggregate (region → nation → grand total)",
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            to_double(F.sum(dec("o_totalprice", 2, 12))).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


@register(
    "q_price_quantiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50,
           quantile_cont(l_extendedprice, 0.95) AS p95,
           quantile_cont(l_extendedprice, 0.99) AS p99,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    description="exact interpolated percentiles per group",
)
def q_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (Spark `percentile` == DuckDB quantile_cont,
    verified hash-identical). At 100 TB swap to approx_percentile
    (t-digest, mergeable map-side) — exact percentiles need the full
    group in one place; the approximate sketch is the scale path but
    is not bit-reproducible across engines, so the ORACLE uses exact."""
    li = load_table(spark, sf_dir, "lineitem")
    # one percentile aggregate with an array of targets: the per-group
    # value buffer and its sort happen ONCE for all three quantiles
    # (three scalar percentile aggs each keep their own copy of every
    # group value — 3x the aggregation state for identical output)
    pct = F.percentile(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(pct.alias("p"), F.count(F.lit(1)).alias("n_items"))
        .select(
            "l_returnflag",
            F.col("p")[0].alias("p50"),
            F.col("p")[1].alias("p95"),
            F.col("p")[2].alias("p99"),
            "n_items",
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day', LAG(o_orderdate) OVER w, o_orderdate) AS days_since_prev,
           date_diff('day', o_orderdate, LEAD(o_orderdate) OVER w) AS days_to_next,
           NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS spend_quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    description="lag/lead inter-order gaps + ntile spend quartiles per customer",
)
def q_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-cadence features: days since/until the neighboring
    order (lag/lead) and the customer-local spend quartile (ntile).
    Both window specs partition on o_custkey — ONE exchange feeds two
    sorts (orderdate- and totalprice-ordered); ties broken by
    o_orderkey so ntile assignment is engine-deterministic. At 100 TB
    customer partitions are small (orders per customer), so no
    single-partition window bottleneck exists."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wq = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.datediff("o_orderdate", F.lag("o_orderdate").over(w))
            .cast("bigint")
            .alias("days_since_prev"),
            F.datediff(F.lead("o_orderdate").over(w), "o_orderdate")
            .cast("bigint")
            .alias("days_to_next"),
            F.ntile(4).over(wq).cast("bigint").alias("spend_quartile"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "q_cube_returns",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    description="CUBE: all grouping-set combinations incl. cross margins",
)
def q_cube_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE complements q_rollup_revenue: all 2^k grouping sets, so
    both one-dimensional margins exist (ROLLUP only nests). Spark
    expands the cube BEFORE the exchange — each input row fans out to
    its grouping sets map-side and partial-aggregates, so the shuffle
    carries pre-combined groups, not row multiples."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            to_double(F.sum(dec("l_quantity", 2, 12))).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "ev_value_histogram",
    oracle="""
    SELECT CASE WHEN CAST(value AS DOUBLE) < 0.0 THEN 0
                WHEN CAST(value AS DOUBLE) >= 500.0 THEN 21
                ELSE CAST(FLOOR(CAST(value AS DOUBLE) / 25.0) AS BIGINT) + 1 END AS bucket,
           COUNT(*) AS n_events,
           CAST(MIN(value) AS DOUBLE) AS min_value,
           CAST(MAX(value) AS DOUBLE) AS max_value
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY bucket
    ORDER BY bucket
    """,
    description="fixed-width histogram of purchase values (explicit bucket arithmetic)",
)
def ev_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram — the profiling primitive behind data-test
    drift checks. Bucket edges via explicit floor(v/width)+1 with
    under/overflow bins (width_bucket semantics, spelled out because
    the oracle engine lacks the function and explicit arithmetic is
    cross-engine exact anyway); the aggregate is a tiny n_buckets-key
    groupBy with map-side combine — scan-bound at any scale."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    v = F.col("value").cast("double")
    bucket = (
        F.when(v < 0.0, 0)
        .when(v >= 500.0, 21)
        .otherwise(F.floor(v / 25.0).cast("bigint") + 1)
    )
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").cast("double").alias("min_value"),
            F.max("value").cast("double").alias("max_value"),
        )
        .orderBy("bucket")
    )
