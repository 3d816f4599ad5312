"""Relational breadth, part 3: the remaining classic TPC-H plan shapes
(Q2/Q9/Q11/Q12/Q13/Q20 flavors) adapted to the driver schema — the
reference schema carries no partsupp table and no
shipmode/commitdate/receiptdate columns, so lineitem serves as the
part↔supplier association and ship delay replaces the
commit/receipt-date comparison.

New plan shapes this module adds over relational.py / relational_sub.py:

- **min-equality rejoin** (q2): a correlated MIN decorrelated onto the
  join key, rows re-selected by exact-decimal equality with the min.
- **profit expression across two dims** (q9): fact × 2 broadcast dims,
  arithmetic combining columns of both, grouped by a dim attribute +
  a date part.
- **fraction-of-total HAVING** (q11): group agg filtered against a
  1-row global aggregate, compared cross-multiplied in exact decimals.
- **CASE-bucketed conditional counts** (q12): computed bucket as the
  grouping key, disjoint conditional sums inside one partial agg.
- **outer-join zero-count distribution** (q13): count-per-key
  including empty keys, then a second agg over the counts — the
  orders side is pre-aggregated BEFORE touching customer, so the
  outer join carries one row per custkey, not one per order.
- **conditional-vs-total threshold semi-selection** (q20): one pass
  computes both a windowed-period agg and an all-time agg per key;
  the ratio test is cross-multiplied.

100 TB notes: every dim (part/supplier/nation/region) is an explicit
broadcast; every threshold compares exact DECIMAL cross-products
(never float division); q13 pre-aggregates the fact to one row per
key before the dimension outer join, so the shuffle volume is
O(distinct keys), not O(orders).

Reference parity: lime-etl executes arbitrary analyst SQL through its
unit-of-work (lime_etl/domain/job_spec.py:49, run() contract); these
are the Spark plans for the remaining classic shapes of that SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lime_etl_spark.functions.numeric import dec, to_double
from lime_etl_spark.functions.ranks import with_global_ntile, with_global_ntiles
from lime_etl_spark.plans.registry import register
from lime_etl_spark.sources.readers import load_table

_REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"


def _rev() -> "F.Column":
    return dec("l_extendedprice", 2, 12) * (
        F.lit(1).cast("decimal(3,2)") - dec("l_discount", 2, 4)
    )


@register(
    "q2_min_price_supplier",
    oracle="""
    WITH euro AS (
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ), offers AS (
        SELECT l_partkey, l_suppkey,
               CAST(l_extendedprice AS DECIMAL(12,2)) AS price
        FROM lineitem JOIN euro ON l_suppkey = s_suppkey
    ), best AS (
        SELECT l_partkey AS pk, MIN(price) AS best_price
        FROM offers GROUP BY l_partkey
    )
    SELECT DISTINCT p_partkey, p_brand, s_suppkey, s_name, n_name,
           CAST(best_price AS DOUBLE) AS best_price
    FROM offers
    JOIN best ON l_partkey = pk AND price = best_price
    JOIN part ON p_partkey = l_partkey
    JOIN euro ON s_suppkey = l_suppkey
    WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
    ORDER BY p_partkey, s_suppkey
    """,
    description="correlated-min best-offer supplier per part (TPC-H Q2 flavor)",
)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest European supplier(s) per qualifying part. The
    correlated `MIN(price) WHERE suppkey IN region` subquery is
    decorrelated into a groupBy on l_partkey — the same key the
    re-selection joins on, so one exchange of the offers feeds both
    the MIN and the equality rejoin. Price equality compares exact
    DECIMAL (ties kept on both engines); supplier/nation/region
    resolve via broadcast before the fact is touched, part filter
    broadcasts after. DISTINCT collapses repeat (part, supplier)
    offers at the same best price."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    euro = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    )
    offers = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", dec("l_extendedprice", 2, 12).alias("price"))
        .join(F.broadcast(euro.select("s_suppkey")), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
    )
    best = offers.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("price").alias("best_price")
    )
    return (
        offers.join(
            best,
            (F.col("l_partkey") == F.col("pk")) & (F.col("price") == F.col("best_price")),
        )
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(euro), F.col("l_suppkey") == euro.s_suppkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            "n_name",
            to_double(F.col("best_price")).alias("best_price"),
        )
        .distinct()
        .orderBy("p_partkey", "s_suppkey")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, strftime(o_orderdate, '%Y') AS o_year,
           CAST(SUM({rev} - CAST(p_retailprice AS DECIMAL(12,2))
                            * CAST(l_quantity AS DECIMAL(12,2))
                            * CAST(0.09 AS DECIMAL(4,2))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, strftime(o_orderdate, '%Y')
    ORDER BY nation, o_year
    """.format(rev=_REV_SQL),
    description="product-line profit by supplier nation and year (TPC-H Q9 flavor)",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit (revenue minus a retail-price-based supply-cost proxy —
    the schema has no partsupp.ps_supplycost) for widget parts, by the
    supplier's nation and order year. part/supplier/nation broadcast;
    the only shuffles are the orders equi-join on orderkey and the
    final small groupBy. The profit expression stays in exact DECIMAL
    through the sum — the two engines agree to the cent."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    cost = (
        dec("p_retailprice", 2, 12)
        * dec("l_quantity", 2, 12)
        * F.lit(0.09).cast("decimal(4,2)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_format("o_orderdate", "yyyy").alias("o_year"),
        )
        .agg(to_double(F.sum(_rev() - cost)).alias("profit"))
        .orderBy("nation", "o_year")
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH asia AS (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
    ), v AS (
        SELECT l_partkey, SUM({rev}) AS val
        FROM lineitem JOIN asia ON l_suppkey = s_suppkey
        GROUP BY l_partkey
    ), tot AS (SELECT SUM(val) AS t FROM v)
    SELECT l_partkey AS partkey, CAST(val AS DOUBLE) AS part_value
    FROM v, tot
    WHERE val * 150 > t
    ORDER BY part_value DESC, partkey
    """.format(rev=_REV_SQL),
    description="fraction-of-total important parts (TPC-H Q11 flavor)",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue through ASIA-region suppliers exceeds 1/150
    of that region's total. The per-part aggregate is computed once;
    its global SUM is a second 1-row aggregate broadcast back over the
    groups. The fraction test cross-multiplies exact decimals
    (val·150 > total) — no float division, no epsilon. The region
    membership probe is a broadcast LEFT SEMI on the fact, so
    disqualified lineitems never shuffle."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    v = (
        li.join(F.broadcast(asia), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("val"))
    )
    tot = v.agg(F.sum("val").alias("t"))
    return (
        v.join(F.broadcast(tot))
        .where(F.col("val") * 150 > F.col("t"))
        .select(
            F.col("l_partkey").alias("partkey"),
            to_double(F.col("val")).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "partkey")
    )


@register(
    "q12_ship_delay_buckets",
    oracle="""
    SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) < 0 THEN 'early'
                WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN 'on-time'
                WHEN datediff('day', o_orderdate, l_shipdate) <= 90 THEN 'late'
                ELSE 'very-late' END AS delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY delay_bucket
    ORDER BY delay_bucket
    """,
    description="ship-delay buckets × priority conditional counts (TPC-H Q12 flavor)",
)
def q12_ship_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems bucketed by how long after ordering they shipped, with
    urgent-vs-rest conditional counts per bucket (the schema has no
    shipmode/commitdate, so ship delay is the Q12 axis). The computed
    CASE bucket is the grouping key — it evaluates inside codegen
    before the partial agg, so the shuffle carries at most 4 groups
    per partition. Both timestamps are midnight-aligned: day diffs are
    exact integers on both engines."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load_table(spark, sf_dir, "orders")
    delay = F.datediff("l_shipdate", "o_orderdate")
    bucket = (
        F.when(delay < 0, "early")
        .when(delay <= 30, "on-time")
        .when(delay <= 90, "late")
        .otherwise("very-late")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c_custkey, COALESCE(cnt, 0) AS c_count
        FROM customer LEFT JOIN (
            SELECT o_custkey, COUNT(*) AS cnt
            FROM orders
            WHERE o_orderpriority = '1-URGENT'
            GROUP BY o_custkey
        ) ON c_custkey = o_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    description="order-count-per-customer distribution incl. zeros (TPC-H Q13)",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed 0, 1, 2, … qualifying orders. Orders
    are aggregated to one (custkey, count) row BEFORE meeting
    customer, so the outer join — which must run to surface zero-order
    customers — carries O(distinct custkeys), not O(orders). The
    classic formulation (outer join then COUNT(o_orderkey)) shuffles
    every order row; this one shuffles each key once. The second
    aggregate is tiny (distinct counts)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    ocnt = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_cust = cust.join(ocnt, cust.c_custkey == ocnt.o_custkey, "left").select(
        F.coalesce(F.col("cnt"), F.lit(0)).alias("c_count")
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q20_concentrated_shippers",
    oracle="""
    WITH q AS (
        SELECT l_suppkey,
               SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                         AND l_shipdate < TIMESTAMP '1998-01-01'
                        THEN CAST(l_quantity AS DECIMAL(12,2))
                        ELSE CAST(0 AS DECIMAL(12,2)) END) AS recent_qty,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%bolt%'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(recent_qty AS DOUBLE) AS recent_qty,
           CAST(total_qty AS DOUBLE) AS total_qty
    FROM supplier JOIN q ON s_suppkey = l_suppkey
    WHERE recent_qty * 6 > total_qty
    ORDER BY s_suppkey
    """,
    description="suppliers with period-concentrated shipments (TPC-H Q20 flavor)",
)
def q20_concentrated_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped more than a sixth of their all-time bolt
    quantity during 1997 (the Q20 'excess availability' test, recast
    without partsupp: period quantity vs all-time quantity per
    supplier). ONE pass over the qualifying fact computes both the
    conditional period sum and the total — no self-join, no second
    scan. The ratio threshold cross-multiplies exact decimals
    (recent·6 > total); the supplier dim resolves by broadcast after
    the per-key aggregate."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    in_period = (F.col("l_shipdate") >= "1997-01-01") & (
        F.col("l_shipdate") < "1998-01-01"
    )
    zero = F.lit(0).cast("decimal(12,2)")
    q = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(in_period, dec("l_quantity", 2, 12)).otherwise(zero)).alias(
                "recent_qty"
            ),
            F.sum(dec("l_quantity", 2, 12)).alias("total_qty"),
        )
    )
    return (
        q.where(F.col("recent_qty") * 6 > F.col("total_qty"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            to_double(F.col("recent_qty")).alias("recent_qty"),
            to_double(F.col("total_qty")).alias("total_qty"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q_customer_set_ops",
    oracle="""
    WITH y97 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= '1997-01-01' AND o_orderdate < '1998-01-01'),
         y98 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= '1998-01-01' AND o_orderdate < '1999-01-01')
    SELECT 'churned' AS cohort, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM (SELECT o_custkey FROM y97 EXCEPT SELECT o_custkey FROM y98)
    UNION ALL
    SELECT 'retained', CAST(COUNT(*) AS BIGINT)
    FROM (SELECT o_custkey FROM y97 INTERSECT SELECT o_custkey FROM y98)
    UNION ALL
    SELECT 'acquired', CAST(COUNT(*) AS BIGINT)
    FROM (SELECT o_custkey FROM y98 EXCEPT SELECT o_custkey FROM y97)
    ORDER BY cohort
    """,
    description="INTERSECT/EXCEPT year-over-year customer cohorts (set ops -> semi/anti joins)",
)
def q_customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year customer movement via relational set operators —
    churned (1997 \\ 1998), retained (∩), acquired (1998 \\ 1997).
    ``subtract``/``intersect`` (DISTINCT set semantics — the inputs are
    already keysets) lower to hash anti/semi joins over the
    deduplicated keysets (``exceptAll`` would instead rewrite to a
    counting-aggregate union — heavier for no benefit here), so each cohort is one narrow shuffle of
    distinct custkeys (tiny vs the orders scan that feeds it); the two
    year scans are shared via the same pushed date-range predicate
    shape the plan gates check elsewhere."""
    orders = load_table(spark, sf_dir, "orders")

    def year_keys(lo: str, hi: str) -> DataFrame:
        return (
            orders.where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
            .select("o_custkey")
            .distinct()
        )

    y97 = year_keys("1997-01-01", "1998-01-01")
    y98 = year_keys("1998-01-01", "1999-01-01")

    def count_of(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("cohort"),
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        )

    churned = count_of(y97.subtract(y98), "churned")
    retained = count_of(y97.intersect(y98), "retained")
    acquired = count_of(y98.subtract(y97), "acquired")
    return churned.unionByName(retained).unionByName(acquired).orderBy("cohort")


@register(
    "q_open_orders_sweep",
    oracle="""
    WITH bounds AS (
        SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS start_d,
               CAST(MAX(l.l_shipdate) AS DATE) AS end_d
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
    ),
    ev AS (
        SELECT start_d AS d, 1 AS delta FROM bounds
        UNION ALL
        SELECT end_d, -1 FROM bounds
    ),
    daily AS (
        SELECT d,
               CAST(SUM(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_opened,
               CAST(SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_closed,
               SUM(delta) AS net
        FROM ev GROUP BY d
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, n_opened, n_closed,
           CAST(SUM(net) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS open_orders
    FROM daily ORDER BY day
    """,
    description="interval sweep: orders in flight per day via +1/-1 boundary events and a running sum",
)
def q_open_orders_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-interval counting — 'how many orders were in flight
    on each day' — via the sweep-line trick: each order contributes a
    +1 event at order date and a -1 at its last ship date, daily net
    deltas aggregate map-side, and one running sum over the tiny daily
    frame reconstructs the open count. This is THE scalable shape for
    interval overlap questions: no order-x-day explosion (an order
    open 300 days emits 2 events, not 300 rows), and the only global
    sort is over distinct days. Both boundary events come from one
    explode over an inline array — single pass over the bounds."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    bounds = (
        orders.select("o_orderkey", F.col("o_orderdate").cast("date").alias("start_d"))
        .join(li.select("l_orderkey", "l_shipdate"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "start_d")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("end_d"))
    )
    ev = bounds.select(
        F.explode(
            F.array(
                F.struct(F.col("start_d").alias("d"), F.lit(1).alias("delta")),
                F.struct(F.col("end_d").alias("d"), F.lit(-1).alias("delta")),
            )
        ).alias("e")
    ).select(F.col("e.d").alias("d"), F.col("e.delta").alias("delta"))
    daily = ev.groupBy("d").agg(
        F.sum(F.when(F.col("delta") > 0, 1).otherwise(0)).cast("bigint").alias("n_opened"),
        F.sum(F.when(F.col("delta") < 0, 1).otherwise(0)).cast("bigint").alias("n_closed"),
        F.sum("delta").alias("net"),
    )
    dayn = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    w = Window.orderBy(dayn).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n_opened",
            "n_closed",
            F.sum("net").over(w).cast("bigint").alias("open_orders"),
        )
        .orderBy("day")
    )


@register(
    "q_supplier_rank_pct",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, SUM({_REV_SQL}) AS revenue_dec
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT n_name, s_suppkey,
           CAST(revenue_dec AS DOUBLE) AS revenue,
           PERCENT_RANK() OVER (PARTITION BY n_name ORDER BY revenue_dec DESC) AS pct_rank,
           CUME_DIST() OVER (PARTITION BY n_name ORDER BY revenue_dec DESC) AS cume
    FROM rev
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    ORDER BY n_name, revenue DESC, s_suppkey
    """,
    description="supplier revenue percentile standing per nation (percent_rank + cume_dist)",
)
def q_supplier_rank_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each supplier's revenue standing within its nation as a
    percentile (percent_rank) and distribution position (cume_dist) —
    the vendor-scorecard query. Both functions are (rank-1)/(n-1) and
    rows<=current/n over EXACT decimal revenue, so the ordering and
    the divisions are bit-identical cross-engine (ties collapse to
    equal ranks deterministically; doubles would make tie membership
    engine-dependent).

    Scale: the per-supplier rollup reduces the fact table map-side to
    |suppliers| rows BEFORE any window; supplier and nation broadcast
    onto it; the window partitions by nation — bounded-cardinality
    groups, no global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("revenue_dec"))
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue_dec"))
    return (
        rev.join(F.broadcast(sup), rev.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select(
            "n_name",
            "s_suppkey",
            to_double(F.col("revenue_dec")).alias("revenue"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .orderBy("n_name", F.desc("revenue"), "s_suppkey")
    )


@register(
    "q_yoy_growth",
    oracle="""
    WITH rev AS (
        SELECT n.n_name,
               CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS order_year,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS INT)
    )
    SELECT n_name, order_year, revenue,
           LAG(revenue) OVER (PARTITION BY n_name ORDER BY order_year) AS prev_revenue,
           revenue / LAG(revenue) OVER (PARTITION BY n_name ORDER BY order_year) - 1.0
               AS yoy_growth
    FROM rev
    ORDER BY n_name, order_year
    """,
    description="year-over-year revenue growth per nation (lag over the annual rollup)",
)
def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annual revenue per nation with YoY growth ratio.

    The fact reduces to |nations|×|years| rows BEFORE the window — the
    lag never sees order-grain data, so the window's sort is over a
    few hundred rows however big the fact is. Revenue is decimal-exact
    then double; the growth ratio is a single IEEE division + sub, so
    it hashes identically cross-engine. Nation/customer dims broadcast.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = F.broadcast(load_table(spark, sf_dir, "customer"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(to_double(F.sum(dec("o_totalprice", 2, 12))).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy("order_year")
    prev = F.lag("revenue").over(w)
    return rev.select(
        "n_name",
        "order_year",
        "revenue",
        prev.alias("prev_revenue"),
        (F.col("revenue") / prev - 1.0).alias("yoy_growth"),
    ).orderBy("n_name", "order_year")


@register(
    "q_rfm_segments",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               date_diff('day', MAX(o_orderdate), (SELECT MAX(o_orderdate) FROM orders))
                   AS recency_days,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS monetary
        FROM orders
        GROUP BY o_custkey
    ),
    scored AS (
        SELECT o_custkey, monetary,
               NTILE(4) OVER (ORDER BY recency_days, o_custkey) AS r_score,
               NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
               NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
        FROM per_cust
    )
    SELECT r_score * 100 + f_score * 10 + m_score AS segment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(monetary AS DECIMAL(14,2))) AS DOUBLE) AS segment_value
    FROM scored
    GROUP BY r_score * 100 + f_score * 10 + m_score
    ORDER BY segment
    """,
    description="RFM quartile segmentation of customers from the order history",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/Frequency/Monetary quartile segments — the classic
    customer-scoring rollup a marketing pipeline feeds from the lake.

    Orders reduce to one row per customer first (one shuffle, partial
    aggs); the three NTILEs then run over the customer rollup via the
    scale-safe sharded-rank decomposition (functions/ranks.py):
    quantile-bucketed local sorts + broadcast bucket offsets — exact
    ANSI ntile, no single-partition sort even at billions of
    customers. The reference-date scalar (MAX orderdate) is a 1-row
    broadcast, never a collect. All three scores tie-break on custkey
    so ntile boundaries are deterministic.
    """
    orders = load_table(spark, sf_dir, "orders")
    ref = orders.agg(F.max("o_orderdate").alias("ref_date"))
    per_cust = (
        orders.join(F.broadcast(ref))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("ref_date"), F.max("o_orderdate")).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            to_double(F.sum(dec("o_totalprice", 2, 12))).alias("monetary"),
        )
    )
    scored = with_global_ntiles(
        per_cust,
        [
            (
                F.col("recency_days"),
                [F.col("recency_days"), F.col("o_custkey")],
                4,
                "r_score",
            ),
            (
                -F.col("frequency"),
                [F.desc("frequency"), F.col("o_custkey")],
                4,
                "f_score",
            ),
            (
                -F.col("monetary"),
                [F.desc("monetary"), F.col("o_custkey")],
                4,
                "m_score",
            ),
        ],
    )
    return (
        scored.select(
            "monetary",
            (
                F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
            ).alias("segment"),
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            to_double(F.sum(dec("monetary", 2, 14))).alias("segment_value"),
        )
        .orderBy("segment")
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT
        r_name, o_orderpriority,
        GROUPING(r_name) + 2 * GROUPING(o_orderpriority) AS gid,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY GROUPING SETS ((r_name, o_orderpriority), (r_name), (o_orderpriority))
    ORDER BY gid, r_name NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    description="explicit GROUPING SETS with grouping_id (beyond rollup/cube fixed shapes)",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the shape rollup/cube can't express
    (here: the two 1-column sets plus the pair, but NOT the grand
    total). Spark plans one Expand over the reduced join output with
    partial aggregation per set — each input row fans into exactly
    |sets| aggregation rows map-side, so the shuffle carries counter
    partials × sets, never data × sets.

    Uses the spark.sql surface over registered views — the same query
    text a migrating SQL user would run verbatim.
    """
    from lime_etl_spark.sources.readers import load_table as _lt

    _lt(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    _lt(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _lt(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    _lt(spark, sf_dir, "region").createOrReplaceTempView("region")
    return spark.sql(
        """
        SELECT
            r_name, o_orderpriority,
            CAST(grouping(r_name) + 2 * grouping(o_orderpriority) AS BIGINT) AS gid,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
            COUNT(*) AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY GROUPING SETS ((r_name, o_orderpriority), (r_name), (o_orderpriority))
        ORDER BY gid, r_name NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@register(
    "q_order_value_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_order_value,
           LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS latest_order_value,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_order_value,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS trailing3_value
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
    """,
    description="window frame breadth: first/last/nth_value + trailing ROWS sum in one customer shuffle",
)
def q_order_value_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frame-function battery (first_value / last_value over the
    full frame / nth_value / a bounded trailing ROWS sum) — four
    different frames sharing ONE (custkey, orderdate) sort: Catalyst
    plans a single Window node because partitioning and ordering
    agree, so the fact shuffles once however many frame variants ride
    it. The trailing sum is decimal-exact through the frame.
    """
    orders = load_table(spark, sf_dir, "orders")
    ob = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    grow = Window.partitionBy("o_custkey").orderBy(*ob).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    full = Window.partitionBy("o_custkey").orderBy(*ob).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    trail = Window.partitionBy("o_custkey").orderBy(*ob).rowsBetween(-2, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(grow).alias("first_order_value"),
        F.last("o_totalprice").over(full).alias("latest_order_value"),
        F.nth_value("o_totalprice", 2).over(grow).alias("second_order_value"),
        to_double(F.sum(dec("o_totalprice", 2, 12)).over(trail)).alias("trailing3_value"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "q_revenue_deciles",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT o_custkey, spend,
               NTILE(10) OVER (ORDER BY spend DESC, o_custkey) AS decile
        FROM per_cust
    )
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(spend AS DECIMAL(14,2))) AS DOUBLE) AS decile_revenue,
           CAST(SUM(SUM(CAST(spend AS DECIMAL(14,2)))) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS cumulative_revenue
    FROM ranked
    GROUP BY decile
    ORDER BY decile
    """,
    description="customer revenue deciles with cumulative concentration (the 80/20 report)",
)
def q_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration report: customers bucketed into spend
    deciles, each decile's revenue and the cumulative share curve —
    the one-glance "top 10% drives X%" table.

    Orders reduce per-customer first; the decile assignment runs via
    the sharded-rank decomposition (functions/ranks.py) — quantile
    buckets + broadcast offsets, exact ANSI ntile with every sort
    partition-local; the cumulative sum then runs over exactly 10
    rows. All money stays decimal-exact until the final cast.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        to_double(F.sum(dec("o_totalprice", 2, 12))).alias("spend")
    )
    deciled = with_global_ntile(
        per_cust,
        -F.col("spend"),
        [F.desc("spend"), F.col("o_custkey")],
        k=10,
        out="decile",
    )
    per_dec = (
        deciled.select("spend", "decile")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum(dec("spend", 2, 14)).alias("__dec_rev"),
        )
    )
    cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_dec.select(
        "decile",
        "n_customers",
        to_double(F.col("__dec_rev")).alias("decile_revenue"),
        to_double(F.sum("__dec_rev").over(cum)).alias("cumulative_revenue"),
    ).orderBy("decile")


@register(
    "q_priority_mode_by_year",
    oracle="""
    SELECT order_year, o_orderpriority AS mode_priority, n
    FROM (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
               o_orderpriority, COUNT(*) AS n,
               ROW_NUMBER() OVER (PARTITION BY CAST(EXTRACT(year FROM o_orderdate) AS INT)
                                  ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
        FROM orders
        GROUP BY 1, 2
    )
    WHERE rn = 1
    ORDER BY order_year
    """,
    description="per-year modal order priority with deterministic tie-break",
)
def q_priority_mode_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group, spelled as count → top-1
    window rather than a MODE() builtin: builtin mode tie-breaking is
    engine-defined (and Spark's is non-deterministic across partition
    orders), while count-desc + value-asc is reproducible everywhere —
    the same determinism rule the engine applies to every ranking.
    The window input is the (year × priority) rollup, dozens of rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy(
        F.year("o_orderdate").cast("int").alias("order_year"),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("order_year").orderBy(F.desc("n"), "o_orderpriority")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("order_year", F.col("o_orderpriority").alias("mode_priority"), "n")
        .orderBy("order_year")
    )


_RETURN_FLAGS = ("A", "N", "R")


@register(
    "q_pivot_returns_matrix",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS order_year,
           {", ".join(
               f"CAST(SUM(CASE WHEN l.l_returnflag = '{fl}' "
               f"THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS rev_{fl}"
               for fl in _RETURN_FLAGS
           )}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY CAST(EXTRACT(year FROM o.o_orderdate) AS INT)
    ORDER BY order_year
    """,
    description="year × returnflag revenue matrix via the DataFrame pivot API",
)
def q_pivot_returns_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `.pivot()` surface: long (year, flag, revenue) → wide
    year × flag matrix. Pivot values are EXPLICIT — with them the plan
    is one pass of conditional aggregates (exactly the oracle's CASE
    battery, partial-aggregated map-side); without them Spark must run
    a distinct-values collect first (two jobs) and the output schema
    becomes data-dependent, which no downstream contract wants.
    Decimal-exact sums; zero-fill keeps absent cells 0 not NULL.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.year("o_orderdate").cast("int").alias("order_year"),
        "l_returnflag",
        dec("l_extendedprice", 2, 12).alias("price"),
    )
    wide = (
        joined.groupBy("order_year")
        .pivot("l_returnflag", list(_RETURN_FLAGS))
        .agg(F.sum("price"))
    )
    out = wide.select(
        "order_year",
        *[
            to_double(F.coalesce(F.col(fl), F.lit(0).cast("decimal(12,2)"))).alias(f"rev_{fl}")
            for fl in _RETURN_FLAGS
        ],
    )
    return out.orderBy("order_year")


_NATION_METRICS = ("revenue", "n_orders", "n_customers")


@register(
    "q_unpivot_nation_metrics",
    oracle="""
    WITH agg AS (
        SELECT n.n_name,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS DOUBLE) AS n_orders,
               CAST(COUNT(DISTINCT o.o_custkey) AS DOUBLE) AS n_customers
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    )
    SELECT n_name, 'revenue' AS metric, revenue AS value FROM agg
    UNION ALL
    SELECT n_name, 'n_orders', n_orders FROM agg
    UNION ALL
    SELECT n_name, 'n_customers', n_customers FROM agg
    ORDER BY n_name, metric
    """,
    description="wide→long metric melt via the DataFrame unpivot API",
)
def q_unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `.unpivot()`/melt surface: a wide per-nation metric rollup
    reshaped to (nation, metric, value) rows — the long form every
    generic dashboard/alerting sink consumes. Unpivot is a zero-shuffle
    Expand over the already-reduced rollup (3 output rows per input
    row); the oracle's UNION ALL is what the operator replaces — N
    scans of the aggregate become one.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = F.broadcast(load_table(spark, sf_dir, "customer"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    agg = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            to_double(F.sum(dec("o_totalprice", 2, 12))).alias("revenue"),
            F.count(F.lit(1)).cast("double").alias("n_orders"),
            F.countDistinct("o_custkey").cast("double").alias("n_customers"),
        )
    )
    return agg.unpivot(
        ids=["n_name"], values=list(_NATION_METRICS), variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("n_name", "metric")


@register(
    "q_order_lines_nested",
    oracle="""
    SELECT l_orderkey,
           COUNT(*) AS n_lines,
           list_sort(list(l_linenumber || ':' || CAST(CAST(l_quantity AS INT) AS VARCHAR)))
               AS line_summaries
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
    description="denormalized nested export: per-order sorted array of line summaries",
)
def q_order_lines_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The document-export shape: child rows collapsed into a sorted
    array per parent (what you write before handing an order feed to a
    document store / API that wants one record per order). collect_list
    is partial-aggregable (arrays concatenate map-side) and sort_array
    makes the result partition-order independent — an unsorted
    collect_list is NON-deterministic and would fail any replay or
    cross-engine diff, which is why the sort is part of the operator,
    not a courtesy.

    The modulus filter stands in for the incremental slice a real
    export job would take; it pushes to the scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    summary = F.concat_ws(
        ":",
        F.col("l_linenumber").cast("string"),
        F.col("l_quantity").cast("int").cast("string"),
    )
    return (
        li.where(F.col("l_orderkey") % 50 == 0)
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sort_array(F.collect_list(summary)).alias("line_summaries"),
        )
        .orderBy("l_orderkey")
    )


@register(
    "q_ship_lag_percentiles",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           MIN(date_diff('day', o.o_orderdate, l.l_shipdate)) AS min_lag_days,
           quantile_cont(date_diff('day', o.o_orderdate, l.l_shipdate), 0.5) AS p50_lag_days,
           quantile_cont(date_diff('day', o.o_orderdate, l.l_shipdate), 0.95) AS p95_lag_days,
           MAX(date_diff('day', o.o_orderdate, l.l_shipdate)) AS max_lag_days
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    description="order→ship fulfillment-lag percentiles per priority (the SLA table)",
)
def q_ship_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment SLA table: order-to-ship lag distribution per
    priority class — min/p50/p95/max in integer DAYS (datediff is
    exact integer arithmetic; the percentiles interpolate over
    integers identically in both engines). One fact join shuffled on
    orderkey, then a |priorities|-row percentile aggregate; at 100 TB
    the p50/p95 switch to approx_percentile like every other exact
    percentile here.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lag = F.datediff("l_shipdate", "o_orderdate")
    pct = F.percentile(lag, F.array(F.lit(0.5), F.lit(0.95)))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min(lag).alias("min_lag_days"),
            pct.alias("p"),
            F.max(lag).alias("max_lag_days"),
        )
        .select(
            "o_orderpriority",
            "n_items",
            "min_lag_days",
            F.col("p")[0].alias("p50_lag_days"),
            F.col("p")[1].alias("p95_lag_days"),
            "max_lag_days",
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_returns_rate_by_brand",
    oracle="""
    SELECT p.p_brand,
           COUNT(*) AS n_items,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_returned,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS return_rate,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                         THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
               AS returned_value
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
    description="product-quality screen: return rate and returned value per brand",
)
def q_returns_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate league table per brand — the product-quality screen
    merchandising watches (a brand whose return_rate jumps is the
    recall/listing-error signal). Part dim broadcasts; the only
    shuffle carries |brands| counter+decimal partials; the rate is one
    exact integer division and returned value stays decimal-exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    returned = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(returned).cast("bigint").alias("n_returned"),
            (F.sum(returned).cast("double") / F.count(F.lit(1))).alias("return_rate"),
            to_double(
                F.sum(
                    F.when(
                        F.col("l_returnflag") == "R", dec("l_extendedprice", 2, 12)
                    ).otherwise(F.lit(0).cast("decimal(12,2)"))
                )
            ).alias("returned_value"),
        )
        .orderBy("p_brand")
    )


# --- discount elasticity (OLS slope from exact moments) ----------------------


@register(
    "q_discount_elasticity",
    oracle="""
    WITH pts AS (
        SELECT p.p_brand,
               CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS x,
               CAST(l.l_quantity AS BIGINT) AS y
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    mom AS (
        SELECT p_brand, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy
        FROM pts GROUP BY p_brand
    )
    SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS qty_per_discount_pt,
           CAST(sy AS DOUBLE) / n AS mean_qty
    FROM mom
    WHERE (n * sxx - sx * sx) > 0
    ORDER BY p_brand
    """,
    description="per-brand OLS slope of quantity on discount points (exact integer moments, one float division)",
)
def q_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-response primitive: the least-squares slope of order
    quantity on discount points per brand — the first-cut elasticity
    table a pricing team reads before fitting anything fancier. A
    positive slope says deeper discounts move volume for that brand;
    near-zero says the discount budget is wasted there.

    Exactness: discount is re-expressed in integer points (×100 of
    the 2-decimal fraction), so all five OLS moments are exact
    integer sums under any partitioning; the slope is one float
    division of exact integers — bit-identical cross-engine (the
    emb_dim_correlation discipline applied to a regression).

    Scale: fact scan joined to the broadcast part dim, then a
    counters-only groupBy(brand) — |brands| rows out."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pts = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_brand",
        (dec("l_discount", 2, 4) * 100).cast("bigint").alias("x"),
        F.col("l_quantity").cast("bigint").alias("y"),
    )
    mom = pts.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / denom.cast("double")
    )
    return (
        mom.where(denom > 0)
        .select(
            "p_brand",
            F.col("n").cast("bigint").alias("n_lines"),
            slope.alias("qty_per_discount_pt"),
            (F.col("sy").cast("double") / F.col("n")).alias("mean_qty"),
        )
        .orderBy("p_brand")
    )
