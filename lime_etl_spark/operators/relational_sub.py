"""Relational breadth: subquery-pattern queries (TPC-H Q4/7/15/16/17/19/21/22 flavors).

The first relational set (operators/relational.py) covers
scan/join/agg/window plans; this module adds the *subquery* plan
shapes an analyst actually writes — EXISTS / NOT EXISTS (semi / anti
joins), correlated aggregates, scalar subqueries, disjunctive
bracket predicates, and distinct-counts — each adapted to the columns
the driver tables carry (no partsupp table; no
commitdate/receiptdate/shipmode/phone columns).

100 TB design notes:

- EXISTS/NOT EXISTS compile to LEFT SEMI / LEFT ANTI joins — never a
  count-then-filter aggregate. Semi joins short-circuit per probe row
  and carry no payload columns through the shuffle.
- Correlated aggregates (Q17/Q22 thresholds) are decorrelated into a
  groupBy on the SAME key the subsequent join shuffles on, so Spark
  reuses one exchange; thresholds compare with exact cross-multiplied
  decimals (5·qty·n < Σqty), never engine-dependent float division.
- Self-joins on lineitem (Q21) all hash on l_orderkey — one shuffle
  of the fact feeds the join, the EXISTS and the NOT EXISTS.
- Scalar subqueries (Q15 max, Q22 average) produce 1-row DataFrames
  that Spark broadcast-joins; no driver-side collect.

Reference parity: lime-etl runs arbitrary SQL through its
unit-of-work (lime_etl/domain/job_spec.py:49); these are the Spark
plans for those jobs' subquery-shaped SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_etl_spark.functions.numeric import dec, to_double
from lime_etl_spark.plans.registry import register
from lime_etl_spark.sources.readers import load_table

_REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"


def _rev() -> "F.Column":
    return dec("l_extendedprice", 2, 12) * (
        F.lit(1).cast("decimal(3,2)") - dec("l_discount", 2, 4)
    )


@register(
    "q4_late_ship_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    description="EXISTS → left-semi join, priority counts (TPC-H Q4 flavor)",
)
def q4_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders in a quarter with at least one lineitem shipped >60 days
    after ordering. The EXISTS is a LEFT SEMI join: lineitem carries
    only (l_orderkey, l_shipdate) into the shuffle and each order
    short-circuits on first match — no count aggregate, no dedup."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "q7_nation_trade",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           strftime(o_orderdate, '%Y') AS order_year,
           CAST(SUM({rev}) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
       OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
    GROUP BY n1.n_name, n2.n_name, strftime(o_orderdate, '%Y')
    ORDER BY supp_nation, cust_nation, order_year
    """.format(rev=_REV_SQL),
    description="bi-nation trade volume, nation dim joined twice (TPC-H Q7 flavor)",
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade volume between two nations, per direction per year. The
    nation dim is broadcast TWICE under different roles (supplier's
    vs customer's nation) — the disjunctive nation-pair predicate is
    applied after both joins, and pushes each side down to the two
    relevant nationkeys via the broadcast hash table."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_18") & (F.col("cust_nation") == "NATION_19")
    ) | ((F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_18"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, supp.s_nationkey == F.col("s_nkey"))
        .join(n2, cust.c_nationkey == F.col("c_nkey"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.date_format("o_orderdate", "yyyy").alias("order_year")
        )
        .agg(to_double(F.sum(_rev())).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "order_year")
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey, SUM({rev}) AS tr
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(tr AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE tr = (SELECT MAX(tr) FROM rev)
    ORDER BY s_suppkey
    """.format(rev=_REV_SQL),
    description="scalar-subquery max: top revenue supplier(s) (TPC-H Q15)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum quarterly revenue. The revenue agg
    is computed once and reused for both the MAX scalar (1-row
    broadcast cross join) and the equality filter — comparison happens
    on exact DECIMAL so ties and float jitter can't diverge between
    engines; only the output casts to double."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("tr"))
    top = rev.agg(F.max("tr").alias("_max_tr"))
    return (
        rev.join(F.broadcast(top), rev.tr == F.col("_max_tr"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", to_double(F.col("tr")).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 100
    """,
    description="distinct-count suppliers per part bucket, NOT LIKE (TPC-H Q16 flavor)",
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many distinct suppliers ship each qualifying part bucket
    (lineitem is the part↔supplier association; the reference schema
    has no partsupp). The brand/type/size predicates are applied to
    the part dim BEFORE the broadcast, so the fact-side probe drops
    disqualified parts without shuffling them. count_distinct expands
    to a two-phase partial-dedup aggregate — shuffle carries (bucket,
    suppkey) pairs once, not raw lineitems."""
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(100)
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
    WITH pa AS (
        SELECT l_partkey AS pk,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq,
               COUNT(*) AS nq
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa ON pk = l_partkey
    WHERE p_brand = 'Brand#3'
      AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * nq < sq
    """,
    description="correlated per-part avg threshold, exact arithmetic (TPC-H Q17)",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to small-quantity orders: lineitems with quantity
    below 20% of their part's average. The correlated subquery is
    decorrelated into a groupBy on l_partkey — the same key the
    rejoin shuffles on, so AQE reuses one exchange of the fact. The
    threshold `qty < 0.2·avg` is evaluated as `5·qty·n < Σqty` in
    exact decimals: no float division, so Spark and the oracle agree
    on every borderline row."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(dec("l_quantity", 2, 12)).alias("sq"), F.count(F.lit(1)).alias("nq")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pa, li.l_partkey == F.col("pk"))
        .where(dec("l_quantity", 2, 12) * F.lit(5) * F.col("nq") < F.col("sq"))
        .agg(
            (to_double(F.sum(dec("l_extendedprice", 2, 12))) / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q19_bracket_predicates",
    oracle="""
    SELECT CAST(SUM({rev}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """.format(rev=_REV_SQL),
    description="disjunctive bracket predicates across join (TPC-H Q19)",
)
def q19_bracket_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue matching any of three (brand, size, quantity) brackets.
    The OR spans both tables, so no single conjunct pushes to either
    scan — instead the part side is pre-filtered to the UNION of the
    brand/size brackets (a derivable implied predicate Catalyst does
    not infer across OR), shrinking the broadcast; the residual
    disjunction evaluates on the joined row inside codegen."""
    brackets = [
        ("Brand#12", (1, 5), (1, 11)),
        ("Brand#23", (1, 10), (10, 20)),
        ("Brand#3", (1, 15), (20, 30)),
    ]
    part_pred = None
    full_pred = None
    for brand, (s_lo, s_hi), (q_lo, q_hi) in brackets:
        p = (F.col("p_brand") == brand) & F.col("p_size").between(s_lo, s_hi)
        f = p & F.col("l_quantity").between(q_lo, q_hi)
        part_pred = p if part_pred is None else (part_pred | p)
        full_pred = f if full_pred is None else (full_pred | f)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(part_pred)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(full_pred)
        .agg(
            to_double(F.sum(_rev())).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q21_sole_blame_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS n_blamed
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY n_blamed DESC, s_name
    LIMIT 100
    """,
    description="EXISTS + NOT EXISTS self-joins: sole-blame supplier (TPC-H Q21 flavor)",
)
def q21_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely to blame for returns on finished multi-supplier
    orders: their item came back ('R') while no other supplier's did.
    Three hash operations on l_orderkey — the orders join, the EXISTS
    semi join, and the NOT EXISTS anti join — share one shuffle of
    the fact. The semi/anti probe sides carry only (orderkey,
    suppkey[,flag]), and supplier names resolve by broadcast AFTER
    the aggregation (count per suppkey first, tiny result)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    l1 = li.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    others = li.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    others_r = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key")
    )
    blamed = (
        l1.join(orders, l1.l_orderkey == orders.o_orderkey, "left_semi")
        .join(
            others,
            (F.col("l_orderkey") == F.col("o2_key"))
            & (F.col("l_suppkey") != F.col("s2_key")),
            "left_semi",
        )
        .join(
            others_r,
            (F.col("l_orderkey") == F.col("o3_key"))
            & (F.col("l_suppkey") != F.col("s3_key")),
            "left_anti",
        )
    )
    counts = blamed.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n_blamed"))
    return (
        counts.join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_blamed").alias("n_blamed"))
        .orderBy(F.desc("n_blamed"), "s_name")
        .limit(100)
    )


@register(
    "q22_dormant_customers",
    oracle="""
    WITH pos AS (
        SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS sb, COUNT(*) AS nb
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_custs,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer, pos
    WHERE CAST(c_acctbal AS DECIMAL(12,2)) * nb > sb
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    description="scalar-avg threshold + anti join: rich dormant customers (TPC-H Q22 flavor)",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no orders since 2000
    ('dormant': every synthetic customer has SOME order, so dormancy
    is recency-based). The global average is a 1-row aggregate
    broadcast to every row; the threshold compares bal·n > Σbal in
    exact decimals (no float division). The NOT EXISTS is a LEFT ANTI
    join against orders pre-filtered by date — the filter prunes the
    anti-join build input before the shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    recent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    pos = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.sum(dec("c_acctbal", 2, 12)).alias("sb"), F.count(F.lit(1)).alias("nb")
    )
    return (
        cust.join(F.broadcast(pos))
        .where(dec("c_acctbal", 2, 12) * F.col("nb") > F.col("sb"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            to_double(F.sum(dec("c_acctbal", 2, 12))).alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )
