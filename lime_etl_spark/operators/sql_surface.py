"""Spark 4 SQL-surface parity operators.

The reference engine is consumed through SQL as much as through its
API (lime-etl jobs wrap hand-written SQL — e2e MessageJob builds its
table with raw statements). This module exercises the *newest* Spark
SQL surfaces a migrating SQL user gets for free, each against a
DuckDB oracle:

- VARIANT (semi-structured ingestion: ``parse_json`` →
  ``variant_get`` — binary-encoded, schema-on-read, JVM-side)
- SQL pipe syntax (``|>`` — SIGMOD'24 "Pipe Syntax in SQL",
  Spark 4.0)
- ``listagg ... WITHIN GROUP`` ordered string aggregation (Spark 4.0)
- ``approx_top_k`` heavy-hitter sketch (Spark 4.1; exact when k ≥
  distinct, mergeable sketch at 100 TB)
- recursive CTE (Spark 4.1 ``WITH RECURSIVE``; UNION ALL + bounded
  recursion — transitive-closure UNION dedup is not supported yet,
  which is why dedup clustering keeps the min-label loop in
  operators/graph.py)
- Python UDTF (arrow-optimized table function — the user-extension
  point; the builtin-expression chunker in operators/text.py is the
  perf path, plan-gated to prove the same result)

Scale notes: every query here reduces to partial-aggregable shapes;
VARIANT extraction is codegen'd JVM work (never a Python UDF); the
recursive spine is month-grained (recursion depth = months, rows =
months — driver-side-tiny state per step); the UDTF runs Arrow-batched
with the chunk explosion inside the worker generator, one pass, no
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_etl_spark.operators.text import CHUNK_STRIDE, CHUNK_TOKENS
from lime_etl_spark.plans.registry import _REGISTRY, register
from lime_etl_spark.sources.readers import load_table, spread


@register(
    "ev_variant_props",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_field
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    description="VARIANT semi-structured ingestion: parse_json → variant_get typed extraction",
)
def ev_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON props column ONCE into a VARIANT and extract
    typed fields from the binary-encoded value. At 100 TB this is the
    schema-on-read path for evolving telemetry: VARIANT parses at
    ingest (columnar binary, shreddable), while repeated
    ``get_json_object`` re-parses the string per extraction.
    ``try_variant_get`` on an absent path returns NULL instead of
    failing — the drift-tolerant accessor."""
    # spread: parse_json of every props string runs pre-exchange in
    # the scan stage — hash-spread past the one-split test scan.
    # Keyed on event_id even though nothing downstream consumes it
    # (r9 ADVICE weighed this): the only consumed alternatives are
    # event_type (a handful of values → most partitions empty) and
    # props itself (measured 100 distinct values at sf0.1 — ~3x the
    # partition count, far below the 20-100x the guide's §2.5 hash-
    # spread rule wants), so the uniform 8-byte key is the cheapest
    # safe spreader.
    ev = spread(load_table(spark, sf_dir, "events"), "event_id")
    v = F.parse_json("props")
    k = F.expr("variant_get(v, '$.k', 'bigint')")
    missing = F.expr("try_variant_get(v, '$.missing', 'string')")
    return (
        ev.select("event_type", v.alias("v"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            F.sum(F.when(missing.isNull(), 1).otherwise(0)).alias("n_missing_field"),
        )
        .orderBy("event_type")
    )


@register(
    "q_pipe_returns_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2023-06-01'
    GROUP BY l_returnflag, l_linestatus
    HAVING COUNT(*) >= 10
    ORDER BY l_returnflag, l_linestatus
    """,
    description="SQL pipe syntax (|>): linear FROM→WHERE→AGGREGATE→WHERE→ORDER dataflow",
)
def q_pipe_returns_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same linear dataflow a DataFrame chain expresses, written
    in Spark 4 pipe syntax — each ``|>`` stage compiles to exactly the
    clause it names, so the optimized plan is identical to the Q1-style
    groupBy (scan → partial agg → exchange → final agg): the surface
    is new, the execution is not. The post-AGGREGATE ``|> WHERE`` is
    the HAVING without the scoping rules."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= TIMESTAMP '2023-06-01'
        |> AGGREGATE
             COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n_lines >= 10
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


@register(
    "q_segment_listagg",
    oracle="""
    WITH segs AS (
        SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    )
    SELECT n.n_name AS nation,
           COUNT(*) AS n_segments,
           string_agg(s.c_mktsegment, ',' ORDER BY s.c_mktsegment) AS segments
    FROM segs s JOIN nation n ON s.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
    description="listagg WITHIN GROUP ordered string aggregation over the distinct-reduced set",
)
def q_segment_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (Spark 4.0 ``listagg``). The WITHIN
    GROUP order makes the concatenation deterministic — an unordered
    listagg is partition-order noise, the same trap as summing
    doubles. Reduced to DISTINCT (nation, segment) BEFORE aggregating:
    the string build sees ≤ |nations|×|segments| rows, never customer
    cardinality — at 100 TB you never listagg raw fact rows."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    segs = cust.select("c_nationkey", "c_mktsegment").distinct()
    segs.createOrReplaceTempView("segs_v")
    nation.createOrReplaceTempView("nation_v")
    return spark.sql(
        """
        SELECT n.n_name AS nation,
               COUNT(*) AS n_segments,
               listagg(s.c_mktsegment, ',') WITHIN GROUP (ORDER BY s.c_mktsegment) AS segments
        FROM segs_v s JOIN nation_v n ON s.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY nation
        """
    )


APPROX_TOPK_K = 16  # ≥ |event types| → the sketch is exact at any scale


@register(
    "sketch_approx_topk",
    oracle=f"""
    SELECT event_type AS item, COUNT(*) AS est_count
    FROM events
    GROUP BY event_type
    ORDER BY est_count DESC, item
    LIMIT {APPROX_TOPK_K}
    """,
    description="approx_top_k heavy-hitter sketch (exact when k ≥ distinct; mergeable at scale)",
)
def sketch_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the Spark 4.1 ``approx_top_k`` sketch —
    fixed-size state per partition, merged associatively, one row of
    output; the exact groupBy it replaces shuffles every distinct key.
    With k ≥ the true distinct count the sketch IS exact (every item
    tracked), which is what lets DuckDB's exact GROUP BY serve as the
    oracle; at 100 TB cardinalities you keep the same query and accept
    the documented ±error. The count-min variant with a replayable
    cross-engine hash lives in sketch_heavy_hitters."""
    ev = load_table(spark, sf_dir, "events")
    topk = ev.select(
        F.expr(f"approx_top_k(event_type, {APPROX_TOPK_K})").alias("tk")
    )
    return (
        topk.select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("est_count"))
        .orderBy(F.desc("est_count"), "item")
    )


@register(
    "etl_month_spine_rcte",
    oracle="""
    WITH RECURSIVE spine(month_start, last_month) AS (
        SELECT date_trunc('month', MIN(o_orderdate)),
               date_trunc('month', MAX(o_orderdate))
        FROM orders
        UNION ALL
        SELECT month_start + INTERVAL 1 MONTH, last_month FROM spine
        WHERE month_start < last_month
    ),
    per_month AS (
        SELECT date_trunc('month', o_orderdate) AS m, COUNT(*) AS n
        FROM orders GROUP BY 1
    )
    SELECT strftime(s.month_start, '%Y-%m-%d') AS month_start,
           CAST(COALESCE(p.n, 0) AS BIGINT) AS n_orders,
           COALESCE(p.n, 0) = 0 AS is_gap
    FROM spine s LEFT JOIN per_month p ON p.m = s.month_start
    ORDER BY month_start
    """,
    description="recursive CTE calendar spine (Spark 4.1 WITH RECURSIVE) + gap detection",
)
def etl_month_spine_rcte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous month spine generated by a Spark 4.1 recursive CTE,
    outer-joined to per-month order counts — the gap detector that
    data-driven GROUP BY can't express (a month with zero orders never
    appears to group). Recursion is bounded and linear: one row per
    step, depth = month span, so the iterative substep is trivially
    small while the per-month aggregate stays a distributed partial
    agg. The sequence()-based generator in etl_backfill_plan is the
    non-SQL twin; this is the surface a migrating SQL user ports
    verbatim. (Transitive-closure recursion still needs UNION-dedup,
    unsupported in 4.1 — dedup clustering keeps the min-label loop.)

    Perf note (measured sf0.1): the textbook form with the MAX bound
    as a scalar subquery in the recursive step re-ran the orders
    aggregate EVERY iteration (~84 rounds × a fact scan ≈ 14s).
    Computing both bounds in the ANCHOR and threading last_month
    through the recursion as a column makes each step pure row
    arithmetic — 14.4s → ~1s, and at 100 TB the difference is 84
    fact scans."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH RECURSIVE spine(month_start, last_month) AS (
            SELECT date_trunc('MONTH', MIN(o_orderdate)),
                   date_trunc('MONTH', MAX(o_orderdate))
            FROM orders
            UNION ALL
            SELECT month_start + INTERVAL '1' MONTH, last_month FROM spine
            WHERE month_start < last_month
        ),
        per_month AS (
            SELECT date_trunc('MONTH', o_orderdate) AS m, COUNT(*) AS n
            FROM orders GROUP BY 1
        )
        SELECT date_format(s.month_start, 'yyyy-MM-dd') AS month_start,
               CAST(COALESCE(p.n, 0) AS BIGINT) AS n_orders,
               COALESCE(p.n, 0) = 0 AS is_gap
        FROM spine s LEFT JOIN per_month p ON p.m = s.month_start
        ORDER BY month_start
        """
    )


def _chunk_udtf_class():
    """Build the UDTF class lazily (decorator import at call time)."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id: bigint, chunk_ix: bigint, n_chunk_tokens: int, chunk_text: string",
        useArrow=True,
    )
    class ChunkWindows:
        def eval(self, doc_id: int, text: str):
            toks = text.split(" ") if text else [""]
            last_start = max(len(toks) - CHUNK_STRIDE, 1)
            start, ix = 1, 0
            while start <= last_start:
                chunk = toks[start - 1 : start - 1 + CHUNK_TOKENS]
                yield doc_id, ix, len(chunk), " ".join(chunk)
                start += CHUNK_STRIDE
                ix += 1

    return ChunkWindows


@register(
    "txt_chunk_udtf",
    # must equal txt_chunk_windows — same oracle holds both to one answer
    oracle=_REGISTRY["txt_chunk_windows"].oracle,
    description="Python UDTF chunker (arrow-optimized table function; extension-point parity)",
)
def txt_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The overlapping-window chunker as a Spark 4 Python UDTF — the
    user-extension surface for logic that outgrows expressions
    (real tokenizers, sentence splitters). Arrow-batched lateral join:
    each input row fans out inside the worker generator, no shuffle,
    no driver involvement. The builtin sequence/explode chunker
    (txt_chunk_windows) stays the perf path — tests prove both emit
    identical rows, so swapping a UDTF in when the logic demands
    Python is a local substitution, not a semantics change."""
    spark.udtf.register("chunk_windows_udtf", _chunk_udtf_class())
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_ix, c.n_chunk_tokens, c.chunk_text
        FROM documents d,
             LATERAL chunk_windows_udtf(d.doc_id, d.text) c
        """
    )


@register(
    "q_collation_distinct",
    oracle="""
    WITH corpus AS (
        SELECT c_mktsegment AS seg FROM customer
        UNION ALL
        SELECT lower(c_mktsegment) FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_distinct_binary,
           CAST(COUNT(DISTINCT lower(seg)) AS BIGINT) AS n_distinct_ci
    FROM corpus
    """,
    description="Spark 4 string collations: case-insensitive distinct via UTF8_LCASE collation (vs binary) — the engine-level fix for case-drifted codes",
)
def q_collation_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.0 collations as the engine-level answer to case-drifted
    code columns: a planted mixed-case segment feed (every 10th row
    re-lowercased) counts 2× the segments under binary comparison but
    collapses correctly under the UTF8_LCASE collation — WITHOUT
    rewriting data through lower() (the collation rides the
    comparison/agg, preserving original spellings for display and
    letting future indexes/joins be collation-aware). The oracle
    proves equivalence to the lower()-normalization a collation-less
    engine must apply.

    Scale: counters-only distinct aggregate, map-side combinable;
    collation comparison is JVM-side codegen (no UDF)."""
    customer = load_table(spark, sf_dir, "customer")
    corpus = customer.select(F.col("c_mktsegment").alias("seg")).unionByName(
        customer.where(F.col("c_custkey") % 10 == 0).select(
            F.lower("c_mktsegment").alias("seg")
        )
    )
    return corpus.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_distinct("seg").cast("bigint").alias("n_distinct_binary"),
        F.count_distinct(F.collate(F.col("seg"), "UTF8_LCASE"))
        .cast("bigint")
        .alias("n_distinct_ci"),
    )
