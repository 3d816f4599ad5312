"""Round-3 batch 4 insights: market-basket part affinity, row-local
cross-field constraint battery, new-vs-returning revenue split, and
per-source hapax (vocabulary-richness) profile.

lime-etl analog: the nightly report/test jobs a BatchSpec schedules
(`/root/reference/lime_etl/domain/job_spec.py:40` — `run()` builds a
table, `test()` asserts invariants); each is a first-class DataFrame
operator with a DuckDB oracle here.

Shared determinism rules (operators/events.py, insights.py): money
decimal-cast before SUM, shares as ONE IEEE division over exact
integer/decimal aggregates, deterministic total-order top-k
(count desc + key asc), bounded outputs so every ORDER BY sorts a
handful of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lime_etl_spark.functions.numeric import dec, to_double
from lime_etl_spark.functions.ranks import (
    with_global_cumsum,
    with_global_ntiles,
    with_global_row_number,
)
from lime_etl_spark.functions.text import shingle_int_sql
from lime_etl_spark.operators.dedup import _minhash_sql
from lime_etl_spark.operators.graph import _LPA_FINAL, _lpa_sql
from lime_etl_spark.operators.training import _bucket_sql
from lime_etl_spark.plans.registry import register
from lime_etl_spark.sources.readers import load_table

# --- market-basket part affinity -------------------------------------------

BASKET_MIN_BOTH = 2  # min co-occurrence count for a pair to surface
BASKET_TOP_K = 50


@register(
    "q_basket_pairs",
    oracle=f"""
    WITH bp AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), total AS (
        SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM bp
    ), pc AS (
        SELECT l_partkey, COUNT(*) AS n FROM bp GROUP BY l_partkey
    ), pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS n_both
        FROM bp a
        JOIN bp b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    )
    SELECT p.part_a, p.part_b, p.n_both,
           ca.n AS n_orders_a, cb.n AS n_orders_b,
           CAST(t.n_orders * p.n_both AS DOUBLE) / (ca.n * cb.n) AS lift
    FROM pairs p
    JOIN pc ca ON ca.l_partkey = p.part_a
    JOIN pc cb ON cb.l_partkey = p.part_b
    CROSS JOIN total t
    WHERE p.n_both >= {BASKET_MIN_BOTH}
    ORDER BY n_both DESC, part_a, part_b
    LIMIT {BASKET_TOP_K}
    """,
    description="market-basket part-pair co-occurrence with lift (association mining)",
)
def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part pairs that co-occur in the same order, with lift
    N·n_ab/(n_a·n_b) — the association-rule signal behind
    'frequently bought together'.

    Scale: the fact reduces to DISTINCT (order, part) FIRST, so the
    self-join fan-out is bounded by basket size (k lines → ≤k² pairs
    per order), never |lineitem|²; the a<b predicate halves it and
    kills self-pairs. The pair rollup combines map-side; per-part
    counts and the 1-row order total are broadcast onto the
    pair-grain rollup (never joined at pair-expansion grain). Lift is
    an exact-integer cross-product with ONE IEEE division, and the
    top-k order (n_both desc, part_a, part_b) is a total order so the
    LIMIT boundary is deterministic cross-engine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    bp = li.select("l_orderkey", "l_partkey").distinct().persist()
    total = bp.agg(
        F.count_distinct("l_orderkey").alias("n_orders")
    )
    pc = bp.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a = bp.alias("a")
    b = bp.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= BASKET_MIN_BOTH)
    )
    ca = pc.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("n_orders_a"))
    cb = pc.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("n_orders_b"))
    return (
        pairs.join(F.broadcast(ca), "part_a")
        .join(F.broadcast(cb), "part_b")
        .crossJoin(F.broadcast(total))
        .select(
            "part_a",
            "part_b",
            "n_both",
            "n_orders_a",
            "n_orders_b",
            (
                (F.col("n_orders") * F.col("n_both")).cast("double")
                / (F.col("n_orders_a") * F.col("n_orders_b"))
            ).alias("lift"),
        )
        .orderBy(F.desc("n_both"), "part_a", "part_b")
        .limit(BASKET_TOP_K)
    )


# --- row-local cross-field constraint battery ------------------------------


@register(
    "dq_cross_field",
    oracle="""
    WITH li AS (
        SELECT COUNT(*) AS n_rows,
               COUNT(*) FILTER (WHERE l_quantity <= 0) AS neg_quantity,
               COUNT(*) FILTER (WHERE l_extendedprice <= 0) AS neg_price,
               COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.5)
                   AS discount_range,
               COUNT(*) FILTER (WHERE l_tax < 0) AS neg_tax
        FROM lineitem
    ), o AS (
        SELECT COUNT(*) AS n_rows,
               COUNT(*) FILTER (WHERE o_totalprice <= 0) AS neg_total,
               COUNT(*) FILTER (WHERE o_orderdate IS NULL) AS null_date
        FROM orders
    )
    SELECT tbl, chk, n_rows, n_violations,
           CAST(n_violations AS DOUBLE) / n_rows AS violation_rate
    FROM (
        SELECT 'lineitem' AS tbl, 'neg_quantity' AS chk, n_rows, neg_quantity AS n_violations FROM li
        UNION ALL SELECT 'lineitem', 'neg_price', n_rows, neg_price FROM li
        UNION ALL SELECT 'lineitem', 'discount_range', n_rows, discount_range FROM li
        UNION ALL SELECT 'lineitem', 'neg_tax', n_rows, neg_tax FROM li
        UNION ALL SELECT 'orders', 'neg_total', n_rows, neg_total FROM o
        UNION ALL SELECT 'orders', 'null_date', n_rows, null_date FROM o
    )
    ORDER BY tbl, chk
    """,
    description="row-local cross-field constraint battery (counters-only, shuffle-free scans)",
)
def dq_cross_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-row sanity constraints every load should gate on
    (non-positive money/quantity, out-of-domain discount, null key
    dates) — the row-local complement to dq_referential_integrity
    (cross-table) and dq_accepted_values (code domains).

    Scale: each table contributes ONE counters-only aggregate — a
    shuffle-free scan reducing to a single row of int64 counters
    (conditional counts combine map-side), then stack() unpivots the
    wide row to the (table, check) report grain driver-side-free.
    Rates are one IEEE division per output row. The oracle scans with
    FILTER counters and unions — same counters, readable shape.
    """

    def battery(df: DataFrame, tbl: str, checks: dict[str, F.Column]) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("n_rows")] + [
            F.sum(F.when(cond, 1).otherwise(0)).alias(name)
            for name, cond in checks.items()
        ]
        wide = df.agg(*aggs)
        stack_args = ", ".join(f"'{name}', {name}" for name in checks)
        return wide.select(
            F.lit(tbl).alias("tbl"),
            F.expr(f"stack({len(checks)}, {stack_args}) AS (chk, n_violations)"),
            "n_rows",
        ).select("tbl", "chk", "n_rows", "n_violations")

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    li_checks = {
        "neg_quantity": F.col("l_quantity") <= 0,
        "neg_price": F.col("l_extendedprice") <= 0,
        "discount_range": (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5),
        "neg_tax": F.col("l_tax") < 0,
    }
    o_checks = {
        "neg_total": F.col("o_totalprice") <= 0,
        "null_date": F.col("o_orderdate").isNull(),
    }
    out = battery(li, "lineitem", li_checks).unionByName(
        battery(orders, "orders", o_checks)
    )
    return out.select(
        "tbl",
        "chk",
        "n_rows",
        "n_violations",
        (F.col("n_violations").cast("double") / F.col("n_rows")).alias(
            "violation_rate"
        ),
    ).orderBy("tbl", "chk")


# --- new vs returning revenue ----------------------------------------------


@register(
    "ev_new_vs_returning",
    oracle="""
    WITH p AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(value AS DECIMAL(12,2)) AS v,
               MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS first_d
        FROM events WHERE event_type = 'purchase'
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(COALESCE(SUM(CASE WHEN d = first_d THEN v END), 0) AS DOUBLE)
               AS new_revenue,
           CAST(COALESCE(SUM(CASE WHEN d > first_d THEN v END), 0) AS DOUBLE)
               AS returning_revenue,
           COUNT(DISTINCT CASE WHEN d = first_d THEN user_id END) AS new_buyers,
           COUNT(DISTINCT CASE WHEN d > first_d THEN user_id END)
               AS returning_buyers
    FROM p
    GROUP BY d
    ORDER BY day
    """,
    description="daily revenue split by new vs returning buyers (acquisition-vs-retention mix)",
)
def ev_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase revenue and buyer counts split into new
    (first-ever purchase day) vs returning — the acquisition/retention
    mix report behind every growth dashboard.

    Scale: first-purchase day is a MIN window over user_id on the
    purchase-filtered fact — ONE user_id shuffle, no per-user rollup
    join; the daily rollup after it is a second (calendar-bounded)
    exchange whose output is |days| rows. Money is decimal-cast
    before SUM; empty legs COALESCE to exact 0 before the one
    double conversion. Day is formatted as a string so both engines
    emit the identical calendar key.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id")
    p = ev.select(
        "user_id",
        F.to_date("ts").alias("d"),
        dec("value", 2, 12).alias("v"),
    ).withColumn("first_d", F.min("d").over(w))
    return (
        p.groupBy("d")
        .agg(
            to_double(
                F.coalesce(
                    F.sum(F.when(F.col("d") == F.col("first_d"), F.col("v"))),
                    F.lit(0).cast("decimal(12,2)"),
                )
            ).alias("new_revenue"),
            to_double(
                F.coalesce(
                    F.sum(F.when(F.col("d") > F.col("first_d"), F.col("v"))),
                    F.lit(0).cast("decimal(12,2)"),
                )
            ).alias("returning_revenue"),
            F.count_distinct(
                F.when(F.col("d") == F.col("first_d"), F.col("user_id"))
            ).alias("new_buyers"),
            F.count_distinct(
                F.when(F.col("d") > F.col("first_d"), F.col("user_id"))
            ).alias("returning_buyers"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "new_revenue",
            "returning_revenue",
            "new_buyers",
            "returning_buyers",
        )
        .orderBy("day")
    )


# --- hapax / vocabulary richness -------------------------------------------


@register(
    "txt_hapax_ratio",
    oracle="""
    WITH toks AS (
        SELECT source, word
        FROM (
            SELECT source,
                   unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
            FROM documents
        )
        WHERE word <> ''
    ), counts AS (
        SELECT source, word, COUNT(*) AS n FROM toks GROUP BY source, word
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           COUNT(*) AS vocab_size,
           COUNT(*) FILTER (WHERE n = 1) AS hapax_count,
           CAST(COUNT(*) FILTER (WHERE n = 1) AS DOUBLE) / COUNT(*)
               AS hapax_share,
           CAST(COUNT(*) AS DOUBLE) / SUM(n) AS type_token_ratio
    FROM counts
    GROUP BY source
    ORDER BY source
    """,
    description="per-source hapax legomena + type/token ratio (vocabulary-richness / junk screen)",
)
def txt_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-richness profile per source: hapax legomena share
    (words occurring exactly once) and type/token ratio — boilerplate
    and template-heavy sources sit low, OCR-noise/junk sources
    spike high, so both tails feed the curation gate.

    Scale: one (source, word) count aggregate with full map-side
    combine — the explode never shuffles raw text, only (source,
    word-hash-partitioned) counter rows; the rollup output is
    |sources| rows. Shares are single IEEE divisions over exact
    int64 counters. Same lowercase/[^a-z0-9] tokenizer as
    txt_vocab_overlap, so 'vocabulary' agrees across the family.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("word"),
        )
        .where(F.col("word") != "")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.groupBy("source")
        .agg(
            F.sum("n").alias("total_tokens"),
            F.count(F.lit(1)).alias("vocab_size"),
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("hapax_count"),
        )
        .select(
            "source",
            "total_tokens",
            "vocab_size",
            "hapax_count",
            (F.col("hapax_count").cast("double") / F.col("vocab_size")).alias(
                "hapax_share"
            ),
            (F.col("vocab_size").cast("double") / F.col("total_tokens")).alias(
                "type_token_ratio"
            ),
        )
        .orderBy("source")
    )


# --- Zipf rank-frequency audit ---------------------------------------------

ZIPF_TOP_K = 50


@register(
    "txt_zipf_audit",
    oracle=f"""
    WITH c AS (
        SELECT word, COUNT(*) AS n
        FROM (
            SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
            FROM documents
        )
        WHERE word <> ''
        GROUP BY word
    ), r AS (
        SELECT word, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, word) AS rnk,
               LEAD(n) OVER (ORDER BY n DESC, word) AS next_n
        FROM c
    )
    SELECT rnk, word, n,
           CAST(n AS DOUBLE) / next_n AS decay
    FROM r
    WHERE rnk <= {ZIPF_TOP_K}
    ORDER BY rnk
    """,
    description="Zipf rank-frequency head audit: top-k words with consecutive-rank decay ratios (log-free)",
)
def txt_zipf_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rank-frequency head: top-k words with the frequency
    decay ratio f(r)/f(r+1) — natural text sits near 1+1/r (Zipf);
    generated/templated corpora flatten or step. Log-free: the decay
    ratio is rank-equivalent to the log-log slope.

    Scale: word counts combine map-side to |vocab| counter rows; the
    global rank window is a single-task sort bounded by VOCAB (same
    documented trade as cur_rarity_score — vocabulary grows ~log of
    corpus size, so the one-task sort holds at 100 TB; the fact scan
    never sorts). Ties at the LIMIT boundary break on word asc, so
    the k-th row is deterministic cross-engine.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), "word")
    ranked = counts.select(
        F.row_number().over(w).alias("rnk"),
        "word",
        "n",
        (F.col("n").cast("double") / F.lead("n").over(w)).alias("decay"),
    )
    return ranked.where(F.col("rnk") <= ZIPF_TOP_K).orderBy("rnk")


# --- embedding pair-distance histogram -------------------------------------

# Count-derived pair sampling (r7 verdict #2, What's-wrong #1): the
# sample is broadcast against itself, so it must target a fixed SIZE
# (~PAIR_TARGET vectors -> ~TARGET^2/2 pairs) at ANY corpus scale — a
# fixed fraction grows the broadcast 100x at 100x vectors and the pair
# count 10,000x. Same md5-bucket discipline; the mod now derives from a
# 1-row corpus count, with the identical derivation in the oracle.
PAIR_TARGET = 25  # sampled-vector SIZE target
PAIR_MOD_SQL = f"(SELECT GREATEST(1, COUNT(*) // {PAIR_TARGET}) FROM embeddings)"


def pair_sample_mod(emb) -> int:
    """max(1, N // PAIR_TARGET) — the Python twin of PAIR_MOD_SQL."""
    return max(1, emb.count() // PAIR_TARGET)


@register(
    "emb_pair_distance_hist",
    oracle=f"""
    WITH s AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings
        WHERE {shingle_int_sql("CAST(vec_id AS VARCHAR)")} % {PAIR_MOD_SQL} = 0
    ), pairs AS (
        SELECT list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e))
                    * sqrt(list_dot_product(b.e, b.e))) AS cosine
        FROM s a JOIN s b ON a.vec_id < b.vec_id
    )
    SELECT CAST(FLOOR(cosine * 10) AS BIGINT) AS bucket,
           COUNT(*) AS n_pairs
    FROM pairs
    GROUP BY bucket
    ORDER BY bucket
    """,
    description="cosine distribution over hash-sampled vector pairs (embedding-space health / hubness screen)",
)
def emb_pair_distance_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of pairwise cosines over a deterministic FIXED-SIZE
    vector sample (~PAIR_TARGET vectors via a count-derived md5-bucket
    mod) — the embedding-space health screen: a healthy space is a
    bell away from 1.0; mass piling near 1.0 means collapsed/duplicate
    embeddings, mass at 0 with no tail means the metric won't rank.

    Scale (r7 verdict #2): the mod derives from a 1-row corpus count
    targeting PAIR_TARGET sampled vectors, so the pair count stays
    ~TARGET²/2 and the broadcast-self-join side stays a few KB at ANY
    corpus size — 500 vectors or 50 billion. Norms are computed once
    per sampled vector (N sqrts, not 2·P). Bucketing is FLOOR on
    bit-identical doubles (the row-local fixed-order fold both engines
    share), output ≤21 rows.
    """
    from lime_etl_spark.operators.similarity import dot
    from lime_etl_spark.operators.training import hash_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    s = (
        emb.where(hash_bucket(F.col("vec_id"), pair_sample_mod(emb)) == 0)
        .select(
            "vec_id",
            "embedding",
            F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("norm"),
        )
        .persist()
    )
    a, b = s.alias("a"), s.alias("b")
    cos = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.norm") * F.col("b.norm")
    )
    return (
        a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.floor(cos * 10).cast("bigint").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("bucket")
    )


# --- cross-table temporal consistency --------------------------------------

SLOW_SHIP_DAYS = 90


@register(
    "dq_temporal_consistency",
    oracle=f"""
    SELECT EXTRACT(YEAR FROM o.o_orderdate) AS yr,
           COUNT(*) AS n_lines,
           COUNT(*) FILTER (WHERE l.l_shipdate < o.o_orderdate) AS n_ship_before_order,
           COUNT(*) FILTER (
               WHERE date_diff('day', o.o_orderdate, l.l_shipdate) > {SLOW_SHIP_DAYS}
           ) AS n_slow_ship,
           MAX(date_diff('day', o.o_orderdate, l.l_shipdate)) AS max_lag_days,
           MIN(date_diff('day', o.o_orderdate, l.l_shipdate)) AS min_lag_days
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY yr
    ORDER BY yr
    """,
    description="cross-table temporal sanity: ship-before-order / slow-ship counters per order year",
)
def dq_temporal_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-ordering sanity across the header/detail join: lineitems
    shipped BEFORE their order date (clock skew / bad backfill) and
    ship lags beyond the SLA horizon, per order year — the temporal
    complement to dq_cross_field's row-local battery.

    Scale: one orderkey equi-shuffle joins detail to header (both
    fact-sized — no broadcast pretense), then everything reduces to
    |years| rows of int64 counters with full map-side combine; lag
    arithmetic is integer days on DATE, no timestamps or floats.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        j.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
            ).alias("n_ship_before_order"),
            F.sum(F.when(lag > SLOW_SHIP_DAYS, 1).otherwise(0)).alias("n_slow_ship"),
            F.max(lag).alias("max_lag_days"),
            F.min(lag).alias("min_lag_days"),
        )
        .orderBy("yr")
    )


# --- mutual k-NN graph ------------------------------------------------------

# Count-derived shard sizing (r7 verdict #2): the kNN-graph family
# broadcast-self-joins its shard, so the shard must be a fixed SIZE at
# any corpus scale, not a fixed fraction. Same derivation discipline as
# similarity.QUERY_MOD_SQL; mutual_mod() is the Python twin.
MUTUAL_TARGET = 50  # shard SIZE target -> shard size in [TARGET, 2*TARGET)
MUTUAL_MOD_SQL = f"(SELECT GREATEST(1, COUNT(*) // {MUTUAL_TARGET}) FROM embeddings)"
MUTUAL_K = 5


def mutual_mod(emb) -> int:
    """max(1, N // MUTUAL_TARGET) — the Python twin of MUTUAL_MOD_SQL
    (one bounded count job; literal mod keeps the filter pushable)."""
    return max(1, emb.count() // MUTUAL_TARGET)


@register(
    "ann_mutual_knn",
    oracle=f"""
    WITH s AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings WHERE vec_id % {MUTUAL_MOD_SQL} = 0
    ), scored AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               list_dot_product(a.e, b.e)
                 / (sqrt(list_dot_product(a.e, a.e))
                    * sqrt(list_dot_product(b.e, b.e))) AS cosine
        FROM s a JOIN s b ON a.vec_id <> b.vec_id
    ), knn AS (
        SELECT va, vb, cosine,
               ROW_NUMBER() OVER (PARTITION BY va ORDER BY cosine DESC, vb) AS rnk
        FROM scored
    )
    SELECT e1.va AS vec_a, e1.vb AS vec_b, e1.cosine,
           e1.rnk AS rank_ab, e2.rnk AS rank_ba
    FROM (SELECT * FROM knn WHERE rnk <= {MUTUAL_K}) e1
    JOIN (SELECT * FROM knn WHERE rnk <= {MUTUAL_K}) e2
      ON e1.va = e2.vb AND e1.vb = e2.va AND e1.va < e1.vb
    ORDER BY vec_a, vec_b
    """,
    description="mutual k-NN graph edges (a∈kNN(b) ∧ b∈kNN(a)) — the hub-resistant input to density clustering",
)
def ann_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual k-NN edges over a deterministic vector shard: the edge
    survives only if each endpoint ranks the other in its top-k —
    the standard hub-suppression step before density/agglomerative
    clustering (hubs dominate one-directional kNN lists; mutuality
    filters them).

    Scale: per-shard mutual graphs are how this runs at 100 TB (the
    mod-shard is the blocking unit; IVF/LSH buckets replace it when
    recall beyond the shard matters). The kNN lists come from ONE
    windowed top-k over the pair scores (WindowGroupLimit keeps
    per-key state at k), and the mutual join touches only the
    k·|shard| surviving edges, not the pair expansion. Ranks order by
    (cosine desc, vec_id) — bit-identical doubles + total tie-break =
    the same k-set on both engines.
    """
    from lime_etl_spark.operators.similarity import knn_edges, knn_shard

    emb = load_table(spark, sf_dir, "embeddings")
    s = knn_shard(emb, mutual_mod(emb)).persist()
    knn = knn_edges(s, MUTUAL_K).persist()
    e1, e2 = knn.alias("e1"), knn.alias("e2")
    return (
        e1.join(
            e2,
            (F.col("e1.va") == F.col("e2.vb"))
            & (F.col("e1.vb") == F.col("e2.va"))
            & (F.col("e1.va") < F.col("e1.vb")),
        )
        .select(
            F.col("e1.va").alias("vec_a"),
            F.col("e1.vb").alias("vec_b"),
            F.col("e1.cosine").alias("cosine"),
            F.col("e1.rnk").alias("rank_ab"),
            F.col("e2.rnk").alias("rank_ba"),
        )
        .orderBy("vec_a", "vec_b")
    )


# --- session-grain conversion ----------------------------------------------


def _session_rollup_sql(gap_us: int) -> str:
    """DuckDB twin of operators.events.sessionize reduced to session
    grain — same lag→flag→cumsum expression the bounce-rate oracle
    uses, so session definitions cannot drift between metrics."""
    return f"""
        SELECT user_id, session_seq, MIN(ts_us) AS start_us,
               COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchases
        FROM (
            SELECT user_id, event_type, ts_us,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM (
                SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
                       CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                                 OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {gap_us}
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
            )
        )
        GROUP BY user_id, session_seq
    """


def _ev_session_conversion_oracle() -> str:
    from lime_etl_spark.operators.events import SESSION_GAP_US

    return f"""
    WITH sess AS ({_session_rollup_sql(SESSION_GAP_US)})
    SELECT CAST(to_timestamp(start_us // 1000000) AS DATE) AS day,
           COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_purchases > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_converting,
           CAST(SUM(n_purchases) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN n_purchases > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS conversion_rate
    FROM sess
    GROUP BY CAST(to_timestamp(start_us // 1000000) AS DATE)
    ORDER BY day
    """


@register(
    "ev_session_conversion",
    oracle=_ev_session_conversion_oracle(),
    description="daily session-grain conversion rate (sessions containing a purchase) on the shared sessionization",
)
def ev_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion measured at SESSION grain — the funnel metric
    product teams actually quote ('what share of visits buy') — on
    the exact sessionization bounce rate and session depth ride, so
    the denominator is the same number across the dashboard family.

    Scale: one user shuffle for sessionize (shared lag+cumsum
    windows), session rollup carries 3 int64 counters, then a
    calendar-bounded day rollup; the rate is one IEEE division over
    exact integers. Day attribution by session START, same as
    ev_bounce_rate.
    """
    from lime_etl_spark.operators.events import sessionize

    ev = load_table(spark, sf_dir, "events")
    sess = (
        sessionize(ev)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("__ts_us").alias("start_us"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("n_purchases"),
        )
    )
    day = F.to_date(F.timestamp_micros(F.col("start_us")))
    return (
        sess.groupBy(day.alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(F.when(F.col("n_purchases") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_converting"),
            F.sum("n_purchases").cast("bigint").alias("n_purchases"),
        )
        .select(
            "day",
            "n_sessions",
            "n_converting",
            "n_purchases",
            (F.col("n_converting").cast("double") / F.col("n_sessions")).alias(
                "conversion_rate"
            ),
        )
        .orderBy("day")
    )


# --- seasonal-naive forecast backtest ---------------------------------------

SEASONAL_LAG_DAYS = 7


@register(
    "ev_forecast_seasonal_naive",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               SUM(CAST(value AS DECIMAL(12,2))) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY CAST(ts AS DATE)
    )
    SELECT strftime(a.d, '%a') AS dow,
           COUNT(*) AS n_days_scored,
           CAST(SUM(ABS(a.rev - b.rev)) AS DOUBLE) AS total_abs_err,
           CAST(SUM(ABS(a.rev - b.rev)) AS DOUBLE) / COUNT(*) AS mae
    FROM daily a
    JOIN daily b ON b.d = a.d - INTERVAL {SEASONAL_LAG_DAYS} DAY
    GROUP BY strftime(a.d, '%a')
    ORDER BY dow
    """,
    description="seasonal-naive (t-7) revenue forecast backtest: MAE per weekday over the daily rollup",
)
def ev_forecast_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the strongest trivial forecaster — predict today's
    revenue with the same weekday last week — per weekday. This is
    the baseline every real forecast must beat, and its MAE is the
    noise floor ev_anomaly_zscore alerts should be calibrated above.

    Scale: the fact reduces to the |days|-row daily rollup FIRST
    (decimal-exact revenue); prediction is a self-join of that tiny
    rollup on exact date arithmetic (broadcast-sized by construction
    — the calendar bounds it at any corpus scale); errors are decimal
    subtractions summed exactly, ONE double conversion + division at
    the end. Weekday is the cross-engine-safe NAME.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    daily = (
        ev.groupBy(F.to_date("ts").alias("d"))
        .agg(F.sum(dec("value", 2, 12)).alias("rev"))
        .persist()
    )
    a, b = daily.alias("a"), daily.alias("b")
    err = F.abs(F.col("a.rev") - F.col("b.rev"))
    return (
        a.join(
            F.broadcast(b),
            F.col("b.d") == F.date_sub(F.col("a.d"), SEASONAL_LAG_DAYS),
        )
        .groupBy(F.date_format("a.d", "E").alias("dow"))
        .agg(
            F.count(F.lit(1)).alias("n_days_scored"),
            to_double(F.sum(err)).alias("total_abs_err"),
        )
        .select(
            "dow",
            "n_days_scored",
            "total_abs_err",
            (F.col("total_abs_err") / F.col("n_days_scored")).alias("mae"),
        )
        .orderBy("dow")
    )


# --- kNN label self-consistency --------------------------------------------

CONSIST_K = 10


@register(
    "emb_knn_label_consistency",
    oracle=f"""
    WITH s AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings WHERE vec_id % {MUTUAL_MOD_SQL} = 0
    ), scored AS (
        SELECT a.vec_id AS va, a.label AS own_label, b.label AS nbr_label,
               ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY list_dot_product(a.e, b.e)
                              / (sqrt(list_dot_product(a.e, a.e))
                                 * sqrt(list_dot_product(b.e, b.e))) DESC,
                            b.vec_id
               ) AS rnk
        FROM s a JOIN s b ON a.vec_id <> b.vec_id
    ), votes AS (
        SELECT va, own_label, nbr_label, COUNT(*) AS n
        FROM scored WHERE rnk <= {CONSIST_K}
        GROUP BY va, own_label, nbr_label
    ), majority AS (
        SELECT va, own_label, nbr_label AS voted_label
        FROM (
            SELECT va, own_label, nbr_label,
                   ROW_NUMBER() OVER (PARTITION BY va
                                      ORDER BY n DESC, nbr_label) AS r
            FROM votes
        ) WHERE r = 1
    )
    SELECT own_label AS label,
           COUNT(*) AS n_vectors,
           CAST(SUM(CASE WHEN voted_label = own_label THEN 1 ELSE 0 END) AS BIGINT)
               AS n_consistent,
           CAST(SUM(CASE WHEN voted_label = own_label THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS consistency
    FROM majority
    GROUP BY own_label
    ORDER BY label
    """,
    description="leave-one-out kNN label self-consistency per label (embedding-quality eval; majority tie-break count desc + label asc)",
)
def emb_knn_label_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out kNN self-consistency: for every vector in the
    shard, does the majority label of its k nearest neighbors match
    its own? Per-label consistency is the standard intrinsic eval of
    an embedding space (low consistency for one label = that class
    is smeared; low everywhere = the metric doesn't separate).

    Scale: same deterministic mod-shard as ann_mutual_knn — the
    blocking unit at 100 TB; one windowed top-k (WindowGroupLimit),
    then vote counting and the majority pick ride the va shuffle;
    output is |labels| rows. Majority tie-break is (count desc,
    label asc) — the reproducible mode convention from
    q_priority_mode_by_year.
    """
    from lime_etl_spark.operators.similarity import knn_edges, knn_shard

    emb = load_table(spark, sf_dir, "embeddings")
    s = knn_shard(emb, mutual_mod(emb), with_label=True).persist()
    votes = (
        knn_edges(s, CONSIST_K)
        .groupBy("va", "own_label", "nbr_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wm = Window.partitionBy("va").orderBy(F.desc("n"), "nbr_label")
    majority = (
        votes.withColumn("r", F.row_number().over(wm))
        .where(F.col("r") == 1)
        .select("va", "own_label", F.col("nbr_label").alias("voted_label"))
    )
    hit = F.when(F.col("voted_label") == F.col("own_label"), 1).otherwise(0)
    return (
        majority.groupBy(F.col("own_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(hit).cast("bigint").alias("n_consistent"),
        )
        .select(
            "label",
            "n_vectors",
            "n_consistent",
            (F.col("n_consistent").cast("double") / F.col("n_vectors")).alias(
                "consistency"
            ),
        )
        .orderBy("label")
    )


# --- bridge edges between communities ---------------------------------------


@register(
    "graph_bridge_edges",
    oracle=f"""
    WITH {_lpa_sql()}
    SELECT p.doc_a, p.doc_b, p.jaccard,
           CAST(la.community AS BIGINT) AS comm_a,
           CAST(lb.community AS BIGINT) AS comm_b
    FROM lpa_pairs p
    JOIN {_LPA_FINAL} la ON la.vid = p.doc_a
    JOIN {_LPA_FINAL} lb ON lb.vid = p.doc_b
    WHERE la.community != lb.community
    ORDER BY doc_a, doc_b
    """,
    description="near-dup edges whose endpoints land in different LP communities — the over-merge culprits to cut (unrolled-LPA DuckDB oracle)",
)
def graph_bridge_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The edges that GLUE template families: verified near-dup pairs
    whose endpoints belong to different label-propagation
    communities. These are exactly the links that make connected
    components over-merge (graph_cluster_density measures the damage;
    this names the culprit edges to cut or human-review before
    collapsing clusters).

    Scale: ONE persisted LSH-verified pair pipeline feeds both the LP
    iteration and the final edge classification; community labels
    join onto the edge list by vertex id (the |active-vertices|-sized
    LP output, not the corpus). Output is bounded by the bridge count
    — near-zero on a healthy corpus.
    """
    from lime_etl_spark.operators.dedup import (
        JACCARD_TAU,
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )
    from lime_etl_spark.operators.graph import label_propagation

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    pairs = (
        jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh)))
        .where(F.col("jaccard") >= JACCARD_TAU)
        .persist()
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    lp = label_propagation(docs.select(F.col("doc_id").alias("vid")), edges)
    sh.unpersist()
    return bridge_edges(pairs, lp)


def bridge_edges(pairs: DataFrame, communities: DataFrame) -> DataFrame:
    """Classify verified pair edges against a (vid, community)
    labeling: keep the edges whose endpoints disagree. Two broadcast-
    sized joins on the LP output (active vertices only)."""
    ca = communities.select(
        F.col("vid").alias("doc_a"), F.col("community").alias("comm_a")
    )
    cb = communities.select(
        F.col("vid").alias("doc_b"), F.col("community").alias("comm_b")
    )
    return (
        pairs.join(ca, "doc_a")
        .join(cb, "doc_b")
        .where(F.col("comm_a") != F.col("comm_b"))
        .select("doc_a", "doc_b", "jaccard", "comm_a", "comm_b")
        .orderBy("doc_a", "doc_b")
    )


# --- net corpus yield ------------------------------------------------------------


def _net_yield_oracle() -> str:
    from lime_etl_spark.operators.curation import (
        _gram_sql,
        MAX_WORDS,
        MIN_WORDS,
        REP_N,
        REP_TAU,
    )

    return f"""
    WITH RECURSIVE
    pairs AS (
        SELECT doc_a, doc_b FROM ({_minhash_sql()})
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(vid, lab) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.vid
    ),
    comp AS (
        SELECT vid AS doc_id, CAST(MIN(lab) AS BIGINT) AS component_id
        FROM reach GROUP BY vid
    ),
    gated AS (
        SELECT doc_id, n_chars,
               CASE WHEN nw < {MIN_WORDS} THEN 0
                    WHEN nw > {MAX_WORDS} THEN 0
                    WHEN CAST(nd AS DOUBLE) / ng < {REP_TAU} THEN 0
                    ELSE 1 END AS keeps
        FROM (
            SELECT doc_id, n_chars, len(t) AS nw,
                   len({_gram_sql(REP_N)}) AS ng,
                   len(list_distinct({_gram_sql(REP_N)})) AS nd
            FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS t
                  FROM documents)
        )
    ),
    final AS (
        SELECT g.doc_id, g.n_chars, g.keeps,
               (g.doc_id = c.component_id) AS is_rep
        FROM gated g JOIN comp c ON c.doc_id = g.doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_raw,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars_raw,
           CAST(SUM(CASE WHEN keeps = 1 AND is_rep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_net,
           CAST(SUM(CASE WHEN keeps = 1 AND is_rep THEN n_chars ELSE 0 END)
                AS BIGINT) AS n_chars_net,
           CAST(SUM(CASE WHEN keeps = 1 AND is_rep THEN n_chars ELSE 0 END)
                AS DOUBLE) / SUM(n_chars) AS net_char_yield
    FROM final
    """


@register(
    "cur_net_yield",
    oracle=_net_yield_oracle(),
    description="net corpus yield: docs/chars surviving BOTH the quality gate AND near-dup collapse — THE number a data budget is planned against",
)
def cur_net_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone curation number: what fraction of the raw corpus
    actually reaches training after the quality gate (cur_quality_gate
    verdicts) AND near-dup collapse (one representative per CC
    cluster) both apply. Funnel shows each stage alone; this is the
    intersection a data budget is really planned against — and
    because both legs reuse the exact gate/cluster expressions, this
    number cannot drift from the per-stage reports.

    Scale: the gate is row-local; cluster representative flags ride
    the shared CC pipeline; one joined pass reduces to a single
    counter row. Both intersections evaluated per doc — no
    doc-list materialization.
    """
    from lime_etl_spark.functions.text import tokens, word_shingles
    from lime_etl_spark.operators.curation import (
        MAX_WORDS,
        MIN_WORDS,
        REP_N,
        REP_TAU,
    )
    from lime_etl_spark.operators.dedup import (
        JACCARD_TAU,
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )
    from lime_etl_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    pairs = jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh))).where(
        F.col("jaccard") >= JACCARD_TAU
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    cc = connected_components(docs.select(F.col("doc_id").alias("vid")), edges)
    sh.unpersist()

    toks = tokens()
    grams = word_shingles(toks, REP_N)
    nw = F.size(toks)
    ratio = F.size(F.array_distinct(grams)).cast("double") / F.size(grams)
    keeps = (
        F.when(nw < MIN_WORDS, 0)
        .when(nw > MAX_WORDS, 0)
        .when(ratio < REP_TAU, 0)
        .otherwise(1)
    )
    gated = docs.select("doc_id", "n_chars", keeps.alias("keeps"))
    final = gated.join(
        cc.select(
            F.col("vid").alias("doc_id"),
            (F.col("vid") == F.col("label")).alias("is_rep"),
        ),
        "doc_id",
    )
    net = (F.col("keeps") == 1) & F.col("is_rep")
    return final.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_raw"),
        F.sum("n_chars").cast("bigint").alias("n_chars_raw"),
        F.sum(F.when(net, 1).otherwise(0)).cast("bigint").alias("n_docs_net"),
        F.sum(F.when(net, F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("n_chars_net"),
        (
            F.sum(F.when(net, F.col("n_chars")).otherwise(0)).cast("double")
            / F.sum("n_chars")
        ).alias("net_char_yield"),
    )


# --- moving annual total --------------------------------------------------------


@register(
    "q_moving_annual_total",
    oracle="""
    WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS m,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        FROM orders GROUP BY m
    )
    SELECT strftime(m, '%Y-%m') AS month,
           CAST(rev AS DOUBLE) AS month_revenue,
           CAST(CAST(SUM(rev) OVER (ORDER BY m
                RANGE BETWEEN INTERVAL 11 MONTH PRECEDING AND CURRENT ROW)
                AS DECIMAL(38,2)) AS DOUBLE) AS mat_revenue,
           CAST(COUNT(*) OVER (ORDER BY m
                RANGE BETWEEN INTERVAL 11 MONTH PRECEDING AND CURRENT ROW)
                AS BIGINT) AS months_in_window
    FROM monthly
    ORDER BY month
    """,
    description="moving annual total (trailing-12-month revenue): deseasonalized trend via a RANGE frame over the monthly rollup, decimal-exact through the window",
)
def q_moving_annual_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAT — trailing-12-month revenue per month: the standard
    deseasonalized trend line (every month's MAT contains exactly one
    of each season, so seasonality cancels and the slope is the
    business). months_in_window flags the warm-up rows where the
    window is still partial.

    Scale: monthly decimal rollup FIRST; the trailing window is a
    calendar RANGE frame over that |months|-row frame (never fact
    grain), exact decimal through the window sum (re-narrowed
    post-window, the ev_cohort_ltv discipline).
    """
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.sum(dec("o_totalprice", 2, 12)).alias("rev"))
    # RANGE over an exact integer month index (yr·12+mo): '11 months
    # preceding' is unambiguous where a day-based offset is not
    midx = (F.year("m") * 12 + F.month("m")).cast("bigint")
    w = Window.orderBy(midx).rangeBetween(-11, 0)
    return (
        monthly.select(
            F.date_format("m", "yyyy-MM").alias("month"),
            to_double(F.col("rev")).alias("month_revenue"),
            to_double(F.sum("rev").over(w).cast("decimal(38,2)")).alias(
                "mat_revenue"
            ),
            F.count(F.lit(1)).over(w).cast("bigint").alias("months_in_window"),
        )
        .orderBy("month")
    )


# --- engagement decay curve -----------------------------------------------------


@register(
    "ev_engagement_decay",
    oracle="""
    WITH firstw AS (
        SELECT user_id, MIN(date_trunc('week', ts)) AS w0 FROM events GROUP BY user_id
    ), offs AS (
        SELECT CAST(date_diff('day', f.w0, date_trunc('week', e.ts)) / 7 AS BIGINT)
                   AS week_offset,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events e JOIN firstw f USING (user_id)
        GROUP BY week_offset
    ), base AS (
        SELECT n_events AS base_events FROM offs WHERE week_offset = 0
    )
    SELECT o.week_offset, o.n_events,
           CAST(o.n_events AS DOUBLE) / b.base_events AS relative_activity
    FROM offs o CROSS JOIN base b
    ORDER BY o.week_offset
    """,
    description="engagement decay curve: activity by weeks-since-first-touch normalized to week 0 (the half-life read-off; cohort-summed so the curve is one line)",
)
def ev_engagement_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decay curve product teams read half-life off: total
    activity at each week offset since a user's first touch, as a
    share of week-0 activity. Where the retention matrix keeps
    cohorts separate, this sums them into the single headline curve
    — the first offset whose share drops under 0.5 IS the
    engagement half-life.

    Scale: first-week per user is one reduce; the offset rollup is
    calendar-bounded; week 0 is a 1-row broadcast and each share one
    division. Week arithmetic is integer days/7 (DATE math, no
    epoch floats).
    """
    ev = load_table(spark, sf_dir, "events")
    firstw = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("w0")
    )
    offs = (
        ev.join(firstw, "user_id")
        .groupBy(
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("w0")) / 7
            )
            .cast("bigint")
            .alias("week_offset")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    base = offs.where(F.col("week_offset") == 0).select(
        F.col("n_events").alias("base_events")
    )
    return (
        offs.crossJoin(F.broadcast(base))
        .select(
            "week_offset",
            "n_events",
            (F.col("n_events").cast("double") / F.col("base_events")).alias(
                "relative_activity"
            ),
        )
        .orderBy("week_offset")
    )


# --- hash-bucket uniformity ------------------------------------------------------

UNIF_BUCKETS = 64


@register(
    "samp_bucket_uniformity",
    oracle=f"""
    WITH b AS (
        SELECT {_bucket_sql("doc_id", UNIF_BUCKETS)} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY bucket
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets_hit,
           CAST(MIN(n) AS BIGINT) AS min_bucket,
           CAST(MAX(n) AS BIGINT) AS max_bucket,
           CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(MAX(n) AS DOUBLE) * COUNT(*) / SUM(n) AS max_over_mean
    FROM b
    """,
    description=f"md5-bucket uniformity audit ({UNIF_BUCKETS} buckets): the measured assumption underneath EVERY deterministic sampler/splitter in this engine",
)
def samp_bucket_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit that underwrites the whole sampler family: every
    split, stratified draw, fold, epoch shuffle and A/B arm here
    assumes the md5 bucket of an id is uniform. This measures it —
    bucket-size min/max and the max/mean ratio (≈1 means the 80/10/10
    split really is 80/10/10; a skewed allocator-correlated hash
    would silently bias every downstream rate). The pytest bound is
    the ±5σ balls-in-bins envelope.

    Scale: one counter rollup to {UNIF_BUCKETS} rows and a 1-row
    reduce; the audit costs one scan however big the corpus.
    """
    from lime_etl_spark.operators.training import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    b = docs.groupBy(
        hash_bucket(F.col("doc_id"), UNIF_BUCKETS).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets_hit"),
        F.min("n").cast("bigint").alias("min_bucket"),
        F.max("n").cast("bigint").alias("max_bucket"),
        F.sum("n").cast("bigint").alias("n_docs"),
        (
            F.max("n").cast("double") * F.count(F.lit(1)) / F.sum("n")
        ).alias("max_over_mean"),
    )


# --- rank stability (Spearman) --------------------------------------------------


@register(
    "q_rank_stability_nations",
    oracle="""
    WITH ny AS (
        SELECT n.n_name AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS yr,
               SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS rev
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY nation, yr
    ), ranked AS (
        SELECT nation, yr,
               CAST(ROW_NUMBER() OVER (PARTITION BY yr
                    ORDER BY rev DESC, nation) AS BIGINT) AS rnk
        FROM ny
    ), pairs AS (
        SELECT a.yr AS yr_from, a.rnk AS x, b.rnk AS y
        FROM ranked a
        JOIN ranked b ON b.nation = a.nation AND b.yr = a.yr + 1
    ), sums AS (
        SELECT yr_from, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM((x - y) * (x - y)) AS BIGINT) AS d2
        FROM pairs GROUP BY yr_from
    )
    SELECT CAST(yr_from AS BIGINT) AS yr_from, n AS n_nations,
           1.0 - (6.0 * d2) / (CAST(n AS DOUBLE) * (n * n - 1)) AS spearman_rho
    FROM sums
    WHERE n >= 2
    ORDER BY yr_from
    """,
    description="league-table stability: Spearman rho of nation revenue ranks between consecutive years — EXACT via the Σd² identity over integer ranks",
)
def q_rank_stability_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How stable the nation revenue league table is year over year:
    Spearman's rho between consecutive years' rankings by the exact
    identity ρ = 1 − 6Σd²/(n(n²−1)) — ranks are exact integers with
    name tie-breaks, so Σd² is exact int64 and the score is one
    fixed double chain (the third reuse of the exact-rank-statistics
    discipline after Gini and the integer Pearsons). ρ≈1 = stable
    market; a drop flags a structural shift worth a drill-down.

    Scale: facts reduce to the |nations|×|years| rollup (dims
    broadcast); per-year ranks window over that tiny frame; the
    year+1 self-join and sums are rollup-grain.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    ny = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(F.sum(dec("o_totalprice", 2, 12)).alias("rev"))
    )
    w = Window.partitionBy("yr").orderBy(F.desc("rev"), "nation")
    ranked = ny.select(
        "nation", "yr", F.row_number().over(w).cast("bigint").alias("rnk")
    ).persist()
    a, b = ranked.alias("a"), ranked.alias("b")
    pairs = a.join(
        b,
        (F.col("b.nation") == F.col("a.nation"))
        & (F.col("b.yr") == F.col("a.yr") + 1),
    ).select(
        F.col("a.yr").alias("yr_from"),
        F.col("a.rnk").alias("x"),
        F.col("b.rnk").alias("y"),
    )
    d = F.col("x") - F.col("y")
    s = pairs.groupBy("yr_from").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d * d).cast("bigint").alias("d2"),
    )
    return (
        s.where(F.col("n") >= 2)
        .select(
            F.col("yr_from").cast("bigint").alias("yr_from"),
            F.col("n").alias("n_nations"),
            (
                1.0
                - (6.0 * F.col("d2"))
                / (F.col("n").cast("double") * (F.col("n") * F.col("n") - 1))
            ).alias("spearman_rho"),
        )
        .orderBy("yr_from")
    )


# --- weekend lift ---------------------------------------------------------------


@register(
    "ev_weekend_lift",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               strftime(ts, '%a') IN ('Sat', 'Sun') AS is_weekend,
               SUM(CAST(value AS DECIMAL(12,2))) AS rev
        FROM events WHERE event_type = 'purchase'
        GROUP BY d, is_weekend
    )
    SELECT is_weekend,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(rev) AS DOUBLE) AS revenue,
           CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS revenue_per_day
    FROM daily
    GROUP BY is_weekend
    ORDER BY is_weekend
    """,
    description="weekend vs weekday revenue-per-day split (staffing/budget pacing input; day counts denominate, not raw sums)",
)
def ev_weekend_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend effect measured correctly: revenue PER DAY for weekend
    vs weekday days — raw weekend totals always lose (2 days vs 5),
    so the per-day rate is the comparable number that paces weekend
    staffing and ad budgets. Weekday classification by NAME (the
    cross-engine-safe convention from ev_weekday_hour_profile).

    Scale: daily decimal rollup first, 2-row output, one division
    per row over exact aggregates.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    daily = ev.groupBy(
        F.to_date("ts").alias("d"),
        F.date_format("ts", "E").isin("Sat", "Sun").alias("is_weekend"),
    ).agg(F.sum(dec("value", 2, 12)).alias("rev"))
    return (
        daily.groupBy("is_weekend")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            to_double(F.sum("rev")).alias("revenue"),
        )
        .select(
            "is_weekend",
            "n_days",
            "revenue",
            (F.col("revenue") / F.col("n_days")).alias("revenue_per_day"),
        )
        .orderBy("is_weekend")
    )


# --- suspect duplicate orders ---------------------------------------------------


@register(
    "dq_suspect_duplicate_orders",
    oracle="""
    WITH grp AS (
        SELECT o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) AS tp, o_orderdate,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MIN(o_orderkey) AS BIGINT) AS first_orderkey
        FROM orders
        GROUP BY o_custkey, tp, o_orderdate
        HAVING COUNT(*) > 1
    )
    SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(tp AS DOUBLE) AS totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           n_orders, first_orderkey
    FROM grp
    ORDER BY o_custkey, totalprice, orderdate
    """,
    description="business-rule duplicate detector: same customer+amount+day orders (double-submit/replay with FRESH keys — what full-row dedup can't see)",
)
def dq_suspect_duplicate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The finance-control dup check: orders sharing (customer,
    amount, day) but with DIFFERENT order keys — double-submits and
    replayed batches that minted fresh surrogates, which
    dq_duplicate_rows (full-row) and dq_candidate_keys (declared PK)
    are both structurally blind to. Output is the review queue,
    ordered deterministically.

    Scale: one counters-only groupBy on the natural business key
    (map-side combine; HAVING>1 kills the tail in the partial);
    decimal-exact amount equality (float equality would
    false-negative on representation noise).
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            "o_custkey",
            dec("o_totalprice", 2, 12).alias("tp"),
            "o_orderdate",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.min("o_orderkey").cast("bigint").alias("first_orderkey"),
        )
        .where(F.col("n_orders") > 1)
        .select(
            F.col("o_custkey").cast("bigint").alias("o_custkey"),
            to_double(F.col("tp")).alias("totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "n_orders",
            "first_orderkey",
        )
        .orderBy("o_custkey", "totalprice", "orderdate")
    )


# --- per-user action diversity --------------------------------------------------


@register(
    "ev_action_diversity",
    oracle="""
    WITH cnt AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY user_id, event_type
    ), per_user AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(SUM(n * (n - 1)) AS BIGINT) AS pair_hits
        FROM cnt GROUP BY user_id
    )
    SELECT n_types,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN n_events > 1
                          AND pair_hits * 10 >= 8 * n_events * (n_events - 1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_monotone_users
    FROM per_user
    GROUP BY n_types
    ORDER BY n_types
    """,
    description="behavioral diversity profile: action-type breadth per user + Simpson-concentration ≥0.8 'monotone' users (bot/scraper signature) via integer cross-multiply",
)
def ev_action_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral breadth: users bucketed by how many action types
    they touch, with the count of 'monotone' users — Simpson
    concentration Σn(n−1)/N(N−1) ≥ 0.8, i.e. four-in-five random
    action pairs are the SAME action: the scraper/bot signature
    (view-view-view…) that volume caps alone miss.

    Scale: (user, type) counter rollup with map-side combine; the
    Simpson threshold is an integer cross-multiply (pair_hits·10 ≥
    8·N(N−1)) — no division, exact on both engines (the
    txt_simpson_diversity discipline at user grain); output bounded
    by |types| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    per_user = cnt.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum("n").cast("bigint").alias("n_events"),
        F.sum(F.col("n") * (F.col("n") - 1)).cast("bigint").alias("pair_hits"),
    )
    monotone = (F.col("n_events") > 1) & (
        F.col("pair_hits") * 10 >= 8 * F.col("n_events") * (F.col("n_events") - 1)
    )
    return (
        per_user.groupBy("n_types")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum(F.when(monotone, 1).otherwise(0))
            .cast("bigint")
            .alias("n_monotone_users"),
        )
        .orderBy("n_types")
    )


# --- id/time monotonicity audit -------------------------------------------------


@register(
    "dq_id_time_monotonicity",
    oracle="""
    WITH ordered AS (
        SELECT event_id, epoch_us(ts) AS ts_us,
               LAG(epoch_us(ts)) OVER (ORDER BY event_id) AS prev_us
        FROM events
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN prev_us IS NOT NULL AND ts_us < prev_us
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_inversions,
           CAST(MAX(CASE WHEN prev_us IS NOT NULL AND ts_us < prev_us
                         THEN prev_us - ts_us ELSE 0 END) AS BIGINT)
               AS max_inversion_us
    FROM ordered
    """,
    description="allocator-order audit: timestamp inversions along the event_id sequence (can an id range stand in for a time range?)",
)
def dq_id_time_monotonicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whether the id allocator agrees with event time: inversions
    (a later id carrying an earlier timestamp) along the id
    sequence, plus the worst inversion in µs. Zero inversions means
    id ranges can stand in for time ranges (cheap incremental
    loads keyed on id); a large max inversion bounds the overlap
    re-read window an id-keyed incremental load must add.

    Scale: the lag along the id order decomposes into id-RANGE shards
    (arithmetic from the broadcast min/max id — shard order refines id
    order) — the lag window runs WITHIN each shard in parallel, and
    the only cross-shard pairs are the ≤N_SHARDS boundary adjacencies,
    stitched from each shard's (first, last) rows over the tiny shard
    roster. Exactly the adjacent-pair set of the global sort, with no
    task ever holding more than one shard; counters-only output.
    """
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    rows = ev.select(F.col("event_id").cast("bigint").alias("eid"), us.alias("ts_us"))
    n_shards = 256
    bounds = rows.agg(
        F.min("eid").alias("lo"), (F.max("eid") - F.min("eid") + 1).alias("span")
    )
    sharded = rows.join(F.broadcast(bounds)).withColumn(
        "shard", ((F.col("eid") - F.col("lo")) * n_shards / F.col("span")).cast("bigint")
    )
    w_in = Window.partitionBy("shard").orderBy("eid")
    within = sharded.select(
        "shard",
        "eid",
        "ts_us",
        F.lag("ts_us").over(w_in).alias("prev_us"),
    )
    inv = F.col("prev_us").isNotNull() & (F.col("ts_us") < F.col("prev_us"))
    per_shard = within.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(inv, 1).otherwise(0)).alias("inv_n"),
        F.max(F.when(inv, F.col("prev_us") - F.col("ts_us")).otherwise(0)).alias(
            "inv_max"
        ),
        F.min_by("ts_us", "eid").alias("first_us"),
        F.max_by("ts_us", "eid").alias("last_us"),
    )
    # boundary stitch: the lag of each shard's first row is the
    # previous NON-EMPTY shard's last row — a window over the
    # ≤n_shards-row roster (bounded by construction).
    w_b = Window.orderBy("shard")
    stitched = per_shard.withColumn("prev_last", F.lag("last_us").over(w_b))
    b_inv = F.col("prev_last").isNotNull() & (F.col("first_us") < F.col("prev_last"))
    return stitched.agg(
        F.sum("n").cast("bigint").alias("n_events"),
        (F.sum("inv_n") + F.sum(F.when(b_inv, 1).otherwise(0)))
        .cast("bigint")
        .alias("n_inversions"),
        F.greatest(
            F.max("inv_max"),
            F.max(F.when(b_inv, F.col("prev_last") - F.col("first_us")).otherwise(0)),
        )
        .cast("bigint")
        .alias("max_inversion_us"),
    )


# --- length × quality grid ------------------------------------------------------


@register(
    "cur_length_quality_grid",
    oracle="""
    WITH feats AS (
        SELECT doc_id,
               length(text) AS n_chars_calc,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) AS distinct_ratio
        FROM documents
    ), deciled AS (
        SELECT NTILE(10) OVER (ORDER BY n_chars_calc, doc_id) AS len_decile,
               NTILE(10) OVER (ORDER BY distinct_ratio, doc_id) AS qual_decile
        FROM feats
    )
    SELECT len_decile, qual_decile, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM deciled
    GROUP BY len_decile, qual_decile
    ORDER BY len_decile, qual_decile
    """,
    description="curation 2D heat grid: length-decile × quality-decile doc counts (where the filter thresholds should bend, not a 1D cut)",
)
def cur_length_quality_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The joint view 1-D curation cuts miss: docs bucketed into
    length deciles × lexical-diversity deciles. Mass concentrated in
    (long, low-diversity) is template spam a pure length floor would
    KEEP; (short, high-diversity) is dense content a length floor
    would DROP — the grid says where thresholds should bend.

    Scale: row-local features (same expressions as
    txt_quality_score, so 'quality' agrees), two exact ntiles over
    the doc-grain rollup via the sharded-rank decomposition
    (functions/ranks.py — no single-task sorts), ≤100-cell output.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    feats = docs.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("distinct_ratio"),
    )
    deciled = with_global_ntiles(
        feats,
        [
            (
                F.col("n_chars_calc"),
                [F.col("n_chars_calc"), F.col("doc_id")],
                10,
                "len_decile",
            ),
            (
                F.col("distinct_ratio"),
                [F.col("distinct_ratio"), F.col("doc_id")],
                10,
                "qual_decile",
            ),
        ],
    ).select("len_decile", "qual_decile")
    return (
        deciled.groupBy("len_decile", "qual_decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("len_decile", "qual_decile")
    )


# --- first-week value predictability --------------------------------------------


@register(
    "ev_w1_value_predictability",
    oracle="""
    WITH firstd AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ), per_user AS (
        SELECT e.user_id,
               CAST(SUM(CASE WHEN CAST(e.ts AS DATE) < f.d0 + INTERVAL 7 DAY
                             THEN CAST(e.value AS DECIMAL(12,2)) END) * 100
                    AS BIGINT) AS w1_cents,
               CAST(SUM(CASE WHEN CAST(e.ts AS DATE) >= f.d0 + INTERVAL 7 DAY
                             THEN CAST(e.value AS DECIMAL(12,2)) END) * 100
                    AS BIGINT) AS later_cents
        FROM events e JOIN firstd f USING (user_id)
        WHERE e.event_type = 'purchase'
        GROUP BY e.user_id
    ), xy AS (
        SELECT COALESCE(w1_cents, 0) AS x, COALESCE(later_cents, 0) AS y
        FROM per_user
    ), sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM xy
    )
    SELECT n AS n_users,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE))
                ELSE 0.0 END AS w1_later_correlation
    FROM sums
    """,
    description="does week-1 spend predict the rest? Pearson r from EXACT integer-cents sums (the LTV-predictability scalar behind early-scoring models)",
)
def ev_w1_value_predictability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The number that justifies (or kills) early-LTV scoring: the
    correlation between a user's first-7-days spend and everything
    after. High r → week-1 bids/budgets can be trusted; low r → wait
    for more signal. Same exact-integer Pearson discipline as
    graph_assortativity: every Σ term is int64 cents, one guarded
    sqrt+division.

    Scale: first-day via per-user reduce, spends as TWO conditional
    decimal sums in one pass over purchases (no second scan), the
    correlation from a 1-row sum state.
    """
    ev = load_table(spark, sf_dir, "events")
    firstd = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    p = ev.where(F.col("event_type") == "purchase").join(firstd, "user_id")
    in_w1 = F.to_date("ts") < F.date_add("d0", 7)
    per_user = p.groupBy("user_id").agg(
        (F.sum(F.when(in_w1, dec("value", 2, 12))) * 100)
        .cast("bigint")
        .alias("w1_cents"),
        (F.sum(F.when(~in_w1, dec("value", 2, 12))) * 100)
        .cast("bigint")
        .alias("later_cents"),
    )
    xy = per_user.select(
        F.coalesce("w1_cents", F.lit(0)).alias("x"),
        F.coalesce("later_cents", F.lit(0)).alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        F.col("n").alias("n_users"),
        F.when(
            (vx > 0) & (vy > 0),
            cov.cast("double") / F.sqrt(vx.cast("double") * vy.cast("double")),
        )
        .otherwise(0.0)
        .alias("w1_later_correlation"),
    )


# --- Gini coefficient -----------------------------------------------------------


@register(
    "q_gini_revenue",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT cents,
               CAST(ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS i
        FROM cust
    ), sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS sx,
               CAST(SUM(i * cents) AS BIGINT) AS six
        FROM ranked
    )
    SELECT n AS n_customers,
           (2.0 * six) / (CAST(n AS DOUBLE) * sx)
             - (CAST(n + 1 AS DOUBLE) / n) AS gini
    FROM sums
    """,
    description="Gini coefficient of customer revenue (THE inequality scalar beside HHI/deciles): exact rank formula over integer cents, fixed double chain",
)
def q_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gini coefficient of customer revenue — 0 is perfect
    equality, →1 is one whale — by the exact rank identity
    G = 2Σ(i·xᵢ)/(nΣx) − (n+1)/n over ascending-sorted values.
    Completes the concentration family: deciles draw the curve, HHI
    squares the shares, Gini integrates the Lorenz gap.

    Determinism: revenue moves as integer cents, ranks are exact
    ints with a custkey tie-break, so Σi·xᵢ and Σx are exact int64
    (i·x ≈ 1e5·1e9 = 1e14 per term; the sum's envelope is the
    documented decimal38 upgrade at extreme scale); the final Gini
    is one fixed double chain. Scale: per-customer reduce first, then
    the exact global rank comes from the sharded-rank decomposition
    (functions/ranks.py — quantile buckets, partition-local
    row_number, broadcast offsets; no single-task sort), 1-row output.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        (F.sum(dec("o_totalprice", 2, 12)) * 100).cast("bigint").alias("cents")
    )
    ranked = with_global_row_number(
        cust, F.col("cents"), [F.col("cents"), F.col("o_custkey")], out="i"
    ).select("cents", "i")
    s = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sx"),
        F.sum(F.col("i") * F.col("cents")).cast("bigint").alias("six"),
    )
    return s.select(
        F.col("n").alias("n_customers"),
        (
            (2.0 * F.col("six")) / (F.col("n").cast("double") * F.col("sx"))
            - ((F.col("n") + 1).cast("double") / F.col("n"))
        ).alias("gini"),
    )


# --- dimension churn rate -------------------------------------------------------


@register(
    "etl_dim_churn_rate",
    oracle="""
    WITH changes AS (
        SELECT user_id,
               strftime(date_trunc('month', ts), '%Y-%m') AS mo
        FROM events WHERE event_type = 'purchase'
    )
    SELECT mo,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys_changed,
           CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT user_id)
               AS versions_per_key
    FROM changes
    GROUP BY mo
    ORDER BY mo
    """,
    description="dimension churn rate: SCD version volume per month (the storage/compaction forecast for every SCD2 history this engine maintains)",
)
def etl_dim_churn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How fast the dimension churns: change events (the SCD2 input
    stream) per month and per key — the number that sizes SCD2
    history growth, decides snapshot-vs-history modeling per
    attribute, and schedules ledger compaction. A dimension at 30
    versions/key/month should carry that attribute in a fact, not
    SCD2.

    Scale: calendar-bounded counter rollup with a distinct-key count
    (map-side combinable + Expand for the distinct; approx at
    extreme cardinality); |months|-row output.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    return (
        ev.groupBy(F.date_format(F.date_trunc("month", "ts"), "yyyy-MM").alias("mo"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_versions"),
            F.count_distinct("user_id").cast("bigint").alias("n_keys_changed"),
        )
        .select(
            "mo",
            "n_versions",
            "n_keys_changed",
            (F.col("n_versions").cast("double") / F.col("n_keys_changed")).alias(
                "versions_per_key"
            ),
        )
        .orderBy("mo")
    )


# --- dedup method agreement -----------------------------------------------------


def _method_agreement_oracle() -> str:
    from lime_etl_spark.operators.dedup import (
        _EXCERPT_SHINGLES_SQL,
        CONTAINMENT_TAU,
        JACCARD_TAU,
    )

    return f"""
    WITH sh AS ({_EXCERPT_SHINGLES_SQL}),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.x = b.x AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    scored AS (
        SELECT CAST(i.n_inter AS DOUBLE)
                 / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) >= {JACCARD_TAU}
                   AS j_hit,
               CAST(i.n_inter AS DOUBLE)
                 / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE) >= {CONTAINMENT_TAU}
                   AS c_hit
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
           CAST(SUM(CASE WHEN j_hit AND c_hit THEN 1 ELSE 0 END) AS BIGINT)
               AS n_both,
           CAST(SUM(CASE WHEN c_hit AND NOT j_hit THEN 1 ELSE 0 END) AS BIGINT)
               AS n_containment_only,
           CAST(SUM(CASE WHEN j_hit AND NOT c_hit THEN 1 ELSE 0 END) AS BIGINT)
               AS n_jaccard_only
    FROM scored
    """


@register(
    "dedup_method_agreement",
    oracle=_method_agreement_oracle(),
    description="detector-agreement audit on the excerpt corpus: Jaccard vs containment 2×2 — jaccard_only provably 0 (C ≥ J), containment_only = the excerpt mass resemblance misses",
)
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ensemble audit for the dedup stack: over one candidate
    pipeline, how the resemblance (Jaccard ≥ τ_J) and containment
    (C ≥ τ_C) verdicts overlap. Since C(A,B) ≥ J(A,B) for every pair
    and τ_C ≥ τ_J here, 'jaccard-only' is MATHEMATICALLY empty
    (pytest pins it at 0 — a broken shingle pipeline would violate
    it), and 'containment-only' measures exactly the excerpt mass a
    Jaccard-only dedup ships to training twice.

    Scale: ONE shared-shingle candidate pipeline scores both metrics
    from the same (intersection, sizes) aggregates — the agreement
    table costs one extra CASE, not a second pipeline; output is a
    single counter row.
    """
    from lime_etl_spark.operators.dedup import (
        CONTAINMENT_TAU,
        JACCARD_TAU,
        _excerpt_corpus,
        doc_shingles,
        jaccard_pairs,
    )

    corpus = _excerpt_corpus(spark, sf_dir)
    sh = doc_shingles(corpus).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.x") == F.col("b.x"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    scored = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select(
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
                >= JACCARD_TAU
            ).alias("j_hit"),
            (
                F.col("n_inter").cast("double")
                / F.least("n_a", "n_b").cast("double")
                >= CONTAINMENT_TAU
            ).alias("c_hit"),
        )
    )
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidate_pairs"),
        flag(F.col("j_hit") & F.col("c_hit")).alias("n_both"),
        flag(F.col("c_hit") & ~F.col("j_hit")).alias("n_containment_only"),
        flag(F.col("j_hit") & ~F.col("c_hit")).alias("n_jaccard_only"),
    )


# --- repeat rate by segment -----------------------------------------------------


@register(
    "q_repeat_rate_by_segment",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_custkey
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_buyers,
           CAST(SUM(CASE WHEN p.n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repeat_buyers,
           CAST(SUM(CASE WHEN p.n_orders >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS repeat_rate
    FROM per_cust p JOIN customer c ON c.c_custkey = p.o_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    description="repeat-purchase rate per market segment (the retention KPI sliced by the acquisition dimension)",
)
def q_repeat_rate_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of buyers with a second order, per market segment — the
    simplest retention KPI on the dimension acquisition teams buy
    against, so segment-level repeat rates directly price segment
    acquisition.

    Scale: orders reduce to per-customer counts FIRST; the segment
    attribution joins the customer dim broadcast onto that rollup;
    output is |segments| rows, one IEEE division each.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    repeat = F.when(F.col("n_orders") >= 2, 1).otherwise(0)
    return (
        per_cust.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            per_cust.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buyers"),
            F.sum(repeat).cast("bigint").alias("n_repeat_buyers"),
        )
        .select(
            "c_mktsegment",
            "n_buyers",
            "n_repeat_buyers",
            (F.col("n_repeat_buyers").cast("double") / F.col("n_buyers")).alias(
                "repeat_rate"
            ),
        )
        .orderBy("c_mktsegment")
    )


# --- numeric range profile ------------------------------------------------------

_RANGE_COLUMNS: dict[str, tuple[str, ...]] = {
    "lineitem": ("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    "orders": ("o_totalprice",),
    "customer": ("c_acctbal",),
    "part": ("p_retailprice", "p_size"),
    "events": ("value",),
}


def _range_profile_oracle() -> str:
    legs = []
    for tbl, cols in _RANGE_COLUMNS.items():
        for c in cols:
            legs.append(
                f"SELECT '{tbl}' AS tbl, '{c}' AS col,"
                f" CAST(MIN({c}) AS DOUBLE) AS min_v,"
                f" CAST(MAX({c}) AS DOUBLE) AS max_v,"
                f" CAST(SUM(CASE WHEN {c} < 0 THEN 1 ELSE 0 END) AS BIGINT)"
                f" AS n_negative"
                f" FROM {tbl}"
            )
    union = "\n    UNION ALL ".join(legs)
    return f"SELECT * FROM ({union}) ORDER BY tbl, col"


@register(
    "dq_range_profile",
    oracle=_range_profile_oracle(),
    description="numeric min/max/negative-count profile per column (the third profiling axis beside nulls and cardinality; feeds range-constraint generation)",
)
def dq_range_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed numeric ranges per column — the profiling axis that
    complements dq_null_profile (completeness) and
    dq_cardinality_profile (distinctness): these measured bounds are
    what range CONSTRAINTS (dq_cross_field) should be generated
    from, instead of hand-guessing domains, and a new load whose min
    or max escapes yesterday's envelope is the cheapest drift alarm.

    Scale: min/max/conditional-count are classic map-side-combining
    counters — one scan per table, Σ|cols| output rows; these are
    exactly the statistics parquet footers hold, so at 100 TB the
    same report can come from metadata alone (dq_freshness's trick).
    """
    out = None
    for tbl, cols in _RANGE_COLUMNS.items():
        df = load_table(spark, sf_dir, tbl)
        for c in cols:
            st = df.agg(
                F.min(c).cast("double").alias("min_v"),
                F.max(c).cast("double").alias("max_v"),
                F.sum(F.when(F.col(c) < 0, 1).otherwise(0))
                .cast("bigint")
                .alias("n_negative"),
            ).select(
                F.lit(tbl).alias("tbl"),
                F.lit(c).alias("col"),
                "min_v",
                "max_v",
                "n_negative",
            )
            out = st if out is None else out.unionByName(st)
    return out.orderBy("tbl", "col")


# --- monthly seasonal index -----------------------------------------------------


@register(
    "q_seasonal_index",
    oracle="""
    WITH monthly AS (
        SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
               EXTRACT(MONTH FROM o_orderdate) AS mo,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        FROM orders GROUP BY yr, mo
    ), yearly AS (
        SELECT yr,
               CAST(SUM(rev) AS DECIMAL(38,2)) AS yr_rev,
               CAST(COUNT(*) AS BIGINT) AS n_months
        FROM monthly GROUP BY yr
    )
    SELECT CAST(m.yr AS BIGINT) AS yr, CAST(m.mo AS BIGINT) AS mo,
           CAST(m.rev AS DOUBLE) AS month_revenue,
           CAST(m.rev AS DOUBLE) * y.n_months / CAST(y.yr_rev AS DOUBLE)
               AS seasonal_index
    FROM monthly m JOIN yearly y ON y.yr = m.yr
    ORDER BY yr, mo
    """,
    description="monthly seasonal index (month revenue vs the year's monthly mean; index>1 = peak month) — calendar-bounded rollups, one double chain",
)
def q_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retail seasonality table: each month's revenue relative to
    its year's monthly average (index 1.2 = a 20%-over-trend month).
    Inventory pre-builds and the seasonal-naive forecast
    (ev_forecast_seasonal_naive) both key off exactly this index.

    Scale: the fact reduces to the |years×12| monthly rollup; yearly
    totals join back broadcast; the index is one fixed double chain
    (rev·n_months/yr_rev — multiply before divide, identical order
    both engines) so no decimal division happens.
    """
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(F.sum(dec("o_totalprice", 2, 12)).alias("rev"))
    yearly = monthly.groupBy("yr").agg(
        F.sum("rev").cast("decimal(38,2)").alias("yr_rev"),
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
    )
    return (
        monthly.join(F.broadcast(yearly), "yr")
        .select(
            F.col("yr").cast("bigint").alias("yr"),
            F.col("mo").cast("bigint").alias("mo"),
            to_double(F.col("rev")).alias("month_revenue"),
            (
                to_double(F.col("rev")) * F.col("n_months")
                / to_double(F.col("yr_rev"))
            ).alias("seasonal_index"),
        )
        .orderBy("yr", "mo")
    )


# --- per-user contribution cap ---------------------------------------------------

USER_EVENT_CAP = 50


@register(
    "samp_cap_per_user",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id, event_id,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY {_bucket_sql("event_id", 1000000)}, event_id
               ) AS rn
        FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN rn <= {USER_EVENT_CAP} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(SUM(CASE WHEN rn <= {USER_EVENT_CAP} THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS keep_rate
    FROM ranked
    GROUP BY user_id
    ORDER BY user_id
    """,
    description=f"per-user contribution cap (≤{USER_EVENT_CAP} events, md5-order draw): whale/bot users can't dominate a training mixture; WindowGroupLimit-bounded",
)
def samp_cap_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution capping — the per-ENTITY quota every training
    mixture needs (a whale user or bot would otherwise BE the
    behavioral dataset): keep at most N events per user, drawn in
    md5-hash order so the kept subset is a stable pseudo-random
    sample (never head-of-time bias, rerun-identical). Reported at
    the per-user audit grain; the kept rows themselves are the
    rn ≤ cap filter of the same window.

    Scale: one user-keyed window whose rn≤cap filter Spark lowers to
    WindowGroupLimit — per-key state is the cap, not the whale's
    event count, so the shuffle carries O(cap·users) rows of
    ordering state; the audit rollup rides the same user hash.
    """
    from lime_etl_spark.operators.training import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        hash_bucket(F.col("event_id"), 1_000_000), "event_id"
    )
    ranked = ev.select("user_id", "event_id").withColumn(
        "rn", F.row_number().over(w)
    )
    kept = F.when(F.col("rn") <= USER_EVENT_CAP, 1).otherwise(0)
    return (
        ranked.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(kept).cast("bigint").alias("n_kept"),
        )
        .select(
            "user_id",
            "n_events",
            "n_kept",
            (F.col("n_kept").cast("double") / F.col("n_events")).alias("keep_rate"),
        )
        .orderBy("user_id")
    )


# --- telemetry protocol violations ----------------------------------------------


@register(
    "dq_protocol_violations",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view_us
        FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_purchasing_users,
           CAST(SUM(CASE WHEN f.first_view_us IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_purchases_no_view_ever,
           CAST(SUM(CASE WHEN f.first_view_us IS NOT NULL
                          AND epoch_us(e.ts) < f.first_view_us
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_purchases_before_first_view,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM events e
    JOIN firsts f ON f.user_id = e.user_id
    WHERE e.event_type = 'purchase'
    """,
    description="telemetry ordering audit: purchases with no prior view (client-clock skew / lost events / bot traffic) — one user shuffle, counters-only",
)
def dq_protocol_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The event-PROTOCOL audit: a purchase should follow a view —
    purchases from users who never viewed, or timestamped before the
    user's first view, mean client-clock skew, dropped events, or
    bot traffic. ev_funnel measures the conversion rate among the
    well-behaved; this counts the ill-behaved, which is the
    instrumentation-quality number.

    Scale: first-view time is one conditional MIN per user (rides
    the same user rollup family as ev_purchase_latency); the probe
    is an equi-join of purchases onto that rollup; output is one row
    of int64 counters, all map-side combinable.
    """
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_micros("ts"))
        ).alias("first_view_us")
    )
    purchases = ev.where(F.col("event_type") == "purchase")
    j = purchases.join(firsts, "user_id")
    return j.agg(
        F.count_distinct("user_id").cast("bigint").alias("n_purchasing_users"),
        F.sum(F.when(F.col("first_view_us").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_purchases_no_view_ever"),
        F.sum(
            F.when(
                F.col("first_view_us").isNotNull()
                & (F.unix_micros("ts") < F.col("first_view_us")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_purchases_before_first_view"),
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
    )


# --- word burstiness ------------------------------------------------------------

BURST_TOP_K = 40


@register(
    "txt_word_burstiness",
    oracle=f"""
    WITH dw AS (
        SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
            FROM documents
        )
        WHERE word <> ''
        GROUP BY doc_id, word
    ), nd AS (
        SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM dw
    ), per_word AS (
        SELECT word,
               CAST(SUM(n) AS BIGINT) AS s1,
               CAST(SUM(n * n) AS BIGINT) AS s2,
               CAST(COUNT(*) AS BIGINT) AS df
        FROM dw GROUP BY word
    )
    SELECT word, s1 AS total_count, df AS doc_frequency,
           (CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE))
             - (CAST(s1 AS DOUBLE) / t.n_docs) AS burstiness
    FROM per_word CROSS JOIN nd t
    ORDER BY s1 DESC, word
    LIMIT {BURST_TOP_K}
    """,
    description="word burstiness (VMR−... Church-Gale style: mean repeat count minus expected) for the corpus head — topical words bursty, function words flat",
)
def txt_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness for the corpus head: E[n | word occurs]·adjusted —
    computed as Σn²/Σn − Σn/N (mean occurrences per occurrence minus
    the global rate). Function words spread evenly (low), topical/
    template words clump into few documents (high) — the signal
    separating 'frequent because everywhere' from 'frequent because
    duplicated', which ranks stopword candidates vs boilerplate
    candidates from the same frequency table.

    Scale: one (doc, word) counter rollup (map-side combine), one
    per-word reduce of exact int64 Σn/Σn² (zeros contribute nothing
    — the identity needs only occurring docs), a 1-row doc-count
    broadcast; the score is a fixed chain of double ops identical on
    both engines. Top-k orders by exact counts.
    """
    docs = load_table(spark, sf_dir, "documents")
    dw = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("word"),
        )
        .where(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .persist()
    )
    nd = dw.agg(F.count_distinct("doc_id").cast("bigint").alias("n_docs"))
    per_word = dw.groupBy("word").agg(
        F.sum("n").cast("bigint").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("s2"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
    )
    return (
        per_word.crossJoin(F.broadcast(nd))
        .select(
            "word",
            F.col("s1").alias("total_count"),
            F.col("df").alias("doc_frequency"),
            (
                (F.col("s2").cast("double") / F.col("s1").cast("double"))
                - (F.col("s1").cast("double") / F.col("n_docs"))
            ).alias("burstiness"),
        )
        .orderBy(F.desc("total_count"), "word")
        .limit(BURST_TOP_K)
    )


# --- A/B assignment + A/A audit -------------------------------------------------


def _ab_oracle() -> str:
    return f"""
    WITH users AS (
        SELECT user_id,
               CASE WHEN {_bucket_sql("user_id", 2)} = 0
                    THEN 'control' ELSE 'treatment' END AS arm,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchases
        FROM events
        GROUP BY user_id, arm
    )
    SELECT arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(n_purchases) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN n_purchases > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS converter_rate
    FROM users
    GROUP BY arm
    ORDER BY arm
    """


@register(
    "ev_ab_assignment_aa",
    oracle=_ab_oracle(),
    description="experimentation primitive: deterministic md5 50/50 user bucketing + A/A validity audit (SRM + metric balance, no randomness)",
)
def ev_ab_assignment_aa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assignment half of an experimentation platform: users
    hash-bucketed 50/50 into arms DETERMINISTICALLY (md5 of the unit
    id — rerun-stable, no seed coordination, same family as every
    sampler here), reported as an A/A audit: with no treatment
    applied, arm sizes must pass the sample-ratio-mismatch bound and
    converter rates must agree — the validity check every experiment
    platform runs before trusting its bucketing. Both gates are
    pytest-asserted.

    Scale: assignment is a row-local hash (no state, no assignment
    table to join — the unit id IS the assignment); the audit is a
    per-user reduce then a 2-row arm rollup.
    """
    from lime_etl_spark.operators.training import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    arm = F.when(hash_bucket(F.col("user_id"), 2) == 0, "control").otherwise(
        "treatment"
    )
    users = ev.groupBy("user_id", arm.alias("arm")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n_purchases"),
    )
    return (
        users.groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("n_purchases").cast("bigint").alias("n_purchases"),
            (
                F.sum(F.when(F.col("n_purchases") > 0, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("converter_rate"),
        )
        .orderBy("arm")
    )


# --- weighted median ------------------------------------------------------------


@register(
    "q_weighted_median_price",
    oracle="""
    WITH pp AS (
        -- reduce to (brand, unit-price-cents) with total quantity;
        -- unit price via pure INTEGER floor-division (decimal
        -- division rounds at engine-specific result scales)
        SELECT p.p_brand,
               (CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) * 100)
                 // CAST(CAST(l.l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS price_cents,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) * 100 AS BIGINT)
                   AS qty_cents
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand, price_cents
    ), tot AS (
        SELECT p_brand, CAST(SUM(qty_cents) AS BIGINT) AS total_qty
        FROM pp GROUP BY p_brand
    ), cum AS (
        SELECT pp.p_brand, pp.price_cents,
               CAST(SUM(pp.qty_cents) OVER (PARTITION BY pp.p_brand
                    ORDER BY pp.price_cents
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_qty,
               t.total_qty
        FROM pp JOIN tot t ON t.p_brand = pp.p_brand
    )
    SELECT p_brand,
           CAST(MIN(price_cents) AS DOUBLE) / 100 AS weighted_median_price,
           CAST(MAX(total_qty) AS BIGINT) AS total_qty_cents
    FROM cum
    WHERE 2 * cum_qty >= total_qty
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    description="quantity-weighted median unit price per brand: cumulative-weight window with integer cross-multiplied threshold (the weighted-quantile primitive)",
)
def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median — the quantile primitive percentile() lacks: the
    unit price below which half the QUANTITY (not half the rows)
    trades, per brand. Unweighted medians over line items overweight
    small orders; volume-weighted is what pricing actually reads.

    Scale: the fact reduces to (brand, price) weight cells FIRST
    (everything after is cell-grain); the per-brand cumulative-weight
    window decomposes by PRICE-RANGE shard (shard = price div 2^14 —
    shard order refines price order): running sums WITHIN each
    (brand, shard) in parallel, plus broadcast per-(brand, shard)
    offsets from the bounded shard roster — the samp_domain_budget
    stitch, so no task ever sequences a whole brand's cells. The
    median pick is the MIN price with 2·cum ≥ total — an integer
    cross-multiply, no division, so the boundary cell is
    engine-exact. The unit price itself is a pure INTEGER
    floor-division of cents (decimal division rounds at
    engine-specific result scales — found by the oracle: Spark and
    DuckDB disagreed by one cent).
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    price_cents = F.expr(
        "(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) * 100)"
        " div CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)"
    )
    pp = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", price_cents.alias("price_cents"))
        .agg((F.sum(dec("l_quantity", 2, 12)) * 100).cast("bigint").alias("qty_cents"))
        .withColumn("shard", F.expr("price_cents div 16384"))
    )
    w_in = (
        Window.partitionBy("p_brand", "shard")
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_off = (
        Window.partitionBy("p_brand")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        pp.groupBy("p_brand", "shard")
        .agg(F.sum("qty_cents").alias("st"))
        .withColumn("offset", F.sum("st").over(w_off) - F.col("st"))
        .withColumn("total_qty", F.sum("st").over(Window.partitionBy("p_brand")))
        .select(
            F.col("p_brand").alias("ob"), F.col("shard").alias("os"),
            "offset", "total_qty",
        )
    )
    cum = (
        pp.withColumn("rsum", F.sum("qty_cents").over(w_in))
        .join(
            F.broadcast(offsets),
            (F.col("p_brand") == F.col("ob")) & (F.col("shard") == F.col("os")),
        )
        .select(
            "p_brand",
            "price_cents",
            (F.col("offset") + F.col("rsum")).cast("bigint").alias("cum_qty"),
            F.col("total_qty").cast("bigint").alias("total_qty"),
        )
    )
    return (
        cum.where(2 * F.col("cum_qty") >= F.col("total_qty"))
        .groupBy("p_brand")
        .agg(
            (F.min("price_cents").cast("double") / 100).alias(
                "weighted_median_price"
            ),
            F.max("total_qty").cast("bigint").alias("total_qty_cents"),
        )
        .orderBy("p_brand")
    )


# --- degree assortativity -------------------------------------------------------


def _assortativity_oracle() -> str:
    return f"""
    WITH pairs AS (
        SELECT doc_a, doc_b FROM ({_minhash_sql()})
    ), sym AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ), deg AS (
        SELECT a AS v, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY a
    ), ends AS (
        SELECT da.d AS x, db.d AS y
        FROM sym s JOIN deg da ON da.v = s.a JOIN deg db ON db.v = s.b
    ), sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
        FROM ends
    )
    SELECT n AS n_directed_edges,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE))
                ELSE 0.0 END AS assortativity
    FROM sums
    """


@register(
    "graph_assortativity",
    oracle=_assortativity_oracle(),
    description="degree assortativity of the near-dup graph (hub-to-hub vs hub-to-leaf wiring) — Pearson r from EXACT integer sums, one sqrt+division",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman): the Pearson correlation of
    endpoint degrees over edges. Positive = template hubs link to
    other hubs (one mega-family — collapse carefully); negative =
    hub-and-spoke (one root document spawning leaves — collapse to
    the root is safe). The fourth exact-oracle graph statistic
    beside degree distribution, triangles and bridge edges.

    Determinism: every Pearson term (Σx, Σxy, Σx²...) is an integer
    sum over integer degrees — order-independent and exact; ONE
    float sqrt + division at the end, guarded against zero variance
    (a regular graph has undefined r; report 0). Scale: degrees from
    one rollup, the ends join hashes on vertex id, sums combine
    map-side to a 1-row state.
    """
    from lime_etl_spark.operators.dedup import (
        JACCARD_TAU,
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    pairs = (
        jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh)))
        .where(F.col("jaccard") >= JACCARD_TAU)
        .select("doc_a", "doc_b")
        .persist()
    )
    sh.unpersist()
    sym = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")).unionByName(
        pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
    )
    deg = sym.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("x"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("y"))
    ends = sym.join(da, "a").join(db, "b")
    s = ends.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        F.col("n").alias("n_directed_edges"),
        F.when(
            (vx > 0) & (vy > 0),
            cov.cast("double") / F.sqrt(vx.cast("double") * vy.cast("double")),
        )
        .otherwise(0.0)
        .alias("assortativity"),
    )


# --- cohort LTV curve -----------------------------------------------------------


@register(
    "ev_cohort_ltv",
    oracle="""
    WITH firstw AS (
        SELECT user_id, MIN(date_trunc('week', ts)) AS cw
        FROM events GROUP BY user_id
    ), sizes AS (
        SELECT cw, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM firstw GROUP BY cw
    ), spend AS (
        SELECT f.cw,
               CAST(date_diff('day', f.cw, date_trunc('week', e.ts)) / 7 AS BIGINT)
                   AS week_offset,
               SUM(CAST(e.value AS DECIMAL(12,2))) AS rev
        FROM events e
        JOIN firstw f USING (user_id)
        WHERE e.event_type = 'purchase'
        GROUP BY f.cw, week_offset
    )
    SELECT strftime(s.cw, '%Y-%m-%d') AS cohort_week,
           s.week_offset,
           z.cohort_size,
           CAST(s.rev AS DOUBLE) AS week_revenue,
           CAST(CAST(SUM(s.rev) OVER (PARTITION BY s.cw ORDER BY s.week_offset
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DECIMAL(38,2)) AS DOUBLE) / z.cohort_size
               AS cum_ltv_per_user
    FROM spend s JOIN sizes z ON z.cw = s.cw
    ORDER BY cohort_week, week_offset
    """,
    description="cohort LTV curve: cumulative revenue per user by weeks-since-first-touch (the payback-period table) — decimal-exact cumsum over the cohort×offset rollup",
)
def ev_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime value by cohort age: cumulative purchase revenue per
    cohort member at each week offset since first touch — the curve
    whose crossing point with acquisition cost IS the payback
    period. The money sibling of ev_cohort_retention (same cohort
    keys, so the two matrices join cleanly).

    Scale: revenue reduces to the |cohorts|×|offsets| rollup before
    any window; the cumulative sum runs per cohort over that tiny
    frame in exact decimal (cast back to decimal(38,2) after the
    window — window SUM re-widens precision engine-specifically);
    cohort sizes broadcast; ONE double division per output row.
    """
    ev = load_table(spark, sf_dir, "events")
    firstw = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    sizes = firstw.groupBy("cw").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    spend = (
        ev.where(F.col("event_type") == "purchase")
        .join(firstw, "user_id")
        .groupBy(
            "cw",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cw")) / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.sum(dec("value", 2, 12)).alias("rev"))
    )
    w = Window.partitionBy("cw").orderBy("week_offset").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spend.join(F.broadcast(sizes), "cw")
        .select(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "cohort_size",
            to_double(F.col("rev")).alias("week_revenue"),
            (
                to_double(F.sum("rev").over(w).cast("decimal(38,2)"))
                / F.col("cohort_size")
            ).alias("cum_ltv_per_user"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# --- ABC classification --------------------------------------------------------


@register(
    "q_abc_classification",
    oracle="""
    WITH pr AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
        FROM lineitem GROUP BY l_partkey
    ), tot AS (
        SELECT CAST(SUM(rev) AS DECIMAL(38,2)) AS total FROM pr
    ), ranked AS (
        SELECT l_partkey, rev,
               CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DECIMAL(38,2)) AS cum
        FROM pr
    ), classed AS (
        SELECT r.l_partkey, r.rev,
               CASE WHEN r.cum * 100 <= t.total * 80 THEN 'A'
                    WHEN r.cum * 100 <= t.total * 95 THEN 'B'
                    ELSE 'C' END AS abc
        FROM ranked r CROSS JOIN tot t
    )
    SELECT abc,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev) AS DOUBLE) AS revenue
    FROM classed
    GROUP BY abc
    ORDER BY abc
    """,
    description="ABC revenue classification (A=first 80% of cumulative revenue, B=to 95%, C=tail): decimal-exact running sum, integer cross-multiplied thresholds",
)
def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merchandising ABC split: parts ranked by revenue, class A
    carries the first 80% of cumulative revenue, B to 95%, C the
    tail — where q_revenue_deciles draws the whole concentration
    curve, this emits the three operational buckets stockage policy
    keys on.

    Scale: per-part decimal reduce FIRST; the running sum over the
    |parts| rollup runs via the sharded-cumsum decomposition
    (functions/ranks.with_global_cumsum — quantile buckets,
    partition-local running sums, broadcast offsets; decimal-exact
    throughout, no single-task sort); class thresholds are
    decimal×integer cross-multiplies — no share division ever
    happens, so the boundary part lands identically on both engines.
    3-row output.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice", 2, 12)).alias("rev")
    )
    tot = pr.agg(F.sum("rev").cast("decimal(38,2)").alias("total"))
    ranked = with_global_cumsum(
        pr,
        -F.col("rev"),
        [F.desc("rev"), F.col("l_partkey")],
        "rev",
        out="cum",
    ).withColumn("cum", F.col("cum").cast("decimal(38,2)"))
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "rev",
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            to_double(F.sum("rev")).alias("revenue"),
        )
        .orderBy("abc")
    )


# --- vocabulary coverage curve --------------------------------------------------

VOCAB_CUTOFFS = (100, 1000, 10000)


def _vocab_coverage_oracle() -> str:
    legs = ",\n           ".join(
        f"CAST(SUM(CASE WHEN rnk <= {c} THEN n ELSE 0 END) AS BIGINT)"
        f" AS tokens_top_{c}"
        for c in VOCAB_CUTOFFS
    )
    return f"""
    WITH c AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
            FROM documents
        )
        WHERE word <> ''
        GROUP BY word
    ), ranked AS (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, word) AS rnk FROM c
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           {legs}
    FROM ranked
    """


@register(
    "txt_vocab_coverage",
    oracle=_vocab_coverage_oracle(),
    description="vocabulary coverage curve: tokens covered by the top 100/1k/10k words (the tokenizer vocab-size sizing input)",
)
def txt_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of the corpus the top-N words cover — the sizing
    curve for tokenizer vocabularies and stopword lists: if the top
    1k words cover 95% of tokens, an OOV/byte-fallback path only
    ever sees the remaining 5%. Companion to txt_zipf_audit (the
    head's shape) and txt_hapax_ratio (the tail's mass).

    Scale: word counts combine map-side to |vocab| rows; the global
    rank is the documented vocab-bounded one-task sort; the coverage
    sums are conditional int64 counters to a 1-row output.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = Window.orderBy(F.desc("n"), "word")
    ranked = counts.withColumn("rnk", F.row_number().over(w))
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum("n").cast("bigint").alias("total_tokens"),
    ] + [
        F.sum(F.when(F.col("rnk") <= c, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias(f"tokens_top_{c}")
        for c in VOCAB_CUTOFFS
    ]
    return ranked.agg(*aggs)


# --- user survival curve -------------------------------------------------------

SURVIVAL_DAYS = (0, 7, 14, 21, 28)


@register(
    "ev_survival_curve",
    oracle=f"""
    WITH spans AS (
        SELECT user_id,
               MIN(CAST(ts AS DATE)) AS first_d,
               MAX(CAST(ts AS DATE)) AS last_d
        FROM events GROUP BY user_id
    ), m AS (
        SELECT MAX(last_d) AS maxd FROM spans
    ), expanded AS (
        SELECT s.user_id, k.k,
               date_diff('day', s.first_d, s.last_d) AS span_days,
               date_diff('day', s.first_d, m.maxd) AS window_days
        FROM spans s
        CROSS JOIN m
        CROSS JOIN (VALUES {", ".join(f"({k})" for k in SURVIVAL_DAYS)}) AS k(k)
    )
    SELECT k AS day_k,
           CAST(COUNT(*) AS BIGINT) AS n_observable,
           CAST(SUM(CASE WHEN span_days >= k THEN 1 ELSE 0 END) AS BIGINT)
               AS n_surviving,
           CAST(SUM(CASE WHEN span_days >= k THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS survival
    FROM expanded
    WHERE window_days >= k
    GROUP BY k
    ORDER BY day_k
    """,
    description="user survival curve S(k): share still active ≥k days after first touch, right-censored denominators (the churn half of the retention story)",
)
def ev_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival analysis in integer days: S(k) = share of users whose
    activity SPAN (first→last event) reaches k days, computed only
    over users observable for ≥ k days (right-censoring — a user who
    joined 3 days before the window's end can't prove 7-day
    survival, and counting them would bias churn high). The
    complement of ev_retention_curve: retention asks 'back on day
    k?', survival asks 'still alive at k?'.

    Scale: per-user reduce to (first, last) — one map-side-combining
    rollup; the ×|k| expansion runs over USERS (already reduced),
    the 1-row max date broadcasts, and everything after is integer
    counters to a |k|-row output.
    """
    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_d"),
        F.max(F.to_date("ts")).alias("last_d"),
    )
    m = spans.agg(F.max("last_d").alias("maxd"))
    ks = F.explode(F.array(*[F.lit(k) for k in SURVIVAL_DAYS])).alias("k")
    expanded = (
        spans.crossJoin(F.broadcast(m))
        .select(
            "user_id",
            ks,
            F.datediff("last_d", "first_d").alias("span_days"),
            F.datediff("maxd", "first_d").alias("window_days"),
        )
        .where(F.col("window_days") >= F.col("k"))
    )
    return (
        expanded.groupBy(F.col("k").alias("day_k"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_observable"),
            F.sum(F.when(F.col("span_days") >= F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_surviving"),
        )
        .select(
            "day_k",
            "n_observable",
            "n_surviving",
            (F.col("n_surviving").cast("double") / F.col("n_observable")).alias(
                "survival"
            ),
        )
        .orderBy("day_k")
    )


# --- triangle census ----------------------------------------------------------


def _triangle_oracle() -> str:
    from lime_etl_spark.operators.graph import WEDGE_DEGREE_CAP

    return f"""
    WITH pairs AS (
        SELECT doc_a, doc_b FROM ({_minhash_sql()})
    ), pin AS (
        SELECT doc_a, doc_b FROM (
            SELECT doc_a, doc_b,
                   ROW_NUMBER() OVER (PARTITION BY doc_b ORDER BY doc_a) AS rn
            FROM pairs
        ) WHERE rn <= {WEDGE_DEGREE_CAP}
    ), pout AS (
        SELECT doc_a, doc_b FROM (
            SELECT doc_a, doc_b,
                   ROW_NUMBER() OVER (PARTITION BY doc_a ORDER BY doc_b) AS rn
            FROM pairs
        ) WHERE rn <= {WEDGE_DEGREE_CAP}
    ), tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM pin p1
        JOIN pout p2 ON p2.doc_a = p1.doc_b
        JOIN pairs p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b
    ), deg AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT doc_a AS v FROM pairs
            UNION ALL SELECT doc_b FROM pairs
        ) GROUP BY v
    ), wedge AS (
        SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges,
               CAST(COUNT(*) AS BIGINT) AS n_vertices,
               CAST(CAST(SUM(d) AS BIGINT) / 2 AS BIGINT) AS n_edges
        FROM deg
    )
    SELECT w.n_vertices, w.n_edges, t.n_triangles, w.n_wedges,
           CASE WHEN w.n_wedges > 0
                THEN CAST(3 * t.n_triangles AS DOUBLE) / w.n_wedges
                ELSE 0.0 END AS global_clustering
    FROM tri t CROSS JOIN wedge w
    """


@register(
    "graph_triangles",
    oracle=_triangle_oracle(),
    description="triangle census + global clustering coefficient of the near-dup graph (canonical-order 3-join — each triangle counted once; wedges from the degree sequence)",
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count and global clustering coefficient
    3·triangles/wedges of the near-dup graph — the transitivity
    number: near 1 the graph is clique-like true duplicate clusters,
    near 0 it's chains/stars of accidental shared shingles (the same
    story graph_cluster_density tells per cluster, here as one
    corpus-level scalar with an EXACT SQL oracle — rare for a graph
    statistic).

    Scale: the canonical edge order (a<b everywhere) means each
    triangle is counted exactly once by the a<b<c join. The expansion
    join pivots on the middle vertex b, whose cost term is
    indeg(b)·outdeg(b) — so BOTH adjacency directions are
    degree-capped at WEDGE_DEGREE_CAP before the join (cap_adjacency,
    functions/skew.py), bounding every pivot to ≤ cap² candidate
    paths; the edge-existence probe p3 stays uncapped (it only
    filters). The DuckDB oracle applies the identical deterministic
    caps. n_triangles is therefore a lower bound through hubs hotter
    than the cap and exact otherwise (max degree ≤ cap at every test
    scale); wedges come from the uncapped degree sequence, never a
    path join.
    """
    from lime_etl_spark.operators.dedup import (
        JACCARD_TAU,
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )
    from lime_etl_spark.operators.graph import triangle_count_from_edges

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    pairs = (
        jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh)))
        .where(F.col("jaccard") >= JACCARD_TAU)
        .select("doc_a", "doc_b")
        .persist()
    )
    sh.unpersist()
    tri = triangle_count_from_edges(pairs)
    deg = (
        pairs.select(F.col("doc_a").alias("v"))
        .unionByName(pairs.select(F.col("doc_b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    wedge = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("n_wedges"),
        F.count(F.lit(1)).cast("bigint").alias("n_vertices"),
        (F.sum("d").cast("bigint") / 2).cast("bigint").alias("n_edges"),
    )
    return (
        tri.crossJoin(F.broadcast(wedge))
        .select(
            "n_vertices",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.when(
                F.col("n_wedges") > 0,
                (3 * F.col("n_triangles")).cast("double") / F.col("n_wedges"),
            )
            .otherwise(0.0)
            .alias("global_clustering"),
        )
    )


# --- full-row duplicate probe --------------------------------------------------

_DUPROW_TABLES: dict[str, tuple[str, ...]] = {
    "orders": (
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ),
    "lineitem": (
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ),
    "customer": ("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "events": ("event_id", "ts", "user_id", "event_type", "value", "props"),
}


def _dup_rows_oracle() -> str:
    legs = []
    for tbl, cols in _DUPROW_TABLES.items():
        tup = ", ".join(cols)
        legs.append(
            f"SELECT '{tbl}' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,"
            f" CAST(COUNT(DISTINCT ({tup})) AS BIGINT) AS n_distinct_rows"
            f" FROM {tbl}"
        )
    union = "\n    UNION ALL ".join(legs)
    return f"""
    SELECT tbl, n_rows, n_distinct_rows,
           n_rows - n_distinct_rows AS n_dup_rows
    FROM ({union})
    ORDER BY tbl
    """


@register(
    "dq_duplicate_rows",
    oracle=_dup_rows_oracle(),
    description="full-row duplicate probe per table (double-ingest detector; tuple-valued distinct, no string casts)",
)
def dq_duplicate_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-row duplicates — the double-ingest / replayed-batch
    signature that keyed checks miss when the duplicate carries a
    fresh surrogate... and that dq_candidate_keys misses when no key
    is declared. Counts distinct TUPLES (value-based; never a
    string-concat hash, whose date/float formatting diverges across
    engines).

    Scale: one count-distinct-over-struct aggregate per table — the
    same Expand trade as dq_cardinality_profile, and at 100 TB the
    cheap screen is a two-level groupBy on a 64-bit row hash first
    with tuple-distinct only on colliding buckets.
    """
    out = None
    for tbl, cols in _DUPROW_TABLES.items():
        df = load_table(spark, sf_dir, tbl)
        st = df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(F.struct(*[F.col(c) for c in cols]))
            .cast("bigint")
            .alias("n_distinct_rows"),
        ).select(F.lit(tbl).alias("tbl"), "n_rows", "n_distinct_rows")
        out = st if out is None else out.unionByName(st)
    return out.select(
        "tbl",
        "n_rows",
        "n_distinct_rows",
        (F.col("n_rows") - F.col("n_distinct_rows")).alias("n_dup_rows"),
    ).orderBy("tbl")


# --- temporal train/test split --------------------------------------------------

TIME_SPLIT_CUTOFF = "2024-01-22"  # ~¾ through the events window


@register(
    "samp_time_split",
    oracle=f"""
    WITH tagged AS (
        SELECT user_id,
               CASE WHEN ts < TIMESTAMP '{TIME_SPLIT_CUTOFF}' THEN 'train'
                    ELSE 'test' END AS split
        FROM events
    ), sizes AS (
        SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM tagged GROUP BY split
    ), overlap AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap_users FROM (
            SELECT user_id FROM tagged WHERE split = 'train'
            INTERSECT
            SELECT user_id FROM tagged WHERE split = 'test'
        )
    )
    SELECT s.split, s.n_events, s.n_users, o.n_overlap_users
    FROM sizes s CROSS JOIN overlap o
    ORDER BY s.split
    """,
    description="temporal train/test split (past→train, recent→test — the anti-leakage split for forecasting) + cross-split user-overlap audit",
)
def samp_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The time-based split every forecasting/recommendation eval
    needs (hash splits leak the future into training): events before
    the cutoff train, after it test — plus the USER-overlap count
    across splits, because for user-level objectives shared users
    are themselves leakage and the modeler must decide (user-level
    temporal split vs event-level).

    Scale: split assignment is a row-local predicate (partition
    pruning does it for free on a date-partitioned lake); sizes are
    counters; the overlap is a semi-join of the two DISTINCT user
    keysets — same INTERSECT→hash-semi-join lowering as
    q_customer_set_ops.
    """
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(TIME_SPLIT_CUTOFF).cast("timestamp")
    tagged = ev.select(
        "user_id",
        F.when(F.col("ts") < cutoff, "train").otherwise("test").alias("split"),
    )
    sizes = tagged.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
    )
    tr = tagged.where(F.col("split") == "train").select("user_id").distinct()
    te = tagged.where(F.col("split") == "test").select("user_id").distinct()
    overlap = tr.intersect(te).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_overlap_users")
    )
    return (
        sizes.crossJoin(F.broadcast(overlap))
        .select("split", "n_events", "n_users", "n_overlap_users")
        .orderBy("split")
    )


# --- missing-value imputation -------------------------------------------------


@register(
    "etl_impute_median",
    oracle="""
    WITH corpus AS (
        -- planted gaps: every 10th event's value arrives NULL;
        -- money moves as exact integer CENTS (interpolated medians
        -- of integers are exact .0/.5 doubles on both engines)
        SELECT event_type,
               CASE WHEN event_id % 10 = 0 THEN NULL
                    ELSE CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
               END AS v_cents
        FROM events
    ), med AS (
        SELECT event_type,
               CAST(FLOOR(quantile_cont(v_cents, 0.5) + 0.5) AS BIGINT)
                   AS med_cents
        FROM corpus WHERE v_cents IS NOT NULL GROUP BY event_type
    )
    SELECT c.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN c.v_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_imputed,
           CAST(m.med_cents AS DOUBLE) / 100 AS imputed_value,
           CAST(SUM(COALESCE(c.v_cents, m.med_cents)) AS BIGINT)
               AS sum_after_impute_cents
    FROM corpus c JOIN med m ON m.event_type = c.event_type
    GROUP BY c.event_type, m.med_cents
    ORDER BY c.event_type
    """,
    description="median imputation operator: per-group exact median fills planted nulls; audit counts + decimal-exact post-impute mass",
)
def etl_impute_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-value imputation as a first-class ETL operator: per-
    group exact median fills the gaps, and the output is the AUDIT
    (how many filled, with what, total mass after) — the numbers a
    reviewer signs off before an imputed table feeds anything. Gaps
    are planted (every 10th value NULLed) so ground truth is
    checkable.

    Scale: the median comes from one exact-percentile reduce per
    group (approx_percentile is the documented mega-group path, as
    in q_price_quantiles) broadcast back onto the fact; imputation
    itself is a row-local COALESCE; the audit is counters + one
    exact integer sum. Money moves as integer CENTS through the
    whole operator: interpolated medians of integers are exact
    .0/.5 doubles, so the half-up FLOOR rounding is cross-engine
    deterministic where decimal-median interpolation is NOT (Spark
    percentile and DuckDB median disagree on decimal inputs — found
    by the oracle). Median (not mean) because it is rank-based —
    robust to the outliers that usually accompany missingness.
    """
    ev = load_table(spark, sf_dir, "events")
    corpus = ev.select(
        "event_type",
        F.when(F.col("event_id") % 10 == 0, F.lit(None))
        .otherwise((dec("value", 2, 12) * 100).cast("bigint"))
        .alias("v_cents"),
    )
    med = (
        corpus.where(F.col("v_cents").isNotNull())
        .groupBy("event_type")
        .agg(
            F.floor(F.expr("percentile(v_cents, 0.5)") + 0.5)
            .cast("bigint")
            .alias("med_cents")
        )
    )
    return (
        corpus.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med_cents")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("v_cents").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_imputed"),
            F.sum(F.coalesce("v_cents", "med_cents"))
            .cast("bigint")
            .alias("sum_after_impute_cents"),
        )
        .select(
            "event_type",
            "n_rows",
            "n_imputed",
            (F.col("med_cents").cast("double") / 100).alias("imputed_value"),
            "sum_after_impute_cents",
        )
        .orderBy("event_type")
    )


# --- tolerant type coercion ---------------------------------------------------


@register(
    "etl_try_cast_audit",
    oracle="""
    WITH feed AS (
        -- planted dirty feed: every 10th balance arrives as 'N/A'
        SELECT CASE WHEN c_custkey % 10 = 0 THEN 'N/A'
                    ELSE CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)
               END AS raw
        FROM customer
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN TRY_CAST(raw AS DECIMAL(12,2)) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_unparseable,
           CAST(SUM(COALESCE(TRY_CAST(raw AS DECIMAL(12,2)), 0)) AS DOUBLE)
               AS parsed_total,
           CAST(SUM(CASE WHEN TRY_CAST(raw AS DECIMAL(12,2)) IS NULL
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS unparseable_rate
    FROM feed
    """,
    description="tolerant type coercion: try_cast ingest with failure accounting (ANSI mode would abort the whole job on row one)",
)
def etl_try_cast_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerant ingest of a string feed with dirty numerics: try_cast
    parses what it can, NULLs what it can't, and the audit counts the
    casualties — under ANSI mode (this engine's default, and the
    driver's) a plain CAST would kill the whole job on the FIRST
    'N/A'. try_* is the production answer: the job completes, the
    quarantine count is measured, and the gate decides.

    Scale: entirely row-local (try_cast is codegen'd JVM), reduced to
    one counters+decimal row; no shuffle beyond the final 1-row agg.
    """
    customer = load_table(spark, sf_dir, "customer")
    feed = customer.select(
        F.when(F.col("c_custkey") % 10 == 0, F.lit("N/A"))
        .otherwise(dec("c_acctbal", 2, 12).cast("string"))
        .alias("raw")
    )
    parsed = F.expr("try_cast(raw AS decimal(12,2))")
    return feed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(parsed.isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_unparseable"),
        to_double(F.sum(F.coalesce(parsed, F.lit(0).cast("decimal(12,2)")))).alias(
            "parsed_total"
        ),
        (
            F.sum(F.when(parsed.isNull(), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("unparseable_rate"),
    )


# --- shingle-size sensitivity -------------------------------------------------

SHINGLE_KS = (3, 5, 8)


def _shingles_sql_k(k: int) -> str:
    """Parameterized DuckDB twin of ``doc_shingles(docs, n=k)``."""
    from lime_etl_spark.functions.text import MERSENNE_P, shingle_int_sql

    concat = " || ' ' || ".join(f"t[i + {j}]" for j in range(k))
    return f"""
        SELECT DISTINCT doc_id, {shingle_int_sql("sh")} % {MERSENNE_P} AS x
        FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(t) - {k - 1}),
                                         i -> {concat})) AS sh
            FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        )
    """


def _minhash_cand_sql(sh_cte: str) -> str:
    """Candidate/verified CTE block over a named shingle CTE: 16-perm
    minhash signatures, 4×4 banding, candidate distinct pairs, and
    count-bearing verified pairs (J ≥ τ)."""
    from lime_etl_spark.functions.text import MERSENNE_P, MINHASH_PERMS
    from lime_etl_spark.operators.dedup import JACCARD_TAU, N_BANDS, BAND_ROWS

    mins = ", ".join(
        f"MIN((x * {a} + {b}) % {MERSENNE_P}) AS mh_{j}"
        for j, (a, b) in enumerate(MINHASH_PERMS)
    )
    band_sigs = " UNION ALL ".join(
        f"SELECT doc_id, {band} AS band, "
        + " || ',' || ".join(
            f"CAST(mh_{band * BAND_ROWS + r} AS VARCHAR)" for r in range(BAND_ROWS)
        )
        + f" AS sig FROM sigs_{sh_cte}"
        for band in range(N_BANDS)
    )
    return f"""
    sigs_{sh_cte} AS MATERIALIZED (SELECT doc_id, {mins} FROM {sh_cte} GROUP BY doc_id),
    buckets_{sh_cte} AS ({band_sigs}),
    cand_{sh_cte} AS MATERIALIZED (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM buckets_{sh_cte} a JOIN buckets_{sh_cte} b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    sizes_{sh_cte} AS (SELECT doc_id, COUNT(*) AS n_sh FROM {sh_cte} GROUP BY doc_id),
    ver_{sh_cte} AS MATERIALIZED (
        SELECT i.doc_a, i.doc_b, i.n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b
        FROM (
            SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
            FROM cand_{sh_cte} c
            JOIN {sh_cte} a ON a.doc_id = c.doc_a
            JOIN {sh_cte} b ON b.doc_id = c.doc_b AND b.x = a.x
            GROUP BY c.doc_a, c.doc_b
        ) i
        JOIN sizes_{sh_cte} sa ON sa.doc_id = i.doc_a
        JOIN sizes_{sh_cte} sb ON sb.doc_id = i.doc_b
        WHERE CAST(i.n_inter AS DOUBLE)
                / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) >= {JACCARD_TAU}
    )"""


def _shingle_sensitivity_oracle() -> str:
    blocks, selects = [], []
    for k in SHINGLE_KS:
        name = f"sh{k}"
        blocks.append(f"{name} AS MATERIALIZED ({_shingles_sql_k(k)})")
        blocks.append(_minhash_cand_sql(name).strip().lstrip(","))
        selects.append(f"""
        SELECT CAST({k} AS INTEGER) AS shingle_k,
               CAST((SELECT COUNT(*) FROM cand_{name}) AS BIGINT) AS n_candidates,
               CAST((SELECT COUNT(*) FROM ver_{name}) AS BIGINT) AS n_verified,
               CASE WHEN (SELECT COUNT(*) FROM ver_{name}) = 0 THEN NULL
                    ELSE CAST((SELECT SUM((n_inter * 1000000) // (n_a + n_b - n_inter))
                               FROM ver_{name}) AS DOUBLE)
                         / ((SELECT COUNT(*) FROM ver_{name}) * 1000000.0)
               END AS mean_jaccard""")
    return (
        "WITH " + ",\n".join(blocks) + "\n"
        + " UNION ALL ".join(selects)
        + " ORDER BY shingle_k"
    )


@register(
    "dedup_shingle_sensitivity",
    oracle=_shingle_sensitivity_oracle(),
    description="shingle-size tuning table: verified near-dup pairs + mean Jaccard per k∈{3,5,8} (granularity knob measured, third tuning table)",
)
def dedup_shingle_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third measured tuning table (after LSH bands and ANN
    probes): how shingle GRANULARITY moves near-dup detection.
    Small k (3 words) matches loosely — paraphrase-tolerant but
    boilerplate-prone; large k (8) demands long verbatim runs. For
    each k this reports candidate pairs, verified pairs (J ≥ τ) and
    the mean verified Jaccard — the evidence for the shipped k=5.

    Scale: each k re-shingles the corpus (the shingle set is a
    different projection per k — unlike LSH banding there is nothing
    to share), but everything downstream stays candidate-scoped;
    |configs| scalar rows reach the driver.

    Exactness: the mean is over per-pair Jaccards QUANTIZED to 1e-6
    by integer division ((n_inter·10⁶) div union) — an integer sum
    plus ONE final double division, so the value is bit-identical in
    any engine and any partitioning (a float AVG would depend on
    summation order). The quantization bias is < 1e-6, far below the
    tuning decisions this table drives.
    """
    from lime_etl_spark.operators.dedup import (
        JACCARD_TAU,
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    rows = []
    for k in SHINGLE_KS:
        sh = doc_shingles(docs, n=k).persist()
        cand = lsh_candidates(minhash_signatures(sh)).persist()
        verified = (
            jaccard_pairs(sh, candidates=cand, with_counts=True)
            .where(F.col("jaccard") >= JACCARD_TAU)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.expr("(n_inter * 1000000) div (n_a + n_b - n_inter)")
                ).alias("sum_e6"),
            )
            .collect()[0]
        )
        rows.append(
            (
                k,
                cand.count(),
                verified.n,
                (float(verified.sum_e6) / (verified.n * 1000000.0))
                if verified.n
                else None,
            )
        )
        sh.unpersist()
        cand.unpersist()
    return spark.createDataFrame(
        rows,
        "shingle_k int, n_candidates bigint, n_verified bigint, mean_jaccard double",
    ).orderBy("shingle_k")


# --- cumulative adoption ------------------------------------------------------


@register(
    "ev_cumulative_adoption",
    oracle="""
    WITH firstd AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
    ), daily AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS new_users FROM firstd GROUP BY d
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cumulative_users
    FROM daily
    ORDER BY day
    """,
    description="user adoption curve: daily first-time users + running cumulative total (cumulative DISTINCT via first-activity reduce)",
)
def ev_cumulative_adoption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The growth chart: new users per day and the cumulative user
    count. Cumulative DISTINCT doesn't window (state would be the
    full user set per day) — the standard rewrite reduces each user
    to their FIRST activity day, after which it's integer counters
    and one running sum over the calendar-bounded daily rollup.

    Scale: one user_id rollup (map-side combinable MIN), one
    |days|-row daily count, one running-sum window over that tiny
    frame (single-task, calendar-bounded — documented like every
    global window here).
    """
    ev = load_table(spark, sf_dir, "events")
    firstd = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d"))
    daily = firstd.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "new_users",
            F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
        )
        .orderBy("day")
    )


# --- order size distribution --------------------------------------------------


@register(
    "q_order_size_distribution",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT n_lines,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM per_order
    GROUP BY n_lines
    ORDER BY n_lines
    """,
    description="lines-per-order histogram (basket-size distribution; the fan-out bound every orderkey join inherits)",
)
def q_order_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size distribution: how many lines an order carries.
    Beyond the merchandising read, this histogram IS the fan-out
    bound for every orderkey join and the q_basket_pairs self-join
    (pairs per order = n·(n-1)/2) — the number to check before
    trusting those plans at a new corpus.

    Scale: two keyed counter rollups with map-side combine; output
    bounded by the max basket size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines")
    )
    return (
        per_order.groupBy("n_lines")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .orderBy("n_lines")
    )


# --- incremental join-view maintenance ---------------------------------------

IVM_SPLIT_DATE = "1996-01-01"


@register(
    "etl_incremental_join",
    oracle=f"""
    -- the oracle recomputes the joined view FROM SCRATCH; the Spark
    -- side assembles it from the four delta quadrants — equality IS
    -- the incremental-view-maintenance correctness proof
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    description="incremental JOIN-view maintenance: Δ(A⋈B) = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, merged as additive partial states — oracle proves quadrant-sum == full recompute",
)
def etl_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-view IVM, the join sibling of etl_incremental_agg: a
    materialized join-aggregate over orders⋈lineitem maintained from
    a date split (history vs increment) via the delta identity
    A'⋈B' = A⋈B + ΔA⋈B + A⋈ΔB + ΔA⋈ΔB. The Spark side computes the
    FOUR quadrant aggregates and merges them by state ADDITION
    (count/decimal-sum are additive partials); the oracle recomputes
    the full join — hash equality is the IVM correctness proof.

    Scale: this is how a 100 TB joined rollup refreshes nightly —
    the history⋈history quadrant is yesterday's materialization
    (never recomputed; computed here only because the proof needs
    it), and the three delta quadrants each have at least one SMALL
    side, so the daily cost is Δ-proportional: ΔA⋈B probes the big
    side with a broadcast/bucket-pruned small side instead of
    re-shuffling two full facts.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    split = F.lit(IVM_SPLIT_DATE).cast("date")
    o_hist = orders.where(F.col("o_orderdate") < split)
    o_inc = orders.where(F.col("o_orderdate") >= split)
    l_hist = li.where(F.col("l_shipdate") < split)
    l_inc = li.where(F.col("l_shipdate") >= split)

    def quadrant(o: DataFrame, l: DataFrame) -> DataFrame:
        return (
            o.select("o_orderkey", "o_orderpriority")
            .join(
                l.select("l_orderkey", "l_extendedprice"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(dec("l_extendedprice", 2, 12)).alias("rev"),
            )
        )

    states = (
        quadrant(o_hist, l_hist)
        .unionByName(quadrant(o_inc, l_hist))
        .unionByName(quadrant(o_hist, l_inc))
        .unionByName(quadrant(o_inc, l_inc))
    )
    return (
        states.groupBy("o_orderpriority")
        .agg(
            F.sum("n_lines").cast("bigint").alias("n_lines"),
            to_double(F.sum("rev")).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# --- fuzzy key match (entity resolution) -------------------------------------

FUZZY_MAX_DIST = 2


@register(
    "etl_fuzzy_key_match",
    oracle=f"""
    WITH variants AS (
        -- planted dirty feed: every 10th customer name with one
        -- character substituted mid-string (edit distance 1)
        SELECT c_custkey + 5000000 AS dirty_id,
               substr(c_name, 1, 9) || 'X' || substr(c_name, 11) AS dirty_name
        FROM customer WHERE c_custkey % 10 = 0
    ), blocked AS (
        SELECT v.dirty_id, v.dirty_name, c.c_custkey, c.c_name,
               levenshtein(v.dirty_name, c.c_name) AS dist
        FROM variants v
        JOIN customer c
          ON substr(v.dirty_name, length(v.dirty_name) - 3, 4)
             = substr(c.c_name, length(c.c_name) - 3, 4)
         AND abs(length(v.dirty_name) - length(c.c_name)) <= {FUZZY_MAX_DIST}
    )
    SELECT dirty_id, c_custkey AS matched_custkey, CAST(dist AS BIGINT) AS dist
    FROM (
        SELECT dirty_id, c_custkey, dist,
               ROW_NUMBER() OVER (PARTITION BY dirty_id
                                  ORDER BY dist, c_custkey) AS rn
        FROM blocked WHERE dist <= {FUZZY_MAX_DIST}
    ) WHERE rn = 1
    ORDER BY dirty_id
    """,
    description="fuzzy entity resolution: blocked Levenshtein match (suffix block + length band — never the cross join), best-match-wins",
)
def etl_fuzzy_key_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution for dirty feeds: match each incoming
    (typo-bearing) name to its master customer by edit distance —
    the join every CRM/vendor-file ingest needs when the natural key
    arrives misspelled. Planted here: every 10th name with one
    substituted character, so ground truth is checkable (pytest
    asserts 100% of variants resolve to their true customer).

    Scale: Levenshtein against all masters is the O(n²) trap — the
    BLOCKING key (last-4-chars + length band) turns it into an
    equi-join whose fan-out is the block size; edit distance runs
    only inside blocks, JVM-side (codegen levenshtein). A typo
    model that can corrupt the suffix needs a second blocking pass
    on a different slice (multi-pass blocking — the standard ER
    recipe); best match wins by (distance, key) total order.
    """
    customer = load_table(spark, sf_dir, "customer")
    variants = customer.where(F.col("c_custkey") % 10 == 0).select(
        (F.col("c_custkey") + 5_000_000).alias("dirty_id"),
        F.concat(
            F.substring("c_name", 1, 9),
            F.lit("X"),
            F.expr("substring(c_name, 11)"),
        ).alias("dirty_name"),
    )
    suffix = lambda c: F.expr(f"substring({c}, length({c}) - 3, 4)")  # noqa: E731
    blocked = variants.join(
        F.broadcast(customer.select("c_custkey", "c_name")),
        (suffix("dirty_name") == suffix("c_name"))
        & (
            F.abs(F.length("dirty_name") - F.length("c_name")) <= FUZZY_MAX_DIST
        ),
    ).select(
        "dirty_id",
        "c_custkey",
        F.levenshtein("dirty_name", "c_name").alias("dist"),
    )
    w = Window.partitionBy("dirty_id").orderBy("dist", "c_custkey")
    return (
        blocked.where(F.col("dist") <= FUZZY_MAX_DIST)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "dirty_id",
            F.col("c_custkey").alias("matched_custkey"),
            F.col("dist").cast("bigint").alias("dist"),
        )
        .orderBy("dirty_id")
    )


# --- top movers --------------------------------------------------------------

TOP_MOVERS_K = 25


@register(
    "q_top_movers",
    oracle=f"""
    WITH py AS (
        SELECT l_partkey, EXTRACT(YEAR FROM l_shipdate) AS yr,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
        FROM lineitem GROUP BY l_partkey, yr
    ), lagged AS (
        SELECT l_partkey, yr, rev,
               LAG(rev) OVER (PARTITION BY l_partkey ORDER BY yr) AS prev_rev,
               yr - LAG(yr) OVER (PARTITION BY l_partkey ORDER BY yr) AS yr_gap
        FROM py
    )
    SELECT l_partkey, CAST(yr AS BIGINT) AS yr,
           CAST(rev AS DOUBLE) AS rev,
           CAST(prev_rev AS DOUBLE) AS prev_rev,
           CAST(rev - prev_rev AS DOUBLE) AS delta
    FROM lagged
    WHERE prev_rev IS NOT NULL AND yr_gap = 1
    ORDER BY ABS(CAST(rev - prev_rev AS DOUBLE)) DESC, l_partkey, yr
    LIMIT {TOP_MOVERS_K}
    """,
    description="biggest YoY part-revenue movers (consecutive years only): decimal-exact deltas over the part×year rollup, total-order top-k",
)
def q_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'what changed most' report: parts whose revenue moved the
    most between consecutive years, signed delta included — the
    triage list a category manager reads before the averages.

    Scale: the fact reduces to the part×year decimal rollup first;
    the lag window runs at rollup grain; a year-gap guard keeps
    non-consecutive comparisons out (a part dormant for a year is a
    re-entry, not a mover). Deltas are exact decimal subtractions
    converted once; the top-k order (|delta| desc, part, year) is a
    total order so the LIMIT boundary is deterministic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    py = li.groupBy(
        "l_partkey", F.year("l_shipdate").alias("yr")
    ).agg(F.sum(dec("l_extendedprice", 2, 12)).alias("rev"))
    w = Window.partitionBy("l_partkey").orderBy("yr")
    lagged = py.select(
        "l_partkey",
        F.col("yr").cast("bigint").alias("yr"),
        "rev",
        F.lag("rev").over(w).alias("prev_rev"),
        (F.col("yr") - F.lag("yr").over(w)).alias("yr_gap"),
    )
    return (
        lagged.where(F.col("prev_rev").isNotNull() & (F.col("yr_gap") == 1))
        .select(
            "l_partkey",
            "yr",
            to_double(F.col("rev")).alias("rev"),
            to_double(F.col("prev_rev")).alias("prev_rev"),
            to_double(F.col("rev") - F.col("prev_rev")).alias("delta"),
        )
        .orderBy(F.abs(F.col("delta")).desc(), "l_partkey", "yr")
        .limit(TOP_MOVERS_K)
    )


# --- id-space audit -----------------------------------------------------------

_ID_COLUMNS = {
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "events": "event_id",
    "documents": "doc_id",
}


def _id_space_oracle() -> str:
    legs = [
        f"SELECT '{tbl}' AS tbl, '{col}' AS id_col,"
        f" CAST(COUNT(*) AS BIGINT) AS n_rows,"
        f" CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_ids,"
        f" CAST(MIN({col}) AS BIGINT) AS min_id,"
        f" CAST(MAX({col}) AS BIGINT) AS max_id"
        f" FROM {tbl}"
        for tbl, col in _ID_COLUMNS.items()
    ]
    union = "\n    UNION ALL ".join(legs)
    return f"""
    SELECT tbl, id_col, n_rows, n_ids, min_id, max_id,
           CAST(n_ids AS DOUBLE) / (max_id - min_id + 1) AS density
    FROM ({union})
    ORDER BY tbl
    """


@register(
    "dq_id_space_audit",
    oracle=_id_space_oracle(),
    description="id-space density per keyed table (gap/exhaustion screen; density≪1 ⇒ deletes or sparse allocators)",
)
def dq_id_space_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-space health: distinct ids vs the [min, max] span per
    table. Density near 1 = compact sequential ids; ≪1 = heavy
    deletes, sharded allocators or synthetic id collisions waiting to
    happen — and the span itself is the int-overflow runway check
    (an id allocator at 2³¹ is an outage with a date).

    Scale: one counters-only aggregate per table (min/max/count
    combine map-side; COUNT DISTINCT documented — swap for
    approx_count_distinct at extreme cardinality); |tables|-row
    output, one IEEE division per row.
    """
    out = None
    for tbl, col in _ID_COLUMNS.items():
        st = (
            load_table(spark, sf_dir, tbl)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.count_distinct(F.col(col)).cast("bigint").alias("n_ids"),
                F.min(col).cast("bigint").alias("min_id"),
                F.max(col).cast("bigint").alias("max_id"),
            )
            .select(
                F.lit(tbl).alias("tbl"),
                F.lit(col).alias("id_col"),
                "n_rows",
                "n_ids",
                "min_id",
                "max_id",
            )
        )
        out = st if out is None else out.unionByName(st)
    return out.select(
        "tbl",
        "id_col",
        "n_rows",
        "n_ids",
        "min_id",
        "max_id",
        (
            F.col("n_ids").cast("double")
            / (F.col("max_id") - F.col("min_id") + 1)
        ).alias("density"),
    ).orderBy("tbl")


# --- Neyman allocation -------------------------------------------------------


@register(
    "samp_neyman_alloc",
    oracle="""
    WITH s AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS s1,
               CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
        FROM documents GROUP BY lang
    )
    SELECT lang, n_docs,
           CAST(s1 AS DOUBLE) / n_docs AS mean_chars,
           sqrt(CASE WHEN CAST(s2 AS DOUBLE) / n_docs
                          - (CAST(s1 AS DOUBLE) / n_docs) * (CAST(s1 AS DOUBLE) / n_docs) > 0
                     THEN CAST(s2 AS DOUBLE) / n_docs
                          - (CAST(s1 AS DOUBLE) / n_docs) * (CAST(s1 AS DOUBLE) / n_docs)
                     ELSE 0 END) AS std_chars,
           n_docs * sqrt(CASE WHEN CAST(s2 AS DOUBLE) / n_docs
                          - (CAST(s1 AS DOUBLE) / n_docs) * (CAST(s1 AS DOUBLE) / n_docs) > 0
                     THEN CAST(s2 AS DOUBLE) / n_docs
                          - (CAST(s1 AS DOUBLE) / n_docs) * (CAST(s1 AS DOUBLE) / n_docs)
                     ELSE 0 END) AS neyman_weight
    FROM s
    ORDER BY lang
    """,
    description="Neyman optimal sample allocation per stratum: N_h·S_h weights from exact integer sums (un-normalized — consumer divides)",
)
def samp_neyman_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal (Neyman) stratified-sampling allocation: for a fixed
    labeling/eval budget, stratum h should get n·N_h·S_h/ΣN·S draws —
    big AND variable strata earn more samples than proportional
    allocation gives them. This emits the N_h·S_h weights per
    language; proportional allocation (samp_stratified) is what you
    run when you haven't measured S_h — this table is the upgrade.

    Determinism: variance from exact integer Σx/Σx² (the
    ev_anomaly_zscore discipline — built-in STDDEV is not
    bit-reproducible), clamped pre-sqrt; the weight stays
    UN-normalized because Σ of per-stratum doubles is
    engine-order-dependent (same rule as samp_mixture_stats) — the
    consumer divides by their own total. One counters-only rollup to
    |langs| rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_docs")
    var = F.col("s2").cast("double") / F.col("n_docs") - mean * mean
    std = F.sqrt(F.when(var > 0, var).otherwise(0.0))
    return s.select(
        "lang",
        "n_docs",
        mean.alias("mean_chars"),
        std.alias("std_chars"),
        (F.col("n_docs") * std).alias("neyman_weight"),
    ).orderBy("lang")


# --- k-core decomposition ----------------------------------------------------

KCORE_K = 2
KCORE_MAX_ITERATIONS = 50


def k_core(vertices: DataFrame, edges: DataFrame, k: int = KCORE_K,
           max_iterations: int = KCORE_MAX_ITERATIONS) -> DataFrame:
    """Vertices of the k-core: the maximal subgraph where every vertex
    keeps degree ≥ k — computed by iterative peeling (remove
    degree<k vertices, recompute, repeat to fixpoint). The 2-core
    strips pendant/chain near-dup links and leaves only the genuinely
    clustered mass; peeling order never changes the result (the
    k-core is unique), so the loop is deterministic.

    Scale: each round is one degree count over the alive edge set +
    a semi-join filter — all hashed on vertex id; rounds
    localCheckpoint to stop lineage growth (the CC/LP/PageRank
    discipline). Peeling rounds are bounded by the degeneracy
    ordering depth, not vertex count.
    """
    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    alive = vertices.select("vid").localCheckpoint()
    n_alive = alive.count()
    for _ in range(max_iterations):
        live_edges = (
            sym.join(alive.withColumnRenamed("vid", "src"), "src", "left_semi")
            .join(alive.withColumnRenamed("vid", "dst"), "dst", "left_semi")
        )
        deg = live_edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        nxt = (
            deg.where(F.col("deg") >= k)
            .select(F.col("src").alias("vid"))
            .localCheckpoint()
        )
        n_nxt = nxt.count()
        alive = nxt
        if n_nxt == n_alive:
            break
        n_alive = n_nxt
    else:
        raise RuntimeError(f"k_core did not converge in {max_iterations} rounds")
    sym.unpersist()
    return alive


def _kcore_oracle(k: int, rounds: int = 24) -> str:
    """DuckDB twin of the peeling loop: the k-core fixpoint is unique
    and peeling is integer-only, so ``rounds`` UNROLLED peel rounds
    (idempotent once converged; sf0.01 converges in <10) replay it
    exactly. MATERIALIZED CTEs — each round references the previous
    one three times, and inlining would exponentially re-expand the
    whole minhash pipeline."""
    parts = [
        """
    alive0 AS MATERIALIZED (
        SELECT DISTINCT vid FROM (
            SELECT doc_a AS vid FROM pairs UNION ALL SELECT doc_b AS vid FROM pairs
        )
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f"""
    alive{r} AS MATERIALIZED (
        SELECT s.src AS vid
        FROM sym s
        WHERE s.src IN (SELECT vid FROM alive{r - 1})
          AND s.dst IN (SELECT vid FROM alive{r - 1})
        GROUP BY s.src
        HAVING COUNT(*) >= {k}
    )""")
    return f"""
    WITH pairs AS MATERIALIZED (
        SELECT doc_a, doc_b FROM ({_minhash_sql()})
    ),
    sym AS MATERIALIZED (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),{",".join(parts)}
    SELECT CAST({k} AS INTEGER) AS k,
           CAST((SELECT COUNT(*) FROM alive0) AS BIGINT) AS n_active_vertices,
           CAST((SELECT COUNT(*) FROM alive{rounds}) AS BIGINT) AS n_kcore_vertices,
           CAST((SELECT COUNT(*) FROM alive{rounds}) AS DOUBLE)
             / (SELECT COUNT(*) FROM alive0) AS core_share
    """


@register(
    "graph_kcore_summary",
    oracle=_kcore_oracle(KCORE_K),
    description=f"{KCORE_K}-core of the near-dup graph: clustered mass after stripping pendant/chain links",
)
def graph_kcore_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of the near-dup graph is REAL clustering: the 2-core
    drops pendant vertices and chains (one accidental shared shingle)
    and keeps vertices embedded in at least a cycle — the robust
    denominator for 'how duplicated is this corpus' beside
    graph_degree_distribution's raw counts."""
    from lime_etl_spark.operators.dedup import (
        JACCARD_TAU,
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    pairs = jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh))).where(
        F.col("jaccard") >= JACCARD_TAU
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).persist()
    active = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct()
        .persist()
    )
    core = k_core(active, edges, k=KCORE_K)
    sh.unpersist()
    n_active = active.count()
    n_core = core.count()
    return spark.createDataFrame(
        [(KCORE_K, n_active, n_core, (n_core / n_active) if n_active else 0.0)],
        "k int, n_active_vertices bigint, n_kcore_vertices bigint, core_share double",
    )


# --- skyline (Pareto front) --------------------------------------------------


@register(
    "q_skyline_parts",
    oracle="""
    WITH p AS (
        SELECT p_partkey, p_brand,
               CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS price_cents,
               p_size
        FROM part
    ), scanned AS (
        SELECT p_partkey, p_brand, price_cents, p_size,
               MIN(p_size) OVER (ORDER BY price_cents
                                 RANGE BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING) AS min_cheaper_size,
               MIN(p_size) OVER (PARTITION BY price_cents) AS min_same_price_size
        FROM p
    )
    SELECT p_partkey, p_brand,
           CAST(price_cents AS DOUBLE) / 100 AS retail_price,
           p_size
    FROM scanned
    WHERE (min_cheaper_size IS NULL OR p_size < min_cheaper_size)
      AND p_size <= min_same_price_size
    ORDER BY price_cents, p_partkey
    """,
    description="skyline / Pareto front (min price, min size): classic skyline operator as ONE monotone-chain window pass, never the O(n²) dominance self-join",
)
def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skyline (Pareto-front) operator: parts not dominated on
    (retail price, size) — no other part is ≤ in both dimensions and
    < in one. Skylines power 'best trade-off' screens (cheapest
    part at each size class, most-economical supplier, …) and are a
    named operator in several reference engines.

    Scale: the textbook formulation is an O(n²) dominance self-join.
    For 2-D the skyline is a MONOTONE CHAIN: sort by price, keep rows
    whose size beats the running minimum over all strictly-cheaper
    rows — one window pass. Prices move as exact integer cents so
    the strictly-cheaper RANGE frame ('1 PRECEDING' on cents) is
    well-defined; the equal-price group keeps only its minimal sizes
    (ties on both dims are mutually non-dominating and all survive).
    The chain decomposes by PRICE-RANGE shard (shard = cents div
    2^14, equal prices never split): the strictly-cheaper running min
    runs WITHIN each shard, and the min over ALL earlier shards comes
    from a broadcast prefix-min over the bounded shard roster — no
    single-task sort even if the part dim grows fact-like. The fact
    tables never enter.
    """
    part = load_table(spark, sf_dir, "part")
    p = part.select(
        "p_partkey",
        "p_brand",
        (dec("p_retailprice", 2, 12) * 100).cast("bigint").alias("price_cents"),
        "p_size",
    ).withColumn("shard", F.expr("price_cents div 16384"))
    w_cheaper_in = (
        Window.partitionBy("shard")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("price_cents")
    w_prefix = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    prefix = (
        p.groupBy("shard")
        .agg(F.min("p_size").alias("shard_min"))
        .withColumn("prefix_min", F.min("shard_min").over(w_prefix))
        .select(F.col("shard").alias("ps"), "prefix_min")
    )
    scanned = (
        p.join(F.broadcast(prefix), F.col("shard") == F.col("ps"))
        .select(
            "p_partkey",
            "p_brand",
            "price_cents",
            "p_size",
            # least() skips nulls: null ⟺ no strictly-cheaper row at all
            F.least(
                F.min("p_size").over(w_cheaper_in), F.col("prefix_min")
            ).alias("min_cheaper_size"),
            F.min("p_size").over(w_same).alias("min_same_price_size"),
        )
    )
    return (
        scanned.where(
            (
                F.col("min_cheaper_size").isNull()
                | (F.col("p_size") < F.col("min_cheaper_size"))
            )
            & (F.col("p_size") <= F.col("min_same_price_size"))
        )
        .select(
            "p_partkey",
            "p_brand",
            (F.col("price_cents").cast("double") / 100).alias("retail_price"),
            "p_size",
        )
        .orderBy("retail_price", "p_partkey")
    )


# --- partition write-skew report --------------------------------------------


@register(
    "etl_partition_skew_report",
    oracle="""
    WITH per_day AS (
        SELECT o_orderdate AS d, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY o_orderdate
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CAST(MIN(n) AS BIGINT) AS min_rows,
           CAST(MAX(n) AS BIGINT) AS max_rows,
           CAST(SUM(n) AS BIGINT) AS total_rows,
           CAST(MAX(n) AS DOUBLE) * COUNT(*) / SUM(n) AS skew_factor
    FROM per_day
    """,
    description="date-partition write-skew profile: max/avg partition-size ratio (the repartitionByRange trigger)",
)
def etl_partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-skew screen for a date-partitioned fact: rows per
    partition date reduced to (count, min, max, skew_factor =
    max/mean). A skew factor near 1 means even partitions; >>1 means
    the biggest partition dominates wall-clock on write AND read —
    the trigger for repartitionByRange / salting before the write
    (the write-side sibling of dq_join_skew).

    Scale: one map-side-combining count per date, then a 1-row
    reduce; the ratio is a single double expression over exact
    counters, evaluated in identical order on both engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_day = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return per_day.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
        F.min("n").cast("bigint").alias("min_rows"),
        F.max("n").cast("bigint").alias("max_rows"),
        F.sum("n").cast("bigint").alias("total_rows"),
        (
            F.max("n").cast("double") * F.count(F.lit(1)) / F.sum("n")
        ).alias("skew_factor"),
    )


# --- SCD3 current + previous -------------------------------------------------


@register(
    "etl_scd3_current_prev",
    oracle="""
    SELECT user_id, value AS current_value, prev_value,
           ts_us AS changed_at_us
    FROM (
        SELECT user_id, value, epoch_us(ts) AS ts_us,
               LAG(value) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS prev_value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
    ) WHERE rn = 1
    ORDER BY user_id
    """,
    description="SCD-3 dimension view: current + immediately-previous value per key in one pass (completes SCD1/2/3 + PIT coverage)",
)
def etl_scd3_current_prev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 3 — the 'current and previous' dimension shape for
    consumers who only ever ask 'what changed last' (one column of
    history instead of SCD2's row-per-version). Together with upsert
    (SCD1), scd2/PIT and CDC merge this completes the slowly-changing
    toolbox.

    Scale: BOTH windows (lag in ascending change order, row_number in
    descending) partition by the key, so Spark plans ONE user_id
    exchange with two sorts — the q_order_gaps pattern; output is one
    row per key.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    us = F.unix_micros("ts")
    w_asc = Window.partitionBy("user_id").orderBy(us, "event_id")
    w_desc = Window.partitionBy("user_id").orderBy(us.desc(), F.col("event_id").desc())
    return (
        ev.select(
            "user_id",
            "value",
            us.alias("ts_us"),
            F.lag("value").over(w_asc).alias("prev_value"),
            F.row_number().over(w_desc).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("value").alias("current_value"),
            "prev_value",
            F.col("ts_us").alias("changed_at_us"),
        )
        .orderBy("user_id")
    )


# --- revenue-decile migration matrix ----------------------------------------


@register(
    "q_decile_transition_matrix",
    oracle="""
    WITH cy AS (
        SELECT o_custkey, EXTRACT(YEAR FROM o_orderdate) AS yr,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        FROM orders GROUP BY o_custkey, yr
    ), ranked AS (
        SELECT o_custkey, yr,
               NTILE(10) OVER (PARTITION BY yr ORDER BY rev DESC, o_custkey)
                   AS decile
        FROM cy
    )
    SELECT a.decile AS from_decile, b.decile AS to_decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM ranked a
    JOIN ranked b ON b.o_custkey = a.o_custkey AND b.yr = a.yr + 1
    GROUP BY from_decile, to_decile
    ORDER BY from_decile, to_decile
    """,
    description="customer revenue-decile migration matrix between consecutive years (CRM mobility — who moves up/down)",
)
def q_decile_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer mobility: the 10×10 matrix of revenue-decile
    transitions between consecutive years — diagonal mass = a stable
    base, lower-triangle = churn risk sliding down, upper = growth
    accounts. The decile expression matches q_revenue_deciles'
    (rev desc, custkey ntile) so 'decile' means the same thing
    across reports.

    Scale: orders reduce to (customer, year) revenue FIRST
    (decimal-exact); the ntile windows run per year over that rollup;
    the transition self-join is an equi-join on (customer, year+1)
    over the rollup grain, and the output is ≤100 cells.
    """
    orders = load_table(spark, sf_dir, "orders")
    cy = orders.groupBy(
        "o_custkey", F.year("o_orderdate").alias("yr")
    ).agg(F.sum(dec("o_totalprice", 2, 12)).alias("rev"))
    w = Window.partitionBy("yr").orderBy(F.desc("rev"), "o_custkey")
    ranked = cy.select("o_custkey", "yr", F.ntile(10).over(w).alias("decile")).persist()
    a, b = ranked.alias("a"), ranked.alias("b")
    return (
        a.join(
            b,
            (F.col("b.o_custkey") == F.col("a.o_custkey"))
            & (F.col("b.yr") == F.col("a.yr") + 1),
        )
        .groupBy(
            F.col("a.decile").alias("from_decile"),
            F.col("b.decile").alias("to_decile"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .orderBy("from_decile", "to_decile")
    )


# --- skip-gram co-occurrence lift -------------------------------------------

SKIPGRAM_MIN_COUNT = 5
SKIPGRAM_TOP_K = 50


@register(
    "txt_skipgram_lift",
    oracle=f"""
    WITH toks AS (
        SELECT string_split(text, ' ') AS t FROM documents
    ), pairs AS (
        SELECT p.w1, p.w2
        FROM toks, unnest(
            [struct_pack(w1 := t[i+1], w2 := t[i+2]) for i in range(len(t)-1)]
            || [struct_pack(w1 := t[i+1], w2 := t[i+3]) for i in range(len(t)-2)]
        ) AS u(p)
    ), pc AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM pairs GROUP BY w1, w2
    ), uni AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
            SELECT unnest(t) AS word FROM toks
        ) GROUP BY word
    ), tot AS (
        SELECT CAST((SELECT SUM(n) FROM uni) AS BIGINT) AS n_u,
               CAST((SELECT SUM(n_ab) FROM pc) AS BIGINT) AS n_p
    )
    SELECT p.w1, p.w2, p.n_ab,
           ua.n AS n_a, ub.n AS n_b,
           CAST(p.n_ab AS DOUBLE) * t.n_u * t.n_u
             / (CAST(t.n_p AS DOUBLE) * ua.n * ub.n) AS lift
    FROM pc p
    JOIN uni ua ON ua.word = p.w1
    JOIN uni ub ON ub.word = p.w2
    CROSS JOIN tot t
    WHERE p.n_ab >= {SKIPGRAM_MIN_COUNT}
    ORDER BY p.n_ab DESC, p.w1, p.w2
    LIMIT {SKIPGRAM_TOP_K}
    """,
    description="skip-gram (window ≤2) co-occurrence lift — the log-free PMI table word-vector pipelines start from",
)
def txt_skipgram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word co-occurrence within a ±2-token window scored by lift
    n_ab·N_u²/(N_p·n_a·n_b) — rank-equivalent to PMI without logs
    (log is monotone), so this IS the collocation/PMI table an
    embedding pipeline starts from.

    Scale: pair generation is a ROW-LOCAL array transform (both
    skip distances built in one concat'd inline array → ONE explode;
    never a per-distance union re-scanning the corpus); the pair
    rollup combines map-side and is vocab²-bounded with the count
    floor killing the tail in the partial agg. Unigram counts and
    the 1-row totals broadcast onto the surviving rollup. The final
    lift is one double expression evaluated in identical order on
    both engines; top-k orders by exact counts.
    """
    docs = load_table(spark, sf_dir, "documents")
    empty = "cast(array() as array<struct<w1:string,w2:string>>)"
    pair_expr = (
        "concat("
        f"if(size(t) >= 2, transform(sequence(0, size(t)-2),"
        f" i -> struct(t[i] as w1, t[i+1] as w2)), {empty}),"
        f"if(size(t) >= 3, transform(sequence(0, size(t)-3),"
        f" i -> struct(t[i] as w1, t[i+2] as w2)), {empty})"
        ")"
    )
    toks = docs.select(F.split("text", " ").alias("t")).persist()
    pairs = toks.select(F.explode(F.expr(pair_expr)).alias("p")).select(
        "p.w1", "p.w2"
    )
    pc = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .where(F.col("n_ab") >= SKIPGRAM_MIN_COUNT)
    )
    uni = (
        toks.select(F.explode("t").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .persist()
    )
    tot = uni.agg(F.sum("n").cast("bigint").alias("n_u")).crossJoin(
        pairs.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("n_p"))
    )
    ua = uni.select(F.col("word").alias("w1"), F.col("n").alias("n_a"))
    ub = uni.select(F.col("word").alias("w2"), F.col("n").alias("n_b"))
    return (
        pc.join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_ab",
            "n_a",
            "n_b",
            (
                F.col("n_ab").cast("double") * F.col("n_u") * F.col("n_u")
                / (F.col("n_p").cast("double") * F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy(F.desc("n_ab"), "w1", "w2")
        .limit(SKIPGRAM_TOP_K)
    )


# --- Bloom filter sketch -----------------------------------------------------

BLOOM_BITS = 1 << 14  # m
BLOOM_HASHES = 3  # k


def _bloom_oracle() -> str:
    probes = ", ".join(str(i) for i in range(BLOOM_HASHES))
    return f"""
    WITH buyers AS (
        SELECT DISTINCT o_custkey AS k FROM orders
    ), bits AS (
        SELECT DISTINCT {shingle_int_sql("'bf' || CAST(i AS VARCHAR) || ':' || CAST(k AS VARCHAR)")} % {BLOOM_BITS} AS pos
        FROM buyers, (SELECT unnest([{probes}]) AS i)
    ), probe_keys AS (
        -- members AND guaranteed non-members (shifted keys), so the
        -- false-positive rate is actually exercised
        SELECT c_custkey AS k FROM customer
        UNION ALL
        SELECT c_custkey + 10000000 FROM customer
    ), probe_pos AS (
        SELECT p.k,
               {shingle_int_sql("'bf' || CAST(i AS VARCHAR) || ':' || CAST(p.k AS VARCHAR)")} % {BLOOM_BITS} AS pos
        FROM probe_keys p, (SELECT unnest([{probes}]) AS i)
    ), verdicts AS (
        SELECT p.k,
               COUNT(*) FILTER (WHERE b.pos IS NOT NULL) = {BLOOM_HASHES} AS reported
        FROM probe_pos p LEFT JOIN bits b ON b.pos = p.pos
        GROUP BY p.k
    ), truth AS (
        SELECT v.k, v.reported, (b.k IS NOT NULL) AS actual
        FROM verdicts v LEFT JOIN buyers b ON b.k = v.k
    )
    SELECT CAST((SELECT COUNT(*) FROM buyers) AS BIGINT) AS n_inserted,
           CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS n_bits_set,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(COUNT(*) FILTER (WHERE reported) AS BIGINT) AS n_reported,
           CAST(COUNT(*) FILTER (WHERE actual) AS BIGINT) AS n_true_members,
           CAST(COUNT(*) FILTER (WHERE reported AND NOT actual) AS BIGINT)
               AS n_false_positives,
           CAST(COUNT(*) FILTER (WHERE NOT reported AND actual) AS BIGINT)
               AS n_false_negatives
    FROM truth
    """


@register(
    "sketch_bloom_filter",
    oracle=_bloom_oracle(),
    description=f"Bloom-filter membership sketch ({BLOOM_BITS} bits, {BLOOM_HASHES} hashes) with exact-truth audit — md5-bridge hashing makes DuckDB replay the filter EXACTLY",
)
def sketch_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter as a first-class mergeable sketch: the set-bit
    positions of the buyers keyset (m={BLOOM_BITS}, k={BLOOM_HASHES})
    probed by every customer, with the exact-truth confusion counts —
    false negatives MUST be zero (the Bloom guarantee, pytest-gated),
    false positives are the measured price of the {BLOOM_BITS}-bit
    budget. Like sketch_heavy_hitters, the arithmetic md5-bridge
    hashing means the ORACLE replays the sketch bit-for-bit.

    Scale: the filter state is ≤m DISTINCT positions — mergeable by
    union across partitions/days exactly like the CMS counters add;
    the probe is an equi-join on position (bits side broadcast at
    any realistic m), reduced per key by a count==k flag. At 100 TB
    this is the pre-join existence screen for keys too numerous to
    broadcast raw — the hand-rolled twin of the runtime
    bloom-pruning the session enables, exposed as data.
    """
    from lime_etl_spark.functions.text import shingle_int

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    buyers = orders.select(F.col("o_custkey").alias("k")).distinct().persist()
    idx = F.explode(F.array(*[F.lit(i) for i in range(BLOOM_HASHES)])).alias("i")

    def positions(df: DataFrame, key: str) -> DataFrame:
        return df.select(F.col(key).alias("k"), idx).select(
            "k",
            (
                shingle_int(
                    F.concat(
                        F.lit("bf"),
                        F.col("i").cast("string"),
                        F.lit(":"),
                        F.col("k").cast("string"),
                    )
                )
                % BLOOM_BITS
            ).alias("pos"),
        )

    bits = positions(buyers, "k").select("pos").distinct().persist()
    # probe members AND guaranteed non-members (shifted keys) so the
    # false-positive rate is actually exercised
    probe_keys = customer.select(F.col("c_custkey").alias("k")).unionByName(
        customer.select((F.col("c_custkey") + 10_000_000).alias("k"))
    )
    probe = positions(probe_keys, "k")
    verdicts = (
        probe.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("k")
        .agg((F.sum(F.coalesce("hit", F.lit(0))) == BLOOM_HASHES).alias("reported"))
    )
    truth = verdicts.join(
        buyers.withColumn("actual", F.lit(True)), "k", "left"
    ).withColumn("actual", F.coalesce("actual", F.lit(False)))
    n_inserted = buyers.select(F.count(F.lit(1)).alias("v"))
    n_bits = bits.select(F.count(F.lit(1)).alias("v"))
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    report = truth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        flag(F.col("reported")).alias("n_reported"),
        flag(F.col("actual")).alias("n_true_members"),
        flag(F.col("reported") & ~F.col("actual")).alias("n_false_positives"),
        flag(~F.col("reported") & F.col("actual")).alias("n_false_negatives"),
    )
    return (
        report.crossJoin(
            F.broadcast(n_inserted.select(F.col("v").cast("bigint").alias("n_inserted")))
        )
        .crossJoin(
            F.broadcast(n_bits.select(F.col("v").cast("bigint").alias("n_bits_set")))
        )
        .select(
            "n_inserted",
            "n_bits_set",
            "n_probes",
            "n_reported",
            "n_true_members",
            "n_false_positives",
            "n_false_negatives",
        )
    )


# --- ANN tuning curve --------------------------------------------------------


def _ann_tuning_sql() -> str:
    """Full SQL twin of ann_tuning_curve (r4, rows-only → oracle):
    the truth CTE is the brute-force top-k, each strategy's candidate
    set is replayed (sign-bucket equi-join, Hamming-1 popcount join,
    trained probe/cell join over the unrolled-Lloyd centroids), and
    scan_fraction / recall_at_k are single double divisions of exact
    counts — the same arithmetic the Spark side assembles in Python."""
    from lime_etl_spark.operators.similarity import (
        _BUCKET_SQL,
        _cells_probes_ctes,
        _kmeans_sql_ctes,
        N_PROBE_CENTROIDS,
        KMEANS_K,
        QUERY_MOD_SQL,
        TOP_K,
    )

    cos = (
        "list_dot_product(q.v, w.v)"
        " / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(w.v, w.v)))"
    )
    bucket_on_e = _BUCKET_SQL.replace("CAST(embedding AS DOUBLE[])", "v")

    def strategy(name: str) -> str:
        """One output row from the candidate CTE named cand_{name}."""
        return f"""
    SELECT '{name}' AS strategy,
           CAST((SELECT COUNT(*) FROM cand_{name}) AS DOUBLE)
             / ((SELECT n_q FROM nn) * ((SELECT n_v FROM nn) - 1)) AS scan_fraction,
           CAST((SELECT COUNT(*)
                 FROM (SELECT q, n FROM cand_{name} WHERE r <= {TOP_K}) x
                 JOIN t ON t.q_vec_id = x.q AND t.n_vec_id = x.n) AS DOUBLE)
             / ((SELECT n_q FROM nn) * {TOP_K}) AS recall_at_k"""

    return f"""
    WITH {_kmeans_sql_ctes()},
    {_cells_probes_ctes()},
    nn AS (
        SELECT COUNT(*) AS n_v,
               COUNT(*) FILTER (vec_id % {QUERY_MOD_SQL} = 0) AS n_q
        FROM e
    ),
    t AS (
        SELECT q_vec_id, n_vec_id FROM (
            SELECT q.vec_id AS q_vec_id, w.vec_id AS n_vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id ORDER BY {cos} DESC, w.vec_id
                   ) AS rank
            FROM e q JOIN e w ON q.vec_id <> w.vec_id
            WHERE q.vec_id % {QUERY_MOD_SQL} = 0
        ) WHERE rank <= {TOP_K}
    ),
    bk AS (SELECT vec_id, v, ({bucket_on_e}) AS bucket FROM e),
    cand_own_signbucket AS (
        SELECT q.vec_id AS q, w.vec_id AS n,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id ORDER BY {cos} DESC, w.vec_id
               ) AS r
        FROM bk q JOIN bk w
          ON q.bucket = w.bucket AND q.vec_id <> w.vec_id
        WHERE q.vec_id % {QUERY_MOD_SQL} = 0
    ),
    cand_multiprobe_h1 AS (
        SELECT q.vec_id AS q, w.vec_id AS n,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id ORDER BY {cos} DESC, w.vec_id
               ) AS r
        FROM bk q JOIN bk w
          ON bit_count(xor(q.bucket, w.bucket)) <= 1 AND q.vec_id <> w.vec_id
        WHERE q.vec_id % {QUERY_MOD_SQL} = 0
    ),
    cand_ivf_trained_{N_PROBE_CENTROIDS}of{KMEANS_K} AS (
        SELECT p.vec_id AS q, cl.vec_id AS n,
               ROW_NUMBER() OVER (
                   PARTITION BY p.vec_id ORDER BY {cos} DESC, cl.vec_id
               ) AS r
        FROM probes p
        JOIN e q ON q.vec_id = p.vec_id
        JOIN cells cl ON cl.cell = p.probe AND cl.vec_id <> p.vec_id
        JOIN e w ON w.vec_id = cl.vec_id
    )
    SELECT strategy, scan_fraction, recall_at_k FROM (
        {strategy("own_signbucket")}
        UNION ALL
        {strategy("multiprobe_h1")}
        UNION ALL
        {strategy(f"ivf_trained_{N_PROBE_CENTROIDS}of{KMEANS_K}")}
        UNION ALL
        SELECT 'brute_force' AS strategy, 1.0 AS scan_fraction,
               1.0 AS recall_at_k
    ) ORDER BY scan_fraction
    """


@register(
    "ann_tuning_curve",
    oracle=_ann_tuning_sql(),
    description="ANN strategy tuning table: measured scan fraction vs recall@k for own-bucket / multiprobe / trained IVF / brute force — full SQL oracle incl. the unrolled-Lloyd trained strategy (r4)",
)
def ann_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measured compute-vs-recall trade for the similarity
    family, one row per search strategy: exact brute force (scan
    fraction 1.0, recall 1.0 by definition), own-IVF-bucket
    (~1/256 scan), and Hamming-1 multiprobe (~9/256) — the table
    that justifies which path a 100 TB corpus runs. Companion to
    dedup_lsh_tuning: every approximate operator in this engine
    ships with its error measured, not asserted.

    Scale: candidates and hits are counted with distributed
    aggregates; NOTHING but the k-means model reaches the driver. The
    ground truth reuses brute_force_topk on the same deterministic
    query shard, so recall is against the true top-k, not a pooled
    proxy. All three probed strategies are unioned under one window
    + one broadcast-truth left join + one groupBy(strategy), and the
    scan_fraction / recall_at_k divisions are computed IN-PLAN
    against a crossjoined 1-row corpus-count aggregate (the oracle's
    `nn` CTE shape) with the declared strategy list as a literal
    frame, so zero-candidate strategies still emit their 0.0 row.
    That removes two driver collects the first implementation paid
    per execution (the n_q/n_v count and the per-strategy stats
    fetch) — guide §2.6: the whole measurement is ONE job after
    kmeans training, 6 jobs total instead of 14, and the per-job
    driver gaps (~0.2 s each at sf0.1, pure scheduler/planning
    latency; executor idle time at cluster scale) go with them.
    """
    from lime_etl_spark.operators.similarity import (
        KMEANS_ITERS,
        KMEANS_K,
        N_PROBE_CENTROIDS,
        QUERY_TARGET,
        TOP_K,
        brute_force_topk,
        dot,
        ivf_bucket,
    )
    from lime_etl_spark.functions.clustering import (
        kmeans_fit,
        nearest_centroid,
        nearest_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", ivf_bucket(F.col("embedding"))
    ).persist()
    # One bounded count job: qmod (the query-shard stride, a literal so
    # the vec_id filter stays pushdown-eligible) plus an UPPER BOUND on
    # the query count for the broadcast-vs-shuffle plan choice below —
    # the exact n_q/n_v only matter for the output fractions, which are
    # now computed in-plan (no second collect).
    n_total = emb.count()
    qmod = max(1, n_total // QUERY_TARGET)
    est_q = n_total // qmod + 1
    queries = emb.where(F.col("vec_id") % qmod == 0)

    # Consumed exactly once (as the broadcast build side of the hit
    # join), so persisting it would only add a cache write.
    truth = brute_force_topk(
        queries.select("vec_id", "embedding"), emb.select("vec_id", "embedding")
    ).select(
        F.col("q_vec_id").alias("q"),
        F.col("n_vec_id").alias("n"),
    )

    cos = (
        dot(F.col("q.embedding"), F.col("v.embedding"))
        / (
            F.sqrt(dot(F.col("q.embedding"), F.col("q.embedding")))
            * F.sqrt(dot(F.col("v.embedding"), F.col("v.embedding")))
        )
    ).alias("cosine")

    def leg(strategy: str, cand: DataFrame) -> DataFrame:
        return cand.select(F.lit(strategy).alias("strategy"), "q", "n", "cosine")

    def probe(strategy: str, bucket_cond) -> DataFrame:
        q, v = queries.alias("q"), emb.alias("v")
        return leg(
            strategy,
            q.join(
                F.broadcast(v) if est_q * n_total < 10**8 else v,
                bucket_cond & (F.col("q.vec_id") != F.col("v.vec_id")),
            ).select(
                F.col("q.vec_id").alias("q"), F.col("v.vec_id").alias("n"), cos
            ),
        )

    def hamming1(a, b):
        # popcount(xor) <= 1 over the 8-bit sign bucket
        x = a.bitwiseXOR(b)
        ones = sum(
            F.when(x.bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(0) for i in range(8)
        )
        return ones <= 1

    def probe_trained() -> DataFrame:
        centroids = kmeans_fit(emb, k=KMEANS_K, iters=KMEANS_ITERS)
        v = emb.withColumn(
            "cell",
            nearest_centroid(F.col("embedding").cast("array<double>"), centroids),
        ).alias("v")
        q = queries.withColumn(
            "probe",
            F.explode(
                nearest_centroids(
                    F.col("embedding").cast("array<double>"),
                    centroids,
                    N_PROBE_CENTROIDS,
                )
            ),
        ).alias("q")
        return leg(
            f"ivf_trained_{N_PROBE_CENTROIDS}of{KMEANS_K}",
            F.broadcast(q)
            .join(
                v,
                (F.col("q.probe") == F.col("v.cell"))
                & (F.col("q.vec_id") != F.col("v.vec_id")),
            )
            .select(
                F.col("q.vec_id").alias("q"), F.col("v.vec_id").alias("n"), cos
            ),
        )

    all_cand = (
        probe("own_signbucket", F.col("q.bucket") == F.col("v.bucket"))
        .unionByName(probe("multiprobe_h1", hamming1(F.col("q.bucket"), F.col("v.bucket"))))
        .unionByName(probe_trained())
    )
    w = Window.partitionBy("strategy", "q").orderBy(F.desc("cosine"), "n")
    stats = (
        all_cand.withColumn("r", F.row_number().over(w))
        .join(F.broadcast(truth.withColumn("hit", F.lit(1))), ["q", "n"], "left")
        .groupBy("strategy")
        .agg(
            F.count(F.lit(1)).alias("n_cand"),
            F.sum(
                F.when((F.col("r") <= TOP_K) & (F.col("hit") == 1), 1).otherwise(0)
            ).alias("hits"),
        )
    )
    # Reindex over the DECLARED strategy list (a leg with zero
    # candidates produces no group but must still emit its 0.0 row),
    # and scale by the 1-row nn aggregate — all in-plan. bigint/bigint
    # division is double in Spark, correctly rounded like the Python
    # int/int true division it replaces (all operands exact in 53 bits
    # here), so the output hash is unchanged.
    names = [
        "own_signbucket",
        "multiprobe_h1",
        f"ivf_trained_{N_PROBE_CENTROIDS}of{KMEANS_K}",
    ]
    names_df = spark.createDataFrame([(n,) for n in names], "strategy string")
    nn = emb.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_v"),
        F.sum(F.when(F.col("vec_id") % qmod == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_q"),
    )
    probed = (
        names_df.join(stats, "strategy", "left")
        .crossJoin(F.broadcast(nn))
        .select(
            "strategy",
            (
                F.coalesce(F.col("n_cand"), F.lit(0)).cast("bigint")
                / (F.col("n_q") * (F.col("n_v") - F.lit(1)))
            ).alias("scan_fraction"),
            (
                F.coalesce(F.col("hits"), F.lit(0)).cast("bigint")
                / (F.col("n_q") * F.lit(TOP_K))
            ).alias("recall_at_k"),
        )
    )
    brute = spark.createDataFrame(
        [("brute_force", 1.0, 1.0)],
        "strategy string, scan_fraction double, recall_at_k double",
    )
    return probed.unionByName(brute).orderBy("scan_fraction")


# --- source distribution distance (total variation) --------------------------


@register(
    "txt_source_tvd",
    oracle="""
    WITH counts AS (
        SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT source,
                   unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
            FROM documents
        )
        WHERE word <> ''
        GROUP BY source, word
    ), totals AS (
        SELECT source, CAST(SUM(n) AS BIGINT) AS nn FROM counts GROUP BY source
    ), common AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(SUM(ABS(a.n * tb.nn - b.n * ta.nn)) AS BIGINT) AS sum_abs,
               CAST(SUM(a.n) AS BIGINT) AS common_a,
               CAST(SUM(b.n) AS BIGINT) AS common_b
        FROM counts a
        JOIN counts b ON a.word = b.word AND a.source < b.source
        JOIN totals ta ON ta.source = a.source
        JOIN totals tb ON tb.source = b.source
        GROUP BY a.source, b.source
    )
    SELECT c.source_a, c.source_b,
           CAST((c.sum_abs
                 + tb.nn * (ta.nn - c.common_a)
                 + ta.nn * (tb.nn - c.common_b)) AS DOUBLE)
             / (2.0 * ta.nn * tb.nn) AS tvd
    FROM common c
    JOIN totals ta ON ta.source = c.source_a
    JOIN totals tb ON tb.source = c.source_b
    ORDER BY source_a, source_b
    """,
    description="exact total-variation distance between source unigram distributions (cross-multiplied integers; disjoint mass by closed form, no outer join)",
)
def txt_source_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution distance between every source pair as total
    variation ½Σ|p−q| — the domain-shift number mixture weighting
    and drift alarms want, computed EXACTLY: shares never appear;
    each term is the integer cross-product |n_a·N_b − n_b·N_a|, so
    the sum is exact int64 and order-independent, with ONE double
    division at the end. KL/JS need logs (not cross-engine
    bit-stable); TVD bounds JS via Pinsker anyway.

    Scale trick: words present in only one source never join — their
    mass enters by the closed form N_b·(N_a−Σ_common n_a) +
    N_a·(N_b−Σ_common n_b), so an INNER word join suffices (no
    per-pair full-outer explosion); the join is bounded by shared
    vocab × |source pairs|, and totals broadcast onto the rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias("word"),
        )
        .where(F.col("word") != "")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .persist()
    )
    totals = counts.groupBy("source").agg(F.sum("n").cast("bigint").alias("nn"))
    a, b = counts.alias("a"), counts.alias("b")
    ta = totals.select(F.col("source").alias("source_a"), F.col("nn").alias("na"))
    tb = totals.select(F.col("source").alias("source_b"), F.col("nn").alias("nb"))
    common = (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(F.abs(F.col("n_a") * F.col("nb") - F.col("n_b") * F.col("na")))
            .cast("bigint")
            .alias("sum_abs"),
            F.sum("n_a").cast("bigint").alias("common_a"),
            F.sum("n_b").cast("bigint").alias("common_b"),
        )
    )
    return (
        common.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            (
                (
                    F.col("sum_abs")
                    + F.col("nb") * (F.col("na") - F.col("common_a"))
                    + F.col("na") * (F.col("nb") - F.col("common_b"))
                ).cast("double")
                / (2.0 * F.col("na") * F.col("nb")).cast("double")
            ).alias("tvd"),
        )
        .orderBy("source_a", "source_b")
    )


# --- LSH tuning curve --------------------------------------------------------

LSH_TUNING_CONFIGS = ((2, 8), (4, 4), (8, 2))  # (bands, rows) over 16 perms


def _lsh_tuning_oracle() -> str:
    """DuckDB twin of the banding tuning loop: shingles + 16-perm
    signatures once, one candidate/verify block per (bands, rows)
    config, pooled distinct union for recall. Every output value is
    an integer count or ONE double division of integers — exact."""
    from lime_etl_spark.functions.text import MERSENNE_P, MINHASH_PERMS
    from lime_etl_spark.operators.dedup import _SHINGLES_SQL, JACCARD_TAU

    mins = ", ".join(
        f"MIN((x * {a} + {b}) % {MERSENNE_P}) AS mh_{j}"
        for j, (a, b) in enumerate(MINHASH_PERMS)
    )
    blocks = [
        f"sh AS MATERIALIZED ({_SHINGLES_SQL})",
        f"sigs AS MATERIALIZED (SELECT doc_id, {mins} FROM sh GROUP BY doc_id)",
        "sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)",
    ]
    names = []
    for n_bands, band_rows in LSH_TUNING_CONFIGS:
        name = f"c{n_bands}x{band_rows}"
        names.append((name, n_bands, band_rows))
        band_sigs = " UNION ALL ".join(
            f"SELECT doc_id, {band} AS band, "
            + " || ',' || ".join(
                f"CAST(mh_{band * band_rows + r} AS VARCHAR)"
                for r in range(band_rows)
            )
            + " AS sig FROM sigs"
            for band in range(n_bands)
        )
        blocks.append(f"buckets_{name} AS ({band_sigs})")
        blocks.append(f"""cand_{name} AS MATERIALIZED (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM buckets_{name} a JOIN buckets_{name} b
              ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        )""")
        blocks.append(f"""ver_{name} AS MATERIALIZED (
            SELECT i.doc_a, i.doc_b
            FROM (
                SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
                FROM cand_{name} c
                JOIN sh a ON a.doc_id = c.doc_a
                JOIN sh b ON b.doc_id = c.doc_b AND b.x = a.x
                GROUP BY c.doc_a, c.doc_b
            ) i
            JOIN sizes sa ON sa.doc_id = i.doc_a
            JOIN sizes sb ON sb.doc_id = i.doc_b
            WHERE CAST(i.n_inter AS DOUBLE)
                    / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) >= {JACCARD_TAU}
        )""")
    pooled_union = " UNION ALL ".join(
        f"SELECT doc_a, doc_b FROM ver_{name}" for name, _, _ in names
    )
    blocks.append(
        f"pooled AS MATERIALIZED (SELECT DISTINCT doc_a, doc_b FROM ({pooled_union}))"
    )
    selects = [
        f"""
        SELECT CAST({n_bands} AS INTEGER) AS n_bands,
               CAST({band_rows} AS INTEGER) AS rows_per_band,
               CAST((SELECT COUNT(*) FROM cand_{name}) AS BIGINT) AS n_candidates,
               CAST((SELECT COUNT(*) FROM ver_{name}) AS BIGINT) AS n_verified,
               CASE WHEN (SELECT COUNT(*) FROM cand_{name}) = 0 THEN 1.0
                    ELSE CAST((SELECT COUNT(*) FROM ver_{name}) AS DOUBLE)
                         / (SELECT COUNT(*) FROM cand_{name}) END AS precision,
               CASE WHEN (SELECT COUNT(*) FROM pooled) = 0 THEN 1.0
                    ELSE CAST((SELECT COUNT(*) FROM ver_{name}) AS DOUBLE)
                         / (SELECT COUNT(*) FROM pooled) END AS pooled_recall"""
        for name, n_bands, band_rows in names
    ]
    return (
        "WITH " + ",\n".join(blocks) + "\n"
        + " UNION ALL ".join(selects)
        + " ORDER BY n_bands"
    )


@register(
    "dedup_lsh_tuning",
    oracle=_lsh_tuning_oracle(),
    description="LSH banding tuning table: candidates/verified/precision/pooled-recall per (bands, rows) config",
)
def dedup_lsh_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engineering table behind the 4×4 banding choice: for each
    (bands, rows-per-band) split of the SAME 16 minhash permutations,
    how many candidate pairs the band join generates, how many
    survive exact-Jaccard verification, precision, and recall against
    the pooled verified set of all configs. More bands = higher
    recall + more verify compute; this is the knob a 100 TB dedup
    run tunes FIRST, measured instead of guessed.

    Scale: shingles and signatures are computed ONCE and persisted
    across all configs (the expensive part); each config re-bands the
    16-column signature row — a projection — and pays only its own
    candidate join + candidate-scoped verify. Output is
    |configs| rows.
    """
    from lime_etl_spark.operators.dedup import (
        JACCARD_TAU,
        MERSENNE_P,
        doc_shingles,
        jaccard_pairs,
    )
    from lime_etl_spark.functions.text import MINHASH_PERMS

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    aggs = [
        F.min((F.col("x") * a + b) % MERSENNE_P).alias(f"mh_{j}")
        for j, (a, b) in enumerate(MINHASH_PERMS)
    ]
    sigs = sh.groupBy("doc_id").agg(*aggs).persist()

    def candidates(n_bands: int, band_rows: int) -> DataFrame:
        band_structs = F.array(
            *[
                F.struct(
                    F.lit(band).alias("band"),
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"mh_{band * band_rows + r}")
                            for r in range(band_rows)
                        ],
                    ).alias("sig"),
                )
                for band in range(n_bands)
            ]
        )
        buckets = sigs.select("doc_id", F.explode(band_structs).alias("b")).select(
            "doc_id", F.col("b.band").alias("band"), F.col("b.sig").alias("sig")
        )
        a, b = buckets.alias("a"), buckets.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.sig") == F.col("b.sig"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )

    per_config = {}
    verified_frames = []
    for n_bands, band_rows in LSH_TUNING_CONFIGS:
        cand = candidates(n_bands, band_rows).persist()
        ver = (
            jaccard_pairs(sh, candidates=cand)
            .where(F.col("jaccard") >= JACCARD_TAU)
            .select("doc_a", "doc_b")
            .persist()
        )
        per_config[(n_bands, band_rows)] = (cand, ver)
        verified_frames.append(ver)
    pooled = verified_frames[0]
    for vf in verified_frames[1:]:
        pooled = pooled.unionByName(vf)
    pooled = pooled.distinct().persist()
    pooled_n = pooled.count()

    rows = []
    for (n_bands, band_rows), (cand, ver) in per_config.items():
        n_cand = cand.count()
        n_ver = ver.count()
        rows.append(
            (
                n_bands,
                band_rows,
                n_cand,
                n_ver,
                (n_ver / n_cand) if n_cand else 1.0,
                (n_ver / pooled_n) if pooled_n else 1.0,
            )
        )
    # counts are tiny driver-side scalars (|configs| rows) — assembling
    # the report frame from them is reporting, not data movement
    return spark.createDataFrame(
        rows,
        "n_bands int, rows_per_band int, n_candidates bigint,"
        " n_verified bigint, precision double, pooled_recall double",
    ).orderBy("n_bands")


# --- GFS retention plan ------------------------------------------------------

GFS_DAILY_DAYS = 7
GFS_WEEKLY_DAYS = 28
GFS_MONTHLY_DAYS = 365


@register(
    "etl_gfs_retention_plan",
    oracle=f"""
    WITH days AS (
        SELECT DISTINCT o_orderdate AS d FROM orders
    ), m AS (
        SELECT MAX(d) AS md FROM days
    ), tiered AS (
        SELECT d,
               CASE
                 WHEN date_diff('day', d, md) < {GFS_DAILY_DAYS} THEN 'daily'
                 WHEN date_diff('day', d, md) < {GFS_WEEKLY_DAYS}
                      AND strftime(d, '%a') = 'Mon' THEN 'weekly'
                 WHEN date_diff('day', d, md) < {GFS_MONTHLY_DAYS}
                      AND EXTRACT(day FROM d) = 1 THEN 'monthly'
                 ELSE 'expire'
               END AS tier
        FROM days CROSS JOIN m
    )
    SELECT tier,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           strftime(MIN(d), '%Y-%m-%d') AS oldest,
           strftime(MAX(d), '%Y-%m-%d') AS newest
    FROM tiered
    GROUP BY tier
    ORDER BY tier
    """,
    description="grandfather-father-son partition retention plan: keep dailies 7d, Monday weeklies 28d, month-firsts 365d, expire the rest",
)
def etl_gfs_retention_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention planning for a date-partitioned fact: classify every
    observed partition date into the grandfather-father-son ladder —
    keep all recent dailies, thin to Monday weeklies, then
    first-of-month monthlies, expire beyond the horizon. The 'expire'
    row is the partition-drop list (the cheap retention mechanism the
    date-partitioned ledger design exists for — deleting is a
    metadata operation, never a rewrite).

    Scale: the fact reduces to DISTINCT partition dates (calendar-
    bounded) before any logic; the anchor MAX date is a 1-row
    broadcast; classification is row-local date arithmetic using the
    cross-engine-safe forms (integer datediff, weekday NAME,
    day-of-month — never locale-dependent week numbers).
    """
    orders = load_table(spark, sf_dir, "orders")
    days = orders.select(F.col("o_orderdate").alias("d")).distinct()
    m = days.agg(F.max("d").alias("md"))
    age = F.datediff(F.col("md"), F.col("d"))
    tier = (
        F.when(age < GFS_DAILY_DAYS, "daily")
        .when(
            (age < GFS_WEEKLY_DAYS) & (F.date_format("d", "E") == "Mon"), "weekly"
        )
        .when(
            (age < GFS_MONTHLY_DAYS) & (F.dayofmonth("d") == 1), "monthly"
        )
        .otherwise("expire")
    )
    return (
        days.crossJoin(F.broadcast(m))
        .select("d", tier.alias("tier"))
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
            F.date_format(F.min("d"), "yyyy-MM-dd").alias("oldest"),
            F.date_format(F.max("d"), "yyyy-MM-dd").alias("newest"),
        )
        .orderBy("tier")
    )


# --- revenue concentration (HHI) --------------------------------------------


@register(
    "q_customer_concentration_hhi",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey
    ), nat AS (
        SELECT n.n_name AS nation,
               CAST(c2.cents AS DECIMAL(19,0)) AS cents
        FROM cust c2
        JOIN customer c ON c.c_custkey = c2.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    )
    SELECT nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(SUM(cents * cents) AS DOUBLE)
             / (CAST(SUM(cents) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE)) AS hhi
    FROM nat
    GROUP BY nation
    ORDER BY nation
    """,
    description="Herfindahl revenue-concentration index per nation (key-account risk), exact integer-cents squares",
)
def q_customer_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per nation as the Herfindahl–Hirschman
    index Σ shareᵢ² — the one number that says whether a market is a
    few key accounts (HHI→1) or a long tail (HHI→1/n). Complements
    q_revenue_deciles: deciles show the curve, HHI ranks markets.

    Scale: orders reduce to per-customer cents FIRST (customer-key
    shuffle with map-side combine); the nation attribution joins the
    customer and nation DIMS broadcast onto that reduced rollup. HHI
    needs Σx² — computed in exact integer cents lifted to
    decimal(19) so the squares sum losslessly in decimal(38) (cents²
    overflows int64 at whale-account scale); ONE double division at
    the end. No floats ever enter an aggregation.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cust = orders.groupBy("o_custkey").agg(
        (F.sum(dec("o_totalprice", 2, 12)) * 100)
        .cast("bigint")
        .alias("cents")
    )
    nat = (
        cust.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            cust.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.col("cents").cast("decimal(19,0)").alias("cents"))
    )
    sq = F.sum(F.col("cents") * F.col("cents"))
    tot = F.sum("cents")
    return (
        nat.groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            tot.cast("bigint").alias("total_cents"),
            (to_double(sq) / (to_double(tot) * to_double(tot))).alias("hhi"),
        )
        .orderBy("nation")
    )


# --- supply coverage ---------------------------------------------------------


@register(
    "q_supplier_part_coverage",
    oracle="""
    WITH sp AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), per_part AS (
        SELECT l_partkey, COUNT(*) AS n_suppliers FROM sp GROUP BY l_partkey
    )
    SELECT CAST(n_suppliers AS BIGINT) AS n_suppliers,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM per_part
    GROUP BY n_suppliers
    ORDER BY n_suppliers
    """,
    description="suppliers-per-part coverage histogram (the n_suppliers=1 bucket is single-source supply risk)",
)
def q_supplier_part_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain redundancy: how many suppliers have actually
    shipped each part, as a histogram — the n_suppliers=1 bucket is
    the single-source risk list procurement reviews first.

    Scale: the fact reduces to DISTINCT (part, supplier) edges FIRST
    (bounded by the bipartite edge set, not shipment count); two
    keyed counter rollups, histogram output bounded by the max
    supplier fan-in. All map-side combinable.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sp = li.select("l_partkey", "l_suppkey").distinct()
    per_part = sp.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_suppliers"))
    return (
        per_part.groupBy(F.col("n_suppliers").cast("bigint").alias("n_suppliers"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .orderBy("n_suppliers")
    )


# --- event-type mix drift ----------------------------------------------------


@register(
    "ev_type_mix_drift",
    oracle="""
    WITH wk AS (
        SELECT strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
               event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ), shared AS (
        SELECT week, event_type, n,
               CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY week) AS share
        FROM wk
    )
    SELECT week, event_type, n, share,
           share - LAG(share) OVER (PARTITION BY event_type ORDER BY week)
               AS share_delta
    FROM shared
    ORDER BY week, event_type
    """,
    description="weekly event-type mix shares + week-over-week share drift (composition-change monitor)",
)
def ev_type_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition drift: each event type's weekly share of traffic
    and its change versus the previous week — the monitor that
    catches instrumentation changes (a type vanishing) and product
    shifts (purchase share climbing) that total-volume alerting
    (ev_anomaly_zscore) is blind to.

    Scale: the fact reduces to the |weeks|×|types| counter rollup in
    one map-side-combining pass; BOTH windows (per-week share sum,
    per-type lag) run over that tiny rollup, never event grain.
    Shares are exact-int divisions; the delta is a single double
    subtraction of bit-identical shares.
    """
    ev = load_table(spark, sf_dir, "events")
    wk = ev.groupBy(
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    w_share = Window.partitionBy("week")
    w_lag = Window.partitionBy("event_type").orderBy("week")
    shared = wk.withColumn(
        "share", F.col("n").cast("double") / F.sum("n").over(w_share)
    )
    return shared.select(
        "week",
        "event_type",
        "n",
        "share",
        (F.col("share") - F.lag("share").over(w_lag)).alias("share_delta"),
    ).orderBy("week", "event_type")


# --- tokenizer fertility ----------------------------------------------------


def _fertility_oracle() -> str:
    from lime_etl_spark.operators.text import BPE_RE

    return f"""
    WITH per_doc AS (
        SELECT lang,
               length(text) AS n_chars_calc,
               len(regexp_extract_all(text, '{BPE_RE}')) AS n_tok,
               len(string_split(text, ' ')) AS n_words
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars_calc) AS BIGINT) AS total_chars,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars_calc) AS DOUBLE) / SUM(n_tok) AS chars_per_token,
           CAST(SUM(n_tok) AS DOUBLE) / SUM(n_words) AS tokens_per_word
    FROM per_doc
    GROUP BY lang
    ORDER BY lang
    """


@register(
    "cur_tokenizer_fertility",
    oracle=_fertility_oracle(),
    description="tokenizer fertility per language: chars/token + tokens/word (cost-per-language budgeting input)",
)
def cur_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — how many characters one
    token buys, and how many tokens a word costs. Languages the
    tokenizer serves badly (low chars/token, high tokens/word) pay
    more compute per unit of text; this table is the input to
    per-language token-budget corrections in samp_domain_budget /
    samp_temperature.

    Scale: shuffle-free row-local counting (regexp_count stays in
    codegen) reduced to |langs| rows of exact int64 sums; the two
    ratios are single IEEE divisions over those sums — aggregate
    ratios, NOT averages of per-doc ratios (which would weight tiny
    docs equally with huge ones and float-sum nondeterministically).
    """
    from lime_etl_spark.operators.text import BPE_RE
    from lime_etl_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        F.length("text").alias("n_chars_calc"),
        F.regexp_count("text", F.lit(BPE_RE)).alias("n_tok"),
        F.size(tokens()).alias("n_words"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars_calc").cast("bigint").alias("total_chars"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.sum("n_words").alias("total_words"),
        )
        .select(
            "lang",
            "n_docs",
            "total_chars",
            "total_tokens",
            (F.col("total_chars").cast("double") / F.col("total_tokens")).alias(
                "chars_per_token"
            ),
            (F.col("total_tokens").cast("double") / F.col("total_words")).alias(
                "tokens_per_word"
            ),
        )
        .orderBy("lang")
    )


# --- context-window fit profile ---------------------------------------------

CONTEXT_WINDOWS = (512, 2048, 8192, 32768)


def _context_fit_oracle() -> str:
    from lime_etl_spark.operators.text import BPE_RE

    n_tok = f"len(regexp_extract_all(text, '{BPE_RE}'))"
    fits = ",\n           ".join(
        f"CAST(COUNT(*) FILTER (WHERE {n_tok} <= {w}) AS BIGINT) AS fit_{w}"
        for w in CONTEXT_WINDOWS
    )
    return f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           {fits}
    FROM documents
    GROUP BY source
    ORDER BY source
    """


@register(
    "txt_context_fit",
    oracle=_context_fit_oracle(),
    description="per-source share of docs fitting each context window (truncation-loss forecast before packing)",
)
def txt_context_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of each source fits whole into each training context
    window — the truncation-loss forecast that decides between
    pad-to-window, concat-packing (pack_sequences) and long-context
    upsampling BEFORE any data is moved.

    Scale: row-local token count (codegen regexp) + cumulative
    conditional counters in ONE shuffle-free pass per source; output
    is |sources| rows × |windows| counters. Counts are monotone in
    the window size by construction (pytest-gated).
    """
    from lime_etl_spark.operators.text import BPE_RE

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.regexp_count("text", F.lit(BPE_RE))
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_docs")] + [
        F.sum(F.when(n_tok <= w, 1).otherwise(0)).cast("bigint").alias(f"fit_{w}")
        for w in CONTEXT_WINDOWS
    ]
    return docs.groupBy("source").agg(*aggs).orderBy("source")


# --- dedup funnel ------------------------------------------------------------


def _dedup_funnel_oracle() -> str:
    from lime_etl_spark.operators.dedup import _minhash_sql, _normalized_sql

    return f"""
    WITH RECURSIVE
    pairs AS (
        SELECT doc_a, doc_b FROM ({_minhash_sql()})
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(vid, lab) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.vid
    ),
    comp AS (
        SELECT vid AS doc_id, CAST(MIN(lab) AS BIGINT) AS component_id
        FROM reach GROUP BY vid
    ),
    raw AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM documents
    ),
    exact AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(kc) AS BIGINT) AS n_chars
        FROM (SELECT arg_min(n_chars, doc_id) AS kc
              FROM documents GROUP BY md5(text))
    ),
    norm AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(kc) AS BIGINT) AS n_chars
        FROM (SELECT arg_min(n_chars, doc_id) AS kc
              FROM documents GROUP BY md5({_normalized_sql("text")}))
    ),
    near AS (
        SELECT CAST(COUNT(DISTINCT c.component_id) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN d.doc_id = c.component_id
                             THEN d.n_chars ELSE 0 END) AS BIGINT) AS n_chars
        FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    ),
    funnel AS (
        SELECT 0 AS stage_ord, 'raw' AS stage, n_docs, n_chars FROM raw
        UNION ALL SELECT 1, 'exact_dedup', n_docs, n_chars FROM exact
        UNION ALL SELECT 2, 'normalized_dedup', n_docs, n_chars FROM norm
        UNION ALL SELECT 3, 'near_dup_collapse', n_docs, n_chars FROM near
    )
    SELECT f.stage_ord, f.stage, f.n_docs, f.n_chars,
           CAST(f.n_docs AS DOUBLE) / r.n_docs AS docs_kept_share,
           CAST(f.n_chars AS DOUBLE) / r.n_chars AS chars_kept_share
    FROM funnel f CROSS JOIN raw r
    ORDER BY stage_ord
    """


@register(
    "cur_dedup_funnel",
    oracle=_dedup_funnel_oracle(),
    description="end-to-end dedup funnel: raw → exact → normalized-exact → near-dup collapse, docs/chars kept at each stage",
)
def cur_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-table answer to 'what does each dedup stage buy us':
    corpus size in docs and characters after (1) raw-byte exact
    dedup, (2) normalize-then-hash dedup, (3) near-dup cluster
    collapse — each stage keeping the min-id representative. The
    stages are strictly coarser equivalences, so the funnel is
    monotone (pytest-gated); the deltas between rows are each
    stage's marginal payoff, which is exactly the number a curation
    team budgets against.

    Scale: the two hash stages are counters-only groupBys with
    min_by keeping the representative's chars WITHOUT a rejoin; the
    near stage rides the shared LSH→CC pipeline. Shares are computed
    against the 1-row raw total (broadcast cross join).
    """
    from lime_etl_spark.operators.dedup import (
        JACCARD_TAU,
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
        normalized_text,
    )
    from lime_etl_spark.operators.graph import connected_components

    # NO spread here (r10 revert of the r9 spread-before-persist): the
    # driver's r9 heavy section read it 1.28x SLOWER and the r10
    # interleaved A/B confirms (spread-on 3.77 s vs spread-off 3.23 s
    # median of 5) — caching 32 shuffled partitions of full document
    # text costs more than the single-task hash stages it parallelizes
    # (guide §2.3: don't shuffle payloads to parallelize cheap work).
    docs = load_table(spark, sf_dir, "documents").persist()

    def hash_stage(key: F.Column, ord_: int, name: str) -> DataFrame:
        return (
            docs.groupBy(key.alias("h"))
            .agg(F.min_by("n_chars", "doc_id").alias("kc"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("kc").cast("bigint").alias("n_chars"),
            )
            .select(
                F.lit(ord_).alias("stage_ord"),
                F.lit(name).alias("stage"),
                "n_docs",
                "n_chars",
            )
        )

    raw = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    ).select(
        F.lit(0).alias("stage_ord"), F.lit("raw").alias("stage"), "n_docs", "n_chars"
    )
    exact = hash_stage(F.md5("text"), 1, "exact_dedup")
    norm = hash_stage(F.md5(normalized_text(F.col("text"))), 2, "normalized_dedup")

    sh = doc_shingles(docs).persist()
    lsh_pairs = jaccard_pairs(
        sh, candidates=lsh_candidates(minhash_signatures(sh))
    ).where(F.col("jaccard") >= JACCARD_TAU)
    edges = lsh_pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    cc = connected_components(docs.select(F.col("doc_id").alias("vid")), edges)
    sh.unpersist()
    near = (
        cc.join(docs.select(F.col("doc_id").alias("vid"), "n_chars"), "vid")
        .agg(
            F.count_distinct("label").cast("bigint").alias("n_docs"),
            F.sum(
                F.when(F.col("vid") == F.col("label"), F.col("n_chars")).otherwise(0)
            )
            .cast("bigint")
            .alias("n_chars"),
        )
        .select(
            F.lit(3).alias("stage_ord"),
            F.lit("near_dup_collapse").alias("stage"),
            "n_docs",
            "n_chars",
        )
    )
    funnel = raw.unionByName(exact).unionByName(norm).unionByName(near)
    raw_tot = raw.select(
        F.col("n_docs").alias("r_docs"), F.col("n_chars").alias("r_chars")
    )
    return (
        funnel.crossJoin(F.broadcast(raw_tot))
        .select(
            "stage_ord",
            "stage",
            "n_docs",
            "n_chars",
            (F.col("n_docs").cast("double") / F.col("r_docs")).alias(
                "docs_kept_share"
            ),
            (F.col("n_chars").cast("double") / F.col("r_chars")).alias(
                "chars_kept_share"
            ),
        )
        .orderBy("stage_ord")
    )


# --- rolling retention curve -------------------------------------------------

RETENTION_OFFSETS = (1, 7, 14, 28)


@register(
    "ev_retention_curve",
    oracle=f"""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), maxd AS (
        SELECT MAX(d) AS md FROM ud
    ), expanded AS (
        SELECT u.user_id, u.d, k.k, u.d + k.k * INTERVAL 1 DAY AS target_d
        FROM ud u
        CROSS JOIN (VALUES {", ".join(f"({k})" for k in RETENTION_OFFSETS)}) AS k(k)
    )
    SELECT e.k AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_base,
           CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_retained,
           CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS retention
    FROM expanded e
    CROSS JOIN maxd m
    LEFT JOIN ud b ON b.user_id = e.user_id AND b.d = e.target_d
    WHERE e.target_d <= m.md
    GROUP BY e.k
    ORDER BY day_offset
    """,
    description="rolling dN retention curve (d1/d7/d14/d28): right-censored denominator, bounded ×4 explode of distinct user-days",
)
def ev_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased rolling retention: of all user-days, what share saw
    the user return exactly k days later, for k ∈ {1,7,14,28} — the
    curve every growth team tracks. The denominator drops user-days
    whose d+k falls past the observation window (right-censoring),
    so the tail offsets aren't artificially deflated.

    Scale: the fact reduces to DISTINCT (user, day) FIRST; the ×4
    offset explode is a bounded fan-out of that reduced set, and the
    retention probe is ONE equi-join on (user, target_day) — hash
    join, never a range join. Max date is a 1-row broadcast. Output
    is |offsets| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct().persist()
    maxd = ud.agg(F.max("d").alias("md"))
    offsets = F.array(*[F.lit(k) for k in RETENTION_OFFSETS])
    expanded = ud.select(
        "user_id", "d", F.explode(offsets).alias("k")
    ).withColumn("target_d", F.date_add(F.col("d"), F.col("k")))
    b = ud.select(F.col("user_id").alias("b_user"), F.col("d").alias("b_d"))
    probed = (
        expanded.crossJoin(F.broadcast(maxd))
        .where(F.col("target_d") <= F.col("md"))
        .join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("target_d") == F.col("b_d")),
            "left",
        )
    )
    return (
        probed.groupBy(F.col("k").alias("day_offset"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_base"),
            F.sum(F.when(F.col("b_user").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_retained"),
        )
        .select(
            "day_offset",
            "n_base",
            "n_retained",
            (F.col("n_retained").cast("double") / F.col("n_base")).alias("retention"),
        )
        .orderBy("day_offset")
    )


# --- per-file layout stats ---------------------------------------------------

SMALL_FILE_MB = 16


def file_stats(df: DataFrame) -> DataFrame:
    """Per-file layout profile of any file-backed DataFrame via the
    ``_metadata`` hidden column: rows, bytes, rows/MB, and a
    small-file flag — the audit that decides WHAT compact_parquet
    should rewrite (streaming sinks and over-parallel writers leave
    thousands of KB-files; at 100 TB the fix is a partition rewrite,
    and this table names the partitions).

    Scale: `_metadata.file_path/file_size` are constant per split —
    the rollup combines map-side to |files| rows and never widens the
    scan (file metadata rides the task context, no extra IO).
    """
    return (
        df.select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.file_size").alias("file_bytes"),
        )
        .groupBy("file_path", "file_bytes")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "file_path",
            "file_bytes",
            "n_rows",
            (F.col("file_bytes") < SMALL_FILE_MB * 1024 * 1024).alias("is_small"),
        )
    )


@register(
    "dq_file_stats",
    oracle=None,  # _metadata is a Spark scan-level column; DuckDB's
    # filename option can't reach the pre-registered oracle views —
    # pytest checks exact counts against os.stat instead
    description="per-file rows/bytes layout audit via the _metadata hidden column (names the compaction targets)",
)
def dq_file_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layout audit of the fact tables: one row per physical parquet
    file with row count, byte size and a small-file flag (see
    :func:`file_stats`). Summarized per table so output stays
    |tables|-bounded regardless of file count."""
    out = None
    for tbl in ("lineitem", "orders", "events"):
        st = file_stats(load_table(spark, sf_dir, tbl)).agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_rows").alias("n_rows"),
            F.sum("file_bytes").alias("total_bytes"),
            F.sum(F.when(F.col("is_small"), 1).otherwise(0)).alias("n_small_files"),
        ).select(F.lit(tbl).alias("tbl"), "n_files", "n_rows", "total_bytes", "n_small_files")
        out = st if out is None else out.unionByName(st)
    return out.orderBy("tbl")


# --- duplication-aware sampling --------------------------------------------

DEDUP_W_SCALE = 1000


def _dedup_weighted_oracle() -> str:
    return f"""
    WITH RECURSIVE
    pairs AS (
        SELECT doc_a, doc_b FROM ({_minhash_sql()})
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach(vid, lab) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.vid
    ),
    comp AS (
        SELECT vid AS doc_id, CAST(MIN(lab) AS BIGINT) AS component_id
        FROM reach GROUP BY vid
    ),
    sized AS (
        SELECT doc_id, component_id,
               COUNT(*) OVER (PARTITION BY component_id) AS multiplicity
        FROM comp
    )
    SELECT CAST(multiplicity AS BIGINT) AS multiplicity,
           CAST(COUNT(DISTINCT component_id) AS BIGINT) AS n_clusters,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (
               WHERE {_bucket_sql("doc_id", DEDUP_W_SCALE)} * multiplicity
                     < {DEDUP_W_SCALE}
           ) AS BIGINT) AS n_kept
    FROM sized
    GROUP BY multiplicity
    ORDER BY multiplicity
    """


@register(
    "samp_dedup_weighted",
    oracle=_dedup_weighted_oracle(),
    description="duplication-aware downsampling: keep-prob 1/cluster-size via md5 bucket (soft dedup, expectation-uniform per cluster)",
)
def samp_dedup_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup for training mixtures: instead of hard-collapsing
    each near-dup cluster to one representative, every member keeps
    survival probability 1/cluster_size — in expectation each cluster
    contributes exactly one doc, but the draw stays diverse across
    reruns of the corpus (different members survive in different
    shards) and no popularity signal is destroyed. The keep decision
    is bucket(doc_id)·multiplicity < SCALE — an exact integer
    cross-multiply of the md5 bucket, rerun- and engine-stable.

    Scale: rides the same candidate-scoped LSH→verify→CC pipeline as
    cur_cluster_dedup_weights; multiplicity is ONE count-window over
    the CC labels (label shuffle, cluster-sized groups), the keep
    flag is row-local, and the report rolls up to |distinct
    multiplicities| rows.
    """
    from lime_etl_spark.operators.dedup import (
        JACCARD_TAU,
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )
    from lime_etl_spark.operators.graph import connected_components
    from lime_etl_spark.operators.training import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    pairs = jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh))).where(
        F.col("jaccard") >= JACCARD_TAU
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    cc = connected_components(docs.select(F.col("doc_id").alias("vid")), edges)
    sh.unpersist()
    sized = cc.withColumn(
        "multiplicity", F.count(F.lit(1)).over(Window.partitionBy("label"))
    )
    keep = (
        hash_bucket(F.col("vid"), DEDUP_W_SCALE) * F.col("multiplicity")
        < DEDUP_W_SCALE
    )
    return (
        sized.groupBy(F.col("multiplicity").cast("bigint").alias("multiplicity"))
        .agg(
            F.count_distinct("label").alias("n_clusters"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(keep.cast("bigint")).alias("n_kept"),
        )
        .orderBy("multiplicity")
    )


# --- per-column cardinality profile ----------------------------------------

_CARD_TABLES: dict[str, tuple[str, ...]] = {
    "customer": ("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "orders": (
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ),
    "part": ("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
}


def _cardinality_oracle() -> str:
    legs = []
    for tbl, cols in _CARD_TABLES.items():
        for c in cols:
            legs.append(
                f"SELECT '{tbl}' AS tbl, '{c}' AS col,"
                f" COUNT(*) AS n_rows, COUNT(DISTINCT {c}) AS n_distinct"
                f" FROM {tbl}"
            )
    union = "\n    UNION ALL ".join(legs)
    return f"""
    SELECT tbl, col, n_rows, n_distinct,
           CAST(n_distinct AS DOUBLE) / n_rows AS uniqueness
    FROM ({union})
    ORDER BY tbl, col
    """


@register(
    "dq_cardinality_profile",
    oracle=_cardinality_oracle(),
    description="per-column distinct-count profile (join/broadcast planning input; approx_count_distinct = 100 TB path)",
)
def dq_cardinality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count and uniqueness ratio for every column of
    the keyed tables — the statistic that decides broadcast vs
    shuffle joins, bucketing keys, and dictionary-encoding wins, and
    the companion to dq_candidate_keys (which checks only DECLARED
    keys; this surfaces undeclared near-unique columns).

    Scale: one aggregate per table computes all its distinct counts
    in a single pass (Catalyst expands to one Expand node ×|cols| —
    the documented trade; at 100 TB swap count_distinct for
    approx_count_distinct and the Expand collapses into mergeable HLL
    partials, see dq_sketch_accuracy for the measured ≤5% error).
    The wide row stack()-unpivots to (table, column) grain; output is
    Σ|cols| rows.
    """
    frames = []
    for tbl, cols in _CARD_TABLES.items():
        df = load_table(spark, sf_dir, tbl)
        wide = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.count_distinct(F.col(c)).alias(f"d_{c}") for c in cols],
        )
        stack_args = ", ".join(f"'{c}', d_{c}" for c in cols)
        frames.append(
            wide.select(
                F.lit(tbl).alias("tbl"),
                F.expr(
                    f"stack({len(cols)}, {stack_args}) AS (col, n_distinct)"
                ),
                "n_rows",
            )
        )
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out.select(
        "tbl",
        "col",
        "n_rows",
        "n_distinct",
        (F.col("n_distinct").cast("double") / F.col("n_rows")).alias("uniqueness"),
    ).orderBy("tbl", "col")


# --- difference-in-differences -----------------------------------------------

DID_CUTOVER = "2024-01-16"  # deterministic mid-period "intervention" date


@register(
    "ev_diff_in_diff",
    oracle=f"""
    WITH cells AS (
        SELECT CASE WHEN {_bucket_sql("user_id", 2)} = 0 THEN 'control'
                    ELSE 'treatment' END AS arm,
               CASE WHEN CAST(ts AS DATE) < DATE '{DID_CUTOVER}' THEN 'pre'
                    ELSE 'post' END AS period,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END)
                    AS DECIMAL(38,2)) AS revenue
        FROM events GROUP BY 1, 2
    ),
    wide AS (
        SELECT arm,
               MAX(CASE WHEN period = 'pre' THEN n_users END) AS pre_users,
               MAX(CASE WHEN period = 'post' THEN n_users END) AS post_users,
               MAX(CASE WHEN period = 'pre' THEN revenue END) AS pre_rev,
               MAX(CASE WHEN period = 'post' THEN revenue END) AS post_rev
        FROM cells GROUP BY arm
    )
    SELECT arm,
           CAST(pre_users AS BIGINT) AS pre_users,
           CAST(post_users AS BIGINT) AS post_users,
           CAST(pre_rev AS DOUBLE) / pre_users AS pre_rev_per_user,
           CAST(post_rev AS DOUBLE) / post_users AS post_rev_per_user,
           CAST(post_rev AS DOUBLE) / post_users
             - CAST(pre_rev AS DOUBLE) / pre_users AS delta
    FROM wide ORDER BY arm
    """,
    description="difference-in-differences table: per-arm pre/post revenue-per-user deltas around a deterministic cutover",
)
def ev_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The causal-analytics primitive the experimentation family was
    missing: difference-in-differences around a cutover date. Users
    hash-split into arms (the ev_ab_assignment_aa assignment), the
    period split at the deterministic mid-window cutover; per
    (arm, period) cell — users and decimal-exact purchase revenue —
    then per-arm pre/post revenue-per-user deltas. The DiD estimate
    is delta(treatment) − delta(control), readable off the two output
    rows; on untreated data the estimate is sampling noise bounded by
    the revenue-per-user scale (pytest-gated sanity — tight parallel
    trends is a large-sample property the sf0.01 fixture can't
    assert), which is the baseline that makes the table readable when
    a real intervention lands.

    Scale: one fact scan into a 4-cell decimal reduce; everything
    after is arithmetic on a 2-row frame. Revenue accumulates in
    decimal (exact, order-free), converted to double only in the
    final per-user divisions (one division per value — IEEE-exact
    both engines)."""
    from lime_etl_spark.operators.training import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    arm = F.when(hash_bucket(F.col("user_id"), 2) == 0, "control").otherwise(
        "treatment"
    )
    period = F.when(
        F.col("ts").cast("date") < F.lit(DID_CUTOVER).cast("date"), "pre"
    ).otherwise("post")
    cells = ev.groupBy(arm.alias("arm"), period.alias("period")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase", dec("value", 2, 18)
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        )
        .cast("decimal(38,2)")
        .alias("revenue"),
    )
    wide = cells.groupBy("arm").agg(
        F.max(F.when(F.col("period") == "pre", F.col("n_users"))).alias("pre_users"),
        F.max(F.when(F.col("period") == "post", F.col("n_users"))).alias("post_users"),
        F.max(F.when(F.col("period") == "pre", F.col("revenue"))).alias("pre_rev"),
        F.max(F.when(F.col("period") == "post", F.col("revenue"))).alias("post_rev"),
    )
    pre_rpu = F.col("pre_rev").cast("double") / F.col("pre_users")
    post_rpu = F.col("post_rev").cast("double") / F.col("post_users")
    return wide.select(
        "arm",
        F.col("pre_users").cast("bigint").alias("pre_users"),
        F.col("post_users").cast("bigint").alias("post_users"),
        pre_rpu.alias("pre_rev_per_user"),
        post_rpu.alias("post_rev_per_user"),
        (post_rpu - pre_rpu).alias("delta"),
    ).orderBy("arm")
