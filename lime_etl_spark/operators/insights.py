"""Cross-family analytics added in round 3: streaks (gaps-and-islands),
inter-arrival latency, header/detail reconciliation, near-dup graph
degree profile, cross-source vocabulary overlap, radius similarity
search, padding-waste bucketing, session-depth distribution.

lime-etl analog: these are the recurring report/test jobs a BatchSpec
schedules nightly (`/root/reference/lime_etl/domain/job_spec.py:40` —
`run()` produces a table, `test()` asserts its invariants); here each
is a first-class DataFrame operator with a DuckDB oracle.

Shared determinism rules (see operators/events.py, profiling.py):
integer-microsecond time arithmetic, decimal-cast money before SUM,
CASE-ladder bucketing instead of log2/log10, shares as one IEEE
division over exact integers, bounded outputs (histograms / |types|² /
|sources|² rows) so every ORDER BY sorts a handful of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lime_etl_spark.functions.numeric import dec, to_double
from lime_etl_spark.operators.dedup import (
    JACCARD_TAU,
    _minhash_sql,
    doc_shingles,
    jaccard_pairs,
    lsh_candidates,
    minhash_signatures,
)
from lime_etl_spark.operators.events import SESSION_GAP_US, sessionize
from lime_etl_spark.operators.similarity import QUERY_MOD_SQL, _COS_SQL, dot, query_mod
from lime_etl_spark.plans.registry import register
from lime_etl_spark.sources.readers import load_table

# --- activity streaks (gaps-and-islands) -----------------------------------


@register(
    "ev_active_streaks",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), flagged AS (
        SELECT user_id, d,
               CASE WHEN LAG(d) OVER w IS NULL
                         OR date_diff('day', LAG(d) OVER w, d) > 1
                    THEN 1 ELSE 0 END AS new_streak
        FROM days
        WINDOW w AS (PARTITION BY user_id ORDER BY d)
    ), islands AS (
        SELECT user_id, d,
               SUM(new_streak) OVER (PARTITION BY user_id ORDER BY d
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS streak_id
        FROM flagged
    ), per_user AS (
        SELECT user_id, MAX(len) AS max_streak_days
        FROM (SELECT user_id, streak_id, COUNT(*) AS len
              FROM islands GROUP BY user_id, streak_id)
        GROUP BY user_id
    )
    SELECT CAST(max_streak_days AS BIGINT) AS max_streak_days,
           COUNT(*) AS n_users
    FROM per_user
    GROUP BY max_streak_days
    ORDER BY max_streak_days
    """,
    description="longest consecutive-active-day streak per user (gaps-and-islands) → streak-length histogram",
)
def ev_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, rolled up to
    a streak-length histogram (the engagement 'habit' metric).

    Classic gaps-and-islands: reduce the fact to DISTINCT (user, day)
    FIRST (bounds everything after at user-days, not events), then
    lag→flag→cumsum island ids. All three window passes and the
    per-user rollup ride ONE user_id shuffle; the histogram output is
    bounded by the calendar span, so the final sort is a handful of
    rows. datediff on DATE (integer days) — no timezone/epoch float.
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    flagged = days.withColumn(
        "new_streak",
        F.when(
            F.lag("d").over(w).isNull()
            | (F.datediff(F.col("d"), F.lag("d").over(w)) > 1),
            1,
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "streak_id",
        F.sum("new_streak").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_user = (
        islands.groupBy("user_id", "streak_id")
        .agg(F.count(F.lit(1)).alias("len"))
        .groupBy("user_id")
        .agg(F.max("len").cast("bigint").alias("max_streak_days"))
    )
    return (
        per_user.groupBy("max_streak_days")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("max_streak_days")
    )


# --- inter-arrival latency --------------------------------------------------


@register(
    "ev_inter_arrival",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               epoch_us(ts) - LAG(epoch_us(ts))
                   OVER (PARTITION BY user_id, event_type
                         ORDER BY epoch_us(ts), event_id) AS gap_us
        FROM events
    )
    SELECT event_type,
           COUNT(gap_us) AS n_gaps,
           MIN(gap_us) AS min_us,
           CAST(FLOOR(quantile_cont(gap_us, 0.5)) AS BIGINT) AS p50_us,
           CAST(FLOOR(quantile_cont(gap_us, 0.95)) AS BIGINT) AS p95_us,
           MAX(gap_us) AS max_us
    FROM gaps
    WHERE gap_us IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
    description="per-(user,type) inter-arrival gap distribution per event type (integer-µs exact percentiles)",
)
def ev_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How often does the same user repeat each action? Per-user
    inter-arrival gaps per event type, aggregated to per-type
    min/p50/p95/max — the cadence profile behind refresh-interval
    tuning (lime-etl's min_seconds_between_refreshes made data-driven).

    One (user_id, event_type) window shuffle produces the lags; the
    percentile reduce groups to |types| rows. Gaps are integer
    microseconds — exact interpolated percentiles over integers are
    cross-engine stable (same (1-f)a+fb form both engines).
    approx_percentile is the documented 100 TB swap-in.
    """
    ev = load_table(spark, sf_dir, "events")
    ts = F.unix_micros("ts")
    w = Window.partitionBy("user_id", "event_type").orderBy(ts, "event_id")
    gaps = ev.select(
        "event_type", (ts - F.lag(ts).over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    pct = F.expr("percentile(gap_us, array(0.5, 0.95))")
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_us").alias("min_us"),
            F.floor(pct.getItem(0)).cast("bigint").alias("p50_us"),
            F.floor(pct.getItem(1)).cast("bigint").alias("p95_us"),
            F.max("gap_us").alias("max_us"),
        )
        .orderBy("event_type")
    )


# --- header/detail reconciliation -------------------------------------------


@register(
    "dq_order_reconcile",
    oracle="""
    WITH lines AS (
        SELECT l_orderkey,
               COUNT(*) AS n_lines,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS lines_gross
        FROM lineitem
        GROUP BY l_orderkey
    )
    SELECT o.o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_childless,
           CAST(SUM(CASE WHEN l.lines_gross IS NOT NULL
                              AND CAST(o.o_totalprice AS DECIMAL(12,2)) > l.lines_gross
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_header_exceeds_gross,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS header_total,
           CAST(SUM(COALESCE(l.lines_gross, CAST(0 AS DECIMAL(12,2)))) AS DOUBLE) AS lines_total
    FROM orders o LEFT JOIN lines l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    ORDER BY o.o_orderstatus
    """,
    description="header-vs-detail money reconciliation: childless orders, header>gross anomalies, decimal-exact totals per status",
)
def dq_order_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic header/detail reconciliation test: per order status,
    orders with no lineitems, orders whose header total exceeds the
    gross lineitem sum (can't happen if the header is derived from the
    lines), and the two decimal-exact money totals side by side. This
    is the `test()` every lime-etl load of an order feed hand-writes
    (reference e2e `tests/e2e/test_runner.py` asserts row presence) —
    here it's one operator.

    Scale: lineitem pre-aggregates to one row per order BEFORE the
    join (map-side partial sums), so the join is order-grain × order-
    grain on the natural key both sides already hash by; output is
    |statuses| rows. Money stays decimal(12,2)-exact through every
    aggregation; only the final surfaced totals cast to double (the
    engine-portable output convention — see dq_checksum_parity).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(dec("l_extendedprice", 2, 12)).alias("lines_gross"),
    )
    j = orders.join(lines, orders.o_orderkey == lines.l_orderkey, "left")
    return (
        j.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_childless"),
            F.sum(
                F.when(
                    F.col("lines_gross").isNotNull()
                    & (dec("o_totalprice", 2, 12) > F.col("lines_gross")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_header_exceeds_gross"),
            F.sum(dec("o_totalprice", 2, 12)).cast("double").alias("header_total"),
            F.sum(
                F.coalesce(
                    F.col("lines_gross"), F.lit(0).cast("decimal(12,2)")
                )
            )
            .cast("double")
            .alias("lines_total"),
        )
        .orderBy("o_orderstatus")
    )


# --- near-dup graph degree profile ------------------------------------------


@register(
    "graph_degree_distribution",
    oracle=f"""
    WITH pairs AS (
        SELECT doc_a, doc_b FROM ({_minhash_sql()})
    ), deg AS (
        SELECT vid, COUNT(*) AS degree FROM (
            SELECT doc_a AS vid FROM pairs
            UNION ALL
            SELECT doc_b AS vid FROM pairs
        ) GROUP BY vid
    )
    SELECT CAST(degree AS BIGINT) AS degree, COUNT(*) AS n_docs
    FROM deg
    GROUP BY degree
    ORDER BY degree
    """,
    description="near-dup graph degree histogram (hub-doc early warning for the CC/LP passes)",
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the LSH-verified near-dup graph — the
    pre-flight for every graph pass: a heavy tail (one doc paired with
    thousands) predicts a hot vertex in connected components / label
    propagation BEFORE the iteration runs, the same way dq_join_skew
    predicts a hot join key. Boilerplate hubs found here are what
    cur_boilerplate_lines strips.

    Scale: both UNION legs read the persisted pair table (computed
    once); degree and histogram are counters-only groupBys, output
    bounded by max degree.
    """
    sh = doc_shingles(load_table(spark, sf_dir, "documents")).persist()
    pairs = (
        jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh)))
        .where(F.col("jaccard") >= JACCARD_TAU)
        .select("doc_a", "doc_b")
        .persist()
    )
    pairs.count()  # materialize before the self-union reads it twice
    deg = (
        pairs.select(F.col("doc_a").alias("vid"))
        .unionAll(pairs.select(F.col("doc_b").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("degree")
    )


# --- cross-source vocabulary overlap ----------------------------------------


@register(
    "txt_vocab_overlap",
    oracle="""
    WITH vocab AS (
        SELECT DISTINCT source, word
        FROM (
            SELECT source, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
            FROM documents
        )
        WHERE word <> ''
    ), sizes AS (
        SELECT source, COUNT(*) AS n_words FROM vocab GROUP BY source
    ), inter AS (
        SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
        FROM vocab a JOIN vocab b ON a.word = b.word AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT i.source_a, i.source_b, i.n_common,
           sa.n_words AS n_words_a, sb.n_words AS n_words_b,
           CAST(i.n_common AS DOUBLE)
               / (sa.n_words + sb.n_words - i.n_common) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    ORDER BY source_a, source_b
    """,
    description="pairwise source vocabulary Jaccard (domain-similarity input for mixture weighting)",
)
def txt_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Jaccard between every source pair — the domain-
    similarity signal mixture weighting (samp_temperature /
    samp_domain_budget) consumes: near-identical vocabularies mean two
    'sources' are one domain and their budgets should be considered
    jointly.

    Scale: the corpus reduces to DISTINCT (source, word) FIRST — the
    self-join fans out per shared WORD across source pairs, bounded by
    |sources|² output groups, never doc×doc; sizes join onto the
    |sources|²-row rollup. Tokenizer is lowercase + split on runs of
    non-[a-z0-9] — the normalized-word convention the dedup shingle
    family uses, so 'vocabulary' means the same thing there.
    """
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            "source",
            F.explode(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+")
            ).alias("word"),
        )
        .where(F.col("word") != "")
        .distinct()
        .persist()
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("n_words"))
    a = vocab.alias("a")
    b = vocab.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("n_words").alias("n_words_a")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("n_words").alias("n_words_b")
    )
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_common",
            "n_words_a",
            "n_words_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_words_a") + F.col("n_words_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


# --- radius similarity search -----------------------------------------------

RANGE_TAU = 0.8


@register(
    "ann_range_search",
    oracle=f"""
    SELECT q.vec_id AS q_vec_id,
           CAST(SUM(CASE WHEN {_COS_SQL} >= {RANGE_TAU} THEN 1 ELSE 0 END) AS BIGINT) AS n_in_range,
           MAX(CASE WHEN {_COS_SQL} >= {RANGE_TAU} THEN {_COS_SQL} END) AS best_cosine
    FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id
    WHERE q.vec_id % {QUERY_MOD_SQL} = 0
    GROUP BY q.vec_id
    ORDER BY q_vec_id
    """,
    description="radius (cosine≥τ) neighborhood size per query vector — the density probe beside top-k",
)
def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range search: how many corpus vectors sit within cosine ≥ τ of
    each query, plus the best in-range cosine. Top-k answers 'who is
    closest'; range search answers 'how crowded is this region' — the
    duplicate-risk / cluster-density probe over embeddings.

    Scale: queries broadcast (Q ≪ N), corpus side streams — one pass,
    no shuffle of the corpus; per-query counters aggregate map-side.
    Norms are precomputed per vector (not per pair), so each pair
    costs one dot product; MAX over per-pair doubles is order-safe
    (no float-sum nondeterminism — we count and MAX, never SUM sims).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.where(F.col("vec_id") % query_mod(emb) == 0)
        .select("vec_id", "embedding")
        .withColumn("norm", F.sqrt(dot(F.col("embedding"), F.col("embedding"))))
        .alias("q")
    )
    v = (
        emb.select("vec_id", "embedding")
        .withColumn("norm", F.sqrt(dot(F.col("embedding"), F.col("embedding"))))
        .alias("v")
    )
    cos = dot(F.col("q.embedding"), F.col("v.embedding")) / (
        F.col("q.norm") * F.col("v.norm")
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(v)
        .where(F.col("q.vec_id") != F.col("v.vec_id"))
        .select(F.col("q.vec_id").alias("q_vec_id"), cos.alias("cosine"))
    )
    return (
        pairs.groupBy("q_vec_id")
        .agg(
            F.sum(F.when(F.col("cosine") >= RANGE_TAU, 1).otherwise(0))
            .cast("bigint")
            .alias("n_in_range"),
            F.max(
                F.when(F.col("cosine") >= RANGE_TAU, F.col("cosine"))
            ).alias("best_cosine"),
        )
        .orderBy("q_vec_id")
    )


# --- padding-waste length buckets -------------------------------------------

# power-of-2 sequence-length caps a training loader batches by
_LEN_CAPS = [64, 128, 256, 512, 1024, 2048, 4096]


def _len_bucket(tokens: F.Column) -> F.Column:
    """Smallest power-of-2 cap ≥ token count — CASE ladder, no log2
    (float log at exact powers of two rounds differently per engine)."""
    expr = F.when(tokens <= _LEN_CAPS[0], _LEN_CAPS[0])
    for cap in _LEN_CAPS[1:]:
        expr = expr.when(tokens <= cap, cap)
    return expr.otherwise(F.lit(None).cast("int"))


def _len_bucket_sql(expr: str) -> str:
    cases = " ".join(
        f"WHEN {expr} <= {cap} THEN {cap}" for cap in _LEN_CAPS
    )
    return f"CASE {cases} ELSE NULL END"


@register(
    "pack_length_buckets",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
        FROM documents
        WHERE trim(text) <> ''
    )
    SELECT CAST({_len_bucket_sql("n_tokens")} AS INT) AS bucket_cap,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(SUM({_len_bucket_sql("n_tokens")} - n_tokens) AS BIGINT) AS padding_tokens,
           CAST(SUM(n_tokens) AS DOUBLE)
               / SUM({_len_bucket_sql("n_tokens")}) AS fill_ratio
    FROM toks
    WHERE {_len_bucket_sql("n_tokens")} IS NOT NULL
    GROUP BY 1
    ORDER BY bucket_cap
    """,
    description="power-of-2 length-bucket padding-waste profile (the batch-shape report behind pack_sequences)",
)
def pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-shape batching profile: docs bucketed to the smallest
    power-of-2 sequence cap, with total real tokens, padding tokens
    the cap would burn, and the fill ratio per bucket. This is the
    measurement that decides between pad-to-bucket (this table) and
    concat-packing (pack_sequences / pack_best_fit): a fill ratio
    near 1 says padding is cheap, a long sparse tail says pack.

    Shuffle-free until the ≤|caps|-row rollup: token counts are a
    row-local whitespace split (same tokenizer as txt_token_count),
    the bucket is a CASE ladder, and partial aggs combine map-side.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.where(F.trim(F.col("text")) != "").select(
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias(
            "n_tokens"
        )
    )
    b = _len_bucket(F.col("n_tokens"))
    return (
        toks.where(b.isNotNull())
        .groupBy(b.cast("int").alias("bucket_cap"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum(b - F.col("n_tokens")).alias("padding_tokens"),
            (
                F.sum("n_tokens").cast("double") / F.sum(b)
            ).alias("fill_ratio"),
        )
        .orderBy("bucket_cap")
    )


# --- session depth distribution ---------------------------------------------


@register(
    "ev_session_depth_hist",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), sessions AS (
        SELECT user_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM flagged
    ), depth AS (
        SELECT user_id, session_seq, COUNT(*) AS n_events
        FROM sessions GROUP BY user_id, session_seq
    )
    SELECT CAST(n_events AS BIGINT) AS session_depth,
           COUNT(*) AS n_sessions
    FROM depth
    GROUP BY n_events
    ORDER BY session_depth
    """,
    description="events-per-session histogram on the SAME sessionization every session metric rides",
)
def ev_session_depth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of session depth (events per session) — the
    engagement-shape companion to ev_bounce_rate (depth==1 is exactly
    the bounce bucket), riding the SAME `sessionize` expression so the
    definitions cannot drift.

    One user_id shuffle for the sessionization windows, then two
    counters-only rollups; histogram output bounded by max depth.
    """
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev)
    depth = s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).cast("bigint").alias("session_depth")
    )
    return (
        depth.groupBy("session_depth")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy("session_depth")
    )


# --- repeat-purchase curve --------------------------------------------------


@register(
    "ev_repeat_purchase_curve",
    oracle="""
    WITH p AS (
        SELECT user_id, epoch_us(ts) AS ts_us,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS rn
        FROM events WHERE event_type = 'purchase'
    ), per_user AS (
        SELECT user_id,
               COUNT(*) AS n_purchases,
               CAST(FLOOR((MAX(CASE WHEN rn = 2 THEN ts_us END)
                           - MAX(CASE WHEN rn = 1 THEN ts_us END))
                          / 86400000000.0) AS BIGINT) AS gap_days
        FROM p GROUP BY user_id
    )
    SELECT CAST(n_purchases AS BIGINT) AS n_purchases,
           COUNT(*) AS n_users,
           CAST(FLOOR(quantile_cont(gap_days, 0.5)) AS BIGINT) AS median_gap_days
    FROM per_user
    GROUP BY n_purchases
    ORDER BY n_purchases
    """,
    description="purchases-per-user histogram + median 1st→2nd purchase gap per bucket (repeat-buyer curve)",
)
def ev_repeat_purchase_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The repeat-buyer curve: how many users bought exactly n times,
    and — per bucket — the median days between first and second
    purchase (the reorder-cycle input for retention economics).

    One user_id shuffle covers the row_number window AND the per-user
    rollup; first/second timestamps come from the same pass as
    conditional MAXes (no self-join); the bucket rollup reduces to
    ≤max(n_purchases) rows. Gap days are FLOOR'd integer µs both
    engines (DuckDB CAST rounds, Spark truncates — FLOOR first).
    """
    ev = load_table(spark, sf_dir, "events")
    ts = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy(ts, "event_id")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", ts.alias("ts_us"), F.row_number().over(w).alias("rn")
    )
    per_user = p.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.floor(
            (
                F.max(F.when(F.col("rn") == 2, F.col("ts_us")))
                - F.max(F.when(F.col("rn") == 1, F.col("ts_us")))
            )
            / 86400000000.0
        )
        .cast("bigint")
        .alias("gap_days"),
    )
    return (
        per_user.groupBy("n_purchases")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.floor(F.expr("percentile(gap_days, 0.5)"))
            .cast("bigint")
            .alias("median_gap_days"),
        )
        .orderBy("n_purchases")
    )


# --- candidate-key uniqueness profile ---------------------------------------

# declared candidate keys: (table, [cols]) — the contract dq tests assert
CANDIDATE_KEYS = (
    ("region", ["r_regionkey"]),
    ("nation", ["n_nationkey"]),
    ("customer", ["c_custkey"]),
    ("supplier", ["s_suppkey"]),
    ("part", ["p_partkey"]),
    ("orders", ["o_orderkey"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("events", ["event_id"]),
    ("documents", ["doc_id"]),
    ("embeddings", ["vec_id"]),
)


@register(
    "dq_candidate_keys",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{t}' AS table_name,
               '{",".join(cols)}' AS key_cols,
               COUNT(*) AS n_rows,
               COUNT(DISTINCT {" || '#' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)}) AS n_distinct,
               COUNT(*) = COUNT(DISTINCT {" || '#' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)}) AS is_unique
        FROM {t}
        """
        for t, cols in CANDIDATE_KEYS
    )
    + " ORDER BY table_name",
    description="declared candidate-key uniqueness profile across every table (the PK contract check)",
)
def dq_candidate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is each declared key actually a key? One row per (table, key):
    row count, distinct-key count, and the verdict — the structural
    contract every downstream MERGE/upsert/SCD operator in this engine
    assumes (their docstrings say 'keyed'; this is the test).

    Per table: one scan → one count + distinct-count aggregate
    (two-phase partial agg; the composite key hashes as one
    canonical concat). Output is |tables| rows unioned driver-side —
    each leg independently partial-aggregated, no cross-table joins.
    """
    legs = []
    for t, cols in CANDIDATE_KEYS:
        df = load_table(spark, sf_dir, t)
        key = F.concat_ws("#", *[F.col(c).cast("string") for c in cols])
        legs.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(key).alias("n_distinct"),
            ).select(
                F.lit(t).alias("table_name"),
                F.lit(",".join(cols)).alias("key_cols"),
                "n_rows",
                "n_distinct",
                (F.col("n_rows") == F.col("n_distinct")).alias("is_unique"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("table_name")


# --- Simpson token diversity ------------------------------------------------


@register(
    "txt_simpson_diversity",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS word
        FROM documents
    ), counts AS (
        SELECT source, word, COUNT(*) AS n FROM tok GROUP BY source, word
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_distinct_tokens,
           CAST(SUM(CAST(n AS DECIMAL(38,0)) * (n - 1)) AS DOUBLE)
               / CAST(SUM(CAST(n AS DECIMAL(38,0))) * (SUM(CAST(n AS DECIMAL(38,0))) - 1) AS DOUBLE)
               AS simpson
    FROM counts
    GROUP BY source
    ORDER BY source
    """,
    description="log-free token diversity per source: Simpson index from exact integer counts",
)
def txt_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary concentration per source WITHOUT logs: Simpson's
    index Σ nᵢ(nᵢ-1) / N(N-1) — the probability two random tokens
    match. High values flag templated/repetitive sources the same way
    Shannon entropy would, but every input to the single final
    division is an exact integer (ln/log2 are not bit-stable
    cross-engine — the reason the entropy twin of this table can't be
    oracle-checked).

    Scale: (source, word) counts combine map-side; products are
    decimal(38,0) — nᵢ² overflows int64 once a word passes ~3×10⁹
    occurrences, which a 100 TB corpus reaches.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("source", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    nd = F.col("n").cast("decimal(38,0)")
    return (
        counts.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.sum(nd * (F.col("n") - 1)).alias("num"),
            F.sum(nd).alias("nn"),
        )
        .select(
            "source",
            "n_tokens",
            "n_distinct_tokens",
            (
                F.col("num").cast("double")
                / (F.col("nn") * (F.col("nn") - 1)).cast("double")
            ).alias("simpson"),
        )
        .orderBy("source")
    )


# --- hourly load percentiles ------------------------------------------------


@register(
    "ev_hourly_load_percentiles",
    oracle="""
    WITH hourly AS (
        SELECT CAST(ts AS DATE) AS d, EXTRACT(hour FROM ts) AS hod,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT CAST(hod AS INT) AS hour_of_day,
           COUNT(*) AS n_days,
           MIN(n) AS min_events,
           CAST(FLOOR(quantile_cont(n, 0.5)) AS BIGINT) AS p50_events,
           CAST(FLOOR(quantile_cont(n, 0.95)) AS BIGINT) AS p95_events,
           MAX(n) AS max_events
    FROM hourly
    GROUP BY hod
    ORDER BY hour_of_day
    """,
    description="per-hour-of-day daily volume percentiles (capacity-planning seasonality bands)",
)
def ev_hourly_load_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity-planning bands: for each hour of the day, the
    distribution (min/p50/p95/max) of that hour's DAILY event volume —
    the p95 row is what you provision for, the max row is the incident
    threshold. Complements ev_weekday_hour_profile (means) with tail
    percentiles.

    Counters-only first rollup (date×hour grain), then exact
    percentiles over ≤|days| values per hour — 24 output rows.
    UTC session timezone pins EXTRACT(hour) on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.to_date("ts").alias("d"), F.hour("ts").alias("hod")
    ).agg(F.count(F.lit(1)).alias("n"))
    pct = F.expr("percentile(n, array(0.5, 0.95))")
    return (
        hourly.groupBy(F.col("hod").cast("int").alias("hour_of_day"))
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.min("n").alias("min_events"),
            F.floor(pct.getItem(0)).cast("bigint").alias("p50_events"),
            F.floor(pct.getItem(1)).cast("bigint").alias("p95_events"),
            F.max("n").alias("max_events"),
        )
        .orderBy("hour_of_day")
    )


# --- purchase velocity (sliding RANGE window rule) --------------------------

VELOCITY_WINDOW_US = 3_600_000_000  # 1 hour


@register(
    "ev_purchase_velocity",
    oracle=f"""
    WITH bursts AS (
        SELECT user_id,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                              RANGE BETWEEN {VELOCITY_WINDOW_US - 1} PRECEDING
                                        AND CURRENT ROW) AS burst
        FROM events WHERE event_type = 'purchase'
    ), per_user AS (
        SELECT user_id, MAX(burst) AS max_burst FROM bursts GROUP BY user_id
    )
    SELECT CAST(max_burst AS BIGINT) AS max_burst_1h,
           COUNT(*) AS n_users
    FROM per_user
    GROUP BY max_burst
    ORDER BY max_burst_1h
    """,
    description="per-user max purchases in any sliding 1h window (velocity/fraud rule) → burst histogram",
)
def ev_purchase_velocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity rule: the max number of purchases any user fit into a
    sliding one-hour window — the classic fraud/abuse trigger shape
    ('more than N per hour'), reported as a burst histogram so the
    rule threshold can be set from the actual tail.

    The sliding count is a RANGE frame over integer microseconds (the
    event-time sliding window EXPRESSED IN BATCH — the streaming twin
    is a watermarked window agg); one user_id shuffle carries the
    window and the per-user max. RANGE, not ROWS: simultaneous events
    all see the same window, so replays/reorderings don't change it.
    """
    ev = load_table(spark, sf_dir, "events")
    ts = F.unix_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts)
        .rangeBetween(-(VELOCITY_WINDOW_US - 1), Window.currentRow)
    )
    bursts = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.count(F.lit(1)).over(w).alias("burst")
    )
    per_user = bursts.groupBy("user_id").agg(
        F.max("burst").cast("bigint").alias("max_burst_1h")
    )
    return (
        per_user.groupBy("max_burst_1h")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("max_burst_1h")
    )


# --- full-width null profile ------------------------------------------------


@register(
    "dq_null_profile",
    oracle=" UNION ALL ".join(
        f"SELECT '{t}' AS table_name, '{c}' AS column_name, "
        f"COUNT(*) AS n_rows, COUNT(*) - COUNT({c}) AS n_nulls FROM {t}"
        for t, cols in (
            ("region", ["r_regionkey", "r_name"]),
            ("nation", ["n_nationkey", "n_name", "n_regionkey"]),
            ("customer", ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]),
            ("supplier", ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]),
            ("part", ["p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"]),
            ("orders", ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]),
            ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"]),
            ("events", ["event_id", "ts", "user_id", "event_type", "value", "props"]),
            ("documents", ["doc_id", "text", "lang", "source", "n_chars"]),
            ("embeddings", ["vec_id", "embedding", "label"]),
        )
        for c in cols
    )
    + " ORDER BY table_name, column_name",
    description="every column of every table: null counts in one scan per table (profiling baseline)",
)
def dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The profiling baseline every DQ rule builds on: per (table,
    column) row counts and null counts across the WHOLE schema —
    schema-driven, so new columns are profiled without code changes
    (the oracle enumerates today's schema; the operator reads it).

    One scan per table computes ALL its columns' null counters in a
    single agg row (conditional counters combine map-side), then the
    wide row unpivots to (column, n_nulls) rows driver-free via
    stack(). The DuckDB oracle is per-column UNION legs — the Spark
    plan is |tables| scans, the oracle's is |columns|; same table.
    """
    legs = []
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ):
        df = load_table(spark, sf_dir, t)
        aggs = [F.count(F.lit(1)).alias("n_rows")] + [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__n_{c}")
            for c in df.columns
        ]
        wide = df.agg(*aggs)
        stack_expr = "stack({n}, {args}) as (column_name, n_nulls)".format(
            n=len(df.columns),
            args=", ".join(f"'{c}', __n_{c}" for c in df.columns),
        )
        legs.append(
            wide.select(
                F.lit(t).alias("table_name"),
                F.expr(stack_expr),
                "n_rows",
            ).select("table_name", "column_name", "n_rows", "n_nulls")
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("table_name", "column_name")


# --- near-dup rate by source ------------------------------------------------


@register(
    "cur_near_dup_rate_by_source",
    oracle=f"""
    WITH pairs AS (
        SELECT doc_a, doc_b FROM ({_minhash_sql()})
    ), dup_docs AS (
        SELECT DISTINCT vid FROM (
            SELECT doc_a AS vid FROM pairs
            UNION ALL SELECT doc_b AS vid FROM pairs
        )
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN dd.vid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
           CAST(SUM(CASE WHEN dd.vid IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS dup_rate
    FROM documents d LEFT JOIN dup_docs dd ON d.doc_id = dd.vid
    GROUP BY d.source
    ORDER BY d.source
    """,
    description="share of docs per source with ≥1 verified near-dup (where the duplication actually lives)",
)
def cur_near_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE the duplication lives: per source, the share of documents
    participating in at least one verified near-dup pair — the triage
    table that decides which ingestion pipeline gets the dedup budget
    (a 40%-dup crawl source and a 2%-dup curated source need different
    handling).

    The pair pipeline runs once (persisted); dup doc-ids reduce to
    DISTINCT before the broadcast membership probe against documents;
    final rollup is |sources| counter rows and one exact division.
    """
    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    pairs = (
        jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh)))
        .where(F.col("jaccard") >= JACCARD_TAU)
        .select("doc_a", "doc_b")
        .persist()
    )
    pairs.count()
    dup_docs = (
        pairs.select(F.col("doc_a").alias("vid"))
        .unionAll(pairs.select(F.col("doc_b").alias("vid")))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    j = docs.join(
        F.broadcast(dup_docs), docs.doc_id == dup_docs.vid, "left"
    )
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("is_dup").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_docs"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup_docs",
            (F.col("n_dup_docs").cast("double") / F.col("n_docs")).alias(
                "dup_rate"
            ),
        )
        .orderBy("source")
    )
