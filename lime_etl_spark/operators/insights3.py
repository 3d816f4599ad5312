"""Round-4 insights (batches A-R): exact-integer regression /
correlation / contingency analytics (OLS slopes, Pearson co-movement,
chi-square residuals, Fisher separability, revenue bridge), corpus
audits (Heaps vocabulary growth, head coverage, rare-token shortlist,
language purity, gate-rule matrix), training-data planning (reweight
plan, quota waterfall, effective epochs, split balance, attention
waste, oversize forecast), dedup economics (similarity histogram,
cross-source matrix, cluster-size histogram, vocab loss, rep bias,
exact-duplicate embeddings), ANN planning (bucket balance, closed-form
probe cost, covariance/PCA, label outliers), and engagement depth
(tenure mix, burstiness, habit strength, transition latency,
resurrection gaps, conversion by depth, first-session split,
steps-to-convert, LOO hour anomalies).

lime-etl analog: the scheduled report jobs a BatchSpec runs nightly
(`/root/reference/lime_etl/domain/job_spec.py:40` — `run()` builds a
table, `test()` asserts invariants); each is a first-class DataFrame
operator with a DuckDB oracle here.

Shared determinism rules (operators/insights.py, insights2.py): money
decimal-cast before SUM, every Σ term an exact integer, ONE IEEE
division (sqrt/multiply are correctly-rounded so a guarded
num/sqrt(a·b) form is bit-stable cross-engine), decisions (anomaly
flags, outlier ranks) multiplied out to pure integer comparisons,
bounded outputs with a total-order ORDER BY. Integer magnitudes are
budgeted per query so the int64 envelope holds at 100× the test scale
(noted inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lime_etl_spark.functions.numeric import dec
from lime_etl_spark.functions.ranks import (
    ingest_bucket_sql,
    with_global_ntile,
    with_ingest_bucket,
)
from lime_etl_spark.functions.text import shingle_int, shingle_int_sql
from lime_etl_spark.operators.events import SESSION_GAP_US
from lime_etl_spark.operators.similarity import with_int8_vectors
from lime_etl_spark.operators.text import BPE_RE
from lime_etl_spark.operators.training import (
    PACK_BUDGET,
    PACK_SHARDS,
    _bucket_sql,
    hash_bucket,
)
from lime_etl_spark.plans.registry import register
from lime_etl_spark.sources.readers import load_table

# --- exact OLS revenue trend per nation ------------------------------------

_MONTHLY_NATION_SQL = """
    monthly AS (
        SELECT n.n_name,
               EXTRACT(year FROM o.o_orderdate) * 12
                 + EXTRACT(month FROM o.o_orderdate) AS idx,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                 AS rev_cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2
    ), base AS (
        SELECT MIN(idx) AS idx0 FROM monthly
    ), xy AS (
        SELECT n_name, idx - idx0 AS x, rev_cents AS y
        FROM monthly CROSS JOIN base
    )
"""


@register(
    "q_nation_revenue_trend",
    oracle=f"""
    WITH {_MONTHLY_NATION_SQL}
    , s AS (
        SELECT n_name,
               CAST(COUNT(*) AS BIGINT) AS n_months,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM xy GROUP BY n_name
    )
    SELECT n_name, n_months,
           n_months * sxy - sx * sy AS slope_num,
           n_months * sxx - sx * sx AS slope_den,
           CASE WHEN n_months * sxx - sx * sx > 0
                THEN CAST(n_months * sxy - sx * sy AS DOUBLE)
                     / (n_months * sxx - sx * sx)
                ELSE 0.0 END AS slope_cents_per_month
    FROM s
    ORDER BY n_name
    """,
    description="exact-integer OLS slope of monthly revenue per nation (trend direction + strength, audit-ready numerator/denominator)",
)
def q_nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue trend as the closed-form OLS slope over a
    month index — the 'is this market growing?' scalar, computed from
    EXACT integer sums so it hash-matches cross-engine: x is the month
    index shifted by the global minimum (keeps x in 0..#months, which
    keeps n·Σxy inside int64 at any realistic history length), y is
    exact revenue cents, and the slope is ONE IEEE division of two
    exact int64 terms. The raw numerator/denominator ride along so a
    reviewer can re-derive the division.

    Scale: the monthly rollup combines map-side to |nations|×|months|
    rows; nation/customer dims broadcast; the global min-month is a
    1-row broadcast, never a window over the fact. Int64 envelope:
    x ≤ 10^3 months, y cents per nation-month ≤ 10^12 at 100 TB →
    n·Σxy ≤ 10^3·10^3·10^15 — beyond int64, BUT the rollup grain caps
    y at the nation-month slice actually observed; at the point y
    exceeds ~10^10 switch y units to whole dollars (the slope just
    rescales). Test scales stay ≤ 10^13 end-to-end.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    monthly = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            "n_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("idx"),
        )
        .agg((F.sum(dec("o_totalprice")) * 100).cast("bigint").alias("y"))
        .persist()  # consumed twice (min-idx scalar + xy) — one fact scan
    )
    base = monthly.agg(F.min("idx").alias("idx0"))
    xy = monthly.join(F.broadcast(base)).select(
        "n_name", (F.col("idx") - F.col("idx0")).alias("x"), "y"
    )
    s = xy.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    num = F.col("n_months") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n_months") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "n_name",
        "n_months",
        num.alias("slope_num"),
        den.alias("slope_den"),
        F.when(den > 0, num.cast("double") / den).otherwise(0.0).alias(
            "slope_cents_per_month"
        ),
    ).orderBy("n_name")


# --- nation revenue co-movement (exact Pearson matrix) ---------------------

COMOVE_TOP_K = 40


@register(
    "q_nation_comovement",
    oracle=f"""
    WITH {_MONTHLY_NATION_SQL}
    , kd AS (
        SELECT n_name, x AS m,
               CAST(floor(y / 100000) AS BIGINT) AS v
        FROM xy
    ), pairs AS (
        SELECT a.n_name AS nation_a, b.n_name AS nation_b,
               CAST(COUNT(*) AS BIGINT) AS n_common,
               CAST(SUM(a.v) AS BIGINT) AS sx,
               CAST(SUM(b.v) AS BIGINT) AS sy,
               CAST(SUM(a.v * b.v) AS BIGINT) AS sxy,
               CAST(SUM(a.v * a.v) AS BIGINT) AS sxx,
               CAST(SUM(b.v * b.v) AS BIGINT) AS syy
        FROM kd a JOIN kd b ON a.m = b.m AND a.n_name < b.n_name
        GROUP BY 1, 2
    )
    SELECT nation_a, nation_b, n_common,
           CASE WHEN (n_common * sxx - sx * sx) > 0
                 AND (n_common * syy - sy * sy) > 0
                THEN CAST(n_common * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n_common * sxx - sx * sx AS DOUBLE)
                            * CAST(n_common * syy - sy * sy AS DOUBLE))
                ELSE 0.0 END AS pearson_r
    FROM pairs
    WHERE n_common >= 12
    ORDER BY pearson_r DESC, nation_a, nation_b
    LIMIT {COMOVE_TOP_K}
    """,
    description="pairwise Pearson correlation of monthly revenue between nations (market co-movement matrix, exact integer sums)",
)
def q_nation_comovement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which markets move together? Pairwise Pearson r of monthly
    revenue between nations — the co-movement input to portfolio /
    contagion views. Determinism: monthly revenue is reduced to
    thousand-dollar integer units (exact: floor-division of exact
    cents) BEFORE any product, so Σv·v over a century of months stays
    ~10^10 ≪ 2^53 and every Σ term is an exact int64; r is
    num/sqrt(a·b) over exact casts (sqrt and multiply are
    correctly-rounded IEEE ops, so the expression is bit-stable
    cross-engine).

    Scale: the pair join runs on the |nations|×|months| rollup, never
    the fact — self-joining ~10^4 rollup rows on month is trivial at
    any fact scale; the a<b predicate halves the matrix. Output is
    LIMIT-bounded with a total order.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    monthly = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            "n_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("idx"),
        )
        .agg((F.sum(dec("o_totalprice")) * 100).cast("bigint").alias("y"))
        .persist()  # consumed three times (min-idx + both join sides)
    )
    base = monthly.agg(F.min("idx").alias("idx0"))
    kd = monthly.join(F.broadcast(base)).select(
        "n_name",
        (F.col("idx") - F.col("idx0")).alias("m"),
        # FLOOR explicitly: bare CAST(double AS BIGINT) truncates in
        # Spark but rounds in DuckDB (same pitfall as samp_epoch_shuffle).
        F.floor(F.col("y") / F.lit(100000)).cast("bigint").alias("v"),
    )
    a = kd.alias("a")
    b = kd.alias("b")
    pairs = (
        a.join(
            # the rollup is |nations|x|months| rows — broadcast beats SMJ
            F.broadcast(b),
            (F.col("a.m") == F.col("b.m"))
            & (F.col("a.n_name") < F.col("b.n_name")),
        )
        .groupBy(
            F.col("a.n_name").alias("nation_a"),
            F.col("b.n_name").alias("nation_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.sum("a.v").cast("bigint").alias("sx"),
            F.sum("b.v").cast("bigint").alias("sy"),
            F.sum(F.col("a.v") * F.col("b.v")).cast("bigint").alias("sxy"),
            F.sum(F.col("a.v") * F.col("a.v")).cast("bigint").alias("sxx"),
            F.sum(F.col("b.v") * F.col("b.v")).cast("bigint").alias("syy"),
        )
        .where(F.col("n_common") >= 12)
    )
    vx = F.col("n_common") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n_common") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n_common") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        pairs.select(
            "nation_a",
            "nation_b",
            "n_common",
            F.when(
                (vx > 0) & (vy > 0),
                cov.cast("double") / F.sqrt(vx.cast("double") * vy.cast("double")),
            )
            .otherwise(0.0)
            .alias("pearson_r"),
        )
        .orderBy(F.desc("pearson_r"), "nation_a", "nation_b")
        .limit(COMOVE_TOP_K)
    )


# --- vocabulary growth (Heaps-law audit) -----------------------------------

VOCAB_BUCKETS = 20


@register(
    "txt_vocab_growth",
    oracle=f"""
    WITH bnds AS (
        SELECT MIN(doc_id) AS lo, MAX(doc_id) - MIN(doc_id) + 1 AS span
        FROM documents
    ), bucketed AS (
        SELECT doc_id, text,
               {ingest_bucket_sql("doc_id", VOCAB_BUCKETS)} AS bucket
        FROM documents, bnds
    ), tok AS (
        SELECT bucket, unnest(string_split(text, ' ')) AS token
        FROM bucketed
    ), per_bucket AS (
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT token) AS BIGINT) AS types_in_bucket
        FROM tok GROUP BY bucket
    ), births AS (
        SELECT MIN(bucket) AS bucket, token FROM tok GROUP BY token
    ), new_per AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_types
        FROM births GROUP BY bucket
    )
    SELECT p.bucket, p.n_tokens, p.types_in_bucket,
           COALESCE(n.new_types, 0) AS new_types,
           CAST(SUM(COALESCE(n.new_types, 0))
                OVER (ORDER BY p.bucket) AS BIGINT) AS cum_types,
           CAST(COALESCE(n.new_types, 0) AS DOUBLE) / p.n_tokens AS novelty_rate
    FROM per_bucket p LEFT JOIN new_per n ON n.bucket = p.bucket
    ORDER BY p.bucket
    """,
    description="vocabulary growth curve over the corpus (Heaps-law audit: new types per ingest bucket — the dedup/scaling forecast input)",
)
def txt_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How fast does the corpus stop teaching new words? Docs fall
    into arithmetic ingest-order buckets (doc_id is the ingest order;
    equal id-range slices from a broadcast min/max — bit-identical
    cross-engine), each token's birth bucket is its MIN bucket, and
    the per-bucket new-type count traces the Heaps curve — the input
    to 'how much new data do we need for X new vocabulary' forecasts.
    Counts are exact ints; novelty_rate is the one IEEE division.

    Scale: bucketing is row-local (functions/ranks.with_ingest_bucket
    — no sort, no shuffle); tokens explode the corpus once; the birth
    reduce is a (token → min bucket) map-side-combining groupBy whose
    state is |vocab|, not |tokens|; per-bucket rollups are |buckets|
    rows and the cumulative window sorts {VOCAB_BUCKETS} rows on a
    single partition — bounded by construction.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucketed = with_ingest_bucket(docs, "doc_id", VOCAB_BUCKETS).select(
        "bucket", "text"
    )
    tok = bucketed.select("bucket", F.explode(F.split("text", " ")).alias("token"))
    per_bucket = tok.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.count_distinct("token").cast("bigint").alias("types_in_bucket"),
    )
    births = tok.groupBy("token").agg(F.min("bucket").alias("bucket"))
    new_per = births.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_types")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bucket.join(new_per, "bucket", "left")
        .select(
            "bucket",
            "n_tokens",
            "types_in_bucket",
            F.coalesce("new_types", F.lit(0)).cast("bigint").alias("new_types"),
        )
        .withColumn("cum_types", F.sum("new_types").over(w).cast("bigint"))
        .withColumn(
            "novelty_rate",
            F.col("new_types").cast("double") / F.col("n_tokens"),
        )
        .orderBy("bucket")
    )


# --- sampling reweight plan -------------------------------------------------

# Target mixture in per-mille; must sum to 1000. src0/src1 are the
# up-weighted "high-quality" sources, the rest split the remainder.
REWEIGHT_BOOSTED = ("src0", "src1")
REWEIGHT_BOOST_PM = 95
REWEIGHT_BASE_PM = 45  # 2*95 + 18*45 = 1000


@register(
    "samp_reweight_plan",
    oracle=f"""
    WITH counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    ), total AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM counts
    )
    SELECT c.source, c.n_docs,
           CAST(1000 * c.n_docs AS DOUBLE) / t.n_total AS actual_permille,
           CAST(CASE WHEN c.source IN ('src0', 'src1')
                     THEN {REWEIGHT_BOOST_PM} ELSE {REWEIGHT_BASE_PM} END
                AS BIGINT) AS target_permille,
           CAST(CASE WHEN c.source IN ('src0', 'src1')
                     THEN {REWEIGHT_BOOST_PM} ELSE {REWEIGHT_BASE_PM} END
                * t.n_total AS DOUBLE) / (1000 * c.n_docs) AS weight,
           CAST(CASE WHEN c.source IN ('src0', 'src1')
                     THEN {REWEIGHT_BOOST_PM} ELSE {REWEIGHT_BASE_PM} END
                * t.n_total AS DOUBLE) / 1000 AS expected_docs
    FROM counts c CROSS JOIN total t
    ORDER BY c.source
    """,
    description="per-source importance weights for a target mixture (weight = target_share/actual_share; n·w mass conservation by construction)",
)
def samp_reweight_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reweighting table a mixture-controlled sampler consumes:
    per source, the actual composition, the target per-mille, and the
    importance weight w = target_share / actual_share expressed as ONE
    division of exact integers (t·N)/(1000·n). Mass conservation is
    structural — Σ n_s·w_s = N·Σt_s/1000 = N — which the tests assert,
    and expected_docs is each source's post-reweight mass.

    Scale: one map-side-combining count per source, a 1-row total
    broadcast onto |sources| rows. The weight table itself is the
    broadcast input to the actual per-doc sampler (samp_* family), so
    nothing here ever touches per-doc grain twice.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    total = counts.agg(F.sum("n_docs").cast("bigint").alias("n_total"))
    target = (
        F.when(F.col("source").isin(*REWEIGHT_BOOSTED), F.lit(REWEIGHT_BOOST_PM))
        .otherwise(F.lit(REWEIGHT_BASE_PM))
        .cast("bigint")
    )
    return (
        counts.join(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            ((F.lit(1000) * F.col("n_docs")).cast("double") / F.col("n_total")).alias(
                "actual_permille"
            ),
            target.alias("target_permille"),
            (
                (target * F.col("n_total")).cast("double")
                / (F.lit(1000) * F.col("n_docs"))
            ).alias("weight"),
            ((target * F.col("n_total")).cast("double") / F.lit(1000)).alias(
                "expected_docs"
            ),
        )
        .orderBy("source")
    )


# --- label-centroid separation in int8 space --------------------------------


@register(
    "emb_centroid_separation",
    oracle="""
    WITH m AS (
        SELECT MAX(list_max(list_transform(CAST(embedding AS DOUBLE[]), v -> abs(v)))) / 127 AS s
        FROM embeddings
    ),
    q AS (
        SELECT label,
               list_transform(
                   CAST(embedding AS DOUBLE[]),
                   v -> CAST(GREATEST(LEAST(floor(v / s + 0.5), 127), -127) AS BIGINT)
               ) AS qv
        FROM embeddings, m
    ),
    ex AS (SELECT label, qv, unnest(generate_series(1, len(qv))) AS i FROM q),
    cent AS (
        SELECT label, i AS pos, CAST(SUM(qv[i]) AS BIGINT) AS sum_q
        FROM ex GROUP BY label, i
    ),
    pairs AS (
        SELECT a.label AS label_a, b.label AS label_b,
               CAST(SUM(a.sum_q * b.sum_q) AS BIGINT) AS dot_q,
               CAST(SUM(a.sum_q * a.sum_q) AS BIGINT) AS norm_a_sq,
               CAST(SUM(b.sum_q * b.sum_q) AS BIGINT) AS norm_b_sq
        FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
        GROUP BY a.label, b.label
    )
    SELECT label_a, label_b, dot_q,
           CASE WHEN norm_a_sq > 0 AND norm_b_sq > 0
                THEN CAST(dot_q AS DOUBLE)
                     / sqrt(CAST(norm_a_sq AS DOUBLE) * CAST(norm_b_sq AS DOUBLE))
                ELSE 0.0 END AS cosine
    FROM pairs
    ORDER BY label_a, label_b
    """,
    description="pairwise cosine between per-label centroids accumulated in int8-quantized space (label-space health: which classes collide)",
)
def emb_centroid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which labels are embedding-space neighbours — the confusion
    forecast BEFORE training a classifier, and the guard against label
    noise collapsing classes. Centroid direction is taken from the
    int8-quantized integer SUM (emb_label_centroids machinery; the 1/n
    scale cancels in cosine), so dot and norms are exact int64 and the
    cosine is num/sqrt(a·b) over exact casts — bit-stable
    cross-engine.

    Scale: the pair join runs over |labels|×dim centroid rows (tiny,
    the per-(label,pos) reduce combines map-side on the way here), so
    the quadratic step is labels², never vectors². Int64: sum_q ≤
    127·|label rows| → dot terms overflow only past ~10^8 vectors per
    label per component; switch sum_q to decimal(38,0) beyond that.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cent = (
        with_int8_vectors(emb, "label")
        .select("label", F.posexplode("qv").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.sum("v").cast("bigint").alias("sum_q"))
        .persist()  # |labels|×dim rows, consumed by both join sides
    )
    a = cent.alias("a")
    b = cent.alias("b")
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("a.pos") == F.col("b.pos")) & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b")
        )
        .agg(
            F.sum(F.col("a.sum_q") * F.col("b.sum_q")).cast("bigint").alias("dot_q"),
            F.sum(F.col("a.sum_q") * F.col("a.sum_q"))
            .cast("bigint")
            .alias("norm_a_sq"),
            F.sum(F.col("b.sum_q") * F.col("b.sum_q"))
            .cast("bigint")
            .alias("norm_b_sq"),
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        "dot_q",
        F.when(
            (F.col("norm_a_sq") > 0) & (F.col("norm_b_sq") > 0),
            F.col("dot_q").cast("double")
            / F.sqrt(F.col("norm_a_sq").cast("double") * F.col("norm_b_sq").cast("double")),
        )
        .otherwise(0.0)
        .alias("cosine"),
    ).orderBy("label_a", "label_b")


# --- weekly tenure mix ------------------------------------------------------


@register(
    "ev_tenure_mix",
    oracle="""
    WITH firstd AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ), wk AS (
        SELECT DISTINCT CAST(date_trunc('week', e.ts) AS DATE) AS week_start,
               e.user_id,
               date_diff('day', f.d0, CAST(date_trunc('week', e.ts) AS DATE))
                 AS tenure_days
        FROM events e JOIN firstd f USING (user_id)
    ), bucketed AS (
        SELECT week_start,
               CASE WHEN tenure_days < 7 THEN 'new'
                    WHEN tenure_days < 14 THEN 'recent'
                    ELSE 'established' END AS tenure_bucket,
               user_id
        FROM wk
    ), counts AS (
        SELECT week_start, tenure_bucket,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
        FROM bucketed GROUP BY 1, 2
    )
    SELECT week_start, tenure_bucket, users,
           CAST(users AS DOUBLE)
             / SUM(users) OVER (PARTITION BY week_start) AS share
    FROM counts
    ORDER BY week_start, tenure_bucket
    """,
    description="weekly active users split by account tenure (new <7d / recent <14d / established) — the growth-vs-retention composition lens",
)
def ev_tenure_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is weekly activity growth new users or the old guard? Each
    (week, user) active pair is bucketed by the user's tenure AT THE
    WEEK START (days since first event day — computed against the
    week boundary so a user is in exactly one bucket per week), then
    counted distinct. share is users/week_total — exact ints, one
    division, over a |weeks|×3 result.

    Scale: first-day is a per-user reduce; the DISTINCT (week, user)
    dedup combines map-side before the tenure join; the share window
    partitions by week over ≤3 rows each. The first-day join shuffles
    on user_id — the same key the dedup just partitioned by, so AQE
    reuses the exchange.
    """
    ev = load_table(spark, sf_dir, "events")
    firstd = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    wk = (
        ev.select(
            F.date_trunc("week", "ts").cast("date").alias("week_start"), "user_id"
        )
        .distinct()
        .join(firstd, "user_id")
        .select(
            "week_start",
            "user_id",
            F.datediff("week_start", "d0").alias("tenure_days"),
        )
    )
    bucketed = wk.select(
        "week_start",
        F.when(F.col("tenure_days") < 7, "new")
        .when(F.col("tenure_days") < 14, "recent")
        .otherwise("established")
        .alias("tenure_bucket"),
        "user_id",
    )
    counts = bucketed.groupBy("week_start", "tenure_bucket").agg(
        F.count_distinct("user_id").cast("bigint").alias("users")
    )
    w = Window.partitionBy("week_start")
    return counts.select(
        "week_start",
        "tenure_bucket",
        "users",
        (F.col("users").cast("double") / F.sum("users").over(w)).alias("share"),
    ).orderBy("week_start", "tenure_bucket")


# --- open-order backlog aging ----------------------------------------------


@register(
    "q_backlog_aging",
    oracle="""
    WITH snap AS (
        SELECT MAX(CAST(o_orderdate AS DATE)) AS as_of FROM orders
    ), open_o AS (
        SELECT o.o_orderpriority,
               date_diff('day', CAST(o.o_orderdate AS DATE), s.as_of) AS age_days,
               CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders o CROSS JOIN snap s
        WHERE o.o_orderstatus IN ('O', 'P')
    ), bucketed AS (
        SELECT o_orderpriority,
               CASE WHEN age_days <= 30 THEN 'a_0_30'
                    WHEN age_days <= 90 THEN 'b_31_90'
                    WHEN age_days <= 365 THEN 'c_91_365'
                    ELSE 'd_over_365' END AS age_bucket,
               price
        FROM open_o
    )
    SELECT o_orderpriority, age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(price) AS DOUBLE) AS open_value
    FROM bucketed
    GROUP BY o_orderpriority, age_bucket
    ORDER BY o_orderpriority, age_bucket
    """,
    description="open-order backlog aged into buckets by priority (count + locked-up value) — the fulfilment debt dashboard",
)
def q_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How old is the open backlog, and how much value is locked in
    it? Orders still O/P are aged against the ledger's max order date
    (a deterministic snapshot — never wall-clock, so reruns
    hash-match), bucketed on the standard 30/90/365 fences, and
    rolled up per priority with decimal-exact value sums.

    Scale: the status filter pushes to the parquet scan; the 1-row
    snapshot date broadcasts; the rollup combines map-side to
    |priorities|×4 rows. Age is computed per-row from pushed-down
    columns — no window, no self-join.
    """
    orders = load_table(spark, sf_dir, "orders")
    snap = orders.agg(F.max(F.to_date("o_orderdate")).alias("as_of"))
    age = F.datediff("as_of", F.to_date("o_orderdate"))
    return (
        orders.where(F.col("o_orderstatus").isin("O", "P"))
        .join(F.broadcast(snap))
        .select(
            "o_orderpriority",
            F.when(age <= 30, "a_0_30")
            .when(age <= 90, "b_31_90")
            .when(age <= 365, "c_91_365")
            .otherwise("d_over_365")
            .alias("age_bucket"),
            dec("o_totalprice").alias("price"),
        )
        .groupBy("o_orderpriority", "age_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("price").cast("double").alias("open_value"),
        )
        .orderBy("o_orderpriority", "age_bucket")
    )


# --- discount-band response profile ----------------------------------------


@register(
    "q_discount_bands",
    oracle="""
    WITH banded AS (
        SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS discount_pct,
               CAST(l_quantity AS BIGINT) AS qty,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(38,4))
                 AS net
        FROM lineitem
    )
    SELECT discount_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(qty) AS BIGINT) AS total_qty,
           CAST(SUM(net) AS DOUBLE) AS net_revenue,
           CAST(SUM(qty) AS DOUBLE) / COUNT(*) AS avg_qty_per_line
    FROM banded
    GROUP BY discount_pct
    ORDER BY discount_pct
    """,
    description="per-discount-percent demand response (line count, quantity, net revenue) — the promo-depth elasticity input",
)
def q_discount_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does a deeper discount actually move more units? Lines are
    banded by integer discount percent (floor(x·100+0.5) — the same
    round-half-up both engines agree on for non-negative inputs,
    where a bare CAST would truncate in Spark and round in DuckDB),
    with exact quantity sums and decimal-exact net revenue per band.
    avg qty/line is the one IEEE division.

    Scale: single scan, two pushed columns, map-side combine to ≤11
    band rows. This is the aggregation grain a pricing model trains
    on, so keeping it one pass matters at fact scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    net = (dec("l_extendedprice") * (1 - dec("l_discount", 2, 4))).cast(
        "decimal(38,4)"
    )
    return (
        li.select(
            F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint").alias(
                "discount_pct"
            ),
            F.col("l_quantity").cast("bigint").alias("qty"),
            net.alias("net"),
        )
        .groupBy("discount_pct")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("qty").cast("bigint").alias("total_qty"),
            F.sum("net").cast("double").alias("net_revenue"),
            (F.sum("qty").cast("double") / F.count(F.lit(1))).alias(
                "avg_qty_per_line"
            ),
        )
        .orderBy("discount_pct")
    )


# --- active-days histogram --------------------------------------------------


@register(
    "ev_active_days_hist",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days
        FROM events GROUP BY user_id
    )
    SELECT active_days, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS DOUBLE)
             / (SELECT COUNT(*) FROM per_user) AS user_share
    FROM per_user
    GROUP BY active_days
    ORDER BY active_days
    """,
    description="distribution of per-user active days (the engagement-depth histogram behind DAU/MAU — is stickiness broad or a power-user artifact)",
)
def ev_active_days_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU says how sticky the average is; this says WHO carries
    it — the full histogram of active days per user over the window.
    A healthy product shows mass in the middle; a power-law spike at
    1 plus a tail at 30 means the ratio is a whale artifact. Counts
    exact, share one division by the 1-row user total.

    Scale: per-user distinct-day reduce combines map-side (day
    cardinality per user is bounded by the window length), then a
    histogram rollup over |users| rows to ≤|days| rows; the total is
    a broadcast scalar.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count_distinct(F.to_date("ts")).cast("bigint").alias("active_days")
    )
    total = per_user.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        per_user.groupBy("active_days")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .join(F.broadcast(total))
        .select(
            "active_days",
            "n_users",
            (F.col("n_users").cast("double") / F.col("n_total")).alias("user_share"),
        )
        .orderBy("active_days")
    )


# --- within-class embedding scatter -----------------------------------------


@register(
    "emb_class_scatter",
    oracle="""
    WITH m AS (
        SELECT MAX(list_max(list_transform(CAST(embedding AS DOUBLE[]), v -> abs(v)))) / 127 AS s
        FROM embeddings
    ),
    q AS (
        SELECT label,
               list_transform(
                   CAST(embedding AS DOUBLE[]),
                   v -> CAST(GREATEST(LEAST(floor(v / s + 0.5), 127), -127) AS BIGINT)
               ) AS qv
        FROM embeddings, m
    ),
    ex AS (SELECT label, qv, unnest(generate_series(1, len(qv))) AS i FROM q),
    comp AS (
        SELECT label, i AS pos,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(qv[i]) AS BIGINT) AS sum_q,
               CAST(SUM(qv[i] * qv[i]) AS BIGINT) AS sum_q_sq
        FROM ex GROUP BY label, i
    )
    SELECT label,
           MIN(n_vecs) AS n_vecs,
           CAST(SUM(sum_q_sq) AS BIGINT) AS total_norm_sq,
           CAST(SUM(sum_q * sum_q) AS BIGINT) AS centroid_num_sq,
           CAST(SUM(sum_q_sq) AS DOUBLE)
             - CAST(SUM(sum_q * sum_q) AS DOUBLE) / MIN(n_vecs) AS scatter
    FROM comp
    GROUP BY label
    ORDER BY label
    """,
    description="within-class scatter per label in int8 space (Σ||x||² − ||Σx||²/n — tight vs diffuse classes, the other half of centroid separation)",
)
def emb_class_scatter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How tight is each class? The within-class scatter
    Σ||x−μ||² = Σ||x||² − ||Σx||²/n, computed in int8-quantized space
    so both Σ terms are EXACT integers and the only float op is the
    final /n division (plus one subtraction of exactly-representable
    doubles). Together with emb_centroid_separation this gives the
    Fisher-style view: classes that are both close AND diffuse will
    confuse any downstream head.

    Scale: same |labels|×dim component reduce as the centroid family
    (map-side combine; fact never re-scanned), then a |labels| rollup.
    Int64: Σq² ≤ 127²·N per component → safe to ~10^12 vectors/label.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    comp = (
        with_int8_vectors(emb, "label")
        .select("label", F.posexplode("qv").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum("v").cast("bigint").alias("sum_q"),
            F.sum(F.col("v") * F.col("v")).cast("bigint").alias("sum_q_sq"),
        )
    )
    return (
        comp.groupBy("label")
        .agg(
            F.min("n_vecs").alias("n_vecs"),
            F.sum("sum_q_sq").cast("bigint").alias("total_norm_sq"),
            F.sum(F.col("sum_q") * F.col("sum_q"))
            .cast("bigint")
            .alias("centroid_num_sq"),
        )
        .select(
            "label",
            "n_vecs",
            "total_norm_sq",
            "centroid_num_sq",
            (
                F.col("total_norm_sq").cast("double")
                - F.col("centroid_num_sq").cast("double") / F.col("n_vecs")
            ).alias("scatter"),
        )
        .orderBy("label")
    )


# --- attention waste in packed sequences ------------------------------------


@register(
    "pack_attention_waste",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, lang, doc_id % {PACK_SHARDS} AS shard,
               len(regexp_extract_all(text, '{BPE_RE}')) AS n_tokens
        FROM documents
    ), placed AS (
        SELECT doc_id, lang, shard, n_tokens,
               CAST(FLOOR(CAST(SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
                               AS DOUBLE) / {PACK_BUDGET}) AS BIGINT) AS pack_id
        FROM sized
    ), packs AS (
        SELECT lang, shard, pack_id,
               CAST(SUM(n_tokens) AS BIGINT) AS pack_len,
               CAST(SUM(n_tokens * n_tokens) AS BIGINT) AS sq_sum
        FROM placed GROUP BY lang, shard, pack_id
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_packs,
           CAST(SUM(pack_len * pack_len) AS BIGINT) AS total_attn_pairs,
           CAST(SUM(pack_len * pack_len) - SUM(sq_sum) AS BIGINT) AS cross_doc_pairs,
           CAST(SUM(pack_len * pack_len) - SUM(sq_sum) AS DOUBLE)
             / SUM(pack_len * pack_len) AS cross_doc_frac
    FROM packs
    GROUP BY lang
    ORDER BY lang
    """,
    description="cross-document attention fraction per language under the greedy packing (L² − Σlᵢ² over L² — what block-diagonal masking would save)",
)
def pack_attention_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What fraction of the attention matrix does packing waste on
    cross-document pairs? For each pack, full attention costs L²
    pairs but only Σlᵢ² are intra-document; the gap is what a
    block-diagonal mask saves (or, unmasked, what the model spends
    attending across unrelated docs). Replays the EXACT same greedy
    placement as pack_sequences (same shard, same running-sum window)
    so the two tables describe one packing. All Σ terms exact int64
    (pack_len ≤ budget+max_doc, so L² is tiny); one division.

    Scale: inherits pack_sequences' posture — the window partitions
    by (lang, shard) so no global sort; both rollups combine
    map-side; output is |langs| rows. Int64 holds to ~10^9 packs/lang.
    """
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.regexp_count("text", F.lit(BPE_RE)).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = sized.withColumn(
        "pack_id",
        F.floor(
            ((F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("double"))
            / PACK_BUDGET
        ).cast("bigint"),
    )
    packs = placed.groupBy("lang", "shard", "pack_id").agg(
        F.sum("n_tokens").cast("bigint").alias("pack_len"),
        F.sum(F.col("n_tokens") * F.col("n_tokens")).cast("bigint").alias("sq_sum"),
    )
    lsq = F.col("pack_len") * F.col("pack_len")
    return (
        packs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_packs"),
            F.sum(lsq).cast("bigint").alias("total_attn_pairs"),
            (F.sum(lsq) - F.sum("sq_sum")).cast("bigint").alias("cross_doc_pairs"),
            (
                (F.sum(lsq) - F.sum("sq_sum")).cast("double") / F.sum(lsq)
            ).alias("cross_doc_frac"),
        )
        .orderBy("lang")
    )


# --- session event-type affinity -------------------------------------------

AFFINITY_MIN_BOTH = 2
AFFINITY_TOP_K = 50


@register(
    "ev_type_affinity",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
               CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {{gap}}
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), sess AS (
        SELECT user_id, event_type,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM flagged
    ), st AS (
        SELECT DISTINCT user_id, session_seq, event_type FROM sess
    ), total AS (
        SELECT COUNT(DISTINCT user_id || '#' || session_seq) AS n_sessions FROM st
    ), tc AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM st GROUP BY event_type
    ), pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM st a
        JOIN st b ON a.user_id = b.user_id AND a.session_seq = b.session_seq
                 AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_both,
           ca.n AS n_sessions_a, cb.n AS n_sessions_b,
           CAST(t.n_sessions * p.n_both AS DOUBLE) / (ca.n * cb.n) AS lift
    FROM pairs p
    JOIN tc ca ON ca.event_type = p.type_a
    JOIN tc cb ON cb.event_type = p.type_b
    CROSS JOIN total t
    WHERE p.n_both >= {AFFINITY_MIN_BOTH}
    ORDER BY n_both DESC, type_a, type_b
    LIMIT {AFFINITY_TOP_K}
    """.replace("{gap}", str(SESSION_GAP_US)),
    description="event-type co-occurrence within a session with lift (which behaviors travel together — the feature-bundling signal)",
)
def ev_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event types co-occur in one session more than chance?
    The session-grain analog of market-basket lift: sessions come
    from the SHARED sessionize expression (same gap, same tiebreak as
    ev_sessionize, so 'session' means one thing engine-wide), each
    session reduces to its distinct type set, and lift is
    N·n_ab/(n_a·n_b) — exact integer cross-products, one IEEE
    division, deterministic top-k order.

    Scale: the type-set dedup bounds the self-join fan-out by types²
    per session (types is a small closed set), never events²; the
    per-type counts and 1-row total broadcast onto the pair rollup.
    The sessionize window rides one user_id shuffle.
    """
    from lime_etl_spark.operators.events import sessionize

    ev = load_table(spark, sf_dir, "events")
    st = (
        sessionize(ev)
        .select("user_id", "session_seq", "event_type")
        .distinct()
        .persist()
    )
    total = st.select("user_id", "session_seq").distinct().agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    tc = st.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = st.alias("a")
    b = st.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_seq") == F.col("b.session_seq"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
        .where(F.col("n_both") >= AFFINITY_MIN_BOTH)
    )
    ca = tc.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_sessions_a"))
    cb = tc.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_sessions_b"))
    return (
        pairs.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .crossJoin(F.broadcast(total))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_sessions_a",
            "n_sessions_b",
            (
                (F.col("n_sessions") * F.col("n_both")).cast("double")
                / (F.col("n_sessions_a") * F.col("n_sessions_b"))
            ).alias("lift"),
        )
        .orderBy(F.desc("n_both"), "type_a", "type_b")
        .limit(AFFINITY_TOP_K)
    )


# --- embedding covariance / redundancy -------------------------------------

COV_TOP_K = 50


@register(
    "emb_covariance_topk",
    oracle=f"""
    WITH m AS (
        SELECT MAX(list_max(list_transform(CAST(embedding AS DOUBLE[]), v -> abs(v)))) / 127 AS s
        FROM embeddings
    ),
    q AS (
        SELECT list_transform(
                   CAST(embedding AS DOUBLE[]),
                   v -> CAST(GREATEST(LEAST(floor(v / s + 0.5), 127), -127) AS BIGINT)
               ) AS qv
        FROM embeddings, m
    ),
    comp AS (
        SELECT i - 1 AS pos,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(qv[i]) AS BIGINT) AS s1,
               CAST(SUM(qv[i] * qv[i]) AS BIGINT) AS s2
        FROM q, UNNEST(generate_series(1, len(qv))) AS t1(i)
        GROUP BY i
    ),
    pairs AS (
        SELECT i - 1 AS dim_i, j - 1 AS dim_j,
               CAST(SUM(qv[i] * qv[j]) AS BIGINT) AS sij
        FROM q,
             UNNEST(generate_series(1, len(qv))) AS t1(i),
             UNNEST(generate_series(i + 1, len(qv))) AS t2(j)
        GROUP BY i, j
    )
    SELECT p.dim_i, p.dim_j,
           ci.n * p.sij - ci.s1 * cj.s1 AS cov_num,
           CASE WHEN (ci.n * ci.s2 - ci.s1 * ci.s1) > 0
                 AND (cj.n * cj.s2 - cj.s1 * cj.s1) > 0
                THEN CAST(ci.n * p.sij - ci.s1 * cj.s1 AS DOUBLE)
                     / sqrt(CAST(ci.n * ci.s2 - ci.s1 * ci.s1 AS DOUBLE)
                            * CAST(cj.n * cj.s2 - cj.s1 * cj.s1 AS DOUBLE))
                ELSE 0.0 END AS corr
    FROM pairs p
    JOIN comp ci ON ci.pos = p.dim_i
    JOIN comp cj ON cj.pos = p.dim_j
    ORDER BY abs(corr) DESC, p.dim_i, p.dim_j
    LIMIT {COV_TOP_K}
    """,
    description="most-correlated embedding dimension pairs from exact int8-space sums (redundant-dimension audit — the PCA/compression motivation table)",
)
def emb_covariance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which embedding dimensions are redundant? The top-|corr|
    off-diagonal entries of the dimension-correlation matrix, in
    int8-quantized space so every Σ term (Σqᵢ, Σqᵢ², Σqᵢqⱼ) is an
    exact int64 and corr is num/sqrt(a·b) over exact casts. High
    |corr| pairs are the evidence for PCA/PQ compression (and the
    pca_top_component operator consumes exactly this matrix).

    Scale: the pair explode is dim·(dim−1)/2 rows PER VECTOR — a
    constant ~2k fan-out that the (i,j) groupBy collapses map-side to
    one dim×dim state per task regardless of vector count; per-dim
    moments broadcast onto the pair rollup. Int64: n·sij ≤ 127²·N² —
    exact through N ~ 10^6 vectors; switch the Σ casts to
    decimal(38,0) past that.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = with_int8_vectors(emb).persist()
    comp = (
        q.select(F.posexplode("qv").alias("pos", "v"))
        .groupBy("pos")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("s1"),
            F.sum(F.col("v") * F.col("v")).cast("bigint").alias("s2"),
        )
    )
    dim = F.size("qv")
    ex1 = q.select("qv", F.posexplode("qv").alias("i0", "vi"))
    ex2 = ex1.select(
        F.col("i0").alias("dim_i"),
        "vi",
        F.posexplode(F.slice("qv", F.col("i0") + 2, dim)).alias("jrel", "vj"),
    ).select(
        "dim_i",
        (F.col("dim_i") + 1 + F.col("jrel")).alias("dim_j"),
        (F.col("vi") * F.col("vj")).alias("prod"),
    )
    pairs = ex2.groupBy("dim_i", "dim_j").agg(
        F.sum("prod").cast("bigint").alias("sij")
    )
    ci = comp.select(
        F.col("pos").alias("dim_i"),
        F.col("n").alias("n_i"),
        F.col("s1").alias("s1_i"),
        F.col("s2").alias("s2_i"),
    )
    cj = comp.select(
        F.col("pos").alias("dim_j"),
        F.col("s1").alias("s1_j"),
        F.col("s2").alias("s2_j"),
    )
    j = pairs.join(F.broadcast(ci), "dim_i").join(F.broadcast(cj), "dim_j")
    # n is identical for every dimension (no nulls in the vectors)
    cov_num = F.col("n_i") * F.col("sij") - F.col("s1_i") * F.col("s1_j")
    var_i = F.col("n_i") * F.col("s2_i") - F.col("s1_i") * F.col("s1_i")
    var_j = F.col("n_i") * F.col("s2_j") - F.col("s1_j") * F.col("s1_j")
    return (
        j.select(
            "dim_i",
            "dim_j",
            cov_num.alias("cov_num"),
            F.when(
                (var_i > 0) & (var_j > 0),
                cov_num.cast("double")
                / F.sqrt(var_i.cast("double") * var_j.cast("double")),
            )
            .otherwise(0.0)
            .alias("corr"),
        )
        .orderBy(F.abs(F.col("corr")).desc(), "dim_i", "dim_j")
        .limit(COV_TOP_K)
    )


# --- PCA top component via integer matrix squaring ---------------------------

PCA_SQUARINGS = 12  # S^(2^12): equivalent to 4096 power rounds
_PCA_Q = 1048576  # 2^20 fixed-point scale (the Lloyd/PageRank discipline)


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — DuckDB's `//` and Spark
    SQL's `div` truncate while Python's `//` floors, so every shared
    quantization step must route through this to stay bit-identical
    for negative numerators (measured: DuckDB -7//2 = -3)."""
    q = abs(a) // b
    return -q if a < 0 else q


def _pca_sql() -> str:
    """Unrolled-squaring DuckDB twin of emb_pca_top_component: the
    same exact int8-space scatter matrix, quantized to 2^20 scale by
    truncating division, squared PCA_SQUARINGS times (requantizing
    after each), applied to the all-ones start; sign-canonicalized,
    2^20-normalized loadings; Rayleigh quotient against the EXACT
    scatter matrix in HUGEINT, 1e-6-quantized. Every step is integer
    multiply/add + truncating division + max — bit-replayable."""
    blocks = []
    prev = "m0"
    for r in range(1, PCA_SQUARINGS + 1):
        blocks.append(
            f"""
    p{r} AS MATERIALIZED (
        SELECT a.i AS i, b.j AS j, CAST(SUM(a.v * b.v) AS BIGINT) AS v
        FROM {prev} a JOIN {prev} b ON a.j = b.i GROUP BY a.i, b.j
    ),
    d{r} AS MATERIALIZED (SELECT GREATEST(MAX(ABS(v)) // {_PCA_Q}, 1) AS d FROM p{r}),
    m{r} AS MATERIALIZED (SELECT i, j, v // d AS v FROM p{r}, d{r})"""
        )
        prev = f"m{r}"
    return f"""
    WITH m AS (
        SELECT MAX(list_max(list_transform(CAST(embedding AS DOUBLE[]), v -> abs(v)))) / 127 AS s
        FROM embeddings
    ),
    q AS (
        SELECT list_transform(
                   CAST(embedding AS DOUBLE[]),
                   v -> CAST(GREATEST(LEAST(floor(v / s + 0.5), 127), -127) AS BIGINT)
               ) AS qv
        FROM embeddings, m
    ),
    comp AS (
        SELECT i - 1 AS pos,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(qv[i]) AS BIGINT) AS s1,
               CAST(SUM(qv[i] * qv[i]) AS BIGINT) AS s2
        FROM q, UNNEST(generate_series(1, len(qv))) AS t1(i)
        GROUP BY i
    ),
    pairs AS (
        SELECT i - 1 AS dim_i, j - 1 AS dim_j,
               CAST(SUM(qv[i] * qv[j]) AS BIGINT) AS sij
        FROM q,
             UNNEST(generate_series(1, len(qv))) AS t1(i),
             UNNEST(generate_series(i + 1, len(qv))) AS t2(j)
        GROUP BY i, j
    ),
    smat AS MATERIALIZED (
        SELECT p.dim_i AS i, p.dim_j AS j,
               ci.n * p.sij - ci.s1 * cj.s1 AS v
        FROM pairs p
        JOIN comp ci ON ci.pos = p.dim_i
        JOIN comp cj ON cj.pos = p.dim_j
        UNION ALL
        SELECT p.dim_j, p.dim_i, ci.n * p.sij - ci.s1 * cj.s1
        FROM pairs p
        JOIN comp ci ON ci.pos = p.dim_i
        JOIN comp cj ON cj.pos = p.dim_j
        UNION ALL
        SELECT pos, pos, n * s2 - s1 * s1 FROM comp
    ),
    sd AS MATERIALIZED (SELECT GREATEST(MAX(ABS(v)) // {_PCA_Q}, 1) AS d FROM smat),
    m0 AS MATERIALIZED (SELECT i, j, v // d AS v FROM smat, sd),{",".join(blocks)},
    vr AS (SELECT i, CAST(SUM(v) AS BIGINT) AS v FROM {prev} GROUP BY i),
    piv AS (SELECT v FROM vr ORDER BY ABS(v) DESC, i ASC LIMIT 1),
    vf AS (
        SELECT vr.i AS i,
               CASE WHEN piv.v < 0 THEN -vr.v ELSE vr.v END AS v
        FROM vr, piv
    ),
    mx AS (SELECT GREATEST(MAX(ABS(v)), 1) AS mv FROM vf),
    lq AS (SELECT i, (v * {_PCA_Q}) // mv AS lq FROM vf, mx),
    ssq AS (SELECT CAST(SUM(lq * lq) AS BIGINT) AS s FROM lq),
    n0 AS (SELECT MAX(n) AS n FROM comp),
    ray AS (
        SELECT CAST(SUM(CAST(a.lq AS HUGEINT) * s.v * b.lq) AS HUGEINT) AS num
        FROM lq a JOIN smat s ON s.i = a.i JOIN lq b ON b.i = s.j
    )
    SELECT CAST(l.i AS INT) AS pos,
           l.lq AS loading_q,
           CASE WHEN ssq.s > 0
                THEN CAST(l.lq AS DOUBLE) / sqrt(CAST(ssq.s AS DOUBLE))
                ELSE 0.0 END AS loading,
           CAST(CAST((ray.num * 1000000)
                     // (CAST(ssq.s AS HUGEINT) * n0.n * n0.n)
                AS BIGINT) AS DOUBLE) / 1000000 AS eigenvalue_cov
    FROM lq l, ssq, n0, ray
    ORDER BY pos
    """


@register(
    "emb_pca_top_component",
    oracle=_pca_sql(),
    description="top principal component of the embedding covariance: exact int8-space scatter matrix, 2^20-quantized repeated squaring (S^4096) applied to the all-ones start, 1e-6-quantized Rayleigh eigenvalue — bit-replayable",
)
def emb_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first PCA direction of the corpus embeddings — the
    compression axis, drift monitor, and IVF seed. The distributed
    work is the EXACT scatter-matrix reduce (same int8-space integer
    sums as emb_covariance_topk: dim×dim exact int64 entries
    n·Σqᵢqⱼ − Σqᵢ·Σqⱼ); the eigensolve then runs on that dim×dim
    CONSTANT on the driver — like the trained-IVF Lloyd step, the
    model state is tiny and shipping it back as literals is the
    Spark-idiomatic shape (operators/pq.py records why re-planning
    giant literal trees is the wrong alternative; here the state never
    re-enters a plan).

    r4→r5 rows-only→oracle conversion (the PageRank/Lloyd pattern):
    instead of float power iteration, the scatter matrix is quantized
    to 2^20 fixed point (truncating division — DuckDB `//` semantics)
    and SQUARED {PCA_SQUARINGS} times, requantizing after each round,
    then applied to the all-ones start: S^(2^{PCA_SQUARINGS}) ≡ 4096
    power rounds, so even a 0.99 eigengap converges, in a constant
    {PCA_SQUARINGS}-block unrolled SQL twin (a 4096-round unroll would
    not be writable). Loadings are 2^20-normalized integers with the
    L2 form derived by ONE exact-int sqrt+divide; the eigenvalue is
    the Rayleigh quotient against the EXACT (unquantized) scatter
    matrix — quadratic in direction error, so quantization costs
    ~1e-12 relative — 1e-6-quantized for the hash. Every number the
    result carries is an integer or a fixed-shape function of
    integers: bit-identical in DuckDB.

    Deterministic by construction: exact integer matrix, fixed start,
    fixed squaring count, no data-order dependence anywhere.
    """
    import math

    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    q = with_int8_vectors(emb).persist()
    comp_rows = (
        q.select(F.posexplode("qv").alias("pos", "v"))
        .groupBy("pos")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("s1"),
        )
        .collect()
    )
    dim_n = len(comp_rows)
    n = comp_rows[0]["n"]
    s1 = [0] * dim_n
    for r in comp_rows:
        s1[r["pos"]] = r["s1"]
    dim = F.size("qv")
    ex1 = q.select("qv", F.posexplode("qv").alias("i0", "vi"))
    pair_rows = (
        ex1.select(
            F.col("i0").alias("i"),
            "vi",
            F.posexplode(F.slice("qv", F.col("i0") + 2, dim)).alias("jrel", "vj"),
        )
        .select(
            "i",
            (F.col("i") + 1 + F.col("jrel")).alias("j"),
            (F.col("vi") * F.col("vj")).alias("prod"),
        )
        .groupBy("i", "j")
        .agg(F.sum("prod").cast("bigint").alias("sij"))
        .collect()
    )
    diag_rows = (
        q.select(F.posexplode("qv").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum(F.col("v") * F.col("v")).cast("bigint").alias("sii"))
        .collect()
    )
    q.unpersist()
    # exact integer scatter matrix: S[i][j] = n·Σqiqj − Σqi·Σqj.
    # Python ints (the Rayleigh products overflow int64); a parallel
    # int64 numpy copy drives the squaring loop (entries stay ≤ 2^48).
    S = [[0] * dim_n for _ in range(dim_n)]
    for r in diag_rows:
        i = r["pos"]
        S[i][i] = n * r["sii"] - s1[i] * s1[i]
    for r in pair_rows:
        v = n * r["sij"] - s1[r["i"]] * s1[r["j"]]
        S[r["i"]][r["j"]] = v
        S[r["j"]][r["i"]] = v

    def requant(P: "np.ndarray") -> "np.ndarray":
        # truncating division by a positive scalar (DuckDB // twin)
        d = max(int(np.abs(P).max()) // _PCA_Q, 1)
        return np.sign(P) * (np.abs(P) // d)

    M = requant(np.array(S, dtype=object).astype(np.int64))
    for _ in range(PCA_SQUARINGS):
        M = requant(M @ M)  # ≤ 64·(2^21)² = 2^48: exact in int64
    vec = M.sum(axis=1)  # S^(2^k) applied to the all-ones start
    # canonical sign: largest-|loading| component positive (min-pos
    # tiebreak — np.argmax returns the first maximum, like ORDER BY
    # ABS(v) DESC, i ASC LIMIT 1)
    if vec[int(np.argmax(np.abs(vec)))] < 0:
        vec = -vec
    mv = max(int(np.abs(vec).max()), 1)
    w = vec * _PCA_Q  # ≤ 2^47: exact in int64
    lq = [_tdiv(int(x), mv) for x in w]
    ssq = sum(x * x for x in lq)
    norm = math.sqrt(float(ssq)) if ssq > 0 else 1.0
    # Rayleigh quotient against the EXACT scatter matrix (Python int —
    # the triple product overflows int64), 1e-6-quantized
    num = sum(
        lq[i] * S[i][j] * lq[j] for i in range(dim_n) for j in range(dim_n)
    )
    den2 = ssq * n * n
    eig_e6 = (num * 1000000) // den2 if den2 > 0 else 0  # num ≥ 0: PSD
    eigenvalue_cov = float(eig_e6) / 1000000
    spark_local = emb.sparkSession
    rows = [
        (i, lq[i], (float(lq[i]) / norm) if ssq > 0 else 0.0, eigenvalue_cov)
        for i in range(dim_n)
    ]
    return spark_local.createDataFrame(
        rows, "pos int, loading_q bigint, loading double, eigenvalue_cov double"
    ).orderBy("pos")


# --- duplicate-cluster size histogram ---------------------------------------

from lime_etl_spark.operators.dedup import _minhash_sql  # noqa: E402


@register(
    "graph_component_size_hist",
    oracle=f"""
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
    cc AS (
        SELECT vid AS doc_id, CAST(MIN(lab) AS BIGINT) AS component_id
        FROM reach GROUP BY vid
    ),
    sizes AS (
        SELECT component_id, CAST(COUNT(*) AS BIGINT) AS size
        FROM cc GROUP BY component_id
    )
    SELECT size, CAST(COUNT(*) AS BIGINT) AS n_components,
           CAST(size * COUNT(*) AS BIGINT) AS n_docs
    FROM sizes
    GROUP BY size
    ORDER BY size
    """,
    description="near-dup cluster size histogram (how big do duplicate families get — the dedup-collapse forecast)",
)
def graph_component_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The size distribution of near-dup clusters: most corpora are
    singleton-heavy with a templated tail, and this table is where
    that tail becomes visible BEFORE dedup collapses it. n_docs per
    size bucket is what dedup will delete (size−1 of each cluster),
    so the histogram is the collapse forecast the budget planner
    consumes.

    Scale: inherits dedup_components' posture (LSH candidates only,
    lineage-truncated min-label propagation on the active subgraph);
    the two rollups after it reduce |docs| → |clusters| → |sizes|
    with map-side combine at each step.
    """
    from lime_etl_spark.operators.graph import dedup_components

    cc = dedup_components(spark, sf_dir)
    sizes = cc.groupBy("component_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("size")
    )
    return (
        sizes.groupBy("size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_components"))
        .select(
            "size",
            "n_components",
            (F.col("size") * F.col("n_components")).cast("bigint").alias("n_docs"),
        )
        .orderBy("size")
    )


# --- time to nth purchase ---------------------------------------------------

NTH_MAX = 5


@register(
    "ev_time_to_nth_purchase",
    oracle=f"""
    WITH p AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS rn
        FROM events WHERE event_type = 'purchase'
    ), firstd AS (
        SELECT user_id, d AS d0 FROM p WHERE rn = 1
    ), gaps AS (
        SELECT p.rn AS nth,
               date_diff('day', f.d0, p.d) AS days_from_first
        FROM p JOIN firstd f USING (user_id)
        WHERE p.rn BETWEEN 2 AND {NTH_MAX}
    )
    SELECT nth,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(FLOOR(quantile_cont(days_from_first, 0.5)) AS BIGINT) AS p50_days,
           CAST(FLOOR(quantile_cont(days_from_first, 0.9)) AS BIGINT) AS p90_days,
           CAST(MAX(days_from_first) AS BIGINT) AS max_days
    FROM gaps
    GROUP BY nth
    ORDER BY nth
    """,
    description="days from first to nth purchase (repeat-purchase velocity percentiles — the payback-curve input)",
)
def ev_time_to_nth_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How long until the 2nd, 3rd, ... purchase? The latency
    percentiles that price retention campaigns (act before the p90
    window closes, not after). Purchase ranks come from one
    (user, ts, event_id) window — the same total order every engine
    agrees on — and day gaps are exact integers, so interpolated
    percentiles floor to the same bigint cross-engine
    (ev_inter_arrival's convention).

    Scale: the purchase filter pushes to the scan; rank + first-date
    ride ONE user_id shuffle (the rn=1 row is a filter on the same
    windowed frame, not a second scan-join at fact grain); the
    percentile reduce collapses to {NTH_MAX}-1 rows.
    approx_percentile is the documented 100 TB swap-in.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    p = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.to_date("ts").alias("d"),
            F.unix_micros("ts").alias("ts_us"),
            "event_id",
        )
        .withColumn("rn", F.row_number().over(w))
        .select("user_id", "d", "rn")
    ).persist()
    firstd = p.where(F.col("rn") == 1).select("user_id", F.col("d").alias("d0"))
    gaps = (
        p.where((F.col("rn") >= 2) & (F.col("rn") <= NTH_MAX))
        .join(firstd, "user_id")
        .select(F.col("rn").alias("nth"), F.datediff("d", "d0").alias("days_from_first"))
    )
    return (
        gaps.groupBy("nth")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.floor(F.percentile("days_from_first", F.lit(0.5)))
            .cast("bigint")
            .alias("p50_days"),
            F.floor(F.percentile("days_from_first", F.lit(0.9)))
            .cast("bigint")
            .alias("p90_days"),
            F.max("days_from_first").cast("bigint").alias("max_days"),
        )
        .orderBy("nth")
    )


# --- quota waterfall --------------------------------------------------------


@register(
    "samp_quota_waterfall",
    oracle=f"""
    WITH counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    ), total AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM counts
    ), planned AS (
        SELECT c.source, c.n_docs,
               CAST(FLOOR(CAST(CASE WHEN c.source IN ('src0', 'src1')
                                    THEN {REWEIGHT_BOOST_PM} ELSE {REWEIGHT_BASE_PM} END
                               * t.n_total AS DOUBLE) / 1000) AS BIGINT) AS target_docs
        FROM counts c CROSS JOIN total t
    ), based AS (
        SELECT source, n_docs, target_docs,
               LEAST(n_docs, target_docs) AS base_quota,
               GREATEST(target_docs - n_docs, 0) AS shortfall,
               CASE WHEN n_docs > target_docs THEN n_docs - target_docs ELSE 0 END AS capacity
        FROM planned
    ), agg AS (
        SELECT CAST(SUM(shortfall) AS BIGINT) AS total_shortfall,
               CAST(SUM(capacity) AS BIGINT) AS total_capacity
        FROM based
    )
    SELECT b.source, b.n_docs, b.target_docs, b.base_quota,
           CAST(CASE WHEN a.total_capacity > 0
                THEN FLOOR(CAST(a.total_shortfall * b.capacity AS DOUBLE)
                           / a.total_capacity)
                ELSE 0 END AS BIGINT) AS spill_in,
           b.base_quota
             + CAST(CASE WHEN a.total_capacity > 0
                    THEN FLOOR(CAST(a.total_shortfall * b.capacity AS DOUBLE)
                               / a.total_capacity)
                    ELSE 0 END AS BIGINT) AS final_quota
    FROM based b CROSS JOIN agg a
    ORDER BY b.source
    """,
    description="one-round quota waterfall: under-filled source targets spill proportionally into sources with spare capacity (all-integer, cap-respecting)",
)
def samp_quota_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step after samp_reweight_plan when a source CANNOT fill its
    target: base quota = min(target, available), and the aggregate
    shortfall spills back into sources with spare capacity,
    proportionally to that capacity. Everything is integer arithmetic
    (floor over one exact-int division), so quotas are exact,
    cap-respecting (spill_in ≤ capacity because shortfall ≤ total
    capacity), and reproducible — the property a budget audit needs.

    Scale: one per-source reduce; the shortfall/capacity aggregate is
    a 1-row broadcast. The final_quota column is precisely what
    samp_fixed_k consumes as its per-stratum k.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    total = counts.agg(F.sum("n_docs").cast("bigint").alias("n_total"))
    target = (
        F.when(F.col("source").isin(*REWEIGHT_BOOSTED), F.lit(REWEIGHT_BOOST_PM))
        .otherwise(F.lit(REWEIGHT_BASE_PM))
        .cast("bigint")
    )
    planned = counts.join(F.broadcast(total)).select(
        "source",
        "n_docs",
        F.floor((target * F.col("n_total")).cast("double") / 1000)
        .cast("bigint")
        .alias("target_docs"),
    )
    based = planned.select(
        "source",
        "n_docs",
        "target_docs",
        F.least("n_docs", "target_docs").alias("base_quota"),
        F.greatest(F.col("target_docs") - F.col("n_docs"), F.lit(0)).alias(
            "shortfall"
        ),
        F.when(
            F.col("n_docs") > F.col("target_docs"),
            F.col("n_docs") - F.col("target_docs"),
        )
        .otherwise(0)
        .alias("capacity"),
    ).persist()
    agg = based.agg(
        F.sum("shortfall").cast("bigint").alias("total_shortfall"),
        F.sum("capacity").cast("bigint").alias("total_capacity"),
    )
    spill = (
        F.when(
            F.col("total_capacity") > 0,
            F.floor(
                (F.col("total_shortfall") * F.col("capacity")).cast("double")
                / F.col("total_capacity")
            ),
        )
        .otherwise(0)
        .cast("bigint")
    )
    return (
        based.join(F.broadcast(agg))
        .select(
            "source",
            "n_docs",
            "target_docs",
            "base_quota",
            spill.alias("spill_in"),
            (F.col("base_quota") + spill).alias("final_quota"),
        )
        .orderBy("source")
    )


# --- vocabulary loss under near-dup collapse --------------------------------


@register(
    "cur_dedup_vocab_loss",
    oracle=f"""
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
    cc AS (
        SELECT vid AS doc_id, CAST(MIN(lab) AS BIGINT) AS component_id
        FROM reach GROUP BY vid
    ),
    full_v AS (
        SELECT d.lang, COUNT(DISTINCT t.token) AS vocab_full
        FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(token)
        GROUP BY d.lang
    ),
    kept_v AS (
        SELECT d.lang, COUNT(DISTINCT t.token) AS vocab_kept
        FROM documents d
        JOIN cc ON cc.doc_id = d.doc_id AND cc.component_id = d.doc_id
        , UNNEST(string_split(d.text, ' ')) AS t(token)
        GROUP BY d.lang
    )
    SELECT f.lang,
           CAST(f.vocab_full AS BIGINT) AS vocab_full,
           CAST(k.vocab_kept AS BIGINT) AS vocab_kept,
           CAST(f.vocab_full - k.vocab_kept AS BIGINT) AS vocab_lost,
           CAST(f.vocab_full - k.vocab_kept AS DOUBLE) / f.vocab_full AS loss_rate
    FROM full_v f JOIN kept_v k ON k.lang = f.lang
    ORDER BY f.lang
    """,
    description="vocabulary lost when near-dup clusters collapse to one representative (the diversity cost of dedup, per language)",
)
def cur_dedup_vocab_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup deletes documents; does it delete WORDS? Per language:
    the distinct-token vocabulary before collapse vs after keeping
    one representative per near-dup cluster (the component label IS
    the min doc_id, so the representative is doc_id == component_id —
    no extra window). A high loss rate means the 'duplicates' carried
    unique content and the similarity threshold is too loose — the
    qualitative check on cur_net_yield's quantitative account.

    Scale: inherits the LSH component pipeline; both vocabulary
    reduces are (lang, token) map-side-combining distinct counts; the
    kept-side join is a doc_id equi-join at doc grain, never token
    grain.
    """
    from lime_etl_spark.operators.graph import dedup_components

    docs = load_table(spark, sf_dir, "documents").persist()
    cc = dedup_components(spark, sf_dir)
    kept_ids = cc.where(F.col("component_id") == F.col("doc_id")).select("doc_id")
    tok_full = docs.select("lang", F.explode(F.split("text", " ")).alias("token"))
    full_v = tok_full.groupBy("lang").agg(
        F.count_distinct("token").cast("bigint").alias("vocab_full")
    )
    tok_kept = (
        docs.join(kept_ids, "doc_id")
        .select("lang", F.explode(F.split("text", " ")).alias("token"))
    )
    kept_v = tok_kept.groupBy("lang").agg(
        F.count_distinct("token").cast("bigint").alias("vocab_kept")
    )
    return (
        full_v.join(kept_v, "lang")
        .select(
            "lang",
            "vocab_full",
            "vocab_kept",
            (F.col("vocab_full") - F.col("vocab_kept")).cast("bigint").alias(
                "vocab_lost"
            ),
            (
                (F.col("vocab_full") - F.col("vocab_kept")).cast("double")
                / F.col("vocab_full")
            ).alias("loss_rate"),
        )
        .orderBy("lang")
    )


# --- candidate-pair similarity histogram ------------------------------------


@register(
    "dedup_similarity_hist",
    # the pair CTE minus its trailing tau filter: the histogram needs the
    # FULL candidate range so the threshold choice has evidence both sides
    oracle=f"""
    WITH j AS (
        {_minhash_sql().rpartition("WHERE")[0]}
    )
    SELECT CAST(LEAST(FLOOR(jaccard * 10), 9) AS BIGINT) AS sim_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(jaccard) AS DOUBLE) AS min_jaccard,
           CAST(MAX(jaccard) AS DOUBLE) AS max_jaccard
    FROM j
    GROUP BY 1
    ORDER BY sim_bucket
    """,
    description="exact-Jaccard histogram of ALL LSH candidate pairs (where does the corpus mass sit relative to the dedup threshold)",
)
def dedup_similarity_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The evidence behind the Jaccard threshold: the full similarity
    distribution of LSH candidate pairs, bucketed by 0.1. A bimodal
    histogram (noise hump near the banding floor, dup spike near 1.0)
    validates the threshold; mass piled AT the threshold means the
    cut is arbitrary and the band config needs retuning
    (dedup_lsh_tuning is the config-sweep companion). Buckets floor
    identical doubles identically cross-engine because jaccard itself
    is one division of exact integer counts.

    Scale: same candidate-scoped verify as dedup_minhash_lsh — the
    histogram adds one map-side-combining rollup over the pair set.
    """
    from lime_etl_spark.operators.dedup import (
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    pairs = jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh)))
    return (
        pairs.groupBy(
            F.least(F.floor(F.col("jaccard") * 10), F.lit(9))
            .cast("bigint")
            .alias("sim_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.min("jaccard").cast("double").alias("min_jaccard"),
            F.max("jaccard").cast("double").alias("max_jaccard"),
        )
        .orderBy("sim_bucket")
    )


# --- lineitem linenumber gap audit ------------------------------------------


@register(
    "dq_linenumber_gaps",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(MAX(l_linenumber) AS BIGINT) AS max_ln,
               CAST(MIN(l_linenumber) AS BIGINT) AS min_ln,
               CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) AS n_distinct
    FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN min_ln <> 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bad_start,
           CAST(SUM(CASE WHEN n_distinct <> n_lines THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_linenumbers,
           CAST(SUM(CASE WHEN max_ln <> n_lines AND n_distinct = n_lines
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_gapped,
           CAST(SUM(CASE WHEN min_ln = 1 AND max_ln = n_lines
                          AND n_distinct = n_lines
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_contiguous
    FROM per_order
    """,
    description="line-number sequence audit per order: 1..n contiguous vs gapped / duplicated / bad-start (the detail-grain protocol check)",
)
def dq_linenumber_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order lines should number 1..n with no gaps — deletions that
    skipped renumbering, partial loads, and merge bugs all break that
    invariant before they break anything visible. One per-order
    reduce classifies every order: bad start (min≠1), duplicated
    line numbers, gapped (max≠count with distinct numbers), or
    contiguous. The four counters partition the order space with
    exact arithmetic — no floats anywhere.

    Scale: one scan, two pushed columns, per-order map-side combine,
    then a scalar rollup. The distinct-linenumber count is bounded by
    lines-per-order (single digits), so the per-key state is tiny.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.max("l_linenumber").cast("bigint").alias("max_ln"),
        F.min("l_linenumber").cast("bigint").alias("min_ln"),
        F.count_distinct("l_linenumber").cast("bigint").alias("n_distinct"),
    )
    bad_start = F.col("min_ln") != 1
    dup = F.col("n_distinct") != F.col("n_lines")
    gapped = (F.col("max_ln") != F.col("n_lines")) & ~dup
    contiguous = (
        (F.col("min_ln") == 1)
        & (F.col("max_ln") == F.col("n_lines"))
        & ~dup
    )
    one = F.lit(1)
    zero = F.lit(0)
    return per_order.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.when(bad_start, one).otherwise(zero)).cast("bigint").alias(
            "n_bad_start"
        ),
        F.sum(F.when(dup, one).otherwise(zero)).cast("bigint").alias(
            "n_dup_linenumbers"
        ),
        F.sum(F.when(gapped, one).otherwise(zero)).cast("bigint").alias("n_gapped"),
        F.sum(F.when(contiguous, one).otherwise(zero)).cast("bigint").alias(
            "n_contiguous"
        ),
    )


# --- per-user burstiness profile --------------------------------------------


@register(
    "ev_burstiness_profile",
    oracle="""
    WITH gaps AS (
        SELECT user_id, event_type,
               CAST(FLOOR(CAST(epoch_us(ts) - LAG(epoch_us(ts))
                   OVER (PARTITION BY user_id, event_type
                         ORDER BY epoch_us(ts), event_id) AS DOUBLE) / 1000000)
                    AS BIGINT) AS g
        FROM events
    ), per_user AS (
        SELECT user_id, event_type,
               CAST(COUNT(g) AS BIGINT) AS n,
               CAST(SUM(g) AS BIGINT) AS sg,
               CAST(SUM(g * g) AS BIGINT) AS sgg
        FROM gaps WHERE g IS NOT NULL
        GROUP BY user_id, event_type
        HAVING COUNT(g) >= 3 AND SUM(g) > 0
    ), b AS (
        SELECT event_type,
               (sqrt(CAST(n * sgg - sg * sg AS DOUBLE)) - CAST(sg AS DOUBLE))
               / (sqrt(CAST(n * sgg - sg * sg AS DOUBLE)) + CAST(sg AS DOUBLE))
                 AS burstiness
        FROM per_user
    )
    SELECT event_type,
           CAST(LEAST(GREATEST(FLOOR((burstiness + 1) * 5), 0), 9) AS BIGINT)
             AS b_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM b
    GROUP BY 1, 2
    ORDER BY event_type, b_bucket
    """,
    description="per-user inter-arrival burstiness B=(σ−μ)/(σ+μ) histogram by event type (Poisson-like vs bursty behavior — the bot/batch-traffic lens)",
)
def ev_burstiness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is activity Poisson-like (B≈0), regular like a cron (B→−1), or
    bursty like a human session (B→1)? Goh-Barabási burstiness per
    (user, type) from inter-arrival gaps, then histogrammed per type.
    The identity B=(σ−μ)/(σ+μ) reduces to
    (√(nΣg²−(Σg)²) − Σg)/(√(nΣg²−(Σg)²) + Σg): every Σ term is an
    exact integer (floor-second gaps — µs gaps square past int64 over
    a month-long window), the √/± are correctly-rounded IEEE ops on
    exact inputs, and the bucket floor sees bit-identical doubles on
    both engines. All-zero-gap users (sub-second bots) are excluded
    by the Σg>0 guard rather than fed a 0/0.

    Scale: gaps ride the same (user, type) window shuffle as
    ev_inter_arrival; the per-user reduce combines map-side and the
    histogram is |types|×10 rows. Int64: n·Σg² ≤ n²·(span_s)² — a
    month-long window is safe to ~10^4 gaps per (user,type).
    """
    ev = load_table(spark, sf_dir, "events")
    ts = F.unix_micros("ts")
    w = Window.partitionBy("user_id", "event_type").orderBy(ts, "event_id")
    # gaps in FLOOR-seconds, not µs: Σg² over a month of µs gaps blows
    # int64 (month ≈ 2.6e12 µs → g² ≈ 7e24); seconds keep it ≤ ~1e16
    gaps = ev.select(
        "user_id",
        "event_type",
        F.floor(((ts - F.lag(ts).over(w)).cast("double")) / 1000000)
        .cast("bigint")
        .alias("g"),
    ).where(F.col("g").isNotNull())
    per_user = (
        gaps.groupBy("user_id", "event_type")
        .agg(
            F.count("g").cast("bigint").alias("n"),
            F.sum("g").cast("bigint").alias("sg"),
            F.sum(F.col("g") * F.col("g")).cast("bigint").alias("sgg"),
        )
        .where((F.col("n") >= 3) & (F.col("sg") > 0))
    )
    root = F.sqrt((F.col("n") * F.col("sgg") - F.col("sg") * F.col("sg")).cast("double"))
    b = per_user.select(
        "event_type",
        ((root - F.col("sg").cast("double")) / (root + F.col("sg").cast("double"))).alias(
            "burstiness"
        ),
    )
    return (
        b.groupBy(
            "event_type",
            F.least(
                F.greatest(F.floor((F.col("burstiness") + 1) * 5), F.lit(0)),
                F.lit(9),
            )
            .cast("bigint")
            .alias("b_bucket"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("event_type", "b_bucket")
    )


# --- label outliers in embedding space --------------------------------------

OUTLIER_TOP_K = 30


@register(
    "emb_label_outliers",
    oracle=f"""
    WITH m AS (
        SELECT MAX(list_max(list_transform(CAST(embedding AS DOUBLE[]), v -> abs(v)))) / 127 AS s
        FROM embeddings
    ),
    q AS (
        SELECT vec_id, label,
               list_transform(
                   CAST(embedding AS DOUBLE[]),
                   v -> CAST(GREATEST(LEAST(floor(v / s + 0.5), 127), -127) AS BIGINT)
               ) AS qv
        FROM embeddings, m
    ),
    ex AS (SELECT vec_id, label, qv, unnest(generate_series(1, len(qv))) AS i FROM q),
    cent AS (
        SELECT label, i AS pos,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(qv[i]) AS BIGINT) AS sq
        FROM ex GROUP BY label, i
    ),
    dist AS (
        SELECT e.vec_id, e.label,
               CAST(SUM(c.n * c.n * e.qv[e.i] * e.qv[e.i]
                        - 2 * c.n * e.qv[e.i] * c.sq
                        + c.sq * c.sq) AS BIGINT) AS dist_num,
               MIN(c.n) AS n_vecs
        FROM ex e JOIN cent c ON c.label = e.label AND c.pos = e.i
        GROUP BY e.vec_id, e.label
    )
    SELECT vec_id, label, dist_num,
           CAST(dist_num AS DOUBLE) / (n_vecs * n_vecs) AS dist_sq
    FROM dist
    ORDER BY dist_num DESC, vec_id
    LIMIT {OUTLIER_TOP_K}
    """,
    description="vectors farthest from their own label centroid in int8 space (n²·||q−μ||² exact — the mislabeled-example shortlist)",
)
def emb_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mislabeled-example shortlist: vectors farthest from their
    OWN label's centroid. Distance is computed as the exact integer
    n²·||q − S/n||² = Σᵢ (n·qᵢ − Sᵢ)² expanded to avoid any division
    before the ranking — so the top-k order is exact, and only the
    reported dist_sq pays one IEEE division. Feed the shortlist to
    relabeling / human review; emb_knn_label_consistency is the
    aggregate twin.

    Scale: centroids are the |labels|×dim broadcast; the per-vector
    distance is a row-local fold after that broadcast join at
    component grain, reduced map-side per vec_id. Int64: terms ≤
    (127·2N)² per component — exact to ~10^7 vectors/label.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = with_int8_vectors(emb, "vec_id", "label").persist()
    ex = q.select("vec_id", "label", F.posexplode("qv").alias("pos", "v"))
    cent = (
        ex.groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("sq"),
        )
    )
    term = (
        F.col("n") * F.col("n") * F.col("v") * F.col("v")
        - 2 * F.col("n") * F.col("v") * F.col("sq")
        + F.col("sq") * F.col("sq")
    )
    dist = (
        ex.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(term).cast("bigint").alias("dist_num"),
            F.min("n").alias("n_vecs"),
        )
    )
    return (
        dist.select(
            "vec_id",
            "label",
            "dist_num",
            (F.col("dist_num").cast("double") / (F.col("n_vecs") * F.col("n_vecs"))).alias(
                "dist_sq"
            ),
        )
        .orderBy(F.desc("dist_num"), "vec_id")
        .limit(OUTLIER_TOP_K)
    )


# --- returns rate by discount band ------------------------------------------


@register(
    "q_returns_by_discount",
    oracle="""
    SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS discount_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returned,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS return_rate
    FROM lineitem
    GROUP BY 1
    ORDER BY discount_pct
    """,
    description="return rate per discount percent (do discounted lines come back more — the markdown-quality interaction)",
)
def q_returns_by_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do deeper discounts ship worse outcomes? Return rate per
    integer discount percent — the interaction q_returns_rate_by_brand
    (who) and q_discount_bands (how much) both miss. Same
    round-half-up banding, exact counters, one division per band.

    Scale: single scan, two pushed columns, ≤11-row rollup with
    map-side combine — free at any fact size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    returned = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    return (
        li.groupBy(
            F.floor(F.col("l_discount") * 100 + 0.5).cast("bigint").alias(
                "discount_pct"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(returned).cast("bigint").alias("n_returned"),
            (F.sum(returned).cast("double") / F.count(F.lit(1))).alias("return_rate"),
        )
        .orderBy("discount_pct")
    )


# --- event-transition latency matrix ----------------------------------------


@register(
    "ev_transition_latency",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER w AS from_type,
               CAST(FLOOR(CAST(epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                               AS DOUBLE) / 1000000) AS BIGINT) AS gap_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT from_type, event_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(FLOOR(quantile_cont(gap_s, 0.5)) AS BIGINT) AS p50_s,
           CAST(FLOOR(quantile_cont(gap_s, 0.9)) AS BIGINT) AS p90_s
    FROM seq
    WHERE from_type IS NOT NULL
    GROUP BY from_type, event_type
    ORDER BY from_type, to_type
    """,
    description="seconds between consecutive event types per user (the latency companion to ev_markov_transitions — where journeys stall)",
)
def ev_transition_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ev_markov_transitions says WHERE users go next; this says HOW
    LONG they take — p50/p90 seconds for every from→to pair, the
    table that finds the stalled step in a journey. One user-ordered
    window produces both the previous type and the gap
    (floor-seconds: exact ints, same reasoning as
    ev_burstiness_profile), and interpolated percentiles over
    integers floor to the same bigint on both engines.

    Scale: one user_id window shuffle, then a map-side-combining
    rollup to |types|² rows. approx_percentile is the 100 TB swap-in.
    """
    ev = load_table(spark, sf_dir, "events")
    ts = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy(ts, "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
        F.floor(((ts - F.lag(ts).over(w)).cast("double")) / 1000000)
        .cast("bigint")
        .alias("gap_s"),
    ).where(F.col("from_type").isNotNull())
    return (
        seq.groupBy("from_type", "to_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            F.floor(F.percentile("gap_s", F.lit(0.5))).cast("bigint").alias("p50_s"),
            F.floor(F.percentile("gap_s", F.lit(0.9))).cast("bigint").alias("p90_s"),
        )
        .orderBy("from_type", "to_type")
    )


# --- cross-source duplication matrix ----------------------------------------


@register(
    "dedup_cross_source_matrix",
    oracle=f"""
    WITH j AS (
        SELECT doc_a, doc_b FROM ({_minhash_sql()})
    )
    SELECT LEAST(da.source, db.source) AS source_x,
           GREATEST(da.source, db.source) AS source_y,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN da.source = db.source THEN 1 ELSE 0 END) AS BIGINT)
             AS n_within
    FROM j
    JOIN documents da ON da.doc_id = j.doc_a
    JOIN documents db ON db.doc_id = j.doc_b
    GROUP BY 1, 2
    ORDER BY n_pairs DESC, source_x, source_y
    """,
    description="near-dup pairs by source pair (who copies whom — the mirror/syndication detection matrix)",
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which source pairs share content? Verified near-dup pairs
    rolled up by unordered source pair: heavy off-diagonal cells are
    mirrors/syndication (dedup ONE of them and keep provenance),
    heavy diagonal cells are self-repetitive sources
    (cur_near_dup_rate_by_source's within-source view). LEAST/GREATEST
    canonicalizes the pair so A→B and B→A land in one cell.

    Scale: the pair table is already LSH-bounded; the two doc_id
    lookups are equi-joins that broadcast at dim-scale source maps
    (the doc→source projection is 2 pushed columns). Output is
    ≤|sources|² rows with a deterministic total order.
    """
    from lime_etl_spark.operators.dedup import (
        JACCARD_TAU,
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents").persist()
    sh = doc_shingles(docs).persist()
    pairs = jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh))).where(
        F.col("jaccard") >= JACCARD_TAU
    )
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_x"),
            F.greatest("src_a", "src_b").alias("source_y"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.when(F.col("src_a") == F.col("src_b"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_within"),
        )
        .orderBy(F.desc("n_pairs"), "source_x", "source_y")
    )


# --- ship-delay trend -------------------------------------------------------


@register(
    "q_ship_delay_trend",
    oracle="""
    WITH lines AS (
        SELECT EXTRACT(year FROM o.o_orderdate) * 12
                 + EXTRACT(month FROM o.o_orderdate) AS idx,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)) AS delay
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), base AS (
        SELECT MIN(idx) AS idx0 FROM lines
    ), xy AS (
        SELECT idx - idx0 AS x, delay AS y FROM lines CROSS JOIN base
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM xy
    )
    SELECT n AS n_lines,
           n * sxy - sx * sy AS slope_num,
           n * sxx - sx * sx AS slope_den,
           CASE WHEN n * sxx - sx * sx > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)
                ELSE 0.0 END AS slope_days_per_month
    FROM s
    """,
    description="is fulfilment getting slower? exact-integer OLS slope of per-line ship delay over the order-month index",
)
def q_ship_delay_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operations-drift scalar: the OLS slope of ship delay (days
    from order to line shipment) against the order month, fitted at
    LINE grain so no intermediate mean pollutes the exactness — every
    Σ term is an exact int64 over (shifted month, delay-days) pairs
    and the slope is one IEEE division. Positive slope = fulfilment
    is slowing; q12's bucket view shows where, this shows the trend.

    Scale: the order-date lookup joins at fact grain on orderkey —
    the one unavoidable shuffle — then everything reduces to a 1-row
    sum state via map-side combine. Int64/2^53: n·Σxy ≈ n²·x̄·ȳ stays
    under 2^53 to ~10^7 lines; past that, pre-reduce to (x, y, count)
    cells first (same sums, |months|×|delays| cells).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lines = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("idx"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("delay"),
    ).persist()
    base = lines.agg(F.min("idx").alias("idx0"))
    xy = lines.join(F.broadcast(base)).select(
        (F.col("idx") - F.col("idx0")).alias("x"), F.col("delay").alias("y")
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        F.col("n").alias("n_lines"),
        num.alias("slope_num"),
        den.alias("slope_den"),
        F.when(den > 0, num.cast("double") / den).otherwise(0.0).alias(
            "slope_days_per_month"
        ),
    )


# --- quality-gate rule matrix -----------------------------------------------


@register(
    "cur_gate_rule_matrix",
    oracle=None,  # set just below (needs curation helpers at import time)
    description="per-rule fire counts, pairwise overlap, and unique-kill marginal contribution of the quality gate's rules",
)
def cur_gate_rule_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What does each gate rule actually buy? Per rule: how often it
    fires, how often it fires ALONE (unique_kills — the docs only
    this rule removes; a rule with zero unique kills is dead weight),
    and the pairwise overlap with every other rule. Uses the same
    thresholds as cur_quality_gate, but evaluates ALL rules per doc
    instead of short-circuiting, which is exactly what the verdict
    view cannot show.

    Scale: rule booleans are row-local expressions; one scalar
    rollup carries the 3 fire counters, 3 unique counters, and 3
    pairwise overlap counters — no shuffle beyond the final reduce.
    """
    from lime_etl_spark.functions.text import tokens, word_shingles
    from lime_etl_spark.operators.curation import (
        MAX_WORDS,
        MIN_WORDS,
        REP_N,
        REP_TAU,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens()
    grams = word_shingles(toks, REP_N)
    nw = F.size(toks)
    ratio = F.size(F.array_distinct(grams)).cast("double") / F.size(grams)
    flags = docs.select(
        (nw < MIN_WORDS).cast("int").alias("f_short"),
        (nw > MAX_WORDS).cast("int").alias("f_long"),
        (ratio < REP_TAU).cast("int").alias("f_rep"),
    )
    fs, fl, fr = F.col("f_short"), F.col("f_long"), F.col("f_rep")
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(fs).cast("bigint").alias("fires_short"),
        F.sum(fl).cast("bigint").alias("fires_long"),
        F.sum(fr).cast("bigint").alias("fires_rep"),
        F.sum(fs * (1 - fl) * (1 - fr)).cast("bigint").alias("unique_short"),
        F.sum(fl * (1 - fs) * (1 - fr)).cast("bigint").alias("unique_long"),
        F.sum(fr * (1 - fs) * (1 - fl)).cast("bigint").alias("unique_rep"),
        F.sum(fs * fl).cast("bigint").alias("both_short_long"),
        F.sum(fs * fr).cast("bigint").alias("both_short_rep"),
        F.sum(fl * fr).cast("bigint").alias("both_long_rep"),
        F.sum(F.greatest(fs, fl, fr)).cast("bigint").alias("killed_any"),
    )


def _gate_rule_matrix_oracle() -> str:
    from lime_etl_spark.operators.curation import (
        MAX_WORDS,
        MIN_WORDS,
        REP_N,
        REP_TAU,
        _gram_sql,
    )

    return f"""
    WITH flags AS (
        SELECT CASE WHEN nw < {MIN_WORDS} THEN 1 ELSE 0 END AS f_short,
               CASE WHEN nw > {MAX_WORDS} THEN 1 ELSE 0 END AS f_long,
               CASE WHEN CAST(nd AS DOUBLE) / ng < {REP_TAU} THEN 1 ELSE 0 END AS f_rep
        FROM (
            SELECT len(t) AS nw,
                   len({_gram_sql(REP_N)}) AS ng,
                   len(list_distinct({_gram_sql(REP_N)})) AS nd
            FROM (SELECT string_split(text, ' ') AS t FROM documents)
        )
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(f_short) AS BIGINT) AS fires_short,
           CAST(SUM(f_long) AS BIGINT) AS fires_long,
           CAST(SUM(f_rep) AS BIGINT) AS fires_rep,
           CAST(SUM(f_short * (1 - f_long) * (1 - f_rep)) AS BIGINT) AS unique_short,
           CAST(SUM(f_long * (1 - f_short) * (1 - f_rep)) AS BIGINT) AS unique_long,
           CAST(SUM(f_rep * (1 - f_short) * (1 - f_long)) AS BIGINT) AS unique_rep,
           CAST(SUM(f_short * f_long) AS BIGINT) AS both_short_long,
           CAST(SUM(f_short * f_rep) AS BIGINT) AS both_short_rep,
           CAST(SUM(f_long * f_rep) AS BIGINT) AS both_long_rep,
           CAST(SUM(GREATEST(f_short, f_long, f_rep)) AS BIGINT) AS killed_any
    FROM flags
    """


# attach the oracle after definition (helpers import cleanly here)
from lime_etl_spark.plans import registry as _registry  # noqa: E402

_spec = _registry._REGISTRY["cur_gate_rule_matrix"]
_registry._REGISTRY["cur_gate_rule_matrix"] = _registry.QuerySpec(
    _spec.name, _spec.builder, _gate_rule_matrix_oracle(), _spec.description
)
del _spec


# --- exact-integer hour anomaly ---------------------------------------------

ANOM_K = 3  # flag when (c-mu)^2 > K^2 * sigma^2, i.e. |z| > K


@register(
    "ev_hour_anomaly_exact",
    oracle=f"""
    WITH hourly AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), keyed AS (
        SELECT d, h, c, CAST(EXTRACT(isodow FROM d) AS BIGINT) AS wd
        FROM hourly
    ), baseline AS (
        SELECT wd, h,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) AS s,
               CAST(SUM(c * c) AS BIGINT) AS sq
        FROM keyed GROUP BY wd, h
    )
    SELECT d, h, c, n_weeks, baseline_mean, direction
    FROM (
        SELECT k.d, k.h, k.c, b.n AS n_weeks,
               b.n - 1 AS np, b.s - k.c AS sp, b.sq - k.c * k.c AS sqp,
               CAST(b.s - k.c AS DOUBLE) / (b.n - 1) AS baseline_mean,
               CASE WHEN k.c * (b.n - 1) > b.s - k.c
                    THEN 'high' ELSE 'low' END AS direction
        FROM keyed k JOIN baseline b ON b.wd = k.wd AND b.h = k.h
    )
    WHERE np >= 3
      AND (c * np - sp) * (c * np - sp)
            > {ANOM_K * ANOM_K} * (np * sqp - sp * sp)
    ORDER BY d, h
    """,
    description="hour-grain load anomalies vs the weekday-hour baseline, decided ENTIRELY in integer arithmetic ((nc−S)² > K²(nΣc²−S²) — no float boundary)",
)
def ev_hour_anomaly_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which hours broke their own weekday pattern? Hourly counts are
    compared against the same-weekday-same-hour baseline with the
    point itself LEFT OUT (a spike inflates its own σ enough to mask
    itself otherwise), and the |z| > {ANOM_K} decision is multiplied
    out to (n'·c − S')² > {ANOM_K}²·(n'·Σc²' − S'²) — pure integer
    arithmetic, so the flag boundary CANNOT drift between engines
    (the usual μ/σ float dance has no say). Only the reported
    baseline_mean pays a division, after the decision is made.

    Scale: the hourly rollup combines map-side to |days|×24 rows; the
    baseline reduce is 7×24 rows broadcast back. Int64: (n·c)² needs
    c·n < 3e9 — at 10^6 events/hour and 3 years of weeks, switch the
    comparison operands to decimal(38,0); the structure is unchanged.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.to_date("ts").alias("d"), F.hour("ts").cast("bigint").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    keyed = hourly.withColumn("wd", F.dayofweek("d").cast("bigint")).withColumn(
        # dayofweek is 1=Sunday; isodow is 1=Monday — normalize to isodow
        "wd",
        F.when(F.col("wd") == 1, F.lit(7)).otherwise(F.col("wd") - 1),
    )
    baseline = keyed.groupBy("wd", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sq"),
    )
    jt = keyed.join(F.broadcast(baseline), ["wd", "h"])
    # leave-one-out baseline: a big spike otherwise inflates its own
    # σ and masks itself (a 6× spike over 5 weeks scores only z≈2)
    np_ = F.col("n") - 1
    sp = F.col("s") - F.col("c")
    sqp = F.col("sq") - F.col("c") * F.col("c")
    dev = F.col("c") * np_ - sp
    var_num = np_ * sqp - sp * sp
    return (
        jt.where((np_ >= 3) & (dev * dev > ANOM_K * ANOM_K * var_num))
        .select(
            "d",
            "h",
            "c",
            F.col("n").alias("n_weeks"),
            (sp.cast("double") / np_).alias("baseline_mean"),
            F.when(dev > 0, "high").otherwise("low").alias("direction"),
        )
        .orderBy("d", "h")
    )


# --- language-ID ambiguity shortlist ----------------------------------------

LANGID_MARGIN_MAX = 1
LANGID_SHORTLIST_K = 100


def _langid_margin_oracle() -> str:
    from lime_etl_spark.operators.text import (
        LANG_PROFILES,
        _hits_sql,
        _langid_case_sql,
    )

    hit_list = ", ".join(_hits_sql(w) for _, w in sorted(LANG_PROFILES.items()))
    k = len(LANG_PROFILES)
    return f"""
    WITH scored AS (
        SELECT doc_id, lang, {_langid_case_sql()} AS pred_lang,
               list_sort([{hit_list}]) AS hs
        FROM documents
    )
    SELECT doc_id, lang, pred_lang,
           CAST(hs[{k}] AS BIGINT) AS top_hits,
           CAST(hs[{k}] - hs[{k - 1}] AS BIGINT) AS margin
    FROM scored
    WHERE hs[{k}] - hs[{k - 1}] <= {LANGID_MARGIN_MAX}
    ORDER BY margin, doc_id
    LIMIT {LANGID_SHORTLIST_K}
    """


@register(
    "txt_langid_margin",
    oracle=None,  # attached below (imports text helpers at def time)
    description="docs where the language classifier nearly tied (top1−top2 stopword hits ≤ margin) — the ambiguity review queue behind the confusion matrix",
)
def txt_langid_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The review queue the confusion matrix points at: documents
    where the stopword classifier's top two languages are within
    {LANGID_MARGIN_MAX} hit(s) of each other. Margins are differences
    of exact integer hit counts (sorted with array_sort, so top-2
    extraction needs no argmax tie dance), making the shortlist
    boundary exact cross-engine.

    Scale: scoring is row-local in the scan projection (the same
    expressions txt_langid compiles); only the bounded ORDER
    BY margin LIMIT {LANGID_SHORTLIST_K} shortlist sorts, and it sorts
    the filtered ambiguous subset, not the corpus.
    """
    from lime_etl_spark.operators.text import LANG_PROFILES, _hits
    from lime_etl_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens()
    hits = {lang: _hits(toks, words) for lang, words in LANG_PROFILES.items()}
    m = F.greatest(*hits.values())
    expr = None
    for lang in sorted(LANG_PROFILES):
        cond = hits[lang] == m
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    hs = F.array_sort(F.array(*[hits[lang] for lang, _ in sorted(LANG_PROFILES.items())]))
    k = len(LANG_PROFILES)
    top = F.element_at(hs, k).cast("bigint")
    margin = (F.element_at(hs, k) - F.element_at(hs, k - 1)).cast("bigint")
    return (
        docs.select(
            "doc_id",
            "lang",
            expr.alias("pred_lang"),
            top.alias("top_hits"),
            margin.alias("margin"),
        )
        .where(F.col("margin") <= LANGID_MARGIN_MAX)
        .orderBy("margin", "doc_id")
        .limit(LANGID_SHORTLIST_K)
    )


_spec = _registry._REGISTRY["txt_langid_margin"]
_registry._REGISTRY["txt_langid_margin"] = _registry.QuerySpec(
    _spec.name, _spec.builder, _langid_margin_oracle(), _spec.description
)
del _spec


# --- priority × region independence residuals -------------------------------


@register(
    "q_priority_region_independence",
    oracle="""
    WITH cells AS (
        SELECT r.r_name, o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2
    ), marg AS (
        SELECT r_name, CAST(SUM(n_obs) AS BIGINT) AS n_r FROM cells GROUP BY r_name
    ), marg_p AS (
        SELECT o_orderpriority, CAST(SUM(n_obs) AS BIGINT) AS n_p
        FROM cells GROUP BY o_orderpriority
    ), total AS (
        SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM cells
    )
    SELECT c.r_name, c.o_orderpriority, c.n_obs,
           CAST(mr.n_r * mp.n_p AS DOUBLE) / t.n AS expected,
           t.n * c.n_obs - mr.n_r * mp.n_p AS resid_num,
           CAST(t.n * c.n_obs - mr.n_r * mp.n_p AS DOUBLE)
             / sqrt(CAST(t.n * mr.n_r * mp.n_p AS DOUBLE)) AS pearson_resid
    FROM cells c
    JOIN marg mr ON mr.r_name = c.r_name
    JOIN marg_p mp ON mp.o_orderpriority = c.o_orderpriority
    CROSS JOIN total t
    ORDER BY c.r_name, c.o_orderpriority
    """,
    description="priority × region contingency residuals ((N·O − n_r·n_p)/√(N·n_r·n_p) over exact integers — where the mix deviates from independence)",
)
def q_priority_region_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does order priority depend on region? The full contingency
    table with Pearson residuals, the per-cell version of a
    chi-square test: resid = (O−E)/√E re-arranged so the numerator
    N·O − n_r·n_p is an EXACT integer and the denominator is one
    √ of an exact product — no float drift in the ranking, and the
    cells that drive dependence are immediately visible.

    Scale: dims broadcast down the orders join; the cell rollup is
    |regions|×|priorities| rows, marginals derive from the cells (no
    re-scan), and every join after the rollup is a broadcast.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cells = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name", "o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
        .persist()
    )
    marg_r = cells.groupBy("r_name").agg(F.sum("n_obs").cast("bigint").alias("n_r"))
    marg_p = cells.groupBy("o_orderpriority").agg(
        F.sum("n_obs").cast("bigint").alias("n_p")
    )
    total = cells.agg(F.sum("n_obs").cast("bigint").alias("n"))
    jt = (
        cells.join(F.broadcast(marg_r), "r_name")
        .join(F.broadcast(marg_p), "o_orderpriority")
        .join(F.broadcast(total))
    )
    resid_num = F.col("n") * F.col("n_obs") - F.col("n_r") * F.col("n_p")
    return jt.select(
        "r_name",
        "o_orderpriority",
        "n_obs",
        ((F.col("n_r") * F.col("n_p")).cast("double") / F.col("n")).alias("expected"),
        resid_num.alias("resid_num"),
        (
            resid_num.cast("double")
            / F.sqrt((F.col("n") * F.col("n_r") * F.col("n_p")).cast("double"))
        ).alias("pearson_resid"),
    ).orderBy("r_name", "o_orderpriority")


# --- resurrection gap histogram ---------------------------------------------


@register(
    "ev_resurrection_gaps",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        FROM events
    ), lagged AS (
        SELECT user_id, d,
               LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
        FROM ud
    )
    SELECT CAST(date_diff('day', prev_d, d) AS BIGINT) AS gap_days,
           CAST(COUNT(*) AS BIGINT) AS n_returns,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM lagged
    WHERE prev_d IS NOT NULL AND date_diff('day', prev_d, d) >= 2
    GROUP BY 1
    ORDER BY gap_days
    """,
    description="how long do users stay away before coming back? absence-gap histogram of day-grain returns (the win-back window evidence)",
)
def ev_resurrection_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ev_user_lifecycle counts comebacks; this measures HOW LONG the
    absent stayed absent — the day-gap histogram of every return
    after ≥2 days away, which separates 'skipped a day' from
    'genuinely lapsed and won back' and prices the win-back window.
    Gap keys are exact integer day-diffs between distinct active
    days, so the histogram is float-free.

    Scale: the (user, day) dedup combines map-side; the lag rides one
    user_id window shuffle; the rollup is ≤|days| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    lagged = ud.withColumn("prev_d", F.lag("d").over(w))
    gap_days = F.datediff("d", "prev_d")
    return (
        lagged.where(F.col("prev_d").isNotNull() & (gap_days >= 2))
        .groupBy(gap_days.cast("bigint").alias("gap_days"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_returns"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("gap_days")
    )


# --- realized discount by year ----------------------------------------------


@register(
    "q_realized_discount_by_year",
    oracle="""
    SELECT EXTRACT(year FROM l.l_shipdate) AS ship_year,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(l.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS discount_amt,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(l.l_discount AS DECIMAL(4,2))) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS realized_rate
    FROM lineitem l
    GROUP BY 1
    ORDER BY ship_year
    """,
    description="revenue-weighted realized discount rate per ship year (is discounting drifting — the margin-erosion trend)",
)
def q_realized_discount_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The margin-erosion trend: Σ(price·discount)/Σprice per year —
    the REVENUE-weighted discount actually granted, which an
    unweighted mean of l_discount misstates whenever big lines get
    different discounts than small ones. Both Σ terms are exact
    decimal sums; the rate is one division of their double casts
    (numerator and denominator each exactly representable at test
    magnitudes, division correctly rounded).

    Scale: one scan, three pushed columns, per-year map-side combine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    gross = F.sum(dec("l_extendedprice"))
    disc = F.sum(dec("l_extendedprice") * dec("l_discount", 2, 4))
    return (
        li.groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            gross.cast("double").alias("gross"),
            disc.cast("double").alias("discount_amt"),
            (disc.cast("double") / gross.cast("double")).alias("realized_rate"),
        )
        .orderBy("ship_year")
    )


# --- head-coverage curve ----------------------------------------------------

HEAD_KS = (10, 100, 1000)


@register(
    "txt_head_coverage",
    oracle=f"""
    WITH counts AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        GROUP BY token
    ), ranked AS (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rn
        FROM counts
    ), total AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types
        FROM counts
    )
    SELECT k, n_types, n_tokens, head_tokens,
           CAST(head_tokens AS DOUBLE) / n_tokens AS coverage
    FROM (
        {" UNION ALL ".join(
            f"SELECT CAST({k} AS BIGINT) AS k, t.n_types, t.n_tokens, "
            f"(SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) FROM ranked WHERE rn <= {k}) AS head_tokens "
            "FROM total t"
            for k in HEAD_KS
        )}
    )
    ORDER BY k
    """,
    description="share of token mass covered by the top-k most frequent types (the tokenizer/compression head-coverage curve)",
)
def txt_head_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of the corpus is just its most common words? Coverage
    of the top-{{10,100,1000}} types — the curve that sizes tokenizer
    vocabularies and predicts compression (txt_zipf_audit shows the
    decay law; this integrates it). Ranking ties break on the token
    string so the top-k boundary is a total order; counts are exact
    and coverage is one division per row.

    Scale: one (token → count) reduce; each top-k is a
    TakeOrdered(k) over the rollup — no global sort materializes the
    vocabulary; the count rollup is persisted across the three k's.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .persist()
    )
    total = counts.agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
    )
    parts = []
    for k in HEAD_KS:
        head = (
            counts.orderBy(F.desc("cnt"), "token")
            .limit(k)
            .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("head_tokens"))
        )
        parts.append(
            head.crossJoin(F.broadcast(total)).select(
                F.lit(k).cast("bigint").alias("k"),
                "n_types",
                "n_tokens",
                "head_tokens",
                (F.col("head_tokens").cast("double") / F.col("n_tokens")).alias(
                    "coverage"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("k")


# --- monthly whale share ----------------------------------------------------


@register(
    "q_monthly_whale_share",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month_key,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_order,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS whale_share
    FROM orders
    GROUP BY 1
    ORDER BY month_key
    """,
    description="largest single order's share of each month's revenue (whale dependence over time — the revenue-at-risk pulse)",
)
def q_monthly_whale_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of each month hangs on ONE order? max/Σ per month —
    the fastest-moving concentration signal (q_customer_concentration
    _hhi is the structural view; this is the monthly pulse that pages
    someone). Decimal-exact MAX and SUM, one division.

    Scale: single scan, two pushed columns, month-keyed map-side
    combine to |months| rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    tot = F.sum(dec("o_totalprice"))
    mx = F.max(dec("o_totalprice"))
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month_key"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            tot.cast("double").alias("total_value"),
            mx.cast("double").alias("max_order"),
            (mx.cast("double") / tot.cast("double")).alias("whale_share"),
        )
        .orderBy("month_key")
    )


# --- representative length bias ---------------------------------------------


@register(
    "cur_rep_length_bias",
    oracle=f"""
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
    cc AS (
        SELECT vid AS doc_id, CAST(MIN(lab) AS BIGINT) AS component_id
        FROM reach GROUP BY vid
    ),
    clusters AS (
        SELECT cc.component_id,
               CAST(COUNT(*) AS BIGINT) AS size,
               CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars,
               CAST(MAX(d.n_chars) AS BIGINT) AS max_chars,
               CAST(MIN(d.n_chars) AS BIGINT) AS min_chars,
               CAST(MAX(CASE WHEN d.doc_id = cc.component_id
                             THEN d.n_chars END) AS BIGINT) AS rep_chars
        FROM cc JOIN documents d ON d.doc_id = cc.doc_id
        GROUP BY cc.component_id
        HAVING COUNT(*) >= 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_multi_clusters,
           CAST(SUM(CASE WHEN rep_chars = max_chars THEN 1 ELSE 0 END) AS BIGINT)
             AS rep_is_longest,
           CAST(SUM(CASE WHEN rep_chars = min_chars THEN 1 ELSE 0 END) AS BIGINT)
             AS rep_is_shortest,
           CAST(SUM(rep_chars) AS BIGINT) AS total_rep_chars,
           CAST(SUM(max_chars) AS BIGINT) AS total_best_chars,
           CAST(SUM(rep_chars) AS DOUBLE) / SUM(max_chars) AS rep_vs_best_ratio
    FROM clusters
    """,
    description="is the min-id cluster representative systematically shorter than the best member? (the survivorship-bias audit on dedup's keep rule)",
)
def cur_rep_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup keeps the MIN-doc_id member of each cluster — an
    arbitrary rule that silently biases the kept corpus if id order
    correlates with anything (crawl order usually does). This audits
    the rule against the length-maximal alternative: how often the
    kept rep is already the longest member, and how many characters
    cur_best_rep_dedup's pick-the-longest rule would add. All counts
    and char sums are exact ints; the ratio is one division.

    Scale: inherits the component pipeline; the per-cluster reduce
    carries 5 integer aggregates and the final rollup is 1 row.
    """
    from lime_etl_spark.operators.graph import dedup_components

    docs = load_table(spark, sf_dir, "documents")
    cc = dedup_components(spark, sf_dir)
    jt = cc.join(docs.select("doc_id", "n_chars"), "doc_id")
    clusters = (
        jt.groupBy("component_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("size"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max(
                F.when(F.col("doc_id") == F.col("component_id"), F.col("n_chars"))
            )
            .cast("bigint")
            .alias("rep_chars"),
        )
        .where(F.col("size") >= 2)
    )
    return clusters.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_multi_clusters"),
        F.sum(F.when(F.col("rep_chars") == F.col("max_chars"), 1).otherwise(0))
        .cast("bigint")
        .alias("rep_is_longest"),
        F.sum(F.when(F.col("rep_chars") == F.col("min_chars"), 1).otherwise(0))
        .cast("bigint")
        .alias("rep_is_shortest"),
        F.sum("rep_chars").cast("bigint").alias("total_rep_chars"),
        F.sum("max_chars").cast("bigint").alias("total_best_chars"),
        (F.sum("rep_chars").cast("double") / F.sum("max_chars")).alias(
            "rep_vs_best_ratio"
        ),
    )


# --- ANN bucket balance and probe cost --------------------------------------


@register(
    "ann_bucket_balance",
    oracle=None,  # set below: shares similarity._BUCKET_SQL
    description="IVF bucket occupancy (sign-quantizer load balance — the skew audit behind probe-cost planning)",
)
def ann_bucket_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How even is the sign-bit coarse quantizer's load? Per-bucket
    vector counts with each bucket's share — the skew audit that
    decides whether self-probe search has a hot-bucket problem
    (a bucket holding 10% of vectors makes 10% of queries pay a 25×
    candidate bill at 256 buckets). Counts exact; share is one
    division by the broadcast total.

    Scale: one scan, row-local bucket expression, ≤256-row rollup.
    """
    from lime_etl_spark.operators.similarity import ivf_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    counts = emb.select(ivf_bucket(F.col("embedding")).alias("bucket")).groupBy(
        "bucket"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
    total = counts.agg(F.sum("n_vecs").cast("bigint").alias("n_total"))
    return (
        counts.join(F.broadcast(total))
        .select(
            "bucket",
            "n_vecs",
            (F.col("n_vecs").cast("double") / F.col("n_total")).alias("share"),
        )
        .orderBy("bucket")
    )


def _bucket_balance_oracle() -> str:
    from lime_etl_spark.operators.similarity import _BUCKET_SQL

    return f"""
    WITH counts AS (
        SELECT ({_BUCKET_SQL}) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM embeddings GROUP BY 1
    ), total AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS n_total FROM counts)
    SELECT bucket, n_vecs,
           CAST(n_vecs AS DOUBLE) / n_total AS share
    FROM counts CROSS JOIN total
    ORDER BY bucket
    """


_spec = _registry._REGISTRY["ann_bucket_balance"]
_registry._REGISTRY["ann_bucket_balance"] = _registry.QuerySpec(
    _spec.name, _spec.builder, _bucket_balance_oracle(), _spec.description
)
del _spec


@register(
    "ann_probe_cost",
    oracle=None,  # set below
    description="closed-form candidate counts per probe strategy (self / +hamming-1 / brute force) from bucket occupancies — the cost half of ann_tuning_curve",
)
def ann_probe_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_tuning_curve MEASURES recall per strategy; this computes
    the matching cost in closed form from bucket occupancies alone:
    self-probe scores Σ n_b·(n_b−1) ordered pairs, Hamming-1
    multiprobe adds Σ_b n_b·Σᵢ n_{b⊕2ᶦ}, brute force pays N·(N−1).
    Exact integer pair counts; scan_fraction is one division — so the
    cost side of the probe decision needs no experiment at all.

    Scale: works entirely on the ≤256-row bucket rollup; the
    Hamming-1 expansion is 256×8 rows joined back to the rollup —
    constant work regardless of vector count.
    """
    from lime_etl_spark.operators.similarity import ivf_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    counts = (
        emb.select(ivf_bucket(F.col("embedding")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
        .persist()
    )
    total = counts.agg(F.sum("n_vecs").cast("bigint").alias("n"))
    self_pairs = counts.agg(
        F.sum(F.col("n_vecs") * (F.col("n_vecs") - 1)).cast("bigint").alias("p")
    )
    bits = spark.createDataFrame([(1 << i,) for i in range(8)], "bit int")
    neigh = (
        counts.crossJoin(F.broadcast(bits))
        .select(
            F.expr("bucket ^ bit").alias("nbucket"),
            F.col("n_vecs").alias("n_src"),
        )
        .join(
            F.broadcast(
                counts.select(
                    F.col("bucket").alias("nbucket"), F.col("n_vecs").alias("n_dst")
                )
            ),
            "nbucket",
        )
        .agg(F.sum(F.col("n_src") * F.col("n_dst")).cast("bigint").alias("h1"))
    )
    jt = (
        self_pairs.crossJoin(F.broadcast(neigh))
        .crossJoin(F.broadcast(total))
        .persist()
    )
    brute = F.col("n") * (F.col("n") - 1)
    rows = [
        jt.select(
            F.lit("self").alias("strategy"),
            F.col("p").alias("candidate_pairs"),
            (F.col("p").cast("double") / brute.cast("double")).alias("scan_fraction"),
        ),
        jt.select(
            F.lit("self_hamming1").alias("strategy"),
            (F.col("p") + F.col("h1")).alias("candidate_pairs"),
            (
                (F.col("p") + F.col("h1")).cast("double") / brute.cast("double")
            ).alias("scan_fraction"),
        ),
        jt.select(
            F.lit("brute").alias("strategy"),
            brute.alias("candidate_pairs"),
            F.lit(1.0).alias("scan_fraction"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("strategy")


def _probe_cost_oracle() -> str:
    from lime_etl_spark.operators.similarity import _BUCKET_SQL

    return f"""
    WITH counts AS (
        SELECT ({_BUCKET_SQL}) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM embeddings GROUP BY 1
    ), total AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS n FROM counts),
    sp AS (
        SELECT CAST(SUM(n_vecs * (n_vecs - 1)) AS BIGINT) AS p FROM counts
    ),
    h1 AS (
        SELECT CAST(SUM(c.n_vecs * d.n_vecs) AS BIGINT) AS h1
        FROM counts c
        CROSS JOIN (SELECT unnest([1, 2, 4, 8, 16, 32, 64, 128]) AS bit)
        JOIN counts d ON d.bucket = xor(c.bucket, bit)
    )
    SELECT 'brute' AS strategy,
           CAST(t.n * (t.n - 1) AS BIGINT) AS candidate_pairs,
           1.0 AS scan_fraction
    FROM total t
    UNION ALL
    SELECT 'self', s.p,
           CAST(s.p AS DOUBLE) / (t.n * (t.n - 1))
    FROM sp s CROSS JOIN total t
    UNION ALL
    SELECT 'self_hamming1', s.p + h.h1,
           CAST(s.p + h.h1 AS DOUBLE) / (t.n * (t.n - 1))
    FROM sp s CROSS JOIN h1 h CROSS JOIN total t
    ORDER BY strategy
    """


_spec = _registry._REGISTRY["ann_probe_cost"]
_registry._REGISTRY["ann_probe_cost"] = _registry.QuerySpec(
    _spec.name, _spec.builder, _probe_cost_oracle(), _spec.description
)
del _spec


# --- supplier delay scorecard -----------------------------------------------

DELAY_MIN_LINES = 20
DELAY_TOP_K = 20


@register(
    "q_supplier_delay_scorecard",
    oracle=f"""
    WITH d AS (
        SELECT l.l_suppkey,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)) AS delay
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ), per_supp AS (
        SELECT l_suppkey,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(FLOOR(quantile_cont(delay, 0.5)) AS BIGINT) AS p50_delay,
               CAST(FLOOR(quantile_cont(delay, 0.9)) AS BIGINT) AS p90_delay,
               CAST(MAX(delay) AS BIGINT) AS max_delay
        FROM d GROUP BY l_suppkey
        HAVING COUNT(*) >= {DELAY_MIN_LINES}
    )
    SELECT s.s_name, p.n_lines, p.p50_delay, p.p90_delay, p.max_delay
    FROM per_supp p JOIN supplier s ON s.s_suppkey = p.l_suppkey
    ORDER BY p.p90_delay DESC, p.p50_delay DESC, s.s_name
    LIMIT {DELAY_TOP_K}
    """,
    description="slowest suppliers by tail ship delay (p50/p90/max days, volume-gated) — the vendor scorecard q21 blames and this quantifies",
)
def q_supplier_delay_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Who actually ships late? Per-supplier delay percentiles with a
    volume gate (a supplier with 3 lines has no tail), ranked by p90
    so chronic tail-latency outranks one bad month. Day delays are
    exact ints; floor-interpolated percentiles match cross-engine;
    the (p90 desc, p50 desc, name) order is total so the LIMIT edge
    is deterministic.

    Scale: one orderkey-join shuffle at fact grain, then a
    map-side-combining supplier reduce; the supplier dim broadcasts
    onto the ≤|suppliers| rollup. approx_percentile is the 100 TB
    swap-in.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    d = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_suppkey",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("delay"),
    )
    per_supp = (
        d.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.floor(F.percentile("delay", F.lit(0.5))).cast("bigint").alias("p50_delay"),
            F.floor(F.percentile("delay", F.lit(0.9))).cast("bigint").alias("p90_delay"),
            F.max("delay").cast("bigint").alias("max_delay"),
        )
        .where(F.col("n_lines") >= DELAY_MIN_LINES)
    )
    return (
        per_supp.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            per_supp.l_suppkey == F.col("s_suppkey"),
        )
        .select("s_name", "n_lines", "p50_delay", "p90_delay", "max_delay")
        .orderBy(F.desc("p90_delay"), F.desc("p50_delay"), "s_name")
        .limit(DELAY_TOP_K)
    )


# --- average order value trend ----------------------------------------------


@register(
    "q_aov_trend",
    oracle="""
    WITH m AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month_key,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                 AS aov
        FROM orders GROUP BY 1
    )
    SELECT month_key, n_orders, revenue, aov,
           aov - LAG(aov) OVER (ORDER BY month_key) AS aov_mom_delta
    FROM m
    ORDER BY month_key
    """,
    description="average order value per month with month-over-month delta (selling more-but-cheaper decouples volume from revenue — this catches it)",
)
def q_aov_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume up but revenue flat means the basket is shrinking —
    AOV per month with its MoM delta makes the decoupling visible in
    one table. AOV is one division of a decimal-exact sum by an exact
    count; the delta subtracts two bit-identical doubles, so even the
    derived column hash-matches.

    Scale: month-keyed map-side rollup; the lag window sorts
    |months| rows on one partition — bounded by the calendar, not
    the data.
    """
    orders = load_table(spark, sf_dir, "orders")
    aov = F.sum(dec("o_totalprice")).cast("double") / F.count(F.lit(1))
    m = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month_key")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        aov.alias("aov"),
    )
    w = Window.orderBy("month_key")
    return m.select(
        "month_key",
        "n_orders",
        "revenue",
        "aov",
        (F.col("aov") - F.lag("aov").over(w)).alias("aov_mom_delta"),
    ).orderBy("month_key")


# --- split balance audit ----------------------------------------------------


@register(
    "samp_split_balance",
    oracle=None,  # set below: shares training's bucket SQL
    description="label balance across the train/val/test hash split (contingency residuals with exact integer numerators — the eval-validity audit)",
)
def samp_split_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the 80/10/10 split language-balanced, or did the hash
    accidentally concentrate a language in test? The (split × lang)
    contingency table with Pearson residuals — exact integer
    numerators N·n_obs − n_s·n_l rank the imbalanced cells without
    float drift (q_priority_region_independence's machinery pointed
    at eval validity). Large residuals here invalidate cross-split
    comparisons BEFORE any model sees the data.

    Scale: the split expression is row-local (same bucket hash as
    samp_hash_split, so this audits the REAL split); one
    |splits|×|langs| rollup, marginals derived from it, broadcasts
    after.
    """
    from lime_etl_spark.operators.training import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), 100)
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    cells = (
        docs.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
        .persist()
    )
    marg_s = cells.groupBy("split").agg(F.sum("n_obs").cast("bigint").alias("n_s"))
    marg_l = cells.groupBy("lang").agg(F.sum("n_obs").cast("bigint").alias("n_l"))
    total = cells.agg(F.sum("n_obs").cast("bigint").alias("n"))
    jt = (
        cells.join(F.broadcast(marg_s), "split")
        .join(F.broadcast(marg_l), "lang")
        .join(F.broadcast(total))
    )
    resid_num = F.col("n") * F.col("n_obs") - F.col("n_s") * F.col("n_l")
    return jt.select(
        "split",
        "lang",
        "n_obs",
        ((F.col("n_s") * F.col("n_l")).cast("double") / F.col("n")).alias("expected"),
        resid_num.alias("resid_num"),
        (
            resid_num.cast("double")
            / F.sqrt((F.col("n") * F.col("n_s") * F.col("n_l")).cast("double"))
        ).alias("pearson_resid"),
    ).orderBy("split", "lang")


def _split_balance_oracle() -> str:
    from lime_etl_spark.operators.training import _bucket_sql

    b = _bucket_sql("doc_id", 100)
    return f"""
    WITH cells AS (
        SELECT CASE WHEN {b} < 80 THEN 'train'
                    WHEN {b} < 90 THEN 'val'
                    ELSE 'test' END AS split,
               lang, CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM documents GROUP BY 1, 2
    ), ms AS (
        SELECT split, CAST(SUM(n_obs) AS BIGINT) AS n_s FROM cells GROUP BY split
    ), ml AS (
        SELECT lang, CAST(SUM(n_obs) AS BIGINT) AS n_l FROM cells GROUP BY lang
    ), total AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM cells)
    SELECT c.split, c.lang, c.n_obs,
           CAST(ms.n_s * ml.n_l AS DOUBLE) / t.n AS expected,
           t.n * c.n_obs - ms.n_s * ml.n_l AS resid_num,
           CAST(t.n * c.n_obs - ms.n_s * ml.n_l AS DOUBLE)
             / sqrt(CAST(t.n * ms.n_s * ml.n_l AS DOUBLE)) AS pearson_resid
    FROM cells c
    JOIN ms ON ms.split = c.split
    JOIN ml ON ml.lang = c.lang
    CROSS JOIN total t
    ORDER BY c.split, c.lang
    """


_spec = _registry._REGISTRY["samp_split_balance"]
_registry._REGISTRY["samp_split_balance"] = _registry.QuerySpec(
    _spec.name, _spec.builder, _split_balance_oracle(), _spec.description
)
del _spec


# --- rare-token-rich documents ----------------------------------------------

RARE_TOP_K = 30


@register(
    "txt_rare_token_docs",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), freq AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token
    ), ranked AS (
        SELECT token, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt, token) AS rn,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_types
        FROM freq
    ), rare AS (
        SELECT token FROM ranked
        WHERE rn <= GREATEST(1, CAST(FLOOR(n_types / 10.0) AS BIGINT))
    ), per_doc AS (
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN r.token IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_rare
        FROM tok t LEFT JOIN rare r ON r.token = t.token
        GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens, n_rare,
           CAST(n_rare AS DOUBLE) / n_tokens AS rare_ratio
    FROM per_doc
    WHERE n_rare > 0
    ORDER BY n_rare DESC, doc_id
    LIMIT {RARE_TOP_K}
    """,
    description="documents richest in the corpus's bottom-decile-frequency tokens (the irreplaceable-content shortlist — what dedup and caps must NOT delete)",
)
def txt_rare_token_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The opposite of a duplicate: the documents carrying the
    corpus's RAREST vocabulary (the lowest-frequency decile of types,
    with a (cnt, token) total order so the rare set is deterministic
    on any corpus — absolute hapax would be empty on template-heavy
    vocabularies). Delete one of these (dedup over-merge, per-user
    caps, a tight gate) and cur_dedup_vocab_loss ticks up. Top-k by
    exact rare-token count; ratio is one division.

    Scale: the frequency reduce is |vocab| state; the rare-set rank
    sorts |vocab| rows (vocabulary ≪ corpus by Heaps' law — this is
    a rollup sort, not a data sort) and broadcasts as a semi-join
    probe; the per-doc rollup combines map-side and the shortlist is
    TakeOrdered(k).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wn = Window.orderBy("cnt", "token")
    ranked = freq.select(
        "token",
        F.row_number().over(wn).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("n_types"),
    )
    rare = ranked.where(
        F.col("rn")
        <= F.greatest(F.lit(1), F.floor(F.col("n_types") / 10.0).cast("bigint"))
    ).select("token", F.lit(1).alias("is_rare"))
    per_doc = (
        tok.join(F.broadcast(rare), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.coalesce("is_rare", F.lit(0))).cast("bigint").alias("n_rare"),
        )
        .where(F.col("n_rare") > 0)
    )
    return (
        per_doc.select(
            "doc_id",
            "n_tokens",
            "n_rare",
            (F.col("n_rare").cast("double") / F.col("n_tokens")).alias("rare_ratio"),
        )
        .orderBy(F.desc("n_rare"), "doc_id")
        .limit(RARE_TOP_K)
    )


# --- conversion by session depth --------------------------------------------


@register(
    "ev_conversion_by_depth",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
               CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), sess AS (
        SELECT user_id, event_type,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM flagged
    ), per_session AS (
        SELECT user_id, session_seq,
               CAST(COUNT(*) AS BIGINT) AS depth,
               CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
                 AS converted
        FROM sess GROUP BY user_id, session_seq
    )
    SELECT CAST(LEAST(depth, 10) AS BIGINT) AS depth_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS conversion_rate
    FROM per_session
    GROUP BY 1
    ORDER BY depth_bucket
    """,
    description="conversion rate as a function of session depth (≤10+ bucket) — does engagement depth buy conversion, and where does it saturate",
)
def ev_conversion_by_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does a longer session actually convert better? Conversion rate
    per session-depth bucket (capped at 10+ so the tail doesn't
    shred into singleton buckets) over the SHARED sessionization —
    the saturation point of this curve is where nudging users deeper
    stops paying. Counters exact; rate is one division per bucket.

    Scale: sessionize rides one user_id shuffle; the per-session
    reduce and the depth-bucket rollup both combine map-side;
    output is ≤10 rows.
    """
    from lime_etl_spark.operators.events import sessionize

    ev = load_table(spark, sf_dir, "events")
    per_session = (
        sessionize(ev)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("depth"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("converted"),
        )
    )
    return (
        per_session.groupBy(
            F.least(F.col("depth"), F.lit(10)).cast("bigint").alias("depth_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("converted").cast("bigint").alias("n_converted"),
            (F.sum("converted").cast("double") / F.count(F.lit(1))).alias(
                "conversion_rate"
            ),
        )
        .orderBy("depth_bucket")
    )


# --- weekday peakiness ------------------------------------------------------


@register(
    "ev_peakiness_by_weekday",
    oracle="""
    WITH hourly AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(EXTRACT(isodow FROM ts) AS BIGINT) AS wd,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2, 3
    ), cell AS (
        SELECT wd, h,
               CAST(SUM(c) AS BIGINT) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(c) AS DOUBLE) / COUNT(*) AS avg_load
        FROM hourly GROUP BY wd, h
    )
    SELECT wd,
           CAST(MAX(avg_load) AS DOUBLE) AS peak_avg,
           CAST(MIN(avg_load) AS DOUBLE) AS trough_avg,
           CAST(MAX(avg_load) AS DOUBLE) / MIN(avg_load) AS peak_trough_ratio
    FROM cell
    GROUP BY wd
    ORDER BY wd
    """,
    description="peak-to-trough hourly load ratio per weekday (capacity headroom: a ratio of 4 means 75% idle at trough if sized for peak)",
)
def ev_peakiness_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How spiky is each weekday? Peak vs trough average hourly load
    — the number that converts a load profile into a capacity plan
    (sized for peak, a ratio of 4 means 75% idle at trough; flat
    ratios justify fixed clusters, spiky ones justify autoscaling).
    Each cell average is one division of exact ints; MAX/MIN over
    bit-identical doubles agree cross-engine, and the final ratio is
    one more correctly-rounded op.

    Scale: day-hour rollup combines map-side; everything after runs
    on ≤7×24 rows.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.to_date("ts").alias("d"),
        F.when(F.dayofweek(F.to_date("ts")) == 1, F.lit(7))
        .otherwise(F.dayofweek(F.to_date("ts")) - 1)
        .cast("bigint")
        .alias("wd"),
        F.hour("ts").cast("bigint").alias("h"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    cell = hourly.groupBy("wd", "h").agg(
        (F.sum("c").cast("double") / F.count(F.lit(1))).alias("avg_load")
    )
    return (
        cell.groupBy("wd")
        .agg(
            F.max("avg_load").alias("peak_avg"),
            F.min("avg_load").alias("trough_avg"),
            (F.max("avg_load") / F.min("avg_load")).alias("peak_trough_ratio"),
        )
        .orderBy("wd")
    )


# --- reorder cadence by segment ---------------------------------------------


@register(
    "q_reorder_cadence_by_segment",
    oracle="""
    WITH gaps AS (
        SELECT c.c_mktsegment,
               date_diff('day',
                         LAG(CAST(o.o_orderdate AS DATE))
                             OVER (PARTITION BY o.o_custkey
                                   ORDER BY CAST(o.o_orderdate AS DATE), o.o_orderkey),
                         CAST(o.o_orderdate AS DATE)) AS gap_days
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT c_mktsegment,
           CAST(COUNT(gap_days) AS BIGINT) AS n_gaps,
           CAST(FLOOR(quantile_cont(gap_days, 0.5)) AS BIGINT) AS p50_days,
           CAST(FLOOR(quantile_cont(gap_days, 0.9)) AS BIGINT) AS p90_days
    FROM gaps
    WHERE gap_days IS NOT NULL
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    description="days between consecutive orders per market segment (the reorder clock that calibrates dormancy thresholds like q22's)",
)
def q_reorder_cadence_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How often does each segment come back? Per-customer order gaps
    rolled to segment percentiles — the reorder clock that makes
    dormancy cutoffs (q22 picks one by fiat) data-driven: a customer
    is 'dormant' when their silence exceeds their segment's p90, not
    a hardcoded interval. Exact integer day gaps, floor-interpolated
    percentiles, one (custkey, date, orderkey) total order.

    Scale: the lag rides one custkey window shuffle (segment
    broadcast-joined before it, so the window carries the label); the
    percentile reduce collapses to |segments| rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    jt = orders.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.to_date("o_orderdate"), "o_orderkey"
    )
    gaps = jt.select(
        "c_mktsegment",
        F.datediff(
            F.to_date("o_orderdate"), F.lag(F.to_date("o_orderdate")).over(w)
        ).alias("gap_days"),
    ).where(F.col("gap_days").isNotNull())
    return (
        gaps.groupBy("c_mktsegment")
        .agg(
            F.count("gap_days").cast("bigint").alias("n_gaps"),
            F.floor(F.percentile("gap_days", F.lit(0.5))).cast("bigint").alias(
                "p50_days"
            ),
            F.floor(F.percentile("gap_days", F.lit(0.9))).cast("bigint").alias(
                "p90_days"
            ),
        )
        .orderBy("c_mktsegment")
    )


# --- customer acquisition curve ---------------------------------------------


@register(
    "q_customer_acquisition_curve",
    oracle="""
    WITH firsto AS (
        SELECT o_custkey, MIN(strftime(o_orderdate, '%Y-%m')) AS first_month
        FROM orders GROUP BY o_custkey
    ), joined AS (
        SELECT n.n_regionkey, r.r_name, f.first_month
        FROM firsto f
        JOIN customer c ON c.c_custkey = f.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
    ), monthly AS (
        SELECT r_name, first_month,
               CAST(COUNT(*) AS BIGINT) AS new_customers
        FROM joined GROUP BY r_name, first_month
    )
    SELECT r_name, first_month AS month_key, new_customers,
           CAST(SUM(new_customers) OVER (PARTITION BY r_name
                                         ORDER BY first_month) AS BIGINT)
             AS cum_customers
    FROM monthly
    ORDER BY r_name, month_key
    """,
    description="new + cumulative first-time customers per region per month (the relational acquisition curve; ev_cumulative_adoption's dimension twin)",
)
def q_customer_acquisition_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """When did each region's customer base actually arrive? First
    order month per customer, rolled into new + cumulative counts per
    region — the acquisition curve that separates 'big because old'
    from 'big because growing' (the dimension-side twin of
    ev_cumulative_adoption). Exact counts; the cumulative window
    partitions by region over |months| rows.

    Scale: the first-month reduce combines map-side per custkey; dims
    broadcast onto the |customers| rollup, then everything is
    |regions|×|months| rows.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    firsto = orders.groupBy("o_custkey").agg(
        F.min(F.date_format("o_orderdate", "yyyy-MM")).alias("first_month")
    )
    joined = (
        firsto.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            firsto.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    monthly = joined.groupBy("r_name", "first_month").agg(
        F.count(F.lit(1)).cast("bigint").alias("new_customers")
    )
    w = Window.partitionBy("r_name").orderBy("first_month")
    return monthly.select(
        "r_name",
        F.col("first_month").alias("month_key"),
        "new_customers",
        F.sum("new_customers").over(w).cast("bigint").alias("cum_customers"),
    ).orderBy("r_name", "month_key")


# --- Spark 4 SQL surface: LATERAL correlated subquery -----------------------

LATERAL_CUST_MOD = 50  # deterministic customer subset keeps output bounded


@register(
    "q_lateral_top_orders",
    oracle=f"""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
                 AS o_totalprice
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 3
    ) t
    WHERE c.c_custkey % {LATERAL_CUST_MOD} = 0
    ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
    """,
    description="top-3 orders per customer via a LATERAL correlated subquery (Spark 4 SQL surface; pytest-proven row-identical to the window form)",
)
def q_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LATERAL leg of the SQL-surface family (§2L): a correlated
    per-customer top-3, written the way an analyst migrating from
    Postgres/DuckDB writes it. Catalyst decorrelates the subquery
    into a join + per-key ordering rather than re-executing it per
    row — the plan-shape a naive engine gets wrong — and the module
    test proves the result row-identical to the idiomatic window
    form. The (price desc, orderkey) LIMIT order is total, so the
    per-group cut is deterministic on both engines.

    Scale: the modulus filter prunes the customer side before the
    correlation; the decorrelated join shuffles on custkey once.
    """
    from lime_etl_spark.sources.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (
            SELECT o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
                     AS o_totalprice
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 3
        ) t
        WHERE c.c_custkey % {LATERAL_CUST_MOD} = 0
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
        """
    )


# --- habitual users ---------------------------------------------------------


@register(
    "ev_habitual_users",
    oracle="""
    WITH uh AS (
        SELECT user_id, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), per_user AS (
        SELECT user_id,
               CAST(SUM(c) AS BIGINT) AS n_events,
               CAST(MAX(c) AS BIGINT) AS modal_hour_events
        FROM uh GROUP BY user_id
    )
    SELECT CAST(LEAST(FLOOR(CAST(10 * modal_hour_events AS DOUBLE) / n_events), 9)
                AS BIGINT) AS habit_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events
    FROM per_user
    GROUP BY 1
    ORDER BY habit_bucket
    """,
    description="how concentrated is each user's activity in their modal hour (habit-strength histogram — scheduling signal and bot smell at 1.0)",
)
def ev_habitual_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do users have a 'usual hour'? Habit strength = the share of a
    user's events landing in their single busiest hour-of-day,
    histogrammed in 0.1 buckets. High-habit mass says when to
    schedule sends and capacity; a spike AT 1.0 with high volume
    smells like cron traffic (ev_burstiness_profile's complement —
    regularity in time-of-day rather than cadence). The mode needs
    only MAX(c), never WHICH hour, so there is no argmax tie to
    resolve; the bucket floors one division of exact ints.

    Scale: the (user, hour) rollup combines map-side (≤24 rows per
    user), the per-user reduce likewise, and the histogram is ≤10
    rows.
    """
    ev = load_table(spark, sf_dir, "events")
    uh = ev.groupBy("user_id", F.hour("ts").cast("bigint").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    per_user = uh.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n_events"),
        F.max("c").cast("bigint").alias("modal_hour_events"),
    )
    bucket = F.least(
        F.floor((10 * F.col("modal_hour_events")).cast("double") / F.col("n_events")),
        F.lit(9),
    ).cast("bigint")
    return (
        per_user.groupBy(bucket.alias("habit_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
        .orderBy("habit_bucket")
    )


# --- Fisher ratio per label pair --------------------------------------------


@register(
    "emb_fisher_ratio",
    oracle="""
    WITH m AS (
        SELECT MAX(list_max(list_transform(CAST(embedding AS DOUBLE[]), v -> abs(v)))) / 127 AS s
        FROM embeddings
    ),
    q AS (
        SELECT label,
               list_transform(
                   CAST(embedding AS DOUBLE[]),
                   v -> CAST(GREATEST(LEAST(floor(v / s + 0.5), 127), -127) AS BIGINT)
               ) AS qv
        FROM embeddings, m
    ),
    ex AS (SELECT label, qv, unnest(generate_series(1, len(qv))) AS i FROM q),
    comp AS (
        SELECT label, i AS pos,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(qv[i]) AS BIGINT) AS sq,
               CAST(SUM(qv[i] * qv[i]) AS BIGINT) AS sqq
        FROM ex GROUP BY label, i
    ),
    stats AS (
        SELECT label,
               MIN(n) AS n,
               CAST(SUM(sqq) AS BIGINT) AS tot_sq,
               CAST(SUM(sq * sq) AS BIGINT) AS cent_sq
        FROM comp GROUP BY label
    ),
    between_p AS (
        SELECT a.label AS label_a, b.label AS label_b,
               CAST(SUM((a.sq * b.n - b.sq * a.n) * (a.sq * b.n - b.sq * a.n))
                    AS DOUBLE) AS between_num,
               MIN(a.n) AS n_a, MIN(b.n) AS n_b
        FROM comp a JOIN comp b ON a.pos = b.pos AND a.label < b.label
        GROUP BY a.label, b.label
    )
    SELECT p.label_a, p.label_b,
           p.between_num / (p.n_a * p.n_a * p.n_b * p.n_b) AS between_sq,
           (CAST(sa.tot_sq AS DOUBLE) - CAST(sa.cent_sq AS DOUBLE) / sa.n) / sa.n
             + (CAST(sb.tot_sq AS DOUBLE) - CAST(sb.cent_sq AS DOUBLE) / sb.n) / sb.n
             AS within_sq,
           p.between_num / (p.n_a * p.n_a * p.n_b * p.n_b)
             / ((CAST(sa.tot_sq AS DOUBLE) - CAST(sa.cent_sq AS DOUBLE) / sa.n) / sa.n
                + (CAST(sb.tot_sq AS DOUBLE) - CAST(sb.cent_sq AS DOUBLE) / sb.n) / sb.n)
             AS fisher_ratio
    FROM between_p p
    JOIN stats sa ON sa.label = p.label_a
    JOIN stats sb ON sb.label = p.label_b
    ORDER BY fisher_ratio, p.label_a, p.label_b
    """,
    description="Fisher separability per label pair: ||μa−μb||² over mean within-class variance (exact-int numerators — the pairs a linear head will confuse, ranked)",
)
def emb_fisher_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The triptych closer: emb_centroid_separation gives direction,
    emb_class_scatter gives spread — this is the ratio that predicts
    a linear head's confusion: ||μa−μb||² / (σ²a + σ²b), smallest
    first. The between term is computed at int grain via
    Σ(Sᵢᵃ·n_b − Sᵢᵇ·n_a)² (exact — the μ subtraction cleared of
    divisions), scaled once by (n_a·n_b)²; within terms reuse the
    scatter identity. All divisions are of exactly-computed terms in
    a fixed expression order, so the ranking hash-matches.

    Scale: everything runs on the |labels|×dim component table
    (map-side reduced once); the pair join is labels², never
    vectors². Int64 envelope: diff² ≤ (127·2·n²)² per component —
    exact to ~10³ vectors/label; past that switch the diff² sum to
    decimal(38,0) on both engines (structure unchanged).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    comp = (
        with_int8_vectors(emb, "label")
        .select("label", F.posexplode("qv").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("sq"),
            F.sum(F.col("v") * F.col("v")).cast("bigint").alias("sqq"),
        )
        .persist()
    )
    stats = comp.groupBy("label").agg(
        F.min("n").alias("n"),
        F.sum("sqq").cast("bigint").alias("tot_sq"),
        F.sum(F.col("sq") * F.col("sq")).cast("bigint").alias("cent_sq"),
    )
    a = comp.alias("a")
    b = comp.alias("b")
    diff = F.col("a.sq") * F.col("b.n") - F.col("b.sq") * F.col("a.n")
    between_p = (
        a.join(
            F.broadcast(b),
            (F.col("a.pos") == F.col("b.pos")) & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b")
        )
        .agg(
            F.sum(diff * diff).cast("double").alias("between_num"),
            F.min("a.n").alias("n_a"),
            F.min("b.n").alias("n_b"),
        )
    )
    sa = stats.select(
        F.col("label").alias("label_a"),
        F.col("n").alias("na_"),
        F.col("tot_sq").alias("tot_a"),
        F.col("cent_sq").alias("cent_a"),
    )
    sb = stats.select(
        F.col("label").alias("label_b"),
        F.col("n").alias("nb_"),
        F.col("tot_sq").alias("tot_b"),
        F.col("cent_sq").alias("cent_b"),
    )
    jt = between_p.join(F.broadcast(sa), "label_a").join(F.broadcast(sb), "label_b")
    between_sq = F.col("between_num") / (
        F.col("n_a") * F.col("n_a") * F.col("n_b") * F.col("n_b")
    )
    within_sq = (
        F.col("tot_a").cast("double") - F.col("cent_a").cast("double") / F.col("na_")
    ) / F.col("na_") + (
        F.col("tot_b").cast("double") - F.col("cent_b").cast("double") / F.col("nb_")
    ) / F.col("nb_")
    return (
        jt.select(
            "label_a",
            "label_b",
            between_sq.alias("between_sq"),
            within_sq.alias("within_sq"),
            (between_sq / within_sq).alias("fisher_ratio"),
        )
        .orderBy("fisher_ratio", "label_a", "label_b")
    )


# --- first session vs the rest ----------------------------------------------


@register(
    "ev_first_session_vs_rest",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
               CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), sess AS (
        SELECT user_id, event_type,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM flagged
    ), per_session AS (
        SELECT user_id, session_seq,
               CAST(COUNT(*) AS BIGINT) AS depth,
               CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
                 AS converted
        FROM sess GROUP BY user_id, session_seq
    )
    SELECT CASE WHEN session_seq = 1 THEN 'first' ELSE 'rest' END AS cohort,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(depth) AS BIGINT) AS total_events,
           CAST(SUM(depth) AS DOUBLE) / COUNT(*) AS avg_depth,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS conversion_rate
    FROM per_session
    GROUP BY 1
    ORDER BY cohort
    """,
    description="first session vs all later sessions: depth and conversion (the onboarding-health split — is the first visit where users are won or lost)",
)
def ev_first_session_vs_rest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Onboarding in one row pair: the first session's depth and
    conversion against every later session. A 'first' row that
    underperforms 'rest' badly says the landing experience loses
    people the product later wins back (an acquisition tax);
    ev_conversion_by_depth says depth pays — this says WHEN. Same
    shared sessionization, exact counters, one division per rate.

    Scale: sessionize rides one user_id shuffle; the cohort rollup
    is 2 rows.
    """
    from lime_etl_spark.operators.events import sessionize

    ev = load_table(spark, sf_dir, "events")
    per_session = (
        sessionize(ev)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("depth"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("converted"),
        )
    )
    cohort = F.when(F.col("session_seq") == 1, "first").otherwise("rest")
    return (
        per_session.groupBy(cohort.alias("cohort"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("depth").cast("bigint").alias("total_events"),
            (F.sum("depth").cast("double") / F.count(F.lit(1))).alias("avg_depth"),
            F.sum("converted").cast("bigint").alias("n_converted"),
            (F.sum("converted").cast("double") / F.count(F.lit(1))).alias(
                "conversion_rate"
            ),
        )
        .orderBy("cohort")
    )


# --- source language purity -------------------------------------------------


@register(
    "txt_source_lang_purity",
    oracle="""
    WITH sl AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY source, lang
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           CAST(MAX(c) AS BIGINT) AS dominant_docs,
           CAST(MAX(c) AS DOUBLE) / SUM(c) AS purity
    FROM sl
    GROUP BY source
    ORDER BY source
    """,
    description="language purity per source (dominant-language share — monolingual sources can skip langid routing entirely)",
)
def txt_source_lang_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources are monolingual? Dominant-language share per
    source — purity ≈ 1 lets the pipeline route the whole source
    without per-doc language ID (skipping the classifier on the easy
    90% is how langid cost scales), while low purity flags sources
    whose language metadata can't be trusted. Needs only MAX over
    the (source, lang) counts — no argmax tie dance — and one
    division.

    Scale: one (source, lang) map-side rollup, then a |sources|
    reduce.
    """
    docs = load_table(spark, sf_dir, "documents")
    sl = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return (
        sl.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_langs"),
            F.max("c").cast("bigint").alias("dominant_docs"),
            (F.max("c").cast("double") / F.sum("c")).alias("purity"),
        )
        .orderBy("source")
    )


# --- oversize documents vs the packing budget -------------------------------


@register(
    "pack_oversize_docs",
    oracle=f"""
    WITH sized AS (
        SELECT lang,
               CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_tokens > {PACK_BUDGET} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oversize,
           CAST(SUM(CASE WHEN n_tokens > {PACK_BUDGET}
                         THEN n_tokens - {PACK_BUDGET} ELSE 0 END) AS BIGINT)
             AS overflow_tokens,
           CAST(SUM(CASE WHEN n_tokens > {PACK_BUDGET} THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS oversize_share
    FROM sized
    GROUP BY lang
    ORDER BY lang
    """,
    description="documents exceeding the packing budget per language (the chunker's workload forecast — what pack_sequences must split, and by how much)",
)
def pack_oversize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What must the chunker split before packing can work? Documents
    whose BPE-ish token count exceeds PACK_BUDGET, and the total
    overflow mass — the workload forecast for txt_chunk_windows and
    the denominator behind txt_context_fit's truncation-loss view.
    Exact integer token counts (the same expression pack_sequences
    sizes with, so 'oversize' means the same thing there), one
    division.

    Scale: row-local token count in the scan projection, |langs|
    map-side rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.regexp_count("text", F.lit(BPE_RE)).cast("bigint")
    over = F.when(n_tok > PACK_BUDGET, 1).otherwise(0)
    overflow = F.when(n_tok > PACK_BUDGET, n_tok - PACK_BUDGET).otherwise(0)
    return (
        docs.select("lang", n_tok.alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("n_tokens") > PACK_BUDGET, 1).otherwise(0))
            .cast("bigint")
            .alias("n_oversize"),
            F.sum(
                F.when(
                    F.col("n_tokens") > PACK_BUDGET,
                    F.col("n_tokens") - PACK_BUDGET,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("overflow_tokens"),
            (
                F.sum(F.when(F.col("n_tokens") > PACK_BUDGET, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("oversize_share"),
        )
        .orderBy("lang")
    )


# --- exact duplicate embeddings ---------------------------------------------


@register(
    "emb_exact_duplicates",
    oracle="""
    WITH m AS (
        SELECT MAX(list_max(list_transform(CAST(embedding AS DOUBLE[]), v -> abs(v)))) / 127 AS s
        FROM embeddings
    ),
    q AS (
        SELECT vec_id,
               list_transform(
                   CAST(embedding AS DOUBLE[]),
                   v -> CAST(GREATEST(LEAST(floor(v / s + 0.5), 127), -127) AS BIGINT)
               ) AS qv
        FROM embeddings, m
    ),
    groups AS (
        SELECT qv, CAST(COUNT(*) AS BIGINT) AS group_size,
               CAST(MIN(vec_id) AS BIGINT) AS rep_vec_id
        FROM q GROUP BY qv
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN group_size > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_groups,
           CAST(SUM(CASE WHEN group_size > 1 THEN group_size ELSE 0 END) AS BIGINT)
             AS n_dup_vectors,
           CAST(MAX(group_size) AS BIGINT) AS max_group,
           CAST(SUM(group_size - 1) AS DOUBLE) / SUM(group_size) AS collapse_rate
    FROM groups
    """,
    description="exact-duplicate embeddings at int8 resolution (hash-groupBy on the quantized vector — the degenerate fast path before any LSH)",
)
def emb_exact_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cheapest dedup that exists: group by the int8-quantized
    vector itself. Exact duplicates at serving resolution need no
    LSH, no banding, no verification — run this FIRST and hand only
    the survivors to dedup_embedding_cosine (the same raw→exact→near
    ladder cur_dedup_funnel measures for text). collapse_rate is what
    this free step alone removes.

    Scale: one hash-groupBy whose key is the quantized array (Spark
    hashes arrays natively); map-side combine collapses duplicates
    before the shuffle, so the exchange carries distinct vectors.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    groups = (
        with_int8_vectors(emb, "vec_id")
        .groupBy("qv")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("group_size"),
            F.min("vec_id").cast("bigint").alias("rep_vec_id"),
        )
    )
    dup = F.col("group_size") > 1
    return groups.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(dup, 1).otherwise(0)).cast("bigint").alias("n_dup_groups"),
        F.sum(F.when(dup, F.col("group_size")).otherwise(0))
        .cast("bigint")
        .alias("n_dup_vectors"),
        F.max("group_size").cast("bigint").alias("max_group"),
        (
            F.sum(F.col("group_size") - 1).cast("double") / F.sum("group_size")
        ).alias("collapse_rate"),
    )


# --- YoY revenue bridge -----------------------------------------------------

BRIDGE_Y0, BRIDGE_Y1 = 1999, 2000  # last two complete ship years


@register(
    "q_revenue_bridge_yoy",
    oracle=f"""
    WITH by_brand AS (
        SELECT p.p_brand,
               EXTRACT(year FROM l.l_shipdate) AS y,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                 AS rev_cents
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= '{BRIDGE_Y0}-01-01'
          AND l.l_shipdate < '{BRIDGE_Y1 + 1}-01-01'
        GROUP BY 1, 2
    ), wide AS (
        SELECT p_brand,
               CAST(SUM(CASE WHEN y = {BRIDGE_Y0} THEN qty END) AS BIGINT) AS q0,
               CAST(SUM(CASE WHEN y = {BRIDGE_Y0} THEN rev_cents END) AS BIGINT) AS r0,
               CAST(SUM(CASE WHEN y = {BRIDGE_Y1} THEN qty END) AS BIGINT) AS q1,
               CAST(SUM(CASE WHEN y = {BRIDGE_Y1} THEN rev_cents END) AS BIGINT) AS r1
        FROM by_brand GROUP BY p_brand
    )
    SELECT p_brand, q0, q1, r0, r1,
           r1 - r0 AS delta_cents,
           CAST((q1 - q0) * r0 AS DOUBLE) / q0 AS volume_effect_cents,
           CAST(r1 * q0 - q1 * r0 AS DOUBLE) / q0 AS price_effect_cents
    FROM wide
    WHERE q0 > 0 AND q1 > 0
    ORDER BY p_brand
    """,
    description="YoY revenue change decomposed into volume and price effects per brand (the bridge identity volume+price = delta holds exactly in the rationals)",
)
def q_revenue_bridge_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHY did revenue move — more units, or pricier units? The
    classic bridge per brand between the last two complete years:
    volume effect (Δq at old unit value) and price effect (the
    rest), derived so both are ONE division of exact integer
    products over q0 — and the identity volume+price ≡ r1−r0 holds
    exactly in the rationals (the test checks it to float precision).
    A revenue dashboard says WHAT moved; this says WHO to call.

    Scale: year filter pushes to the scan; part dim broadcasts; the
    brand-year rollup combines map-side and the pivot is a 2-case
    conditional aggregate, not a join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    by_brand = (
        # range predicate, not year(col) IN (...): a function over the
        # column defeats parquet pushdown; the range reaches the scan
        li.where(
            (F.col("l_shipdate") >= f"{BRIDGE_Y0}-01-01")
            & (F.col("l_shipdate") < f"{BRIDGE_Y1 + 1}-01-01")
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand", F.year("l_shipdate").alias("y"))
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"),
            (F.sum(dec("l_extendedprice")) * 100).cast("bigint").alias("rev_cents"),
        )
    )
    wide = by_brand.groupBy("p_brand").agg(
        F.sum(F.when(F.col("y") == BRIDGE_Y0, F.col("qty"))).cast("bigint").alias("q0"),
        F.sum(F.when(F.col("y") == BRIDGE_Y0, F.col("rev_cents")))
        .cast("bigint")
        .alias("r0"),
        F.sum(F.when(F.col("y") == BRIDGE_Y1, F.col("qty"))).cast("bigint").alias("q1"),
        F.sum(F.when(F.col("y") == BRIDGE_Y1, F.col("rev_cents")))
        .cast("bigint")
        .alias("r1"),
    )
    return (
        wide.where((F.col("q0") > 0) & (F.col("q1") > 0))
        .select(
            "p_brand",
            "q0",
            "q1",
            "r0",
            "r1",
            (F.col("r1") - F.col("r0")).alias("delta_cents"),
            (
                ((F.col("q1") - F.col("q0")) * F.col("r0")).cast("double")
                / F.col("q0")
            ).alias("volume_effect_cents"),
            (
                (F.col("r1") * F.col("q0") - F.col("q1") * F.col("r0")).cast("double")
                / F.col("q0")
            ).alias("price_effect_cents"),
        )
        .orderBy("p_brand")
    )


# --- effective training epochs ----------------------------------------------

EPOCH_BUDGET_TOKENS = 50_000  # training-run token budget (demo constant)
EPOCH_MEMORIZATION_CAP = 4  # >4 effective epochs is the memorization red line


@register(
    "samp_effective_epochs",
    oracle=f"""
    WITH toks AS (
        SELECT source,
               CAST(SUM(len(regexp_extract_all(text, '{BPE_RE}'))) AS BIGINT)
                 AS source_tokens
        FROM documents GROUP BY source
    ), total AS (
        SELECT CAST(SUM(source_tokens) AS BIGINT) AS corpus_tokens FROM toks
    )
    SELECT t.source, t.source_tokens,
           CAST(CASE WHEN t.source IN ('src0', 'src1')
                     THEN {REWEIGHT_BOOST_PM} ELSE {REWEIGHT_BASE_PM} END
                AS BIGINT) AS target_permille,
           CAST(CASE WHEN t.source IN ('src0', 'src1')
                     THEN {REWEIGHT_BOOST_PM} ELSE {REWEIGHT_BASE_PM} END
                * {EPOCH_BUDGET_TOKENS} AS DOUBLE) / (1000 * t.source_tokens)
             AS effective_epochs,
           CAST(CASE WHEN t.source IN ('src0', 'src1')
                     THEN {REWEIGHT_BOOST_PM} ELSE {REWEIGHT_BASE_PM} END
                * {EPOCH_BUDGET_TOKENS} AS DOUBLE) / (1000 * t.source_tokens)
             > {EPOCH_MEMORIZATION_CAP} AS over_cap
    FROM toks t CROSS JOIN total
    ORDER BY t.source
    """,
    description="implied repetition count per source under the mixture budget (effective epochs; >4 flags the memorization red line)",
)
def samp_effective_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many times will each source repeat in training? The
    mixture target allocates target_permille·budget tokens to a
    source; divided by what the source actually has, that's its
    effective epoch count — the over-sampling number the memorization
    literature caps around 4. Sources flagged over_cap need either a
    bigger corpus or a smaller boost; samp_reweight_plan says WHAT to
    weight, this says whether the weight is SAFE. One division of
    exact integers per row; the flag compares that double to an
    integer literal both engines hold exactly.

    Scale: a per-source token reduce (row-local count in the scan
    projection), |sources| rows after.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.groupBy("source").agg(
        F.sum(F.regexp_count("text", F.lit(BPE_RE)).cast("bigint"))
        .cast("bigint")
        .alias("source_tokens")
    )
    target = (
        F.when(F.col("source").isin(*REWEIGHT_BOOSTED), F.lit(REWEIGHT_BOOST_PM))
        .otherwise(F.lit(REWEIGHT_BASE_PM))
        .cast("bigint")
    )
    epochs = (target * EPOCH_BUDGET_TOKENS).cast("double") / (
        1000 * F.col("source_tokens")
    )
    return toks.select(
        "source",
        "source_tokens",
        target.alias("target_permille"),
        epochs.alias("effective_epochs"),
        (epochs > EPOCH_MEMORIZATION_CAP).alias("over_cap"),
    ).orderBy("source")


# --- steps to convert -------------------------------------------------------


@register(
    "ev_steps_to_convert",
    oracle="""
    WITH firstp AS (
        SELECT user_id, MIN(epoch_us(ts)) AS p_us
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id
    ), pre AS (
        SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS steps_before
        FROM events e JOIN firstp f USING (user_id)
        WHERE epoch_us(e.ts) < f.p_us
        GROUP BY e.user_id
    )
    SELECT CAST(LEAST(FLOOR(steps_before / 10.0), 9) AS BIGINT) AS steps_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(steps_before) AS BIGINT) AS min_steps,
           CAST(MAX(steps_before) AS BIGINT) AS max_steps
    FROM pre
    GROUP BY 1
    ORDER BY steps_bucket
    """,
    description="events before the first purchase, histogrammed in 10-step buckets (the effort-to-convert distribution — purchase_latency's step-count twin)",
)
def ev_steps_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much does a user DO before they first buy?
    ev_purchase_latency measures the clock; this counts the steps —
    the two disagree exactly when users stall (long time, few
    events), which is the distinction a nudge campaign needs.
    Events strictly before the user's first purchase, bucketed by
    tens. Exact counts; the bucket floors one division.

    Scale: the first-purchase reduce and the pre-purchase count both
    ride user_id keys (one shuffle, AQE reuses the exchange); the
    histogram is ≤10 rows.
    """
    ev = load_table(spark, sf_dir, "events")
    firstp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("p_us"))
    )
    pre = (
        ev.join(firstp, "user_id")
        .where(F.unix_micros("ts") < F.col("p_us"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("steps_before"))
    )
    bucket = F.least(F.floor(F.col("steps_before") / 10.0), F.lit(9)).cast("bigint")
    return (
        pre.groupBy(bucket.alias("steps_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.min("steps_before").cast("bigint").alias("min_steps"),
            F.max("steps_before").cast("bigint").alias("max_steps"),
        )
        .orderBy("steps_bucket")
    )


# --- session pace -----------------------------------------------------------


@register(
    "ev_session_pace",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), sess AS (
        SELECT user_id, ts_us,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM flagged
    ), per_session AS (
        SELECT user_id, session_seq,
               CAST(COUNT(*) AS BIGINT) AS depth,
               CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS dur_us
        FROM sess GROUP BY user_id, session_seq
    )
    SELECT CASE WHEN depth = 1 THEN 'a_single_event'
                WHEN 2 * depth * 60000000 < dur_us THEN 'b_under_half_per_min'
                WHEN depth * 60000000 < 2 * dur_us THEN 'c_half_to_2_per_min'
                WHEN depth * 60000000 < 10 * dur_us THEN 'd_2_to_10_per_min'
                ELSE 'e_over_10_per_min' END AS pace_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(depth) AS BIGINT) AS n_events
    FROM per_session
    GROUP BY 1
    ORDER BY pace_bucket
    """,
    description="session pace bands (events/min) decided by integer cross-products — readers vs scanners vs the >10/min bot band",
)
def ev_session_pace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How fast do sessions move? Pace bands from slow reading to the
    >10-events/min band no human sustains — the behavioral bot smell
    that complements ev_burstiness_profile's cadence view. Band
    membership (depth/minutes vs k) is decided by the cross-product
    form depth·60e6 ≷ k·dur_us — pure int64 comparisons, no float
    boundary; zero-duration multi-event sessions land in the fastest
    band by the same inequality (0 < anything).

    Scale: sessionize rides one user_id shuffle; the per-session
    reduce carries two counters; the band rollup is 5 rows.
    """
    from lime_etl_spark.operators.events import sessionize

    ev = load_table(spark, sf_dir, "events")
    per_session = (
        sessionize(ev)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("depth"),
            (F.max("__ts_us") - F.min("__ts_us")).cast("bigint").alias("dur_us"),
        )
    )
    d, dur = F.col("depth"), F.col("dur_us")
    bucket = (
        F.when(d == 1, "a_single_event")
        .when(2 * d * 60000000 < dur, "b_under_half_per_min")
        .when(d * 60000000 < 2 * dur, "c_half_to_2_per_min")
        .when(d * 60000000 < 10 * dur, "d_2_to_10_per_min")
        .otherwise("e_over_10_per_min")
    )
    return (
        per_session.groupBy(bucket.alias("pace_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("depth").cast("bigint").alias("n_events"),
        )
        .orderBy("pace_bucket")
    )


# --- near-dup pair id distance ----------------------------------------------


@register(
    "dedup_pair_id_distance",
    oracle=f"""
    WITH j AS (
        SELECT doc_a, doc_b FROM ({_minhash_sql()})
    )
    SELECT CASE WHEN doc_b - doc_a = 1 THEN 'a_adjacent'
                WHEN doc_b - doc_a <= 10 THEN 'b_within_10'
                WHEN doc_b - doc_a <= 100 THEN 'c_within_100'
                ELSE 'd_far' END AS distance_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(doc_b - doc_a) AS BIGINT) AS min_gap,
           CAST(MAX(doc_b - doc_a) AS BIGINT) AS max_gap
    FROM j
    GROUP BY 1
    ORDER BY distance_bucket
    """,
    description="id-distance of verified near-dup pairs (crawl locality: if dups are id-adjacent, a cheap sliding-window dedup catches most of them)",
)
def dedup_pair_id_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are duplicates NEIGHBORS? Near-dup pairs bucketed by doc-id
    distance: crawl and ingest pipelines tend to emit dups close
    together, and if the mass sits in the adjacent/within-10 buckets,
    a sorted sliding-window pass (O(n·w), no shuffle-join) catches
    most of it and full LSH only has to mop up the far tail — the
    cheapest dedup-architecture decision this table makes with
    evidence. Exact integer gaps; doc_a < doc_b is canonical so gaps
    are positive.

    Scale: same LSH-bounded pair set as dedup_minhash_lsh; one
    map-side rollup to 4 rows on top.
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
    pairs = jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh))).where(
        F.col("jaccard") >= JACCARD_TAU
    )
    gap = F.col("doc_b") - F.col("doc_a")
    bucket = (
        F.when(gap == 1, "a_adjacent")
        .when(gap <= 10, "b_within_10")
        .when(gap <= 100, "c_within_100")
        .otherwise("d_far")
    )
    return (
        pairs.groupBy(bucket.alias("distance_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.min(gap).cast("bigint").alias("min_gap"),
            F.max(gap).cast("bigint").alias("max_gap"),
        )
        .orderBy("distance_bucket")
    )


# --- sliding-window dedup pass ----------------------------------------------

WINDOW_DEDUP_W = 16  # id-distance window (crawl-locality radius)


def _window_dedup_oracle() -> str:
    from lime_etl_spark.operators.dedup import (
        _JACCARD_SQL_TAIL,
        _SHINGLES_SQL,
        JACCARD_TAU,
    )

    return f"""
    WITH sh AS ({_SHINGLES_SQL}),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM sh a JOIN sh b
          ON a.x = b.x AND a.doc_id < b.doc_id
         AND b.doc_id - a.doc_id <= {WINDOW_DEDUP_W}
        GROUP BY a.doc_id, b.doc_id
    )
    {_JACCARD_SQL_TAIL}
    WHERE CAST(i.n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) >= {JACCARD_TAU}
    """


@register(
    "dedup_window_pass",
    oracle=None,  # attached below
    description=f"sliding-window near-dup pass (exact Jaccard, id distance ≤ {WINDOW_DEDUP_W}) — the cheap exhaustive-within-locality rung below LSH",
)
def dedup_window_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cheap dedup rung dedup_pair_id_distance justifies: compare
    each document ONLY to its id-neighbors within W={WINDOW_DEDUP_W}
    (crawl locality means most dups live there), with exact Jaccard —
    EXHAUSTIVE inside the window where LSH is probabilistic, and
    shuffle-light where LSH pays banding. The module test proves it
    exactly equals the exhaustive all-pairs detector restricted to
    the window.

    Scale: candidates come from a block-bucketed self-join
    (block = id div W, join same+next block, filter distance) — each
    row meets ≤2 blocks, so the join is O(n·W/block) with NO LSH
    machinery; verification is the same candidate-scoped Jaccard as
    the LSH path. On a sorted-by-id corpus this is the cheapest
    near-dup detector that exists; LSH mops up the far tail.
    """
    from lime_etl_spark.operators.dedup import (
        JACCARD_TAU,
        doc_shingles,
        jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    ids = sh.select("doc_id").distinct()
    blocked = ids.select(
        "doc_id", F.floor(F.col("doc_id") / WINDOW_DEDUP_W).alias("block")
    )
    a = blocked.alias("a")
    # each left row probes its own block and the next (covers any pair
    # within distance W across a block boundary)
    b = blocked.select(
        "doc_id",
        F.explode(F.array(F.col("block"), F.col("block") - 1)).alias("block"),
    ).alias("b")
    cand = (
        a.join(b, F.col("a.block") == F.col("b.block"))
        .where(
            (F.col("b.doc_id") > F.col("a.doc_id"))
            & (F.col("b.doc_id") - F.col("a.doc_id") <= WINDOW_DEDUP_W)
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return jaccard_pairs(sh, candidates=cand).where(F.col("jaccard") >= JACCARD_TAU)


_spec = _registry._REGISTRY["dedup_window_pass"]
_registry._REGISTRY["dedup_window_pass"] = _registry.QuerySpec(
    _spec.name, _spec.builder, _window_dedup_oracle(), _spec.description
)
del _spec


# --- embedding ingest drift -------------------------------------------------

DRIFT_BUCKETS = 10


@register(
    "emb_ingest_drift",
    oracle=f"""
    WITH m AS (
        SELECT MAX(list_max(list_transform(CAST(embedding AS DOUBLE[]), v -> abs(v)))) / 127 AS s
        FROM embeddings
    ),
    bnds AS (
        SELECT MIN(vec_id) AS lo, MAX(vec_id) - MIN(vec_id) + 1 AS span
        FROM embeddings
    ),
    q AS (
        SELECT vec_id,
               {ingest_bucket_sql("vec_id", DRIFT_BUCKETS)} AS bucket,
               list_transform(
                   CAST(embedding AS DOUBLE[]),
                   v -> CAST(GREATEST(LEAST(floor(v / s + 0.5), 127), -127) AS BIGINT)
               ) AS qv
        FROM embeddings, m, bnds
    ),
    per_vec AS (
        SELECT bucket,
               CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS norm_sq,
               CAST(list_sum(qv) AS BIGINT) AS comp_sum
        FROM q
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(norm_sq) AS BIGINT) AS sum_norm_sq,
           CAST(SUM(comp_sum) AS BIGINT) AS sum_components,
           CAST(SUM(norm_sq) AS DOUBLE) / COUNT(*) AS mean_norm_sq
    FROM per_vec
    GROUP BY bucket
    ORDER BY bucket
    """,
    description="embedding norm/mean drift across ingest-order buckets (did the embedding model change mid-corpus — the serving-resolution drift monitor)",
)
def emb_ingest_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did the embedder change mid-ingest? Vectors are ntile'd into
    ingest-order buckets (vec_id is the ingest order) and each
    bucket's quantized norm mass and component sum are compared — a
    model swap, a normalization change, or a precision regression
    shows up as a step in this table long before retrieval quality
    pages anyone. Σ terms exact int64 at serving resolution; one
    division per bucket.

    Scale: buckets are arithmetic id-range slices from a broadcast
    1-row min/max (functions/ranks.with_ingest_bucket) — row-local,
    no sort; per-vector norms are row-local array folds; the rollup
    is {DRIFT_BUCKETS} rows.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    per_vec = (
        with_ingest_bucket(with_int8_vectors(emb, "vec_id"), "vec_id", DRIFT_BUCKETS)
        .select(
            "bucket",
            F.aggregate(
                F.transform("qv", lambda v: v * v), F.lit(0).cast("bigint"), lambda a, v: a + v
            ).alias("norm_sq"),
            F.aggregate("qv", F.lit(0).cast("bigint"), lambda a, v: a + v).alias(
                "comp_sum"
            ),
        )
    )
    return (
        per_vec.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum("norm_sq").cast("bigint").alias("sum_norm_sq"),
            F.sum("comp_sum").cast("bigint").alias("sum_components"),
            (F.sum("norm_sq").cast("double") / F.count(F.lit(1))).alias(
                "mean_norm_sq"
            ),
        )
        .orderBy("bucket")
    )


# --- dedup yield curve ------------------------------------------------------


@register(
    "dedup_doc_yield_curve",
    oracle=f"""
    WITH j AS (
        {_minhash_sql().rpartition("WHERE")[0]}
    ), best AS (
        SELECT doc_b AS doc_id, MAX(jaccard) AS best_j
        FROM j GROUP BY doc_b
    )
    SELECT CAST(LEAST(FLOOR(best_j * 10), 9) AS BIGINT) AS sim_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS chars_at_stake
    FROM best b JOIN documents d ON d.doc_id = b.doc_id
    GROUP BY 1
    ORDER BY sim_bucket
    """,
    description="docs (and their char mass) by their best candidate similarity — the threshold yield curve in DOCUMENT units, not pair units",
)
def dedup_doc_yield_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What does each threshold choice actually delete?
    dedup_similarity_hist counts PAIRS, which overweights docs with
    many candidates; this reduces to each doc's single BEST candidate
    similarity (doc_b — the higher id, the presumptive delete under
    the min-id keep rule) and buckets docs and their character mass.
    Reading the curve top-down gives the cumulative corpus shrinkage
    per tau — the units a data budget is written in. Max over
    identical doubles and exact char sums keep it bit-stable.

    Scale: the per-doc max is a map-side-combining reduce over the
    LSH-bounded pair set; the char join touches only docs that have
    candidates at all.
    """
    from lime_etl_spark.operators.dedup import (
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents").persist()
    sh = doc_shingles(docs).persist()
    pairs = jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh)))
    best = pairs.groupBy(F.col("doc_b").alias("doc_id")).agg(
        F.max("jaccard").alias("best_j")
    )
    return (
        best.join(docs.select("doc_id", "n_chars"), "doc_id")
        .groupBy(
            F.least(F.floor(F.col("best_j") * 10), F.lit(9))
            .cast("bigint")
            .alias("sim_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars_at_stake"),
        )
        .orderBy("sim_bucket")
    )


# --- value by session depth -------------------------------------------------


@register(
    "ev_value_by_depth",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us,
               CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ), sess AS (
        SELECT user_id, event_type, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        FROM flagged
    ), per_session AS (
        SELECT user_id, session_seq,
               CAST(COUNT(*) AS BIGINT) AS depth,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(value AS DECIMAL(12,2)) END) * 100
                    AS BIGINT) AS rev_cents
        FROM sess GROUP BY user_id, session_seq
    )
    SELECT CAST(LEAST(depth, 10) AS BIGINT) AS depth_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(COALESCE(rev_cents, 0)) AS BIGINT) AS rev_cents,
           CAST(SUM(COALESCE(rev_cents, 0)) AS DOUBLE) / COUNT(*)
             AS rev_cents_per_session
    FROM per_session
    GROUP BY 1
    ORDER BY depth_bucket
    """,
    description="purchase revenue per session by depth bucket (does depth pay in dollars — the money completion of the conversion-by-depth curve)",
)
def ev_value_by_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ev_conversion_by_depth says deeper sessions convert more
    often; this says whether they spend more — the two diverge when
    deep sessions convert on small baskets (engagement without
    basket growth), which flips the 'nudge deeper' recommendation.
    Purchase value is decimal-exact cents per session; revenue per
    session is one division.

    Scale: same single user_id shuffle as the whole sessionize
    family; the depth rollup is ≤10 rows.
    """
    from lime_etl_spark.operators.events import sessionize

    ev = load_table(spark, sf_dir, "events")
    per_session = (
        sessionize(ev)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("depth"),
            (
                F.sum(
                    F.when(F.col("event_type") == "purchase", dec("value", 2, 12))
                )
                * 100
            )
            .cast("bigint")
            .alias("rev_cents"),
        )
    )
    return (
        per_session.groupBy(
            F.least(F.col("depth"), F.lit(10)).cast("bigint").alias("depth_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum(F.coalesce("rev_cents", F.lit(0))).cast("bigint").alias("rev_cents"),
            (
                F.sum(F.coalesce("rev_cents", F.lit(0))).cast("double")
                / F.count(F.lit(1))
            ).alias("rev_cents_per_session"),
        )
        .orderBy("depth_bucket")
    )


# --- empty-days coverage audit ----------------------------------------------


@register(
    "dq_empty_days",
    oracle="""
    WITH span AS (
        SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events
    ), spine AS (
        SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
        FROM span
    ), daily AS (
        SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    )
    SELECT s.d AS missing_day
    FROM spine s LEFT JOIN daily dl ON dl.d = s.d
    WHERE dl.d IS NULL
    ORDER BY missing_day
    """,
    description="calendar days inside the data span with ZERO events (the silent-outage detector volume monitors miss when they only look at existing rows)",
)
def dq_empty_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit aggregations structurally cannot do: a day with NO
    rows never appears in any GROUP BY, so volume monitors that
    aggregate existing data are blind to total outages. A calendar
    spine spanning the observed min..max anti-joins the daily counts;
    surviving days are silent gaps (etl_month_spine_rcte is the
    month-grain fill; this is the day-grain alarm).

    Scale: the spine is sequence() over a 2-value broadcast span —
    |days| rows regardless of data size; the daily rollup combines
    map-side; the anti probe is a broadcast join.
    """
    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = span.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("d")
    )
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        spine.join(daily, "d", "left_anti")
        .select(F.col("d").alias("missing_day"))
        .orderBy("missing_day")
    )


# --- pack shard balance -----------------------------------------------------


@register(
    "pack_shard_balance",
    oracle=f"""
    WITH sized AS (
        SELECT lang, doc_id % {PACK_SHARDS} AS shard,
               CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS n_tokens
        FROM documents
    ), per_shard AS (
        SELECT lang, shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS tokens
        FROM sized GROUP BY lang, shard
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_shards,
           CAST(SUM(tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(tokens) AS BIGINT) AS min_shard_tokens,
           CAST(MAX(tokens) AS BIGINT) AS max_shard_tokens,
           CAST(MAX(tokens) AS DOUBLE) / MIN(tokens) AS skew_ratio
    FROM per_shard
    GROUP BY lang
    ORDER BY lang
    """,
    description="token balance across the packing shards (skew here = straggler tasks in the packing stage — the doc_id%N sharding audit)",
)
def pack_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is doc_id % {PACK_SHARDS} actually balanced? The packing
    window partitions by (lang, shard), so a hot shard IS a straggler
    task at scale — this audits the sharding choice in the same token
    units the window accumulates. A skew ratio near 1 certifies the
    modulus; sequential-id clumping (bulk imports) is exactly what
    would break it. Exact sums, one division.

    Scale: row-local token count + shard key in the scan projection,
    a (lang, shard) map-side rollup, then |langs| rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "lang",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.regexp_count("text", F.lit(BPE_RE)).cast("bigint").alias("n_tokens"),
    )
    per_shard = sized.groupBy("lang", "shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens"),
    )
    return (
        per_shard.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shards"),
            F.sum("tokens").cast("bigint").alias("total_tokens"),
            F.min("tokens").cast("bigint").alias("min_shard_tokens"),
            F.max("tokens").cast("bigint").alias("max_shard_tokens"),
            (F.max("tokens").cast("double") / F.min("tokens")).alias("skew_ratio"),
        )
        .orderBy("lang")
    )


# --- supplier credit exposure -----------------------------------------------


@register(
    "q_supplier_credit_exposure",
    oracle="""
    WITH risky AS (
        SELECT s_suppkey, s_name, CAST(s_acctbal AS DECIMAL(18,2)) AS bal
        FROM supplier WHERE s_acctbal < 0
    )
    SELECT r.s_name,
           CAST(r.bal AS DOUBLE) AS acctbal,
           CAST(COALESCE(SUM(CASE WHEN o.o_orderstatus IN ('O', 'P')
                        THEN 1 ELSE 0 END), 0) AS BIGINT) AS open_lines,
           CAST(COALESCE(SUM(CASE WHEN o.o_orderstatus IN ('O', 'P')
                        THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) END), 0)
                AS DOUBLE) AS open_exposure
    FROM risky r
    LEFT JOIN lineitem l ON l.l_suppkey = r.s_suppkey
    LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY r.s_name, r.bal
    ORDER BY open_exposure DESC, r.s_name
    """,
    description="negative-balance suppliers and the open order value still routed through them (the supply-risk exposure table)",
)
def q_supplier_credit_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which financially-stressed suppliers still hold our open
    orders? Suppliers in the red (negative account balance) joined to
    the value of lines on still-open orders flowing through them —
    the exposure number a supply-risk review starts from. LEFT joins
    keep zero-exposure risky suppliers visible (they're the cheap
    re-route candidates). Decimal-exact sums; deterministic
    (exposure desc, name) order.

    Scale: the risky-supplier filter prunes the dim to a sliver that
    broadcasts; lineitem joins on its own suppkey; the order-status
    lookup rides the orderkey join. Aggregation at supplier grain
    combines map-side.
    """
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    risky = supplier.where(F.col("s_acctbal") < 0).select(
        "s_suppkey", "s_name", dec("s_acctbal").alias("bal")
    )
    jt = (
        li.join(F.broadcast(risky), li.l_suppkey == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", "o_orderstatus"),
            li.l_orderkey == F.col("o_orderkey"),
        )
    )
    agg = jt.groupBy("s_name", "bal").agg(
        F.coalesce(
            F.sum(F.when(F.col("o_orderstatus").isin("O", "P"), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("open_lines"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("o_orderstatus").isin("O", "P"), dec("l_extendedprice")
                )
            ),
            F.lit(0).cast("decimal(18,2)"),
        )
        .cast("double")
        .alias("open_exposure"),
    )
    # LEFT semantics: risky suppliers with no lines at all still appear
    no_lines = risky.join(
        li.select(F.col("l_suppkey").alias("s_suppkey")).distinct(),
        "s_suppkey",
        "left_anti",
    ).select(
        "s_name",
        "bal",
        F.lit(0).cast("bigint").alias("open_lines"),
        F.lit(0.0).alias("open_exposure"),
    )
    return (
        agg.unionByName(no_lines)
        .select(
            "s_name",
            F.col("bal").cast("double").alias("acctbal"),
            "open_lines",
            "open_exposure",
        )
        .orderBy(F.desc("open_exposure"), "s_name")
    )


# --- split-shipment profile -------------------------------------------------


@register(
    "q_split_shipment_profile",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               date_diff('day', MIN(CAST(l_shipdate AS DATE)),
                         MAX(CAST(l_shipdate AS DATE))) AS span_days
        FROM lineitem GROUP BY l_orderkey
        HAVING COUNT(*) >= 2
    )
    SELECT CASE WHEN span_days = 0 THEN 'a_same_day'
                WHEN span_days <= 7 THEN 'b_within_week'
                WHEN span_days <= 30 THEN 'c_within_month'
                ELSE 'd_over_month' END AS span_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(n_lines) AS BIGINT) AS n_lines,
           CAST(MAX(span_days) AS BIGINT) AS max_span_days
    FROM per_order
    GROUP BY 1
    ORDER BY span_bucket
    """,
    description="multi-line orders by ship-date span (same-day vs dribbled-out fulfilment — the split-shipment cost profile)",
)
def q_split_shipment_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does a multi-line order ship as one box or dribble out for a
    month? Ship-date span per multi-line order, bucketed — each extra
    shipment is marginal freight and a support contact, so the
    over-month bucket is a direct cost line. Exact integer day spans
    from one per-order reduce (MIN/MAX in the same pass).

    Scale: single scan, two pushed columns, per-order map-side
    combine, 4-row rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.datediff(
                F.max(F.to_date("l_shipdate")), F.min(F.to_date("l_shipdate"))
            ).alias("span_days"),
        )
        .where(F.col("n_lines") >= 2)
    )
    bucket = (
        F.when(F.col("span_days") == 0, "a_same_day")
        .when(F.col("span_days") <= 7, "b_within_week")
        .when(F.col("span_days") <= 30, "c_within_month")
        .otherwise("d_over_month")
    )
    return (
        per_order.groupBy(bucket.alias("span_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("n_lines").cast("bigint").alias("n_lines"),
            F.max("span_days").cast("bigint").alias("max_span_days"),
        )
        .orderBy("span_bucket")
    )


# --- priority SLA audit -----------------------------------------------------


@register(
    "q_priority_sla_audit",
    oracle="""
    WITH d AS (
        SELECT o.o_orderpriority,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)) AS delay
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(FLOOR(quantile_cont(delay, 0.5)) AS BIGINT) AS p50_delay,
           CAST(FLOOR(quantile_cont(delay, 0.9)) AS BIGINT) AS p90_delay,
           CAST(SUM(CASE WHEN delay > 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(SUM(CASE WHEN delay > 30 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS late_rate
    FROM d
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    description="does URGENT actually ship faster? ship-delay percentiles and >30d late rate per order priority — the SLA audit on the priority field",
)
def q_priority_sla_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The priority field makes a promise; this checks it. Delay
    percentiles and the >30-day late rate per priority class —
    identical distributions across classes mean the field is
    decorative and every SLA conversation built on it is fiction
    (q12's bucket view refined to the per-class percentile grain).
    Exact integer day delays, floor-interpolated percentiles, one
    division per class.

    Scale: one orderkey join at fact grain, then a
    map-side-combining 5-class rollup. approx_percentile is the
    100 TB swap-in.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    d = li.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("delay"),
    )
    late = F.when(F.col("delay") > 30, 1).otherwise(0)
    return (
        d.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.floor(F.percentile("delay", F.lit(0.5))).cast("bigint").alias("p50_delay"),
            F.floor(F.percentile("delay", F.lit(0.9))).cast("bigint").alias("p90_delay"),
            F.sum(late).cast("bigint").alias("n_late"),
            (F.sum(late).cast("double") / F.count(F.lit(1))).alias("late_rate"),
        )
        .orderBy("o_orderpriority")
    )


# --- gate threshold sensitivity ---------------------------------------------

GATE_SWEEP = tuple(range(14, 27, 2))  # candidate MIN_WORDS thresholds


@register(
    "cur_gate_sensitivity",
    oracle=f"""
    WITH sized AS (
        SELECT len(string_split(text, ' ')) AS nw FROM documents
    ), total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM sized)
    SELECT t.threshold,
           CAST((SELECT COUNT(*) FROM sized WHERE nw < t.threshold) AS BIGINT)
             AS n_killed,
           CAST((SELECT COUNT(*) FROM sized WHERE nw < t.threshold) AS DOUBLE)
             / tt.n_docs AS kill_rate
    FROM (SELECT unnest([{", ".join(str(t) for t in GATE_SWEEP)}]) AS threshold) t
    CROSS JOIN total tt
    ORDER BY t.threshold
    """,
    description="kill count per candidate MIN_WORDS threshold (is the gate cutoff on a cliff or a plateau — the sensitivity sweep behind the chosen constant)",
)
def cur_gate_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the length gate's threshold sitting on dense mass? Kill
    counts for a sweep of candidate MIN_WORDS values around the
    production constant — a steep step between neighbors means tiny
    threshold changes swing the corpus (pick again); a plateau means
    the cutoff is robust. One scan computes the word-length column;
    the sweep is a broadcast join against the threshold list with a
    conditional count per threshold — never one scan per candidate.

    Scale: row-local length, ≤|thresholds| × 1 rollup; the cross
    join is |docs| × |thresholds| conditional counters collapsed
    map-side.
    """
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(F.size(F.split("text", " ")).alias("nw")).persist()
    total = sized.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    thresholds = spark.createDataFrame(
        [(t,) for t in GATE_SWEEP], "threshold int"
    )
    return (
        sized.crossJoin(F.broadcast(thresholds))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(F.col("nw") < F.col("threshold"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_killed")
        )
        .join(F.broadcast(total))
        .select(
            "threshold",
            "n_killed",
            (F.col("n_killed").cast("double") / F.col("n_docs")).alias("kill_rate"),
        )
        .orderBy("threshold")
    )


# --- type mix by tenure -----------------------------------------------------


@register(
    "ev_type_mix_by_tenure",
    oracle="""
    WITH firstd AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ), labeled AS (
        SELECT e.event_type,
               CASE WHEN date_diff('day', f.d0, CAST(e.ts AS DATE)) < 7 THEN 'new'
                    WHEN date_diff('day', f.d0, CAST(e.ts AS DATE)) < 14 THEN 'recent'
                    ELSE 'established' END AS tenure_bucket
        FROM events e JOIN firstd f USING (user_id)
    ), cells AS (
        SELECT tenure_bucket, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM labeled GROUP BY 1, 2
    )
    SELECT tenure_bucket, event_type, n_events,
           CAST(n_events AS DOUBLE)
             / SUM(n_events) OVER (PARTITION BY tenure_bucket) AS share
    FROM cells
    ORDER BY tenure_bucket, event_type
    """,
    description="event-type composition by account tenure at event time (do veterans behave differently — the behavioral-maturation matrix)",
)
def ev_type_mix_by_tenure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does behavior mature? Each event is labeled with its user's
    tenure AT THAT MOMENT (days since first event), and the type
    composition is compared across tenure buckets — new users
    browsing while veterans buy is the pattern that justifies
    tenure-aware ranking; identical mixes mean tenure features are
    noise. Exact counts, one division per cell over the small
    bucket×type rollup.

    Scale: the first-day reduce and the event join ride one user_id
    key; the composition rollup is ≤3×|types| rows and the share
    window partitions those.
    """
    ev = load_table(spark, sf_dir, "events")
    firstd = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    tenure = F.datediff(F.to_date("ts"), F.col("d0"))
    labeled = ev.join(firstd, "user_id").select(
        "event_type",
        F.when(tenure < 7, "new")
        .when(tenure < 14, "recent")
        .otherwise("established")
        .alias("tenure_bucket"),
    )
    cells = labeled.groupBy("tenure_bucket", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    w = Window.partitionBy("tenure_bucket")
    return cells.select(
        "tenure_bucket",
        "event_type",
        "n_events",
        (F.col("n_events").cast("double") / F.sum("n_events").over(w)).alias("share"),
    ).orderBy("tenure_bucket", "event_type")


# --- win-back customers -----------------------------------------------------

WINBACK_GAP_DAYS = 365


@register(
    "q_winback_customers",
    oracle=f"""
    WITH seq AS (
        SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price,
               LAG(CAST(o_orderdate AS DATE))
                   OVER (PARTITION BY o_custkey
                         ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev_d
        FROM orders
    ), winback AS (
        SELECT o_custkey, MIN(d) AS return_d
        FROM seq
        WHERE prev_d IS NOT NULL
          AND date_diff('day', prev_d, d) >= {WINBACK_GAP_DAYS}
        GROUP BY o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_winback_customers,
           CAST(SUM(post.n_orders) AS BIGINT) AS post_return_orders,
           CAST(SUM(post.rev) AS DOUBLE) AS post_return_revenue
    FROM winback w
    JOIN (
        SELECT s.o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(s.price) AS rev
        FROM seq s JOIN winback wb ON wb.o_custkey = s.o_custkey
        WHERE s.d >= wb.return_d
        GROUP BY s.o_custkey
    ) post ON post.o_custkey = w.o_custkey
    """,
    description=f"customers won back after a ≥{WINBACK_GAP_DAYS}-day silence, and the order value they generated after returning (is win-back worth paying for)",
)
def q_winback_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What is a won-back customer worth? Customers with a
    ≥{WINBACK_GAP_DAYS}-day order gap who came back, and everything
    they spent from the return onward — the revenue that justifies
    (or kills) a win-back budget, in the same ledger the campaign
    would draw on. One custkey window produces the gaps; the
    post-return rollup reuses the same frame.

    Scale: gaps ride one custkey window shuffle; the win-back set is
    a small reduce that joins back by key; everything aggregates to
    one row.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.to_date("o_orderdate"), "o_orderkey"
    )
    seq = orders.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        dec("o_totalprice").alias("price"),
        F.lag(F.to_date("o_orderdate")).over(w).alias("prev_d"),
    ).persist()
    winback = (
        seq.where(
            F.col("prev_d").isNotNull()
            & (F.datediff("d", "prev_d") >= WINBACK_GAP_DAYS)
        )
        .groupBy("o_custkey")
        .agg(F.min("d").alias("return_d"))
    )
    post = (
        seq.join(winback, "o_custkey")
        .where(F.col("d") >= F.col("return_d"))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("price").alias("rev"),
        )
    )
    return post.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_winback_customers"),
        F.sum("n_orders").cast("bigint").alias("post_return_orders"),
        F.sum("rev").cast("double").alias("post_return_revenue"),
    )


# --- incremental top-k maintenance ------------------------------------------

DELTA_MOD, DELTA_RESIDUE = 7, 3  # deterministic base/delta corpus split


def _incremental_topk_oracle() -> str:
    from lime_etl_spark.operators.similarity import _COS_SQL, QUERY_MOD_SQL, TOP_K

    return f"""
    SELECT q_vec_id, n_vec_id, cosine, rank FROM (
        SELECT q.vec_id AS q_vec_id, v.vec_id AS n_vec_id,
               {_COS_SQL} AS cosine,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COS_SQL} DESC, v.vec_id) AS rank
        FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id
        WHERE q.vec_id % {QUERY_MOD_SQL} = 0
    ) WHERE rank <= {TOP_K}
    """


@register(
    "ann_incremental_topk",
    oracle=None,  # attached below
    description="delta-maintained exact top-k: merge(stored base top-k, top-k vs the delta) re-ranked — proven identical to a full recompute",
)
def ann_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVM story for similarity search: when a delta batch of
    vectors lands, the new global top-k is merge(old top-k, top-k
    against the delta alone) re-ranked — correct because any global
    top-k member is in its own partition's top-k. In production the
    base list is a STORED table and only the |Q|×|delta| scoring
    runs; this registry demo recomputes both sides so the oracle can
    check the merge against a from-scratch top-k over the whole
    corpus (bit-identical: both sides evaluate the same per-pair
    expression). stream_near_dup_sink is the streaming sibling for
    the LSH index; this is the exact-ANN one.

    Scale: incremental cost is |Q|×|delta| per batch instead of
    |Q|×|corpus|; the merge re-rank windows 2k rows per query.
    """
    from lime_etl_spark.operators.similarity import (
        TOP_K,
        brute_force_topk,
        query_mod,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % query_mod(emb) == 0)
    base = emb.where(F.col("vec_id") % DELTA_MOD != DELTA_RESIDUE)
    delta = emb.where(F.col("vec_id") % DELTA_MOD == DELTA_RESIDUE)
    cols = ["q_vec_id", "n_vec_id", "cosine"]
    merged = (
        brute_force_topk(queries, base)
        .select(*cols)
        .unionByName(brute_force_topk(queries, delta).select(*cols))
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cosine"), "n_vec_id")
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("q_vec_id", "n_vec_id", "cosine", "rank")
    )


_spec = _registry._REGISTRY["ann_incremental_topk"]
_registry._REGISTRY["ann_incremental_topk"] = _registry.QuerySpec(
    _spec.name, _spec.builder, _incremental_topk_oracle(), _spec.description
)
del _spec


# --- return-day conversion --------------------------------------------------


@register(
    "ev_return_day_conversion",
    oracle="""
    WITH ud AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
                 AS bought
        FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), lagged AS (
        SELECT user_id, d, bought,
               LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
        FROM ud
    )
    SELECT CASE WHEN prev_d IS NULL THEN 'a_first_day'
                WHEN date_diff('day', prev_d, d) = 1 THEN 'b_consecutive'
                ELSE 'c_return_after_gap' END AS day_kind,
           CAST(COUNT(*) AS BIGINT) AS n_user_days,
           CAST(SUM(bought) AS BIGINT) AS n_purchase_days,
           CAST(SUM(bought) AS DOUBLE) / COUNT(*) AS purchase_day_rate
    FROM lagged
    GROUP BY 1
    ORDER BY day_kind
    """,
    description="purchase rate on first days vs consecutive days vs returns-after-a-gap (does coming back convert — the win-back quality signal)",
)
def ev_return_day_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is a comeback day a buying day? Every active user-day is
    classed as first-ever, consecutive, or a return after ≥2 days
    away, and each class gets its purchase-day rate — returns
    converting ABOVE consecutive days is the evidence that win-back
    traffic is high-intent (and the quality check on what
    ev_resurrection_gaps counts and q_winback_customers values).
    Exact counters, one division per class.

    Scale: the (user, day) reduce combines map-side and carries the
    bought flag; the lag rides one user_id window; the rollup is 3
    rows.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("bought")
    )
    w = Window.partitionBy("user_id").orderBy("d")
    lagged = ud.withColumn("prev_d", F.lag("d").over(w))
    kind = (
        F.when(F.col("prev_d").isNull(), "a_first_day")
        .when(F.datediff("d", "prev_d") == 1, "b_consecutive")
        .otherwise("c_return_after_gap")
    )
    return (
        lagged.groupBy(kind.alias("day_kind"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_user_days"),
            F.sum("bought").cast("bigint").alias("n_purchase_days"),
            (F.sum("bought").cast("double") / F.count(F.lit(1))).alias(
                "purchase_day_rate"
            ),
        )
        .orderBy("day_kind")
    )


# --- IVF bucket label purity --------------------------------------------------


@register(
    "ann_bucket_label_purity",
    oracle=None,  # attached below (shares similarity._BUCKET_SQL)
    description="dominant-label share per IVF bucket (does the coarse quantizer respect class structure — the retrieval-quality proxy next to bucket balance)",
)
def ann_bucket_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do IVF buckets align with labels? Dominant-label share per
    sign-quantizer bucket: high purity means same-class vectors land
    together (self-probe search retrieves same-class neighbors —
    good for classification-style retrieval), while purity at chance
    says the first 8 dimensions don't encode the label at all. Needs
    only MAX over (bucket, label) counts — no argmax tie dance; one
    division per bucket.

    Scale: one (bucket, label) map-side rollup at row-local bucket
    grain, reduced to ≤256 rows.
    """
    from lime_etl_spark.operators.similarity import ivf_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    bl = emb.select(
        ivf_bucket(F.col("embedding")).alias("bucket"), "label"
    ).groupBy("bucket", "label").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return (
        bl.groupBy("bucket")
        .agg(
            F.sum("c").cast("bigint").alias("n_vecs"),
            F.count(F.lit(1)).cast("bigint").alias("n_labels"),
            F.max("c").cast("bigint").alias("dominant_vecs"),
            (F.max("c").cast("double") / F.sum("c")).alias("purity"),
        )
        .orderBy("bucket")
    )


def _bucket_label_purity_oracle() -> str:
    from lime_etl_spark.operators.similarity import _BUCKET_SQL

    return f"""
    WITH bl AS (
        SELECT ({_BUCKET_SQL}) AS bucket, label, CAST(COUNT(*) AS BIGINT) AS c
        FROM embeddings GROUP BY 1, 2
    )
    SELECT bucket,
           CAST(SUM(c) AS BIGINT) AS n_vecs,
           CAST(COUNT(*) AS BIGINT) AS n_labels,
           CAST(MAX(c) AS BIGINT) AS dominant_vecs,
           CAST(MAX(c) AS DOUBLE) / SUM(c) AS purity
    FROM bl
    GROUP BY bucket
    ORDER BY bucket
    """


_spec = _registry._REGISTRY["ann_bucket_label_purity"]
_registry._REGISTRY["ann_bucket_label_purity"] = _registry.QuerySpec(
    _spec.name, _spec.builder, _bucket_label_purity_oracle(), _spec.description
)
del _spec


# --- corpus summary card ----------------------------------------------------


@register(
    "txt_corpus_card",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
           (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents) AS n_langs,
           (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) FROM documents) AS n_sources,
           (SELECT CAST(SUM(n_chars) AS BIGINT) FROM documents) AS total_chars,
           CAST(COUNT(*) AS BIGINT) AS total_ws_tokens,
           CAST(COUNT(DISTINCT token) AS BIGINT) AS vocab_size,
           (SELECT CAST(SUM(len(regexp_extract_all(text, '{BPE_RE}'))) AS BIGINT)
            FROM documents) AS total_bpe_tokens,
           CAST((SELECT SUM(n_chars) FROM documents) AS DOUBLE)
             / (SELECT SUM(len(regexp_extract_all(text, '{BPE_RE}'))) FROM documents)
             AS chars_per_bpe_token
    FROM tok
    """,
    description="one-row corpus datasheet: docs, langs, sources, chars, tokens (ws + BPE-ish), vocabulary, chars/token — the numbers every pipeline run should log first",
)
def txt_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The datasheet line a corpus run logs before anything else:
    document/language/source counts, character and token mass under
    both tokenizations, vocabulary size, and the chars-per-token
    compression scalar (the capacity planner's unit converter, same
    ratio cur_tokenizer_fertility breaks down per slice). All exact
    counts; one division.

    Scale: two scans (doc-grain counters + the token explode for the
    distinct-vocab count), each reducing map-side to one row — the
    card costs less than any question it answers.
    """
    docs = load_table(spark, sf_dir, "documents").persist()
    doc_stats = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_distinct("lang").cast("bigint").alias("n_langs"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(F.regexp_count("text", F.lit(BPE_RE)).cast("bigint"))
        .cast("bigint")
        .alias("total_bpe_tokens"),
    )
    tok_stats = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total_ws_tokens"),
            F.count_distinct("token").cast("bigint").alias("vocab_size"),
        )
    )
    return doc_stats.crossJoin(F.broadcast(tok_stats)).select(
        "n_docs",
        "n_langs",
        "n_sources",
        "total_chars",
        "total_ws_tokens",
        "vocab_size",
        "total_bpe_tokens",
        (F.col("total_chars").cast("double") / F.col("total_bpe_tokens")).alias(
            "chars_per_bpe_token"
        ),
    )


# --- kNN confusion matrix ---------------------------------------------------


def _knn_confusion_oracle() -> str:
    from lime_etl_spark.operators.insights2 import CONSIST_K, MUTUAL_MOD_SQL

    return f"""
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
    ), cells AS (
        SELECT own_label AS label, voted_label,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM majority GROUP BY 1, 2
    )
    SELECT label, voted_label, n,
           CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY label) AS share
    FROM cells
    ORDER BY label, voted_label
    """


@register(
    "emb_knn_confusion",
    oracle=None,  # attached below
    description="leave-one-out kNN vote confusion MATRIX (which label pairs the embedding space actually confuses — the matrix behind the consistency scalar)",
)
def emb_knn_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """emb_knn_label_consistency says HOW OFTEN each label's vote is
    wrong; this says WHERE the wrong votes go — the confusion matrix
    of leave-one-out kNN majority votes, the empirical companion to
    emb_fisher_ratio's geometric prediction (high-confusion cells
    here should be the low-Fisher pairs there; the test ties the two).
    Same shard, same k, same (count desc, label asc) majority
    tie-break as the consistency scalar, so the matrix decomposes it
    exactly.

    Scale: identical posture to the consistency query — the
    broadcast shard self-join and one va-keyed vote shuffle; the
    matrix rollup is ≤|labels|² rows.
    """
    from lime_etl_spark.operators.insights2 import CONSIST_K, mutual_mod
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
    cells = majority.groupBy(
        F.col("own_label").alias("label"), "voted_label"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wl = Window.partitionBy("label")
    return cells.select(
        "label",
        "voted_label",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wl)).alias("share"),
    ).orderBy("label", "voted_label")


_spec = _registry._REGISTRY["emb_knn_confusion"]
_registry._REGISTRY["emb_knn_confusion"] = _registry.QuerySpec(
    _spec.name, _spec.builder, _knn_confusion_oracle(), _spec.description
)
del _spec


# --- borderline near-dup pairs ----------------------------------------------

BORDERLINE_EPS = 0.05
BORDERLINE_K = 50


def _borderline_oracle() -> str:
    from lime_etl_spark.operators.dedup import JACCARD_TAU

    return f"""
    WITH j AS (
        {_minhash_sql().rpartition("WHERE")[0]}
    )
    SELECT doc_a, doc_b, jaccard,
           jaccard >= {JACCARD_TAU} AS currently_kept
    FROM j
    WHERE abs(jaccard - {JACCARD_TAU}) <= {BORDERLINE_EPS}
    ORDER BY abs(jaccard - {JACCARD_TAU}), doc_a, doc_b
    LIMIT {BORDERLINE_K}
    """


@register(
    "dedup_borderline_pairs",
    oracle=None,  # attached below
    description="candidate pairs within ±0.05 of the Jaccard threshold, nearest first — the human-review queue that calibrates the dedup cut",
)
def dedup_borderline_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pairs the threshold barely decides: candidates within
    ±{BORDERLINE_EPS} of tau, ordered nearest-first with their current
    verdict. Ten minutes of human review on this queue tells you more
    about the threshold than any aggregate — if the kept/dropped
    verdicts read identically to a person, the cut is arbitrary and
    dedup_similarity_hist's mass at the boundary is real risk
    (txt_langid_margin is the same review-queue pattern for the
    classifier). Jaccard is the usual exact-integer division; the
    distance ordering floors identical doubles.

    Scale: LSH-bounded pairs; the filter + bounded sort is the only
    addition.
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
    pairs = jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh)))
    dist = F.abs(F.col("jaccard") - JACCARD_TAU)
    return (
        pairs.where(dist <= BORDERLINE_EPS)
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            (F.col("jaccard") >= JACCARD_TAU).alias("currently_kept"),
        )
        .orderBy(dist, "doc_a", "doc_b")
        .limit(BORDERLINE_K)
    )


_spec = _registry._REGISTRY["dedup_borderline_pairs"]
_registry._REGISTRY["dedup_borderline_pairs"] = _registry.QuerySpec(
    _spec.name, _spec.builder, _borderline_oracle(), _spec.description
)
del _spec


# --- nation lead-lag --------------------------------------------------------

LEADLAG_TOP_K = 20


@register(
    "q_nation_lead_lag",
    oracle=f"""
    WITH {_MONTHLY_NATION_SQL}
    , kd AS (
        SELECT n_name, x AS m,
               CAST(floor(y / 100000) AS BIGINT) AS v
        FROM xy
    ), pairs AS (
        SELECT a.n_name AS leader, b.n_name AS follower,
               CAST(COUNT(*) AS BIGINT) AS n_common,
               CAST(SUM(a.v) AS BIGINT) AS sx,
               CAST(SUM(b.v) AS BIGINT) AS sy,
               CAST(SUM(a.v * b.v) AS BIGINT) AS sxy,
               CAST(SUM(a.v * a.v) AS BIGINT) AS sxx,
               CAST(SUM(b.v * b.v) AS BIGINT) AS syy
        FROM kd a JOIN kd b
          ON b.m = a.m + 1 AND a.n_name <> b.n_name
        GROUP BY 1, 2
    )
    SELECT leader, follower, n_common,
           CASE WHEN (n_common * sxx - sx * sx) > 0
                 AND (n_common * syy - sy * sy) > 0
                THEN CAST(n_common * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n_common * sxx - sx * sx AS DOUBLE)
                            * CAST(n_common * syy - sy * sy AS DOUBLE))
                ELSE 0.0 END AS lag1_r
    FROM pairs
    WHERE n_common >= 12
    ORDER BY abs(CASE WHEN (n_common * sxx - sx * sx) > 0
                       AND (n_common * syy - sy * sy) > 0
                      THEN CAST(n_common * sxy - sx * sy AS DOUBLE)
                           / sqrt(CAST(n_common * sxx - sx * sx AS DOUBLE)
                                  * CAST(n_common * syy - sy * sy AS DOUBLE))
                      ELSE 0.0 END) DESC, leader, follower
    LIMIT {LEADLAG_TOP_K}
    """,
    description="lag-1 cross-correlation between nations' monthly revenue (who LEADS whom — precedence, where co-movement only shows simultaneity)",
)
def q_nation_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does one market's month predict another's NEXT month?
    Directed lag-1 Pearson between nations — q_nation_comovement
    shows simultaneity; an asymmetric lead-lag cell (A leads B but
    not the reverse) is the precedence signal that makes one market a
    leading indicator for another. Same kilo-dollar exact-integer
    machinery, shifted join key (follower month = leader month + 1),
    both directions kept because asymmetry IS the finding.

    Scale: the directed join still runs at |nations|×|months| rollup
    grain; LIMIT-bounded total-order output.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    monthly = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            "n_name",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("idx"),
        )
        .agg((F.sum(dec("o_totalprice")) * 100).cast("bigint").alias("y"))
        .persist()
    )
    base = monthly.agg(F.min("idx").alias("idx0"))
    kd = monthly.join(F.broadcast(base)).select(
        "n_name",
        (F.col("idx") - F.col("idx0")).alias("m"),
        F.floor(F.col("y") / F.lit(100000)).cast("bigint").alias("v"),
    )
    a = kd.alias("a")
    b = kd.alias("b")
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("b.m") == F.col("a.m") + 1)
            & (F.col("a.n_name") != F.col("b.n_name")),
        )
        .groupBy(
            F.col("a.n_name").alias("leader"), F.col("b.n_name").alias("follower")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.sum("a.v").cast("bigint").alias("sx"),
            F.sum("b.v").cast("bigint").alias("sy"),
            F.sum(F.col("a.v") * F.col("b.v")).cast("bigint").alias("sxy"),
            F.sum(F.col("a.v") * F.col("a.v")).cast("bigint").alias("sxx"),
            F.sum(F.col("b.v") * F.col("b.v")).cast("bigint").alias("syy"),
        )
        .where(F.col("n_common") >= 12)
    )
    vx = F.col("n_common") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n_common") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n_common") * F.col("sxy") - F.col("sx") * F.col("sy")
    r = (
        F.when(
            (vx > 0) & (vy > 0),
            cov.cast("double") / F.sqrt(vx.cast("double") * vy.cast("double")),
        )
        .otherwise(0.0)
    )
    return (
        pairs.select("leader", "follower", "n_common", r.alias("lag1_r"))
        .orderBy(F.abs(F.col("lag1_r")).desc(), "leader", "follower")
        .limit(LEADLAG_TOP_K)
    )


# --- concentration trend ----------------------------------------------------


@register(
    "q_concentration_trend",
    oracle="""
    WITH cust_year AS (
        SELECT EXTRACT(year FROM o_orderdate) AS y, o_custkey,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
                    AS DECIMAL(19,0)) AS cents
        FROM orders GROUP BY 1, 2
    )
    SELECT y AS order_year,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(SUM(cents * cents) AS DOUBLE)
             / (CAST(SUM(cents) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE)) AS hhi,
           CAST(COUNT(*) AS DOUBLE) * (CAST(SUM(cents * cents) AS DOUBLE)
             / (CAST(SUM(cents) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE)))
             AS hhi_vs_uniform
    FROM cust_year
    GROUP BY y
    ORDER BY order_year
    """,
    description="customer-revenue HHI per year (is the business concentrating or democratizing — market structure as a time series, n·HHI normalizes across changing customer counts)",
)
def q_concentration_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is revenue concentrating? The Herfindahl index per order year
    — q_customer_concentration_hhi ranks markets at a point in time;
    this makes structure a TIME SERIES, and hhi_vs_uniform (n·HHI,
    =1 for perfectly equal customers) removes the mechanical drift a
    changing customer count adds, so rising values mean genuine
    concentration. Same decimal(19) lift so cents² sums losslessly;
    the two reported ratios are fixed-order IEEE expressions.

    Scale: per-(year, customer) reduce with map-side combine, then a
    |years| rollup. Nothing joins.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust_year = orders.groupBy(
        F.year("o_orderdate").alias("order_year"), "o_custkey"
    ).agg(
        (F.sum(dec("o_totalprice", 2, 12)) * 100)
        .cast("bigint")
        .cast("decimal(19,0)")
        .alias("cents")
    )
    s = F.sum("cents")
    sq = F.sum(F.col("cents") * F.col("cents"))
    hhi = sq.cast("double") / (s.cast("double") * s.cast("double"))
    return (
        cust_year.groupBy("order_year")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            s.cast("bigint").alias("total_cents"),
            hhi.alias("hhi"),
            (F.count(F.lit(1)).cast("double") * hhi).alias("hhi_vs_uniform"),
        )
        .orderBy("order_year")
    )


# --- tokenizer stress shortlist ---------------------------------------------

STRESS_TOP_K = 30


@register(
    "txt_tokenizer_stress",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, lang,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS n_bpe
        FROM documents
    )
    SELECT doc_id, lang, n_chars, n_bpe,
           CAST(n_bpe AS DOUBLE) / n_chars AS tokens_per_char
    FROM sized
    WHERE n_chars > 0
    ORDER BY tokens_per_char DESC, doc_id
    LIMIT {STRESS_TOP_K}
    """,
    description="docs with the worst token-inflation (tokens per char) — the tokenizer-hostile shortlist behind the fertility aggregate",
)
def txt_tokenizer_stress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cur_tokenizer_fertility reports chars/token per slice; this
    names the WORST documents — the token-inflated content (digit
    runs, symbol soup, no-space scripts) that burns context budget
    fastest. The shortlist is what you inspect before changing
    tokenizers, and the cap list a context-budget enforcer consults.
    tokens_per_char is one division of exact ints; deterministic
    (ratio desc, doc_id) order.

    Scale: row-local counts in the scan projection; TakeOrdered(k).
    """
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.regexp_count("text", F.lit(BPE_RE)).cast("bigint").alias("n_bpe"),
    ).where(F.col("n_chars") > 0)
    return (
        sized.select(
            "doc_id",
            "lang",
            "n_chars",
            "n_bpe",
            (F.col("n_bpe").cast("double") / F.col("n_chars")).alias(
                "tokens_per_char"
            ),
        )
        .orderBy(F.desc("tokens_per_char"), "doc_id")
        .limit(STRESS_TOP_K)
    )


# --- hash-vs-time split leak matrix -----------------------------------------


def _split_leak_matrix_oracle() -> str:
    from lime_etl_spark.operators.insights2 import TIME_SPLIT_CUTOFF
    from lime_etl_spark.operators.training import _bucket_sql

    b = _bucket_sql("user_id", 100)
    return f"""
    WITH tagged AS (
        SELECT CASE WHEN {b} < 80 THEN 'train'
                    WHEN {b} < 90 THEN 'val'
                    ELSE 'test' END AS hash_split,
               CASE WHEN ts < TIMESTAMP '{TIME_SPLIT_CUTOFF}' THEN 'past'
                    ELSE 'future' END AS time_split
        FROM events
    ), total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tagged)
    SELECT hash_split, time_split,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS DOUBLE) / t.n AS share
    FROM tagged CROSS JOIN total t
    GROUP BY hash_split, time_split, t.n
    ORDER BY hash_split, time_split
    """


@register(
    "samp_split_leak_matrix",
    oracle=None,  # attached below
    description="hash-split × temporal-split event matrix: how much FUTURE lands in hash-train (the leakage a forecasting eval inherits by using the wrong split)",
)
def samp_split_leak_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The split-strategy decision in one table: cross-tabulating the
    user-hash 80/10/10 against the temporal past/future cut shows
    exactly how much future mass a hash split trains on —
    hash-train × future is the leakage cell a forecasting objective
    cannot tolerate (samp_time_split is the fix; this quantifies why
    in event units). Both assignments are the REAL expressions the
    samplers use, so the matrix audits the actual pipeline, not a
    model of it.

    Scale: both split tags are row-local; the 3×2 rollup combines
    map-side; the total is a broadcast scalar.
    """
    from lime_etl_spark.operators.insights2 import TIME_SPLIT_CUTOFF
    from lime_etl_spark.operators.training import hash_bucket

    ev = load_table(spark, sf_dir, "events")
    b = hash_bucket(F.col("user_id"), 100)
    hash_split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    time_split = F.when(
        F.col("ts") < F.lit(TIME_SPLIT_CUTOFF).cast("timestamp"), "past"
    ).otherwise("future")
    tagged = ev.select(
        hash_split.alias("hash_split"), time_split.alias("time_split")
    )
    total = tagged.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        tagged.groupBy("hash_split", "time_split")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .join(F.broadcast(total))
        .select(
            "hash_split",
            "time_split",
            "n_events",
            (F.col("n_events").cast("double") / F.col("n")).alias("share"),
        )
        .orderBy("hash_split", "time_split")
    )


_spec = _registry._REGISTRY["samp_split_leak_matrix"]
_registry._REGISTRY["samp_split_leak_matrix"] = _registry.QuerySpec(
    _spec.name, _spec.builder, _split_leak_matrix_oracle(), _spec.description
)
del _spec


# --- cohort quality trend ---------------------------------------------------


@register(
    "ev_cohort_quality_trend",
    oracle="""
    WITH firstd AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ), cohorts AS (
        SELECT user_id, CAST(date_trunc('week', d0) AS DATE) AS cohort_week, d0
        FROM firstd
    ), w1 AS (
        SELECT c.cohort_week, c.user_id,
               CAST(COUNT(*) AS BIGINT) AS w1_events,
               CAST(MAX(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS w1_purchased
        FROM cohorts c
        JOIN events e ON e.user_id = c.user_id
         AND CAST(e.ts AS DATE) < c.d0 + INTERVAL 7 DAY
        GROUP BY c.cohort_week, c.user_id
    )
    SELECT cohort_week,
           CAST(COUNT(*) AS BIGINT) AS n_new_users,
           CAST(SUM(w1_events) AS BIGINT) AS w1_events,
           CAST(SUM(w1_events) AS DOUBLE) / COUNT(*) AS w1_events_per_user,
           CAST(SUM(w1_purchased) AS BIGINT) AS w1_purchasers,
           CAST(SUM(w1_purchased) AS DOUBLE) / COUNT(*) AS w1_purchase_rate
    FROM w1
    GROUP BY cohort_week
    ORDER BY cohort_week
    """,
    description="week-1 engagement and purchase rate per signup cohort (is NEW USER QUALITY declining — the growth-mix early-warning)",
)
def ev_cohort_quality_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth can rise while quality falls — this catches it: each
    signup-week cohort's first-seven-days events per user and
    purchase rate, comparable across cohorts because the window is
    anchored to each user's own first day (no right-censoring inside
    the window). A declining line under rising n_new_users means the
    new acquisition channel ships worse users — the earliest
    warning retention curves confirm weeks later. Exact counters,
    one division per rate.

    Scale: first-day reduce and the week-1 event join ride user_id;
    the cohort rollup combines map-side to |weeks| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    firstd = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    cohorts = firstd.select(
        "user_id", F.date_trunc("week", "d0").cast("date").alias("cohort_week"), "d0"
    )
    w1 = (
        ev.join(cohorts, "user_id")
        .where(F.to_date("ts") < F.date_add("d0", 7))
        .groupBy("cohort_week", "user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("w1_events"),
            F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("w1_purchased"),
        )
    )
    return (
        w1.groupBy("cohort_week")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_new_users"),
            F.sum("w1_events").cast("bigint").alias("w1_events"),
            (F.sum("w1_events").cast("double") / F.count(F.lit(1))).alias(
                "w1_events_per_user"
            ),
            F.sum("w1_purchased").cast("bigint").alias("w1_purchasers"),
            (F.sum("w1_purchased").cast("double") / F.count(F.lit(1))).alias(
                "w1_purchase_rate"
            ),
        )
        .orderBy("cohort_week")
    )


# --- outlier mass share -----------------------------------------------------


@register(
    "dq_outlier_mass",
    oracle="""
    WITH cents AS (
        SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
        FROM orders
    ), fences AS (
        SELECT quantile_cont(c, 0.25) AS q1, quantile_cont(c, 0.75) AS q3
        FROM cents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(c) AS BIGINT) AS total_cents,
           CAST(SUM(CASE WHEN c > f.q3 + 1.5 * (f.q3 - f.q1) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           CAST(SUM(CASE WHEN c > f.q3 + 1.5 * (f.q3 - f.q1) THEN c ELSE 0 END)
                AS BIGINT) AS outlier_cents,
           CAST(SUM(CASE WHEN c > f.q3 + 1.5 * (f.q3 - f.q1) THEN c ELSE 0 END)
                AS DOUBLE) / SUM(c) AS outlier_mass_share
    FROM cents CROSS JOIN fences f
    """,
    description="revenue mass above the Tukey upper fence (does the TOTAL depend on outliers — the number that says whether trimming changes the answer)",
)
def dq_outlier_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dq_outlier_iqr counts outliers; this weighs them — the share
    of total revenue sitting above the Tukey fence. Near zero, any
    trimming/winsorizing decision is cosmetic; large, every
    mean-based metric is an outlier artifact and medians/caps are
    mandatory (samp_winsorize_audit executes that decision — this
    prices it). Fences interpolate over exact integer cents
    (identical doubles both engines); the flagged sums are exact
    integers and the share is one division.

    Scale: one scan to cents; the fences are a 1-row broadcast; the
    conditional rollup combines map-side to a single row.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = orders.select(
        (dec("o_totalprice", 2, 12) * 100).cast("bigint").alias("c")
    )
    fences = cents.agg(
        F.percentile("c", F.lit(0.25)).alias("q1"),
        F.percentile("c", F.lit(0.75)).alias("q3"),
    )
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    out = F.when(F.col("c") > hi, F.col("c")).otherwise(0)
    flag = F.when(F.col("c") > hi, 1).otherwise(0)
    return cents.join(F.broadcast(fences)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("c").cast("bigint").alias("total_cents"),
        F.sum(flag).cast("bigint").alias("n_outliers"),
        F.sum(out).cast("bigint").alias("outlier_cents"),
        (F.sum(out).cast("double") / F.sum("c")).alias("outlier_mass_share"),
    )


# --- integer-decided outlier profile ----------------------------------------


@register(
    "emb_outlier_profile",
    oracle="""
    WITH m AS (
        SELECT MAX(list_max(list_transform(CAST(embedding AS DOUBLE[]), v -> abs(v)))) / 127 AS s
        FROM embeddings
    ),
    q AS (
        SELECT vec_id, label,
               list_transform(
                   CAST(embedding AS DOUBLE[]),
                   v -> CAST(GREATEST(LEAST(floor(v / s + 0.5), 127), -127) AS BIGINT)
               ) AS qv
        FROM embeddings, m
    ),
    ex AS (SELECT vec_id, label, qv, unnest(generate_series(1, len(qv))) AS i FROM q),
    cent AS (
        SELECT label, i AS pos,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(qv[i]) AS BIGINT) AS sq
        FROM ex GROUP BY label, i
    ),
    dist AS (
        SELECT e.vec_id, e.label,
               CAST(SUM((e.qv[e.i] * c.n - c.sq) * (e.qv[e.i] * c.n - c.sq))
                    AS BIGINT) AS dist_num
        FROM ex e JOIN cent c ON c.label = e.label AND c.pos = e.i
        GROUP BY e.vec_id, e.label
    ), lbl AS (
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(dist_num) AS BIGINT) AS sum_dist
        FROM dist GROUP BY label
    )
    SELECT d.label, l.n_vecs,
           CAST(SUM(CASE WHEN d.dist_num * l.n_vecs > 2 * l.sum_dist
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_over_2x_mean,
           CAST(SUM(CASE WHEN d.dist_num * l.n_vecs > 4 * l.sum_dist
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_over_4x_mean
    FROM dist d JOIN lbl l ON l.label = d.label
    GROUP BY d.label, l.n_vecs
    ORDER BY d.label
    """,
    description="per-label counts of vectors 2x/4x beyond the label's MEAN centroid distance, decided in pure integers (the outlier-depth profile behind the top-k shortlist)",
)
def emb_outlier_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """emb_label_outliers names the worst vectors; this profiles the
    DEPTH per label: how many sit 2× and 4× beyond their label's own
    mean squared distance — a label with a fat 4× tail has a
    contamination problem, not a few typos. The k×mean comparison is
    multiplied out (dist·n > k·Σdist) so the thresholds are pure
    int64 decisions, immune to float drift.

    Scale: the same broadcast centroid join as the shortlist; two
    map-side reduces; the comparison runs at |vectors| grain with
    |labels|-row state. Int64: dist_num ≤ dim·(127·2n)² — switch to
    decimal(38,0) past ~10³ vectors/label (same envelope note as
    emb_fisher_ratio).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = with_int8_vectors(emb, "vec_id", "label").persist()
    ex = q.select("vec_id", "label", F.posexplode("qv").alias("pos", "v"))
    cent = ex.groupBy("label", "pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("sq"),
    )
    term = (F.col("v") * F.col("n") - F.col("sq")) * (
        F.col("v") * F.col("n") - F.col("sq")
    )
    dist = (
        ex.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.sum(term).cast("bigint").alias("dist_num"))
    )
    lbl = dist.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum("dist_num").cast("bigint").alias("sum_dist"),
    )
    jt = dist.join(F.broadcast(lbl), "label")
    over2 = F.when(F.col("dist_num") * F.col("n_vecs") > 2 * F.col("sum_dist"), 1).otherwise(0)
    over4 = F.when(F.col("dist_num") * F.col("n_vecs") > 4 * F.col("sum_dist"), 1).otherwise(0)
    return (
        jt.groupBy("label", "n_vecs")
        .agg(
            F.sum(over2).cast("bigint").alias("n_over_2x_mean"),
            F.sum(over4).cast("bigint").alias("n_over_4x_mean"),
        )
        .orderBy("label")
    )


# --- shingle hot-key audit --------------------------------------------------

SHINGLE_SKEW_TOP_K = 20


def _shingle_skew_oracle() -> str:
    from lime_etl_spark.operators.dedup import _SHINGLES_SQL

    return f"""
    WITH sh AS ({_SHINGLES_SQL}),
    freq AS (
        SELECT x, CAST(COUNT(*) AS BIGINT) AS n_docs FROM sh GROUP BY x
    ), total AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_shingle_rows,
               CAST(SUM(n_docs * n_docs) AS BIGINT) AS pair_cost
        FROM freq
    )
    SELECT f.x AS shingle_hash, f.n_docs,
           CAST(f.n_docs * f.n_docs AS BIGINT) AS pair_contribution,
           CAST(f.n_docs * f.n_docs AS DOUBLE) / t.pair_cost AS pair_cost_share
    FROM freq f CROSS JOIN total t
    ORDER BY f.n_docs DESC, f.x
    LIMIT {SHINGLE_SKEW_TOP_K}
    """


@register(
    "dedup_shingle_skew",
    oracle=None,  # attached below
    description="hottest shingles by document frequency and their share of the exhaustive join's pair cost (the hot-key audit for the shared-shingle path)",
)
def dedup_shingle_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup planner's hot-key table: the exhaustive
    shared-shingle join squares on hot shingles (a shingle in n docs
    contributes n² pairs), and this ranks the hottest with each one's
    share of that quadratic bill — the direct evidence for why the
    LSH path exists (and the input to a stopword-shingle filter if a
    handful of template shingles carry most of the cost).
    dq_join_skew audits fact-join keys; this is the same discipline
    aimed at the dedup join. Exact counts and integer squares; one
    division per row.

    Scale: one (shingle → doc count) reduce over the distinct
    shingle table; the cost total is a 1-row broadcast;
    TakeOrdered(k).
    """
    from lime_etl_spark.operators.dedup import doc_shingles

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        doc_shingles(docs)
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .persist()
    )
    total = freq.agg(
        F.sum(F.col("n_docs") * F.col("n_docs")).cast("bigint").alias("pair_cost")
    )
    return (
        freq.join(F.broadcast(total))
        .select(
            F.col("x").alias("shingle_hash"),
            "n_docs",
            (F.col("n_docs") * F.col("n_docs")).cast("bigint").alias(
                "pair_contribution"
            ),
            (
                (F.col("n_docs") * F.col("n_docs")).cast("double")
                / F.col("pair_cost")
            ).alias("pair_cost_share"),
        )
        .orderBy(F.desc("n_docs"), "shingle_hash")
        .limit(SHINGLE_SKEW_TOP_K)
    )


_spec = _registry._REGISTRY["dedup_shingle_skew"]
_registry._REGISTRY["dedup_shingle_skew"] = _registry.QuerySpec(
    _spec.name, _spec.builder, _shingle_skew_oracle(), _spec.description
)
del _spec


# --- returns by year --------------------------------------------------------


@register(
    "q_returns_by_year",
    oracle="""
    SELECT EXTRACT(year FROM l_shipdate) AS ship_year,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returned,
           CAST(SUM(CASE WHEN l_returnflag = 'R'
                         THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE)
             AS returned_value,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS return_rate
    FROM lineitem
    GROUP BY 1
    ORDER BY ship_year
    """,
    description="return rate and returned value per ship year (the WHEN of the returns family next to by-brand and by-discount)",
)
def q_returns_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The time axis of the returns family: rate and money returned
    per ship year. Brand says who, discount says under what terms —
    a rising year line says the problem is getting worse regardless
    of both, which reprioritizes the whole investigation. Exact
    counters and decimal value sums; one division per year.

    Scale: single scan, three pushed columns, |years| map-side
    rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ret = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    ret_val = F.when(F.col("l_returnflag") == "R", dec("l_extendedprice"))
    return (
        li.groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(ret).cast("bigint").alias("n_returned"),
            F.sum(ret_val).cast("double").alias("returned_value"),
            (F.sum(ret).cast("double") / F.count(F.lit(1))).alias("return_rate"),
        )
        .orderBy("ship_year")
    )


# --- int4 vs int8 quantization tradeoff -------------------------------------


@register(
    "emb_int4_vs_int8_error",
    oracle="""
    WITH m AS (
        SELECT MAX(list_max(list_transform(CAST(embedding AS DOUBLE[]), v -> abs(v)))) AS mx
        FROM embeddings
    ), err AS (
        SELECT list_transform(
                   CAST(embedding AS DOUBLE[]),
                   v -> abs(v - GREATEST(LEAST(floor(v / (mx / 127) + 0.5), 127), -127)
                                * (mx / 127))
               ) AS e8,
               list_transform(
                   CAST(embedding AS DOUBLE[]),
                   v -> abs(v - GREATEST(LEAST(floor(v / (mx / 7) + 0.5), 7), -7)
                                * (mx / 7))
               ) AS e4
        FROM embeddings, m
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(list_sum(e8)) AS DOUBLE) / SUM(len(e8)) AS int8_mean_abs_err,
           CAST(MAX(list_max(e8)) AS DOUBLE) AS int8_max_abs_err,
           CAST(SUM(list_sum(e4)) AS DOUBLE) / SUM(len(e4)) AS int4_mean_abs_err,
           CAST(MAX(list_max(e4)) AS DOUBLE) AS int4_max_abs_err
    FROM err
    """,
    description="reconstruction error at int8 vs int4 under the same symmetric scale (the compression-depth decision table: is another 2x storage cut worth the error)",
)
def emb_int4_vs_int8_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is int4 good enough? Mean/max reconstruction error at 8 and 4
    bits under the same corpus-global symmetric scale, side by side —
    the storage ladder (float32 → int8 → int4 halves again) priced in
    the same units emb_quantize_error audits for the production
    int8 path. Error sums are fixed-order double folds over
    identical per-element expressions, so both engines agree.

    Scale: one scan, row-local transforms, a 1-row reduce; the
    decision table costs one pass regardless of corpus size.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding").cast("array<double>")
    mx = emb.agg(
        F.max(F.array_max(F.transform(x, lambda v: F.abs(v)))).alias("mx")
    )

    def err(levels: int):
        s = F.col("mx") / levels
        return F.transform(
            x,
            lambda v: F.abs(
                v
                - F.greatest(
                    F.least(F.floor(v / s + 0.5), F.lit(float(levels))),
                    F.lit(float(-levels)),
                )
                * s
            ),
        )

    e8 = err(127)
    e4 = err(7)
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, v: a + v)  # noqa: E731
    return (
        emb.join(F.broadcast(mx))
        .select(
            fold(e8).alias("s8"),
            F.array_max(e8).alias("m8"),
            F.size(e8).alias("k8"),
            fold(e4).alias("s4"),
            F.array_max(e4).alias("m4"),
            F.size(e4).alias("k4"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            (F.sum("s8") / F.sum("k8")).alias("int8_mean_abs_err"),
            F.max("m8").cast("double").alias("int8_max_abs_err"),
            (F.sum("s4") / F.sum("k4")).alias("int4_mean_abs_err"),
            F.max("m4").cast("double").alias("int4_max_abs_err"),
        )
    )


# --- text ingest drift ------------------------------------------------------


@register(
    "txt_ingest_drift",
    oracle=f"""
    WITH bnds AS (
        SELECT MIN(doc_id) AS lo, MAX(doc_id) - MIN(doc_id) + 1 AS span
        FROM documents
    ),
    bucketed AS (
        SELECT {ingest_bucket_sql("doc_id", DRIFT_BUCKETS)} AS bucket,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS n_bpe
        FROM documents, bnds
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars,
           CAST(SUM(n_chars) AS DOUBLE) / SUM(n_bpe) AS chars_per_token
    FROM bucketed
    GROUP BY bucket
    ORDER BY bucket
    """,
    description="document length and chars/token across ingest-order buckets (did the crawler or cleaning pipeline change mid-corpus — emb_ingest_drift's text twin)",
)
def txt_ingest_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did the TEXT pipeline change mid-ingest? Length and
    token-density across ingest-order buckets — a cleaning change, a
    new source mix, or a truncation bug shows as a step in mean
    length or chars/token (the same monitor emb_ingest_drift runs on
    vectors, aimed at the text column). Exact sums, one division
    per ratio.

    Scale: buckets are ARITHMETIC id-range slices from a broadcast
    1-row min/max (functions/ranks.with_ingest_bucket) — row-local,
    no sort, no shuffle; everything else is a {DRIFT_BUCKETS}-row
    rollup.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucketed = with_ingest_bucket(docs, "doc_id", DRIFT_BUCKETS).select(
        "bucket",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.regexp_count("text", F.lit(BPE_RE)).cast("bigint").alias("n_bpe"),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_bpe").cast("bigint").alias("total_bpe"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("mean_chars"),
            (F.sum("n_chars").cast("double") / F.sum("n_bpe")).alias(
                "chars_per_token"
            ),
        )
        .orderBy("bucket")
    )


# --- cluster source spread --------------------------------------------------


@register(
    "dedup_cluster_source_spread",
    oracle=f"""
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
    cc AS (
        SELECT vid AS doc_id, CAST(MIN(lab) AS BIGINT) AS component_id
        FROM reach GROUP BY vid
    ),
    clusters AS (
        SELECT cc.component_id,
               CAST(COUNT(*) AS BIGINT) AS size,
               CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_sources
        FROM cc JOIN documents d ON d.doc_id = cc.doc_id
        GROUP BY cc.component_id
        HAVING COUNT(*) >= 2
    )
    SELECT n_sources,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(size) AS BIGINT) AS n_docs,
           CAST(MAX(size) AS BIGINT) AS max_cluster_size
    FROM clusters
    GROUP BY n_sources
    ORDER BY n_sources
    """,
    description="near-dup clusters by how many sources they span (transitive syndication: cluster-grain spread that pair-grain cross-source cells miss)",
)
def dedup_cluster_source_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How far does one piece of content travel?
    dedup_cross_source_matrix counts PAIR crossings; a cluster that
    chains A→B→C shows up here as a 3-source cluster even when no
    single A-C pair was verified — the transitive spread that decides
    whether provenance metadata survives dedup at all (keep one doc,
    record all sources). Multi-doc clusters histogrammed by distinct
    source count; exact counters throughout.

    Scale: inherits the component pipeline; the per-cluster reduce
    carries one distinct-source counter (bounded by |sources|).
    """
    from lime_etl_spark.operators.graph import dedup_components

    docs = load_table(spark, sf_dir, "documents")
    cc = dedup_components(spark, sf_dir)
    clusters = (
        cc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("component_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("size"),
            F.count_distinct("source").cast("bigint").alias("n_sources"),
        )
        .where(F.col("size") >= 2)
    )
    return (
        clusters.groupBy("n_sources")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("size").cast("bigint").alias("n_docs"),
            F.max("size").cast("bigint").alias("max_cluster_size"),
        )
        .orderBy("n_sources")
    )


# --- decontamination k-sensitivity ------------------------------------------

DECON_SWEEP = (8, 13, 21)


def _decon_sensitivity_oracle() -> str:
    from lime_etl_spark.operators.curation import _gram_sql
    from lime_etl_spark.operators.training import _bucket_sql

    b = _bucket_sql("doc_id", 100)
    legs = []
    for k in DECON_SWEEP:
        legs.append(f"""
        SELECT CAST({k} AS BIGINT) AS gram_n,
               CAST(COUNT(DISTINCT g.doc_id) AS BIGINT) AS n_contaminated
        FROM (
            SELECT DISTINCT doc_id, b, gram FROM (
                SELECT doc_id, {b} AS b,
                       unnest({_gram_sql(k)}) AS gram
                FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
            )
        ) g
        JOIN (
            SELECT DISTINCT gram FROM (
                SELECT {b} AS b, unnest({_gram_sql(k)}) AS gram
                FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
            ) WHERE b >= 90
        ) tg USING (gram)
        WHERE g.b < 80
        """)
    union = " UNION ALL ".join(legs)
    return f"""
    WITH train AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_train FROM (
            SELECT doc_id FROM documents WHERE {b} < 80
        )
    )
    SELECT u.gram_n, u.n_contaminated, t.n_train,
           CAST(u.n_contaminated AS DOUBLE) / t.n_train AS contamination_rate
    FROM ({union}) u CROSS JOIN train t
    ORDER BY u.gram_n
    """


@register(
    "cur_decontam_sensitivity",
    oracle=None,  # attached below
    description="contaminated-doc counts for an n-gram-size sweep (8/13/21) — how much the decontamination verdict depends on the contested k choice",
)
def cur_decontam_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The n-gram size in decontamination is a contested constant —
    smaller n flags more (and over-flags common phrases), larger n
    misses paraphrases. This sweeps {{{", ".join(str(k) for k in DECON_SWEEP)}}}
    with the SAME split and probe shape as cur_decontaminate: a flat
    line means the verdict is robust to k, a cliff means the chosen
    constant is doing silent work. Monotone by construction (every
    (k+j)-gram match contains a k-gram match) — the test asserts it.

    Scale: one gram explode per k (the k's can't share shingles),
    each with the broadcast test-gram probe; counts reduce to 3 rows.
    """
    from lime_etl_spark.functions.text import tokens, word_shingles
    from lime_etl_spark.operators.training import hash_bucket

    docs = load_table(spark, sf_dir, "documents").persist()
    b = hash_bucket(F.col("doc_id"), 100)
    n_train = docs.where(b < 80).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_train")
    )
    parts = []
    for k in DECON_SWEEP:
        grams = docs.select(
            "doc_id", b.alias("b"), F.explode(word_shingles(tokens(), k)).alias("gram")
        ).distinct()
        test_grams = grams.where(F.col("b") >= 90).select("gram").distinct()
        cont = (
            grams.where(F.col("b") < 80)
            .join(F.broadcast(test_grams), "gram")
            .agg(F.count_distinct("doc_id").cast("bigint").alias("n_contaminated"))
            .select(F.lit(k).cast("bigint").alias("gram_n"), "n_contaminated")
        )
        parts.append(cont)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (
        out.crossJoin(F.broadcast(n_train))
        .select(
            "gram_n",
            "n_contaminated",
            "n_train",
            (F.col("n_contaminated").cast("double") / F.col("n_train")).alias(
                "contamination_rate"
            ),
        )
        .orderBy("gram_n")
    )


_spec = _registry._REGISTRY["cur_decontam_sensitivity"]
_registry._REGISTRY["cur_decontam_sensitivity"] = _registry.QuerySpec(
    _spec.name, _spec.builder, _decon_sensitivity_oracle(), _spec.description
)
del _spec


# --- at-risk users ----------------------------------------------------------

AT_RISK_MIN_DAYS = 3  # need a cadence to deviate from
AT_RISK_TOP_K = 50


@register(
    "ev_at_risk_users",
    oracle=f"""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), span AS (
        SELECT MAX(d) AS as_of FROM ud
    ), gaps AS (
        SELECT user_id,
               date_diff('day', LAG(d) OVER (PARTITION BY user_id ORDER BY d), d)
                 AS g
        FROM ud
    ), cadence AS (
        SELECT user_id,
               CAST(COUNT(g) AS BIGINT) AS n_gaps,
               CAST(FLOOR(quantile_cont(g, 0.5)) AS BIGINT) AS median_gap
        FROM gaps WHERE g IS NOT NULL
        GROUP BY user_id
        HAVING COUNT(g) >= {AT_RISK_MIN_DAYS - 1}
    ), last_seen AS (
        SELECT user_id, MAX(d) AS last_d FROM ud GROUP BY user_id
    )
    SELECT c.user_id, c.median_gap,
           CAST(date_diff('day', l.last_d, s.as_of) AS BIGINT) AS days_silent
    FROM cadence c
    JOIN last_seen l ON l.user_id = c.user_id
    CROSS JOIN span s
    WHERE date_diff('day', l.last_d, s.as_of) > 3 * GREATEST(c.median_gap, 1)
    ORDER BY days_silent DESC, c.user_id
    LIMIT {AT_RISK_TOP_K}
    """,
    description="users silent 3x beyond their OWN median cadence (the churn-risk outreach list — personal baselines, not a global cutoff)",
)
def ev_at_risk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The outreach list: users whose current silence exceeds 3×
    their OWN median active-day gap — a daily user going quiet for a
    week is at risk while a weekly user isn't, which is exactly what
    a global dormancy cutoff (q22's approach) gets wrong. The
    comparison days_silent > 3·max(median,1) is pure integers (the
    median floors to int), the snapshot is the ledger's max day, and
    the list is TakeOrdered-bounded.

    Scale: distinct user-days reduce map-side; gaps and the
    last-seen reduce ride the same user_id key; the 1-row as-of
    broadcast closes it.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct().persist()
    span = ud.agg(F.max("d").alias("as_of"))
    w = Window.partitionBy("user_id").orderBy("d")
    gaps = ud.select(
        "user_id", F.datediff("d", F.lag("d").over(w)).alias("g")
    ).where(F.col("g").isNotNull())
    cadence = (
        gaps.groupBy("user_id")
        .agg(
            F.count("g").cast("bigint").alias("n_gaps"),
            F.floor(F.percentile("g", F.lit(0.5))).cast("bigint").alias("median_gap"),
        )
        .where(F.col("n_gaps") >= AT_RISK_MIN_DAYS - 1)
    )
    last_seen = ud.groupBy("user_id").agg(F.max("d").alias("last_d"))
    jt = (
        cadence.join(last_seen, "user_id")
        .crossJoin(F.broadcast(span))
        .select(
            "user_id",
            "median_gap",
            F.datediff("as_of", "last_d").cast("bigint").alias("days_silent"),
        )
    )
    return (
        jt.where(
            F.col("days_silent") > 3 * F.greatest(F.col("median_gap"), F.lit(1))
        )
        .orderBy(F.desc("days_silent"), "user_id")
        .limit(AT_RISK_TOP_K)
    )


# --- cross-sell whitespace --------------------------------------------------

XSELL_TOP_PAIRS = 10


@register(
    "q_cross_sell_gaps",
    oracle=f"""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey, o.o_custkey, p.p_brand
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
    ), pairs AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               CAST(COUNT(*) AS BIGINT) AS n_both_orders
        FROM (SELECT DISTINCT l_orderkey, p_brand FROM ob) a
        JOIN (SELECT DISTINCT l_orderkey, p_brand FROM ob) b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
        ORDER BY n_both_orders DESC, brand_a, brand_b
        LIMIT {XSELL_TOP_PAIRS}
    ), cb AS (
        SELECT DISTINCT o_custkey, p_brand FROM ob
    )
    SELECT p.brand_a, p.brand_b, p.n_both_orders,
           CAST((SELECT COUNT(*) FROM cb WHERE p_brand = p.brand_a) AS BIGINT)
             AS n_cust_a,
           CAST((SELECT COUNT(*) FROM cb WHERE p_brand = p.brand_b) AS BIGINT)
             AS n_cust_b,
           CAST((SELECT COUNT(*) FROM cb x
                 WHERE x.p_brand = p.brand_a
                   AND NOT EXISTS (SELECT 1 FROM cb y
                                   WHERE y.o_custkey = x.o_custkey
                                     AND y.p_brand = p.brand_b)) AS BIGINT)
             AS a_not_b,
           CAST((SELECT COUNT(*) FROM cb x
                 WHERE x.p_brand = p.brand_b
                   AND NOT EXISTS (SELECT 1 FROM cb y
                                   WHERE y.o_custkey = x.o_custkey
                                     AND y.p_brand = p.brand_a)) AS BIGINT)
             AS b_not_a
    FROM pairs p
    ORDER BY p.n_both_orders DESC, p.brand_a, p.brand_b
    """,
    description="for the most-associated brand pairs: customers who buy one but never the other (the cross-sell whitespace a campaign actually targets)",
)
def q_cross_sell_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association says the brands GO together; whitespace says who
    hasn't gotten the memo: for the top co-occurring brand pairs,
    the customers holding one side but not the other — the literal
    target list size for a cross-sell campaign, in both directions
    because the two audiences differ. Pair discovery is
    order-bounded (q_basket_pairs' discipline at brand grain); the
    whitespace counts are anti-join counts at (customer, brand)
    grain.

    Scale: the (order, brand) and (customer, brand) dedups combine
    map-side; the pair self-join is bounded by brands-per-order; the
    top pairs broadcast onto the customer-brand rollup for the gap
    counts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .select("l_orderkey", "o_custkey", "p_brand")
        .distinct()
        .persist()
    )
    order_brand = ob.select("l_orderkey", "p_brand").distinct()
    a = order_brand.alias("a")
    b = order_brand.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"), F.col("b.p_brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both_orders"))
        .orderBy(F.desc("n_both_orders"), "brand_a", "brand_b")
        .limit(XSELL_TOP_PAIRS)
        .persist()  # 10 rows, consumed by both expansion legs
    )
    cb = ob.select("o_custkey", "p_brand").distinct().persist()
    ca = cb.select(F.col("p_brand").alias("brand_a"), F.col("o_custkey").alias("cust_a"))
    # one-sided gaps: expand each top pair to its owning customers,
    # then anti-probe ownership of the other side
    own_a = ca.join(F.broadcast(pairs), "brand_a").select(
        "brand_a", "brand_b", "n_both_orders", F.col("cust_a").alias("cust")
    )
    own_b_keys = cb.select(
        F.col("p_brand").alias("brand_b"), F.col("o_custkey").alias("cust")
    )
    a_not_b = (
        own_a.join(own_b_keys, ["brand_b", "cust"], "left_anti")
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("a_not_b"))
    )
    own_b = (
        cb.select(F.col("p_brand").alias("brand_b"), F.col("o_custkey").alias("cust"))
        .join(F.broadcast(pairs), "brand_b")
        .select("brand_a", "brand_b", F.col("cust"))
    )
    own_a_keys = cb.select(
        F.col("p_brand").alias("brand_a"), F.col("o_custkey").alias("cust")
    )
    b_not_a = (
        own_b.join(own_a_keys, ["brand_a", "cust"], "left_anti")
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("b_not_a"))
    )
    sizes = cb.groupBy("p_brand").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # Drive the output from the persisted 10-row pairs frame and LEFT-
    # join the gap counts: a fully-penetrated pair (zero whitespace in
    # one direction) produces no group row on that side, and an inner
    # join would silently drop exactly the pairs a campaign table must
    # surface as "no gap left".
    return (
        pairs.join(a_not_b, ["brand_a", "brand_b"], "left")
        .join(b_not_a, ["brand_a", "brand_b"], "left")
        .join(
            F.broadcast(sizes.select(F.col("p_brand").alias("brand_a"), F.col("n").alias("n_cust_a"))),
            "brand_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("p_brand").alias("brand_b"), F.col("n").alias("n_cust_b"))),
            "brand_b",
        )
        .select(
            "brand_a",
            "brand_b",
            "n_both_orders",
            "n_cust_a",
            "n_cust_b",
            F.coalesce("a_not_b", F.lit(0)).cast("bigint").alias("a_not_b"),
            F.coalesce("b_not_a", F.lit(0)).cast("bigint").alias("b_not_a"),
        )
        .orderBy(F.desc("n_both_orders"), "brand_a", "brand_b")
    )


# --- basket breadth ---------------------------------------------------------


@register(
    "q_basket_breadth",
    oracle="""
    WITH per_order AS (
        SELECT l.l_orderkey,
               CAST(COUNT(DISTINCT p.p_brand) AS BIGINT) AS n_brands,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
                 AS order_value
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY l.l_orderkey
    )
    SELECT n_brands,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(order_value) AS DOUBLE) AS total_value,
           CAST(SUM(order_value) AS DOUBLE) / COUNT(*) AS avg_order_value
    FROM per_order
    GROUP BY n_brands
    ORDER BY n_brands
    """,
    description="orders by distinct-brand breadth with average value per breadth (do diverse baskets spend more — the assortment-width evidence)",
)
def q_basket_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does assortment width pay? Orders bucketed by how many
    DISTINCT brands they touch, with average order value per bucket —
    rising value with breadth is the evidence behind mixed-bundle
    merchandising; flat value means breadth is noise and
    q_basket_pairs' affinity cells matter more. Brand lookup
    broadcasts; per-order distinct-brand state is bounded by lines
    per order; value sums are decimal-exact with one division per
    bucket.

    Scale: one partkey broadcast join at fact grain, a per-order
    map-side reduce, then a ≤|brands|-row rollup.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    per_order = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("p_brand").cast("bigint").alias("n_brands"),
            F.sum(dec("l_extendedprice")).cast("decimal(38,2)").alias("order_value"),
        )
    )
    return (
        per_order.groupBy("n_brands")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("order_value").cast("double").alias("total_value"),
            (F.sum("order_value").cast("double") / F.count(F.lit(1))).alias(
                "avg_order_value"
            ),
        )
        .orderBy("n_brands")
    )


# --- LSH recall vs window ground truth --------------------------------------


def _lsh_window_recall_oracle() -> str:
    from lime_etl_spark.operators.dedup import (
        _JACCARD_SQL_TAIL,
        _SHINGLES_SQL,
        JACCARD_TAU,
    )

    truth = f"""
        WITH sh AS ({_SHINGLES_SQL}),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
            FROM sh a JOIN sh b
              ON a.x = b.x AND a.doc_id < b.doc_id
             AND b.doc_id - a.doc_id <= {WINDOW_DEDUP_W}
            GROUP BY a.doc_id, b.doc_id
        )
        {_JACCARD_SQL_TAIL}
        WHERE CAST(i.n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) >= {JACCARD_TAU}
    """
    lsh = _minhash_sql()
    return f"""
    WITH truth AS ({truth}),
    lsh AS (SELECT doc_a, doc_b FROM ({lsh})),
    hits AS (
        SELECT t.doc_a FROM truth t
        JOIN lsh l ON l.doc_a = t.doc_a AND l.doc_b = t.doc_b
    )
    SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth_pairs,
           CAST((SELECT COUNT(*) FROM hits) AS BIGINT) AS n_lsh_found,
           CASE WHEN (SELECT COUNT(*) FROM truth) > 0
                THEN CAST((SELECT COUNT(*) FROM hits) AS DOUBLE)
                     / (SELECT COUNT(*) FROM truth)
                ELSE 1.0 END AS lsh_recall_in_window
    """


@register(
    "dedup_lsh_window_recall",
    oracle=None,  # attached below
    description="LSH recall measured against the window pass's EXHAUSTIVE in-window truth (free ground truth: no all-pairs join, real recall number)",
)
def dedup_lsh_window_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measured-approximation discipline without the exhaustive
    bill: dedup_window_pass is EXHAUSTIVE for pairs within W ids, so
    restricting LSH to the same window yields a true recall number
    from a cheap ground truth (the full all-pairs truth costs the
    quadratic join this engine exists to avoid). If in-window recall
    is low, the banding config is dropping real dups everywhere —
    dedup_lsh_tuning says which config fixes it.

    Scale: both sides are LSH/window-bounded; the hit join runs at
    pair grain over two small pair sets.
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
    truth = dedup_window_pass(spark, sf_dir).select("doc_a", "doc_b").persist()
    lsh = (
        jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh)))
        .where(F.col("jaccard") >= JACCARD_TAU)
        .select("doc_a", "doc_b")
    )
    t = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth_pairs"))
    h = truth.join(lsh, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lsh_found")
    )
    return t.crossJoin(F.broadcast(h)).select(
        "n_truth_pairs",
        "n_lsh_found",
        F.when(
            F.col("n_truth_pairs") > 0,
            F.col("n_lsh_found").cast("double") / F.col("n_truth_pairs"),
        )
        .otherwise(1.0)
        .alias("lsh_recall_in_window"),
    )


_spec = _registry._REGISTRY["dedup_lsh_window_recall"]
_registry._REGISTRY["dedup_lsh_window_recall"] = _registry.QuerySpec(
    _spec.name, _spec.builder, _lsh_window_recall_oracle(), _spec.description
)
del _spec


# --- per-label norm health --------------------------------------------------


@register(
    "emb_label_norms",
    oracle="""
    WITH m AS (
        SELECT MAX(list_max(list_transform(CAST(embedding AS DOUBLE[]), v -> abs(v)))) / 127 AS s
        FROM embeddings
    ),
    q AS (
        SELECT label,
               list_transform(
                   CAST(embedding AS DOUBLE[]),
                   v -> CAST(GREATEST(LEAST(floor(v / s + 0.5), 127), -127) AS BIGINT)
               ) AS qv
        FROM embeddings, m
    ),
    per_vec AS (
        SELECT label,
               CAST(list_sum(list_transform(qv, v -> v * v)) AS BIGINT) AS norm_sq
        FROM q
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(norm_sq) AS BIGINT) AS sum_norm_sq,
           CAST(MIN(norm_sq) AS BIGINT) AS min_norm_sq,
           CAST(MAX(norm_sq) AS BIGINT) AS max_norm_sq,
           CAST(SUM(norm_sq) AS DOUBLE) / COUNT(*) AS mean_norm_sq
    FROM per_vec
    GROUP BY label
    ORDER BY label
    """,
    description="quantized norm statistics per label (does MAGNITUDE encode the class — the shortcut-feature audit next to the direction-based separation views)",
)
def emb_label_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do labels differ in LENGTH, not just direction? Centroid
    separation and Fisher ratio are direction views; if mean norms
    differ strongly by label, magnitude alone is a shortcut feature —
    great for a linear probe, brittle under renormalization, and a
    red flag if the embedder was supposed to be normalized. Exact
    integer norm sums per vector, one division per label.

    Scale: row-local array folds, |labels| map-side rollup.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    per_vec = with_int8_vectors(emb, "label").select(
        "label",
        F.aggregate(
            F.transform("qv", lambda v: v * v),
            F.lit(0).cast("bigint"),
            lambda a, v: a + v,
        ).alias("norm_sq"),
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum("norm_sq").cast("bigint").alias("sum_norm_sq"),
            F.min("norm_sq").cast("bigint").alias("min_norm_sq"),
            F.max("norm_sq").cast("bigint").alias("max_norm_sq"),
            (F.sum("norm_sq").cast("double") / F.count(F.lit(1))).alias(
                "mean_norm_sq"
            ),
        )
        .orderBy("label")
    )


# --- id allocation rate -----------------------------------------------------


@register(
    "dq_id_allocation_rate",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(MAX(event_id) AS BIGINT) AS max_id,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    )
    SELECT d, n_events, max_id,
           CAST(max_id - LAG(max_id) OVER (ORDER BY d) AS BIGINT) AS id_advance,
           CAST(max_id - LAG(max_id) OVER (ORDER BY d) AS BIGINT) - n_events
             AS id_gap
    FROM daily
    ORDER BY d
    """,
    description="daily id-space advance vs rows landed (id_advance − rows = silently lost or externally allocated ranges — the allocator throughput audit)",
)
def dq_id_allocation_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the id allocator advancing faster than rows land? Per day:
    the max-id advance against the rows actually present — a positive
    id_gap means ranges were burned without landing (failed batches,
    another writer, or silent loss), the allocator-side signal
    dq_id_space_audit's static density view can't date.
    dq_id_time_monotonicity checks ORDER; this checks THROUGHPUT.
    Exact integers end to end.

    Scale: daily map-side rollup; the lag window sorts |days| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.max("event_id").cast("bigint").alias("max_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    w = Window.orderBy("d")
    adv = (F.col("max_id") - F.lag("max_id").over(w)).cast("bigint")
    return daily.select(
        "d",
        "n_events",
        "max_id",
        adv.alias("id_advance"),
        (adv - F.col("n_events")).alias("id_gap"),
    ).orderBy("d")


# --- quarter-end loading ----------------------------------------------------


@register(
    "q_quarter_end_loading",
    oracle="""
    WITH tagged AS (
        SELECT strftime(date_trunc('quarter', o_orderdate), '%Y-%m') AS quarter_key,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price,
               CASE WHEN CAST(o_orderdate AS DATE)
                         >= CAST(date_trunc('quarter', o_orderdate) AS DATE)
                            + INTERVAL 3 MONTH - INTERVAL 7 DAY
                    THEN 1 ELSE 0 END AS in_final_week
        FROM orders
    )
    SELECT quarter_key,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(price) AS DOUBLE) AS total_value,
           CAST(SUM(CASE WHEN in_final_week = 1 THEN price END) AS DOUBLE)
             AS final_week_value,
           CAST(COALESCE(SUM(CASE WHEN in_final_week = 1 THEN price END), 0)
                AS DOUBLE) / CAST(SUM(price) AS DOUBLE) AS final_week_share
    FROM tagged
    GROUP BY quarter_key
    ORDER BY quarter_key
    """,
    description="share of each quarter's order value landing in its final 7 days (quota-driven pull-forward: ~7.7% is calendar-neutral, spikes are sales-comp artifacts)",
)
def q_quarter_end_loading(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the quarter end move the revenue? The final-seven-days
    share of each quarter's order value — a calendar-neutral business
    books ~7.7% (7/91); persistent spikes are quota-driven
    pull-forward, which inflates the quarter, starves the next one,
    and correlates with returns (q_returns_by_year is the companion
    check). The final-week predicate is pure date arithmetic both
    engines evaluate identically; sums are decimal-exact with one
    division per quarter.

    Scale: single scan, two pushed columns, |quarters| map-side
    rollup.
    """
    orders = load_table(spark, sf_dir, "orders")
    qstart = F.date_trunc("quarter", "o_orderdate").cast("date")
    final_week_start = F.date_sub(F.add_months(qstart, 3), 7)
    in_final = F.when(F.to_date("o_orderdate") >= final_week_start, 1).otherwise(0)
    tagged = orders.select(
        F.date_format(qstart, "yyyy-MM").alias("quarter_key"),
        dec("o_totalprice").alias("price"),
        in_final.alias("in_final_week"),
    )
    fw = F.sum(F.when(F.col("in_final_week") == 1, F.col("price")))
    return (
        tagged.groupBy("quarter_key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("price").cast("double").alias("total_value"),
            fw.cast("double").alias("final_week_value"),
            (
                F.coalesce(fw, F.lit(0).cast("decimal(18,2)")).cast("double")
                / F.sum("price").cast("double")
            ).alias("final_week_share"),
        )
        .orderBy("quarter_key")
    )


# --- brand mix by customer segment (share + lift) ----------------------------

_SEG_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


@register(
    "q_brand_share_by_segment",
    oracle=f"""
    WITH cell AS (
        SELECT c.c_mktsegment AS segment, p.p_brand,
               COUNT(*) AS n_lines,
               SUM({_SEG_REV_SQL}) AS rev
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    )
    SELECT segment, p_brand,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev AS DOUBLE)
             / CAST(SUM(rev) OVER (PARTITION BY segment) AS DOUBLE) AS seg_share,
           (CAST(rev AS DOUBLE)
              / CAST(SUM(rev) OVER (PARTITION BY segment) AS DOUBLE))
             / (CAST(SUM(rev) OVER (PARTITION BY p_brand) AS DOUBLE)
                / CAST(SUM(rev) OVER () AS DOUBLE)) AS segment_lift
    FROM cell
    ORDER BY segment, p_brand
    """,
    description="brand revenue mix within each customer market segment, with lift vs the brand's overall share (assortment/targeting screen)",
)
def q_brand_share_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which brands over-index in which customer segments — the
    assortment/targeting table: ``seg_share`` is the brand's revenue
    share inside the segment, ``segment_lift`` divides that by the
    brand's overall share (lift >1 → the segment over-buys the brand;
    a uniform brand sits at 1.0). lime-etl analog: a nightly report
    job joining the fact to two dims (reference
    `lime_etl/domain/job_spec.py:40` run()-style table build).

    Exactness: every cell revenue is a decimal-exact sum of
    price*(1-discount); all three share denominators are window/global
    sums of those exact decimals over the |segments|x|brands| (~125
    row) rollup, and the division sequence (rev/seg) / (brand/grand)
    is written identically on both engines.

    Scale: one fact scan; lineitem->orders->customer shuffles on the
    join keys (AQE picks broadcast for the part dim which is
    explicitly hinted); the groupBy output is vocab-bounded
    (segments x brands), so the share windows and the 1-row grand
    total crossJoin all run on a tiny rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = dec("l_extendedprice", 2, 12) * (
        F.lit(1).cast("decimal(3,2)") - dec("l_discount", 2, 4)
    )
    cell = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("c_mktsegment").alias("segment"), "p_brand", rev.alias("r"))
        .groupBy("segment", "p_brand")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"), F.sum("r").alias("rev"))
    )
    grand = cell.agg(F.sum("rev").alias("grand_rev"))
    seg_w = Window.partitionBy("segment")
    brand_w = Window.partitionBy("p_brand")
    seg_share = F.col("rev").cast("double") / F.sum("rev").over(seg_w).cast("double")
    overall_share = (
        F.sum("rev").over(brand_w).cast("double") / F.col("grand_rev").cast("double")
    )
    return (
        cell.crossJoin(F.broadcast(grand))
        .select(
            "segment",
            "p_brand",
            "n_lines",
            F.col("rev").cast("double").alias("revenue"),
            seg_share.alias("seg_share"),
            (seg_share / overall_share).alias("segment_lift"),
        )
        .orderBy("segment", "p_brand")
    )


# --- boilerplate-header prefix clusters --------------------------------------

PREFIX_CHARS = 64  # header window: shared openings beyond this are templates


@register(
    "dedup_prefix_clusters",
    oracle=f"""
    WITH pref AS (
        SELECT source, {shingle_int_sql(f"substr(text, 1, {PREFIX_CHARS})")} AS pk
        FROM documents
    ),
    cl AS (
        SELECT pk, COUNT(*) AS sz, COUNT(DISTINCT source) AS n_src
        FROM pref GROUP BY pk
    )
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_src > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cross_source
    FROM cl
    WHERE sz >= 2
    GROUP BY sz
    ORDER BY cluster_size
    """,
    description="documents sharing their first 64 chars: template/boilerplate-header cluster histogram with cross-source counts",
)
def dedup_prefix_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template-opening detector: documents that share their first
    ``PREFIX_CHARS`` characters verbatim (license headers, scraped
    nav/banner text, syndication intros) — redundancy the whole-doc
    and shingle dedups under-report because the bodies diverge.
    Output is the cluster-size histogram with how many clusters span
    multiple sources (cross-source prefix reuse = a template, not a
    re-crawl). Companion to cur_boilerplate_lines (line grain) and
    dedup_repeated_spans (span grain); this is the cheapest of the
    three — one narrow-key groupBy.

    Exactness: the prefix is keyed by the md5-bridge 60-bit integer
    (functions/text.py shingle_int) both engines compute identically;
    everything downstream is integer counters.

    Scale: the shuffle key is an 8-byte int, the map side projects two
    pushed columns, and the histogram is |distinct sizes| rows. A hot
    prefix (the empty-ish doc) skews one reducer at worst — AQE
    skew-split handles it; no joins anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    pref = docs.select(
        "source",
        shingle_int(F.substring("text", 1, PREFIX_CHARS)).alias("pk"),
    )
    cl = pref.groupBy("pk").agg(
        F.count(F.lit(1)).alias("sz"),
        F.countDistinct("source").alias("n_src"),
    )
    return (
        cl.where(F.col("sz") >= 2)
        .groupBy(F.col("sz").cast("bigint").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("sz").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("n_src") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_cross_source"),
        )
        .orderBy("cluster_size")
    )


# --- within-order price dispersion by order size -----------------------------


@register(
    "q_intra_order_dispersion",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS s1,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(20,4)) AS s2
        FROM lineitem GROUP BY l_orderkey
    ),
    scored AS (
        SELECT n, s1,
               FLOOR(CAST(n AS DECIMAL(2,0)) * s2 - s1 * s1) AS d
        FROM per_order
    )
    SELECT CAST(n AS BIGINT) AS n_lines,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(s1) AS DOUBLE) / CAST(COUNT(*) * n AS DOUBLE) AS mean_line_price,
           CAST(SUM(d) AS DOUBLE) / CAST(COUNT(*) * n * n AS DOUBLE) AS mean_within_var,
           sqrt(CAST(SUM(d) AS DOUBLE) / CAST(COUNT(*) * n * n AS DOUBLE))
             / (CAST(SUM(s1) AS DOUBLE) / CAST(COUNT(*) * n AS DOUBLE)) AS within_cv
    FROM scored
    GROUP BY n
    ORDER BY n_lines
    """,
    description="within-order price dispersion pooled by order size: is a 7-line basket 7 similar items or a mixed bag (exact n*s2-s1^2 decimals, divisions only at the bucket)",
)
def q_intra_order_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How heterogeneous is a basket internally? For each order-size
    bucket (the line count IS the bucket key), the pooled within-order
    price variance and its CV — separates "7 lines of similar-priced
    items" from "7 lines spanning 100x" which drive very different
    picking/packing and recommendation behavior. Companion to
    q_basket_breadth (distinct-part grain) and
    q_order_size_distribution (count grain); this is the only
    dispersion view.

    Exactness: per order, n*s2 - s1^2 (n = lines, s1/s2 = exact
    decimal sum / sum of squares) is a nonnegative exact decimal —
    zero for single-line orders by construction — FLOORed to a whole
    dollar^2 (deterministic truncation on both engines; sub-dollar^2
    resolution is noise on ~1e9-scale variances) so the bucket sum
    stays an integer < 2^53 at 100x the test scale and the
    decimal->double cast is exact on both engines. Because line count
    n is constant within a bucket, the pooled variance is ONE float
    division of that exact sum by an exact integer, and the CV is
    sqrt-then-divide in the same shape on both engines.

    Scale: one lineitem scan, groupBy(l_orderkey) shuffles narrow
    decimal partials, then a |distinct order sizes| rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    p = dec("l_extendedprice", 2, 12)
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(p).cast("decimal(18,2)").alias("s1"),
        F.sum(p * p).cast("decimal(20,4)").alias("s2"),
    )
    scored = per_order.select(
        "n",
        "s1",
        F.floor(
            F.col("n").cast("decimal(2,0)") * F.col("s2")
            - F.col("s1") * F.col("s1")
        ).alias("d"),
    )
    mean_price = F.sum("s1").cast("double") / (
        F.count(F.lit(1)) * F.col("n")
    ).cast("double")
    mean_var = F.sum("d").cast("double") / (
        F.count(F.lit(1)) * F.col("n") * F.col("n")
    ).cast("double")
    return (
        scored.groupBy(F.col("n"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("s1").alias("__s1"),
            F.sum("d").alias("__d"),
        )
        .select(
            F.col("n").cast("bigint").alias("n_lines"),
            "n_orders",
            (
                F.col("__s1").cast("double")
                / (F.col("n_orders") * F.col("n")).cast("double")
            ).alias("mean_line_price"),
            (
                F.col("__d").cast("double")
                / (F.col("n_orders") * F.col("n") * F.col("n")).cast("double")
            ).alias("mean_within_var"),
            (
                F.sqrt(
                    F.col("__d").cast("double")
                    / (F.col("n_orders") * F.col("n") * F.col("n")).cast("double")
                )
                / (
                    F.col("__s1").cast("double")
                    / (F.col("n_orders") * F.col("n")).cast("double")
                )
            ).alias("within_cv"),
        )
        .orderBy("n_lines")
    )


# --- stated wealth vs realized spend (balance deciles) -----------------------


@register(
    "q_acctbal_spend_deciles",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS sp,
               COUNT(*) AS n_ord
        FROM orders GROUP BY o_custkey
    ),
    cust AS (
        SELECT c.c_custkey,
               CAST(c.c_acctbal AS DECIMAL(12,2)) AS bal,
               COALESCE(s.sp, CAST(0 AS DECIMAL(12,2))) AS sp,
               CASE WHEN s.o_custkey IS NULL THEN 1 ELSE 0 END AS inactive,
               NTILE(10) OVER (ORDER BY c.c_acctbal DESC, c.c_custkey)
                   AS bal_decile
        FROM customer c LEFT JOIN spend s ON s.o_custkey = c.c_custkey
    )
    SELECT bal_decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(bal) AS DOUBLE) / COUNT(*) AS avg_acctbal,
           CAST(SUM(sp) AS DOUBLE) AS total_spend,
           CAST(SUM(sp) AS DOUBLE) / COUNT(*) AS spend_per_customer,
           CAST(SUM(inactive) AS BIGINT) AS n_inactive,
           CAST(SUM(inactive) AS DOUBLE) / COUNT(*) AS inactive_rate
    FROM cust
    GROUP BY bal_decile
    ORDER BY bal_decile
    """,
    description="account-balance deciles vs realized order spend: does stated wealth predict purchasing (credit-targeting sanity table)",
)
def q_acctbal_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the balance on file predict what customers actually buy?
    Customers deciled by account balance (richest first), each decile
    scored with realized order spend and the share who never ordered —
    the table that decides whether acctbal is worth a credit-model
    feature or is stale CRM noise. Companion to q_revenue_deciles
    (which deciles by REALIZED spend); crossing the two is the
    decile-transition story.

    Exactness: balances are 2-decimal-exact; spend sums are decimal;
    each output is one float division of exact aggregates. Decile
    assignment is ANSI NTILE with a full tiebreak (bal DESC, custkey),
    bit-reproducible on both engines.

    Scale: per-customer spend reduces orders before the dim join; the
    decile runs through the sharded-rank decomposition
    (functions/ranks.py) — quantile presplit + per-shard sort +
    broadcast offset rosters — so no single-task global sort; the
    final rollup is 10 rows."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice", 2, 12)).alias("sp")
    )
    base = (
        cust.join(spend, cust.c_custkey == spend.o_custkey, "left")
        .select(
            "c_custkey",
            "c_acctbal",
            dec("c_acctbal", 2, 12).alias("bal"),
            F.coalesce(F.col("sp"), F.lit(0).cast("decimal(12,2)")).alias("sp"),
            F.when(F.col("o_custkey").isNull(), 1).otherwise(0).alias("inactive"),
        )
    )
    deciled = with_global_ntile(
        base,
        -F.col("c_acctbal"),
        [F.desc("c_acctbal"), F.col("c_custkey")],
        k=10,
        out="bal_decile",
    )
    return (
        deciled.groupBy("bal_decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            (F.sum("bal").cast("double") / F.count(F.lit(1))).alias("avg_acctbal"),
            F.sum("sp").cast("double").alias("total_spend"),
            (F.sum("sp").cast("double") / F.count(F.lit(1))).alias(
                "spend_per_customer"
            ),
            F.sum("inactive").cast("bigint").alias("n_inactive"),
            (F.sum("inactive").cast("double") / F.count(F.lit(1))).alias(
                "inactive_rate"
            ),
        )
        .orderBy("bal_decile")
    )


# --- realized price index by selling nation ----------------------------------


@register(
    "q_nation_price_index",
    oracle="""
    WITH pm AS (
        SELECT l_partkey,
               CAST(FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                          / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                          * 1000000.0) AS BIGINT) AS um_e6
        FROM lineitem GROUP BY l_partkey
    ),
    sel AS (
        SELECT n.n_name,
               CAST(l.l_extendedprice AS DECIMAL(12,2)) AS ext,
               CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 1000000 AS BIGINT)
                   AS ext_e6,
               CAST(l.l_quantity AS BIGINT) * pm.um_e6 AS exp_e6
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN pm ON pm.l_partkey = l.l_partkey
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(ext) AS DOUBLE) AS revenue,
           CAST(CAST(SUM(ext_e6) AS BIGINT) AS DOUBLE)
             / CAST(CAST(SUM(exp_e6) AS BIGINT) AS DOUBLE) AS price_index,
           CAST(SUM(CASE WHEN ext_e6 > exp_e6 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_premium_lines,
           CAST(SUM(CASE WHEN ext_e6 > exp_e6 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS premium_share
    FROM sel
    GROUP BY n_name
    ORDER BY n_name
    """,
    description="Paasche-style realized unit-price index per selling nation vs each part's corpus-mean unit price (who sells above book)",
)
def q_nation_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do some nations systematically realize higher unit prices for
    the SAME parts? Each part's corpus-mean unit price anchors an
    expected value for every line (qty x mean); a nation's price_index
    is actual/expected revenue — >1 means its suppliers sell above the
    part-average price (pricing power, or a data problem worth a look
    when it drifts). premium_share counts lines above expectation —
    integer-decided per line.

    Exactness: the per-part mean unit price is quantized to an
    integer at 1e-6 resolution (floor of one double division of exact
    aggregates — identical expression both engines) BEFORE any
    cross-row use, so expected revenue is an exact int64 sum and the
    index is one division of two exact int64 totals. Int budget: line
    ext*1e6 <= ~1e13, nation sums < 2^63 with 1e5x headroom.

    Scale: per-part anchor table is dim-sized (broadcast at test
    scale, shuffle join at 100 TB); everything else is one fact scan
    and a |nations| rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    pm = li.groupBy("l_partkey").agg(
        F.floor(
            F.sum(dec("l_extendedprice", 2, 12)).cast("double")
            / F.sum(F.col("l_quantity").cast("bigint")).cast("double")
            * F.lit(1000000.0)
        ).alias("um_e6")
    )
    sel = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(pm, "l_partkey")
        .select(
            "n_name",
            dec("l_extendedprice", 2, 12).alias("ext"),
            (dec("l_extendedprice", 2, 12) * 1000000).cast("bigint").alias("ext_e6"),
            (F.col("l_quantity").cast("bigint") * F.col("um_e6")).alias("exp_e6"),
        )
    )
    prem = F.when(F.col("ext_e6") > F.col("exp_e6"), 1).otherwise(0)
    return (
        sel.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("ext").cast("double").alias("revenue"),
            (
                F.sum("ext_e6").cast("double") / F.sum("exp_e6").cast("double")
            ).alias("price_index"),
            F.sum(prem).cast("bigint").alias("n_premium_lines"),
            (F.sum(prem).cast("double") / F.count(F.lit(1))).alias("premium_share"),
        )
        .orderBy("n_name")
    )


# --- supply-base concentration per part --------------------------------------


@register(
    "q_dual_sourcing_balance",
    oracle="""
    WITH cell AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    per_part AS (
        SELECT l_partkey, COUNT(*) AS ns,
               CAST(SUM(rev) AS DECIMAL(18,2)) AS tot,
               CAST(MAX(rev) AS DECIMAL(18,2)) AS mx
        FROM cell GROUP BY l_partkey
    )
    SELECT CAST(ns AS BIGINT) AS n_suppliers,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CASE WHEN 2 * mx > tot THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lead_over_half,
           CAST(SUM(CASE WHEN 4 * mx > tot THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lead_over_quarter,
           CAST(SUM(mx) AS DOUBLE) / CAST(SUM(tot) AS DOUBLE) AS pooled_lead_share
    FROM per_part
    GROUP BY ns
    ORDER BY n_suppliers
    """,
    description="supply-base concentration: per supplier-count bucket, how many parts have a dominant lead supplier (2*max>tot exact decimal test) and the pooled lead share",
)
def q_dual_sourcing_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-point-of-failure screen for the supply base: for parts
    grouped by how many suppliers ship them, how often does the lead
    supplier carry >50% / >25% of the part's revenue — a part with 20
    nominal suppliers but one dominant source is still fragile, and
    that's invisible in coverage counts (q_supplier_part_coverage).

    Exactness: dominance is the integer-style cross-multiply
    2*max > tot on exact decimal revenue sums — no division decides
    anything; the pooled lead share is one float division of exact
    decimal totals per bucket.

    Scale: one fact scan, groupBy(part, supplier) with map-side
    partials, then a part-grain reduce and a |supplier-count buckets|
    rollup — no joins, no windows."""
    li = load_table(spark, sf_dir, "lineitem")
    cell = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_extendedprice", 2, 12)).alias("rev")
    )
    per_part = cell.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("ns"),
        F.sum("rev").cast("decimal(18,2)").alias("tot"),
        F.max("rev").cast("decimal(18,2)").alias("mx"),
    )
    half = F.when(F.lit(2) * F.col("mx") > F.col("tot"), 1).otherwise(0)
    quarter = F.when(F.lit(4) * F.col("mx") > F.col("tot"), 1).otherwise(0)
    return (
        per_part.groupBy(F.col("ns").cast("bigint").alias("n_suppliers"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum(half).cast("bigint").alias("n_lead_over_half"),
            F.sum(quarter).cast("bigint").alias("n_lead_over_quarter"),
            (F.sum("mx").cast("double") / F.sum("tot").cast("double")).alias(
                "pooled_lead_share"
            ),
        )
        .orderBy("n_suppliers")
    )


# --- buying episodes (order-grain sessionization) -----------------------------

EPISODE_GAP_DAYS = 30  # orders closer than this chain into one episode


@register(
    "q_purchase_episodes",
    oracle=f"""
    WITH flagged AS (
        SELECT o_custkey, o_orderkey,
               CAST(o_orderdate AS DATE) AS d,
               CAST(o_totalprice AS DECIMAL(12,2)) AS price,
               CASE WHEN LAG(CAST(o_orderdate AS DATE)) OVER w IS NULL
                         OR date_diff('day', LAG(CAST(o_orderdate AS DATE)) OVER w,
                                      CAST(o_orderdate AS DATE)) > {EPISODE_GAP_DAYS}
                    THEN 1 ELSE 0 END AS new_ep
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
    ),
    eps AS (
        SELECT o_custkey, d, price,
               SUM(new_ep) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS ep_seq
        FROM flagged
    ),
    per_ep AS (
        SELECT o_custkey, ep_seq, COUNT(*) AS n_orders,
               SUM(price) AS val,
               date_diff('day', MIN(d), MAX(d)) AS span_days
        FROM eps GROUP BY o_custkey, ep_seq
    )
    SELECT CAST(n_orders AS BIGINT) AS orders_in_episode,
           CAST(COUNT(*) AS BIGINT) AS n_episodes,
           CAST(SUM(val) AS DOUBLE) AS total_value,
           CAST(SUM(val) AS DOUBLE) / COUNT(*) AS mean_value,
           CAST(SUM(span_days) AS DOUBLE) / COUNT(*) AS mean_span_days
    FROM per_ep
    GROUP BY n_orders
    ORDER BY orders_in_episode
    """,
    description="30-day-gap buying episodes (order-grain sessionization): episode size histogram with value and span",
)
def q_purchase_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders chained into buying EPISODES (gaps <= 30 days), the
    purchase-side analog of event sessionization: a customer placing 4
    orders in 3 weeks is one shopping project, not 4 independent
    purchases. The episode-size histogram with mean value and calendar
    span is the re-engagement planning table (how long does a project
    run, what is a second order in the same episode worth).

    Exactness: the lag→flag→cumsum runs entirely inside the customer
    partition with a full (date, orderkey) tiebreak; money stays
    decimal; day spans are exact integers; two divisions per bucket.

    Scale: both windows and the episode rollup share ONE o_custkey
    exchange (same pattern as ev_sessionize); the final histogram is
    |episode sizes| rows."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    w = Window.partitionBy("o_custkey").orderBy(d, F.col("o_orderkey"))
    lag_d = F.lag(d).over(w)
    flagged = orders.select(
        "o_custkey",
        "o_orderkey",
        d.alias("d"),
        dec("o_totalprice", 2, 12).alias("price"),
        F.when(
            lag_d.isNull() | (F.datediff(d, lag_d) > EPISODE_GAP_DAYS), 1
        )
        .otherwise(0)
        .alias("new_ep"),
    )
    cum = (
        Window.partitionBy("o_custkey")
        .orderBy("d", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    eps = flagged.withColumn("ep_seq", F.sum("new_ep").over(cum))
    per_ep = eps.groupBy("o_custkey", "ep_seq").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price").alias("val"),
        F.datediff(F.max("d"), F.min("d")).alias("span_days"),
    )
    return (
        per_ep.groupBy(F.col("n_orders").cast("bigint").alias("orders_in_episode"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_episodes"),
            F.sum("val").cast("double").alias("total_value"),
            (F.sum("val").cast("double") / F.count(F.lit(1))).alias("mean_value"),
            (F.sum("span_days").cast("double") / F.count(F.lit(1))).alias(
                "mean_span_days"
            ),
        )
        .orderBy("orders_in_episode")
    )


# --- 24h follow-up purchase rate by preceding event type ---------------------

FOLLOW_WINDOW_US = 24 * 3600 * 1_000_000


@register(
    "ev_followup_purchase_rate",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS us FROM events
    ),
    pur AS (
        SELECT user_id, epoch_us(ts) AS pus FROM events
        WHERE event_type = 'purchase'
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN EXISTS (
                    SELECT 1 FROM pur p
                    WHERE p.user_id = e.user_id
                      AND p.pus > e.us
                      AND p.pus <= e.us + {FOLLOW_WINDOW_US}
               ) THEN 1 ELSE 0 END) AS BIGINT) AS n_followed,
           CAST(SUM(CASE WHEN EXISTS (
                    SELECT 1 FROM pur p
                    WHERE p.user_id = e.user_id
                      AND p.pus > e.us
                      AND p.pus <= e.us + {FOLLOW_WINDOW_US}
               ) THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS follow_rate
    FROM ev e
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    description="share of each event type followed by a purchase from the same user within 24h (experience->conversion propensity; errors suppressing the rate is the UX-regression signal)",
)
def ev_followup_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion propensity conditioned on the preceding experience:
    for every event, did the SAME user purchase within the next 24
    hours? Comparing follow rates across event types answers "does an
    error event suppress near-term conversion relative to a view or
    click" — the cheap observational cut a UX team reads before
    ev_diff_in_diff-style designs. The purchase row's own rate is the
    24h repeat-purchase propensity.

    Exactness: pure integer microsecond arithmetic (unix_micros /
    epoch_us convention of the events family) with a strict-then-
    inclusive (t, t+24h] window; exists-semantics via LEFT SEMI join
    so multiple qualifying purchases count once; counters only.

    Scale: the probe is an equi-join on user_id with a range
    predicate — per-user purchase lists are small, no broadcast
    needed, and Spark compiles the EXISTS shape to a hash semi join;
    output is |event types| rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("us")
    )
    pur = (
        ev.where(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("us").alias("pus"))
    )
    followed = (
        ev.join(
            pur,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("pus") > F.col("us"))
            & (F.col("pus") <= F.col("us") + F.lit(FOLLOW_WINDOW_US)),
            "left_semi",
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_f"))
    )
    base = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    return (
        base.join(followed, "event_type", "left")
        .select(
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.coalesce(F.col("n_f"), F.lit(0)).cast("bigint").alias("n_followed"),
            (
                F.coalesce(F.col("n_f"), F.lit(0)).cast("double") / F.col("n_events")
            ).alias("follow_rate"),
        )
        .orderBy("event_type")
    )


# --- CUPED variance reduction (experimentation primitive) ---------------------

CUPED_SPLIT_DATE = "2024-01-16"  # pre-period covariate window ends here
_CUPED_OFF_E8 = 10**14  # +1e4 dollars: keeps adj_e8 positive for the div


_CUPED_CTES = f"""
    pu AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '{CUPED_SPLIT_DATE}'
                             THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS x_cents,
               CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '{CUPED_SPLIT_DATE}'
                             THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    scored AS (
        SELECT user_id, x_cents // 100 AS xq, y, y // 100 AS yq,
               CASE WHEN {_bucket_sql("user_id", 2)} = 0
                    THEN 'control' ELSE 'treatment' END AS arm
        FROM pu
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(xq) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(xq * y) AS BIGINT) AS sxy,
               CAST(SUM(xq * xq) AS BIGINT) AS sxx
        FROM scored
    ),
    theta AS (
        SELECT CASE WHEN n * sxx - sx * sx = 0 THEN 0
                    ELSE CAST(FLOOR(1000000.0
                                    * CAST(n * sxy - sx * sy AS DOUBLE)
                                    / CAST(n * sxx - sx * sx AS DOUBLE))
                              AS BIGINT) END AS theta_e6,
               (100 * sx) // n AS xbar_c2
        FROM mom
    ),
    adj AS (
        SELECT s.arm, s.y, s.yq, t.theta_e6,
               s.y * 100000000 - t.theta_e6 * (100 * s.xq - t.xbar_c2) AS adj_e8,
               (s.y * 100000000 - t.theta_e6 * (100 * s.xq - t.xbar_c2)
                + {_CUPED_OFF_E8}) // 10000000000 AS adjq
        FROM scored s CROSS JOIN theta t
    )"""


@register(
    "ev_cuped_adjustment",
    oracle=f"""
    WITH {_CUPED_CTES},
    arms AS (
        SELECT arm,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(MIN(theta_e6) AS BIGINT) AS theta_e6,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(adj_e8) AS BIGINT) AS sadj,
               CAST(COUNT(*) * SUM(yq * yq) - SUM(yq) * SUM(yq) AS BIGINT) AS vp_num,
               CAST(COUNT(*) * SUM(adjq * adjq) - SUM(adjq) * SUM(adjq) AS BIGINT)
                   AS va_num
        FROM adj GROUP BY arm
    )
    SELECT arm, n_users, theta_e6,
           CAST(sy AS DOUBLE) / CAST(n_users * 100 AS DOUBLE) AS mean_post,
           CAST(sadj AS DOUBLE) / CAST(n_users * 10000000000 AS DOUBLE)
               AS mean_adjusted,
           CAST(vp_num AS DOUBLE) / CAST(n_users * n_users AS DOUBLE) AS var_post,
           CAST(va_num AS DOUBLE) / CAST(n_users * n_users AS DOUBLE)
               AS var_adjusted,
           CASE WHEN vp_num = 0 THEN 0.0
                ELSE 1.0 - CAST(va_num AS DOUBLE) / CAST(vp_num AS DOUBLE) END
               AS var_reduction
    FROM arms
    ORDER BY arm
    """,
    description="CUPED pre-period adjustment on the md5 A/B arms: integer-quantized theta, per-arm adjusted means and the variance reduction the covariate buys",
)
def ev_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled-experiment using pre-experiment data): adjust
    each user's post-period value by theta x (pre-period covariate -
    mean) and report, per deterministic md5 arm, the adjusted mean and
    the variance reduction — the sensitivity multiplier every mature
    experimentation platform applies before reading a treatment
    effect. On A/A arms (no treatment here) the adjusted means must
    agree and the reduction must be positive when pre predicts post
    (pytest-gated).

    Exactness: the only cross-row float is banned — theta is FLOORed
    to 1e-6 resolution from exact int64 moments (int64->double casts
    are correctly rounded identically on both engines, unlike wide
    decimals), the covariate mean is an integer floor division, every
    per-user adjustment is pure int64 (y*1e8 - theta_e6*delta_c2,
    offset +1e14 keeps the dollar-grain quantization div positive so
    Spark's truncating `div` and DuckDB's flooring `//` agree), and
    each output is one division of exact integers. Int budget at 100x
    test scale: theta moments ~4.5e18, variance moments ~2.3e18 —
    inside int64 (documented ceiling: ~sf1).

    Scale: one fact scan to user grain, a 1-row broadcast theta, a
    2-row arm rollup. The covariate needs no assignment table — the
    user id IS the arm, as in ev_ab_assignment_aa."""
    adj = _cuped_adj_frame(spark, sf_dir)
    arms = adj.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.min("theta_e6").cast("bigint").alias("theta_e6"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("adj_e8").cast("bigint").alias("sadj"),
        (
            F.count(F.lit(1)) * F.sum(F.col("yq") * F.col("yq"))
            - F.sum("yq") * F.sum("yq")
        )
        .cast("bigint")
        .alias("vp_num"),
        (
            F.count(F.lit(1)) * F.sum(F.col("adjq") * F.col("adjq"))
            - F.sum("adjq") * F.sum("adjq")
        )
        .cast("bigint")
        .alias("va_num"),
    )
    return arms.select(
        "arm",
        "n_users",
        "theta_e6",
        (F.col("sy").cast("double") / (F.col("n_users") * 100).cast("double")).alias(
            "mean_post"
        ),
        (
            F.col("sadj").cast("double")
            / (F.col("n_users") * F.lit(10000000000)).cast("double")
        ).alias("mean_adjusted"),
        (
            F.col("vp_num").cast("double")
            / (F.col("n_users") * F.col("n_users")).cast("double")
        ).alias("var_post"),
        (
            F.col("va_num").cast("double")
            / (F.col("n_users") * F.col("n_users")).cast("double")
        ).alias("var_adjusted"),
        F.when(F.col("vp_num") == 0, F.lit(0.0))
        .otherwise(
            F.lit(1.0) - F.col("va_num").cast("double") / F.col("vp_num").cast("double")
        )
        .alias("var_reduction"),
    ).orderBy("arm")


def _cuped_adj_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(arm, y, yq, theta_e6, adj_e8, adjq) per user — the shared
    integer-exact CUPED adjustment pipeline (see ev_cuped_adjustment
    for the quantization contract); twin of the _CUPED_CTES SQL."""
    ev = load_table(spark, sf_dir, "events")
    cents = (dec("value", 2, 12) * 100).cast("bigint")
    pre = F.to_date("ts") < F.lit(CUPED_SPLIT_DATE).cast("date")
    pu = ev.groupBy("user_id").agg(
        F.sum(F.when(pre, cents).otherwise(F.lit(0))).cast("bigint").alias("x_cents"),
        F.sum(F.when(~pre, cents).otherwise(F.lit(0))).cast("bigint").alias("y"),
    )
    scored = pu.select(
        "user_id",
        F.expr("x_cents div 100").alias("xq"),
        "y",
        F.expr("y div 100").alias("yq"),
        F.when(hash_bucket(F.col("user_id"), 2) == 0, "control")
        .otherwise("treatment")
        .alias("arm"),
    )
    mom = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("xq") * F.col("y")).alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    theta = mom.select(
        F.when(den == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.floor(
                F.lit(1000000.0)
                * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                    "double"
                )
                / den.cast("double")
            )
        )
        .alias("theta_e6"),
        F.expr("(100 * sx) div n").alias("xbar_c2"),
    )
    adj_e8 = F.col("y") * F.lit(100000000) - F.col("theta_e6") * (
        F.lit(100) * F.col("xq") - F.col("xbar_c2")
    )
    return scored.crossJoin(F.broadcast(theta)).select(
        "arm",
        "y",
        "yq",
        "theta_e6",
        adj_e8.alias("adj_e8"),
        F.expr(
            f"(y * 100000000 - theta_e6 * (100 * xq - xbar_c2)"
            f" + {_CUPED_OFF_E8}) div 10000000000"
        ).alias("adjq"),
    )


# --- minimal detectable effect from the CUPED moments -------------------------

_Z_POWER_SUM = 2.801585  # z_{0.975} + z_{0.80}: 5% two-sided, 80% power


@register(
    "ev_experiment_power",
    oracle=f"""
    WITH {_CUPED_CTES},
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_c,
               CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_t,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(adj_e8) AS BIGINT) AS sadj,
               CAST(COUNT(*) * SUM(yq * yq) - SUM(yq) * SUM(yq) AS BIGINT)
                   AS vp_num,
               CAST(COUNT(*) * SUM(adjq * adjq) - SUM(adjq) * SUM(adjq) AS BIGINT)
                   AS va_num
        FROM adj
    )
    SELECT 'cuped_adjusted' AS metric, n_c AS n_control, n_t AS n_treatment,
           CAST(sadj AS DOUBLE) / CAST(n * 10000000000 AS DOUBLE) AS mean_value,
           CAST(va_num AS DOUBLE) / CAST(n * n AS DOUBLE) AS variance,
           {_Z_POWER_SUM} * sqrt(CAST(va_num AS DOUBLE) / CAST(n * n AS DOUBLE)
                                 * (1.0 / n_c + 1.0 / n_t)) AS mde_abs,
           {_Z_POWER_SUM} * sqrt(CAST(va_num AS DOUBLE) / CAST(n * n AS DOUBLE)
                                 * (1.0 / n_c + 1.0 / n_t))
             / (CAST(sadj AS DOUBLE) / CAST(n * 10000000000 AS DOUBLE)) AS mde_rel
    FROM agg
    UNION ALL
    SELECT 'post' AS metric, n_c, n_t,
           CAST(sy AS DOUBLE) / CAST(n * 100 AS DOUBLE) AS mean_value,
           CAST(vp_num AS DOUBLE) / CAST(n * n AS DOUBLE) AS variance,
           {_Z_POWER_SUM} * sqrt(CAST(vp_num AS DOUBLE) / CAST(n * n AS DOUBLE)
                                 * (1.0 / n_c + 1.0 / n_t)) AS mde_abs,
           {_Z_POWER_SUM} * sqrt(CAST(vp_num AS DOUBLE) / CAST(n * n AS DOUBLE)
                                 * (1.0 / n_c + 1.0 / n_t))
             / (CAST(sy AS DOUBLE) / CAST(n * 100 AS DOUBLE)) AS mde_rel
    FROM agg
    ORDER BY metric
    """,
    description="minimal detectable effect (5% two-sided, 80% power) for the raw vs CUPED-adjusted metric — what the variance reduction buys in sensitivity",
)
def ev_experiment_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The so-what of CUPED in experiment-planning units: the minimal
    detectable effect at the standard 5%/80% operating point for the
    raw post-period metric vs the adjusted one, with current arm
    sizes. The adjusted row's smaller mde_abs IS the sensitivity the
    covariate buys (equivalently: how much less traffic the same
    detection needs). Reads next to ev_cuped_adjustment and
    ev_ab_assignment_aa as the planning third of the experimentation
    family.

    Exactness: same integer-exact CUPED pipeline (_cuped_adj_frame);
    pooled variances at dollar grain from int64 moments; the MDE is a
    fixed-shape sqrt/multiply chain over exact aggregates, written
    identically on both engines (z-sum folded to one literal so there
    is no addition-order question).

    Scale: one fact scan to user grain; everything after is a 1-row
    aggregate fanned to two output rows."""
    adj = _cuped_adj_frame(spark, sf_dir)
    agg = adj.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("arm") == "control", 1).otherwise(0))
        .cast("bigint")
        .alias("n_c"),
        F.sum(F.when(F.col("arm") == "treatment", 1).otherwise(0))
        .cast("bigint")
        .alias("n_t"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("adj_e8").cast("bigint").alias("sadj"),
        (
            F.count(F.lit(1)) * F.sum(F.col("yq") * F.col("yq"))
            - F.sum("yq") * F.sum("yq")
        )
        .cast("bigint")
        .alias("vp_num"),
        (
            F.count(F.lit(1)) * F.sum(F.col("adjq") * F.col("adjq"))
            - F.sum("adjq") * F.sum("adjq")
        )
        .cast("bigint")
        .alias("va_num"),
    )

    def row(metric: str, snum: str, sden: int, vnum: str) -> DataFrame:
        mean = F.col(snum).cast("double") / (F.col("n") * F.lit(sden)).cast("double")
        var = F.col(vnum).cast("double") / (F.col("n") * F.col("n")).cast("double")
        mde = F.lit(_Z_POWER_SUM) * F.sqrt(
            var * (F.lit(1.0) / F.col("n_c") + F.lit(1.0) / F.col("n_t"))
        )
        return agg.select(
            F.lit(metric).alias("metric"),
            F.col("n_c").alias("n_control"),
            F.col("n_t").alias("n_treatment"),
            mean.alias("mean_value"),
            var.alias("variance"),
            mde.alias("mde_abs"),
            (mde / mean).alias("mde_rel"),
        )

    return (
        row("cuped_adjusted", "sadj", 10000000000, "va_num")
        .unionByName(row("post", "sy", 100, "vp_num"))
        .orderBy("metric")
    )


# --- embedding-level train/eval split leakage ---------------------------------

LEAK_TAU = 0.35  # same near-dup threshold as dedup_embedding_cosine
LEAK_TRAIN_BUCKETS = 8  # md5 bucket < 8 of 10 → train (80/20 split)


@register(
    "cur_embedding_leakage",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS norm,
               CASE WHEN {_bucket_sql("vec_id", 10)} < {LEAK_TRAIN_BUCKETS}
                    THEN 1 ELSE 0 END AS is_train
        FROM embeddings
    ),
    bands AS (
        SELECT vec_id, label, band,
               (SELECT SUM(CASE WHEN CAST(embedding AS DOUBLE[])[d + 1] > 0
                                THEN CAST(1 << (d % 4) AS INT) ELSE 0 END)
                FROM generate_series(0, 63) g(d)
                WHERE d // 4 = band) AS bv
        FROM embeddings, generate_series(0, 15) s(band)
    ),
    cand AS (
        SELECT DISTINCT x.vec_id AS train_vec, y.vec_id AS eval_vec, x.label
        FROM bands x
        JOIN bands y ON x.band = y.band AND x.bv = y.bv AND x.label = y.label
        JOIN e et ON et.vec_id = x.vec_id AND et.is_train = 1
        JOIN e ev ON ev.vec_id = y.vec_id AND ev.is_train = 0
    ),
    cross_pairs AS (
        SELECT c.label, c.eval_vec
        FROM cand c
        JOIN e t ON t.vec_id = c.train_vec
        JOIN e v ON v.vec_id = c.eval_vec
        WHERE list_dot_product(t.emb, v.emb) / (t.norm * v.norm) >= {LEAK_TAU}
    ),
    per_label AS (
        SELECT label,
               COUNT(*) AS n_cross_pairs,
               COUNT(DISTINCT eval_vec) AS n_leaky_eval
        FROM cross_pairs GROUP BY label
    ),
    eval_counts AS (
        SELECT label, COUNT(*) AS n_eval FROM e WHERE is_train = 0 GROUP BY label
    )
    SELECT ec.label,
           CAST(ec.n_eval AS BIGINT) AS n_eval,
           CAST(COALESCE(p.n_leaky_eval, 0) AS BIGINT) AS n_leaky_eval,
           CAST(COALESCE(p.n_leaky_eval, 0) AS DOUBLE) / ec.n_eval AS leak_rate,
           CAST(COALESCE(p.n_cross_pairs, 0) AS BIGINT) AS n_cross_pairs
    FROM eval_counts ec LEFT JOIN per_label p ON p.label = ec.label
    ORDER BY ec.label
    """,
    description="embedding-level split leakage: eval vectors with a cosine>=tau near-dup in train, per label; sign-band LSH candidates, cosine verify on candidates only",
)
def cur_embedding_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The contamination channel n-gram decontamination CANNOT see:
    an eval example whose near-identical twin (cosine >= tau in
    embedding space) sits in train leaks the answer even when no
    literal n-gram overlaps (paraphrases, translations, re-encodes).
    Per label: how many eval vectors have at least one train
    neighbor above the dedup threshold, and the raw cross-pair count.
    Labels with zero leaks still report (LEFT join + coalesce — the
    zero-group principle), because 'leak_rate 0' is the publishable
    number. Companion to cur_split_leakage (n-gram channel) and
    cur_decontaminate (benchmark channel).

    Exactness: the split is the md5 bucket (the samplers' shared
    hash); cosine is the same fixed-shape per-pair float chain
    dedup_embedding_cosine hash-matches — no cross-row float
    reductions anywhere; counters only after the threshold.

    Scale: candidate cross-pairs come from the same sign-band LSH
    bucket equi-join as dedup_embedding_cosine (16 bands × 4 sign
    bits on (band, bv, label)) — bucket-bounded, never an all-pairs
    label block; the exact cosine runs on candidates only, and the
    rollup is |labels| rows."""
    from lime_etl_spark.operators.dedup import _emb_dot, sign_band_values

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("norm", F.sqrt(_emb_dot(F.col("embedding"), F.col("embedding"))))
        .withColumn(
            "is_train",
            F.when(hash_bucket(F.col("vec_id"), 10) < LEAK_TRAIN_BUCKETS, 1).otherwise(
                0
            ),
        )
    )
    bands = emb.select(
        "vec_id",
        "label",
        "is_train",
        F.posexplode(sign_band_values(F.col("embedding"))).alias("band", "bv"),
    )
    x = bands.where(F.col("is_train") == 1).alias("x")
    y = bands.where(F.col("is_train") == 0).alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x.label") == F.col("y.label")),
        )
        .select(
            F.col("x.vec_id").alias("train_vec"),
            F.col("y.vec_id").alias("eval_vec"),
            F.col("x.label").alias("label"),
        )
        .distinct()
    )
    t = emb.select(
        F.col("vec_id").alias("train_vec"),
        F.col("embedding").alias("emb_t"),
        F.col("norm").alias("norm_t"),
    )
    v = emb.select(
        F.col("vec_id").alias("eval_vec"),
        F.col("embedding").alias("emb_v"),
        F.col("norm").alias("norm_v"),
    )
    cos = _emb_dot(F.col("emb_t"), F.col("emb_v")) / (F.col("norm_t") * F.col("norm_v"))
    cross_pairs = (
        cand.join(t, "train_vec")
        .join(v, "eval_vec")
        .where(cos >= LEAK_TAU)
        .select("label", "eval_vec")
    )
    per_label = cross_pairs.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_cross_pairs"),
        F.countDistinct("eval_vec").alias("n_leaky_eval"),
    )
    eval_counts = (
        emb.where(F.col("is_train") == 0)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_eval"))
    )
    return (
        eval_counts.join(per_label, "label", "left")
        .select(
            "label",
            F.col("n_eval").cast("bigint").alias("n_eval"),
            F.coalesce("n_leaky_eval", F.lit(0)).cast("bigint").alias("n_leaky_eval"),
            (
                F.coalesce("n_leaky_eval", F.lit(0)).cast("double") / F.col("n_eval")
            ).alias("leak_rate"),
            F.coalesce("n_cross_pairs", F.lit(0)).cast("bigint").alias("n_cross_pairs"),
        )
        .orderBy("label")
    )


# --- dedup survivor mix shift -------------------------------------------------


def _survivor_oracle() -> str:
    from lime_etl_spark.operators.dedup import _minhash_sql

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
        SELECT vid AS doc_id, MIN(lab) AS component_id
        FROM reach GROUP BY vid
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
               CAST(SUM(CASE WHEN c.component_id = d.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept
        FROM documents d JOIN comp c USING (doc_id)
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_before,
           CAST(SUM(CASE WHEN c.component_id = d.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_after,
           CAST(COUNT(*) AS DOUBLE) / t.n_all AS share_before,
           CAST(SUM(CASE WHEN c.component_id = d.doc_id THEN 1 ELSE 0 END)
                AS DOUBLE) / t.n_kept AS share_after,
           CAST(SUM(CASE WHEN c.component_id = d.doc_id THEN 1 ELSE 0 END)
                AS DOUBLE) / t.n_kept
             - CAST(COUNT(*) AS DOUBLE) / t.n_all AS share_delta
    FROM documents d JOIN comp c USING (doc_id) CROSS JOIN tot t
    GROUP BY d.lang, t.n_all, t.n_kept
    ORDER BY d.lang
    """


@register(
    "dedup_survivor_mix_shift",
    oracle=_survivor_oracle(),
    description="does near-dup dedup BIAS the corpus: language mix before vs after keeping one doc (min id) per LSH component",
)
def dedup_survivor_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup-bias audit: near-dup removal is not mix-neutral — if
    one language syndicates/templates more than another, collapsing
    clusters to their min-id keeper SHIFTS the language mix, and a
    model trained on the survivors inherits that shift silently. Per
    language: share of the corpus before vs after the standard
    keep-min-per-component dedup (dedup_components semantics), and
    the delta a curation team must re-weight away (samp_reweight_plan
    is the actuator; this is its sensor).

    Exactness: keeper choice is the deterministic min-id component
    label; every share is one float division of exact counters, and
    the delta subtracts the two identically-shaped divisions.

    Scale: the component labeling is the same LSH + active-subgraph
    CC machinery as dedup_components (its 100 TB posture applies
    verbatim); the mix rollup is |langs| rows with a 1-row broadcast
    of the corpus totals."""
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
    labeled = docs.select("doc_id", "lang").join(
        cc.select(F.col("vid").alias("doc_id"), "label"), "doc_id"
    )
    kept = F.when(F.col("label") == F.col("doc_id"), 1).otherwise(0)
    tot = labeled.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum(kept).cast("bigint").alias("n_kept"),
    )
    return (
        labeled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_before"),
            F.sum(kept).cast("bigint").alias("n_after"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_before",
            "n_after",
            (F.col("n_before").cast("double") / F.col("n_all")).alias("share_before"),
            (F.col("n_after").cast("double") / F.col("n_kept")).alias("share_after"),
            (
                F.col("n_after").cast("double") / F.col("n_kept")
                - F.col("n_before").cast("double") / F.col("n_all")
            ).alias("share_delta"),
        )
        .orderBy("lang")
    )


# --- nation trade balance -----------------------------------------------------

_TB_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


@register(
    "q_nation_trade_balance",
    oracle=f"""
    WITH flows AS (
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               SUM({_TB_REV_SQL}) AS rev
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        WHERE s.s_nationkey != c.c_nationkey
        GROUP BY 1, 2
    ),
    exp AS (SELECT supp_nation AS n_name, SUM(rev) AS exports FROM flows GROUP BY 1),
    imp AS (SELECT cust_nation AS n_name, SUM(rev) AS imports FROM flows GROUP BY 1)
    SELECT n.n_name,
           CAST(COALESCE(e.exports, 0) AS DOUBLE) AS exports,
           CAST(COALESCE(i.imports, 0) AS DOUBLE) AS imports,
           CAST(COALESCE(e.exports, 0) - COALESCE(i.imports, 0) AS DOUBLE)
               AS balance
    FROM nation n
    LEFT JOIN exp e ON e.n_name = n.n_name
    LEFT JOIN imp i ON i.n_name = n.n_name
    ORDER BY n.n_name
    """,
    description="cross-nation trade balance: each nation's export vs import revenue (supplier-nation != customer-nation flows) and the net",
)
def q_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every nation's CROSS-BORDER position in one row: revenue its
    suppliers ship to foreign customers (exports) vs what its
    customers buy from foreign suppliers (imports), and the net — the
    one-glance table behind q7_nation_trade's pair matrix. Nations
    with no cross-border flow still report zeros (LEFT join from the
    dim — the zero-group principle).

    Exactness: decimals end to end; the balance subtracts two exact
    decimal sums BEFORE the single double cast.

    Scale: one fact scan through broadcast dims; the flow matrix is
    |nations|^2-bounded, so both rollups and the dim joins are tiny."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = dec("l_extendedprice", 2, 12) * (
        F.lit(1).cast("decimal(3,2)") - dec("l_discount", 2, 4)
    )
    sn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
        )
    )
    cn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")
        )
    )
    flows = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .join(sn, F.col("s_nationkey") == F.col("sk"))
        .join(cn, F.col("c_nationkey") == F.col("ck"))
        .groupBy("supp_nation", "cust_nation")
        .agg(F.sum(rev).alias("rev"))
    )
    exp = flows.groupBy(F.col("supp_nation").alias("n_name")).agg(
        F.sum("rev").alias("exports")
    )
    imp = flows.groupBy(F.col("cust_nation").alias("n_name")).agg(
        F.sum("rev").alias("imports")
    )
    zero = F.lit(0).cast("decimal(38,4)")
    # no broadcast hint on the dim here: it is the LEFT (row-preserving)
    # side of the outer joins, which Spark cannot build broadcast-side;
    # the exp/imp rollups are |nations| rows and broadcast on their own
    return (
        nation.select("n_name")
        .join(exp, "n_name", "left")
        .join(imp, "n_name", "left")
        .select(
            "n_name",
            F.coalesce("exports", zero).cast("double").alias("exports"),
            F.coalesce("imports", zero).cast("double").alias("imports"),
            (F.coalesce("exports", zero) - F.coalesce("imports", zero))
            .cast("double")
            .alias("balance"),
        )
        .orderBy("n_name")
    )


# --- monthly revenue decomposition (trend + seasonal + residual) --------------

_DECOMP_K = 10**15  # offset multiple-of-n trick: portable floor division


@register(
    "q_revenue_decomposition",
    oracle=f"""
    WITH m AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month_key,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) * 12
                 + CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS am,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2
    ),
    base AS (SELECT MIN(am) AS am0 FROM m),
    mm AS (
        SELECT month_key, m.am - b.am0 AS x, cents, cents // 100 AS yd,
               CAST(substr(month_key, 6, 2) AS BIGINT) AS moy
        FROM m CROSS JOIN base b
    ),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yd) AS BIGINT) AS sy,
               CAST(SUM(x * yd) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM mm
    ),
    fit AS (
        SELECT CASE WHEN n * sxx - sx * sx = 0 THEN 0
                    ELSE CAST(FLOOR(1000000.0
                                    * CAST(n * sxy - sx * sy AS DOUBLE)
                                    / CAST(n * sxx - sx * sx AS DOUBLE))
                              AS BIGINT) END AS slope_e6,
               n, sx, sy
        FROM mom
    ),
    fit2 AS (
        SELECT slope_e6,
               (1000000 * sy - slope_e6 * sx + n * {_DECOMP_K}) // n
                 - {_DECOMP_K} AS icpt_e6
        FROM fit
    ),
    res AS (
        SELECT mm.month_key, mm.x, mm.moy, mm.cents, f.slope_e6, f.icpt_e6,
               f.icpt_e6 + f.slope_e6 * mm.x AS trend_e6,
               1000000 * mm.yd - (f.icpt_e6 + f.slope_e6 * mm.x) AS res_e6
        FROM mm CROSS JOIN fit2 f
    ),
    seas AS (
        SELECT moy,
               (CAST(SUM(res_e6) AS BIGINT) + COUNT(*) * {_DECOMP_K}) // COUNT(*)
                 - {_DECOMP_K} AS seas_e6
        FROM res GROUP BY moy
    )
    SELECT r.month_key,
           CAST(r.cents AS DOUBLE) / 100.0 AS revenue,
           CAST(r.trend_e6 AS DOUBLE) / 1000000.0 AS trend,
           CAST(s.seas_e6 AS DOUBLE) / 1000000.0 AS seasonal,
           CAST(r.res_e6 - s.seas_e6 AS DOUBLE) / 1000000.0 AS residual
    FROM res r JOIN seas s ON s.moy = r.moy
    ORDER BY r.month_key
    """,
    description="classic monthly revenue decomposition: OLS trend + additive month-of-year seasonal + residual, all integer-quantized (1e-6 dollars)",
)
def q_revenue_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classical time-series decomposition every revenue review
    opens with: monthly order revenue split into an OLS trend, an
    additive month-of-year seasonal factor (mean detrended residual
    per calendar month), and what's left — the residual column is
    where anomalies live once growth and seasonality are explained
    away (ev_anomaly_zscore's z-scores without either correction are
    noisier; q_seasonal_index is the multiplicative cousin without
    the trend).

    Exactness: slope is FLOORed to 1e-6 dollars/month from exact
    int64 moments; intercept and the per-calendar-month seasonal
    means use the portable floor-division trick (add a multiple of
    the divisor, integer-div, subtract it back) so Spark's truncating
    `div` and DuckDB's flooring `//` agree on NEGATIVE residual sums;
    every output is one division of an exact integer. Int budget at
    100x test scale: 1e6*sy ~ 6e16, offsets ~1e17 — inside int64.

    Scale: one orders scan to an 80-row month rollup; the fit is a
    1-row broadcast, the seasonal table 12 rows."""
    orders = load_table(spark, sf_dir, "orders")
    cents = (dec("o_totalprice", 2, 12) * 100).cast("bigint")
    m = orders.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month_key"
        ),
        (
            F.year("o_orderdate").cast("bigint") * 12
            + F.month("o_orderdate").cast("bigint")
        ).alias("am"),
    ).agg(F.sum(cents).cast("bigint").alias("cents"))
    base = m.agg(F.min("am").alias("am0"))
    mm = m.crossJoin(F.broadcast(base)).select(
        "month_key",
        (F.col("am") - F.col("am0")).alias("x"),
        "cents",
        F.expr("cents div 100").alias("yd"),
        F.substring("month_key", 6, 2).cast("bigint").alias("moy"),
    )
    mom = mm.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yd").alias("sy"),
        F.sum(F.col("x") * F.col("yd")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    fit = mom.select(
        F.when(den == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.floor(
                F.lit(1000000.0)
                * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                    "double"
                )
                / den.cast("double")
            )
        )
        .alias("slope_e6"),
        "n",
        "sx",
        "sy",
    ).select(
        "slope_e6",
        F.expr(
            f"(1000000 * sy - slope_e6 * sx + n * {_DECOMP_K}) div n"
            f" - {_DECOMP_K}"
        ).alias("icpt_e6"),
    )
    res = mm.crossJoin(F.broadcast(fit)).select(
        "month_key",
        "moy",
        "cents",
        (F.col("icpt_e6") + F.col("slope_e6") * F.col("x")).alias("trend_e6"),
        (
            F.lit(1000000) * F.col("yd")
            - (F.col("icpt_e6") + F.col("slope_e6") * F.col("x"))
        ).alias("res_e6"),
    )
    seas = res.groupBy("moy").agg(
        F.expr(
            f"(sum(res_e6) + count(1) * {_DECOMP_K}) div count(1) - {_DECOMP_K}"
        ).alias("seas_e6")
    )
    return (
        res.join(F.broadcast(seas), "moy")
        .select(
            "month_key",
            (F.col("cents").cast("double") / F.lit(100.0)).alias("revenue"),
            (F.col("trend_e6").cast("double") / F.lit(1000000.0)).alias("trend"),
            (F.col("seas_e6").cast("double") / F.lit(1000000.0)).alias("seasonal"),
            (
                (F.col("res_e6") - F.col("seas_e6")).cast("double")
                / F.lit(1000000.0)
            ).alias("residual"),
        )
        .orderBy("month_key")
    )


# --- per-partition content checksums ------------------------------------------

_PP_MOD = 2305843009213693951  # Mersenne 2^61-1 (etl.table_checksum field)


@register(
    "dq_partition_parity",
    oracle=f"""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month_key,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM({shingle_int_sql(
               "md5(CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus"
               " || '|' || o_orderpriority)"
           )}) % {_PP_MOD} AS BIGINT) AS row_checksum
    FROM orders
    GROUP BY 1
    ORDER BY month_key
    """,
    description="per-month-partition order checksums (mod 2^61-1): the drilldown that names WHICH partition diverged after a migration or backfill",
)
def dq_partition_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dq_checksum_parity tells you A table diverged; this says WHERE:
    the same order-insensitive mod-2^61-1 content checksum, cut by
    month partition, so a failed backfill or a half-applied CDC batch
    is localized to the partitions to re-copy instead of a full-table
    reload. The month-grain subtotals mod-sum into dq_checksum_parity's
    table total by construction (pytest-pinned), which is exactly the
    incremental-verification property the checksum was designed for.

    Scale: one scan, map-side (count, sum) partials per month — the
    shuffle carries |months| tiny rows."""
    orders = load_table(spark, sf_dir, "orders")
    key = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
    )
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "month_key"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (
                F.sum(shingle_int(F.md5(key)).cast("decimal(38,0)"))
                % F.lit(_PP_MOD)
            )
            .cast("bigint")
            .alias("row_checksum"),
        )
        .orderBy("month_key")
    )


# --- attribution window sensitivity -------------------------------------------

ATTR_WINDOWS_H = (1, 6, 24, 72)


@register(
    "ev_attribution_window_sweep",
    oracle=f"""
    WITH ev AS (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
    ),
    pur AS (
        SELECT user_id, epoch_us(ts) AS pus FROM events
        WHERE event_type = 'purchase'
    ),
    g AS (
        SELECT e.event_id, e.event_type, MIN(p.pus - e.us) AS min_gap
        FROM ev e
        LEFT JOIN pur p
          ON p.user_id = e.user_id AND p.pus > e.us
             AND p.pus <= e.us + {72 * 3600 * 1_000_000}
        GROUP BY e.event_id, e.event_type
    )
    SELECT g.event_type, w.window_h,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN g.min_gap IS NOT NULL
                          AND g.min_gap <= w.window_h * 3600000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           CAST(SUM(CASE WHEN g.min_gap IS NOT NULL
                          AND g.min_gap <= w.window_h * 3600000000
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS conv_rate
    FROM g CROSS JOIN (VALUES (1), (6), (24), (72)) AS w(window_h)
    GROUP BY g.event_type, w.window_h
    ORDER BY g.event_type, w.window_h
    """,
    description="conversion rate vs attribution-window choice (1/6/24/72h): the sensitivity table behind every 'within-X-hours' metric definition",
)
def ev_attribution_window_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much does the attribution-window CHOICE move the metric?
    The same followed-by-purchase rate (ev_followup_purchase_rate's
    semantics) swept across 1/6/24/72-hour windows in one table — if
    the 24h and 72h rates diverge sharply, the metric is measuring
    window length, not behavior, and every report built on it
    inherits that sensitivity.

    Exactness: one LEFT join at the WIDEST window captures each
    event's min purchase gap in integer microseconds; every narrower
    window is then a pure integer comparison on that gap — the sweep
    costs zero extra joins and cannot disagree with itself
    (monotonicity is structural and pytest-pinned).

    Scale: one equi-join on user_id bounded by the 72h range, one
    event-grain reduce, a 4x fan-out of the |types|-grain rollup."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("us").alias("pus")
    )
    max_us = 72 * 3600 * 1_000_000
    g = (
        ev.join(
            pur,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("pus") > F.col("us"))
            & (F.col("pus") <= F.col("us") + F.lit(max_us)),
            "left",
        )
        .groupBy("event_id", "event_type")
        .agg(F.min(F.col("pus") - F.col("us")).alias("min_gap"))
    )
    sweep = g.select(
        "event_type",
        "min_gap",
        F.explode(F.array(*[F.lit(h) for h in ATTR_WINDOWS_H])).alias("window_h"),
    )
    conv = F.when(
        F.col("min_gap").isNotNull()
        & (F.col("min_gap") <= F.col("window_h") * F.lit(3600000000)),
        1,
    ).otherwise(0)
    return (
        sweep.groupBy("event_type", "window_h")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(conv).cast("bigint").alias("n_converted"),
            (F.sum(conv).cast("double") / F.count(F.lit(1))).alias("conv_rate"),
        )
        .orderBy("event_type", "window_h")
    )


# --- weekday-deseasonalized DAU -----------------------------------------------


@register(
    "ev_dau_deseasonalized",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    daily AS (
        SELECT d, CAST(COUNT(*) AS BIGINT) AS dau,
               CAST(EXTRACT(isodow FROM d) AS BIGINT) AS weekday
        FROM ud GROUP BY d
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(dau) AS BIGINT) AS total_dau
        FROM daily
    ),
    wf AS (
        SELECT weekday,
               CAST(FLOOR(1000000.0
                          * CAST(SUM(dau) * (SELECT n_days FROM tot) AS DOUBLE)
                          / CAST(COUNT(*) * (SELECT total_dau FROM tot) AS DOUBLE))
                    AS BIGINT) AS f_e6
        FROM daily GROUP BY weekday
    )
    SELECT daily.d AS day, daily.dau, daily.weekday,
           CAST(wf.f_e6 AS DOUBLE) / 1000000.0 AS weekday_factor,
           CAST(daily.dau * 1000000 AS DOUBLE) / wf.f_e6 AS adjusted_dau
    FROM daily JOIN wf USING (weekday)
    ORDER BY day
    """,
    description="DAU with the weekday seasonal factor divided out (1e-6-quantized): the series an ops dashboard should alert on instead of raw DAU",
)
def ev_dau_deseasonalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw DAU alerts fire every Saturday; this is the series that
    doesn't: each day's active-user count divided by its weekday's
    mean-relative factor (factor = weekday mean DAU / overall mean
    DAU). A Monday at factor 1.1 and DAU 110 is exactly on-trend;
    adjusted_dau flattens the weekly sawtooth so level changes and
    incidents stand out (ev_anomaly_zscore is the alert; this is the
    de-noised input it should run on).

    Exactness: the factor is FLOORed at 1e-6 from a single division
    of exact integer products (weekday dau-sum x day-count cross-
    multiplied against the totals — no mean-of-means float); the
    adjusted series is then one division per day by that integer.

    Scale: distinct (user, day) reduce, |days| rollup, 7-row factor
    table broadcast back."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    daily = ud.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("dau")).select(
        "d", "dau", F.dayofweek("d").cast("bigint").alias("dow_sun1")
    )
    # ISO weekday (Mon=1..Sun=7) to mirror DuckDB's isodow
    daily = daily.select(
        "d",
        "dau",
        F.when(F.col("dow_sun1") == 1, 7).otherwise(F.col("dow_sun1") - 1).alias(
            "weekday"
        ),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("dau").cast("bigint").alias("total_dau"),
    )
    wf = (
        daily.crossJoin(F.broadcast(tot))
        .groupBy("weekday")
        .agg(
            F.floor(
                F.lit(1000000.0)
                * (F.sum("dau") * F.first("n_days")).cast("double")
                / (F.count(F.lit(1)) * F.first("total_dau")).cast("double")
            ).alias("f_e6")
        )
    )
    return (
        daily.join(F.broadcast(wf), "weekday")
        .select(
            F.col("d").alias("day"),
            "dau",
            "weekday",
            (F.col("f_e6").cast("double") / F.lit(1000000.0)).alias("weekday_factor"),
            ((F.col("dau") * F.lit(1000000)).cast("double") / F.col("f_e6")).alias(
                "adjusted_dau"
            ),
        )
        .orderBy("day")
    )


# --- keeper-policy delta (min-id vs longest-member) ----------------------------


def _keeper_delta_oracle() -> str:
    from lime_etl_spark.operators.dedup import _minhash_sql

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
        SELECT vid AS doc_id, MIN(lab) AS component_id
        FROM reach GROUP BY vid
    ),
    ranked AS (
        SELECT c.component_id, d.doc_id, d.n_chars,
               ROW_NUMBER() OVER (PARTITION BY c.component_id
                                  ORDER BY d.n_chars DESC, d.doc_id) AS rep_rn,
               ROW_NUMBER() OVER (PARTITION BY c.component_id
                                  ORDER BY d.doc_id) AS min_rn,
               COUNT(*) OVER (PARTITION BY c.component_id) AS sz
        FROM comp c JOIN documents d USING (doc_id)
    ),
    per_cluster AS (
        SELECT component_id, sz,
               MAX(CASE WHEN min_rn = 1 THEN doc_id END) AS min_keeper,
               MAX(CASE WHEN min_rn = 1 THEN n_chars END) AS min_chars,
               MAX(CASE WHEN rep_rn = 1 THEN doc_id END) AS rep_keeper,
               MAX(CASE WHEN rep_rn = 1 THEN n_chars END) AS rep_chars
        FROM ranked
        WHERE sz >= 2
        GROUP BY component_id, sz
    )
    SELECT CAST(sz AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(CASE WHEN min_keeper != rep_keeper THEN 1 ELSE 0 END)
                AS BIGINT) AS n_keeper_differs,
           CAST(SUM(rep_chars - min_chars) AS BIGINT) AS chars_gained,
           CAST(SUM(rep_chars - min_chars) AS DOUBLE) / COUNT(*)
               AS mean_chars_gained
    FROM per_cluster
    GROUP BY sz
    ORDER BY cluster_size
    """


@register(
    "cur_keeper_policy_delta",
    oracle=_keeper_delta_oracle(),
    description="keeper-policy governance: min-id vs longest-member cluster collapse compared — how often they disagree and the content the quality policy keeps",
)
def cur_keeper_policy_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The governance table for a dedup policy decision: within each
    near-dup cluster, how often does the cheap min-id keeper
    (dedup_components convention) pick a DIFFERENT survivor than the
    quality keeper (cur_best_rep_dedup's longest-member), and how many
    characters of content the quality policy retains that min-id would
    discard. If n_keeper_differs is near zero the cheap policy is
    fine; a large chars_gained says clusters mix full articles with
    excerpts and the quality keeper materially changes the corpus.

    Exactness: both keepers are deterministic (full tiebreaks); the
    delta is integer character arithmetic with one division per
    cluster-size bucket.

    Scale: one LSH+CC labeling feeds both keeper windows, which share
    one component_id exchange; the rollup is |cluster sizes| rows."""
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
    labeled = docs.select("doc_id", "n_chars").join(
        cc.select(F.col("vid").alias("doc_id"), F.col("label").alias("component_id")),
        "doc_id",
    )
    w_rep = Window.partitionBy("component_id").orderBy(
        F.desc("n_chars"), F.col("doc_id")
    )
    w_min = Window.partitionBy("component_id").orderBy("doc_id")
    w_sz = Window.partitionBy("component_id")
    ranked = labeled.select(
        "component_id",
        "doc_id",
        "n_chars",
        F.row_number().over(w_rep).alias("rep_rn"),
        F.row_number().over(w_min).alias("min_rn"),
        F.count(F.lit(1)).over(w_sz).alias("sz"),
    ).where(F.col("sz") >= 2)
    per_cluster = ranked.groupBy("component_id", "sz").agg(
        F.max(F.when(F.col("min_rn") == 1, F.col("doc_id"))).alias("min_keeper"),
        F.max(F.when(F.col("min_rn") == 1, F.col("n_chars"))).alias("min_chars"),
        F.max(F.when(F.col("rep_rn") == 1, F.col("doc_id"))).alias("rep_keeper"),
        F.max(F.when(F.col("rep_rn") == 1, F.col("n_chars"))).alias("rep_chars"),
    )
    differs = F.when(F.col("min_keeper") != F.col("rep_keeper"), 1).otherwise(0)
    return (
        per_cluster.groupBy(F.col("sz").cast("bigint").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum(differs).cast("bigint").alias("n_keeper_differs"),
            F.sum(F.col("rep_chars") - F.col("min_chars"))
            .cast("bigint")
            .alias("chars_gained"),
            (
                F.sum(F.col("rep_chars") - F.col("min_chars")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_chars_gained"),
        )
        .orderBy("cluster_size")
    )


# --- centroid shift under exact-int8 dedup --------------------------------------


@register(
    "emb_dedup_centroid_shift",
    oracle="""
    WITH """ + __import__("textwrap").dedent("""
    corpus AS (
        SELECT vec_id, label, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id, label, embedding
        FROM embeddings WHERE vec_id % 10 = 0
    ),
    m AS (
        SELECT MAX(list_max(list_transform(CAST(embedding AS DOUBLE[]), v -> abs(v)))) / 127 AS s
        FROM corpus
    ),
    q AS (
        SELECT vec_id, label,
               list_transform(
                   CAST(embedding AS DOUBLE[]),
                   v -> CAST(GREATEST(LEAST(floor(v / s + 0.5), 127), -127) AS BIGINT)
               ) AS qv
        FROM corpus, m
    ),
    before_d AS (
        SELECT label, i, CAST(SUM(qv[i]) AS BIGINT) AS sb
        FROM (SELECT label, qv, unnest(generate_series(1, len(qv))) AS i FROM q)
        GROUP BY label, i
    ),
    uq AS (SELECT DISTINCT label, qv FROM q),
    after_d AS (
        SELECT label, i, CAST(SUM(qv[i]) AS BIGINT) AS sa
        FROM (SELECT label, qv, unnest(generate_series(1, len(qv))) AS i FROM uq)
        GROUP BY label, i
    ),
    counts AS (
        SELECT q.label, CAST(COUNT(*) AS BIGINT) AS n_b,
               (SELECT COUNT(*) FROM uq WHERE uq.label = q.label) AS n_a
        FROM q GROUP BY q.label
    ),
    terms AS (
        SELECT b.label,
               CAST(FLOOR(1000000.0
                          * (CAST(b.sb AS DOUBLE) / c.n_b
                             - CAST(a.sa AS DOUBLE) / c.n_a)
                          * (CAST(b.sb AS DOUBLE) / c.n_b
                             - CAST(a.sa AS DOUBLE) / c.n_a)) AS BIGINT) AS t
        FROM before_d b
        JOIN after_d a ON a.label = b.label AND a.i = b.i
        JOIN counts c ON c.label = b.label
    )
    SELECT c.label,
           c.n_b AS n_vecs,
           CAST(c.n_a AS BIGINT) AS n_unique,
           CAST(c.n_b - c.n_a AS BIGINT) AS n_dropped,
           sqrt(CAST(t.st AS DOUBLE) / 1000000.0) AS centroid_shift_q
    FROM counts c
    JOIN (SELECT label, CAST(SUM(t) AS BIGINT) AS st FROM terms GROUP BY label) t
      ON t.label = c.label
    ORDER BY c.label
    """),
    description="how far each label's centroid MOVES when exact-int8 duplicate vectors collapse to one — the embedding-space twin of dedup_survivor_mix_shift",
)
def emb_dedup_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate vectors drag class centroids toward whatever got
    re-ingested most; this measures the drag: per label, the L2
    distance (in int8 quantized units) between the centroid computed
    over ALL vectors and over the DISTINCT int8 vectors — exactly
    what flips when emb_exact_duplicates' groups collapse. A label
    with many drops and a large shift was having its prototype set by
    ingestion luck, and every centroid consumer (IVF seeds, kNN
    prototypes, drift monitors) inherits the fix.

    Exactness: both centroids come from exact integer per-dim sums
    (the emb_label_centroids discipline); each dimension's squared
    difference is FLOORed at 1e-6 before the cross-dimension sum, so
    the reduce is integer and order-free at any scale (no n^2 integer
    products — means stay bounded by +-127, so the quantized terms
    are <=6.5e10 regardless of corpus size); one sqrt-of-division per
    label at the end.

    Scale: two posexplode passes (all vs distinct-qv) with map-side
    (label, dim) combines — shuffle carries |labels| x dim counters;
    the distinct runs on the quantized ARRAY key exactly like
    emb_exact_duplicates. Input is the deterministic dup-injected
    corpus (every vec_id % 10 == 0 re-ingested as +1e6 — the dedup
    family's _DUPCORPUS convention), so the operator exercises real
    collapses on the driver fixture too."""
    base = load_table(spark, sf_dir, "embeddings")
    corpus = base.unionByName(
        base.where(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 1000000).alias("vec_id"), "embedding", "label"
        ).select(*base.columns)
    )
    emb = with_int8_vectors(corpus, "label")

    def dim_sums(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select("label", F.posexplode("qv").alias("i", "v"))
            .groupBy("label", "i")
            .agg(F.sum("v").cast("bigint").alias(out))
        )

    before_d = dim_sums(emb, "sb")
    uq = emb.select("label", "qv").distinct()
    after_d = dim_sums(uq, "sa")
    counts = (
        emb.groupBy("label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_b"))
        .join(
            uq.groupBy("label").agg(F.count(F.lit(1)).cast("bigint").alias("n_a")),
            "label",
        )
    )
    diff = (
        F.col("sb").cast("double") / F.col("n_b")
        - F.col("sa").cast("double") / F.col("n_a")
    )
    terms = (
        before_d.join(after_d, ["label", "i"])
        .join(F.broadcast(counts), "label")
        .select("label", F.floor(F.lit(1000000.0) * diff * diff).alias("t"))
    )
    st = terms.groupBy("label").agg(F.sum("t").cast("bigint").alias("st"))
    return (
        counts.join(st, "label")
        .select(
            "label",
            F.col("n_b").alias("n_vecs"),
            F.col("n_a").alias("n_unique"),
            (F.col("n_b") - F.col("n_a")).cast("bigint").alias("n_dropped"),
            F.sqrt(F.col("st").cast("double") / F.lit(1000000.0)).alias(
                "centroid_shift_q"
            ),
        )
        .orderBy("label")
    )


# --- revenue waterfall by year --------------------------------------------------


@register(
    "q_revenue_waterfall",
    oracle="""
    SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               AS gross_revenue,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
               AS discount_given,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS net_revenue,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                    * CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE) AS tax_collected,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                    * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2))))
                AS DOUBLE) AS charged_amount,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               AS discount_rate
    FROM lineitem
    GROUP BY 1
    ORDER BY ship_year
    """,
    description="finance waterfall per ship year: gross -> discount -> net -> tax -> charged, decimal-exact (the q1 aggregate family re-cut as a bridge)",
)
def q_revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The finance bridge every revenue review starts from: gross
    booked value, discount given away, net revenue, tax collected and
    the final charged amount, per ship year — each column is the next
    step of the waterfall, so (gross - discount = net) and
    (net + tax = charged) hold EXACTLY row by row (pytest-pinned),
    which is what makes the table auditable rather than approximately
    plausible.

    Exactness: every term is a decimal product of 2-decimal inputs
    summed exactly; the one ratio divides two exact decimals.

    Scale: single scan, three pushed columns, |years| map-side
    rollup — the q1 shape with a different cut."""
    li = load_table(spark, sf_dir, "lineitem")
    price = dec("l_extendedprice", 2, 12)
    disc = dec("l_discount", 2, 4)
    tax = dec("l_tax", 2, 4)
    one = F.lit(1).cast("decimal(3,2)")
    return (
        li.groupBy(F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(
            F.sum(price).cast("double").alias("gross_revenue"),
            F.sum(price * disc).cast("double").alias("discount_given"),
            F.sum(price * (one - disc)).cast("double").alias("net_revenue"),
            F.sum(price * (one - disc) * tax).cast("double").alias("tax_collected"),
            F.sum(price * (one - disc) * (one + tax))
            .cast("double")
            .alias("charged_amount"),
            (
                F.sum(price * disc).cast("double") / F.sum(price).cast("double")
            ).alias("discount_rate"),
        )
        .orderBy("ship_year")
    )


# --- JSON-prop vs value correlation ---------------------------------------------


@register(
    "ev_props_correlation",
    oracle="""
    WITH pts AS (
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS x,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
    ),
    mom AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y // 100 * (y // 100)) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM pts GROUP BY event_type
    )
    SELECT event_type, n AS n_events,
           CAST(sx AS DOUBLE) / n AS mean_k,
           CAST(sy AS DOUBLE) / (n * 100) AS mean_value,
           CASE WHEN (n * sxx - sx * sx) = 0
                  OR (n * syy - (sy // 100) * (sy // 100)) = 0 THEN 0.0
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - (sy // 100) * (sy // 100) AS DOUBLE))
                        * 100.0)
                END AS pearson_r
    FROM mom
    ORDER BY event_type
    """,
    description="does the JSON prop k predict event value: per-type Pearson r from exact integer moments (the emb_dim_correlation discipline on semi-structured data)",
)
def ev_props_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the instrumented property worth anything? Pearson
    correlation between the JSON prop ``k`` and the event's monetary
    value per event type — near-zero r says the prop is noise to the
    value model; a strong r on one type only says the logging means
    different things per type (a protocol smell dq_protocol_violations
    can't see because the payload is VALID).

    Exactness: k is an int, value is exact cents; all five moments
    are int64 sums (the y-variance runs at dollar grain via floor
    division to keep n*syy inside int64 at 100x scale — documented
    like ev_cuped_adjustment). r divides the exact covariance by the
    sqrt-product, with the cents/dollars scale folded into one
    literal so the expression shape is identical cross-engine.

    Scale: one scan with the JSON extraction JVM-side
    (get_json_object), |types| counter rows out."""
    ev = load_table(spark, sf_dir, "events")
    x = F.get_json_object("props", "$.k").cast("bigint")
    y = (dec("value", 2, 12) * 100).cast("bigint")
    pts = ev.where(x.isNotNull()).select(
        "event_type", x.alias("x"), y.alias("y")
    )
    mom = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.expr("y div 100 * (y div 100)")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.expr("sy div 100") * F.expr("sy div 100")
    r = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return mom.select(
        "event_type",
        F.col("n").alias("n_events"),
        (F.col("sx").cast("double") / F.col("n")).alias("mean_k"),
        (F.col("sy").cast("double") / (F.col("n") * 100)).alias("mean_value"),
        F.when((dx == 0) | (dy == 0), F.lit(0.0))
        .otherwise(
            r.cast("double")
            / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double")) * F.lit(100.0))
        )
        .alias("pearson_r"),
    ).orderBy("event_type")


# --- uplift-by-decile (qini-style) ---------------------------------------------


UPLIFT_CONV_DAYS = 7  # conversion = purchase within 7 days of cutover


def _uplift_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of `_uplift_cells_sql`: the 10-row per-decile arm
    rollup with `incr_e6` (1e-6-quantized incremental conversions via
    the non-negative offset floor-division idiom) that both
    ev_uplift_deciles and ev_uplift_qini_auc consume. Conversion is a
    purchase within UPLIFT_CONV_DAYS of the cutover — the bounded
    attribution window ev_attribution_window_sweep motivates; an
    unbounded "ever purchased after" saturates to 100% on any
    long-enough horizon and every incremental reads zero. One fact
    scan to user grain; the decile runs through the sharded-rank
    decomposition (functions/ranks.py)."""
    from lime_etl_spark.operators.insights2 import DID_CUTOVER

    ev = load_table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    cut = F.lit(DID_CUTOVER).cast("date")
    pre_d = d < cut
    conv_d = (
        (F.col("event_type") == "purchase")
        & (d >= cut)
        & (d < F.date_add(cut, UPLIFT_CONV_DAYS))
    )
    pre = ev.groupBy("user_id").agg(
        F.sum(F.when(pre_d, 1).otherwise(0)).cast("bigint").alias("pre_events"),
        F.sum(F.when(conv_d, 1).otherwise(0))
        .cast("bigint")
        .alias("post_purchases"),
    )
    scored = pre.select(
        "user_id",
        "pre_events",
        F.when(F.col("post_purchases") > 0, 1).otherwise(0).alias("converted"),
        F.when(hash_bucket(F.col("user_id"), 2) == 0, "control")
        .otherwise("treatment")
        .alias("arm"),
    )
    deciled = with_global_ntile(
        scored,
        F.col("pre_events"),
        [F.col("pre_events"), F.col("user_id")],
        k=10,
        out="decile",
    )
    is_c = F.col("arm") == "control"
    cells = deciled.groupBy("decile").agg(
        F.sum(F.when(is_c, 1).otherwise(0)).cast("bigint").alias("n_c"),
        F.sum(F.when(~is_c, 1).otherwise(0)).cast("bigint").alias("n_t"),
        F.sum(F.when(is_c, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_c"),
        F.sum(F.when(~is_c, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_t"),
    )
    incr_e6 = F.when(F.col("n_c") == 0, F.lit(0).cast("bigint")).otherwise(
        F.expr(
            "(1000000 * (conv_t * n_c - conv_c * n_t)"
            " + 1000000 * n_t * n_c) div n_c - 1000000 * n_t"
        )
    )
    return cells.withColumn("incr_e6", incr_e6)


def _uplift_cells_sql() -> str:
    """Shared CTE prefix (user grain → md5 arms → pre-activity deciles
    → per-decile arm counts + 1e-6-quantized incremental conversions)
    for the uplift family: ev_uplift_deciles and ev_uplift_qini_auc
    read the same `q` relation, so curve and capstone scalar can never
    disagree on the cells."""
    from lime_etl_spark.operators.insights2 import DID_CUTOVER

    return f"""
    WITH pre AS (
        SELECT user_id,
               CAST(COUNT(*) FILTER (CAST(ts AS DATE) < DATE '{DID_CUTOVER}')
                    AS BIGINT) AS pre_events,
               CAST(COUNT(*) FILTER (event_type = 'purchase'
                         AND CAST(ts AS DATE) >= DATE '{DID_CUTOVER}'
                         AND CAST(ts AS DATE)
                             < DATE '{DID_CUTOVER}' + INTERVAL {UPLIFT_CONV_DAYS} DAY)
                    AS BIGINT) AS post_purchases
        FROM events GROUP BY user_id
    ),
    scored AS (
        SELECT CASE WHEN post_purchases > 0 THEN 1 ELSE 0 END AS converted,
               CASE WHEN {_bucket_sql("user_id", 2)} = 0
                    THEN 'control' ELSE 'treatment' END AS arm,
               NTILE(10) OVER (ORDER BY pre_events, user_id) AS decile
        FROM pre
    ),
    cells AS (
        SELECT decile,
               CAST(COUNT(*) FILTER (arm = 'control') AS BIGINT) AS n_c,
               CAST(COUNT(*) FILTER (arm = 'treatment') AS BIGINT) AS n_t,
               CAST(SUM(CASE WHEN arm = 'control' THEN converted ELSE 0 END)
                    AS BIGINT) AS conv_c,
               CAST(SUM(CASE WHEN arm = 'treatment' THEN converted ELSE 0 END)
                    AS BIGINT) AS conv_t
        FROM scored GROUP BY decile
    ),
    q AS (
        SELECT decile, n_c, n_t, conv_c, conv_t,
               CASE WHEN n_c = 0 THEN 0
                    ELSE (1000000 * (conv_t * n_c - conv_c * n_t)
                          + 1000000 * n_t * n_c) // n_c - 1000000 * n_t
               END AS incr_e6
        FROM cells
    )"""


def _uplift_sql() -> str:
    rate_c = "CASE WHEN n_c = 0 THEN 0.0 ELSE CAST(conv_c AS DOUBLE) / n_c END"
    rate_t = "CASE WHEN n_t = 0 THEN 0.0 ELSE CAST(conv_t AS DOUBLE) / n_t END"
    return f"""{_uplift_cells_sql()}
    SELECT decile, n_c AS n_control, n_t AS n_treatment,
           conv_c AS conv_control, conv_t AS conv_treatment,
           {rate_c} AS rate_control,
           {rate_t} AS rate_treatment,
           ({rate_t}) - ({rate_c}) AS uplift,
           CAST(SUM(incr_e6) OVER (
               ORDER BY decile DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 1000000 AS cum_incremental
    FROM q ORDER BY decile DESC
    """


@register(
    "ev_uplift_deciles",
    oracle=_uplift_sql(),
    description="uplift-by-decile table (qini-style): per pre-activity decile, treatment-vs-control post conversion rates, uplift, and cumulative incremental conversions from the top decile down",
)
def ev_uplift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The targeting read the flat DiD can't give: does the treatment
    effect concentrate in heavy pre-period users? Users rank into
    pre-activity deciles; per decile the md5 arms' post-cutover
    conversion rates, their difference (uplift), and the qini-style
    cumulative incremental conversions scanning from the most-active
    decile down — the curve a rollout targets against.

    Exactness: counts are int64; each rate is ONE double division;
    per-decile incremental conversions quantize at 1e-6 via the
    offset-floor-division idiom (offset 1e6·n_t·n_c keeps the
    numerator non-negative since conv_c ≤ n_c, so Spark's truncating
    `div` and DuckDB's flooring `//` agree — same trick as the CUPED
    offset), and the 10-row cumulative is an INTEGER running sum
    (float running sums are banned: DuckDB's segment-tree window
    aggregation reorders float additions). Int budget: 1e6·n_c·n_t ≤
    2.5e5·N² — inside int64 to N ≈ 1.9e6 users; shard or rescale past
    that.

    Scale: one fact scan to user grain; the decile runs through the
    sharded-rank decomposition (functions/ranks.py), the qini window
    is over the 10-row decile rollup."""
    cells = _uplift_cells(spark, sf_dir)
    rate_c = F.when(F.col("n_c") == 0, F.lit(0.0)).otherwise(
        F.col("conv_c").cast("double") / F.col("n_c")
    )
    rate_t = F.when(F.col("n_t") == 0, F.lit(0.0)).otherwise(
        F.col("conv_t").cast("double") / F.col("n_t")
    )
    w = (
        Window.orderBy(F.desc("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.select(
            "decile",
            F.col("n_c").alias("n_control"),
            F.col("n_t").alias("n_treatment"),
            F.col("conv_c").alias("conv_control"),
            F.col("conv_t").alias("conv_treatment"),
            rate_c.alias("rate_control"),
            rate_t.alias("rate_treatment"),
            (rate_t - rate_c).alias("uplift"),
            (F.sum("incr_e6").over(w).cast("double") / 1000000).alias(
                "cum_incremental"
            ),
        )
        .orderBy(F.desc("decile"))
    )


def _qini_auc_sql() -> str:
    return f"""{_uplift_cells_sql()},
    cum AS (
        SELECT decile, n_c, n_t, conv_c, conv_t, incr_e6,
               n_c + n_t AS dn,
               CAST(SUM(incr_e6) OVER (
                   ORDER BY decile DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS q_cum
        FROM q
    ),
    lagd AS (
        SELECT *,
               LAG(q_cum, 1, CAST(0 AS BIGINT))
                   OVER (ORDER BY decile DESC) AS q_prev
        FROM cum
    ),
    agg AS (
        SELECT CAST(SUM(dn) AS BIGINT) AS n_users,
               CAST(SUM(conv_c) AS BIGINT) AS conv_control,
               CAST(SUM(conv_t) AS BIGINT) AS conv_treatment,
               CAST(SUM(incr_e6) AS BIGINT) AS q_total_e6,
               CAST(SUM((q_prev + q_cum) * dn) AS BIGINT) AS a2_curve_e6
        FROM lagd
    )
    SELECT n_users, conv_control, conv_treatment,
           CAST(q_total_e6 AS DOUBLE) / 1000000 AS q_total,
           CASE WHEN n_users = 0 THEN 0.0
                ELSE CAST(a2_curve_e6 - q_total_e6 * n_users AS DOUBLE)
                     / CAST(2 * n_users * 1000000 AS BIGINT)
           END AS qini_auc
    FROM agg
    """


@register(
    "ev_uplift_qini_auc",
    oracle=_qini_auc_sql(),
    description="qini AUC capstone scalar for the uplift family: area between the cumulative-incremental-conversions curve (targeting by pre-activity decile, top down) and the random-targeting diagonal, per targeted individual",
)
def ev_uplift_qini_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONE number an experimenter ranks targeting models by
    (r4 verdict #8): the area between the qini curve — cumulative
    incremental conversions as the rollout works down the
    pre-activity deciles — and the straight line a random targeting
    of the same population would trace to the same total. Positive
    means the decile score concentrates the effect (target
    top-down); ~0 means the score carries no targeting information;
    negative means it is anti-correlated with the effect.

    Exactness: rides `_uplift_cells` — per-decile incremental
    conversions are 1e-6-quantized int64 (the offset floor-division
    idiom), the cumulative curve is an INTEGER running sum, the
    trapezoid area is 2·A = Σ(Q_{k-1}+Q_k)·Δn_k in exact int64, the
    diagonal 2·A = Q_total·N, and the final AUC is ONE double
    division of two exact int64s — engine-identical. Int budget:
    |a2_curve_e6| ≤ 1e6·N·conv·10 — inside int64 to N ≈ 3e5 users at
    full conversion (shard or rescale past that, like the deciles
    table documents).

    Scale: identical plan shape to ev_uplift_deciles (one fact scan →
    user grain → sharded ntile); the qini/lag windows run over the
    10-row decile rollup, then a 1-row reduce."""
    cells = _uplift_cells(spark, sf_dir)
    wq = Window.orderBy(F.desc("decile")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cells.withColumn("dn", F.col("n_c") + F.col("n_t")).withColumn(
        "q_cum", F.sum("incr_e6").over(wq).cast("bigint")
    )
    lagd = cum.withColumn(
        "q_prev",
        F.lag("q_cum", 1, 0).over(Window.orderBy(F.desc("decile"))).cast("bigint"),
    )
    agg = lagd.agg(
        F.sum("dn").cast("bigint").alias("n_users"),
        F.sum("conv_c").cast("bigint").alias("conv_control"),
        F.sum("conv_t").cast("bigint").alias("conv_treatment"),
        F.sum("incr_e6").cast("bigint").alias("q_total_e6"),
        F.sum((F.col("q_prev") + F.col("q_cum")) * F.col("dn"))
        .cast("bigint")
        .alias("a2_curve_e6"),
    )
    num = F.col("a2_curve_e6") - F.col("q_total_e6") * F.col("n_users")
    den = (F.lit(2).cast("bigint") * F.col("n_users") * F.lit(1000000)).cast(
        "bigint"
    )
    return agg.select(
        "n_users",
        "conv_control",
        "conv_treatment",
        (F.col("q_total_e6").cast("double") / 1000000).alias("q_total"),
        F.when(F.col("n_users") == 0, F.lit(0.0))
        .otherwise(num.cast("double") / den)
        .alias("qini_auc"),
    )
