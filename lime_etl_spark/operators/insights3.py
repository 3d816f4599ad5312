"""Round-4 batch 1 insights: exact-integer trend/co-movement analytics,
corpus vocabulary-growth (Heaps) audit, sampling reweight plan,
label-centroid separation in int8 space, and weekly tenure-mix.

lime-etl analog: the scheduled report jobs a BatchSpec runs nightly
(`/root/reference/lime_etl/domain/job_spec.py:40` — `run()` builds a
table, `test()` asserts invariants); each is a first-class DataFrame
operator with a DuckDB oracle here.

Shared determinism rules (operators/insights.py, insights2.py): money
decimal-cast before SUM, every Σ term an exact integer, ONE IEEE
division (sqrt/multiply are correctly-rounded so a guarded
num/sqrt(a·b) form is bit-stable cross-engine), bounded outputs with a
total-order ORDER BY. Integer magnitudes are budgeted per query so the
int64 envelope holds at 100× the test scale (noted inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lime_etl_spark.functions.numeric import dec
from lime_etl_spark.operators.text import BPE_RE
from lime_etl_spark.operators.training import PACK_BUDGET, PACK_SHARDS
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
    WITH bucketed AS (
        SELECT doc_id, text,
               ntile({VOCAB_BUCKETS}) OVER (ORDER BY doc_id) AS bucket
        FROM documents
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
    """How fast does the corpus stop teaching new words? Docs are
    ntile'd into ingest-order buckets (doc_id is the ingest order; the
    total order makes ntile deterministic cross-engine), each token's
    birth bucket is its MIN bucket, and the per-bucket new-type count
    traces the Heaps curve — the input to 'how much new data do we
    need for X new vocabulary' forecasts. Counts are exact ints;
    novelty_rate is the one IEEE division.

    Scale: tokens explode the corpus once; the birth reduce is a
    (token → min bucket) map-side-combining groupBy whose state is
    |vocab|, not |tokens|; per-bucket rollups are |buckets| rows and
    the cumulative window sorts {VOCAB_BUCKETS} rows on a single
    partition — bounded by construction. ntile's window sorts by
    doc_id, which a sort-ordered ingest (or a zorder write) makes a
    near-no-op under AQE.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucketed = docs.select(
        F.ntile(VOCAB_BUCKETS).over(Window.orderBy("doc_id")).alias("bucket"),
        "text",
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
    x = F.col("embedding").cast("array<double>")
    scale = emb.agg(
        (F.max(F.array_max(F.transform(x, lambda v: F.abs(v)))) / 127).alias("s")
    )
    qv = F.transform(
        x,
        lambda v: (
            F.greatest(
                F.least(F.floor(v / F.col("s") + 0.5), F.lit(127.0)), F.lit(-127.0)
            )
        ).cast("bigint"),
    )
    cent = (
        emb.join(F.broadcast(scale))
        .select("label", F.posexplode(qv).alias("pos", "v"))
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
    x = F.col("embedding").cast("array<double>")
    scale = emb.agg(
        (F.max(F.array_max(F.transform(x, lambda v: F.abs(v)))) / 127).alias("s")
    )
    qv = F.transform(
        x,
        lambda v: (
            F.greatest(
                F.least(F.floor(v / F.col("s") + 0.5), F.lit(127.0)), F.lit(-127.0)
            )
        ).cast("bigint"),
    )
    comp = (
        emb.join(F.broadcast(scale))
        .select("label", F.posexplode(qv).alias("pos", "v"))
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
