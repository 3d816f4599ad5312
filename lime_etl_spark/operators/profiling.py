"""Data-profiling operators: digit-law audits, robust dispersion,
outlier fences.

These are the statistical data-quality checks a curation pipeline runs
beside the schema-level ones in ``operators/etl.py`` (dq_* family):
Benford's-law drift catches synthetic/duplicated numeric columns, IQR
fences and MAD are the robust outlier screens that survive the heavy
tails exact stddev does not. (lime-etl analog: the ``test()`` hook on
a JobSpec — `/root/reference/lime_etl/domain/job_spec.py:60` — these
are prebuilt tests a TableRefreshJob can attach.)

Determinism rules (shared with the rest of the engine):
- first-digit extraction is a CASE ladder over powers of ten, not
  log10/string-cast — double→string formatting and log-edge rounding
  both differ across engines;
- percentiles are exact interpolated (Spark ``percentile`` == DuckDB
  ``quantile_cont``, same (1-f)·a+f·b form); approx_percentile is the
  documented 100 TB path;
- shares/fences use single IEEE ops (one division / one multiply-sub),
  which are correctly-rounded and cross-engine stable.

Scale shape: every operator reduces to a handful of group rows before
any join; the join back onto the fact is a broadcast of those rows, so
the fact table is scanned at most twice and never shuffled on data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lime_etl_spark.plans.registry import register
from lime_etl_spark.sources.readers import load_table

# -- first significant digit ------------------------------------------------

# o_totalprice < 10^7 in every TPC-H scale; extend the ladder if not.
_POW10 = [10**k for k in range(6, -1, -1)]


def first_digit(col: F.Column) -> F.Column:
    """First significant digit of a positive numeric as a CASE ladder.

    floor(x / 10^k) for the matching magnitude k: one correctly-rounded
    IEEE division + floor, bit-identical everywhere, no log10, no
    double→string formatting.
    """
    expr = F.lit(None).cast("int")
    ladder = F.when(col >= _POW10[0], F.floor(col / _POW10[0]))
    for p in _POW10[1:]:
        ladder = ladder.when(col >= p, F.floor(col / p))
    return ladder.otherwise(expr).cast("int")


def _first_digit_sql(expr: str) -> str:
    cases = " ".join(
        f"WHEN {expr} >= {p} THEN CAST(FLOOR({expr} / {p}) AS INT)" for p in _POW10
    )
    return f"CASE {cases} ELSE NULL END"


@register(
    "dq_benford",
    oracle=f"""
    SELECT digit, n,
           CAST(n AS DOUBLE) / SUM(n) OVER () AS share
    FROM (
        SELECT {_first_digit_sql("o_totalprice")} AS digit, COUNT(*) AS n
        FROM orders
        GROUP BY 1
    )
    ORDER BY digit
    """,
    description="Benford first-significant-digit distribution of order totals",
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit histogram of o_totalprice with exact shares.

    The scan aggregates straight to <=9 counter rows (map-side partial
    combine; counters-only shuffle); the share window runs over those 9
    rows on one task. Comparing `share` against log10(1+1/d) is left to
    the caller — the ln/log10 constants are not bit-stable cross-engine
    so the engine emits exact counts and one exact division.
    """
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy(
        first_digit(F.col("o_totalprice")).alias("digit")
    ).agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return counts.select(
        "digit", "n", (F.col("n").cast("double") / total).alias("share")
    ).orderBy("digit")


# -- IQR outlier fences -----------------------------------------------------


@register(
    "dq_outlier_iqr",
    oracle="""
    WITH fences AS (
        SELECT o_orderpriority,
               quantile_cont(o_totalprice, 0.25) AS p25,
               quantile_cont(o_totalprice, 0.75) AS p75
        FROM orders
        GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           MAX(f.p25) AS p25,
           MAX(f.p75) AS p75,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN o.o_totalprice < f.p25 - 1.5 * (f.p75 - f.p25)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN o.o_totalprice > f.p75 + 1.5 * (f.p75 - f.p25)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM orders o JOIN fences f USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    description="Tukey 1.5-IQR outlier counts per order priority",
)
def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority Tukey fences (p25/p75 ± 1.5·IQR) and outlier counts.

    Pass 1 reduces orders to |priorities| fence rows (exact percentile;
    approx_percentile is the sketch path at 100 TB). Pass 2 re-scans
    orders with the fences BROADCAST — flagging is row-local, the only
    shuffle carries counter partials. The fence arithmetic is a single
    multiply and add/sub per side, IEEE-stable.
    """
    orders = load_table(spark, sf_dir, "orders")
    pct = F.percentile("o_totalprice", F.array(F.lit(0.25), F.lit(0.75)))
    fences = orders.groupBy("o_orderpriority").agg(
        pct[0].alias("p25"), pct[1].alias("p75")
    )
    iqr = F.col("p75") - F.col("p25")
    low, high = F.col("p25") - 1.5 * iqr, F.col("p75") + 1.5 * iqr
    return (
        orders.join(F.broadcast(fences), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.max("p25").alias("p25"),
            F.max("p75").alias("p75"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("o_totalprice") < low, 1).otherwise(0))
            .cast("bigint")
            .alias("n_low"),
            F.sum(F.when(F.col("o_totalprice") > high, 1).otherwise(0))
            .cast("bigint")
            .alias("n_high"),
        )
        .orderBy("o_orderpriority")
    )


# -- median absolute deviation ----------------------------------------------


@register(
    "q_mad_price",
    oracle="""
    WITH med AS (
        SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS p50
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           MAX(m.p50) AS p50,
           quantile_cont(ABS(l.l_extendedprice - m.p50), 0.5) AS mad,
           COUNT(*) AS n_items
    FROM lineitem l JOIN med m USING (l_returnflag)
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    description="median absolute deviation of price per return flag",
)
def q_mad_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD = median(|x − median(x)|) per group — the robust dispersion
    used where stddev is blown up by tails.

    Two exact-percentile passes: medians reduce to |flags| rows and
    broadcast back; the deviation |x−p50| is one IEEE sub + abs, so the
    second median sees bit-identical inputs in both engines. At 100 TB
    both passes switch to approx_percentile and the join stays a
    broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("p50")
    )
    dev = F.abs(F.col("l_extendedprice") - F.col("p50"))
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.max("p50").alias("p50"),
            F.percentile(dev, F.lit(0.5)).alias("mad"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


# -- join-key skew profile --------------------------------------------------

_SKEW_KEYS = (
    ("lineitem", "l_orderkey"),
    ("orders", "o_custkey"),
    ("events", "user_id"),
)


def _skew_sql(table: str, key: str) -> str:
    return f"""
        SELECT '{table}.{key}' AS key_name,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               COUNT(*) AS n_keys,
               MAX(cnt) AS max_key_rows,
               CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS avg_key_rows,
               CAST(MAX(cnt) AS DOUBLE)
                 / (CAST(SUM(cnt) AS DOUBLE) / COUNT(*)) AS skew_ratio
        FROM (SELECT {key}, COUNT(*) AS cnt FROM {table} GROUP BY {key})
    """


@register(
    "dq_join_skew",
    oracle=" UNION ALL ".join(_skew_sql(t, k) for t, k in _SKEW_KEYS)
    + " ORDER BY key_name",
    description="join-key skew profile: max/avg key multiplicity per fact join key",
)
def dq_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key profile for every fact join key — the input to the
    shuffle-strategy decision: a skew_ratio near 1 means plain hash
    partitioning balances; a large ratio says the hottest key's
    partition will straggle and the join needs AQE skew splitting or
    ``salted_join`` (functions/skew.py). Running this as a scheduled
    DQ job is how the 100 TB pipeline notices a power-user or
    mega-order emerging BEFORE it melts a join stage.

    Per key: one partial-aggregated groupBy to key counts, then a
    1-row reduce; the three profiles union to 3 rows. No data leaves
    the executors except counters. The two-level aggregate (count per
    key, then max/avg) is itself the scalable form — a naive
    count-distinct + global max over raw rows would need the same
    shuffle anyway.
    """
    outs = []
    for table, key in _SKEW_KEYS:
        per_key = (
            load_table(spark, sf_dir, table)
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        outs.append(
            per_key.agg(
                F.lit(f"{table}.{key}").alias("key_name"),
                F.sum("cnt").cast("bigint").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                F.max("cnt").alias("max_key_rows"),
                (F.sum("cnt").cast("double") / F.count(F.lit(1))).alias("avg_key_rows"),
                (
                    F.max("cnt").cast("double")
                    / (F.sum("cnt").cast("double") / F.count(F.lit(1)))
                ).alias("skew_ratio"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("key_name")


# -- count-min sketch heavy hitters -----------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOP = 20


def _cms_bucket(key: F.Column, j: int) -> F.Column:
    from lime_etl_spark.functions.text import shingle_int

    return shingle_int(F.concat(key.cast("string"), F.lit(f"#{j}"))) % CMS_WIDTH


def _cms_bucket_sql(expr: str, j: int) -> str:
    from lime_etl_spark.functions.text import shingle_int_sql

    keyed = f"CAST({expr} AS VARCHAR) || '#{j}'"
    return f"{shingle_int_sql(keyed)} % {CMS_WIDTH}"


@register(
    "sketch_heavy_hitters",
    oracle=f"""
    WITH sketch AS (
        SELECT j, bucket, COUNT(*) AS cnt
        FROM (
            SELECT user_id,
                   unnest([{", ".join(str(j) for j in range(CMS_DEPTH))}]) AS j,
                   unnest([{", ".join(_cms_bucket_sql("user_id", j) for j in range(CMS_DEPTH))}]) AS bucket
            FROM events
        )
        GROUP BY j, bucket
    ),
    exact AS (SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY user_id),
    est AS (
        SELECT e.user_id, e.exact_n, MIN(s.cnt) AS est_n
        FROM exact e
        JOIN sketch s
          ON (s.j = 0 AND s.bucket = {_cms_bucket_sql("e.user_id", 0)})
          OR (s.j = 1 AND s.bucket = {_cms_bucket_sql("e.user_id", 1)})
          OR (s.j = 2 AND s.bucket = {_cms_bucket_sql("e.user_id", 2)})
          OR (s.j = 3 AND s.bucket = {_cms_bucket_sql("e.user_id", 3)})
        GROUP BY e.user_id, e.exact_n
    )
    SELECT user_id, CAST(est_n AS BIGINT) AS est_n, exact_n,
           CAST(est_n - exact_n AS BIGINT) AS overestimate
    FROM est
    ORDER BY est_n DESC, user_id
    LIMIT {CMS_TOP}
    """,
    description="count-min sketch heavy hitters: mergeable d×w counters vs exact counts",
)
def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter estimation through a count-min sketch built AS a
    DataFrame: each row votes into d={CMS_DEPTH} hashed buckets of
    width w={CMS_WIDTH}, the sketch is the (j, bucket)→count rollup —
    d·w counters of state however large the key space, mergeable
    across partitions/days by plain addition (the same property HLL
    gives distincts). Estimates are min over the d rows, guaranteed
    ≥ exact (pytest also bounds the overestimate by the εN CMS bound).

    Everything is integer arithmetic on the cross-engine md5 hash
    bridge, so DuckDB replays the sketch EXACTLY — the oracle builds
    the same sketch and must land on identical estimates. At 100 TB
    you keep the sketch, not the keys: this query joins the exact
    counts only to measure the error, a test you run at small scale to
    size (d, w) before trusting the sketch alone at large scale.
    """
    ev = load_table(spark, sf_dir, "events")
    votes = ev.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _cms_bucket(F.col("user_id"), j).alias("bucket")
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("v"),
    ).select("user_id", "v.j", "v.bucket")
    sketch = votes.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = exact.select(
        "user_id",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), _cms_bucket(F.col("user_id"), j).alias("bucket")
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("p"),
    ).select("user_id", "exact_n", "p.j", "p.bucket")
    est = (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").cast("bigint").alias("est_n"))
    )
    return (
        est.select(
            "user_id",
            "est_n",
            "exact_n",
            (F.col("est_n") - F.col("exact_n")).cast("bigint").alias("overestimate"),
        )
        .orderBy(F.desc("est_n"), "user_id")
        .limit(CMS_TOP)
    )


# -- schema snapshot ---------------------------------------------------------


@register(
    "dq_schema_snapshot",
    oracle=None,  # dtype names are engine-specific (bigint vs BIGINT vs
    # INT64) — normalizing them cross-engine would test the normalizer,
    # not the schemas; invariants are pytest-gated instead
    description="schema snapshot: (table, column, dtype, ordinal) for every source table",
)
def dq_schema_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The schema-drift guard: a deterministic inventory of every
    source table's columns, types and positions. Persist one snapshot
    per pipeline release and diff against the live read before running
    anything — an upstream producer renaming a column or widening a
    type is caught at the gate, not three jobs downstream in a cast
    error (the metadata twin of dq_distribution_drift's data check).

    Metadata-only: Spark reads parquet FOOTERS, never data — this runs
    in seconds on a 100 TB lake.
    """
    from lime_etl_spark.sources.readers import TABLES

    rows = []
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        for i, (name, dtype) in enumerate(df.dtypes):
            rows.append((t, name, dtype, i))
    return (
        spark.createDataFrame(
            rows, "table_name string, column_name string, dtype string, ordinal int"
        )
        .orderBy("table_name", "ordinal")
    )


# --- inclusion-dependency (FK) discovery -------------------------------------

# key-shaped columns profiled for inclusion dependencies: the candidate
# space every ERD-reconstruction / FK-discovery pass starts from
INCLUSION_COLS: tuple[tuple[str, str], ...] = (
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("nation", "n_regionkey"),
    ("customer", "c_custkey"),
    ("customer", "c_nationkey"),
    ("supplier", "s_suppkey"),
    ("supplier", "s_nationkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("orders", "o_custkey"),
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
)
INCLUSION_TAU = 0.5  # report pairs where >=50% of child values appear in parent


def _inclusion_oracle() -> str:
    union = " UNION ALL ".join(
        f"SELECT DISTINCT '{t}.{c}' AS col, CAST({c} AS BIGINT) AS v FROM {t}"
        for t, c in INCLUSION_COLS
    )
    return f"""
    WITH vals AS MATERIALIZED ({union}),
    percol AS (SELECT col, COUNT(*) AS n_distinct FROM vals GROUP BY col),
    shared AS (
        SELECT a.col AS child_col, b.col AS parent_col, COUNT(*) AS n_shared
        FROM vals a JOIN vals b ON a.v = b.v AND a.col <> b.col
        GROUP BY a.col, b.col
    )
    SELECT s.child_col, s.parent_col,
           CAST(p.n_distinct AS BIGINT) AS n_child_distinct,
           CAST(s.n_shared AS BIGINT) AS n_shared,
           CAST(s.n_shared AS DOUBLE) / p.n_distinct AS inclusion
    FROM shared s JOIN percol p ON p.col = s.child_col
    WHERE CAST(s.n_shared AS DOUBLE) / p.n_distinct >= {INCLUSION_TAU}
    ORDER BY inclusion DESC, child_col, parent_col
    """


@register(
    "dq_inclusion_dependencies",
    oracle=_inclusion_oracle(),
    description="FK discovery from DATA: inclusion coefficients between key-shaped columns across all tables",
)
def dq_inclusion_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruct the foreign-key graph from the data alone:
    inclusion coefficient |child ∩ parent| / |child| over DISTINCT
    values for every ordered pair of key-shaped columns. A child
    column fully contained in a parent (inclusion 1.0) is an FK
    candidate — the audit that catches both undocumented joins and
    BROKEN ones (an FK whose inclusion drifts below 1.0 after a bad
    load is exactly what dq_referential_integrity alerts on, table by
    table; this discovers the pairs to watch).

    Scale: each column contributes its DISTINCT values once (map-side
    combined); the pair counting groups values first
    (collect_set(col) per value — the set is bounded by |profiled
    columns|, 13 here) and explodes bounded col-pairs, so the shuffle
    is ∝ Σ|distinct values| with a ≤13² fan-out — never the
    value-square of a naive self-join on a hot value. Output is at
    most |cols|² rows. Integer counts + one division: exact."""
    frames = [
        load_table(spark, sf_dir, t)
        .select(
            F.lit(f"{t}.{c}").alias("col"),
            F.col(c).cast("bigint").alias("v"),
        )
        .distinct()
        for t, c in INCLUSION_COLS
    ]
    vals = frames[0]
    for f in frames[1:]:
        vals = vals.unionByName(f)
    vals = vals.persist()
    percol = vals.groupBy("col").agg(F.count(F.lit(1)).alias("n_distinct"))
    sets = vals.groupBy("v").agg(F.collect_set("col").alias("cols"))
    shared = (
        sets.select(F.explode("cols").alias("child_col"), "cols")
        .select("child_col", F.explode("cols").alias("parent_col"))
        .where(F.col("child_col") != F.col("parent_col"))
        .groupBy("child_col", "parent_col")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    inclusion = F.col("n_shared").cast("double") / F.col("n_distinct")
    return (
        shared.join(
            F.broadcast(percol.withColumnRenamed("col", "child_col")), "child_col"
        )
        .select(
            "child_col",
            "parent_col",
            F.col("n_distinct").cast("bigint").alias("n_child_distinct"),
            F.col("n_shared").cast("bigint").alias("n_shared"),
            inclusion.alias("inclusion"),
        )
        .where(inclusion >= INCLUSION_TAU)
        .orderBy(F.desc("inclusion"), "child_col", "parent_col")
    )


# --- functional-dependency discovery -----------------------------------------

# candidate (table, determinant, dependent) triples: known-true FDs
# (keys determine attributes) interleaved with known-false ones, so
# the operator's discrimination is visible in its own output
FD_CANDIDATES: tuple[tuple[str, str, str], ...] = (
    ("region", "r_regionkey", "r_name"),
    ("nation", "n_nationkey", "n_name"),
    ("nation", "n_nationkey", "n_regionkey"),
    ("nation", "n_name", "n_nationkey"),
    ("customer", "c_custkey", "c_nationkey"),
    ("customer", "c_custkey", "c_mktsegment"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("supplier", "s_suppkey", "s_nationkey"),
    ("part", "p_partkey", "p_brand"),
    ("part", "p_brand", "p_type"),
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
)


def _fd_oracle() -> str:
    selects = [
        f"""
        SELECT '{t}' AS table_name, '{a}' AS determinant, '{b}' AS dependent,
               CAST(COUNT(DISTINCT {a}) AS BIGINT) AS n_determinant,
               CAST(COUNT(DISTINCT ROW({a}, {b})) AS BIGINT) AS n_pairs,
               CAST(COUNT(DISTINCT ROW({a}, {b})) - COUNT(DISTINCT {a}) AS BIGINT)
                   AS n_violations,
               COUNT(DISTINCT ROW({a}, {b})) = COUNT(DISTINCT {a}) AS holds
        FROM {t}"""
        for t, a, b in FD_CANDIDATES
    ]
    return " UNION ALL ".join(selects) + " ORDER BY table_name, determinant, dependent"


@register(
    "dq_functional_dependencies",
    oracle=_fd_oracle(),
    description="FD discovery from DATA: determinant->dependent verdicts over candidate column pairs (companion to dq_inclusion_dependencies)",
)
def dq_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discover which functional dependencies actually HOLD in the
    data: A→B holds iff |distinct A| = |distinct (A,B)| — the
    within-table companion to dq_inclusion_dependencies' cross-table
    FK discovery, and the audit that catches a dimension whose
    supposedly key-determined attribute drifted (one key mapping to
    two names after a bad merge shows up as n_violations > 0 here
    before any user hits it).

    Scale: each candidate is two COUNT(DISTINCT) aggregates over one
    projected scan — map-side partial distinct, counters-only shuffle;
    the result is |candidates| rows unioned. Exact integers."""
    out = None
    for t, a, b in FD_CANDIDATES:
        tbl = load_table(spark, sf_dir, t)
        row = tbl.agg(
            F.countDistinct(F.col(a)).alias("n_determinant"),
            F.countDistinct(F.col(a), F.col(b)).alias("n_pairs"),
        ).select(
            F.lit(t).alias("table_name"),
            F.lit(a).alias("determinant"),
            F.lit(b).alias("dependent"),
            F.col("n_determinant").cast("bigint"),
            F.col("n_pairs").cast("bigint"),
            (F.col("n_pairs") - F.col("n_determinant"))
            .cast("bigint")
            .alias("n_violations"),
            (F.col("n_pairs") == F.col("n_determinant")).alias("holds"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("table_name", "determinant", "dependent")
