"""Round-7 operators: change detection, keyword extraction, multiple-
testing-corrected experiment gating, winnowing fingerprints, and
coreset selection, plus the LSH bucket-skew, kNN-hubness and
assignment-interaction audits.

All eight are LLM-data-pipeline / analytics ops the reference has no
analog for (lime-etl is orchestration-only); same engine discipline as
their siblings: deterministic md5-bridge hashing (`shingle_int`),
integer-exact aggregates with one final double division, identical
expression structure in the DuckDB oracle, and total output orders.

- `ev_changepoint_cusum` — integer-exact CUSUM changepoint per event
  type (Page 1954): S_t = Σ(N·x_i − T) over ordered days, changepoint
  at max |S_t|. The level-shift detector a metrics pipeline runs
  before trusting a trend; zero transcendentals, so bit-identical
  under any shuffle layout.
- `txt_rake_scores` — RAKE keyword scoring (Rose et al. 2010):
  stopword-delimited candidate phrases via gaps-and-islands, word
  score = degree/frequency. The classic cheap keyword extractor for
  corpus cards / topic drift monitoring.
- `ev_srm_holm` — Holm step-down multiple-testing gate over the SRM
  experiment grid: with SRM_EXPERIMENTS simultaneous chi-square
  tests, a fixed 95% threshold false-alarms ~1−0.95^m of healthy
  grids; Holm controls FWER. Critical values derived at import time
  by bisection on math.erfc (χ²₁ tail = erfc(√(x/2))) — no p-value
  transcendentals cross the engine boundary, flags are integer
  comparisons.
- `dedup_winnowing_overlap` — winnowing document fingerprints
  (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS algorithm): the
  min k-gram hash per sliding window is position-robust, so shared
  fingerprints localize COPIED SPANS between documents, finer than
  whole-doc minhash and cheaper than all-pairs n-gram Jaccard.
- `samp_kcenter_coreset` — greedy k-center coreset selection
  (Gonzalez 1985 / facility location): the 2-approximation farthest-
  point traversal that training-data curation uses to pick a maximally
  diverse subset; selection trace + coverage radii, replayed exactly
  by an unrolled-round DuckDB oracle.
- `dedup_lsh_bucket_cap_audit` — band-bucket size census pricing the
  posting-list cap: candidate-pair mass per power-of-two bucket-size
  class and the share a 64-doc cap would drop — the skew table read
  before running LSH at scale.
- `emb_hubness_audit` — k-occurrence distribution of the sharded kNN
  graph (Radovanović et al. 2010): hubs and antihubs, the
  retrieval-quality pathology audit run before trusting kNN-label
  methods.
- `ev_ab_interaction_check` — pairwise 2×2 chi-square over every
  experiment pair's arm crossing: catches correlated bucketing (salt
  reuse) before stacked experiments confound each other.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lime_etl_spark.functions.text import shingle_int_spark_sql, shingle_int_sql
from lime_etl_spark.plans.registry import register, track_persist
from lime_etl_spark.sources.readers import load_table, spread

# ---------------------------------------------------------------------------
# ev_changepoint_cusum
# ---------------------------------------------------------------------------


@register(
    "ev_changepoint_cusum",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    tot AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(x) AS BIGINT) AS total_events
        FROM daily GROUP BY event_type
    ),
    cusum AS (
        SELECT d.event_type, d.d, t.n_days, t.total_events,
               SUM(t.n_days * d.x - t.total_events)
                 OVER (PARTITION BY d.event_type ORDER BY d.d) AS s
        FROM daily d JOIN tot t ON t.event_type = d.event_type
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY ABS(s) DESC, d ASC) AS rn
        FROM cusum
    )
    SELECT event_type, n_days, total_events,
           d AS cp_date, CAST(s AS BIGINT) AS s_at_cp,
           CAST(ABS(s) AS DOUBLE) / (n_days * total_events) AS excursion_share
    FROM ranked WHERE rn = 1
    ORDER BY event_type
    """,
    description="integer-exact CUSUM changepoint per event type: max |Σ(N·x−T)| excursion over ordered days — the level-shift detector run before trusting a trend",
)
def ev_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's CUSUM on the daily event-count series, integer-exact:
    scaling each day's deviation by N (S_t = Σ_{i≤t}(N·x_i − T))
    avoids the fractional mean x̄ = T/N entirely, so the whole
    excursion path is int64 and S_N = 0 by construction. The
    changepoint is the day with the maximum |S_t| (earliest day on
    ties); excursion_share normalizes by N·T in ONE final double
    division so magnitudes compare across event types.

    Scale: one daily rollup (map-side combined), a per-type totals
    join (|types| rows, broadcast), one window cumsum partitioned by
    type ordered by day — the same single-shuffle shape as
    ev_rolling_kpis; nothing collects.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("total_events"),
    )
    w = Window.partitionBy("event_type").orderBy("d")
    cusum = (
        daily.join(tot, "event_type")
        .withColumn("s", F.sum(F.col("n_days") * F.col("x") - F.col("total_events")).over(w))
    )
    rn = Window.partitionBy("event_type").orderBy(F.abs(F.col("s")).desc(), F.col("d").asc())
    return (
        cusum.withColumn("rn", F.row_number().over(rn))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            "n_days",
            "total_events",
            F.col("d").alias("cp_date"),
            F.col("s").cast("bigint").alias("s_at_cp"),
            (
                F.abs(F.col("s")).cast("double")
                / (F.col("n_days") * F.col("total_events"))
            ).alias("excursion_share"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# txt_rake_scores
# ---------------------------------------------------------------------------

# Stopword inventory for phrase delimiting — the function-word slice of
# the corpus vocabulary (RAKE's only tunable).
RAKE_STOPWORDS = ("a", "and", "in", "is", "it", "of", "the", "to")
RAKE_TOP_K = 20


def _rake_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in RAKE_STOPWORDS)
    return f"""
    WITH toks AS (
        SELECT doc_id, w.word AS word, w.pos AS pos
        FROM documents,
             LATERAL (SELECT UNNEST(string_split(text, ' ')) AS word,
                             UNNEST(generate_series(1, len(string_split(text, ' ')))) AS pos) w
        WHERE regexp_matches(w.word, '^[a-z]+$')
          AND w.word NOT IN ({stop})
    ),
    runs AS (
        SELECT doc_id, word, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
        FROM toks
    ),
    phrases AS (
        SELECT doc_id, phrase_id, CAST(COUNT(*) AS BIGINT) AS phrase_len
        FROM runs GROUP BY doc_id, phrase_id
    ),
    scored AS (
        SELECT r.word,
               CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(p.phrase_len) AS BIGINT) AS degree
        FROM runs r
        JOIN phrases p ON p.doc_id = r.doc_id AND p.phrase_id = r.phrase_id
        GROUP BY r.word
    )
    SELECT word, freq, degree,
           CAST(degree AS DOUBLE) / freq AS rake_score
    FROM scored
    ORDER BY rake_score DESC, freq DESC, word
    LIMIT {RAKE_TOP_K}
    """


@register(
    "txt_rake_scores",
    oracle=_rake_sql(),
    description="RAKE keyword scores: stopword-delimited phrases via gaps-and-islands, word score = co-occurrence degree / frequency, top-k",
)
def txt_rake_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE (Rapid Automatic Keyword Extraction, Rose et al. 2010)
    over the corpus: candidate phrases are maximal runs of content
    words between stopwords (gaps-and-islands — pos minus the
    content-word row_number is constant within a run), a word's degree
    sums the lengths of every phrase it appears in, and
    score = degree/freq rewards words that live in LONG multi-word
    phrases. The standard cheap keyword extractor for corpus cards and
    topic-drift monitors — and the output every prompt-mining pass
    starts from.

    Scale: tokenize-explode is the corpus-linear stage everything in
    §2G already pays; the phrase rollup and word rollup are map-side
    combined; score is ONE double division of exact int64 counts, and
    the top-k order (score, freq, word) is total so the LIMIT
    boundary is deterministic cross-engine.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        spread(docs.select("doc_id", "text"))
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "word"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "word")
        .where(
            F.col("word").rlike("^[a-z]+$")
            & ~F.col("word").isin(*RAKE_STOPWORDS)
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = toks.withColumn("phrase_id", F.col("pos") - F.row_number().over(w))
    phrases = runs.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("phrase_len")
    )
    scored = (
        runs.join(phrases, ["doc_id", "phrase_id"])
        .groupBy("word")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("phrase_len").cast("bigint").alias("degree"),
        )
    )
    return (
        scored.select(
            "word",
            "freq",
            "degree",
            (F.col("degree").cast("double") / F.col("freq")).alias("rake_score"),
        )
        .orderBy(F.desc("rake_score"), F.desc("freq"), "word")
        .limit(RAKE_TOP_K)
    )


# ---------------------------------------------------------------------------
# ev_srm_holm
# ---------------------------------------------------------------------------


def _chi2_crit_milli(alpha: float) -> int:
    """χ²(1 dof) critical value at tail probability `alpha`, in
    integer milli-units. The 1-dof tail is P(X > x) = erfc(√(x/2)) —
    stdlib-exact — so 200 bisection steps pin the critical value far
    below the milli rounding; no statistics library needed, and the
    resulting integers make the flag predicates engine-portable."""
    lo, hi = 0.0, 200.0
    for _ in range(200):
        mid = (lo + hi) / 2
        if math.erfc(math.sqrt(mid / 2)) > alpha:
            lo = mid
        else:
            hi = mid
    return round(1000 * ((lo + hi) / 2))


HOLM_ALPHA = 0.05


def _holm_crits() -> tuple[int, ...]:
    from lime_etl_spark.operators.insights4 import SRM_EXPERIMENTS

    m = SRM_EXPERIMENTS
    # rank 1 = largest statistic = smallest p: tested at alpha/m
    return tuple(_chi2_crit_milli(HOLM_ALPHA / (m - j + 1)) for j in range(1, m + 1))


def _srm_holm_sql() -> str:
    from lime_etl_spark.operators.insights4 import SRM_EXPERIMENTS

    arm = shingle_int_sql(
        "('exp' || CAST(g.exp_id AS VARCHAR) || ':' || CAST(u.user_id AS VARCHAR))"
    )
    crit_rows = ", ".join(
        f"({j + 1}, {c})" for j, c in enumerate(_holm_crits())
    )
    return f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    g AS (SELECT CAST(UNNEST(generate_series(1, {SRM_EXPERIMENTS})) AS INTEGER)
                 AS exp_id),
    assign AS (
        SELECT g.exp_id, u.user_id, ({arm}) % 2 AS arm
        FROM u CROSS JOIN g
    ),
    counts AS (
        SELECT exp_id,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS users_a,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS users_b
        FROM assign GROUP BY exp_id
    ),
    stats AS (
        SELECT exp_id, users_a, users_b,
               CAST((users_a - users_b) * (users_a - users_b) AS DOUBLE)
                 / (users_a + users_b) AS chi_square,
               ROW_NUMBER() OVER (
                   ORDER BY CAST((users_a - users_b) * (users_a - users_b) AS DOUBLE)
                              / (users_a + users_b) DESC, exp_id ASC
               ) AS holm_rank
        FROM counts
    ),
    crit(holm_rank, crit_milli) AS (VALUES {crit_rows}),
    flagged AS (
        SELECT s.*, c.crit_milli,
               CASE WHEN 1000 * (s.users_a - s.users_b) * (s.users_a - s.users_b)
                         > c.crit_milli * (s.users_a + s.users_b)
                    THEN 1 ELSE 0 END AS raw_reject
        FROM stats s JOIN crit c ON c.holm_rank = s.holm_rank
    )
    SELECT exp_id, users_a, users_b, chi_square,
           CAST(holm_rank AS BIGINT) AS holm_rank,
           CAST(crit_milli AS BIGINT) AS crit_milli,
           (MIN(raw_reject) OVER (ORDER BY holm_rank
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW)) = 1 AS holm_reject
    FROM flagged
    ORDER BY exp_id
    """


@register(
    "ev_srm_holm",
    oracle=_srm_holm_sql(),
    description="Holm step-down FWER gate over the SRM experiment grid: rank-dependent chi-square critical values (bisection-derived, integer milli-units), step-down stop at the first surviving experiment",
)
def ev_srm_holm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple-testing-corrected SRM gating: running SRM_EXPERIMENTS
    chi-square tests at a fixed 95% threshold false-alarms on
    ~1−0.95^m of perfectly healthy grids, so the platform gate is
    Holm's step-down — sort statistics descending, test rank j against
    χ²₁(α/(m−j+1)), and stop at the first acceptance (a later larger
    p can never be rejected). Controls family-wise error at α with no
    independence assumption.

    Engine discipline: critical values are derived ONCE at import by
    bisecting math.erfc (the exact 1-dof χ² tail) into integer
    milli-units, so each rejection is the integer predicate
    1000·(a−b)² > crit·(a+b) — no p-value transcendentals cross the
    engine boundary. The step-down chain is a running MIN over the
    rank order — one window over an |experiments|-row frame.

    Scale: identical shape to ev_srm_check (one distinct-users pass,
    row-local hash explode, |experiments|-row rollup); everything
    after the reduce is m rows.
    """
    from lime_etl_spark.functions.text import shingle_int
    from lime_etl_spark.operators.insights4 import SRM_EXPERIMENTS

    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    exps = F.explode(F.sequence(F.lit(1), F.lit(SRM_EXPERIMENTS))).alias("exp_id")
    assign = users.select("user_id", exps).select(
        "exp_id",
        (
            shingle_int(
                F.concat(
                    F.lit("exp"),
                    F.col("exp_id").cast("string"),
                    F.lit(":"),
                    F.col("user_id").cast("string"),
                )
            )
            % 2
        ).alias("arm"),
    )
    counts = assign.groupBy("exp_id").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("users_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("users_b"),
    )
    d2 = (F.col("users_a") - F.col("users_b")) * (F.col("users_a") - F.col("users_b"))
    chi = d2.cast("double") / (F.col("users_a") + F.col("users_b"))
    stats = counts.select(
        "exp_id", "users_a", "users_b", chi.alias("chi_square")
    ).withColumn(
        "holm_rank",
        F.row_number().over(
            Window.orderBy(F.desc("chi_square"), F.asc("exp_id"))
        ).cast("bigint"),
    )
    crit = F.create_map(
        *[x for j, c in enumerate(_holm_crits()) for x in (F.lit(j + 1), F.lit(c))]
    )
    flagged = stats.withColumn(
        "crit_milli", crit[F.col("holm_rank").cast("int")].cast("bigint")
    ).withColumn(
        "raw_reject",
        F.when(
            F.lit(1000) * d2 > F.col("crit_milli") * (F.col("users_a") + F.col("users_b")),
            1,
        ).otherwise(0),
    )
    chain = (
        Window.orderBy("holm_rank").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        flagged.withColumn("holm_reject", F.min("raw_reject").over(chain) == 1)
        .select(
            "exp_id", "users_a", "users_b", "chi_square",
            "holm_rank", "crit_milli", "holm_reject",
        )
        .orderBy("exp_id")
    )


# ---------------------------------------------------------------------------
# dedup_winnowing_overlap
# ---------------------------------------------------------------------------

WINNOW_K = 6  # character k-gram length
WINNOW_W = 8  # winnowing window (positions per window)
WINNOW_DF_CUT = 64  # drop fingerprints appearing in more docs (boilerplate)
WINNOW_TOP_K = 20


def _winnow_sql() -> str:
    h = shingle_int_sql(f"substr(text, CAST(p AS INTEGER), {WINNOW_K})")
    return f"""
    WITH pos AS (
        SELECT doc_id, text,
               UNNEST(generate_series(1, length(text) - {WINNOW_K - 1})) AS p
        FROM documents WHERE length(text) >= {WINNOW_K}
    ),
    h AS (SELECT doc_id, p, {h} AS h FROM pos),
    fp AS (
        SELECT DISTINCT doc_id,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS BETWEEN {WINNOW_W - 1} PRECEDING
                                     AND CURRENT ROW) AS fp
        FROM h
    ),
    df AS (SELECT fp, COUNT(*) AS df FROM fp GROUP BY fp),
    keep AS (
        SELECT f.doc_id, f.fp FROM fp f
        JOIN df ON df.fp = f.fp WHERE df.df <= {WINNOW_DF_CUT}
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp FROM keep GROUP BY doc_id),
    shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS shared_fp
        FROM keep a JOIN keep b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT s.doc_a, s.doc_b, s.shared_fp,
           sa.n_fp AS n_fp_a, sb.n_fp AS n_fp_b,
           CAST(s.shared_fp AS DOUBLE)
             / (sa.n_fp + sb.n_fp - s.shared_fp) AS fp_jaccard
    FROM shared s
    JOIN sizes sa ON sa.doc_id = s.doc_a
    JOIN sizes sb ON sb.doc_id = s.doc_b
    ORDER BY s.shared_fp DESC, s.doc_a, s.doc_b
    LIMIT {WINNOW_TOP_K}
    """


@register(
    "dedup_winnowing_overlap",
    oracle=_winnow_sql(),
    description="winnowing (MOSS) fingerprint overlap: window-min k-gram hashes per doc, df-cut boilerplate filter, top pairs by shared fingerprints",
)
def dedup_winnowing_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS plagiarism-detector algorithm): hash every
    character k-gram, keep the MINIMUM hash of each w-position sliding
    window (robust winnowing: distinct window-min VALUES), and compare
    documents by shared fingerprints. The guarantee is positional
    robustness — any shared substring of length ≥ w+k−1 contributes at
    least one common fingerprint — so this localizes COPIED SPANS,
    sitting between whole-doc minhash (too coarse) and all-pairs
    n-gram Jaccard (too expensive). Fingerprints appearing in more
    than WINNOW_DF_CUT docs are dropped before pairing — the df-cut
    that keeps corpus-wide boilerplate from quadratic-joining, same
    hazard class as the LSH band-bucket cut.

    Scale: per-char hashing is the corpus-linear cost dedup_cdc_chunks
    already pays; the window-min is ONE pass per doc partition; the
    pair join's fan-out is bounded by the df-cut (≤ C(64,2) pairs per
    fingerprint). Fingerprint selection is a pure function of content
    (no ties to break: equal hash values ARE the same fingerprint
    value), so Spark and the oracle pick identical sets.
    """
    k, w = WINNOW_K, WINNOW_W
    hashes = F.expr(
        f"transform(sequence(1, length(text) - {k - 1}), "
        f"i -> {shingle_int_spark_sql(f'substring(text, i, {k})')})"
    )
    docs = load_table(spark, sf_dir, "documents")
    h = (
        spread(docs.select("doc_id", "text"))
        .where(F.length("text") >= k)
        .select("doc_id", F.posexplode(hashes).alias("p0", "h"))
    )
    win = Window.partitionBy("doc_id").orderBy("p0").rowsBetween(-(w - 1), 0)
    fp = h.select("doc_id", F.min("h").over(win).alias("fp")).distinct()
    df_cut = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    keep = fp.join(df_cut.where(F.col("df") <= WINNOW_DF_CUT).select("fp"), "fp").persist()
    keep.count()
    sizes = keep.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_fp"))
    a = keep.select(F.col("doc_id").alias("doc_a"), "fp")
    b = keep.select(F.col("doc_id").alias("doc_b"), "fp")
    shared = (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fp"))
    )
    out = (
        shared.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_fp_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_fp_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_fp",
            "n_fp_a",
            "n_fp_b",
            (
                F.col("shared_fp").cast("double")
                / (F.col("n_fp_a") + F.col("n_fp_b") - F.col("shared_fp"))
            ).alias("fp_jaccard"),
        )
        .orderBy(F.desc("shared_fp"), "doc_a", "doc_b")
        .limit(WINNOW_TOP_K)
    )
    track_persist(keep)
    return out


# ---------------------------------------------------------------------------
# samp_kcenter_coreset
# ---------------------------------------------------------------------------

KCENTER_K = 4


def _l2sq_sql(a: str, b: str) -> str:
    """Squared L2 as three sequential dot products — the exact
    expression structure the Spark side mirrors (aa − 2·ab + bb), so
    the doubles agree bitwise."""
    return (
        f"(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
        f" + list_dot_product({b}, {b}))"
    )


def _kcenter_sql() -> str:
    d = _l2sq_sql("p.v", "c.v")
    rounds = []
    for k in range(2, KCENTER_K + 1):
        rounds.append(f"""
    c{k} AS (SELECT vec_id, v, mind FROM d{k - 1} ORDER BY mind DESC, vec_id LIMIT 1),
    d{k} AS MATERIALIZED (
        SELECT p.vec_id, p.v, LEAST(p.mind, {d}) AS mind
        FROM d{k - 1} p CROSS JOIN c{k} c
    )""")
    legs = [
        f"SELECT 1 AS k, (SELECT vec_id FROM c1) AS center_id, 0.0 AS sel_dist_sq,"
        f" (SELECT MAX(mind) FROM d1) AS coverage_after_sq"
    ]
    for k in range(2, KCENTER_K + 1):
        legs.append(
            f"SELECT {k} AS k, (SELECT vec_id FROM c{k}) AS center_id,"
            f" (SELECT mind FROM c{k}) AS sel_dist_sq,"
            f" (SELECT MAX(mind) FROM d{k}) AS coverage_after_sq"
        )
    union = "\n    UNION ALL ".join(legs)
    return f"""
    WITH pts AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    c1 AS (SELECT vec_id, v FROM pts ORDER BY vec_id LIMIT 1),
    d1 AS MATERIALIZED (
        SELECT p.vec_id, p.v, {d} AS mind FROM pts p CROSS JOIN c1 c
    ),
    {",".join(rounds)}
    SELECT CAST(k AS INTEGER) AS k, center_id, sel_dist_sq, coverage_after_sq
    FROM ({union}) ORDER BY k
    """


@register(
    "samp_kcenter_coreset",
    oracle=_kcenter_sql(),
    description="greedy k-center coreset selection (farthest-point traversal): selection trace + coverage radius per round, unrolled-round DuckDB replay",
)
def samp_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (Gonzalez 1985): start from the lowest vec_id,
    then repeatedly add the point FARTHEST from its nearest chosen
    center — the classic 2-approximation to the k-center objective and
    the diversity-first selection rule training-data curation uses to
    build coresets (pick the k docs/embeddings that best COVER the
    space, the opposite bias of head-heavy sampling). Output row per
    round: chosen center, its selection distance (the coverage radius
    BEFORE it joined — the greedy invariant coverage_after(k) =
    sel_dist(k+1) is pytest-pinned), and the max-min coverage radius
    after.

    Engine discipline: squared L2 is evaluated as aa − 2·ab + bb with
    each dot product a SEQUENTIAL left-to-right sum (F.aggregate over
    zip_with ≡ DuckDB list_dot_product), so every distance is the
    same double bit-for-bit and the argmax (dist DESC, vec_id ASC) is
    a total order both engines resolve identically. The oracle unrolls
    the K rounds as MATERIALIZED CTEs.

    Scale: K linear passes over the points — the textbook distributed
    farthest-point traversal; the running min-distance column makes
    each pass O(n·dim) with a 1-row broadcast center, and the rounds
    table localCheckpoints eagerly (consumed by argmax + next round +
    coverage agg).
    """
    from lime_etl_spark.operators.similarity import dot

    def l2sq(v, cv):
        return dot(v, v) - F.lit(2) * dot(v, cv) + dot(cv, cv)

    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    c1 = pts.orderBy("vec_id").limit(1)
    d = (
        pts.crossJoin(F.broadcast(c1.select(F.col("v").alias("cv"))))
        .select("vec_id", "v", l2sq(F.col("v"), F.col("cv")).alias("mind"))
        .localCheckpoint()
    )
    c1_row = c1.select("vec_id").collect()[0]
    rows = [(1, int(c1_row.vec_id), 0.0)]
    coverage = []
    for k in range(2, KCENTER_K + 1):
        ck = d.orderBy(F.desc("mind"), F.asc("vec_id")).limit(1).collect()[0]
        rows.append((k, int(ck.vec_id), float(ck.mind)))
        # greedy invariant: the point selected at round k sits at the
        # max-min distance of the first k-1 centers, so its selection
        # distance IS coverage_after(k-1) — no extra aggregation pass
        coverage.append(float(ck.mind))
        cv = F.broadcast(
            d.where(F.col("vec_id") == int(ck.vec_id)).select(F.col("v").alias("cv"))
        )
        d = (
            d.crossJoin(cv)
            .select(
                "vec_id",
                "v",
                F.least(F.col("mind"), l2sq(F.col("v"), F.col("cv"))).alias("mind"),
            )
            .localCheckpoint()
        )
    # only the FINAL coverage radius needs its own pass
    coverage.append(float(d.agg(F.max("mind")).collect()[0][0]))
    out = spark.createDataFrame(
        [
            (k, cid, sel, cov)
            for (k, cid, sel), cov in zip(rows, coverage)
        ],
        "k int, center_id bigint, sel_dist_sq double, coverage_after_sq double",
    )
    return out.orderBy("k")


# ---------------------------------------------------------------------------
# dedup_lsh_bucket_cap_audit
# ---------------------------------------------------------------------------

LSH_BUCKET_CAP = 64  # the posting-list cap whose cost this audit prices


def _lsh_bucket_audit_sql() -> str:
    from lime_etl_spark.operators.dedup import (
        _SHINGLES_SQL,
        MERSENNE_P,
        MINHASH_PERMS,
        N_BANDS,
    )

    mins = ", ".join(
        f"MIN((x * {a} + {b}) % {MERSENNE_P}) AS mh_{j}"
        for j, (a, b) in enumerate(MINHASH_PERMS)
    )
    band_sigs = " UNION ALL ".join(
        "SELECT doc_id, {band} AS band, CAST(mh_{c0} AS VARCHAR) || ',' || "
        "CAST(mh_{c1} AS VARCHAR) || ',' || CAST(mh_{c2} AS VARCHAR) || ',' || "
        "CAST(mh_{c3} AS VARCHAR) AS sig FROM sigs".format(
            band=band, c0=band * 4, c1=band * 4 + 1, c2=band * 4 + 2, c3=band * 4 + 3
        )
        for band in range(N_BANDS)
    )
    cap = LSH_BUCKET_CAP
    return f"""
    WITH sh AS ({_SHINGLES_SQL}),
    sigs AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
    buckets AS ({band_sigs}),
    sizes AS (
        SELECT band, sig, CAST(COUNT(*) AS BIGINT) AS n FROM buckets
        GROUP BY band, sig
    ),
    classed AS (
        SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS size_class,
               n, n * (n - 1) // 2 AS pairs,
               LEAST(n, {cap}) * (LEAST(n, {cap}) - 1) // 2 AS capped
        FROM sizes
    )
    SELECT size_class,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(n) AS BIGINT) AS n_bucket_rows,
           CAST(SUM(pairs) AS BIGINT) AS cand_pairs,
           CAST(SUM(capped) AS BIGINT) AS capped_pairs,
           CASE WHEN SUM(pairs) > 0
                THEN CAST(SUM(pairs) - SUM(capped) AS DOUBLE) / SUM(pairs)
                ELSE 0.0 END AS dropped_share
    FROM classed GROUP BY size_class ORDER BY size_class
    """


@register(
    "dedup_lsh_bucket_cap_audit",
    oracle=_lsh_bucket_audit_sql(),
    description="LSH band-bucket size census: candidate-pair mass per power-of-two bucket-size class and the share a 64-doc posting cap would drop — the skew table read before running LSH at scale",
)
def dedup_lsh_bucket_cap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucket-skew planning table for the shipped MinHash-LSH: per
    power-of-two bucket-size class (size_class = ⌊log2 n⌋, computed as
    length(bin(n))−1 — pure integer on both engines), how many band
    buckets land there, how many candidate pairs C(n,2) they generate,
    and what share of that pair mass a LSH_BUCKET_CAP posting-list cap
    would sacrifice. A healthy near-dup corpus concentrates pair mass
    in small buckets (dropped_share 0 everywhere); a boilerplate
    template shows up as one giant bucket whose C(n,2) dwarfs the rest
    — THE number that says whether the candidate join needs the cap /
    df-cut before it explodes (the same hazard family the wedge-join
    degree cap and the winnowing df-cut mitigate, here priced
    explicitly instead of assumed).

    Scale: the census is bucket-grain (groupBy (band, sig) count) —
    strictly cheaper than the candidate join it audits; everything
    after is |classes| rows. dropped_share is one guarded double
    division of exact int64 sums.
    """
    from lime_etl_spark.operators.dedup import (
        band_buckets,
        doc_shingles,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    sizes = (
        band_buckets(minhash_signatures(doc_shingles(docs)))
        .groupBy("band", "sig")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    classed = sizes.select(
        (F.length(F.bin("n")) - 1).cast("bigint").alias("size_class"),
        "n",
        # n(n−1) is even, so the halving is exact; `div` keeps the whole
        # expression int64 end-to-end (Spark's `/` on bigints is DOUBLE
        # division, which loses exactness past ~9.5e7-row buckets — the
        # giant-bucket regime this audit exists to price; r7 ADVICE)
        F.expr("n * (n - 1) div 2").cast("bigint").alias("pairs"),
        F.expr(
            f"least(n, {LSH_BUCKET_CAP}) * (least(n, {LSH_BUCKET_CAP}) - 1) div 2"
        ).cast("bigint").alias("capped"),
    )
    return (
        classed.groupBy("size_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum("n").cast("bigint").alias("n_bucket_rows"),
            F.sum("pairs").cast("bigint").alias("cand_pairs"),
            F.sum("capped").cast("bigint").alias("capped_pairs"),
        )
        .select(
            "size_class",
            "n_buckets",
            "n_bucket_rows",
            "cand_pairs",
            "capped_pairs",
            F.when(
                F.col("cand_pairs") > 0,
                (F.col("cand_pairs") - F.col("capped_pairs")).cast("double")
                / F.col("cand_pairs"),
            )
            .otherwise(F.lit(0.0))
            .alias("dropped_share"),
        )
        .orderBy("size_class")
    )


# ---------------------------------------------------------------------------
# emb_hubness_audit
# ---------------------------------------------------------------------------


def _hubness_sql() -> str:
    from lime_etl_spark.operators.insights2 import MUTUAL_K, MUTUAL_MOD_SQL

    return f"""
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
        SELECT va, vb FROM (
            SELECT va, vb,
                   ROW_NUMBER() OVER (PARTITION BY va
                                      ORDER BY cosine DESC, vb) AS rnk
            FROM scored
        ) WHERE rnk <= {MUTUAL_K}
    ), occ AS (
        SELECT s.vec_id, CAST(COALESCE(k.n, 0) AS BIGINT) AS k_occurrence
        FROM s LEFT JOIN (
            SELECT vb, COUNT(*) AS n FROM knn GROUP BY vb
        ) k ON k.vb = s.vec_id
    ), total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_shard FROM s)
    SELECT o.k_occurrence,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(COUNT(*) AS DOUBLE) / t.n_shard AS share
    FROM occ o CROSS JOIN total t
    GROUP BY o.k_occurrence, t.n_shard
    ORDER BY o.k_occurrence
    """


@register(
    "emb_hubness_audit",
    oracle=_hubness_sql(),
    description="k-occurrence (hubness) distribution of the kNN graph: how often each point appears in others' top-k — the retrieval-quality pathology audit (Radovanović et al. 2010)",
)
def emb_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit of the same sharded kNN graph ann_mutual_knn
    builds: N_k(x) = how many points rank x inside their top-k. In
    high-dimensional spaces the N_k distribution skews right — a few
    hubs appear in everyone's neighbor lists while antihubs
    (k_occurrence 0) appear in nobody's — which silently degrades
    retrieval relevance and poisons kNN-label methods
    (Radovanović et al., JMLR 2010). The histogram row per
    k-occurrence value (zero INCLUDED via the shard-spine left join —
    antihub count is the headline number) is the audit a pipeline
    reads before trusting emb_knn_label_consistency or shipping the
    mutual-kNN graph downstream.

    Scale: same one-windowed-top-k-over-the-shard shape as
    ann_mutual_knn (the mod-shard is the 100 TB blocking unit); the
    in-degree rollup touches only k·|shard| surviving edges; share is
    one double division by the 1-row broadcast shard count.
    """
    from lime_etl_spark.operators.insights2 import MUTUAL_K, mutual_mod
    from lime_etl_spark.operators.similarity import knn_edges, knn_shard

    emb = load_table(spark, sf_dir, "embeddings")
    s = knn_shard(emb, mutual_mod(emb)).persist()
    s.count()
    knn = knn_edges(s, MUTUAL_K).select("va", "vb")
    indeg = knn.groupBy("vb").agg(F.count(F.lit(1)).alias("n"))
    occ = (
        s.select("vec_id")
        .join(indeg, s["vec_id"] == indeg["vb"], "left")
        .select(F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("k_occurrence"))
    )
    total = s.select(F.count(F.lit(1)).cast("bigint").alias("n_shard"))
    out = (
        occ.groupBy("k_occurrence")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
        .crossJoin(F.broadcast(total))
        .select(
            "k_occurrence",
            "n_points",
            (F.col("n_points").cast("double") / F.col("n_shard")).alias("share"),
        )
        .orderBy("k_occurrence")
    )
    track_persist(s)
    return out


# ---------------------------------------------------------------------------
# ev_ab_interaction_check
# ---------------------------------------------------------------------------


def _interaction_sql() -> str:
    from lime_etl_spark.operators.insights4 import SRM_EXPERIMENTS

    def arm(e: str) -> str:
        return shingle_int_sql(
            f"('exp' || CAST({e} AS VARCHAR) || ':' || CAST(u.user_id AS VARCHAR))"
        )

    pair_rows = ", ".join(
        f"({i}, {j})"
        for i in range(1, SRM_EXPERIMENTS + 1)
        for j in range(i + 1, SRM_EXPERIMENTS + 1)
    )
    return f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    g(exp_a, exp_b) AS (VALUES {pair_rows}),
    assign AS (
        SELECT g.exp_a, g.exp_b,
               ({arm("g.exp_a")}) % 2 AS ai,
               ({arm("g.exp_b")}) % 2 AS aj
        FROM u CROSS JOIN g
    ),
    cells AS (
        SELECT exp_a, exp_b,
               CAST(SUM(CASE WHEN ai = 0 AND aj = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
               CAST(SUM(CASE WHEN ai = 0 AND aj = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
               CAST(SUM(CASE WHEN ai = 1 AND aj = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
               CAST(SUM(CASE WHEN ai = 1 AND aj = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11
        FROM assign GROUP BY exp_a, exp_b
    ),
    stats AS (
        SELECT exp_a, exp_b, n00, n01, n10, n11,
               CAST(n00 + n01 + n10 + n11 AS DOUBLE)
                 * (n00 * n11 - n01 * n10) * (n00 * n11 - n01 * n10) AS num,
               CAST(n00 + n01 AS DOUBLE) * (n10 + n11)
                 * (n00 + n10) * (n01 + n11) AS den
        FROM cells
    )
    SELECT CAST(exp_a AS INTEGER) AS exp_a, CAST(exp_b AS INTEGER) AS exp_b,
           n00, n01, n10, n11,
           CASE WHEN den > 0 THEN num / den ELSE 0.0 END AS chi_square,
           (CASE WHEN den > 0 THEN num / den ELSE 0.0 END > 3.841) AS interaction_flag
    FROM stats
    ORDER BY exp_a, exp_b
    """


@register(
    "ev_ab_interaction_check",
    oracle=_interaction_sql(),
    description="pairwise assignment-independence audit over the experiment grid: 2x2 chi-square of every experiment pair's arm crossing — catches correlated bucketing (salt reuse) before stacked experiments bias each other",
)
def ev_ab_interaction_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assignment-interaction audit: for every pair of experiments in
    the grid, the 2x2 contingency of users' (arm_i, arm_j) crossing
    and its chi-square N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)). Healthy
    platforms hash each experiment with its own salt so all pairs are
    independent (flags false); a reused salt makes two experiments'
    arms identical and their readouts confounded — this table is how
    that's caught BEFORE stacked experiments bias each other. The
    complement of ev_srm_check (marginal health) and ev_srm_holm
    (family-wise gating): this one audits the JOINT distribution.

    Engine discipline: cells are exact int64; ad−bc and its square
    stay int64 at audit scale; numerator and denominator are then
    built in DOUBLE with identical left-to-right structure on both
    engines, so chi_square is the same double and the 3.841 flag
    comparison resolves identically; a zeroed 2x2 marginal (degenerate
    all-one-arm experiment) pins chi_square to 0.0 / flag false via the
    same CASE guard on both engines instead of NULL-vs-inf divergence. Scale: one distinct-users pass
    exploded by the C(m,2) pair grid (row-local hashes, no assignment
    table), then a C(m,2)-row rollup — nothing data-proportional
    collects.
    """
    from lime_etl_spark.functions.text import shingle_int
    from lime_etl_spark.operators.insights4 import SRM_EXPERIMENTS

    def arm(e) -> F.Column:
        return shingle_int(
            F.concat(F.lit("exp"), e.cast("string"), F.lit(":"), F.col("user_id").cast("string"))
        ) % 2

    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    # hash each experiment's arm ONCE per user (m md5s), then explode
    # the C(m,2) index pairs over the arms array — Catalyst does not
    # CSE across exploded rows, so hashing inside the pair rows would
    # cost m·(m−1) md5s per user instead of m
    arms = F.array(*[arm(F.lit(i)) for i in range(1, SRM_EXPERIMENTS + 1)])
    pairs = F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("exp_a"), F.lit(j).alias("exp_b"))
                for i in range(1, SRM_EXPERIMENTS + 1)
                for j in range(i + 1, SRM_EXPERIMENTS + 1)
            ]
        )
    ).alias("p")
    assign = users.select(arms.alias("arms"), pairs).select(
        F.col("p.exp_a").alias("exp_a"),
        F.col("p.exp_b").alias("exp_b"),
        F.element_at("arms", F.col("p.exp_a")).alias("ai"),
        F.element_at("arms", F.col("p.exp_b")).alias("aj"),
    )
    cells = assign.groupBy("exp_a", "exp_b").agg(
        *[
            F.sum(F.when((F.col("ai") == i) & (F.col("aj") == j), 1).otherwise(0))
            .cast("bigint")
            .alias(f"n{i}{j}")
            for i in (0, 1)
            for j in (0, 1)
        ]
    )
    n = F.col("n00") + F.col("n01") + F.col("n10") + F.col("n11")
    det = F.col("n00") * F.col("n11") - F.col("n01") * F.col("n10")
    num = n.cast("double") * det * det
    den = (
        (F.col("n00") + F.col("n01")).cast("double")
        * (F.col("n10") + F.col("n11"))
        * (F.col("n00") + F.col("n10"))
        * (F.col("n01") + F.col("n11"))
    )
    # degenerate-marginal guard (r7 ADVICE): all users in one arm zeroes
    # a 2x2 marginal; pin the undefined chi-square to 0.0 / flag false on
    # BOTH engines instead of NULL-vs-inf divergence
    chi = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    return cells.select(
        F.col("exp_a").cast("int").alias("exp_a"),
        F.col("exp_b").cast("int").alias("exp_b"),
        "n00",
        "n01",
        "n10",
        "n11",
        chi.alias("chi_square"),
        (chi > 3.841).alias("interaction_flag"),
    ).orderBy("exp_a", "exp_b")
