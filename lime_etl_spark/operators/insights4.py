"""Round-6 operators: embedding-compression quality curves, chunk-level
dedup, and experimentation auditing.

All seven are LLM-data-pipeline ops the reference has no analog for
(lime-etl is orchestration-only); they extend the §2F/§2E/§2D families
with the same engine discipline as their siblings: deterministic
md5-bridge hashing (`shingle_int`), integer-exact aggregates with one
final double division, and a full DuckDB oracle per query.

- `emb_matryoshka_recall` — prefix-dimension truncation curve: the
  retrieval recall a Matryoshka-style embedding keeps at 1/8, 1/4 and
  1/2 of the stored dimensions. THE sizing table for "can we ship the
  64-dim index at 16 dims": cuts index bytes 4x if recall holds.
- `emb_binary_sign_recall` — 1-bit sign quantization: Hamming-space
  top-k recall vs full-precision cosine, per k. The most aggressive
  embedding compression (64 dims -> 8 bytes); pairs with the int8/int4
  error audits (`emb_quantize_error`, `emb_int4_vs_int8_error`).
- `dedup_cdc_chunks` — content-defined chunking: boundaries where a
  rolling window hash hits a mask, so chunk edges survive insertions
  (unlike fixed-size blocks). Chunk-level duplicate mass per source =
  the storage/training dedup win finer than whole-doc dedup_exact and
  cheaper than shingle Jaccard.
- `ev_srm_check` — sample-ratio-mismatch audit over simulated
  experiment assignments: chi-square of observed arm sizes vs 50/50,
  flagged at the 95% critical value. The gate every experimentation
  platform runs before trusting a readout; extends
  `ev_ab_assignment_aa` from one assignment to a grid of experiments.
- `dedup_minhash_estimate_error` — calibration of the minhash Jaccard
  estimator on the pairs the shipped LSH actually surfaces: estimated
  vs exact Jaccard on a shared 1e-6 integer grid, by agreement count.
- `ev_lift_bootstrap_ci` — A/B revenue-per-user lift with its
  Poisson-bootstrap replicate distribution (user-level resampling via
  the deterministic md5-bridge Poisson(1) weights shared with
  samp_poisson_bootstrap): the uncertainty band in 16 rows from one
  fact pass.
- `ev_shapley_attribution` — data-driven Shapley channel attribution
  over user channel-presence coalitions: exact integer game values on
  a 1e-9 grid, weights as integer numerators over C!, and the
  efficiency identity Σcredits = v(full) − v(∅) pytest-pinned exactly.

Scale notes are per-operator in the docstrings; none of them collects
anything data-proportional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lime_etl_spark.functions.text import (
    shingle_int,
    shingle_int_spark_sql,
    shingle_int_sql,
)
from lime_etl_spark.plans.registry import register, track_persist
from lime_etl_spark.sources.readers import load_table, spread

# ---------------------------------------------------------------------------
# emb_matryoshka_recall
# ---------------------------------------------------------------------------

MATRYOSHKA_DIMS = (8, 16, 32, 64)  # 64 = full dim -> recall 1.0 anchor row
_MK = 10  # recall@k


def _cos_slice_sql(d: int) -> str:
    qa, wa = f"(q.v[1:{d}])", f"(w.v[1:{d}])"
    return (
        f"list_dot_product({qa}, {wa})"
        f" / (sqrt(list_dot_product({qa}, {qa}))"
        f" * sqrt(list_dot_product({wa}, {wa})))"
    )


def _matryoshka_sql() -> str:
    from lime_etl_spark.operators.similarity import QUERY_MOD_SQL

    legs = "\n        UNION ALL\n".join(
        f"""
        SELECT {d} AS prefix_dim, q, n FROM (
            SELECT q.vec_id AS q, w.vec_id AS n,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_cos_slice_sql(d)} DESC, w.vec_id
                   ) AS r
            FROM e q JOIN e w ON q.vec_id <> w.vec_id
            WHERE q.vec_id % {QUERY_MOD_SQL} = 0
        ) WHERE r <= {_MK}"""
        for d in MATRYOSHKA_DIMS
    )
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    legs AS ({legs}),
    t AS (SELECT q, n FROM legs WHERE prefix_dim = {max(MATRYOSHKA_DIMS)}),
    nq AS (SELECT COUNT(DISTINCT q) AS n_q FROM t)
    SELECT l.prefix_dim,
           CAST((SELECT n_q FROM nq) AS BIGINT) AS n_queries,
           CAST(COUNT(t.q) AS DOUBLE)
             / ((SELECT n_q FROM nq) * {_MK}) AS recall_at_k
    FROM legs l LEFT JOIN t ON t.q = l.q AND t.n = l.n
    GROUP BY l.prefix_dim
    ORDER BY l.prefix_dim
    """


@register(
    "emb_matryoshka_recall",
    oracle=_matryoshka_sql(),
    description="prefix-dimension truncation curve: top-k retrieval recall at 1/8..full of the stored dims (Matryoshka sizing table)",
)
def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of truncated-dimension cosine retrieval against the
    full-dimension top-k, one row per prefix length. Matryoshka-style
    embeddings promise that the first d dims carry most of the
    geometry; this measures exactly how much retrieval that promise
    buys at each truncation on THIS corpus.

    Spark shape: all |dims| retrieval legs are tagged and unioned
    under ONE window + one groupBy — a single job over |Q|x|N| pairs
    regardless of how many truncations are probed (the same
    union-legs discipline as ann_tuning_curve). The query shard is
    broadcast; candidates never shuffle. Recall joins happen on the
    topk frame (|dims| x |Q| x k rows), not the pair explosion.
    """
    from lime_etl_spark.operators.similarity import dot, query_mod

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    full = max(MATRYOSHKA_DIMS)
    qmod = query_mod(emb)  # one count job, shared by every leg

    def leg(d: int) -> DataFrame:
        q = emb.where(F.col("vec_id") % qmod == 0).select(
            F.col("vec_id").alias("qid"), F.slice("v", 1, d).alias("e")
        )
        w = emb.select(F.col("vec_id").alias("nid"), F.slice("v", 1, d).alias("we"))
        cos = dot(F.col("e"), F.col("we")) / (
            F.sqrt(dot(F.col("e"), F.col("e")))
            * F.sqrt(dot(F.col("we"), F.col("we")))
        )
        return (
            F.broadcast(q)
            .crossJoin(w)
            .where(F.col("qid") != F.col("nid"))
            .select(
                F.lit(d).alias("prefix_dim"),
                F.col("qid").alias("q"),
                F.col("nid").alias("n"),
                cos.alias("cosine"),
            )
        )

    pairs = leg(MATRYOSHKA_DIMS[0])
    for d in MATRYOSHKA_DIMS[1:]:
        pairs = pairs.unionByName(leg(d))
    w = Window.partitionBy("prefix_dim", "q").orderBy(F.desc("cosine"), "n")
    topk = (
        pairs.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= _MK)
        .select("prefix_dim", "q", "n")
        .persist()
    )
    track_persist(topk)
    # materialize BEFORE the self-referencing join below: the truth
    # broadcast and the main scan are sibling stages of one job and
    # would otherwise race to compute the pair explosion twice
    topk.count()
    truth = topk.where(F.col("prefix_dim") == full).select(
        "q", "n", F.lit(1).alias("hit")
    )
    out = (
        topk.join(F.broadcast(truth), ["q", "n"], "left")
        .groupBy("prefix_dim")
        .agg(
            F.countDistinct("q").cast("bigint").alias("n_queries"),
            (
                F.sum(F.coalesce("hit", F.lit(0))).cast("double")
                / (F.countDistinct("q") * _MK)
            ).alias("recall_at_k"),
        )
        .orderBy("prefix_dim")
    )
    return out


# ---------------------------------------------------------------------------
# emb_binary_sign_recall
# ---------------------------------------------------------------------------

_BQ_KS = (1, 5, 10)


def _sign_bits_spark(col: str, lo: int, hi: int) -> F.Column:
    """Bits lo..hi (1-based dims) of the sign signature as one BIGINT."""
    return F.expr(
        f"aggregate(sequence({lo}, {hi}), CAST(0 AS BIGINT), "
        f"(acc, i) -> acc + IF(element_at({col}, i) > 0D, "
        f"shiftleft(CAST(1 AS BIGINT), i - {lo}), CAST(0 AS BIGINT)))"
    )


def _sign_bits_sql(col: str, lo: int, hi: int) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series({lo}, {hi}), "
        f"i -> CASE WHEN {col}[i] > 0 THEN (CAST(1 AS BIGINT) << (i - {lo})) "
        f"ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
    )


def _binary_sign_sql() -> str:
    from lime_etl_spark.operators.similarity import QUERY_MOD_SQL

    cos = (
        "list_dot_product(q.v, w.v)"
        " / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(w.v, w.v)))"
    )
    ham = "bit_count(xor(q.b0, w.b0)) + bit_count(xor(q.b1, w.b1))"
    k_rows = "\n        UNION ALL\n".join(
        f"""
        SELECT {k} AS k,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM e
                WHERE vec_id % {QUERY_MOD_SQL} = 0) AS n_queries,
               (SELECT CAST(COUNT(*) AS DOUBLE) FROM h
                JOIN c ON c.q = h.q AND c.n = h.n
                WHERE h.r_h <= {k} AND c.r_c <= {k})
                 / ((SELECT COUNT(*) FROM e WHERE vec_id % {QUERY_MOD_SQL} = 0) * {k})
                 AS recall_at_k,
               (SELECT CAST(SUM(h.hamming) AS DOUBLE) FROM h WHERE h.r_h <= {k})
                 / ((SELECT COUNT(*) FROM e WHERE vec_id % {QUERY_MOD_SQL} = 0) * {k})
                 AS avg_hamming_at_k"""
        for k in _BQ_KS
    )
    return f"""
    WITH raw AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    e AS (
        SELECT vec_id, v,
               {_sign_bits_sql("v", 1, 32)} AS b0,
               {_sign_bits_sql("v", 33, 64)} AS b1
        FROM raw
    ),
    h AS (
        SELECT q, n, hamming,
               ROW_NUMBER() OVER (PARTITION BY q ORDER BY hamming, n) AS r_h
        FROM (
            SELECT q.vec_id AS q, w.vec_id AS n, ({ham}) AS hamming
            FROM e q JOIN e w ON q.vec_id <> w.vec_id
            WHERE q.vec_id % {QUERY_MOD_SQL} = 0
        )
    ),
    c AS (
        SELECT q, n,
               ROW_NUMBER() OVER (PARTITION BY q ORDER BY cosine DESC, n) AS r_c
        FROM (
            SELECT q.vec_id AS q, w.vec_id AS n, ({cos}) AS cosine
            FROM e q JOIN e w ON q.vec_id <> w.vec_id
            WHERE q.vec_id % {QUERY_MOD_SQL} = 0
        )
    )
    SELECT k, n_queries, recall_at_k, avg_hamming_at_k FROM ({k_rows})
    ORDER BY k
    """


@register(
    "emb_binary_sign_recall",
    oracle=_binary_sign_sql(),
    description="1-bit sign-quantized retrieval audit: Hamming top-k recall vs full-precision cosine per k, plus mean Hamming radius",
)
def emb_binary_sign_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much retrieval survives 1-bit-per-dimension quantization:
    sign signatures packed into two 32-bit words (8 bytes per vector,
    a 32x index shrink), Hamming-distance top-k per query, recall
    measured against the full-precision cosine top-k at k=1/5/10.

    Spark shape: signatures are built in-scan (integer fold, no
    Python); the Hamming and cosine rankings are two windowed passes
    over the same broadcast-queries pair frame, joined on (q, n) and
    reduced to |ks| rows in one aggregate. Signature building is the
    at-scale point: on a real corpus the 8-byte signature column is
    what ships to the index, so the pair scan reads 8 bytes/vector,
    not 256.
    """
    from lime_etl_spark.operators.similarity import dot, query_mod

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    ).select(
        "vec_id",
        "v",
        _sign_bits_spark("v", 1, 32).alias("b0"),
        _sign_bits_spark("v", 33, 64).alias("b1"),
    )
    q = emb.where(F.col("vec_id") % query_mod(emb) == 0).select(
        F.col("vec_id").alias("q"),
        F.col("v").alias("qv"),
        F.col("b0").alias("qb0"),
        F.col("b1").alias("qb1"),
    )
    w = emb.select(
        F.col("vec_id").alias("n"),
        F.col("v").alias("wv"),
        F.col("b0").alias("wb0"),
        F.col("b1").alias("wb1"),
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(w)
        .where(F.col("q") != F.col("n"))
        .select(
            "q",
            "n",
            (
                F.bit_count(F.col("qb0").bitwiseXOR(F.col("wb0")))
                + F.bit_count(F.col("qb1").bitwiseXOR(F.col("wb1")))
            ).alias("hamming"),
            (
                dot(F.col("qv"), F.col("wv"))
                / (
                    F.sqrt(dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(dot(F.col("wv"), F.col("wv")))
                )
            ).alias("cosine"),
        )
    )
    wh = Window.partitionBy("q").orderBy(F.asc("hamming"), "n")
    wc = Window.partitionBy("q").orderBy(F.desc("cosine"), "n")
    ranked = pairs.select(
        "q",
        "n",
        "hamming",
        F.row_number().over(wh).alias("r_h"),
        F.row_number().over(wc).alias("r_c"),
    )
    # every k's hits/hamming-mass in ONE aggregate over one pass of the
    # ranked pairs (no per-k legs — re-reading the pair explosion per k
    # would triple the dominant cost), then stack()ed out to |ks| rows
    aggs = [F.countDistinct("q").cast("bigint").alias("n_queries")]
    for k in _BQ_KS:
        aggs.append(
            F.sum(F.when((F.col("r_h") <= k) & (F.col("r_c") <= k), 1).otherwise(0))
            .cast("bigint")
            .alias(f"hits_{k}")
        )
        aggs.append(
            F.sum(F.when(F.col("r_h") <= k, F.col("hamming")).otherwise(0))
            .cast("bigint")
            .alias(f"ham_{k}")
        )
    stacked = ", ".join(f"{k}, hits_{k}, ham_{k}" for k in _BQ_KS)
    return (
        ranked.agg(*aggs)
        .select(
            "n_queries",
            F.expr(
                f"stack({len(_BQ_KS)}, {stacked}) AS (k, hits, ham_sum)"
            ),
        )
        .select(
            "k",
            "n_queries",
            (F.col("hits").cast("double") / (F.col("n_queries") * F.col("k"))).alias(
                "recall_at_k"
            ),
            (
                F.col("ham_sum").cast("double") / (F.col("n_queries") * F.col("k"))
            ).alias("avg_hamming_at_k"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# dedup_cdc_chunks
# ---------------------------------------------------------------------------

CDC_WINDOW = 8  # rolling window width (chars)
CDC_MOD = 64  # boundary when window-hash % CDC_MOD == CDC_MOD - 1 (~64-char chunks)


def _cdc_chunks_sql() -> str:
    h = shingle_int_sql(f"substr(text, i - {CDC_WINDOW - 1}, {CDC_WINDOW})")
    return f"""
    WITH cutsets AS (
        SELECT source, doc_id, text,
               ([CAST(0 AS BIGINT)]
                || list_filter(
                       generate_series(1, len(text)),
                       i -> i >= {CDC_WINDOW} AND i < len(text)
                            AND {h} % {CDC_MOD} = {CDC_MOD - 1}
                   )
                || [CAST(len(text) AS BIGINT)]) AS cuts
        FROM documents
    ),
    ch AS (
        SELECT source, doc_id, unnest(
                   list_transform(
                       generate_series(2, len(cuts)),
                       j -> substr(text, cuts[j - 1] + 1, cuts[j] - cuts[j - 1])
                   )
               ) AS chunk
        FROM cutsets
    )
    SELECT source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT chunk) AS BIGINT) AS n_distinct_chunks,
           CAST(COUNT(*) - COUNT(DISTINCT chunk) AS DOUBLE) / COUNT(*)
             AS dup_chunk_ratio,
           CAST(SUM(len(chunk)) AS DOUBLE) / COUNT(*) AS avg_chunk_len
    FROM ch
    GROUP BY source
    ORDER BY source
    """


@register(
    "dedup_cdc_chunks",
    oracle=_cdc_chunks_sql(),
    description="content-defined chunking (rolling-hash boundaries) + chunk-level duplicate mass per source — sub-document dedup finer than whole-doc exact",
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking over the document corpus: a chunk
    boundary falls wherever the hash of the trailing CDC_WINDOW-char
    window hits the mask (h % CDC_MOD == CDC_MOD-1, expected chunk
    ~CDC_MOD chars). Because boundaries depend on CONTENT, an
    insertion early in a doc re-chunks only its neighborhood — the
    property that makes CDC the standard storage/training-corpus
    sub-document dedup, where fixed-size blocks would shift every
    later block. Output: per-source chunk counts, distinct-chunk
    counts and the duplicate-chunk mass ratio.

    Spark shape: boundary detection and chunk slicing are pure
    in-scan HOF expressions (filter/transform over the char index
    sequence — JVM-side, no Python); the only shuffle is the final
    per-source COUNT DISTINCT. The md5-bridge window hash
    (shingle_int) keeps boundaries bit-identical to the DuckDB twin.
    """
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    cuts = F.expr(
        f"""concat(
            array(0),
            filter(
                sequence(1, length(text)),
                i -> i >= {CDC_WINDOW} AND i < length(text)
                     AND {shingle_int_spark_sql(f"substring(text, i - {CDC_WINDOW - 1}, {CDC_WINDOW})")} % {CDC_MOD} = {CDC_MOD - 1}
            ),
            array(length(text))
        )"""
    )
    chunks = F.expr(
        """transform(
            sequence(2, size(cuts)),
            j -> substring(text, element_at(cuts, j - 1) + 1,
                           element_at(cuts, j) - element_at(cuts, j - 1))
        )"""
    )
    ch = (
        docs.select("source", "doc_id", "text", cuts.alias("cuts"))
        .select("source", "doc_id", F.explode(chunks).alias("chunk"))
    )
    return (
        ch.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.countDistinct("chunk").cast("bigint").alias("n_distinct_chunks"),
            (
                (F.count(F.lit(1)) - F.countDistinct("chunk")).cast("double")
                / F.count(F.lit(1))
            ).alias("dup_chunk_ratio"),
            (F.sum(F.length("chunk")).cast("double") / F.count(F.lit(1))).alias(
                "avg_chunk_len"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# dedup_minhash_estimate_error
# ---------------------------------------------------------------------------


def _minhash_error_sql() -> str:
    from lime_etl_spark.functions.text import MERSENNE_P, MINHASH_PERMS
    from lime_etl_spark.operators.dedup import (
        _SHINGLES_SQL,
        BAND_ROWS,
        N_BANDS,
    )

    mins = ", ".join(
        f"MIN((x * {a} + {b}) % {MERSENNE_P}) AS mh_{j}"
        for j, (a, b) in enumerate(MINHASH_PERMS)
    )
    band_sigs = " UNION ALL ".join(
        "SELECT doc_id, {band} AS band, {sig} AS sig FROM sigs".format(
            band=band,
            sig=" || ',' || ".join(
                f"CAST(mh_{band * BAND_ROWS + r} AS VARCHAR)"
                for r in range(BAND_ROWS)
            ),
        )
        for band in range(N_BANDS)
    )
    n_perms = len(MINHASH_PERMS)
    match_sum = " + ".join(
        f"(CASE WHEN a.mh_{j} = b.mh_{j} THEN 1 ELSE 0 END)" for j in range(n_perms)
    )
    est_micro = 1_000_000 // n_perms
    return f"""
    WITH sh AS ({_SHINGLES_SQL}),
    sigs AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
    buckets AS ({band_sigs}),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.x = a.x
        GROUP BY c.doc_a, c.doc_b
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    scored AS (
        SELECT ({match_sum}) AS matching_perms,
               (1000000 * i.n_inter) // (sa.n_sh + sb.n_sh - i.n_inter) AS jq
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        JOIN sigs a ON a.doc_id = i.doc_a
        JOIN sigs b ON b.doc_id = i.doc_b
    )
    SELECT matching_perms,
           CAST(matching_perms AS DOUBLE) / {n_perms} AS est_jaccard,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(jq) AS DOUBLE) / (COUNT(*) * 1000000) AS mean_exact_jaccard,
           CAST(SUM(ABS(matching_perms * {est_micro} - jq)) AS DOUBLE)
             / (COUNT(*) * 1000000) AS mean_abs_err
    FROM scored
    GROUP BY matching_perms
    ORDER BY matching_perms
    """


@register(
    "dedup_minhash_estimate_error",
    oracle=_minhash_error_sql(),
    description="minhash estimator calibration: estimated Jaccard (matching perms / 16) vs exact Jaccard on the LSH candidate pairs, bucketed by agreement count",
)
def dedup_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How well the 16-perm minhash estimates the Jaccard it stands in
    for, measured on the pairs the shipped 4x4 LSH actually surfaces:
    one row per agreement count (0..16 matching permutations) with the
    estimator value, the mean EXACT Jaccard of pairs at that count,
    and the mean absolute error. This is the calibration table behind
    every banding-threshold choice (dedup_lsh_tuning picks the
    bands/rows; this measures the estimator they threshold).

    Determinism: exact Jaccard is quantized to a 1e-6 integer grid
    (integer division), the estimate is matching_perms * 62500 on the
    same grid, and every mean is ONE double division of exact integer
    sums — partition-order free on both engines.

    Scale: reuses the shingle -> signature -> banded-candidate
    pipeline (shingles persisted once); agreement counting joins the
    16-column signature rows for candidate pairs only, so the cost
    tracks |candidates|, never corpus^2.
    """
    from lime_etl_spark.functions.text import MINHASH_PERMS
    from lime_etl_spark.operators.dedup import (
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )

    n_perms = len(MINHASH_PERMS)
    est_micro = 1_000_000 // n_perms
    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    track_persist(sh)
    sigs = minhash_signatures(sh).persist()
    track_persist(sigs)
    cand = lsh_candidates(sigs)
    exact = jaccard_pairs(sh, candidates=cand, with_counts=True)
    matches = sum(
        F.when(F.col(f"a.mh_{j}") == F.col(f"b.mh_{j}"), 1).otherwise(0)
        for j in range(n_perms)
    )
    scored = (
        exact.join(sigs.alias("a"), F.col("doc_a") == F.col("a.doc_id"))
        .join(sigs.alias("b"), F.col("doc_b") == F.col("b.doc_id"))
        .select(
            matches.alias("matching_perms"),
            F.expr("(1000000 * n_inter) div (n_a + n_b - n_inter)").alias("jq"),
        )
    )
    return (
        scored.groupBy("matching_perms")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            (
                F.sum("jq").cast("double") / (F.count(F.lit(1)) * 1_000_000)
            ).alias("mean_exact_jaccard"),
            (
                F.sum(
                    F.abs(F.col("matching_perms") * est_micro - F.col("jq"))
                ).cast("double")
                / (F.count(F.lit(1)) * 1_000_000)
            ).alias("mean_abs_err"),
        )
        .select(
            "matching_perms",
            (F.col("matching_perms").cast("double") / n_perms).alias("est_jaccard"),
            "n_pairs",
            "mean_exact_jaccard",
            "mean_abs_err",
        )
        .orderBy("matching_perms")
    )


# ---------------------------------------------------------------------------
# ev_lift_bootstrap_ci
# ---------------------------------------------------------------------------

LIFT_BOOT_REPS = 16


def _guarded_ratio(num: str, den: str):
    """One IEEE division guarded against an empty-arm replicate (den =
    0): Spark would yield NULL, DuckDB inf — both engines pin it to
    0.0 via an identical CASE (r6 ADVICE)."""
    return F.when(F.col(den) > 0, F.col(num) / F.col(den)).otherwise(F.lit(0.0))


def _lift_boot_sql() -> str:
    from lime_etl_spark.operators.training import (
        _BOOT_SCALE,
        _boot_w_from_u,
    )

    def u_sql(rep: int) -> str:
        key = f"CAST(user_id AS VARCHAR) || ':' || '{rep}'"
        return f"({shingle_int_sql(key)}) % {_BOOT_SCALE}"

    us = ",\n           ".join(
        f"{u_sql(r)} AS u{r}" for r in range(LIFT_BOOT_REPS)
    )
    ws = ",\n           ".join(
        f"{_boot_w_from_u(f'u{r}')} AS w{r}" for r in range(LIFT_BOOT_REPS)
    )
    aggs = ",\n           ".join(
        f"CAST(SUM(CASE WHEN arm = 0 THEN w{r} ELSE 0 END) AS BIGINT) AS nc{r}, "
        f"CAST(SUM(CASE WHEN arm = 1 THEN w{r} ELSE 0 END) AS BIGINT) AS nt{r}, "
        f"CAST(SUM(CASE WHEN arm = 0 THEN w{r} * rev ELSE 0 END) AS DOUBLE) AS rc{r}, "
        f"CAST(SUM(CASE WHEN arm = 1 THEN w{r} * rev ELSE 0 END) AS DOUBLE) AS rt{r}"
        for r in range(LIFT_BOOT_REPS)
    )
    # Degenerate-replicate guard (r6 ADVICE): a replicate where one
    # arm's Poisson weights all draw 0 would divide by 0 — Spark yields
    # NULL, DuckDB DOUBLE/0 yields inf. Identical CASE guards on both
    # engines pin that case to 0.0 (mirrors the vq guard in
    # ev_shapley_attribution).
    legs = "\n    UNION ALL\n".join(
        f"""    SELECT CAST({r} AS INTEGER) AS rep,
           nc{r} AS n_users_c, nt{r} AS n_users_t,
           CASE WHEN nc{r} > 0 THEN rc{r} / nc{r} ELSE 0.0 END AS rev_per_user_c,
           CASE WHEN nt{r} > 0 THEN rt{r} / nt{r} ELSE 0.0 END AS rev_per_user_t,
           (CASE WHEN nt{r} > 0 THEN rt{r} / nt{r} ELSE 0.0 END)
             - (CASE WHEN nc{r} > 0 THEN rc{r} / nc{r} ELSE 0.0 END) AS lift FROM agg"""
        for r in range(LIFT_BOOT_REPS)
    )
    arm = shingle_int_sql("CAST(user_id AS VARCHAR)")
    return f"""
    WITH per_user AS (
        SELECT user_id, ({arm}) % 2 AS arm,
               COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                 THEN CAST(value AS DECIMAL(18,2)) END),
                        CAST(0 AS DECIMAL(18,2))) AS rev
        FROM events GROUP BY user_id
    ),
    u AS (SELECT arm, rev,
           {us}
    FROM per_user),
    w AS (SELECT arm, rev,
           {ws}
    FROM u),
    agg AS (SELECT
           {aggs}
    FROM w)
    SELECT * FROM (
{legs}
    ) ORDER BY rep
    """


@register(
    "ev_lift_bootstrap_ci",
    oracle=_lift_boot_sql(),
    description="A/B revenue-per-user lift with a Poisson-bootstrap replicate distribution: 16 deterministic replicate lifts from ONE fact pass (the uncertainty band every readout needs)",
)
def ev_lift_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The experimentation capstone: revenue-per-user lift between the
    md5-bucketed arms (the ev_ab_assignment_aa assignment), with its
    sampling distribution from LIFT_BOOT_REPS Poisson-bootstrap
    replicates — resampling USERS (the randomization unit), not
    events, so the replicate spread is an honest user-level
    uncertainty band. min/max (or rank quantiles) of the 16 replicate
    lifts bound the readout; a lift whose replicate band straddles 0
    is noise.

    One fact scan -> per-user reduce; every replicate weight is the
    deterministic md5-bridge Poisson(1) draw shared with
    samp_poisson_bootstrap (training.py), all 4x16 aggregates ride one
    map-side-combined pass, and the 16-row result is a stack of a
    single reduced row — no resample shuffle at any scale. Revenue
    sums are decimal-exact; each per-rep mean/lift is one or three
    IEEE ops in identical order on both engines.
    """
    from lime_etl_spark.functions.numeric import dec
    from lime_etl_spark.operators.training import (
        _BOOT_SCALE,
        _boot_w_from_u,
        hash_bucket,
    )

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", dec("value", 2, 18))
            ),
            F.lit(0).cast("decimal(18,2)"),
        ).alias("rev")
    ).select(
        (hash_bucket(F.col("user_id"), 2)).alias("arm"),
        "rev",
        "user_id",
    )
    u_cols = [
        (
            shingle_int(F.concat(F.col("user_id").cast("string"), F.lit(f":{r}")))
            % _BOOT_SCALE
        ).alias(f"u{r}")
        for r in range(LIFT_BOOT_REPS)
    ]
    with_u = per_user.select("arm", "rev", *u_cols)
    w_cols = [
        F.expr(_boot_w_from_u(f"u{r}")).alias(f"w{r}")
        for r in range(LIFT_BOOT_REPS)
    ]
    with_w = with_u.select("arm", "rev", *w_cols)
    aggs = []
    for r in range(LIFT_BOOT_REPS):
        aggs.append(
            F.sum(F.when(F.col("arm") == 0, F.col(f"w{r}")).otherwise(0))
            .cast("bigint")
            .alias(f"nc{r}")
        )
        aggs.append(
            F.sum(F.when(F.col("arm") == 1, F.col(f"w{r}")).otherwise(0))
            .cast("bigint")
            .alias(f"nt{r}")
        )
        aggs.append(
            F.sum(
                F.when(F.col("arm") == 0, F.col(f"w{r}") * F.col("rev")).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias(f"rc{r}")
        )
        aggs.append(
            F.sum(
                F.when(F.col("arm") == 1, F.col(f"w{r}") * F.col("rev")).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias(f"rt{r}")
        )
    one = with_w.agg(*aggs)
    stack = ", ".join(
        f"{r}, nc{r}, nt{r}, rc{r}, rt{r}" for r in range(LIFT_BOOT_REPS)
    )
    return (
        one.selectExpr(
            f"stack({LIFT_BOOT_REPS}, {stack})"
            " AS (rep, n_users_c, n_users_t, rc, rt)"
        )
        .select(
            F.col("rep").cast("int").alias("rep"),
            "n_users_c",
            "n_users_t",
            _guarded_ratio("rc", "n_users_c").alias("rev_per_user_c"),
            _guarded_ratio("rt", "n_users_t").alias("rev_per_user_t"),
            (
                _guarded_ratio("rt", "n_users_t")
                - _guarded_ratio("rc", "n_users_c")
            ).alias("lift"),
        )
        .orderBy("rep")
    )


# ---------------------------------------------------------------------------
# ev_shapley_attribution
# ---------------------------------------------------------------------------

SHAPLEY_CHANNELS = ("click", "error", "signup", "view")  # fixed order = bits 0..3
SHAPLEY_WINDOW_DAYS = 3  # onboarding window: convert = purchase within it
_SHAP_Q = 1_000_000_000  # conversion rates on a 1e-9 integer grid
# w(s) = s!(C-1-s)! for C=4, indexed by |S|; common denominator C! = 24
_SHAP_W = (6, 2, 2, 6)
_SHAP_DENOM = 24  # C! — the weights' common denominator


def _shapley_sql() -> str:
    n_ch = len(SHAPLEY_CHANNELS)
    firsts = ",\n               ".join(
        f"MIN(CASE WHEN event_type = '{ch}' THEN ts END) AS t{i}"
        for i, ch in enumerate(SHAPLEY_CHANNELS)
    )
    presence = ",\n               ".join(
        f"CASE WHEN t{i} IS NOT NULL AND t{i} < cutoff THEN 1 ELSE 0 END AS c{i}"
        for i in range(n_ch)
    )
    mask = " + ".join(f"{1 << i} * c{i}" for i in range(n_ch))
    ch_values = ", ".join(
        f"({i}, '{ch}')" for i, ch in enumerate(SHAPLEY_CHANNELS)
    )
    w_case = " ".join(
        f"WHEN {s} THEN {w}" for s, w in enumerate(_SHAP_W)
    )
    return f"""
    WITH firsts AS (
        SELECT user_id,
               MIN(ts) AS first_ts,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p_first,
               {firsts}
        FROM events GROUP BY user_id
    ),
    windowed AS (
        SELECT *,
               first_ts + INTERVAL {SHAPLEY_WINDOW_DAYS} DAY AS window_end
        FROM firsts
    ),
    per_user AS (
        SELECT user_id,
               CASE WHEN p_first IS NOT NULL AND p_first < window_end
                    THEN 1 ELSE 0 END AS conv,
               {presence}
        FROM (
            SELECT *,
                   CASE WHEN p_first IS NOT NULL AND p_first < window_end
                        THEN p_first ELSE window_end END AS cutoff
            FROM windowed
        )
    ),
    cells AS (
        SELECT ({mask}) AS mask,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(conv) AS BIGINT) AS n_conv
        FROM per_user GROUP BY 1
    ),
    spine AS (
        SELECT UNNEST(generate_series(0, {(1 << n_ch) - 1})) AS mask
    ),
    filled AS (
        SELECT s.mask,
               COALESCE(c.n_users, 0) AS n_users,
               COALESCE(c.n_conv, 0) AS n_conv,
               CASE WHEN COALESCE(c.n_users, 0) > 0
                    THEN ({_SHAP_Q} * COALESCE(c.n_conv, 0)) // c.n_users
                    ELSE 0 END AS vq
        FROM spine s LEFT JOIN cells c ON c.mask = s.mask
    ),
    ch(i, channel) AS (VALUES {ch_values}),
    terms AS (
        SELECT ch.channel,
               (CASE bit_count(f1.mask) {w_case} END)
                 * (f2.vq - f1.vq) AS t
        FROM ch
        JOIN filled f1 ON (f1.mask & (1 << ch.i)) = 0
        JOIN filled f2 ON f2.mask = f1.mask + (1 << ch.i)
    ),
    marginals AS (
        SELECT ch.channel,
               CAST(SUM(f.n_users) AS BIGINT) AS users_with_channel,
               CASE WHEN SUM(f.n_users) > 0
                    THEN CAST(SUM(f.n_conv) AS DOUBLE) / SUM(f.n_users)
                    ELSE 0.0 END AS conv_rate_with
        FROM ch JOIN filled f ON (f.mask & (1 << ch.i)) <> 0
        GROUP BY ch.channel
    )
    SELECT t.channel, m.users_with_channel, m.conv_rate_with,
           CAST(SUM(t.t) AS DOUBLE) / ({_SHAP_DENOM} * {_SHAP_Q}.0) AS shapley_credit
    FROM terms t JOIN marginals m ON m.channel = t.channel
    GROUP BY t.channel, m.users_with_channel, m.conv_rate_with
    ORDER BY t.channel
    """


@register(
    "ev_shapley_attribution",
    oracle=_shapley_sql(),
    description="data-driven Shapley channel attribution over user channel-presence coalitions — exact integer game values on a 1e-9 grid, efficiency identity pytest-pinned",
)
def ev_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution done right: each non-purchase channel's
    SHAPLEY VALUE over the coalition game v(S) = onboarding conversion
    rate of users whose pre-conversion touch set is exactly S — the
    coalition is the channels a user touched inside the
    SHAPLEY_WINDOW_DAYS onboarding window BEFORE their first in-window
    purchase (conversion = purchased within the window at all). Unlike
    first/last/linear-touch (ev_attribution_touches), Shapley credit
    is the unique split satisfying efficiency + symmetry + dummy — the
    standard data-driven attribution model; v(∅) is the organic
    (touch-nothing-first) conversion baseline.

    Exactness: v(S) is quantized to a 1e-9 integer grid with ONE
    integer division per coalition; Shapley weights enter as integer
    numerators over the common denominator C! (for C=4: 6,2,2,6 / 24),
    so every per-channel credit numerator is an EXACT int64 sum —
    partition-order free — and the credit itself is one double
    division. The efficiency identity Σ_i credit_i = v(full) − v(∅)
    holds exactly on the grid (pytest-pinned).

    Scale: ONE per-user reduce (map-side combined min-per-channel
    firsts — 'any event before cutoff' ≡ 'first event before cutoff',
    so window/cutoff logic is a post-agg projection, not a second
    pass), a 2^C-row cell table (C=4 → 16 rows), and the Shapley
    combination is a join over that 16-row broadcast spine — nothing
    after the reduce is data-proportional. Unobserved coalitions
    contribute v=0 (the standard convention).
    """
    n_ch = len(SHAPLEY_CHANNELS)
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "p_first"
        ),
        *[
            F.min(F.when(F.col("event_type") == ch, F.col("ts"))).alias(f"t{i}")
            for i, ch in enumerate(SHAPLEY_CHANNELS)
        ],
    )
    windowed = firsts.withColumn(
        "window_end", F.expr(f"first_ts + INTERVAL {SHAPLEY_WINDOW_DAYS} DAYS")
    )
    conv_cond = F.col("p_first").isNotNull() & (F.col("p_first") < F.col("window_end"))
    cutoff = F.when(conv_cond, F.col("p_first")).otherwise(F.col("window_end"))
    per_user = windowed.select(
        F.when(conv_cond, 1).otherwise(0).alias("conv"),
        *[
            F.when(
                F.col(f"t{i}").isNotNull() & (F.col(f"t{i}") < cutoff), 1
            )
            .otherwise(0)
            .alias(f"c{i}")
            for i in range(n_ch)
        ],
    )
    mask = sum(F.col(f"c{i}") * (1 << i) for i in range(n_ch))
    cells = (
        per_user.select(mask.alias("mask"), "conv")
        .groupBy("mask")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("conv").cast("bigint").alias("n_conv"),
        )
    )
    spine = spark.range(1 << n_ch).select(F.col("id").cast("int").alias("mask"))
    filled = (
        spine.join(F.broadcast(cells), "mask", "left")
        .select(
            "mask",
            F.coalesce("n_users", F.lit(0)).alias("n_users"),
            F.coalesce("n_conv", F.lit(0)).alias("n_conv"),
        )
        .withColumn(
            "vq",
            F.expr(
                f"CASE WHEN n_users > 0 THEN ({_SHAP_Q}L * n_conv) div n_users"
                " ELSE 0L END"
            ),
        )
    )
    ch = spark.createDataFrame(
        list(enumerate(SHAPLEY_CHANNELS)), "i int, channel string"
    )
    w_case = "CASE bit_count(f1_mask) " + " ".join(
        f"WHEN {s} THEN {w}L" for s, w in enumerate(_SHAP_W)
    ) + " END"
    f1 = filled.select(
        F.col("mask").alias("f1_mask"), F.col("vq").alias("f1_vq")
    )
    f2 = filled.select(
        F.col("mask").alias("f2_mask"), F.col("vq").alias("f2_vq")
    )
    terms = (
        F.broadcast(ch)
        .join(f1, F.expr("(f1_mask & shiftleft(1, i)) = 0"))
        .join(f2, F.expr("f2_mask = f1_mask + shiftleft(1, i)"))
        .groupBy("channel")
        .agg(
            F.sum(F.expr(f"({w_case}) * (f2_vq - f1_vq)"))
            .cast("bigint")
            .alias("shap_num")
        )
    )
    marginals = (
        F.broadcast(ch)
        .join(filled, F.expr("(mask & shiftleft(1, i)) <> 0"))
        .groupBy("channel")
        .agg(
            F.sum("n_users").cast("bigint").alias("users_with_channel"),
            F.when(
                F.sum("n_users") > 0,
                F.sum("n_conv").cast("double") / F.sum("n_users"),
            )
            .otherwise(F.lit(0.0))
            .alias("conv_rate_with"),
        )
    )
    denom = float(_SHAP_DENOM * _SHAP_Q)
    return (
        terms.join(marginals, "channel")
        .select(
            "channel",
            "users_with_channel",
            "conv_rate_with",
            (F.col("shap_num").cast("double") / F.lit(denom)).alias(
                "shapley_credit"
            ),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# ev_srm_check
# ---------------------------------------------------------------------------

SRM_EXPERIMENTS = 8
# chi-square 95% critical value for 1 dof, scaled by 1000 for the
# integer-exact flag predicate: 1000*(a-b)^2 > 3841*(a+b)
_SRM_CRIT_MILLI = 3841


def _srm_sql() -> str:
    arm = shingle_int_sql(
        "('exp' || CAST(g.exp_id AS VARCHAR) || ':' || CAST(u.user_id AS VARCHAR))"
    )
    return f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    -- INTEGER, not generate_series' BIGINT: the Spark side explodes
    -- F.sequence of int literals (int32) and the driver hash is
    -- dtype-strict
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
    )
    SELECT exp_id, users_a, users_b,
           CAST((users_a - users_b) * (users_a - users_b) AS DOUBLE)
             / (users_a + users_b) AS chi_square,
           (1000 * (users_a - users_b) * (users_a - users_b)
              > {_SRM_CRIT_MILLI} * (users_a + users_b)) AS srm_flag
    FROM counts
    ORDER BY exp_id
    """


@register(
    "ev_srm_check",
    oracle=_srm_sql(),
    description="sample-ratio-mismatch audit across a grid of simulated experiments: chi-square of arm sizes vs 50/50, flagged at the 95% critical value",
)
def ev_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assignment-health audit for an experiment grid: each of
    SRM_EXPERIMENTS simulated experiments hashes every user into one
    of two arms (deterministic md5 of experiment||user — the platform
    convention set by ev_ab_assignment_aa), and the chi-square
    statistic of the observed arm split is compared against the 95%
    critical value. A flagged experiment means the BUCKETING is
    broken (biased hash, lossy logging) — the readout can't be
    trusted regardless of the metric. The flag predicate is
    integer-exact (1000*(a-b)^2 > 3841*(a+b)); chi_square itself is
    one double division of exact integers.

    Spark shape: one distinct-users pass, an |experiments|-row
    explode (row-local hash, no assignment table), one groupBy of
    |experiments| cells. Nothing data-proportional is collected.
    """
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    exps = F.explode(
        F.sequence(F.lit(1), F.lit(SRM_EXPERIMENTS))
    ).alias("exp_id")
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
    return counts.select(
        "exp_id",
        "users_a",
        "users_b",
        (d2.cast("double") / (F.col("users_a") + F.col("users_b"))).alias("chi_square"),
        (F.lit(1000) * d2 > _SRM_CRIT_MILLI * (F.col("users_a") + F.col("users_b"))).alias(
            "srm_flag"
        ),
    ).orderBy("exp_id")
