"""Round-8 operators: sequential experiment gating, character-entropy
profiling, rich-club graph structure, and Gumbel weighted sampling.

All four are LLM-data-pipeline / analytics ops the reference has no
analog for (lime-etl is orchestration-only); same engine discipline as
their siblings: deterministic md5-bridge hashing (`shingle_int`),
integer-exact aggregates with one final double division, fixed-shape
float chains floored to the 1e-6 grid, identical expression structure
in the DuckDB oracle, and total output orders.

- `ev_sprt_gate` — Wald's Sequential Probability Ratio Test (Wald
  1945) per event type: the early-stopping gate an experimentation
  platform runs instead of fixed-horizon tests. The two per-
  observation log-likelihood-ratio increments are CONSTANTS of
  (p0, p1), computed once in Python on the 1e-6 grid and inlined into
  BOTH engines, so the cumulative LLR path is pure int64.
- `txt_entropy_profile` — per-document character-level Shannon
  entropy (bits/char) rolled up per language: the compressibility /
  gibberish screen that complements txt_simpson_diversity (token
  richness) and txt_compression_ratio (zlib; rows-only) with a fully
  ORACLE-ABLE information measure — per (count, length) term bits are
  one fixed-shape chain, summed as int64.
- `graph_rich_club` — rich-club coefficient ladder (Zhou & Mondragón
  2004) over the verified near-dup graph: edge density among nodes of
  degree > k for a k ladder. Boilerplate template families show up as
  φ(k) → 1 at high k; pairs with graph_assortativity (correlation)
  and graph_kcore_summary (peeling) as the third hub-structure lens.
- `samp_gumbel_topk` — weighted sampling WITHOUT replacement via the
  Gumbel-top-k trick (Efraimidis & Spirakis 2006 / Kool et al. 2019):
  key = ln(w) − ln(−ln(u)) with u a deterministic md5 uniform; the
  top-K keys ARE a WOR sample ∝ w. The curation sampler used when
  char-mass-weighted doc picks must be reproducible across engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lime_etl_spark.functions.text import shingle_int, shingle_int_sql
from lime_etl_spark.plans.registry import register
from lime_etl_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# ev_sprt_gate
# ---------------------------------------------------------------------------

# H0: P(value > SPRT_CUT) = SPRT_P0  vs  H1: = SPRT_P1, alpha = beta = 0.05.
SPRT_CUT = 50.0
SPRT_P0 = 0.35
SPRT_P1 = 0.40
SPRT_ALPHA = 0.05
# Per-observation LLR increments and the Wald boundaries, floored to the
# 1e-6 grid ONCE here and inlined as exact int64 literals into both the
# Spark plan and the oracle SQL — no transcendental crosses the engine
# boundary, so the cumulative path is pure integer arithmetic.
SPRT_INC_POS_E6 = math.floor(math.log(SPRT_P1 / SPRT_P0) * 1_000_000)
SPRT_INC_NEG_E6 = math.floor(math.log((1 - SPRT_P1) / (1 - SPRT_P0)) * 1_000_000)
SPRT_UPPER_E6 = math.floor(math.log((1 - SPRT_ALPHA) / SPRT_ALPHA) * 1_000_000)
SPRT_LOWER_E6 = -SPRT_UPPER_E6


@register(
    "ev_sprt_gate",
    oracle=f"""
    WITH obs AS (
        SELECT event_type, ts, event_id,
               CASE WHEN value > {SPRT_CUT} THEN {SPRT_INC_POS_E6}
                    ELSE {SPRT_INC_NEG_E6} END AS inc_e6
        FROM events
    ),
    path AS (
        SELECT event_type, ts, event_id,
               SUM(inc_e6) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id) AS llr_e6,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) AS n_obs
        FROM obs
    ),
    crossings AS (
        SELECT event_type, llr_e6, n_obs,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n_obs) AS rn
        FROM path
        WHERE llr_e6 >= {SPRT_UPPER_E6} OR llr_e6 <= {SPRT_LOWER_E6}
    ),
    finals AS (
        SELECT event_type, MAX(n_obs) AS total_obs,
               MAX_BY(llr_e6, n_obs) AS final_llr_e6
        FROM path GROUP BY event_type
    )
    SELECT f.event_type,
           CAST(f.total_obs AS BIGINT) AS total_obs,
           CAST(f.final_llr_e6 AS BIGINT) AS final_llr_e6,
           CASE WHEN c.n_obs IS NULL THEN 'continue'
                WHEN c.llr_e6 >= {SPRT_UPPER_E6} THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           CAST(COALESCE(c.n_obs, f.total_obs) AS BIGINT) AS n_at_decision,
           CAST(COALESCE(c.n_obs, f.total_obs) AS DOUBLE) / f.total_obs
               AS obs_saved_share
    FROM finals f
    LEFT JOIN (SELECT * FROM crossings WHERE rn = 1) c USING (event_type)
    ORDER BY event_type
    """,
    description="Wald SPRT early-stopping gate per event type (H0 p=0.35 vs H1 p=0.40 on value>50): first boundary crossing, decision, and the share of observations a fixed-horizon test would have wasted — LLR increments are 1e-6-grid integer constants",
)
def ev_sprt_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential testing for the experimentation family: instead of a
    fixed-horizon test (ev_experiment_power's world), Wald's SPRT walks
    the observations in arrival order, accumulating the log-likelihood
    ratio, and STOPS at the first crossing of the ±ln((1−α)/α)
    boundaries — the n_at_decision / total_obs column is the measured
    sample-efficiency win sequential gating exists for. Observations
    are (value > cut) Bernoulli draws ordered by (ts, event_id) — a
    total order, so the path is reproducible.

    Engine discipline: both per-observation LLR increments and both
    boundaries are integer CONSTANTS (floored once in Python, inlined
    into both engines), so the cumulative path, the crossing test, and
    the decision are pure int64 — only obs_saved_share pays one final
    double division. Scale: one window cumsum partitioned by type
    ordered by time (the ev_rolling_kpis shape); crossings are filtered
    row-locally; output is |types| rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    path = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.when(F.col("value") > SPRT_CUT, F.lit(SPRT_INC_POS_E6))
        .otherwise(F.lit(SPRT_INC_NEG_E6))
        .alias("inc_e6"),
    ).select(
        "event_type",
        F.sum("inc_e6").over(w).alias("llr_e6"),
        F.row_number().over(w).alias("n_obs"),
    )
    crossed = path.where(
        (F.col("llr_e6") >= SPRT_UPPER_E6) | (F.col("llr_e6") <= SPRT_LOWER_E6)
    )
    first = (
        crossed.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("event_type").orderBy("n_obs")),
        )
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("llr_e6").alias("cross_llr_e6"),
            F.col("n_obs").alias("cross_n"),
        )
    )
    finals = path.groupBy("event_type").agg(
        F.max("n_obs").cast("bigint").alias("total_obs"),
        F.max_by("llr_e6", "n_obs").cast("bigint").alias("final_llr_e6"),
    )
    return (
        finals.join(first, "event_type", "left")
        .select(
            "event_type",
            "total_obs",
            "final_llr_e6",
            F.when(F.col("cross_n").isNull(), F.lit("continue"))
            .when(F.col("cross_llr_e6") >= SPRT_UPPER_E6, F.lit("accept_h1"))
            .otherwise(F.lit("accept_h0"))
            .alias("decision"),
            F.coalesce(F.col("cross_n"), F.col("total_obs"))
            .cast("bigint")
            .alias("n_at_decision"),
            (
                F.coalesce(F.col("cross_n"), F.col("total_obs")).cast("double")
                / F.col("total_obs")
            ).alias("obs_saved_share"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# txt_entropy_profile
# ---------------------------------------------------------------------------


@register(
    "txt_entropy_profile",
    oracle="""
    WITH chars AS (
        SELECT doc_id, lang, c.ch AS ch
        FROM documents, UNNEST(string_split(text, '')) AS c(ch)
    ),
    hist AS (
        SELECT doc_id, ANY_VALUE(lang) AS lang, ch,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM chars GROUP BY doc_id, ch
    ),
    lens AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS len FROM hist GROUP BY doc_id),
    terms AS (
        SELECT h.doc_id, h.lang,
               CAST(FLOOR((h.c * log2(CAST(l.len AS DOUBLE) / h.c)) * 1000000)
                    AS BIGINT) AS bits_e6,
               l.len
        FROM hist h JOIN lens l USING (doc_id)
    ),
    per_doc AS (
        SELECT doc_id, ANY_VALUE(lang) AS lang,
               SUM(bits_e6) // ANY_VALUE(len) AS ent_e6
        FROM terms GROUP BY doc_id
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ent_e6) AS DOUBLE) / (COUNT(*) * 1000000.0)
               AS mean_bits_per_char,
           CAST(MIN(ent_e6) AS DOUBLE) / 1000000.0 AS min_bits_per_char,
           CAST(MAX(ent_e6) AS DOUBLE) / 1000000.0 AS max_bits_per_char
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
    description="per-document character-level Shannon entropy (bits/char) rolled up per language — the compressibility/gibberish screen as a fully oracle-able information measure (per-term bits on the 1e-6 grid)",
)
def txt_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy screen: H(doc) = Σ_c (c/L)·log2(L/c) in
    bits/char. Natural language sits ~4-4.5 bits/char; base64 blobs
    and hex dumps push toward log2(alphabet); repeated-template spam
    collapses low — the same signal txt_compression_ratio reads from
    zlib, but as an exact information measure BOTH engines can compute
    (which is why zlib's query is rows-only and this one hash-matches).

    Exactness: each histogram term c·log2(L/c) is ONE fixed-shape
    chain (division → log2 → multiply → ×1e6 → floor) per (c, L) pair;
    per-doc entropy is an int64 term sum integer-divided by L; the
    language rollup divides int sums once. No order-dependent float
    reduction anywhere.

    Scale: the char explode combines map-side to (doc, char) counter
    rows (alphabet-bounded per doc); everything downstream is counter
    grain. One shuffle to (doc_id), one to (lang)."""
    docs = load_table(spark, sf_dir, "documents")
    hist = (
        docs.select("doc_id", "lang", F.explode(F.split("text", "")).alias("ch"))
        .groupBy("doc_id", "ch")
        .agg(
            F.first("lang").alias("lang"),
            F.count(F.lit(1)).cast("bigint").alias("c"),
        )
    )
    lens = hist.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("len"))
    terms = hist.join(lens, "doc_id").select(
        "doc_id",
        "lang",
        "len",
        F.floor(
            (F.col("c") * F.log2(F.col("len").cast("double") / F.col("c"))) * 1000000
        )
        .cast("bigint")
        .alias("bits_e6"),
    )
    per_doc = terms.groupBy("doc_id").agg(
        F.first("lang").alias("lang"),
        F.expr("sum(bits_e6) div first(len)").alias("ent_e6"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            (
                F.sum("ent_e6").cast("double") / (F.count(F.lit(1)) * 1000000.0)
            ).alias("mean_bits_per_char"),
            (F.min("ent_e6").cast("double") / 1000000.0).alias("min_bits_per_char"),
            (F.max("ent_e6").cast("double") / 1000000.0).alias("max_bits_per_char"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# graph_rich_club
# ---------------------------------------------------------------------------

RICH_CLUB_KS = (1, 2, 4, 8)


def _rich_club_sql() -> str:
    from lime_etl_spark.operators.dedup import _minhash_sql

    legs = "\n        UNION ALL\n".join(
        f"SELECT {k} AS k" for k in RICH_CLUB_KS
    )
    return f"""
    WITH pairs AS (SELECT doc_a, doc_b FROM ({_minhash_sql()})),
    deg AS (
        SELECT vid, CAST(COUNT(*) AS BIGINT) AS degree FROM (
            SELECT doc_a AS vid FROM pairs
            UNION ALL
            SELECT doc_b AS vid FROM pairs
        ) GROUP BY vid
    ),
    ks AS ({legs}),
    club AS (
        SELECT k.k, d.vid
        FROM ks k JOIN deg d ON d.degree > k.k
    ),
    club_n AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_k FROM club GROUP BY k),
    club_e AS (
        SELECT k.k, CAST(COUNT(*) AS BIGINT) AS e_k
        FROM ks k
        JOIN pairs p ON TRUE
        JOIN deg da ON da.vid = p.doc_a AND da.degree > k.k
        JOIN deg db ON db.vid = p.doc_b AND db.degree > k.k
        GROUP BY k.k
    )
    SELECT n.k AS k,
           n.n_k AS n_nodes,
           CAST(COALESCE(e.e_k, 0) AS BIGINT) AS n_edges,
           n.n_k * (n.n_k - 1) // 2 AS possible_edges,
           CASE WHEN n.n_k >= 2
                THEN CAST(COALESCE(e.e_k, 0) AS DOUBLE)
                     / (n.n_k * (n.n_k - 1) // 2)
                ELSE 0.0 END AS phi
    FROM club_n n LEFT JOIN club_e e USING (k)
    ORDER BY k
    """


@register(
    "graph_rich_club",
    oracle=_rich_club_sql(),
    description="rich-club coefficient ladder over the verified near-dup graph: edge density among nodes of degree > k (Zhou & Mondragon 2004) — phi→1 at high k = a boilerplate template clique",
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club structure of the near-dup graph: for each degree
    threshold k, φ(k) = E_k / C(n_k, 2) where the club is the nodes
    with degree > k. A healthy near-dup graph (scattered small
    clusters) keeps φ low; boilerplate template families make the
    high-degree docs mutually connected — φ(k) → 1 — which is exactly
    when the CC pass needs the degree cap. Third hub lens next to
    graph_assortativity (who connects to whom) and graph_kcore_summary
    (how deep the dense part goes).

    Scale: degrees come from one counter groupBy over the persisted
    verified-pair table; the club membership join is |pairs| × |ks|
    with the degree table broadcastable (it is ≤ |docs| rows); every
    output number is an exact int64 count, φ is one guarded double
    division of the int div-2 pair count (even product, exact)."""
    from lime_etl_spark.operators.dedup import (
        JACCARD_TAU,
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )

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
    ks = F.explode(F.array(*[F.lit(k) for k in RICH_CLUB_KS])).alias("k")
    club = deg.select(ks, "vid", "degree").where(F.col("degree") > F.col("k"))
    club_n = club.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("n_k"))
    da = deg.select(F.col("vid").alias("doc_a"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("vid").alias("doc_b"), F.col("degree").alias("deg_b"))
    edges = pairs.join(F.broadcast(da), "doc_a").join(F.broadcast(db), "doc_b")
    club_e = (
        edges.select(
            F.explode(F.array(*[F.lit(k) for k in RICH_CLUB_KS])).alias("k"),
            "deg_a",
            "deg_b",
        )
        .where((F.col("deg_a") > F.col("k")) & (F.col("deg_b") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_k"))
    )
    possible = F.expr("n_k * (n_k - 1) div 2")
    return (
        club_n.join(club_e, "k", "left")
        .select(
            F.col("k").cast("int").alias("k"),
            F.col("n_k").alias("n_nodes"),
            F.coalesce(F.col("e_k"), F.lit(0)).cast("bigint").alias("n_edges"),
            possible.cast("bigint").alias("possible_edges"),
            F.when(
                F.col("n_k") >= 2,
                F.coalesce(F.col("e_k"), F.lit(0)).cast("double") / possible,
            )
            .otherwise(F.lit(0.0))
            .alias("phi"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# samp_gumbel_topk
# ---------------------------------------------------------------------------

GUMBEL_K = 50
# u ∈ (0, 1): (shingle + 1) / 2^60 — shingle_int is uniform on [0, 2^60)
_GUMBEL_DEN = float(1 << 60)


@register(
    "samp_gumbel_topk",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
               CAST(FLOOR((ln(CAST(n_chars AS DOUBLE))
                     - ln(-ln((({shingle_int_sql("CAST(doc_id AS VARCHAR)")}) + 1)
                              / {_GUMBEL_DEN}))) * 1000000) AS BIGINT) AS key_e6
        FROM documents WHERE n_chars > 0
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY key_e6 DESC, doc_id) AS rnk
        FROM keyed
    ),
    sel AS (SELECT * FROM ranked WHERE rnk <= {GUMBEL_K}),
    corpus AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_corpus,
               CAST(SUM(n_chars) AS BIGINT) AS chars_corpus
        FROM keyed GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS t FROM keyed)
    SELECT c.source,
           c.n_corpus,
           CAST(COALESCE(s.n_sel, 0) AS BIGINT) AS n_selected,
           CAST(COALESCE(s.n_sel, 0) AS DOUBLE) / {GUMBEL_K} AS selected_share,
           CAST(c.chars_corpus AS DOUBLE) / tot.t AS char_mass_share
    FROM corpus c
    LEFT JOIN (SELECT source, COUNT(*) AS n_sel FROM sel GROUP BY source) s
      USING (source)
    CROSS JOIN tot
    ORDER BY source
    """,
    description="Gumbel-top-k weighted sampling WITHOUT replacement (key = ln(w) − ln(−ln(u)), md5 uniforms): per-source selected share vs char-mass share — the reproducible w∝chars doc sampler audit",
)
def samp_gumbel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-WOR sampling via the Gumbel-top-k trick: perturb each
    doc's log-weight with a Gumbel draw (−ln(−ln u)) and take the top
    K keys — provably a without-replacement sample with inclusion ∝
    n_chars (Efraimidis-Spirakis). The audit table compares each
    source's share of the SELECTED docs against its char-mass share:
    a correct weighted sampler tracks mass, a broken one tracks doc
    counts. Deterministic u from the md5 bridge makes the same sample
    reproducible on any engine/cluster — the property epoch-stable
    training-data picks need.

    Exactness: the key is ONE fixed-shape chain per doc (two nested
    ln of integer-derived doubles, subtract, ×1e6, floor) with the
    identical parenthesization in SQL; ranking ties break on doc_id.
    Scale: keys are row-local (no shuffle); the global top-K is the
    standard TakeOrdered path (per-partition top-K, then K·P to the
    driver-side heap — K is a constant); rollups are counter-grain."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = (shingle_int(F.col("doc_id").cast("string")) + 1) / F.lit(_GUMBEL_DEN)
    keyed = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.floor(
            (F.log(F.col("n_chars").cast("double")) - F.log(-F.log(u))) * 1000000
        )
        .cast("bigint")
        .alias("key_e6"),
    ).persist()
    sel = (
        keyed.select("source", "key_e6", "doc_id")
        .orderBy(F.desc("key_e6"), "doc_id")
        .limit(GUMBEL_K)  # TakeOrderedAndProject: per-partition top-K, no global sort
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sel"))
    )
    corpus = keyed.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_corpus"),
        F.sum("n_chars").cast("bigint").alias("chars_corpus"),
    )
    tot = keyed.agg(F.sum("n_chars").cast("bigint").alias("t"))
    return (
        corpus.join(sel, "source", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_corpus",
            F.coalesce(F.col("n_sel"), F.lit(0)).cast("bigint").alias("n_selected"),
            (
                F.coalesce(F.col("n_sel"), F.lit(0)).cast("double") / GUMBEL_K
            ).alias("selected_share"),
            (F.col("chars_corpus").cast("double") / F.col("t")).alias(
                "char_mass_share"
            ),
        )
        .orderBy("source")
    )
