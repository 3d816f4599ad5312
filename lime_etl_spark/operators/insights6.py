"""Round-8 operators: sequential experiment gating, character-entropy
profiling, rich-club graph structure, Gumbel weighted sampling,
off-policy IPS evaluation, embedding anisotropy, and next-event
predictability.

All ten are LLM-data-pipeline / analytics ops the reference has no
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
- `ev_offpolicy_ips` — inverse-propensity off-policy value estimates
  over the logged uniform 2-arm assignment (Horvitz-Thompson): the
  propensity is exactly 1/2, so the IPS weight is the integer 2 and
  the estimator is exact int64 cents end-to-end.
- `emb_dim_variance_audit` — per-dimension mean/variance/var-share on
  the 2^20 fixed-point grid: the dead-dim / dominant-dim anisotropy
  screen run before trusting cosine geometry.
- `ev_next_event_entropy` — H(next|cur) per event type on the 1e-6
  grid: the journey-predictability scalar ev_markov_transitions'
  matrix feeds.
- `dedup_minhash_bbit` — b-bit minhash compression trade (Li & König
  2010): low-b-bits signatures with the collision-floor-corrected
  estimator vs exact Jaccard — the bits-per-hash decision table for
  the dedup index.
- `samp_ks_split_drift` — exact two-sample Kolmogorov-Smirnov test of
  the length distribution across the shipped hash split, per language
  (integer cross-multiplied ECDFs): the continuous drift audit next
  to samp_split_balance's categorical one.
- `q_theil_decomposition` — Theil-T inequality decomposed into
  between-nation + within-nation components (the decomposability
  gini lacks); ln terms on the 1e-6 grid, identity pytest-pinned.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lime_etl_spark.functions.text import shingle_int, shingle_int_sql
from lime_etl_spark.plans.registry import register, track_persist
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
    agg AS (
        SELECT event_type,
               CAST(MAX(n_obs) AS BIGINT) AS total_obs,
               CAST(MAX_BY(llr_e6, n_obs) AS BIGINT) AS final_llr_e6,
               MIN(CASE WHEN llr_e6 >= {SPRT_UPPER_E6}
                          OR llr_e6 <= {SPRT_LOWER_E6} THEN n_obs END) AS cross_n,
               MIN_BY(llr_e6, CASE WHEN llr_e6 >= {SPRT_UPPER_E6}
                                     OR llr_e6 <= {SPRT_LOWER_E6} THEN n_obs END)
                   AS cross_llr
        FROM path GROUP BY event_type
    )
    SELECT event_type, total_obs, final_llr_e6,
           CASE WHEN cross_n IS NULL THEN 'continue'
                WHEN cross_llr >= {SPRT_UPPER_E6} THEN 'accept_h1'
                ELSE 'accept_h0' END AS decision,
           CAST(COALESCE(cross_n, total_obs) AS BIGINT) AS n_at_decision,
           CAST(COALESCE(cross_n, total_obs) AS DOUBLE) / total_obs
               AS obs_saved_share
    FROM agg
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
    double division.

    Scale: event_type has ~5 distinct values, so a bare
    `Window.partitionBy("event_type")` cumsum at EVENT grain is one
    sorted task per type holding that type's ENTIRE history (the
    low-cardinality-key window skew — r8's SCALE leg measured it at
    3.82× wall at 16× rows, the worst ratio in its family). The cumsum
    here runs per (event_type, ts-range shard) instead — the
    dq_id_time_monotonicity decomposition: shard ids are arithmetic on
    the broadcast (min, span) of unix-µs ts, so shard order refines
    the (ts, event_id) order and equal timestamps never split across
    shards; each shard computes a LOCAL running sum / row count in
    parallel, and the per-(type, shard) totals roster (≤ |types| ×
    N_SHARDS rows, bounded by construction) yields exclusive-prefix
    offsets that are broadcast back. global llr = offset + local
    cumsum — bit-identical to the single-partition window, no task
    ever holds more than one shard of one type. Crossings are filtered
    row-locally; output is |types| rows."""
    ev = load_table(spark, sf_dir, "events")
    n_shards = 256
    rows = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(F.col("value") > SPRT_CUT, F.lit(SPRT_INC_POS_E6))
        .otherwise(F.lit(SPRT_INC_NEG_E6))
        .alias("inc_e6"),
    )
    bounds = rows.agg(
        F.min("ts_us").alias("lo"),
        (F.max("ts_us") - F.min("ts_us") + 1).alias("span"),
    )
    sharded = rows.join(F.broadcast(bounds)).withColumn(
        "shard",
        ((F.col("ts_us") - F.col("lo")) * n_shards / F.col("span")).cast("bigint"),
    )
    w_in = (
        Window.partitionBy("event_type", "shard")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_rn = Window.partitionBy("event_type", "shard").orderBy("ts", "event_id")
    local = sharded.select(
        "event_type",
        "shard",
        F.sum("inc_e6").over(w_in).alias("lcum_e6"),
        F.row_number().over(w_rn).alias("lrn"),
    )
    # exclusive-prefix offsets over the bounded (type, shard) roster
    w_off = Window.partitionBy("event_type").orderBy("shard").rowsBetween(
        Window.unboundedPreceding, 0
    )
    offsets = (
        sharded.groupBy("event_type", "shard")
        .agg(F.sum("inc_e6").alias("s_tot"), F.count(F.lit(1)).alias("s_n"))
        .select(
            F.col("event_type").alias("o_type"),
            F.col("shard").alias("o_shard"),
            (F.sum("s_tot").over(w_off) - F.col("s_tot")).alias("off_llr"),
            (F.sum("s_n").over(w_off) - F.col("s_n")).alias("off_n"),
        )
    )
    path = local.join(
        F.broadcast(offsets),
        (F.col("event_type") == F.col("o_type")) & (F.col("shard") == F.col("o_shard")),
    ).select(
        "event_type",
        (F.col("off_llr") + F.col("lcum_e6")).alias("llr_e6"),
        (F.col("off_n") + F.col("lrn")).cast("int").alias("n_obs"),
    )
    # ONE aggregate over the window output — the first-crossing pick is
    # MIN/MIN_BY with a CASE ordering key (null = not a crossing; both
    # engines skip null-ordered rows in min_by, verified), so the
    # window pipeline runs ONCE instead of feeding two sibling
    # branches (the r8 plan audit showed the two-branch form paying
    # the events scan + window shuffle twice)
    crossing = F.when(
        (F.col("llr_e6") >= SPRT_UPPER_E6) | (F.col("llr_e6") <= SPRT_LOWER_E6),
        F.col("n_obs"),
    )
    agg = path.groupBy("event_type").agg(
        F.max("n_obs").cast("bigint").alias("total_obs"),
        F.max_by("llr_e6", "n_obs").cast("bigint").alias("final_llr_e6"),
        F.min(crossing).alias("cross_n"),
        F.min_by("llr_e6", crossing).alias("cross_llr_e6"),
    )
    return agg.select(
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
    ).orderBy("event_type")


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

    sh = track_persist(doc_shingles(load_table(spark, sf_dir, "documents")).persist())
    pairs = track_persist(
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
    # No forced broadcast (r10): deg has one row per ACTIVE doc — at
    # 100 TB that is billions of rows, past the 8 GB / 512M-row
    # broadcast cap. AQE still picks a broadcast join at any size
    # where it actually fits (it does at every test sf), so the local
    # plan is unchanged while the at-scale plan degrades to a shuffle
    # join instead of a driver OOM.
    edges = pairs.join(da, "doc_a").join(db, "doc_b")
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
    track_persist(keyed)
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


# ---------------------------------------------------------------------------
# ev_offpolicy_ips
# ---------------------------------------------------------------------------

# Logged assignment: the platform's uniform 2-arm md5 hash (propensity
# exactly 1/2 per arm, so the IPS weight is the integer 2).
IPS_POLICIES = (
    ("always_treat", "1"),
    ("always_control", "0"),
    ("even_users_treated", "CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END"),
)


def _ips_sql() -> str:
    from lime_etl_spark.operators.training import _bucket_sql

    legs = "\n        UNION ALL\n".join(
        f"""
        SELECT '{name}' AS policy,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN logged_arm = ({pi}) THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_matched,
               CAST(SUM(CASE WHEN logged_arm = ({pi}) THEN 2 * r_cents ELSE 0 END)
                   AS BIGINT) AS ips_cents,
               CAST(SUM(r_cents) AS BIGINT) AS logged_cents
        FROM per_user"""
        for name, pi in IPS_POLICIES
    )
    return f"""
    WITH users AS (SELECT DISTINCT user_id FROM events),
    rewards AS (
        SELECT user_id,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS r_cents
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    per_user AS (
        SELECT u.user_id,
               {_bucket_sql("u.user_id", 2)} AS logged_arm,
               COALESCE(r.r_cents, 0) AS r_cents
        FROM users u LEFT JOIN rewards r USING (user_id)
    ),
    legs AS ({legs})
    SELECT policy, n_users, n_matched,
           CAST(ips_cents AS DOUBLE) / (100.0 * n_users) AS ips_value_per_user,
           CAST(logged_cents AS DOUBLE) / (100.0 * n_users) AS logged_value_per_user,
           CAST(n_matched AS DOUBLE) / n_users AS match_rate
    FROM legs ORDER BY policy
    """


@register(
    "ev_offpolicy_ips",
    oracle=_ips_sql(),
    description="off-policy evaluation via inverse propensity scoring over the logged uniform 2-arm assignment: IPS value estimate per candidate policy (exact integer cents, weight = 2) vs the logged mean — the counterfactual readout before shipping a targeting rule",
)
def ev_offpolicy_ips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation (Horvitz-Thompson / IPS): estimate what a
    CANDIDATE targeting policy would have earned from logs collected
    under the uniform md5 2-arm assignment, without running it —
    V̂(π) = (1/N)·Σ_u 1{a_u = π(u)}·R_u/0.5. Because the logged
    propensity is exactly 1/2, the weight is the INTEGER 2 and the
    whole estimator is exact int64 cents until the final per-user
    divisions. always_treat / always_control bracket the ladder (their
    n_matched splits are the SRM counts) and a covariate policy sits
    between; an unbiased IPS pipeline reproduces the logged mean when
    π ≡ the logged assignment.

    Scale: one distinct-users pass + one purchase rollup (map-side
    combined), policies evaluated as CASE tags inside ONE aggregate
    over the per-user frame (the union-legs-in-one-job discipline);
    output is |policies| rows."""
    from lime_etl_spark.operators.training import hash_bucket
    from lime_etl_spark.functions.numeric import dec

    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    rewards = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg((F.sum(dec("value", 2, 12)) * 100).cast("bigint").alias("r_cents"))
    )
    per_user = users.join(rewards, "user_id", "left").select(
        "user_id",
        hash_bucket(F.col("user_id"), 2).alias("logged_arm"),
        F.coalesce("r_cents", F.lit(0)).alias("r_cents"),
    )
    pis = {
        "always_treat": F.lit(1).cast("bigint"),
        "always_control": F.lit(0).cast("bigint"),
        "even_users_treated": F.when(F.col("user_id") % 2 == 0, 1)
        .otherwise(0)
        .cast("bigint"),
    }
    legs = [
        per_user.agg(
            F.lit(name).alias("policy"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum(F.when(F.col("logged_arm") == pi, 1).otherwise(0))
            .cast("bigint")
            .alias("n_matched"),
            F.sum(
                F.when(F.col("logged_arm") == pi, 2 * F.col("r_cents")).otherwise(0)
            )
            .cast("bigint")
            .alias("ips_cents"),
            F.sum("r_cents").cast("bigint").alias("logged_cents"),
        )
        for name, pi in pis.items()
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.select(
        "policy",
        "n_users",
        "n_matched",
        (F.col("ips_cents").cast("double") / (100.0 * F.col("n_users"))).alias(
            "ips_value_per_user"
        ),
        (F.col("logged_cents").cast("double") / (100.0 * F.col("n_users"))).alias(
            "logged_value_per_user"
        ),
        (F.col("n_matched").cast("double") / F.col("n_users")).alias("match_rate"),
    ).orderBy("policy")


# ---------------------------------------------------------------------------
# emb_dim_variance_audit
# ---------------------------------------------------------------------------

DIM_FP = 1 << 20  # 2^20 fixed-point grid (the kmeans_fit convention)


@register(
    "emb_dim_variance_audit",
    oracle=f"""
    WITH q AS (
        SELECT d.dim - 1 AS dim,
               CAST(FLOOR(CAST(e.v AS DOUBLE) * {DIM_FP}) AS BIGINT) AS qv
        FROM (
            SELECT UNNEST(CAST(embedding AS DOUBLE[])) AS v,
                   UNNEST(generate_series(1, len(embedding))) AS dim
            FROM embeddings
        ) AS d(v, dim), LATERAL (SELECT d.v AS v) e
    ),
    stats AS (
        SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(qv) AS BIGINT) AS s,
               CAST(SUM(qv * qv) AS BIGINT) AS ss,
               CAST(n * ss - s * s AS BIGINT) AS num
        FROM q GROUP BY dim
    ),
    -- fixed-length arrays make n identical across dims, so the share
    -- reduces to num_d / Σ num_d: EXACT integers (decimal total for
    -- headroom), never an order-dependent float sum of per-dim vars
    tot AS (SELECT SUM(CAST(num AS DECIMAL(38,0))) AS tnum FROM stats)
    SELECT CAST(dim AS INTEGER) AS dim, n,
           (CAST(s AS DOUBLE) / n) / {DIM_FP} AS mean_value,
           (CAST(num AS DOUBLE) / (CAST(n AS DOUBLE) * n))
               / ({DIM_FP}.0 * {DIM_FP}) AS variance,
           CAST(num AS DOUBLE) / CAST(tot.tnum AS DOUBLE) AS var_share
    FROM stats CROSS JOIN tot
    ORDER BY dim
    """,
    description="per-dimension mean/variance/variance-share of the embedding space on the 2^20 fixed-point grid — the dead-dim / dominant-dim health audit run before trusting cosine geometry",
)
def emb_dim_variance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space anisotropy audit: per dimension, mean, variance,
    and the dimension's share of total variance. Dead dims (variance
    ~0) waste index bytes; a dominant dim (share >> 1/d) makes cosine
    effectively 1-dimensional — both are embedding-model pathologies
    caught here before ANN tuning effort is spent. Complements
    emb_fisher_ratio (between/within labels) with an unconditional
    second-moment view.

    Exactness: elements are quantized once to the 2^20 fixed-point
    grid (the kmeans_fit convention — floor is a row-local fixed-shape
    op), then every Σq and Σq² is exact int64; n·Σq²−(Σq)² assembles
    in int64 (bounded: |q|≤2^20 ⇒ Σq² ≤ n·2^40 — at 1e10 rows shard
    the sum in DECIMAL before the division) and pays ONE double
    division per output cell. Scale: posexplode combines map-side to
    |dims| counter rows; output is |dims| rows joined to a 1-row
    total."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    ).select("dim", F.floor(F.col("v") * DIM_FP).cast("bigint").alias("qv"))
    stats = q.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qv").cast("bigint").alias("s"),
        F.sum(F.col("qv") * F.col("qv")).cast("bigint").alias("ss"),
    ).withColumn(
        "num",
        (F.col("n") * F.col("ss") - F.col("s") * F.col("s")).cast("bigint"),
    )
    var_fp = F.col("num").cast("double") / (F.col("n").cast("double") * F.col("n"))
    # fixed-length arrays make n identical across dims, so var_share
    # reduces to num_d / Σ num_d — EXACT integers (decimal total for
    # headroom), never an order-dependent float sum of per-dim vars
    tot = stats.agg(F.sum(F.col("num").cast("decimal(38,0)")).alias("tnum"))
    return (
        stats.crossJoin(F.broadcast(tot))
        .select(
            F.col("dim").cast("int").alias("dim"),
            "n",
            ((F.col("s").cast("double") / F.col("n")) / DIM_FP).alias("mean_value"),
            (var_fp / (float(DIM_FP) * DIM_FP)).alias("variance"),
            (F.col("num").cast("double") / F.col("tnum").cast("double")).alias(
                "var_share"
            ),
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# ev_next_event_entropy
# ---------------------------------------------------------------------------


@register(
    "ev_next_event_entropy",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    trans AS (
        SELECT event_type, nxt, CAST(COUNT(*) AS BIGINT) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY event_type, nxt
    ),
    outs AS (
        SELECT event_type, CAST(SUM(c) AS BIGINT) AS tot,
               CAST(COUNT(*) AS BIGINT) AS n_successors
        FROM trans GROUP BY event_type
    ),
    terms AS (
        SELECT t.event_type, o.tot, o.n_successors,
               CAST(FLOOR((t.c * log2(CAST(o.tot AS DOUBLE) / t.c)) * 1000000)
                    AS BIGINT) AS bits_e6
        FROM trans t JOIN outs o USING (event_type)
    )
    SELECT event_type,
           ANY_VALUE(tot) AS n_transitions,
           ANY_VALUE(n_successors) AS n_successors,
           CAST(SUM(bits_e6) AS DOUBLE) / (ANY_VALUE(tot) * 1000000.0)
               AS next_entropy_bits,
           CAST(SUM(bits_e6) AS DOUBLE)
               / (ANY_VALUE(tot) * 1000000.0 * log2(CAST(ANY_VALUE(n_successors) AS DOUBLE)))
               AS normalized_entropy
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
    description="next-event predictability: Shannon entropy of each event type's successor distribution (the scalar the ev_markov_transitions matrix feeds) — low entropy = scripted journeys, high = exploratory; 1e-6-grid term bits",
)
def ev_next_event_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How predictable is the NEXT event given the current one?
    H(next|cur=t) per event type, plus the n-ary-normalized form
    (entropy / log2(successors)) so types with different fan-outs
    compare. The single-scalar summary of ev_markov_transitions'
    matrix: funnels/scripted flows score near 0, exploratory surfaces
    near 1 — the journey-predictability number a personalization
    pipeline tracks for drift.

    Exactness: the successor histogram is exact int64; each term
    c·log2(tot/c) is one fixed-shape chain floored to 1e-6 (the
    txt_entropy_profile discipline); entropy is an int64 term sum with
    one double division (and one more for the normalized form —
    log2(k) of a small int is deterministic). Scale: one lag window
    per user (the sessionize shuffle), then counter-grain rollups to
    |types|² and |types| rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).where(F.col("nxt").isNotNull())
    trans = seq.groupBy("event_type", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    outs = trans.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("n_successors"),
    )
    terms = trans.join(outs, "event_type").select(
        "event_type",
        "tot",
        "n_successors",
        F.floor(
            (F.col("c") * F.log2(F.col("tot").cast("double") / F.col("c"))) * 1000000
        )
        .cast("bigint")
        .alias("bits_e6"),
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.first("tot").alias("n_transitions"),
            F.first("n_successors").alias("n_successors"),
            (
                F.sum("bits_e6").cast("double") / (F.first("tot") * 1000000.0)
            ).alias("next_entropy_bits"),
            (
                F.sum("bits_e6").cast("double")
                / (
                    F.first("tot")
                    * 1000000.0
                    * F.log2(F.first("n_successors").cast("double"))
                )
            ).alias("normalized_entropy"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# dedup_minhash_bbit
# ---------------------------------------------------------------------------

BBIT_LEGS = (1, 2, 4)  # b-bit widths probed next to the full-width estimator


def _bbit_sql() -> str:
    from lime_etl_spark.functions.text import MERSENNE_P, MINHASH_PERMS
    from lime_etl_spark.operators.dedup import _SHINGLES_SQL, BAND_ROWS, N_BANDS

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
    k = len(MINHASH_PERMS)

    def match_sum(mask: int | None) -> str:
        if mask is None:
            return " + ".join(
                f"(CASE WHEN a.mh_{j} = b.mh_{j} THEN 1 ELSE 0 END)"
                for j in range(k)
            )
        return " + ".join(
            f"(CASE WHEN (a.mh_{j} & {mask}) = (b.mh_{j} & {mask}) THEN 1 ELSE 0 END)"
            for j in range(k)
        )

    legs = []
    for b in BBIT_LEGS:
        two_b = 1 << b
        legs.append(
            f"""
        SELECT 'b{b}' AS leg, CAST({16 * b} AS BIGINT) AS bits_per_sig,
               CAST(FLOOR((CAST(m{b} * {two_b} - {k} AS DOUBLE) * 1000000)
                          / {k * (two_b - 1)}) AS BIGINT) AS est_e6,
               jq
        FROM scored"""
        )
    legs.append(
        f"""
        SELECT 'full' AS leg, CAST({16 * 61} AS BIGINT) AS bits_per_sig,
               CAST(mfull * {1_000_000 // k} AS BIGINT) AS est_e6, jq
        FROM scored"""
    )
    m_cols = ", ".join(
        f"({match_sum((1 << b) - 1)}) AS m{b}" for b in BBIT_LEGS
    )
    union = "\n        UNION ALL\n".join(legs)
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
        SELECT {m_cols}, ({match_sum(None)}) AS mfull,
               (1000000 * i.n_inter) // (sa.n_sh + sb.n_sh - i.n_inter) AS jq
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        JOIN sigs a ON a.doc_id = i.doc_a
        JOIN sigs b ON b.doc_id = i.doc_b
    ),
    legs AS ({union})
    SELECT leg, bits_per_sig,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(est_e6) AS DOUBLE) / (COUNT(*) * 1000000.0) AS mean_est_jaccard,
           CAST(SUM(jq) AS DOUBLE) / (COUNT(*) * 1000000.0) AS mean_exact_jaccard,
           CAST(SUM(ABS(est_e6 - jq)) AS DOUBLE) / (COUNT(*) * 1000000.0)
               AS mean_abs_err
    FROM legs GROUP BY leg, bits_per_sig ORDER BY leg
    """


@register(
    "dedup_minhash_bbit",
    oracle=_bbit_sql(),
    description="b-bit minhash compression trade (Li & Konig 2010): keep only the low b bits of each of the 16 minhash values — unbiased estimator (m·2^b−k)/(k·(2^b−1)) vs exact Jaccard on the LSH candidates, per b ∈ {1,2,4} next to the full-width estimator",
)
def dedup_minhash_bbit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The signature-compression decision table for minhash at scale:
    b-bit minhash (Li & König, WWW 2010) stores only the low b bits of
    each permutation's minimum — a 16-perm signature shrinks from
    ~976 bits to 16·b — and corrects the collision floor with
    Ĵ_b = (m/k − 1/2^b)/(1 − 1/2^b). One row per width (b=1/2/4 and
    the full-width reference) with mean estimate, mean exact Jaccard
    and mean |error| over the same LSH candidate pairs
    dedup_minhash_estimate_error calibrates on — the measured
    answer to "how many bits per hash does the dedup index need".

    Exactness: m is an exact int match count; the estimator is one
    fixed-shape chain per distinct (m, b) (double division + FLOOR to
    the 1e-6 grid — 17 distinct m values per leg); errors are int64
    |est−jq|; every mean is one double division of int sums. The four
    legs are tags over ONE scored pair frame (single job), not four
    pipelines.

    Scale: identical cost shape to the estimate-error query — the
    pair frame tracks |LSH candidates|, never corpus²; the b-bit
    masks are row-local bitwise ops on the 16-column signature rows."""
    from lime_etl_spark.functions.text import MINHASH_PERMS
    from lime_etl_spark.operators.dedup import (
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )

    k = len(MINHASH_PERMS)
    docs = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(docs).persist()
    track_persist(sh)
    sigs = minhash_signatures(sh).persist()
    track_persist(sigs)
    cand = lsh_candidates(sigs)
    exact = jaccard_pairs(sh, candidates=cand, with_counts=True).select(
        "doc_a",
        "doc_b",
        F.expr("1000000 * n_inter div (n_a + n_b - n_inter)").alias("jq"),
    )
    a = sigs.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"mh_{j}").alias(f"a_{j}") for j in range(k)]
    )
    b_side = sigs.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"mh_{j}").alias(f"b_{j}") for j in range(k)]
    )

    def m_col(mask: int | None) -> F.Column:
        if mask is None:
            terms = [
                F.when(F.col(f"a_{j}") == F.col(f"b_{j}"), 1).otherwise(0)
                for j in range(k)
            ]
        else:
            terms = [
                F.when(
                    F.col(f"a_{j}").bitwiseAND(F.lit(mask))
                    == F.col(f"b_{j}").bitwiseAND(F.lit(mask)),
                    1,
                ).otherwise(0)
                for j in range(k)
            ]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    scored = (
        exact.join(a, "doc_a")
        .join(b_side, "doc_b")
        .select(
            "jq",
            *[m_col((1 << b) - 1).alias(f"m{b}") for b in BBIT_LEGS],
            m_col(None).alias("mfull"),
        )
    )
    leg_structs = [
        F.struct(
            F.lit(f"b{b}").alias("leg"),
            F.lit(16 * b).cast("bigint").alias("bits_per_sig"),
            F.floor(
                ((F.col(f"m{b}") * (1 << b) - k).cast("double") * 1000000)
                / (k * ((1 << b) - 1))
            )
            .cast("bigint")
            .alias("est_e6"),
        )
        for b in BBIT_LEGS
    ] + [
        F.struct(
            F.lit("full").alias("leg"),
            F.lit(16 * 61).cast("bigint").alias("bits_per_sig"),
            (F.col("mfull") * (1_000_000 // k)).cast("bigint").alias("est_e6"),
        )
    ]
    legs = scored.select(
        "jq", F.explode(F.array(*leg_structs)).alias("L")
    ).select("jq", "L.leg", "L.bits_per_sig", "L.est_e6")
    return (
        legs.groupBy("leg", "bits_per_sig")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            (F.sum("est_e6").cast("double") / (F.count(F.lit(1)) * 1000000.0)).alias(
                "mean_est_jaccard"
            ),
            (F.sum("jq").cast("double") / (F.count(F.lit(1)) * 1000000.0)).alias(
                "mean_exact_jaccard"
            ),
            (
                F.sum(F.abs(F.col("est_e6") - F.col("jq"))).cast("double")
                / (F.count(F.lit(1)) * 1000000.0)
            ).alias("mean_abs_err"),
        )
        .orderBy("leg")
    )


# ---------------------------------------------------------------------------
# samp_ks_split_drift
# ---------------------------------------------------------------------------

KS_TRAIN_CUT = 80  # the shipped 80/20 hash split (samp_hash_split's bucket)


def _ks_sql() -> str:
    from lime_etl_spark.operators.training import _bucket_sql

    return f"""
    WITH tagged AS (
        SELECT lang, CAST(n_chars AS BIGINT) AS v,
               CASE WHEN {_bucket_sql("doc_id", 100)} < {KS_TRAIN_CUT}
                    THEN 1 ELSE 0 END AS is_train
        FROM documents
    ),
    cells AS (
        SELECT lang, v,
               CAST(SUM(is_train) AS BIGINT) AS a,
               CAST(SUM(1 - is_train) AS BIGINT) AS b
        FROM tagged GROUP BY lang, v
    ),
    cum AS (
        SELECT lang, v,
               SUM(a) OVER (PARTITION BY lang ORDER BY v) AS c1,
               SUM(b) OVER (PARTITION BY lang ORDER BY v) AS c2,
               SUM(a) OVER (PARTITION BY lang) AS n1,
               SUM(b) OVER (PARTITION BY lang) AS n2
        FROM cells
    ),
    d AS (
        SELECT lang, v, n1, n2, ABS(c1 * n2 - c2 * n1) AS dnum,
               MAX(ABS(c1 * n2 - c2 * n1)) OVER (PARTITION BY lang) AS dmax
        FROM cum
    )
    SELECT lang,
           CAST(ANY_VALUE(n1) AS BIGINT) AS n_train,
           CAST(ANY_VALUE(n2) AS BIGINT) AS n_eval,
           CAST(ANY_VALUE(dmax) AS BIGINT) AS d_numerator,
           CAST(ANY_VALUE(dmax) AS DOUBLE) / (ANY_VALUE(n1) * ANY_VALUE(n2))
               AS ks_stat,
           CAST(MIN(CASE WHEN dnum = dmax THEN v END) AS BIGINT) AS ks_at_value
    FROM d GROUP BY lang ORDER BY lang
    """


@register(
    "samp_ks_split_drift",
    oracle=_ks_sql(),
    description="two-sample Kolmogorov-Smirnov test of the doc-length distribution across the shipped 80/20 hash split, per language — exact integer D numerator max|c1*n2 - c2*n1|, one division; the continuous-distribution drift audit next to samp_split_balance's categorical one",
)
def samp_ks_split_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the hash split preserve the SHAPE of the length
    distribution, not just category counts? Per language, the exact
    two-sample KS statistic D = max_v |F_train(v) − F_eval(v)| over
    doc lengths, against the same bucket hash samp_hash_split ships —
    a hash that accidentally correlates with length would make every
    cross-split loss comparison invalid in a way the categorical
    balance table (samp_split_balance) cannot see.

    Exactness: D's numerator is max |c1·n2 − c2·n1| — pure int64
    (cross-multiplied ECDFs, no division until the final ks_stat);
    the argmax value ties to the smallest v. Scale: one counter
    groupBy to (lang, value) cells, two windows PARTITIONED by lang
    over value-grain rows (bounded by |distinct lengths| per lang,
    never doc-grain), output |langs| rows."""
    from lime_etl_spark.operators.training import hash_bucket

    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.select(
        "lang",
        F.col("n_chars").cast("bigint").alias("v"),
        F.when(hash_bucket(F.col("doc_id"), 100) < KS_TRAIN_CUT, 1)
        .otherwise(0)
        .alias("is_train"),
    )
    cells = tagged.groupBy("lang", "v").agg(
        F.sum("is_train").cast("bigint").alias("a"),
        F.sum(1 - F.col("is_train")).cast("bigint").alias("b"),
    )
    wv = Window.partitionBy("lang").orderBy("v")
    wl = Window.partitionBy("lang")
    cum = cells.select(
        "lang",
        "v",
        F.sum("a").over(wv).alias("c1"),
        F.sum("b").over(wv).alias("c2"),
        F.sum("a").over(wl).alias("n1"),
        F.sum("b").over(wl).alias("n2"),
    )
    d = cum.select(
        "lang",
        "v",
        "n1",
        "n2",
        F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")).alias("dnum"),
    ).withColumn("dmax", F.max("dnum").over(wl))
    return (
        d.groupBy("lang")
        .agg(
            F.first("n1").cast("bigint").alias("n_train"),
            F.first("n2").cast("bigint").alias("n_eval"),
            F.first("dmax").cast("bigint").alias("d_numerator"),
            (
                F.first("dmax").cast("double") / (F.first("n1") * F.first("n2"))
            ).alias("ks_stat"),
            F.min(F.when(F.col("dnum") == F.col("dmax"), F.col("v")))
            .cast("bigint")
            .alias("ks_at_value"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q_theil_decomposition
# ---------------------------------------------------------------------------


@register(
    "q_theil_decomposition",
    oracle="""
    WITH r AS (
        SELECT c.c_custkey, c.c_nationkey,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS cents
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_nationkey
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS x
        FROM r
    ),
    g AS (
        SELECT r.c_nationkey, CAST(COUNT(*) AS BIGINT) AS ng,
               CAST(SUM(cents) AS BIGINT) AS xg
        FROM r GROUP BY r.c_nationkey
    ),
    inner_terms AS (
        SELECT r.c_nationkey,
               CAST(SUM(r.cents * CAST(FLOOR(ln((CAST(g.ng AS DOUBLE) * r.cents) / g.xg)
                                             * 1000000) AS BIGINT)) AS BIGINT)
                   AS within_num
        FROM r JOIN g ON g.c_nationkey = r.c_nationkey
        GROUP BY r.c_nationkey
    )
    SELECT n.n_name AS nation,
           g.ng AS n_buyers,
           g.xg AS revenue_cents,
           CAST(g.xg AS DOUBLE) / tot.x AS revenue_share,
           CAST(i.within_num AS DOUBLE) / (CAST(g.xg AS DOUBLE) * 1000000)
               AS theil_within,
           (CAST(g.xg AS DOUBLE) / tot.x)
             * (CAST(FLOOR(ln((CAST(tot.n AS DOUBLE) * g.xg)
                              / (CAST(tot.x AS DOUBLE) * g.ng)) * 1000000) AS BIGINT)
                / 1000000.0) AS theil_between_term
    FROM g
    JOIN inner_terms i ON i.c_nationkey = g.c_nationkey
    JOIN nation n ON n.n_nationkey = g.c_nationkey
    CROSS JOIN tot
    ORDER BY nation
    """,
    description="Theil-T inequality decomposition of customer revenue by nation: per-nation within-group inequality + between-group term (the decomposability gini lacks); ln terms on the 1e-6 grid, int64 sums, two divisions per row",
)
def q_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration decomposition: the Theil-T index is the
    one standard inequality measure that decomposes EXACTLY into a
    between-group term plus a revenue-weighted within-group average —
    so 'is revenue inequality a nation-mix story or an intra-nation
    whale story?' gets a number per component (gini, already shipped
    as q_gini_revenue, cannot be decomposed this way). Output per
    nation: buyer count, revenue share, within-nation Theil T_g and
    the nation's between-term; Σ share·T_g + Σ between ≈ corpus Theil
    (pytest pins the identity to the 1e-6 grid the ln floors allow).

    Exactness: revenues are exact int64 cents; each ln term is ONE
    fixed-shape chain per distinct (cents, group) input (ratio of
    exact ints → ln → ×1e6 → floor), summed as int64 and divided once
    per output cell. Scale: one orders rollup (map-side combined), a
    broadcast nation join, |nations| output rows; per-row ln terms
    ride the same shuffle as the rollup."""
    from lime_etl_spark.functions.numeric import dec

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    r = (
        orders.join(
            cust.select(
                F.col("c_custkey").alias("o_custkey"), "c_nationkey"
            ),
            "o_custkey",
        )
        .groupBy("o_custkey", "c_nationkey")
        .agg((F.sum(dec("o_totalprice", 2, 18)) * 100).cast("bigint").alias("cents"))
    )
    tot = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("x"),
    )
    g = r.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("cents").cast("bigint").alias("xg"),
    )
    inner = (
        r.join(F.broadcast(g), "c_nationkey")
        .select(
            "c_nationkey",
            (
                F.col("cents")
                * F.floor(
                    F.log(
                        (F.col("ng").cast("double") * F.col("cents")) / F.col("xg")
                    )
                    * 1000000
                ).cast("bigint")
            ).alias("term"),
        )
        .groupBy("c_nationkey")
        .agg(F.sum("term").cast("bigint").alias("within_num"))
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    return (
        g.join(inner, "c_nationkey")
        .join(F.broadcast(nation), "c_nationkey")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n_name").alias("nation"),
            F.col("ng").alias("n_buyers"),
            F.col("xg").alias("revenue_cents"),
            (F.col("xg").cast("double") / F.col("x")).alias("revenue_share"),
            (
                F.col("within_num").cast("double")
                / (F.col("xg").cast("double") * 1000000)
            ).alias("theil_within"),
            (
                (F.col("xg").cast("double") / F.col("x"))
                * (
                    F.floor(
                        F.log(
                            (F.col("n").cast("double") * F.col("xg"))
                            / (F.col("x").cast("double") * F.col("ng"))
                        )
                        * 1000000
                    ).cast("bigint")
                    / 1000000.0
                )
            ).alias("theil_between_term"),
        )
        .orderBy("nation")
    )
