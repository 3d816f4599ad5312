"""Round-9 operators: discrete-time churn hazard, design-based
(Horvitz-Thompson) estimation audit, and near-dup graph modularity.

All three are analytics / LLM-data-pipeline ops the reference has no
analog for (lime-etl is orchestration-only); same engine discipline as
their siblings: integer-exact aggregates with one final double
division, deterministic md5-bridge ordering, fixed-point grids where a
fraction must cross engines, identical expression structure in the
DuckDB oracle, and total output orders.

- `ev_hazard_rate` — discrete-time hazard h(k) = P(churn on day k |
  survived k−1, observable ≥ k) over user activity spans with the
  same right-censoring as ev_survival_curve: the per-day churn
  intensity the survival curve integrates, and the lifecycle-model
  input (public survival-analysis formulation, Kalbfleisch &
  Prentice). Integer counters end-to-end, one guarded division.
- `samp_horvitz_thompson` — the estimation audit of the PPS design:
  re-runs samp_pps_systematic's exact integer stride walk and checks
  the Horvitz-Thompson/Hansen-Hurwitz estimate of a DIFFERENT total
  (corpus chars, weighted by token-mass inclusion) against the true
  total. Per-pick terms are fixed-point 1e-6 integers with a
  DOCUMENTED evaluation order ((chars·picks·1e6) div tokens, then
  × stride), so the sum is order-free int64 and the oracle replays it
  bit-for-bit — the design-unbiasedness check a sampling pipeline
  ships next to its sampler.
- `graph_modularity` — Newman modularity Q of the SOURCE partition
  over the verified near-dup graph (Newman & Girvan 2004):
  Q = Σ_c [e_c/m − (d_c/2m)²], computed exactly as
  Σ_c (4m·e_c − d_c²) / (4m²) — integer cross-multiplication, ONE
  final double division. High Q = near-duplication stays inside
  sources (per-source dedup shards cleanly); low/negative Q = heavy
  cross-source duplication (dedup must run globally). The partition
  diagnostic next to dedup_cross_source_matrix's raw counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lime_etl_spark.functions.text import shingle_int, shingle_int_sql
from lime_etl_spark.plans.registry import register, track_persist
from lime_etl_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# ev_hazard_rate
# ---------------------------------------------------------------------------

HAZARD_MAX_K = 14  # consecutive day grid 1..K (hazard needs adjacency)


@register(
    "ev_hazard_rate",
    oracle=f"""
    WITH spans AS (
        SELECT user_id,
               MIN(CAST(ts AS DATE)) AS first_d,
               MAX(CAST(ts AS DATE)) AS last_d
        FROM events GROUP BY user_id
    ), m AS (SELECT MAX(last_d) AS maxd FROM spans),
    expanded AS (
        SELECT s.user_id, k.k,
               date_diff('day', s.first_d, s.last_d) AS span_days,
               date_diff('day', s.first_d, m.maxd) AS window_days
        FROM spans s
        CROSS JOIN m
        CROSS JOIN (SELECT CAST(range AS INT) + 1 AS k
                    FROM range({HAZARD_MAX_K})) AS k
    )
    SELECT k AS day_k,
           CAST(SUM(CASE WHEN span_days >= k - 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_at_risk,
           CAST(SUM(CASE WHEN span_days = k - 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_churned,
           CASE WHEN SUM(CASE WHEN span_days >= k - 1 THEN 1 ELSE 0 END) > 0
                THEN CAST(SUM(CASE WHEN span_days = k - 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     / SUM(CASE WHEN span_days >= k - 1 THEN 1 ELSE 0 END)
                ELSE 0.0 END AS hazard
    FROM expanded
    WHERE window_days >= k
    GROUP BY k
    ORDER BY day_k
    """,
    description="discrete-time churn hazard h(k): among users who survived k-1 days and are observable >= k days, the share whose span ended exactly at k-1 — the per-day churn intensity ev_survival_curve integrates",
)
def ev_hazard_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The churn-intensity companion to ev_survival_curve: for each
    day k on a CONSECUTIVE grid, h(k) = n_churned(k) / n_at_risk(k)
    where the risk set is users whose span reached k−1 AND whose
    observation window covers day k (right-censoring — users who
    joined too late to prove day-k survival never enter either count,
    exactly the survival curve's censoring rule, so S(k) = Π(1−h(j))
    holds on the shared censored population; pytest pins the
    identity on a planted cohort).

    Scale: identical posture to ev_survival_curve — one map-side
    combining per-user reduce, a 1-row max-date broadcast, the ×K
    expansion over the REDUCED user frame, integer counters to a
    K-row output."""
    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_d"),
        F.max(F.to_date("ts")).alias("last_d"),
    )
    m = spans.agg(F.max("last_d").alias("maxd"))
    ks = F.explode(
        F.sequence(F.lit(1), F.lit(HAZARD_MAX_K))
    ).alias("k")
    expanded = (
        spans.crossJoin(F.broadcast(m))
        .select(
            ks,
            F.datediff("last_d", "first_d").alias("span_days"),
            F.datediff("maxd", "first_d").alias("window_days"),
        )
        .where(F.col("window_days") >= F.col("k"))
    )
    at_risk = F.sum(
        F.when(F.col("span_days") >= F.col("k") - 1, 1).otherwise(0)
    ).cast("bigint")
    churned = F.sum(
        F.when(F.col("span_days") == F.col("k") - 1, 1).otherwise(0)
    ).cast("bigint")
    return (
        expanded.groupBy(F.col("k").alias("day_k"))
        .agg(at_risk.alias("n_at_risk"), churned.alias("n_churned"))
        .select(
            F.col("day_k").cast("int").alias("day_k"),
            "n_at_risk",
            "n_churned",
            F.when(
                F.col("n_at_risk") > 0,
                F.col("n_churned").cast("double") / F.col("n_at_risk"),
            )
            .otherwise(F.lit(0.0))
            .alias("hazard"),
        )
        .orderBy("day_k")
    )


# ---------------------------------------------------------------------------
# samp_horvitz_thompson
# ---------------------------------------------------------------------------

HT_K = 100  # the PPS design's target pick count (samp_pps_systematic)


@register(
    "samp_horvitz_thompson",
    oracle=f"""
    WITH w AS (
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               {shingle_int_sql("CAST(doc_id AS VARCHAR)")} AS h
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_chars, n_tokens,
               SUM(n_tokens) OVER (
                   ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM w
    ),
    tot AS (
        SELECT GREATEST(SUM(n_tokens) // {HT_K}, 1) AS stride,
               CAST(SUM(n_chars) AS BIGINT) AS true_chars
        FROM w
    ),
    picks AS (
        SELECT doc_id, n_chars, n_tokens,
               (cum // stride) - ((cum - n_tokens) // stride) AS n_picks
        FROM c, tot
        WHERE (cum // stride) - ((cum - n_tokens) // stride) > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_picked_docs,
           CAST(SUM(n_picks) AS BIGINT) AS n_picks_total,
           CAST((SELECT stride FROM tot) AS BIGINT) AS stride,
           CAST((SELECT true_chars FROM tot) AS BIGINT) AS true_chars,
           CAST(SUM(((n_chars * n_picks * 1000000) // n_tokens)
                    * (SELECT stride FROM tot)) AS BIGINT) AS ht_chars_e6,
           CAST(SUM(((n_chars * n_picks * 1000000) // n_tokens)
                    * (SELECT stride FROM tot))
                - (SELECT true_chars FROM tot) * 1000000 AS DOUBLE)
             / ((SELECT true_chars FROM tot) * 1000000) AS rel_err
    FROM picks
    """,
    description="Horvitz-Thompson estimation audit of the PPS systematic design: estimate total corpus chars from the token-mass-weighted sample via exact fixed-point per-pick terms; reports the estimate and its relative error against the true total",
)
def samp_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Design-based estimation closes the sampling loop: the PPS
    sampler (samp_pps_systematic — identical stride walk, re-derived
    here) promises that Σ x_i·picks_i·stride/w_i is unbiased for ANY
    total X, not just the size measure it was weighted by. This audit
    estimates total corpus CHARS from the token-weighted sample and
    reports the relative error — the check a data pipeline ships next
    to its sampler so downstream consumers can trust sample-based
    corpus statistics.

    Exactness: per-pick terms are 1e-6 fixed point with the
    DOCUMENTED order ((chars·picks·1e6) div tokens, then × stride) —
    int64 the whole way, order-free sum, ONE final double division
    for rel_err. Scale: the cumulative line is the sharded
    with_global_cumsum; the pick set is ~HT_K rows; the true total is
    a 1-row map-side-combined aggregate."""
    from lime_etl_spark.functions.ranks import with_global_cumsum

    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    ).withColumn("h", shingle_int(F.col("doc_id").cast("string")))
    c = with_global_cumsum(
        w, F.col("h"), [F.col("h"), F.col("doc_id")], "n_tokens", out="cum"
    )
    tot = w.agg(
        F.greatest(F.expr(f"SUM(n_tokens) div {HT_K}"), F.lit(1).cast("bigint")).alias(
            "stride"
        ),
        F.sum("n_chars").cast("bigint").alias("true_chars"),
    )
    n_picks = F.expr("cum div stride") - F.expr("(cum - n_tokens) div stride")
    picks = (
        c.join(F.broadcast(tot))
        .withColumn("n_picks", n_picks)
        .where(F.col("n_picks") > 0)
    )
    term = F.expr("((n_chars * n_picks * 1000000) div n_tokens) * stride")
    return picks.groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_picked_docs"),
        F.sum("n_picks").cast("bigint").alias("n_picks_total"),
        F.first("stride").alias("stride"),
        F.first("true_chars").alias("true_chars"),
        F.sum(term).cast("bigint").alias("ht_chars_e6"),
        (
            (F.sum(term) - F.first("true_chars") * F.lit(1000000)).cast("double")
            / (F.first("true_chars") * F.lit(1000000))
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# graph_modularity
# ---------------------------------------------------------------------------


def _modularity_sql() -> str:
    from lime_etl_spark.operators.dedup import _minhash_sql

    return f"""
    WITH pairs AS (SELECT doc_a, doc_b FROM ({_minhash_sql()})),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM pairs),
    src AS (SELECT doc_id, source FROM documents),
    deg AS (
        SELECT vid, CAST(COUNT(*) AS BIGINT) AS degree FROM (
            SELECT doc_a AS vid FROM pairs
            UNION ALL SELECT doc_b AS vid FROM pairs
        ) GROUP BY vid
    ),
    node AS (
        SELECT s.source, COALESCE(d.degree, 0) AS degree
        FROM src s LEFT JOIN deg d ON d.vid = s.doc_id
    ),
    per_node AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(degree) AS BIGINT) AS degree_sum
        FROM node GROUP BY source
    ),
    intra AS (
        SELECT sa.source, CAST(COUNT(*) AS BIGINT) AS intra_edges
        FROM pairs p
        JOIN src sa ON sa.doc_id = p.doc_a
        JOIN src sb ON sb.doc_id = p.doc_b
        WHERE sa.source = sb.source
        GROUP BY sa.source
    ),
    per AS (
        SELECT pn.source, pn.n_docs, pn.degree_sum,
               CAST(COALESCE(i.intra_edges, 0) AS BIGINT) AS intra_edges,
               4 * m.m * COALESCE(i.intra_edges, 0)
                 - pn.degree_sum * pn.degree_sum AS contrib_x4m2
        FROM per_node pn
        LEFT JOIN intra i ON i.source = pn.source
        CROSS JOIN m
    ),
    q AS (
        SELECT CAST(SUM(contrib_x4m2) AS DOUBLE) / (4 * m.m * m.m) AS q_total
        FROM per CROSS JOIN m GROUP BY m.m
    )
    SELECT per.source, per.n_docs, per.degree_sum, per.intra_edges,
           CAST(per.contrib_x4m2 AS BIGINT) AS contrib_x4m2,
           q.q_total
    FROM per CROSS JOIN q
    ORDER BY per.source
    """


@register(
    "graph_modularity",
    oracle=_modularity_sql(),
    description="Newman modularity of the source partition over the verified near-dup graph, exact integer cross-multiplication (4m*e_c - d_c^2) with one final division: high Q = dedup shards cleanly per source, low Q = duplication crosses sources",
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does near-duplication respect source boundaries? Newman
    modularity of the SOURCE partition over the verified near-dup
    pair graph: Q = Σ_c [e_c/m − (d_c/2m)²], computed as exact
    integers Σ_c (4m·e_c − d_c²) with ONE final division by 4m². The
    operational read: Q near its maximum → per-source dedup shards
    are safe; Q low → cross-source template families, dedup must run
    globally (the decision dedup_cross_source_matrix shows raw counts
    for, reduced to the standard single scalar).

    Scale: the pair graph is the candidate-scoped LSH→verify output
    (never all-pairs); degrees are one counter groupBy; the
    per-source rollup is |sources| rows and the 1-row edge total
    broadcasts. Pytest pins Q on a hand-built two-community graph and
    the Σ-contribution identity Q·4m² = Σ contrib."""
    from lime_etl_spark.operators.dedup import (
        JACCARD_TAU,
        doc_shingles,
        jaccard_pairs,
        lsh_candidates,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = track_persist(doc_shingles(docs).persist())
    pairs = track_persist(
        jaccard_pairs(sh, candidates=lsh_candidates(minhash_signatures(sh)))
        .where(F.col("jaccard") >= JACCARD_TAU)
        .select("doc_a", "doc_b")
        .persist()
    )
    pairs.count()  # materialize once: degree, intra and m all read it
    m = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    src = docs.select("doc_id", "source")
    deg = (
        pairs.select(F.col("doc_a").alias("vid"))
        .unionAll(pairs.select(F.col("doc_b").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    per_node = (
        src.join(deg, src.doc_id == deg.vid, "left")
        .select("source", F.coalesce("degree", F.lit(0)).alias("degree"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("degree").cast("bigint").alias("degree_sum"),
        )
    )
    sa = src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))
    sb = src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))
    intra = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(F.col("src_a") == F.col("src_b"))
        .groupBy(F.col("src_a").alias("source"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("intra_edges"))
    )
    per = (
        per_node.join(intra, "source", "left")
        .join(F.broadcast(m))
        .select(
            "source",
            "n_docs",
            "degree_sum",
            F.coalesce("intra_edges", F.lit(0)).cast("bigint").alias("intra_edges"),
            (
                4 * F.col("m") * F.coalesce("intra_edges", F.lit(0))
                - F.col("degree_sum") * F.col("degree_sum")
            ).alias("contrib_x4m2"),
        )
    )
    q = per.join(F.broadcast(m)).agg(
        (
            F.sum("contrib_x4m2").cast("double")
            / (4 * F.first("m") * F.first("m"))
        ).alias("q_total")
    )
    return (
        per.join(F.broadcast(q))
        .select(
            "source",
            "n_docs",
            "degree_sum",
            "intra_edges",
            F.col("contrib_x4m2").cast("bigint").alias("contrib_x4m2"),
            "q_total",
        )
        .orderBy("source")
    )
