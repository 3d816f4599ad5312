"""Training-data pipeline operators: deterministic sampling, splits,
as-of attribution, and sequence packing.

These are the operations a 100 TB pretraining-corpus pipeline runs
after dedup/quality (operators/dedup.py, operators/text.py):

- **Stratified sampling / split** must be *deterministic functions of
  the key*, never `rand()`: reruns, retries and backfills must pick
  the same rows on every executor. The selector here is the same
  cross-engine md5→int bridge the dedup family uses
  (functions/text.py), so DuckDB replays the exact sample.
- **As-of join** (Spark has no native one): "latest prior view for
  each click per user" — the canonical attribution/feature-lookup
  shape. Expressed as a single user-partitioned window with a
  running `last(..., ignorenulls)` over the unioned stream: ONE
  shuffle on user_id, no join at all; skewed power-users are split
  by AQE. The DuckDB oracle is a literal ASOF JOIN.
- **Sequence packing**: greedy fill of fixed token-budget context
  windows in deterministic (doc_id) order. A running-sum window
  partitioned by (lang, shard): sharding bounds each sequential
  prefix-sum to a partition-sized chunk — an unsharded global
  cumsum would serialize the whole corpus through one task at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lime_etl_spark.functions.text import shingle_int, shingle_int_sql
from lime_etl_spark.operators.text import BPE_RE
from lime_etl_spark.plans.registry import register
from lime_etl_spark.sources.readers import load_table

# per-language keep rates: downsample the dominant language (corpus
# rebalancing), keep the rest at a higher rate
SAMPLE_RATES = {"en": 0.2, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 0.5}
_SCALE = 10_000

PACK_BUDGET = 512  # tokens per packed context window
PACK_SHARDS = 8


def hash_bucket(key: F.Column, buckets: int) -> F.Column:
    """Deterministic cross-engine bucket in [0, buckets)."""
    return shingle_int(key.cast("string")) % buckets


def _bucket_sql(expr: str, buckets: int) -> str:
    return f"{shingle_int_sql(f'CAST({expr} AS VARCHAR)')} % {buckets}"


@register(
    "samp_stratified",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_bucket_sql("doc_id", _SCALE)} <
          CASE lang {' '.join(f"WHEN '{l}' THEN {int(r * _SCALE)}" for l, r in SAMPLE_RATES.items())}
               ELSE 0 END
    """,
    description="deterministic per-language stratified sample (md5-bucket Bernoulli)",
)
def samp_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(0)
    for lang, r in SAMPLE_RATES.items():
        rate = F.when(F.col("lang") == lang, int(r * _SCALE)).otherwise(rate)
    return docs.where(hash_bucket(F.col("doc_id"), _SCALE) < rate).select("doc_id", "lang")


@register(
    "samp_hash_split",
    oracle=f"""
    SELECT lang, split, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id
    FROM (
        SELECT doc_id, lang,
               CASE WHEN {_bucket_sql("doc_id", 100)} < 80 THEN 'train'
                    WHEN {_bucket_sql("doc_id", 100)} < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    GROUP BY lang, split
    ORDER BY lang, split
    """,
    description="deterministic 80/10/10 train/val/test hash split",
)
def samp_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"), 100)
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    return (
        docs.select("doc_id", "lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .orderBy("lang", "split")
    )


@register(
    "ev_asof_attribution",
    oracle="""
    SELECT c.event_id, c.user_id,
           epoch_us(c.ts) AS click_us,
           epoch_us(v.ts) AS view_us,
           epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
    description="as-of join: latest prior view per click (one-shuffle window form)",
)
def ev_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click")
    )
    us = F.unix_micros("ts")
    # views sort before clicks at identical ts => "view.ts <= click.ts"
    kind = F.when(F.col("event_type") == "view", 0).otherwise(1)
    w = (
        Window.partitionBy("user_id")
        .orderBy(us, kind, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    view_us = F.last(F.when(kind == 0, us), ignorenulls=True).over(w)
    return (
        ev.withColumn("view_us", view_us)
        .where(kind == 1)
        .select(
            "event_id",
            "user_id",
            us.alias("click_us"),
            "view_us",
            (us - F.col("view_us")).alias("gap_us"),
        )
    )


@register(
    "pack_sequences",
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
    )
    SELECT lang, shard, pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc_id
    FROM placed
    GROUP BY lang, shard, pack_id
    ORDER BY lang, shard, pack_id
    """,
    description="greedy token-budget sequence packing (sharded running sum)",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        F.floor(((F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("double")) / PACK_BUDGET).cast(
            "bigint"
        ),
    )
    return (
        placed.groupBy("lang", "shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .orderBy("lang", "shard", "pack_id")
    )


TEMP_COEFF = 6.0  # tuned to the token budget in production


@register(
    "samp_temperature",
    oracle=f"""
    WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    thr AS (
        SELECT lang, n,
               CAST(FLOOR(1000000 * LEAST(1.0, {TEMP_COEFF} / sqrt(CAST(n AS DOUBLE)))) AS BIGINT) AS t
        FROM counts
    )
    SELECT d.lang,
           MAX(thr.n) AS n_docs,
           CAST(SUM(CASE WHEN {_bucket_sql("doc_id", 1000000)} < thr.t THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM documents d JOIN thr ON d.lang = thr.lang
    GROUP BY d.lang
    ORDER BY d.lang
    """,
    description="temperature-style mixture sampling: rate ∝ 1/sqrt(stratum size)",
)
def samp_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalanced training mixture: each language's sampling rate is
    C/√n — the T=2 'temperature' flattening (kept share ∝ √n) that
    upweights rare strata without the replication of full balancing.
    √ is IEEE-correctly-rounded, so unlike pow/log the rates are
    bit-identical across engines; selection reuses the deterministic
    md5-bucket (rerun-safe, no rand()). Stratum stats are a tiny
    aggregate broadcast back onto the fact — the corpus is scanned
    once and never shuffled."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    thr = counts.select(
        "lang",
        "n",
        F.floor(
            1000000
            * F.least(F.lit(1.0), F.lit(TEMP_COEFF) / F.sqrt(F.col("n").cast("double")))
        )
        .cast("bigint")
        .alias("t"),
    )
    picked = F.when(hash_bucket(F.col("doc_id"), 1000000) < F.col("t"), 1).otherwise(0)
    return (
        docs.join(F.broadcast(thr), "lang")
        .groupBy("lang")
        .agg(
            F.max("n").alias("n_docs"),
            F.sum(picked).cast("bigint").alias("n_sampled"),
        )
        .orderBy("lang")
    )
