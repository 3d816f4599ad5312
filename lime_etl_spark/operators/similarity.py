"""Similarity search over the embeddings table (array<float>, 64-dim).

- brute-force top-k cosine: the exactness baseline. The query set is
  broadcast (it's small by construction); the scan side stays
  partitioned, so the plan is a broadcast-nested-loop with a per-row
  codegen'd fold — no shuffle of the big side, then one narrow
  shuffle for the per-query top-k window.
- IVF-style bucketed search: the 100 TB path. A deterministic coarse
  quantizer (sign pattern of the first 8 dims → 256 buckets) plays
  the role of trained centroids; queries probe only their own bucket,
  cutting the scanned fraction ~256× at the cost of recall. Real IVF
  trains centroids; the partitioning/pruning mechanics are identical.
- kNN label vote: classification on top of the exact top-k.

All dot products fold left-to-right in double — bit-identical to
DuckDB's list_dot_product (verified), so cosines hash-match with no
rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lime_etl_spark.functions.clustering import (
    kmeans_fit,
    nearest_centroid,
    nearest_centroids,
)
from lime_etl_spark.plans.registry import register
from lime_etl_spark.sources.readers import load_table

TOP_K = 10
# Count-derived query sampling (r7 verdict #2): the query set models "the
# query workload" on the fixture, and its cost side is BROADCAST in every
# ANN query — so its SIZE must be fixed at any corpus scale, not a fixed
# FRACTION (a fraction broadcast grows with the corpus and breaks the
# 8 GB broadcast/driver ceiling long before 100 TB). The mod is derived
# from a 1-row corpus count targeting QUERY_TARGET vectors; the oracle
# carries the IDENTICAL derivation as a scalar subquery, so both engines
# compute the same mod from the same count at any sf.
QUERY_TARGET = 5  # query-set SIZE target → sample size ∈ [TARGET, 2·TARGET)
QUERY_MOD_SQL = f"(SELECT GREATEST(1, COUNT(*) // {QUERY_TARGET}) FROM embeddings)"


def query_mod(emb: DataFrame) -> int:
    """max(1, N // QUERY_TARGET) — the Python twin of QUERY_MOD_SQL.
    One bounded 1-row count job (parquet row-group metadata at scale);
    the returned LITERAL keeps the vec_id filter pushdown-eligible,
    which a crossjoined count column would not be."""
    return max(1, emb.count() // QUERY_TARGET)


def dot(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x.cast("array<double>"), y.cast("array<double>"), lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(x: Column, y: Column) -> Column:
    return dot(x, y) / (F.sqrt(dot(x, x)) * F.sqrt(dot(y, y)))


def knn_shard(emb: DataFrame, mod: int, with_label: bool = False) -> DataFrame:
    """The deterministic vec_id %% mod == 0 shard with precomputed
    norms — the blocking unit the kNN-graph family (ann_mutual_knn,
    emb_knn_label_consistency, emb_knn_confusion, emb_hubness_audit)
    shares. Callers persist (they control release timing)."""
    cols = ["vec_id"] + (["label"] if with_label else []) + ["embedding"]
    return emb.where(F.col("vec_id") % mod == 0).select(
        *cols, F.sqrt(dot(F.col("embedding"), F.col("embedding"))).alias("norm")
    )


def knn_edges(s: DataFrame, k: int) -> DataFrame:
    """Top-k cosine edges over a knn_shard frame: (va, vb, cosine,
    rnk ≤ k), plus (own_label, nbr_label) when the shard carries a
    label column. ONE shared construction so the tie-break
    (cosine DESC, vb) and norm expression can never drift between the
    queries that all claim to audit 'the same kNN graph' — and so the
    broadcast-self-join + WindowGroupLimit shape (per-key state ≤ k,
    never the pair expansion) is written once."""
    with_label = "label" in s.columns
    a, b = s.alias("a"), s.alias("b")
    cos = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.norm") * F.col("b.norm")
    )
    carried = (
        [F.col("a.label").alias("own_label"), F.col("b.label").alias("nbr_label")]
        if with_label
        else []
    )
    scored = a.join(F.broadcast(b), F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("va"),
        F.col("b.vec_id").alias("vb"),
        *carried,
        cos.alias("cosine"),
    )
    w = Window.partitionBy("va").orderBy(F.desc("cosine"), "vb")
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


_COS_SQL = (
    "list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(v.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(v.embedding AS DOUBLE[]), CAST(v.embedding AS DOUBLE[]))))"
)


def brute_force_topk(
    queries: DataFrame, vectors: DataFrame, k: int = TOP_K
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Norms are precomputed once per vector (N+Q sqrt-dots) instead of
    inside the pair expression (2·N·Q) — same float ops per pair
    (dot / (sqrt·sqrt)), so results stay bit-identical to the oracle,
    but the per-pair work drops to one dot product. Catalyst's
    WindowGroupLimit then prunes to a per-partition local top-k before
    the single narrow shuffle."""
    q = queries.select("vec_id", "embedding").withColumn(
        "norm", F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    ).alias("q")
    v = vectors.select("vec_id", "embedding").withColumn(
        "norm", F.sqrt(dot(F.col("embedding"), F.col("embedding")))
    ).alias("v")
    pairs = (
        F.broadcast(q)
        .crossJoin(v)
        .where(F.col("q.vec_id") != F.col("v.vec_id"))
        .select(
            F.col("q.vec_id").alias("q_vec_id"),
            F.col("v.vec_id").alias("n_vec_id"),
            (
                dot(F.col("q.embedding"), F.col("v.embedding"))
                / (F.col("q.norm") * F.col("v.norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cosine"), "n_vec_id")
    return pairs.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


@register(
    "ann_bruteforce_topk",
    oracle=f"""
    SELECT q_vec_id, n_vec_id, cosine, rank FROM (
        SELECT q.vec_id AS q_vec_id, v.vec_id AS n_vec_id,
               {_COS_SQL} AS cosine,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY {_COS_SQL} DESC, v.vec_id) AS rank
        FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id
        WHERE q.vec_id % {QUERY_MOD_SQL} = 0
    ) WHERE rank <= {TOP_K}
    """,
    description="exact top-k cosine neighbors (broadcast queries, windowed top-k)",
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % query_mod(emb) == 0)
    return brute_force_topk(queries, emb).select("q_vec_id", "n_vec_id", "cosine", "rank")


INT8_Q_SQL_CTES = """
    m AS (
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
    )
"""


def with_int8_vectors(emb: DataFrame, *cols: str) -> DataFrame:
    """``(cols..., qv)`` under the corpus-global int8 quantization.

    One scale scalar (max|x|/127, broadcast), explicit half-up floor
    (round() is not cross-engine stable), clamp to [-127, 127] — the
    SAME expression emb_quantize_error audits and the DuckDB twin
    ``INT8_Q_SQL_CTES`` replays, so every int8-space operator means
    one thing engine-wide.
    """
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
    return emb.join(F.broadcast(scale)).select(*cols, qv.alias("qv"))


def ivf_bucket(emb: Column) -> Column:
    """Deterministic coarse quantizer: sign bits of the first 8 dims."""
    e = emb.cast("array<double>")
    b = F.lit(0)
    for i in range(8):
        b = b + F.when(F.element_at(e, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return b


_BUCKET_SQL = " + ".join(
    f"CASE WHEN CAST(embedding AS DOUBLE[])[{i + 1}] > 0 THEN {1 << i} ELSE 0 END"
    for i in range(8)
)


@register(
    "ann_ivf_topk",
    oracle=f"""
    WITH b AS (SELECT vec_id, embedding, label, ({_BUCKET_SQL}) AS bucket FROM embeddings)
    SELECT q_vec_id, n_vec_id, cosine, rank FROM (
        SELECT q.vec_id AS q_vec_id, v.vec_id AS n_vec_id,
               {_COS_SQL} AS cosine,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY {_COS_SQL} DESC, v.vec_id) AS rank
        FROM b q JOIN b v ON q.bucket = v.bucket AND q.vec_id <> v.vec_id
        WHERE q.vec_id % {QUERY_MOD_SQL} = 0
    ) WHERE rank <= {TOP_K}
    """,
    description="IVF-style bucketed ANN: sign-bit coarse quantizer, probe own bucket",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", ivf_bucket(F.col("embedding"))
    )
    q = emb.where(F.col("vec_id") % query_mod(emb) == 0).alias("q")
    v = emb.alias("v")
    pairs = (
        F.broadcast(q)
        .join(
            v,
            (F.col("q.bucket") == F.col("v.bucket"))
            & (F.col("q.vec_id") != F.col("v.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("q_vec_id"),
            F.col("v.vec_id").alias("n_vec_id"),
            cosine(F.col("q.embedding"), F.col("v.embedding")).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cosine"), "n_vec_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("q_vec_id", "n_vec_id", "cosine", "rank")
    )


@register(
    "knn_label_vote",
    oracle=f"""
    WITH topk AS (
        SELECT q_vec_id, n_vec_id FROM (
            SELECT q.vec_id AS q_vec_id, v.vec_id AS n_vec_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY {_COS_SQL} DESC, v.vec_id) AS rank
            FROM embeddings q JOIN embeddings v ON q.vec_id <> v.vec_id
            WHERE q.vec_id % {QUERY_MOD_SQL} = 0
        ) WHERE rank <= {TOP_K}
    ),
    votes AS (
        SELECT t.q_vec_id, e.label, COUNT(*) AS n_votes
        FROM topk t JOIN embeddings e ON t.n_vec_id = e.vec_id
        GROUP BY t.q_vec_id, e.label
    )
    SELECT q_vec_id, label AS pred_label, n_votes FROM (
        SELECT q_vec_id, label, n_votes,
               ROW_NUMBER() OVER (PARTITION BY q_vec_id ORDER BY n_votes DESC, label) AS r
        FROM votes
    ) WHERE r = 1
    """,
    description="k-NN majority label vote over exact top-k neighbors",
)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % query_mod(emb) == 0)
    topk = brute_force_topk(queries, emb).select("q_vec_id", "n_vec_id")
    labels = emb.select(F.col("vec_id").alias("n_vec_id"), "label")
    votes = (
        topk.join(labels, "n_vec_id")
        .groupBy("q_vec_id", "label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("n_votes"), "label")
    return (
        votes.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("q_vec_id", F.col("label").alias("pred_label"), "n_votes")
    )


KMEANS_K = 16
KMEANS_ITERS = 3
N_PROBE_CENTROIDS = 4
EMB_DIM = 64  # driver fixture contract (sign-band ops assume it too)


def _sq_dist_sql(v: str, c: str, dim: int = EMB_DIM) -> str:
    """||v−c||² as the SAME float chain the Spark side folds:
    per-dim (a−b)² summed left-to-right (list_dot_product of the diff
    list with itself — the verified fold-equivalence every cosine op
    already relies on)."""
    df = f"list_transform(generate_series(1, {dim}), i -> {v}[i] - {c}[i])"
    return f"list_dot_product({df}, {df})"


def _kmeans_sql_ctes(
    k: int = KMEANS_K, iters: int = KMEANS_ITERS, dim: int = EMB_DIM
) -> str:
    """Unrolled-Lloyd CTE chain replaying `kmeans_fit` exactly (the
    pagerank/_lpa_sql pattern): md5-bridge init, per-round argmin
    assignment with (dist, cid) tie-break, 2^20-fixed-point integer
    cell sums, one double division per centroid coordinate, empty
    cells keeping the previous centroid. Produces `e` (vec_id, v) and
    `cent{iters}` (cid, c)."""
    from lime_etl_spark.functions.clustering import FIXED_POINT
    from lime_etl_spark.functions.text import shingle_int_sql

    md5 = shingle_int_sql("CAST(vec_id AS VARCHAR)")
    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"""cent0 AS (
        SELECT rn - 1 AS cid, v AS c FROM (
            SELECT vec_id, v,
                   ROW_NUMBER() OVER (ORDER BY {md5}, vec_id) AS rn
            FROM e
        ) WHERE rn <= {k}
    )""",
    ]
    for r in range(1, iters + 1):
        dd = _sq_dist_sql("e.v", "c.c", dim)
        parts.append(
            f"""asn{r} AS (
        SELECT vec_id, v, cid FROM (
            SELECT vec_id, v, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn
            FROM (
                SELECT e.vec_id, e.v, c.cid, {dd} AS dd
                FROM e CROSS JOIN cent{r - 1} c
            )
        ) WHERE rn = 1
    )"""
        )
        parts.append(
            f"""upd{r} AS (
        SELECT cid, list(CAST(s AS DOUBLE) / (n * {FIXED_POINT}) ORDER BY d) AS c
        FROM (
            SELECT cid, d,
                   SUM(CAST(floor(v[d] * {FIXED_POINT}) AS BIGINT)) AS s,
                   COUNT(*) AS n
            FROM asn{r}, generate_series(1, {dim}) g(d)
            GROUP BY cid, d
        ) GROUP BY cid
    )"""
        )
        parts.append(
            f"""cent{r} AS (
        SELECT p.cid, COALESCE(u.c, p.c) AS c
        FROM cent{r - 1} p LEFT JOIN upd{r} u ON u.cid = p.cid
    )"""
        )
    return ",\n    ".join(parts)


def _cells_probes_ctes() -> str:
    """`cells` (vec_id, cell) + `probes` (vec_id, probe) over the
    trained centroids — shared by the ann_ivf_trained oracle and the
    ann_tuning_curve oracle's trained strategy."""
    cent = f"cent{KMEANS_ITERS}"
    dd = _sq_dist_sql("e.v", "c.c")
    return f"""cells AS (
        SELECT vec_id, cid AS cell FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn
            FROM (
                SELECT e.vec_id, c.cid, {dd} AS dd
                FROM e CROSS JOIN {cent} c
            )
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id, cid AS probe FROM (
            SELECT vec_id, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn
            FROM (
                SELECT e.vec_id, c.cid, {dd} AS dd
                FROM e CROSS JOIN {cent} c
                WHERE e.vec_id % {QUERY_MOD_SQL} = 0
            )
        ) WHERE rn <= {N_PROBE_CENTROIDS}
    )"""


def _ivf_trained_sql() -> str:
    cos = (
        "list_dot_product(q.v, w.v)"
        " / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(w.v, w.v)))"
    )
    return f"""
    WITH {_kmeans_sql_ctes()},
    {_cells_probes_ctes()}
    SELECT q_vec_id, n_vec_id, cosine, rank FROM (
        SELECT p.vec_id AS q_vec_id, cl.vec_id AS n_vec_id,
               {cos} AS cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY p.vec_id ORDER BY {cos} DESC, cl.vec_id
               ) AS rank
        FROM probes p
        JOIN e q ON q.vec_id = p.vec_id
        JOIN cells cl ON cl.cell = p.probe AND cl.vec_id <> p.vec_id
        JOIN e w ON w.vec_id = cl.vec_id
    ) WHERE rank <= {TOP_K}
    """


@register(
    "ann_ivf_trained",
    oracle=_ivf_trained_sql(),
    description="trained-centroid IVF: Lloyd k-means quantizer (md5 init, 2^20 fixed-point exact sums), probe 4 nearest cells — full unrolled-Lloyd SQL oracle",
)
def ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with *trained* centroids — the real 100 TB ANN path.

    `kmeans_fit` (functions/clustering.py) learns k coarse cells with
    zero-shuffle assignment passes; the model (k×dim floats) is then
    inlined into codegen expressions, so partitioning the corpus by
    cell and probing the query's ``N_PROBE_CENTROIDS`` nearest cells
    are both shuffle-free on the vector side. Scanned fraction ≈
    n_probe/k of brute force, with data-adaptive cells instead of the
    fixed sign-bit grid of `ann_ivf_topk`.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(emb, k=KMEANS_K, iters=KMEANS_ITERS)
    v = emb.withColumn(
        "cell", nearest_centroid(F.col("embedding").cast("array<double>"), centroids)
    ).alias("v")
    q = (
        emb.where(F.col("vec_id") % query_mod(emb) == 0)
        .withColumn(
            "probe",
            F.explode(
                nearest_centroids(
                    F.col("embedding").cast("array<double>"),
                    centroids,
                    N_PROBE_CENTROIDS,
                )
            ),
        )
        .alias("q")
    )
    pairs = (
        F.broadcast(q)
        .join(v, (F.col("q.probe") == F.col("v.cell")) & (F.col("q.vec_id") != F.col("v.vec_id")))
        .select(
            F.col("q.vec_id").alias("q_vec_id"),
            F.col("v.vec_id").alias("n_vec_id"),
            cosine(F.col("q.embedding"), F.col("v.embedding")).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cosine"), "n_vec_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("q_vec_id", "n_vec_id", "cosine", "rank")
    )


N_PROBES_BITS = 8  # probe own bucket + all Hamming-1 neighbors


@register(
    "ann_ivf_multiprobe",
    oracle=f"""
    WITH b AS (SELECT vec_id, embedding, ({_BUCKET_SQL}) AS bucket FROM embeddings),
    probes AS (
        SELECT vec_id, embedding, bucket,
               unnest([bucket, {", ".join(f"xor(bucket, {1 << i})" for i in range(8))}]) AS probe
        FROM b WHERE vec_id % {QUERY_MOD_SQL} = 0
    )
    SELECT q_vec_id, n_vec_id, cosine, rank FROM (
        SELECT q.vec_id AS q_vec_id, v.vec_id AS n_vec_id,
               {_COS_SQL} AS cosine,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY {_COS_SQL} DESC, v.vec_id) AS rank
        FROM probes q JOIN b v ON q.probe = v.bucket AND q.vec_id <> v.vec_id
    ) WHERE rank <= {TOP_K}
    """,
    description="multi-probe IVF: own bucket + all Hamming-1 buckets (recall knob)",
)
def ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF: each query probes its own coarse bucket plus
    the 8 Hamming-1 neighbor buckets. Probing multiplies only the
    (small, broadcast) query side by 9 — the vector side is still
    scanned once and joined on bucket equality, so the scanned
    fraction stays ~9/256 of brute force while recovering most of the
    recall a single probe loses at bucket boundaries."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", ivf_bucket(F.col("embedding"))
    )
    probes = F.array(
        F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(N_PROBES_BITS)]
    )
    q = (
        emb.where(F.col("vec_id") % query_mod(emb) == 0)
        .withColumn("probe", F.explode(probes))
        .alias("q")
    )
    v = emb.alias("v")
    pairs = (
        F.broadcast(q)
        .join(v, (F.col("q.probe") == F.col("v.bucket")) & (F.col("q.vec_id") != F.col("v.vec_id")))
        .select(
            F.col("q.vec_id").alias("q_vec_id"),
            F.col("v.vec_id").alias("n_vec_id"),
            cosine(F.col("q.embedding"), F.col("v.embedding")).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cosine"), "n_vec_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("q_vec_id", "n_vec_id", "cosine", "rank")
    )


@register(
    "emb_quantize_error",
    oracle="""
    WITH m AS (
        SELECT MAX(list_max(list_transform(CAST(embedding AS DOUBLE[]), v -> abs(v)))) / 127 AS s
        FROM embeddings
    )
    SELECT vec_id,
           list_sum(err) / len(err) AS mean_abs_err,
           list_max(err) AS max_abs_err
    FROM (
        SELECT vec_id,
               list_transform(
                   CAST(embedding AS DOUBLE[]),
                   v -> abs(v - GREATEST(LEAST(floor(v / s + 0.5), 127), -127) * s)
               ) AS err
        FROM embeddings, m
    )
    ORDER BY vec_id
    """,
    description="int8 scalar-quantization reconstruction error per vector",
)
def emb_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit of int8 scalar quantization (the 4x storage cut that makes
    a 100 TB embedding corpus a 25 TB one): per-vector mean/max
    reconstruction error under a corpus-global symmetric scale
    (max|x| / 127). The scale is a 1-row aggregate broadcast to every
    vector; quantize/dequantize/error run as one zip-free transform
    per row inside codegen. floor(x/s + 0.5) instead of round():
    explicit half-up is bit-identical across engines, round() is not
    guaranteed to be. The same expression writes the int8 export;
    this query is the quality gate a pipeline alerts on."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = F.col("embedding").cast("array<double>")
    scale = emb.agg(
        (F.max(F.array_max(F.transform(x, lambda v: F.abs(v)))) / 127).alias("s")
    )
    quant = lambda v: (  # noqa: E731
        F.greatest(F.least(F.floor(v / F.col("s") + 0.5), F.lit(127.0)), F.lit(-127.0))
        * F.col("s")
    )
    err = F.transform(x, lambda v: F.abs(v - quant(v)))
    return (
        emb.join(F.broadcast(scale))
        .select(
            "vec_id",
            (
                F.aggregate(err, F.lit(0.0), lambda acc, v: acc + v) / F.size(err)
            ).alias("mean_abs_err"),
            F.array_max(err).alias("max_abs_err"),
        )
        .orderBy("vec_id")
    )


@register(
    "emb_label_centroids",
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
    ex AS (SELECT label, qv, unnest(generate_series(1, len(qv))) AS i FROM q)
    SELECT label, CAST(i - 1 AS INT) AS pos,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(qv[i]) AS BIGINT) AS sum_q,
           CAST(SUM(qv[i]) AS DOUBLE) / COUNT(*) AS centroid_q
    FROM ex GROUP BY label, i
    ORDER BY label, pos
    """,
    description="per-label centroids accumulated in int8-quantized space (exact integer sums)",
)
def emb_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label class centroids — the seed step for IVF coarse
    quantizers, k-NN prototypes, and label-drift monitors. Components
    are first quantized to int8 under the corpus-global scale (same
    expression as emb_quantize_error, which audits what that costs),
    so the per-dimension accumulation is a SUM OF INTEGERS — exact and
    order-independent, where a double sum would be partition-order
    noise. The centroid itself is one IEEE division of exact ints.

    Scale: posexplode fans each vector into dim rows, but the (label,
    pos) groupBy combines map-side, so the shuffle carries at most
    |labels| x dim counter rows no matter how many vectors; the scale
    scalar is a 1-row broadcast. Int64 sum headroom: 127 x N rows
    overflows only past ~7e16 vectors per label."""
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
    ex = (
        emb.join(F.broadcast(scale))
        .select("label", F.posexplode(qv).alias("pos", "v"))
    )
    return (
        ex.groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum("v").cast("bigint").alias("sum_q"),
        )
        .select(
            "label",
            "pos",
            "n_vecs",
            "sum_q",
            (F.col("sum_q").cast("double") / F.col("n_vecs")).alias("centroid_q"),
        )
        .orderBy("label", "pos")
    )


@register(
    "emb_dim_stats",
    oracle="""
    SELECT pos, COUNT(*) AS n_vals,
           MIN(v) AS min_v, MAX(v) AS max_v,
           CAST(SUM(CASE WHEN v = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
           CAST(SUM(CASE WHEN v < 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
    FROM (
        SELECT unnest(generate_series(1, len(embedding))) AS pos,
               unnest(CAST(embedding AS DOUBLE[])) AS v
        FROM embeddings
    )
    GROUP BY pos
    ORDER BY pos
    """,
    description="per-dimension embedding health: min/max/zero/negative counts",
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension corpus profile — the screen that catches dead
    dimensions (all-zero columns from a projection bug), clipped or
    exploding scales, and sign collapse after a bad normalization.

    Statistics are deliberately order-independent (min/max/counts —
    no floating mean, whose partition order isn't reproducible);
    posexplode fans each vector into (pos, value) rows and one
    groupBy(pos) reduces them with map-side partial combine. Output is
    |dims| rows regardless of corpus size. DuckDB's parallel-unnest
    zip is the oracle twin of posexplode.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "v")
        )
        .select((F.col("pos0") + 1).alias("pos"), "v")
        .groupBy("pos")
        .agg(
            F.count(F.lit(1)).alias("n_vals"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.sum(F.when(F.col("v") == 0.0, 1).otherwise(0)).cast("bigint").alias("n_zero"),
            F.sum(F.when(F.col("v") < 0.0, 1).otherwise(0)).cast("bigint").alias("n_negative"),
        )
        .orderBy("pos")
    )


@register(
    "emb_norm_audit",
    oracle="""
    SELECT label, COUNT(*) AS n_vecs,
           MIN(sq) AS min_sq_norm, MAX(sq) AS max_sq_norm,
           CAST(SUM(CASE WHEN sq = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vecs,
           CAST(SUM(CASE WHEN sq < 0.81 OR sq > 1.21 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_off_unit
    FROM (
        SELECT label,
               list_dot_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[])) AS sq
        FROM embeddings
    )
    GROUP BY label
    ORDER BY label
    """,
    description="per-label vector-norm audit: zero vectors + off-unit-norm counts",
)
def emb_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Norm discipline per label: zero vectors break cosine (0/0), and
    a mixed corpus of normalized and unnormalized vectors silently
    biases every dot-product ranking — this audit counts both before
    any ANN job runs. ‖v‖² ∈ [0.81, 1.21] is the unit band (‖v‖
    within ±10%).

    The squared norm is the same left-to-right double fold the cosine
    operators use (bit-identical to DuckDB list_dot_product), computed
    row-locally; the only shuffle is the per-label counter rollup.
    min/max/counts only — no floating mean across rows.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    sq = dot(F.col("embedding"), F.col("embedding"))
    return (
        emb.select("label", sq.alias("sq"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("sq").alias("min_sq_norm"),
            F.max("sq").alias("max_sq_norm"),
            F.sum(F.when(F.col("sq") == 0.0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_zero_vecs"),
            F.sum(F.when((F.col("sq") < 0.81) | (F.col("sq") > 1.21), 1).otherwise(0))
            .cast("bigint")
            .alias("n_off_unit"),
        )
        .orderBy("label")
    )


HARD_NEG_K = 5


@register(
    "ann_hard_negatives",
    oracle=f"""
    SELECT q_vec_id, q_label, n_vec_id, n_label, cosine, rank FROM (
        SELECT q.vec_id AS q_vec_id, q.label AS q_label,
               v.vec_id AS n_vec_id, v.label AS n_label,
               {_COS_SQL} AS cosine,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY {_COS_SQL} DESC, v.vec_id) AS rank
        FROM embeddings q JOIN embeddings v
          ON q.vec_id <> v.vec_id AND q.label <> v.label
        WHERE q.vec_id % {QUERY_MOD_SQL} = 0
    ) WHERE rank <= {HARD_NEG_K}
    """,
    description="hard-negative mining: top-k most-similar vectors with a DIFFERENT label",
)
def ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training sampler: for each anchor, the most
    cosine-similar vectors that carry a different label — exactly the
    negatives that maximize training signal (easy negatives are
    already far away; these sit on the decision boundary).

    Same broadcast-anchor / windowed-top-k shape as the brute-force
    kNN (norms precomputed once per vector; WindowGroupLimit prunes to
    a per-partition local top-k before the one narrow shuffle), with
    the label-mismatch predicate applied before scoring so same-label
    pairs never pay the dot product. At corpus scale the anchor side
    is the batch being mined (small, broadcast); the production swap
    is the IVF bucketed variant with the same mismatch predicate.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = (
        emb.where(F.col("vec_id") % query_mod(emb) == 0)
        .select("vec_id", "label", "embedding")
        .withColumn("norm", F.sqrt(dot(F.col("embedding"), F.col("embedding"))))
        .alias("q")
    )
    v = (
        emb.select("vec_id", "label", "embedding")
        .withColumn("norm", F.sqrt(dot(F.col("embedding"), F.col("embedding"))))
        .alias("v")
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(v)
        .where(
            (F.col("q.vec_id") != F.col("v.vec_id"))
            & (F.col("q.label") != F.col("v.label"))
        )
        .select(
            F.col("q.vec_id").alias("q_vec_id"),
            F.col("q.label").alias("q_label"),
            F.col("v.vec_id").alias("n_vec_id"),
            F.col("v.label").alias("n_label"),
            (
                dot(F.col("q.embedding"), F.col("v.embedding"))
                / (F.col("q.norm") * F.col("v.norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cosine"), "n_vec_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= HARD_NEG_K)
        .select("q_vec_id", "q_label", "n_vec_id", "n_label", "cosine", "rank")
    )


# --- simplified-silhouette cluster quality -----------------------------------


@register(
    "emb_silhouette_audit",
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
    ex AS (SELECT vec_id, label, qv[i] AS v, i
           FROM q, UNNEST(generate_series(1, len(qv))) AS t(i)),
    cent AS (
        SELECT label AS clabel, i, CAST(SUM(v) AS BIGINT) AS sum_q,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ex GROUP BY label, i
    ),
    dist AS (
        SELECT e.vec_id, e.label, c.clabel,
               sqrt(CAST(SUM((e.v * c.n - c.sum_q) * (e.v * c.n - c.sum_q)) AS DOUBLE))
                 / ANY_VALUE(c.n) AS d
        FROM ex e JOIN cent c ON c.i = e.i
        GROUP BY e.vec_id, e.label, c.clabel
    ),
    per_vec AS (
        SELECT vec_id, label,
               MAX(CASE WHEN clabel = label THEN d END) AS a,
               MIN(CASE WHEN clabel <> label THEN d END) AS b,
               MIN(d) AS dmin
        FROM dist GROUP BY vec_id, label
    ),
    nearest AS (
        SELECT p.vec_id, MIN(x.clabel) AS nearest
        FROM per_vec p JOIN dist x
          ON x.vec_id = p.vec_id AND x.d = p.dmin
        GROUP BY p.vec_id
    ),
    pv AS (
        SELECT p.vec_id, p.label, p.a, p.b, n.nearest
        FROM per_vec p JOIN nearest n ON n.vec_id = p.vec_id
    ),
    scored AS (
        SELECT label,
               CASE WHEN GREATEST(a, b) = 0 THEN 0
                    ELSE CAST(FLOOR(((b - a) * 1000000) / GREATEST(a, b)) AS BIGINT)
               END AS s_e6,
               CASE WHEN nearest <> label THEN 1 ELSE 0 END AS misassigned
        FROM pv
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(s_e6) AS DOUBLE) / (COUNT(*) * 1000000.0) AS mean_silhouette,
           CAST(SUM(misassigned) AS BIGINT) AS n_nearest_other,
           CAST(SUM(misassigned) AS DOUBLE) / COUNT(*) AS misassign_share
    FROM scored GROUP BY label ORDER BY label
    """,
    description="simplified-silhouette cluster quality per label: centroid-based a/b, mean silhouette, nearest-centroid misassignment share",
)
def emb_silhouette_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label/cluster quality in one table: the SIMPLIFIED silhouette
    (centroid-based a/b — Hruschka et al.'s medoid-free variant of
    Rousseeuw's silhouette) per label, plus the share of vectors whose
    nearest centroid is a DIFFERENT label (the k-NN-misassignment
    proxy). Read it before trusting label-blocked dedup or
    cluster-aware splits: a label with low mean silhouette and high
    misassign share is not a real cluster.

    Exactness discipline (the emb_label_centroids pattern, extended):
    components are int8-quantized under the corpus-global scale, so
    centroid sums are exact integers; the vector-to-centroid distance
    is computed as sqrt(Σ(v·n − Σq)²)/n — an INTEGER sum (exact, any
    partitioning) followed by one sqrt and one division (IEEE-
    deterministic); per-vector silhouettes are quantized to 1e-6 by
    floor before the cross-vector SUM, so the mean is an integer sum
    plus one division — bit-identical on any engine. Int64 headroom:
    (v·n − Σq)² ≤ (254·n)², ×64 dims → safe below ~1.2e6 vectors per
    label (normalize per-label beyond that).

    Scale: the centroid table is |labels|×dims counters (broadcast);
    the distance stage is a per-vector scan × |labels| — linear in
    corpus size with map-side integer combines; output is |labels|
    rows."""
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
    ex = (
        emb.join(F.broadcast(scale))
        .select("vec_id", "label", F.posexplode(qv).alias("i", "v"))
    )
    cent = ex.groupBy(F.col("label").alias("clabel"), "i").agg(
        F.sum("v").cast("bigint").alias("sum_q"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    dist = (
        ex.join(F.broadcast(cent), "i")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            (
                F.sqrt(
                    F.sum(
                        (F.col("v") * F.col("n") - F.col("sum_q"))
                        * (F.col("v") * F.col("n") - F.col("sum_q"))
                    ).cast("double")
                )
                / F.first("n")
            ).alias("d")
        )
    )
    agg = dist.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.col("d"))).alias("a"),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("d"))).alias("b"),
        F.min("d").alias("dmin"),
    )
    # deterministic argmin (min label at the min distance) — the same
    # two-step both engines run, so exact-double ties break identically
    nearest = (
        agg.select("vec_id", "dmin")
        .join(dist.select("vec_id", "clabel", "d"), "vec_id")
        .where(F.col("d") == F.col("dmin"))
        .groupBy("vec_id")
        .agg(F.min("clabel").alias("nearest"))
    )
    per_vec = agg.join(nearest, "vec_id")
    scored = per_vec.select(
        "label",
        F.when(F.greatest("a", "b") == 0, F.lit(0))
        .otherwise(
            F.floor(((F.col("b") - F.col("a")) * 1000000) / F.greatest("a", "b"))
        )
        .cast("bigint")
        .alias("s_e6"),
        F.when(F.col("nearest") != F.col("label"), 1).otherwise(0).alias("misassigned"),
    )
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            (
                F.sum("s_e6").cast("double") / (F.count(F.lit(1)) * 1000000.0)
            ).alias("mean_silhouette"),
            F.sum("misassigned").cast("bigint").alias("n_nearest_other"),
            (
                F.sum("misassigned").cast("double") / F.count(F.lit(1))
            ).alias("misassign_share"),
        )
        .orderBy("label")
    )


# --- embedding dimension correlation (redundancy audit) ----------------------

CORR_TOP_K = 20


@register(
    "emb_dim_correlation",
    oracle=f"""
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
    ex AS (SELECT vec_id, qv[i] AS v, i
           FROM q, UNNEST(generate_series(1, len(qv))) AS t(i)),
    pairs AS (
        SELECT a.i AS dim_a, b.i AS dim_b,
               COUNT(*) AS n,
               SUM(a.v) AS sx, SUM(b.v) AS sy,
               SUM(a.v * a.v) AS sxx, SUM(b.v * b.v) AS syy,
               SUM(a.v * b.v) AS sxy
        FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i < b.i
        GROUP BY a.i, b.i
    ),
    corr AS (
        SELECT CAST(dim_a - 1 AS INT) AS dim_a, CAST(dim_b - 1 AS INT) AS dim_b,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)) AS corr
        FROM pairs
        WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    )
    SELECT dim_a, dim_b, corr, abs(corr) AS abs_corr
    FROM corr
    ORDER BY abs_corr DESC, dim_a, dim_b
    LIMIT {CORR_TOP_K}
    """,
    description="embedding dimension redundancy audit: top-|corr| dim pairs from exact int8-quantized moment sums",
)
def emb_dim_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The redundancy audit run before choosing PQ subspaces or a
    whitening transform: Pearson correlation for every dimension pair,
    top-|corr| reported. Highly correlated dims waste quantization
    budget (PQ subspaces should cut ACROSS them) and inflate cosine
    similarity — this table names the offenders.

    Exactness: the five sufficient statistics (Σx, Σy, Σx², Σy², Σxy)
    accumulate over int8-QUANTIZED components (the
    emb_label_centroids discipline) — exact integer sums under any
    partitioning; the correlation is one fixed-shape float chain over
    those integers, so it is bit-identical cross-engine. Headroom:
    |Σxy| ≤ 127²·N → int64-safe to ~5.7e14 vectors.

    Scale: the pair table is dims²/2 rows (2016 for d=64) built from
    one self-join of the exploded (vec, dim, value) frame keyed on
    vec_id — shuffle ∝ corpus·d, map-side combined into the bounded
    moment table; the top-k sort runs on 2016 rows. For d in the
    thousands, bucket the pair space (dim_a div B) first."""
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
    ex = (
        emb.join(F.broadcast(scale))
        .select("vec_id", F.posexplode(qv).alias("i", "v"))
        .persist()
    )
    a, b = ex.alias("a"), ex.alias("b")
    pairs = (
        a.join(b, (F.col("a.vec_id") == F.col("b.vec_id")) & (F.col("a.i") < F.col("b.i")))
        .groupBy(F.col("a.i").alias("ia"), F.col("b.i").alias("ib"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("a.v").alias("sx"),
            F.sum("b.v").alias("sy"),
            F.sum(F.col("a.v") * F.col("a.v")).alias("sxx"),
            F.sum(F.col("b.v") * F.col("b.v")).alias("syy"),
            F.sum(F.col("a.v") * F.col("b.v")).alias("sxy"),
        )
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / F.sqrt(vx.cast("double") * vy.cast("double"))
    )
    return (
        pairs.where((vx > 0) & (vy > 0))
        .select(
            F.col("ia").cast("int").alias("dim_a"),
            F.col("ib").cast("int").alias("dim_b"),
            corr.alias("corr"),
            F.abs(corr).alias("abs_corr"),
        )
        .orderBy(F.desc("abs_corr"), "dim_a", "dim_b")
        .limit(CORR_TOP_K)
    )
