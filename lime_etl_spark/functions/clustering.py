"""Lloyd's k-means over an array<float> column, mllib-free.

The reference (lime-etl) has no clustering; this exists as the
*trained* coarse quantizer for IVF similarity search
(operators/similarity.py `ann_ivf_trained`) — the scale path beyond
the deterministic sign-bit quantizer.

Spark-first design, sized for 100 TB:

- **Assignment is pure codegen, zero shuffle.** Centroids are model
  state (k × dim doubles ≈ KBs), so they are inlined as literal
  arrays and the nearest-centroid argmin is a single
  `array_min(array(struct(dist_i, i)...))` expression evaluated in
  the scan stage — no crossJoin row explosion, no window, nothing to
  shuffle. At 1000 executors each task assigns its split
  independently.
- **Update is one partial-agg shuffle of k×dim cells.** Per-dimension
  sums via posexplode → groupBy(cluster, dim) benefit from map-side
  combine: each task emits at most k×dim partial rows regardless of
  input size. Only the k×dim aggregated cells (≈1k rows) reach the
  driver — the classic "collect the model, never the data" loop
  every distributed k-means (including Spark MLlib's) uses.
- **Determinism — and SQL replayability (r4).** Float sums reordered
  across partitions drift; per-cell sums are accumulated as EXACT
  int64 over 2^20-fixed-point values (floor(v·2^20) — float32 inputs,
  so the quantization error is ≤1e-6 per coordinate, far below any
  cluster geometry), and each centroid coordinate is ONE double
  division s/(n·2^20). That makes centroids bit-stable across
  partitionings AND bit-identical to a DuckDB replay (int64 sums are
  order-free; int→double casts and single divisions are correctly
  rounded on both engines) — which is what lets `ann_ivf_trained`
  ship a full unrolled-Lloyd SQL oracle instead of a rows-only check.
  Argmin ties break on centroid id via struct comparison. Init picks
  the k vectors with the smallest (md5-bridge hash(id), id) — the
  cross-engine deterministic sample (same shingle_int used by every
  sampler), computed as a distributed top-k (TakeOrderedAndProject),
  not a driver sort. Int budget: |Σ floor(v·2^20)| ≤ n·|v|·2^20 —
  exact through n ~ 2^40 unit-scale vectors.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lime_etl_spark.functions.text import shingle_int

FIXED_POINT = 1 << 20  # centroid accumulation grain (exact int64 sums)


def _lit_vec(values: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in values])


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    """||v - c||^2 as a left-to-right fold (deterministic)."""
    return F.aggregate(
        F.zip_with(vec, _lit_vec(centroid), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _lit_matrix(rows: list[list[float]]) -> Column:
    """k×dim literal double matrix parsed as ONE SQL expression.

    Building this from k·dim `F.lit()` calls costs thousands of py4j
    round trips (measured 1.7 s for 16×64 — it dominated kmeans_fit
    wall time because every Lloyd iteration rebuilds the expression);
    one `F.expr` string parses JVM-side in ~ms. Values stay
    bit-identical: Python `repr` is the shortest round-trip decimal,
    and Java parses it back to the same IEEE double.
    """
    def lit(v: float) -> str:
        v = float(v)
        if math.isfinite(v):
            return repr(v) + "D"
        # repr gives 'nan'/'inf' which the SQL lexer rejects; Java's
        # Double.parseDouble (behind the cast) accepts these spellings
        return f"CAST('{'NaN' if math.isnan(v) else ('Infinity' if v > 0 else '-Infinity')}' AS DOUBLE)"

    return F.expr(
        "array("
        + ",".join("array(" + ",".join(lit(v) for v in r) + ")" for r in rows)
        + ")"
    )


def _dist_cells(vec: Column, centroids: list[list[float]]) -> Column:
    """(||v-c_i||^2, i) struct per centroid — same left-to-right fold
    per distance as `_sq_dist`, so values are bit-identical to the
    per-centroid-literal form this replaced."""
    return F.transform(
        _lit_matrix(centroids),
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d"),
            i.alias("cid"),
        ),
    )


def nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid — one codegen'd expression.

    array_min over (distance, id) structs compares lexicographically:
    smallest distance wins, ties break on lowest id.
    """
    return F.array_min(_dist_cells(vec, centroids))["cid"]


def nearest_centroids(vec: Column, centroids: list[list[float]], n: int) -> Column:
    """Ids of the n nearest centroids (multi-probe list for queries)."""
    ranked = F.slice(F.array_sort(_dist_cells(vec, centroids)), 1, n)
    return F.transform(ranked, lambda s: s["cid"])


def kmeans_fit(
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    iters: int = 5,
) -> list[list[float]]:
    """Fit k centroids with Lloyd iterations; returns the model
    (a plain list of k dim-length float lists — broadcastable state).

    Per iteration: one zero-shuffle assignment pass fused into the
    scan, one k×dim-cell aggregation, one ≈1k-row driver collect.
    Empty clusters keep their previous centroid.
    """
    # persist the working frame: Lloyd re-reads it iters+1 times (init
    # + one assignment pass per iteration); without the cache every
    # pass repeats the scan+cast. Iterative training over a fixed
    # corpus is THE canonical persist() case — at 100 TB this cache
    # (or a deterministic training sample) is what makes k-means
    # wall-clock ∝ iters·scan_once instead of iters·scan_each_time.
    emb = vectors.select(
        id_col, F.col(vec_col).cast("array<double>").alias("v")
    ).persist()

    init_rows = (
        emb.orderBy(shingle_int(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    centroids = [list(r["v"]) for r in init_rows]

    for _ in range(iters):
        # two selects: a generator (posexplode) in the same projection as
        # the struct-argmin makes Spark rewrite the struct's field names
        assigned = emb.select(
            nearest_centroid(F.col("v"), centroids).alias("cid"), "v"
        ).select("cid", F.posexplode("v").alias("dim", "val"))
        cells = (
            assigned.groupBy("cid", "dim")
            .agg(
                F.sum(
                    F.floor(F.col("val") * FIXED_POINT).cast("bigint")
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new_centroids = [list(c) for c in centroids]  # empty cluster → keep
        by_cid: dict[int, list[tuple[int, float]]] = {}
        for row in cells:
            by_cid.setdefault(row["cid"], []).append(
                (row["dim"], float(row["s"]) / (row["n"] * FIXED_POINT))
            )
        for cid, dims in by_cid.items():
            vec = new_centroids[cid]
            for dim, mean in dims:
                vec[dim] = mean
        centroids = new_centroids

    emb.unpersist()
    return centroids
