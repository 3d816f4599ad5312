"""Scale-safe global ranking: exact ROW_NUMBER / NTILE without a
single-partition sort.

`Window.orderBy(...)` with no `partitionBy` moves the ENTIRE input
through one task — fine over a rollup of bounded size, a scale-killer
over entity-grain data (customers, docs, facts) that grows with the
corpus. The decomposition here keeps the semantics EXACT while every
sort stays partition-local:

1. bucket rows by a numeric value that is ascending-consistent with
   the window order (boundaries from `approxQuantile`, so buckets are
   balanced; assignment is strictly value-monotone, so bucket order
   refines the global order);
2. `row_number` WITHIN each bucket — parallel across buckets;
3. per-bucket counts → cumulative offsets over the ≤n_buckets-row
   bucket roster (bounded window) → broadcast back;
4. global rank = offset + local rank; ANSI NTILE is then pure
   arithmetic on (rank, total).

Equality with the global window is structural: bucketing is a
monotone coarsening of the order (equal values never split across
buckets), so concatenating per-bucket orders IS the global order.
The same trick appears shard-major in `samp_domain_budget`
(operators/training.py) where the shard is part of the semantic
order; here the bucket is invisible to the result.

Determinism caveat: `approxQuantile` boundaries may vary across runs
with partition order — harmless, ANY monotone boundaries give the
same ranks; only bucket balance varies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_RANK_BUCKETS = 64


def bucket_by_bounds(value: Column, bounds: list[float]) -> Column:
    """Monotone bucket id: #boundaries strictly below the value.
    Equal values always share a bucket, so order across buckets is
    preserved for ANY tie-break the within-bucket sort adds."""
    b = F.lit(0)
    for x in bounds:
        b = b + (value > F.lit(float(x))).cast("int")
    return b


def with_global_row_number(
    df: DataFrame,
    value: Column,
    order_cols: list[Column],
    out: str = "rn",
    total_out: str = "n_total",
    n_buckets: int = DEFAULT_RANK_BUCKETS,
) -> DataFrame:
    """Add exact `ROW_NUMBER() OVER (ORDER BY order_cols)` as `out`
    and the total row count as `total_out`, with no global sort.

    `value` must be a non-null numeric column ascending-consistent
    with `order_cols[0]` (negate it for a DESC leading key). Exact up
    to 2^53 rows (offset arithmetic is int64; quantile probing casts
    through double).
    """
    # The quantile probe runs on a column-pruned projection rather
    # than a persisted copy of the full frame: at 100 TB caching the
    # whole input for one probe is itself the anti-pattern (memory
    # pressure + a cache entry nobody releases); a single-column scan
    # is cheaper than the cache write. ANY monotone boundaries give
    # identical ranks, so probe/main-plan divergence is harmless.
    tagged = df.withColumn("__rk_v", value.cast("double"))
    # Deduped boundaries: ties collapse buckets (harmless — fewer,
    # bigger buckets; ranks are boundary-independent).
    probes = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(
        set(tagged.select("__rk_v").approxQuantile("__rk_v", probes, 0.01))
    )
    bucketed = tagged.withColumn("__rk_b", bucket_by_bounds(F.col("__rk_v"), bounds))

    w_local = Window.partitionBy("__rk_b").orderBy(*order_cols)
    w_off = Window.orderBy("__rk_b").rowsBetween(Window.unboundedPreceding, 0)
    offsets = (
        bucketed.groupBy("__rk_b")
        .agg(F.count(F.lit(1)).alias("__rk_cnt"))
        .withColumn("__rk_off", F.sum("__rk_cnt").over(w_off) - F.col("__rk_cnt"))
        .withColumn(total_out, F.sum("__rk_cnt").over(Window.partitionBy()))
        .select(F.col("__rk_b").alias("__rk_ob"), "__rk_off", total_out)
    )
    return (
        bucketed.withColumn("__rk_lrn", F.row_number().over(w_local))
        .join(F.broadcast(offsets), F.col("__rk_b") == F.col("__rk_ob"))
        .withColumn(out, (F.col("__rk_off") + F.col("__rk_lrn")).cast("bigint"))
        .drop("__rk_v", "__rk_b", "__rk_ob", "__rk_off", "__rk_lrn")
    )


def ntile_from_rn(rn: Column, n_total: Column, k: int) -> Column:
    """ANSI NTILE(k) from an exact global rank and the total count:
    q = n div k tiles of size q+1 for the first n mod k tiles, size q
    after. tile = ceil(r/(q+1)) in the big-tile prefix, else
    ceil((r-rem)/q) (rows before tile t>rem are (t-1)q + rem).
    Double-backed floor-division — exact to 2^53 rows, far past any
    per-entity rollup."""
    n = n_total.cast("double")
    r = rn.cast("double")
    q = F.floor(n / k)
    rem = n - q * k
    big = q + 1
    in_big = r <= rem * big
    tile_big = F.floor((r - 1) / big) + 1
    tile_small = F.floor((r - rem - 1) / F.greatest(q, F.lit(1.0))) + 1
    return F.when(in_big, tile_big).otherwise(tile_small).cast("int")


def with_global_cumsum(
    df: DataFrame,
    value: Column,
    order_cols: list[Column],
    sum_col: str,
    out: str = "cum",
    n_buckets: int = DEFAULT_RANK_BUCKETS,
) -> DataFrame:
    """Exact `SUM(sum_col) OVER (ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING..CURRENT ROW)` as `out`, with no single-partition sort:
    same bucket/offset decomposition as `with_global_row_number`, the
    running aggregate being a sum instead of a count. Preserves the
    summed column's type (decimal stays decimal-exact)."""
    # Column-pruned probe, no persist — see with_global_row_number.
    tagged = df.withColumn("__cs_v", value.cast("double"))
    probes = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(
        set(tagged.select("__cs_v").approxQuantile("__cs_v", probes, 0.01))
    )
    bucketed = tagged.withColumn("__cs_b", bucket_by_bounds(F.col("__cs_v"), bounds))

    w_local = (
        Window.partitionBy("__cs_b")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_off = Window.orderBy("__cs_b").rowsBetween(Window.unboundedPreceding, 0)
    offsets = (
        bucketed.groupBy("__cs_b")
        .agg(F.sum(sum_col).alias("__cs_t"))
        .withColumn("__cs_off", F.sum("__cs_t").over(w_off) - F.col("__cs_t"))
        .select(F.col("__cs_b").alias("__cs_ob"), "__cs_off")
    )
    return (
        bucketed.withColumn("__cs_rs", F.sum(sum_col).over(w_local))
        .join(F.broadcast(offsets), F.col("__cs_b") == F.col("__cs_ob"))
        .withColumn(out, F.col("__cs_off") + F.col("__cs_rs"))
        .drop("__cs_v", "__cs_b", "__cs_ob", "__cs_off", "__cs_rs")
    )


def with_global_ntiles(
    df: DataFrame,
    specs: list[tuple[Column, list[Column], int, str]],
    n_buckets: int = DEFAULT_RANK_BUCKETS,
) -> DataFrame:
    """Several exact global NTILEs over ONE pass of a REDUCED rollup.

    `specs` is a list of `(value, order_cols, k, out)` — one entry per
    ntile column to add. Compared with chaining `with_global_ntile`,
    which nests each call's bucket/offset join inside the next (the
    upstream subtree re-expands per call, and each call pays its own
    quantile-probe job), this:

    * persists the value-tagged input ONCE — callers pass an entity
      rollup (per-customer / per-doc), never raw facts, so the cache
      entry is the reduced frame, not the corpus;
    * probes ALL boundary sets in a single multi-column
      `approxQuantile` job;
    * derives each spec's ≤n_buckets bucket-offset roster straight
      from the cached frame (lean subtree, no prior-spec joins);
    * computes the shared global total as a 1-row broadcast
      aggregate instead of an unpartitioned `Window.partitionBy()`.

    Plan shape: one partitioned sort per spec (genuinely needed — the
    orders differ), one bounded roster window per spec, broadcast
    joins only. The cache entry is registered with the registry's
    persist tracker, so the driver surface's `hygienic()` sweep
    releases it automatically and library callers (tests, notebooks)
    release it with `registry.release_tracked_persists()` — no
    session-global clearCache needed either way.
    """
    from lime_etl_spark.plans.registry import track_persist

    vcols = [f"__mt_v{i}" for i in range(len(specs))]
    tagged = df
    for vc, (value, _, _, _) in zip(vcols, specs):
        tagged = tagged.withColumn(vc, value.cast("double"))
    tagged = track_persist(tagged.persist())
    probes = [i / n_buckets for i in range(1, n_buckets)]
    all_bounds = tagged.approxQuantile(vcols, probes, 0.01)
    total = tagged.agg(F.count(F.lit(1)).alias("__mt_n"))

    bucketed = tagged
    bcols = []
    for i, vc in enumerate(vcols):
        b = f"__mt_b{i}"
        bucketed = bucketed.withColumn(
            b, bucket_by_bounds(F.col(vc), sorted(set(all_bounds[i])))
        )
        bcols.append(b)

    result = bucketed
    drop_cols = vcols + bcols + ["__mt_n"]
    for i, (_, order_cols, _, _) in enumerate(specs):
        b, ob, off, lrn = f"__mt_b{i}", f"__mt_ob{i}", f"__mt_off{i}", f"__mt_lrn{i}"
        w_local = Window.partitionBy(b).orderBy(*order_cols)
        w_off = Window.orderBy(b).rowsBetween(Window.unboundedPreceding, 0)
        roster = (
            bucketed.groupBy(b)
            .agg(F.count(F.lit(1)).alias("__mt_cnt"))
            .withColumn(off, F.sum("__mt_cnt").over(w_off) - F.col("__mt_cnt"))
            .select(F.col(b).alias(ob), off)
        )
        result = result.withColumn(lrn, F.row_number().over(w_local)).join(
            F.broadcast(roster), F.col(b) == F.col(ob)
        )
        drop_cols += [ob, off, lrn]
    result = result.join(F.broadcast(total))
    for i, (_, _, k, out) in enumerate(specs):
        result = result.withColumn(
            out,
            ntile_from_rn(
                F.col(f"__mt_off{i}") + F.col(f"__mt_lrn{i}"), F.col("__mt_n"), k
            ),
        )
    return result.drop(*drop_cols)


def with_grouped_row_number(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    order_cols: list[Column],
    out: str = "rn",
    total_out: str | None = None,
    n_buckets: int = DEFAULT_RANK_BUCKETS,
) -> DataFrame:
    """Exact `ROW_NUMBER() OVER (PARTITION BY group_cols ORDER BY
    order_cols)` as `out` (plus the per-group total as `total_out` if
    named) WITHOUT one sorted task per group — the fix for the
    low-cardinality-key window skew (ev_sprt_gate's r8 SCALE leg:
    ~5 partitions each holding a full type history, 3.82× wall at
    16× rows).

    Same decomposition as `with_global_row_number`, group-scoped:
    bucket by a value ascending-consistent with `order_cols[0]`
    (GLOBAL approxQuantile boundaries — within every group the
    assignment is still value-monotone, so per-group bucket order
    refines the group order; only balance varies per group), local
    row_number per (group, bucket), exclusive-prefix offsets over the
    |groups|×≤n_buckets roster (bounded window), broadcast back. No
    task ever holds more than one bucket of one group."""
    tagged = df.withColumn("__gr_v", value.cast("double"))
    probes = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(
        set(tagged.select("__gr_v").approxQuantile("__gr_v", probes, 0.01))
    )
    bucketed = tagged.withColumn("__gr_b", bucket_by_bounds(F.col("__gr_v"), bounds))

    w_local = Window.partitionBy(*group_cols, "__gr_b").orderBy(*order_cols)
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__gr_b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    roster = bucketed.groupBy(*group_cols, "__gr_b").agg(
        F.count(F.lit(1)).alias("__gr_cnt")
    )
    roster = roster.withColumn(
        "__gr_off", F.sum("__gr_cnt").over(w_off) - F.col("__gr_cnt")
    )
    if total_out:
        roster = roster.withColumn(
            total_out,
            F.sum("__gr_cnt").over(Window.partitionBy(*group_cols)),
        )
    keep = ["__gr_off"] + ([total_out] if total_out else [])
    roster = roster.select(
        *[F.col(g).alias(f"__gr_g_{g}") for g in group_cols],
        F.col("__gr_b").alias("__gr_ob"),
        *keep,
    )
    cond = F.col("__gr_b") == F.col("__gr_ob")
    for g in group_cols:
        cond = cond & (F.col(g) == F.col(f"__gr_g_{g}"))
    return (
        bucketed.withColumn("__gr_lrn", F.row_number().over(w_local))
        .join(F.broadcast(roster), cond)
        .withColumn(out, (F.col("__gr_off") + F.col("__gr_lrn")).cast("bigint"))
        .drop(
            "__gr_v",
            "__gr_b",
            "__gr_ob",
            "__gr_off",
            "__gr_lrn",
            *[f"__gr_g_{g}" for g in group_cols],
        )
    )


def with_ingest_bucket(
    df: DataFrame, id_col: str, n: int, out: str = "bucket"
) -> DataFrame:
    """Equal-WIDTH ingest-order buckets from the broadcast id range:
    bucket = (id - min) * n div (max - min + 1), 1-based. The
    shuffle-free replacement for ntile-as-bucketer: ntile needs a
    global sort just to slice the corpus into n chunks; arithmetic
    range bucketing needs one 1-row min/max broadcast and a row-local
    expression. For dense allocator ids (the ingest-order case) the
    buckets are near-equal-count too. `ingest_bucket_sql` is the
    DuckDB twin — integer floor division on both engines, so the
    assignment is bit-identical."""
    lo, span = f"__ib_lo_{out}", f"__ib_span_{out}"
    bounds = df.agg(
        F.min(id_col).cast("bigint").alias(lo),
        (F.max(id_col) - F.min(id_col) + 1).cast("bigint").alias(span),
    )
    return (
        df.join(F.broadcast(bounds))
        .withColumn(
            out,
            (F.expr(f"(({id_col} - {lo}) * {n}) div {span}") + 1).cast("int"),
        )
        .drop(lo, span)
    )


def ingest_bucket_sql(id_expr: str, n: int, lo: str = "lo", span: str = "span") -> str:
    """DuckDB twin of `with_ingest_bucket` — pair with a CTE like
    `bnds AS (SELECT MIN(id) AS lo, MAX(id) - MIN(id) + 1 AS span
    FROM t)` cross-joined in."""
    return f"CAST((({id_expr} - {lo}) * {n}) // {span} + 1 AS INT)"


def with_global_ntile(
    df: DataFrame,
    value: Column,
    order_cols: list[Column],
    k: int,
    out: str,
    n_buckets: int = DEFAULT_RANK_BUCKETS,
) -> DataFrame:
    """`NTILE(k) OVER (ORDER BY order_cols)` as `out`, scale-safe."""
    rn_col, tot_col = f"__nt_rn_{out}", f"__nt_n_{out}"
    ranked = with_global_row_number(
        df, value, order_cols, out=rn_col, total_out=tot_col, n_buckets=n_buckets
    )
    return ranked.withColumn(
        out, ntile_from_rn(F.col(rn_col), F.col(tot_col), k)
    ).drop(rn_col, tot_col)
