"""Multi-dimensional data layout: Z-order (Morton-curve) clustered
parquet writes.

A linear `ORDER BY a` layout gives perfect file-level min/max pruning
on `a` and none on `b`; interleaving the bits of BOTH columns' rank
buckets (the Morton / Z-order curve — the same layout Delta Lake's
OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite use) gives each
file a small rectangle of (a, b) space, so parquet footer min/max
statistics prune file reads for predicates on EITHER column. At
100 TB this is the difference between scanning every file for the
second column and skipping ~(1 - 1/2^bits) of them.

lime-etl analog: the write side of a TableRefreshJob
(`/root/reference/lime_etl/domain/job_spec.py:54` — jobs own HOW
their target table is written); here layout is a first-class sink
option.

Everything is JVM column expressions: rank buckets from a 1-row
min/max broadcast (never a driver collect of data rows), bit
interleave as shiftleft/or chains inside whole-stage codegen, then
`repartitionByRange` on the z-value (range exchange = the global
sort's shuffle, one pass) + `sortWithinPartitions` so every output
file covers one contiguous z-range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-column rank-bucket resolution (2 cols × 16 = 32-bit z)


def rank_bucket(c: Column, cmin: Column, cmax: Column, bits: int = Z_BITS) -> Column:
    """Scale a numeric column to an integer bucket in [0, 2^bits).

    Linear min/max scaling, not quantiles: one streaming min/max agg
    (mergeable, no sort) instead of a percentile pass. Skewed value
    distributions cost bucket resolution, not correctness — pruning
    degrades toward the linear-sort baseline, never below it.
    """
    n_buckets = F.lit((1 << bits) - 1)
    span = (cmax - cmin).cast("double")
    scaled = F.when(
        span > 0,
        F.floor((c - cmin).cast("double") / span * n_buckets.cast("double")),
    ).otherwise(F.lit(0))
    return F.least(scaled.cast("bigint"), n_buckets.cast("bigint"))


def interleave_bits(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton z-value: bit k of x → bit 2k, bit k of y → bit 2k+1.

    A chain of 2·bits shiftleft/&/| terms — pure codegen'd integer
    ops, no UDF. 2×16 bits → a 32-bit z in a bigint."""
    z = F.lit(0).cast("bigint")
    for k in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, k).bitwiseAND(F.lit(1)), 2 * k)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, k).bitwiseAND(F.lit(1)), 2 * k + 1)
        )
    return z


def zvalue(df: DataFrame, col_a: str, col_b: str, bits: int = Z_BITS) -> DataFrame:
    """Append a `__z` Morton-curve column over two numeric columns.

    Bucket bounds come from one 1-row aggregate broadcast back onto
    the frame (scalar subquery pattern — no driver-side collect in
    the data path)."""
    bounds = df.agg(
        F.min(col_a).alias("a_min"),
        F.max(col_a).alias("a_max"),
        F.min(col_b).alias("b_min"),
        F.max(col_b).alias("b_max"),
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    z = interleave_bits(
        rank_bucket(F.col(col_a), F.col("a_min"), F.col("a_max"), bits),
        rank_bucket(F.col(col_b), F.col("b_min"), F.col("b_max"), bits),
        bits,
    )
    return with_bounds.withColumn("__z", z).drop("a_min", "a_max", "b_min", "b_max")


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = Z_BITS,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the Z-order curve of two columns.

    `repartitionByRange(__z)` is one range exchange (sampled bounds,
    same machinery as a global sort) and `sortWithinPartitions` keeps
    each task's spill-friendly local sort; each output file then owns
    a contiguous z-range = a small rectangle in (col_a, col_b) space,
    and parquet footer min/max on BOTH columns becomes selective.
    `n_files` maps to files-per-write locally; at scale size it as
    bytes / target-file-size (~1 GB)."""
    zdf = zvalue(df, col_a, col_b, bits)
    (
        zdf.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
