"""Z-order layout: per-file footer min/max ranges must be bounded on
BOTH z-ordered columns — the property parquet file/row-group pruning
feeds on — while a linear single-column sort bounds only its own
column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from lime_etl_spark.sources.layout import interleave_bits, write_zordered
from lime_etl_spark.sources.readers import load_table


def _mean_range_fraction(path: str, col: str) -> float:
    """Mean per-file (max-min)/(global max-min) from parquet footers."""
    files = sorted(glob.glob(f"{path}/*.parquet"))
    assert files
    spans = []
    gmin, gmax = None, None
    per_file = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        assert fmin is not None, f"no stats for {col} in {f}"
        per_file.append((fmin, fmax))
        gmin = fmin if gmin is None else min(gmin, fmin)
        gmax = fmax if gmax is None else max(gmax, fmax)
    span = gmax - gmin
    assert span > 0
    for fmin, fmax in per_file:
        spans.append((fmax - fmin) / span)
    return sum(spans) / len(spans)


def test_interleave_bits_morton_order(spark):
    """Known Morton values: (x=3, y=5) → 100111b = 39 with 3 bits."""
    df = spark.range(1).select(
        interleave_bits(F.lit(3).cast("bigint"), F.lit(5).cast("bigint"), bits=3).alias("z")
    )
    # x bits (1,1) at even positions 0,2; y bits (1,0,1) at odd 1,3,5:
    # z = 1 + 2 + 4 + 0 + 0 + 32 = 39
    assert df.collect()[0].z == 39


def test_zorder_bounds_both_columns(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_zordered(li, zpath, "l_partkey", "l_suppkey", n_files=8)
    (
        li.repartitionByRange(8, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    z_part = _mean_range_fraction(zpath, "l_partkey")
    z_supp = _mean_range_fraction(zpath, "l_suppkey")
    lin_part = _mean_range_fraction(lpath, "l_partkey")
    lin_supp = _mean_range_fraction(lpath, "l_suppkey")
    # linear sort: near-perfect on its own column, useless on the other
    assert lin_part < 0.35
    assert lin_supp > 0.8
    # z-order: bounded on BOTH (each file a rectangle of (a,b) space)
    assert z_part < 0.8, f"z-order l_partkey fraction {z_part}"
    assert z_supp < 0.8, f"z-order l_suppkey fraction {z_supp}"
    # and strictly better than linear on the non-sorted column
    assert z_supp < lin_supp


def test_zorder_preserves_rows(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    zpath = str(tmp_path / "z2")
    write_zordered(li, zpath, "l_partkey", "l_suppkey", n_files=4)
    back = spark.read.parquet(zpath)
    assert back.count() == li.count()
    assert set(back.columns) == set(li.columns)
    # content identical (order-insensitive): same per-key quantity sums
    a = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("s"))
    b = back.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("s"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
