"""Compaction + explain_report maintenance utilities."""

from __future__ import annotations

from pyspark.sql import functions as F

from lime_etl_spark.operators.maintenance import (
    compact_parquet,
    explain_report,
    parquet_file_count,
)
from lime_etl_spark.sources.readers import load_table


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "frag")
    # simulate a per-batch append sink: 40 tiny files
    spark.range(4000).select(
        F.col("id"), (F.col("id") % 7).alias("grp")
    ).repartition(40).write.parquet(path)
    assert parquet_file_count(path) >= 40
    before = sorted(r["id"] for r in spark.read.parquet(path).collect())

    n_after = compact_parquet(spark, path, target_file_mb=128)
    assert n_after <= 2
    after = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert after == before


def test_explain_report_surfaces_pushdown(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") < 10).select(
        "l_orderkey", "l_quantity"
    )
    rep = explain_report(li)
    assert any("LessThan(l_quantity" in f for f in rep["pushed_filters"])
    assert rep["read_schemas"] == ["l_orderkey:bigint,l_quantity:double"]
    assert not rep["cartesian"] and not rep["python_row_udfs"]


def test_explain_report_counts_joins(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    rep = explain_report(joined)
    assert rep["broadcast_joins"] == 1
