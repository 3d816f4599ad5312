"""Scale-pattern tests: salted skew joins and bucketed co-located
joins — correctness AND the plan property that makes them worth it."""

from __future__ import annotations

from pyspark.sql import functions as F

from lime_etl_spark.functions.skew import salted_join
from lime_etl_spark.sources.readers import read_table, write_bucketed


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_join(spark):
    # 90% of the fact rows share one hot key — the shape AQE alone
    # can't fully split
    fact = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("attr"))
    plain = fact.join(dim, on=["k"], how="inner").select("k", "payload", "attr")
    salted = salted_join(fact, dim, on=["k"], salts=8).select("k", "payload", "attr")
    assert _canon(plain) == _canon(salted)


def test_salted_left_join_keeps_unmatched(spark):
    fact = spark.range(100).select((F.col("id") % 150).alias("k"), F.col("id").alias("p"))
    dim = spark.range(10).select(F.col("id").alias("k"), F.lit("x").alias("attr"))
    plain = fact.join(dim, on=["k"], how="left").select("k", "p", "attr")
    salted = salted_join(fact, dim, on=["k"], salts=4, how="left").select("k", "p", "attr")
    assert _canon(plain) == _canon(salted)


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "t_orders_b", 8, ["o_orderkey"], sort_cols=["o_orderkey"])
    write_bucketed(li, "t_lineitem_b", 8, ["l_orderkey"], sort_cols=["l_orderkey"])

    ob, lb = read_table(spark, "t_orders_b"), read_table(spark, "t_lineitem_b")
    # disable auto-broadcast so the test observes the bucketed shuffle
    # behavior a 100 TB fact-fact join would have
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy("o_custkey").agg(
            F.sum("l_quantity").alias("total_qty")
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        pre_agg = plan.split("HashAggregate")[-1]  # below the agg: join + scans
        assert "SortMergeJoin" in plan
        assert "Exchange" not in pre_agg, pre_agg[:500]

        # same join on the raw (unbucketed) files DOES shuffle both sides
        raw = load_table(spark, sf_dir, "orders").join(
            load_table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        raw.collect()
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
        assert raw_plan.count("Exchange") >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_join_matches_plain_values(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(orders, "t_orders_v", 4, ["o_orderkey"])
    try:
        got = read_table(spark, "t_orders_v")
        assert _canon(got) == _canon(orders)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_v")


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Date-partitioned layout + date filter => partition pruning: the
    scan must list only the matching partition directory (at 100 TB
    this is the difference between reading one day and reading the
    lake). Asserted both on the physical plan (PartitionFilters) and
    on the actual files the scan touches."""
    from pyspark.sql import functions as F

    from lime_etl_spark.sources.readers import load_table, write_parquet

    out = str(tmp_path / "events_by_date")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    write_parquet(ev, out, partition_by=["event_date"])

    dates = [r["event_date"] for r in ev.select("event_date").distinct().collect()]
    assert len(dates) > 1
    target = sorted(dates)[0]

    scan = spark.read.parquet(out).where(F.col("event_date") == F.lit(target))
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = scan._jdf.queryExecution().explainString(mode)
    # the date predicate must land in PartitionFilters (directory-level
    # pruning), not just PushedFilters (row-group level)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan

    # and the filtered read returns exactly that day's rows
    assert scan.count() == ev.where(F.col("event_date") == F.lit(target)).count()


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling — the runtime answer to hot keys the
    static planner can't see: one key owning most of the fact rows
    gets its shuffle partition split into multiple tasks at runtime.
    Thresholds are lowered to trigger at test scale; the final
    adaptive plan must carry the skew=true marker AND the join result
    must be unchanged."""
    import pyspark.sql.functions as F

    # 200k rows on one hot key, a few rows on 1000 cold keys
    hot = spark.range(200_000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    cold = spark.range(5_000).select(
        (F.col("id") % 1000 + 100).alias("k"), F.col("id").alias("v")
    )
    fact = hot.unionByName(cold)
    dim = spark.range(2_000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )

    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ

        joined = fact.join(dim, "k")
        # execute THIS DataFrame (count() would plan a different query
        # whose executedPlan is not joined's), then read the finalized
        # adaptive plan
        rows = joined.collect()
        assert len(rows) == 200_000 + 5_000  # every key matches
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
