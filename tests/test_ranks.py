"""`functions/ranks.py` must reproduce the global-window semantics
EXACTLY — these tests pin it against Spark's own single-partition
`row_number`/`ntile` on adversarial shapes (ties, skew, n<k, n=1)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lime_etl_spark.functions.ranks import (
    ntile_from_rn,
    with_global_ntile,
    with_global_row_number,
)


def _frame(spark, values):
    rows = [(i, v) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "id bigint, v bigint")


SHAPES = {
    "distinct": list(range(100)),
    "all_ties": [7] * 40,
    "skewed": [1] * 50 + [2] * 3 + list(range(100, 147)),
    "tiny_n_lt_k": [5, 3, 9],
    "singleton": [42],
    "negative": [-5, -5, 0, 3, -17, 3, 3],
}


@pytest.mark.parametrize("shape", sorted(SHAPES))
def test_row_number_matches_global_window(spark, shape):
    df = _frame(spark, SHAPES[shape])
    got = with_global_row_number(
        df, F.col("v"), [F.col("v"), F.col("id")], n_buckets=4
    )
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("v", "id")).cast("bigint")
    )
    g = {r["id"]: r["rn"] for r in got.collect()}
    w = {r["id"]: r["rn"] for r in want.collect()}
    assert g == w
    n = len(SHAPES[shape])
    assert all(r["n_total"] == n for r in got.collect())


@pytest.mark.parametrize("shape", sorted(SHAPES))
@pytest.mark.parametrize("k", [1, 3, 4, 10])
def test_ntile_matches_global_window(spark, shape, k):
    df = _frame(spark, SHAPES[shape])
    got = with_global_ntile(
        df, F.col("v"), [F.col("v"), F.col("id")], k=k, out="t", n_buckets=4
    )
    want = df.withColumn("t", F.ntile(k).over(Window.orderBy("v", "id")))
    g = {r["id"]: r["t"] for r in got.collect()}
    w = {r["id"]: r["t"] for r in want.collect()}
    assert g == w


@pytest.mark.parametrize("shape", sorted(SHAPES))
def test_multi_ntiles_match_global_windows(spark, shape):
    """with_global_ntiles (the one-pass multi-spec form the RFM /
    length×quality consumers use) must equal per-column global ntile —
    mixed ASC/DESC specs, different k per spec, same frame."""
    from lime_etl_spark.functions.ranks import with_global_ntiles
    from lime_etl_spark.plans.registry import release_tracked_persists

    df = _frame(spark, SHAPES[shape])
    got = with_global_ntiles(
        df,
        [
            (F.col("v"), [F.col("v"), F.col("id")], 4, "a"),
            (-F.col("v"), [F.desc("v"), F.col("id")], 3, "b"),
            (F.col("id"), [F.col("id")], 10, "c"),
        ],
        n_buckets=4,
    )
    want = df.select(
        "id",
        F.ntile(4).over(Window.orderBy("v", "id")).alias("a"),
        F.ntile(3).over(Window.orderBy(F.desc("v"), "id")).alias("b"),
        F.ntile(10).over(Window.orderBy("id")).alias("c"),
    )
    g = {r["id"]: (r["a"], r["b"], r["c"]) for r in got.collect()}
    w = {r["id"]: (r["a"], r["b"], r["c"]) for r in want.collect()}
    assert g == w
    got.unpersist()
    release_tracked_persists()


def test_multi_ntiles_single_cache_entry_and_bounded_rosters(spark):
    """Plan contract: ONE cache entry (the tagged rollup), one
    partitioned sort per spec, and every unpartitioned window reads a
    bucket-keyed aggregate roster, never raw rows."""
    from lime_etl_spark.functions.ranks import with_global_ntiles
    from lime_etl_spark.plans.registry import release_tracked_persists

    df = _frame(spark, list(range(500)))
    got = with_global_ntiles(
        df,
        [
            (F.col("v"), [F.col("v"), F.col("id")], 4, "a"),
            (-F.col("v"), [F.desc("v"), F.col("id")], 4, "b"),
        ],
        n_buckets=4,
    )
    plan = got._jdf.queryExecution().optimizedPlan()
    # count unpartitioned Window nodes == #specs
    n_unpart, stack = 0, [plan]
    while stack:
        node = stack.pop()
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            n_unpart += 1
        ch = node.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    assert n_unpart == 2, plan.toString()[:2000]
    release_tracked_persists()


def test_desc_ordering_via_negated_value(spark):
    df = _frame(spark, SHAPES["skewed"])
    got = with_global_row_number(
        df, -F.col("v"), [F.desc("v"), F.col("id")], n_buckets=4
    )
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("v"), "id")).cast("bigint")
    )
    assert {r["id"]: r["rn"] for r in got.collect()} == {
        r["id"]: r["rn"] for r in want.collect()
    }


def test_ntile_formula_exhaustive(spark):
    """ntile_from_rn == ANSI ntile for every (n, k) in a dense grid."""
    for n in (1, 2, 5, 7, 12, 40):
        df = _frame(spark, list(range(n)))
        for k in (1, 2, 3, 4, 5, 8, 11, 40, 50):
            want = df.select(
                "id", F.ntile(k).over(Window.orderBy("v", "id")).alias("t")
            )
            got = df.select(
                "id",
                ntile_from_rn(
                    F.row_number().over(Window.orderBy("v", "id")),
                    F.lit(n),
                    k,
                ).alias("t"),
            )
            assert {r["id"]: r["t"] for r in got.collect()} == {
                r["id"]: r["t"] for r in want.collect()
            }, f"n={n} k={k}"


def test_entity_grain_window_is_partitioned(spark):
    """The whole point: the rank window over the ENTITY-grain input
    must be partitioned by the bucket column (hash exchange), and the
    only SinglePartition exchange in the plan feeds the ≤n_buckets
    offsets roster (input: HashAggregate keyed on __rk_b)."""
    import re

    df = _frame(spark, list(range(1000)))
    got = with_global_row_number(df, F.col("v"), [F.col("v"), F.col("id")])
    plan = got._jdf.queryExecution().executedPlan().toString()
    # local rank window is partitioned by __rk_b
    assert re.search(r"Window \[row_number\(\)[^\n]*\], \[__rk_b", plan), plan
    # every SinglePartition exchange sits directly on the bucket-keyed
    # aggregate (bounded roster), never on raw rows
    for m in re.finditer(r"Exchange SinglePartition[^\n]*\n\s*[+:\-| ]*\*?\(?\d*\)?\s*(\w+)\(?(keys=\[[^\]]*\])?", plan):
        node, keys = m.group(1), m.group(2) or ""
        assert node == "HashAggregate" and "__rk_b" in keys, m.group(0)


@pytest.mark.parametrize("shape", sorted(SHAPES))
def test_cumsum_matches_global_window(spark, shape):
    """with_global_cumsum must equal Spark's own single-partition
    running sum on every adversarial shape (ties, skew, n=1,
    negatives) — same pinning discipline as row_number/ntile."""
    from lime_etl_spark.functions.ranks import with_global_cumsum

    df = _frame(spark, SHAPES[shape])
    w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    got = {
        r["id"]: r["cum"]
        for r in with_global_cumsum(
            df, F.col("v"), [F.col("v"), F.col("id")], "v", out="cum", n_buckets=4
        ).collect()
    }
    assert got == want


def test_cumsum_desc_ordering_via_negated_value(spark):
    from lime_etl_spark.functions.ranks import with_global_cumsum

    df = _frame(spark, [10, 3, 3, 99, 0, 7])
    w = Window.orderBy(F.desc("v"), "id").rowsBetween(Window.unboundedPreceding, 0)
    want = {r["id"]: r["cum"] for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    got = {
        r["id"]: r["cum"]
        for r in with_global_cumsum(
            df, -F.col("v"), [F.desc("v"), F.col("id")], "v", out="cum", n_buckets=3
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("shape", sorted(SHAPES))
def test_grouped_row_number_matches_partitioned_window(spark, shape):
    """with_grouped_row_number == ROW_NUMBER() OVER (PARTITION BY g
    ORDER BY v, id) on every adversarial shape, including groups that
    collapse into a single bucket and cross-group value collisions."""
    from lime_etl_spark.functions.ranks import with_grouped_row_number

    values = SHAPES[shape]
    rows = [(i, v, f"g{i % 3}") for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "id bigint, v bigint, g string")
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        (r["g"], r["id"]): (r["rn"], r["nt"])
        for r in df.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .withColumn("nt", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .collect()
    }
    got = {
        (r["g"], r["id"]): (r["rn"], r["nt"])
        for r in with_grouped_row_number(
            df,
            ["g"],
            F.col("v"),
            [F.col("v"), F.col("id")],
            out="rn",
            total_out="nt",
            n_buckets=4,
        ).collect()
    }
    assert got == want
