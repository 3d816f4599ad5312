"""Spark 4 SQL-surface family: VARIANT, pipe syntax, listagg,
approx_top_k, recursive CTE, Python UDTF — oracle parity plus the
plan properties each one claims."""

from __future__ import annotations

import pytest

from lime_etl_spark.plans.registry import all_queries
from tests.oracle import assert_query_matches_oracle
from tests.test_plan_quality import plan_of

SQL_SURFACE_QUERIES = [
    "ev_variant_props",
    "q_pipe_returns_summary",
    "q_segment_listagg",
    "sketch_approx_topk",
    "etl_month_spine_rcte",
    "txt_chunk_udtf",
    "q_collation_distinct",
]


def test_collation_counts_tell_the_case_story(spark, sf_dir):
    """Binary distinct counts the planted lowercase variants as new
    values; the UTF8_LCASE count equals the true segment count."""
    r = all_queries()["q_collation_distinct"].builder(spark, sf_dir).collect()[0]
    assert r.n_distinct_ci < r.n_distinct_binary
    assert r.n_distinct_binary == 2 * r.n_distinct_ci


@pytest.mark.parametrize("name", SQL_SURFACE_QUERIES)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_variant_extraction_is_jvm_side(spark, sf_dir):
    """VARIANT parse + variant_get must stay in the JVM — no Python
    evaluation node anywhere in the plan."""
    plan = plan_of(spark, sf_dir, "ev_variant_props")
    assert "Python" not in plan
    assert "HashAggregate" in plan


def test_pipe_plan_is_plain_aggregate(spark, sf_dir):
    """Pipe syntax is surface only: the physical plan must be the
    same scan → partial agg → exchange → final agg as the DataFrame
    chain, with the post-AGGREGATE WHERE a plain filter (no join, no
    extra exchange beyond the one aggregation shuffle + order)."""
    plan = plan_of(spark, sf_dir, "q_pipe_returns_summary")
    assert plan.count("hashpartitioning(") == 1  # the one aggregation shuffle
    assert "Join" not in plan
    assert "partial_count" in plan  # map-side combine before the exchange
    assert "GreaterThanOrEqual(l_shipdate" in plan  # |> WHERE reached the scan


def test_udtf_equals_builtin_chunker(spark, sf_dir):
    """The UDTF chunker and the sequence/explode chunker must emit
    identical rows — proving the Python extension point is a drop-in
    for the perf path."""
    qs = all_queries()
    udtf_rows = sorted(
        map(tuple, qs["txt_chunk_udtf"].builder(spark, sf_dir).collect())
    )
    builtin_rows = sorted(
        map(tuple, qs["txt_chunk_windows"].builder(spark, sf_dir).collect())
    )
    assert udtf_rows == builtin_rows
    assert len(udtf_rows) > 0


def test_udtf_runs_arrow_batched(spark, sf_dir):
    """The UDTF must evaluate Arrow-batched (ArrowEvalPythonUDTF /
    arrow indicator in the plan), not row-pickled."""
    plan = plan_of(spark, sf_dir, "txt_chunk_udtf")
    assert "UDTF" in plan
    assert "Arrow" in plan


def test_month_spine_covers_gaps(spark, sf_dir):
    """The recursive spine must be contiguous month starts with no
    holes — including months that have zero orders (the rows a
    data-driven GROUP BY cannot emit)."""
    df = all_queries()["etl_month_spine_rcte"].builder(spark, sf_dir).collect()
    months = [r.month_start for r in df]
    assert months == sorted(months)
    # contiguity: consecutive entries are exactly one month apart
    import datetime

    for a, b in zip(months, months[1:]):
        da = datetime.date.fromisoformat(a)
        db = datetime.date.fromisoformat(b)
        assert (da.year * 12 + da.month) + 1 == db.year * 12 + db.month


def test_approx_topk_exact_at_small_k(spark, sf_dir):
    """With k ≥ distinct(event_type) the sketch tracks every item, so
    estimates equal exact counts — the property the oracle relies on."""
    from lime_etl_spark.sources.readers import load_table

    qs = all_queries()
    got = {
        r.item: r.est_count
        for r in qs["sketch_approx_topk"].builder(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert got == exact


def test_group_by_all_equals_explicit(spark, sf_dir):
    """Spark 4 GROUP BY ALL / ORDER BY ALL sugar must produce exactly
    the explicit form's rows (and therefore the same plan shape) —
    the surface an analyst migrating from DuckDB reaches for first."""
    from lime_etl_spark.sources.readers import register_views

    register_views(spark, sf_dir)
    sugar = spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem GROUP BY ALL ORDER BY ALL
        """
    ).collect()
    explicit = spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus, n
        """
    ).collect()
    assert [tuple(r) for r in sugar] == [tuple(r) for r in explicit]
