"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every operator registered in
``lime_etl_spark.plans.registry`` (one per SURVEY.md §2 row).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lime_etl_spark.plans.registry import all_queries, hygienic


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from lime_etl_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Sequential-use contract: each returned builder is wrapped in
    ``hygienic``, which unpersists the PREVIOUS builder's tracked
    persists before building (scoped — never a session-global
    clearCache), so a sweep's live cache stays bounded to one
    operator's working set. Build → collect one query at a time (the
    driver's loop). A harness that builds several DataFrames before
    collecting them, or shares the SparkSession across threads, must
    call the unwrapped builders from
    ``lime_etl_spark.plans.registry.all_queries()`` instead — the
    hygiene pass would silently drop the earlier queries' persisted
    intermediates and force a recompute.
    """
    return {name: hygienic(spec.builder) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
