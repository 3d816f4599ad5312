"""Query registry backing ``__spark_entry__.py``.

Each operator module registers its flagship queries here with a
DataFrame builder ``(spark, sf_dir) -> DataFrame`` and, when the
semantics are ANSI-SQL expressible, an equivalent DuckDB oracle SQL
string. The driver (and our own tests) run both and compare
row-count + schema + order-insensitive value hash — so builders and
oracles must alias every computed column identically.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

# Operator modules that register queries on import.
_OPERATOR_MODULES = (
    "lime_etl_spark.operators.relational",
    "lime_etl_spark.operators.relational_sub",
    "lime_etl_spark.operators.relational_more",
    "lime_etl_spark.operators.etl",
    "lime_etl_spark.operators.events",
    "lime_etl_spark.operators.text",
    "lime_etl_spark.operators.dedup",
    "lime_etl_spark.operators.graph",
    "lime_etl_spark.operators.similarity",
    "lime_etl_spark.operators.training",
    "lime_etl_spark.operators.curation",
    "lime_etl_spark.operators.multimodal",
    "lime_etl_spark.operators.profiling",
    "lime_etl_spark.operators.sql_surface",
    "lime_etl_spark.operators.insights",
    "lime_etl_spark.operators.insights2",
    "lime_etl_spark.operators.insights3",
    "lime_etl_spark.operators.pq",
    "lime_etl_spark.operators.sketches",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    description: str = ""


def register(
    name: str, oracle: str | None = None, description: str = ""
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, description)
        return fn

    return deco


def hygienic(builder: Builder) -> Builder:
    """Operator-scope cache hygiene for sweep harnesses.

    Operators persist intermediates (shingle tables, signature
    frames) that the returned lazy DataFrame still reads, so they
    cannot unpersist before their consumer's action. In a long-lived
    session running hundreds of queries back-to-back those caches
    accumulate (symptom: `CacheManager: Asked to cache already cached
    data` warnings). Wrapping each registry builder releases the
    previous query's leftovers at the next query's build start —
    bounding live cache to one operator's working set. Safe because
    sweep harnesses build → collect → next query sequentially.
    """

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.catalog.clearCache()
        return builder(spark, sf_dir)

    return run


def _load_all() -> None:
    for mod in _OPERATOR_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # module not built yet (incremental rounds)


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    _load_all()
    return _REGISTRY[name]
