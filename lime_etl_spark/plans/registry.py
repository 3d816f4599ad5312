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
    "lime_etl_spark.operators.insights4",
    "lime_etl_spark.operators.insights5",
    "lime_etl_spark.operators.insights6",
    "lime_etl_spark.operators.insights7",
    "lime_etl_spark.operators.pq",
    "lime_etl_spark.operators.sketches",
    "lime_etl_spark.operators.bpe",
    "lime_etl_spark.operators.unigram_lm",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    # DuckDB-runnable ANSI SQL, None (rows-only check), or a zero-arg
    # callable producing the SQL — used by oracles whose construction
    # is itself expensive (the FLAC planners spend ~20 s replaying the
    # encoder to build their unrolled SQL). Lazy matters beyond the
    # driver: mapInPandas closures are pickled BY REFERENCE, so every
    # executor-side Python worker imports the operator module on first
    # task — eager oracle construction made each fresh worker pay the
    # full replay before touching a single row (measured: 18 s of the
    # 52 s mm_decode_stats cold time was worker import).
    raw_oracle: str | None | Callable[[], str]
    description: str = ""

    @property
    def oracle(self) -> str | None:
        raw = self.raw_oracle
        if callable(raw):
            sql = raw()
            object.__setattr__(self, "raw_oracle", sql)  # cache once
            return sql
        return raw


def register(
    name: str,
    oracle: str | None | Callable[[], str] = None,
    description: str = "",
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, description)
        return fn

    return deco


# DataFrames persisted by the previous hygienic build, released at the
# next build's start (they can't be released earlier: the returned
# lazy DataFrame still reads them until its consumer's action runs).
_TRACKED_PERSISTS: list[DataFrame] = []


def release_tracked_persists() -> None:
    """Unpersist every DataFrame the last hygienic build persisted.
    Harnesses may call this after their final collect; hygienic()
    calls it automatically before each build."""
    while _TRACKED_PERSISTS:
        df = _TRACKED_PERSISTS.pop()
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 - session may be gone
            pass


def track_persist(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for the next hygiene
    sweep. Library helpers that must persist (with_global_ntiles)
    call this so callers OUTSIDE the hygienic() surface — tests,
    notebooks — don't leak a cache entry per call; they release it
    with release_tracked_persists(). Identity-deduped: inside a
    hygienic build the persist interception has already tracked it."""
    if not any(t is df for t in _TRACKED_PERSISTS):
        _TRACKED_PERSISTS.append(df)
    return df


def hygienic(builder: Builder) -> Builder:
    """Operator-scope cache hygiene for sweep harnesses.

    Operators persist intermediates (shingle tables, signature
    frames) that the returned lazy DataFrame still reads, so they
    cannot unpersist before their consumer's action. In a long-lived
    session running hundreds of queries back-to-back those caches
    accumulate (symptom: `CacheManager: Asked to cache already cached
    data` warnings). Wrapping each registry builder releases the
    PREVIOUS query's tracked persists at the next query's build start
    — bounding live cache to one operator's working set. Scoped to
    the persists this module observed (r4 ADVICE): a session-global
    `clearCache()` would also evict caches a co-resident harness or
    notebook owns. Tracking intercepts `DataFrame.persist` only for
    the synchronous duration of the build (builders construct their
    plans — and thus call persist — eagerly); a concurrent thread's
    persist in that window is simply left alone, same as before.
    """

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        release_tracked_persists()
        orig = DataFrame.persist

        def tracking(self: DataFrame, *a, **k) -> DataFrame:
            out = orig(self, *a, **k)
            _TRACKED_PERSISTS.append(out)
            return out

        DataFrame.persist = tracking  # type: ignore[method-assign]
        try:
            return builder(spark, sf_dir)
        finally:
            DataFrame.persist = orig  # type: ignore[method-assign]

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
