"""DuckDB-oracle comparison harness.

Mirrors the driver's t2 check: run the Spark builder and the oracle
SQL on the same parquet tables, then compare row count, column names
and an order-insensitive canonical value form (exact — including
floats, which our operators make deterministic via decimal-exact
aggregation).
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb
import pandas as pd

from lime_etl_spark.sources.readers import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v: object) -> str:
    if v is None:
        return "@null"
    if isinstance(v, float):
        if math.isnan(v):
            return "@nan"
        return repr(v)
    if isinstance(v, Decimal):
        # Dtype-strict, like the driver's hash: a Decimal only
        # canonicalizes to a float rendering when the value is
        # float64-EXACT (round-trips through binary float). A wide
        # integral decimal (e.g. DECIMAL(38,0) sums > 2^53) keeps its
        # exact form and will NOT match a float64 on the other side —
        # this is the divergence the round-1 driver hash punished and
        # the old float() collapse masked.
        try:
            f = float(v)
        except (OverflowError, ValueError):
            return "@dec:" + format(v, "f")
        if not math.isinf(f) and Decimal(f) == v:
            return repr(f)
        return "@dec:" + format(v, "f")
    if isinstance(v, (datetime.datetime, datetime.date)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, (int, bool, str, bytes)):
        return repr(v)
    return repr(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = [tuple(_canon(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(out)


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_rows, d_rows = canonical_rows(spark_pdf), canonical_rows(duck_pdf)
    if s_rows != d_rows:
        diff = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
        only_s = [r for r in s_rows if r not in d_rows][:3]
        only_d = [r for r in d_rows if r not in s_rows][:3]
        problems.append(
            f"values differ; first aligned diffs={diff} only_spark={only_s} only_duck={only_d}"
        )
    return problems


def assert_query_matches_oracle(spark, sf_dir: str, name: str) -> None:
    from lime_etl_spark.plans.registry import get

    spec = get(name)
    sdf = spec.builder(spark, sf_dir).toPandas()
    assert spec.oracle is not None, f"{name} has no oracle"
    with duck_connection(sf_dir) as con:
        ddf = con.execute(spec.oracle).fetchdf()
    problems = compare_frames(sdf, ddf)
    assert not problems, f"{name}: " + " | ".join(problems)
