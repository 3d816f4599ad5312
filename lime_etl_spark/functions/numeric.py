"""Deterministic-aggregation helpers.

Floating-point SUM is order-dependent, and at 100 TB the partial-
aggregation order is never stable across runs or engines. Every money/
quantity aggregate in this engine therefore casts to exact DECIMAL
*before* summing (the source data is 2-decimal), and converts back to
DOUBLE only after the aggregate — so results are bit-identical across
Spark, DuckDB, partition counts and AQE re-plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: str | Column, scale: int = 2, precision: int = 18) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def to_double(c: Column) -> Column:
    return c.cast("double")


def money_sum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """SUM over an exact decimal view of a 2-decimal double column."""
    return to_double(F.sum(dec(col, scale))).alias(alias)
