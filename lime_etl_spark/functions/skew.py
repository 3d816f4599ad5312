"""Skew-mitigation join helpers.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but two cases still need explicit treatment at 100 TB:

- a *shuffle* join where one key holds a double-digit percent of the
  rows (AQE splits partitions, but a single giant key still lands in
  one task after the split): ``salted_join`` shards the hot side by a
  deterministic salt and replicates the small side per salt, so the
  hot key spreads over ``salts`` tasks;
- repeated joins on the same key across a pipeline: bucket both
  tables instead (sources/readers.py ``write_bucketed``) and the
  shuffle disappears entirely.

The salt is ``xxhash64(entire row) % salts`` — deterministic (safe
for retries/speculative tasks), uniform, and computed JVM-side.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SALT_COL = "__salt"


def cap_adjacency(edges: DataFrame, pivot: str, other: str, cap: int) -> DataFrame:
    """Deterministically bound each pivot vertex's adjacency list to its
    ``cap`` smallest neighbors (by ``other``'s sort order).

    The wedge/triangle joins pivot on a shared vertex, so their cost
    carries a Σ deg(pivot)² term — a single hot hub (a boilerplate
    template with 10⁵ near-dups) puts deg² rows through one task.
    Capping the pivot's list before the self-join bounds every task to
    ≤ cap² rows per pivot. The selection is a deterministic function of
    the data (row_number over neighbor id), so retries/speculative
    tasks and the DuckDB oracle all pick the same survivors. Recall
    effect: wedges through a hub's neighbors beyond its first ``cap``
    are not enumerated — counts through hot hubs become lower bounds;
    exact whenever max degree ≤ cap.
    """
    w = Window.partitionBy(pivot).orderBy(other)
    rn = "__adj_rn"
    return edges.withColumn(rn, F.row_number().over(w)).where(F.col(rn) <= cap).drop(rn)


def with_salt(df: DataFrame, salts: int) -> DataFrame:
    """Deterministic per-row salt in [0, salts)."""
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(*df.columns), F.lit(salts)))


def replicate(df: DataFrame, salts: int) -> DataFrame:
    """Cross the dataframe with salt ids 0..salts-1 (small side only —
    this multiplies the data by ``salts``)."""
    return df.withColumn(SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salts - 1))))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: List[str],
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed (large) side to a smaller side, sharding hot keys.

    Equivalent to ``skewed.join(other, on, how)`` for how in
    {inner, left}: the salt is an extra equi-join key that splits each
    join key's rows across ``salts`` shuffle partitions, while the
    other side is replicated once per salt so every shard still finds
    its match. Use when one key dominates; for broadcast-able sides
    just broadcast instead.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    out = with_salt(skewed, salts).join(
        replicate(other, salts), on=on + [SALT_COL], how=how
    )
    return out.drop(SALT_COL)
