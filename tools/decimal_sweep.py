"""Sweep every registered query's OUTPUT schema for decimal columns.

The driver's value hash is dtype/rendering-strict: a Spark
DECIMAL(38,0) output vs a DuckDB float64 fails even when values are
numerically identical (round-1 `dq_checksum_parity`). Repo
convention: final money/sum columns are cast to double (or bigint
for exact integer sums) — this sweep finds any that slipped.

Usage: python tools/decimal_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql.types import ArrayType, DecimalType, StructType


def _decimal_fields(schema: StructType, prefix: str = "") -> list[str]:
    out = []
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, DecimalType):
            out.append(f"{prefix}{f.name}:{dt.simpleString()}")
        elif isinstance(dt, StructType):
            out.extend(_decimal_fields(dt, prefix + f.name + "."))
        elif isinstance(dt, ArrayType) and isinstance(dt.elementType, DecimalType):
            out.append(f"{prefix}{f.name}:array<{dt.elementType.simpleString()}>")
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from lime_etl_spark.plans.registry import all_queries

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("decimal-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    bad = {}
    errs = {}
    for name, spec in sorted(all_queries().items()):
        try:
            df = spec.builder(spark, sf_dir)
            decs = _decimal_fields(df.schema)
            if decs:
                bad[name] = decs
        except Exception as e:  # noqa: BLE001
            errs[name] = repr(e)[:200]
    for name, decs in bad.items():
        print(f"DECIMAL {name}: {decs}")
    for name, e in errs.items():
        print(f"ERROR {name}: {e}")
    print(f"\n{len(bad)} queries with decimal output columns, {len(errs)} errors")
    return 1 if bad or errs else 0


if __name__ == "__main__":
    sys.exit(main())
