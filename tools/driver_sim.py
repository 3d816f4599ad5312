"""Simulate the driver's t2 correctness gate locally.

Runs every `queries()` entry AND its `oracle_sql()` twin at sf0.01
under a VANILLA SparkSession (driver defaults, not our tuned
session) and reports per-query match/mismatch. Usage:

    python tools/driver_sim.py            # all queries, sf0.01
    python tools/driver_sim.py q1_pricing_summary dedup_exact
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python tools/driver_sim.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from tests.oracle import compare_frames, duck_connection

    # Vanilla session: mirror the driver (no tuned confs beyond master).
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sys.argv[1:] or list(qs)

    results: dict[str, str] = {}
    t0 = time.time()
    with duck_connection(sf_dir) as con:
        for name in names:
            try:
                sdf = qs[name](spark, sf_dir).toPandas()
            except Exception:
                results[name] = "SPARK-ERROR"
                traceback.print_exc()
                continue
            if name not in oracles:
                results[name] = f"rows-only ({len(sdf)} rows)"
                continue
            try:
                ddf = con.execute(oracles[name]).fetchdf()
            except Exception:
                results[name] = "ORACLE-ERROR"
                traceback.print_exc()
                continue
            problems = compare_frames(sdf, ddf)
            results[name] = "OK" if not problems else "MISMATCH: " + " | ".join(problems)

    bad = {n: r for n, r in results.items() if r.startswith(("MISMATCH", "SPARK-ERROR", "ORACLE-ERROR"))}
    rows_only = [n for n, r in results.items() if r.startswith("rows-only")]
    for n, r in sorted(bad.items()):
        print(f"FAIL {n}: {r[:400]}")
    summary = {
        "total": len(results),
        "ok": sum(1 for r in results.values() if r == "OK"),
        "rows_only": len(rows_only),
        "bad": len(bad),
        "elapsed_s": round(time.time() - t0, 1),
    }
    # Auditable full-registry artifact (committed per round as
    # CORRECTNESS_full_r{N}.json): per-query match status so the
    # green claim can be checked without re-running the sweep.
    out_path = os.environ.get("DRIVER_SIM_OUT")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(
                {"summary": summary, "sf_dir": sf_dir, "queries": dict(sorted(results.items()))},
                fh,
                indent=1,
            )
    print(json.dumps(summary))
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
