"""Per-query time decomposition for the bench set (guide §1).

For each headline + heavy query, measures on a warm session:
  t_build  — builder() call: driver-side DataFrame construction
             (load_table schema inference, py4j, any bounded collects
             that run eagerly during build)
  t_exec   — noop-sink execution of the already-built DataFrame
  n_jobs   — Spark jobs launched across build+exec (statusTracker)
Prints one JSON line per query and a sorted summary.

Usage: python tools/profile_bench.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import HEADLINE, HEAVY
    from lime_etl_spark.plans.registry import all_queries
    from lime_etl_spark.session import get_spark

    spark = get_spark(app_name="profile-bench")
    sc = spark.sparkContext
    registry = all_queries()
    names = sys.argv[1:] or [n for n in HEADLINE + HEAVY if n in registry]

    def job_count() -> int:
        # Max job id, not list length: the status tracker only retains
        # spark.ui.retainedJobs entries, so len() undercounts once a
        # long profiling run evicts early jobs (r9 ADVICE). Job ids are
        # monotone, so the id delta is the true launched-job count.
        ids = sc.statusTracker().getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    rows = []
    for name in names:
        builder = registry[name].builder
        # warm: full build+exec once (codegen, schema caches)
        builder(spark, sf_dir).write.mode("overwrite").format("noop").save()
        reps = 3
        tb = te = 0.0
        j0 = job_count()
        for _ in range(reps):
            t0 = time.perf_counter()
            df = builder(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            tb += t1 - t0
            te += t2 - t1
        j1 = job_count()
        rec = {
            "query": name,
            "t_build": round(tb / reps, 4),
            "t_exec": round(te / reps, 4),
            "n_jobs": round((j1 - j0) / reps, 1),
        }
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    rows.sort(key=lambda r: -(r["t_build"] + r["t_exec"]))
    print(f"\n{'query':28s} {'build':>7s} {'exec':>7s} {'jobs':>5s}")
    for r in rows:
        print(
            f"{r['query']:28s} {r['t_build']:>7.3f} {r['t_exec']:>7.3f} "
            f"{r['n_jobs']:>5.1f}"
        )
    tot_b = sum(r["t_build"] for r in rows)
    tot_e = sum(r["t_exec"] for r in rows)
    print(f"{'TOTAL':28s} {tot_b:>7.3f} {tot_e:>7.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
