"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
{"metric": "...", "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the `noop` sink (computes
every column, no driver collect, no disk write) — the honest way to
time a distributed plan.
"""

from __future__ import annotations

import json
import os
import sys
import time


# Headline set: mix of scan-agg, multi-join, window, dedup, similarity.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q18_large_orders",
    "q_top_parts_by_region",
    "etl_snapshot_diff",
    "ev_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_bruteforce_topk",
    "txt_quality_score",
    "samp_hash_split",
    "ev_asof_attribution",
    "pack_sequences",
    "ev_dau_mau",
    "ev_concurrent_sessions",
    "sketch_heavy_hitters",
    "ev_variant_props",
    "dedup_repeated_spans",
]

# Heavy steady-state families (iterative LSH tuning, dedup funnel,
# power-iteration pagerank): benched as a second non-headline section
# so regressions in the iterative/graph family are caught by the
# per-round driver bench, not just idle profiling.
HEAVY = [
    "ann_tuning_curve",
    "cur_dedup_funnel",
    "graph_pagerank_top",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from lime_etl_spark.plans.registry import all_queries
    from lime_etl_spark.session import get_spark

    spark = get_spark(app_name="lime_etl_spark-bench")
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]

    # Steady-state timing: run each query once to warm (Catalyst
    # optimization + whole-stage-codegen JIT for that query's operator
    # shapes), then time the second execution. A cluster-scale job runs
    # minutes-to-hours, so one-time compile cost (~seconds, data-size
    # independent) is noise there; timing it at sf0.1 would swamp the
    # part that actually scales with data.
    def run(name: str) -> None:
        registry[name].builder(spark, sf_dir).write.mode("overwrite").format("noop").save()

    for name in names:
        run(name)

    # best-of-2 timed runs: the box is time-shared, so a single sample
    # can be 5x off; the min is the reproducible steady-state figure
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run(name)
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    total = round(sum(timings.values()), 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # Scaling evidence: the same headline set at the neighboring
    # (10x smaller) scale factor. A near-linear total ratio means the
    # plans are data-bound, not overhead/shuffle-bound — the property
    # that predicts 100 TB behavior. Same steady-state discipline
    # (warm once, then time).
    sf_matrix: dict[str, float] = {sf: total}
    lower = os.path.join(os.path.dirname(sf_dir.rstrip("/")) or "/root/testdata", "sf0.01")
    if os.path.isdir(lower) and os.path.abspath(lower) != os.path.abspath(sf_dir):
        def run_at(name: str, d: str) -> None:
            registry[name].builder(spark, d).write.mode("overwrite").format("noop").save()

        small_total = 0.0
        for name in names:
            run_at(name, lower)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                run_at(name, lower)
                best = min(best, time.perf_counter() - t0)
            small_total += best
        sf_matrix["0.01"] = round(small_total, 4)

    # Second, non-headline section: heaviest iterative families, timed
    # once-warmed best-of-2 at the primary sf only (they dominate the
    # wall clock; the headline total stays comparable across rounds).
    heavy: dict[str, float] = {}
    for name in (n for n in HEAVY if n in registry):
        run(name)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run(name)
            best = min(best, time.perf_counter() - t0)
        heavy[name] = round(best, 4)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "sf_matrix": sf_matrix,
                "heavy": heavy,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
