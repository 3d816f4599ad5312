#!/usr/bin/env python
"""Data-bound scale evidence (r4 verdict #6, beyond the per-query
data_metrics already in bench.py).

The local sf0.1 bench is overhead-bound: 10x the data moves the
headline total ~2x, so wall seconds alone say little about 100 TB
behavior. This tool makes the data term dominant and measures it:

- Build a k-times corpus in /tmp by replicating the FACT tables
  (lineitem+orders with consistently shifted order keys; events with
  shifted event ids and users; documents/embeddings with shifted
  ids) while DIMENSIONS stay fixed — exactly how a real warehouse
  grows toward 100 TB (facts scale, dims don't). Replication happens
  IN SPARK (read -> union of key-shifted selects -> write), so the
  builder itself is the distributed ingest path.
- Time a data-bound query set at k=1 and k=K (warm once, median of
  3) and report the wall ratio against the k-fold data ratio. Plans
  whose ratio tracks k are data-bound (scan/agg/shuffle-dominated) —
  the property that predicts the 1000-executor behavior; ratios far
  below k mean fixed overhead still dominates that query at this
  scale.

Timing-only: correctness at these scales is already covered by the
sf0.01 oracle sweep; nothing here feeds CORRECTNESS artifacts.

Usage: python tools/scale_bench.py [K] [SRC_SF_DIR] [QUERY_SET]
QUERY_SET ∈ {core (default), bucketed, r6new, r7new, r8new, r9new, hub, bpe} —
`bucketed` runs the LSH/connected-components/PageRank/sliding-window
families (r5 verdict #3; see BUCKETED_QUERIES for why document text
is rotated per-replica), `r6new`/`r7new`/`r8new`/`r9new` the round-6/7/8/9 operator
families (see R6_QUERIES for why the quadratic-by-design calibration
tables are excluded), `hub` the planted-hub wedge-join leg (r6
verdict #2; K and SRC are ignored — see hub_leg), `bpe` the
512-merge batched-BPE flatness leg (r6 verdict #4; K and SRC are
ignored — see bpe_leg).
Writes one SCALE_r{N}.json-style line to stdout; the round snapshot
commits the lines as SCALE_r{N}.json.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

FACTS = {
    # table -> key columns shifted by i * (max+1) per replica
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
DIMS = ("region", "nation", "customer", "supplier", "part")

# Data-bound slice of the registry: fact-scan/agg/join shapes whose
# input grows k-fold under fact replication; value = driving fact
# table (for marginal-cost-per-row reporting).
QUERIES = {
    "q1_pricing_summary": "lineitem",
    "q6_revenue_forecast": "lineitem",
    "q14_promo_effect": "lineitem",
    "q18_large_orders": "lineitem",
    "q3_shipping_priority": "lineitem",
    "q_ship_lag_percentiles": "lineitem",
    "ev_daily_kpis": "events",
    "ev_sessionize": "events",
    "txt_quality_score": "documents",
    "dedup_exact": "documents",
}

# Bucketed/iterative families (r5 verdict #3): the 100 TB claims that
# need direct evidence are "LSH cost tracks candidates, not corpus^2"
# and "connected-components cost tracks graph diameter". Replicating
# documents VERBATIM would make every doc a k-way exact clone — a
# C(k,2) quadratic PAIR artifact of the replication itself, not of
# corpus growth — so build_scaled applies a per-replica alphabet
# ROTATION to document text: a character bijection preserves every
# intra-replica shingle/Jaccard relation exactly (so each replica
# carries the same near-dup structure as the source) while making
# cross-replica shingles disjoint, which is how independent new data
# actually behaves. Rotations are distinct for k <= 26.
BUCKETED_QUERIES = {
    "dedup_minhash_lsh": "documents",
    "dedup_components": "documents",
    "graph_pagerank_top": "documents",
    "ev_rolling_kpis": "events",
}

# Round-6 additions with a data-bound shape: CDC chunking (per-char
# HOF work, linear), the SRM grid and bootstrap lift (per-user
# reduces, linear), estimator calibration and node-Jaccard
# (candidate-/wedge-bound like the LSH family — rotated text keeps
# cross-replica shingles disjoint). The pair-explosion calibration
# tables (matryoshka / binary-sign recall) are deliberately absent:
# their brute-force ground-truth term is quadratic BY DESIGN and at
# scale runs on a fixed query sample, not the full corpus.
R6_QUERIES = {
    "dedup_cdc_chunks": "documents",
    "dedup_minhash_estimate_error": "documents",
    "graph_node_jaccard": "documents",
    "ev_srm_check": "events",
    "ev_lift_bootstrap_ci": "events",
}
# Round-7 additions with a data-bound shape: CUSUM and the Holm grid
# are per-day/per-user reduces (linear), RAKE and winnowing pay the
# corpus-linear tokenize/hash stage (winnowing's pair join is bounded
# by the df-cut), local clustering is wedge-bound like the LSH family
# (rotated text keeps cross-replica shingles disjoint), and k-center
# is K linear passes over the replicated embeddings. mm_av_bitrate is
# fixture-bound (not sf-driven) and deliberately absent.
R7_QUERIES = {
    "ev_changepoint_cusum": "events",
    "ev_srm_holm": "events",
    "txt_rake_scores": "documents",
    "dedup_winnowing_overlap": "documents",
    "graph_local_clustering": "documents",
    "samp_kcenter_coreset": "embeddings",
}
# Round-8 additions with a data-bound shape: SPRT and the bigram LM
# are one-window / counter-grain over events/tokens (linear), char
# entropy pays the corpus-linear char histogram, rich-club is degree-
# join-bound over the verified pair graph (rotated text keeps
# cross-replica shingles disjoint), and Gumbel top-K is one row-local
# key pass + TakeOrdered. The FLAC queries are fixture-bound (not
# sf-driven) and deliberately absent — their scale leg is the media
# decode-throughput row (tools/media_decode_bench.py --scale).
R8_QUERIES = {
    "ev_sprt_gate": "events",
    "cur_perplexity_bigram": "documents",
    "txt_entropy_profile": "documents",
    "graph_rich_club": "documents",
    "samp_gumbel_topk": "documents",
}
# Round-9 additions with a data-bound shape: the unigram trainer's
# only data-proportional job is the word-frequency scan (vocab-
# bounded model state after), and the two de-skewed grouped-rank ops
# (samp_curriculum / samp_source_interleave) are exactly the shapes
# the r9 low-cardinality-window fix must keep sub-linear. The FLAC
# stereo / audio near-dup queries are fixture-bound and deliberately
# absent (media decode has its own throughput leg).
R9_QUERIES = {
    "txt_unigram_train": "documents",
    "txt_unigram_fertility": "documents",
    "samp_curriculum": "documents",
    "samp_source_interleave": "documents",
}
QUERY_SETS = {
    "core": QUERIES,
    "bucketed": BUCKETED_QUERIES,
    "r6new": R6_QUERIES,
    "r7new": R7_QUERIES,
    "r8new": R8_QUERIES,
    "r9new": R9_QUERIES,
}


def hub_leg(spark: SparkSession, degrees=(2000, 16000)) -> dict:
    """Planted-hub wedge-join leg (r6 verdict #2): a pure star graph
    with hub degree H makes the Σ deg(pivot)² term the WHOLE cost —
    uncapped wedge enumeration emits C(H,2) pairs through one pivot
    key (quadratic in H, all in one task), while the degree-capped
    plan (cap_adjacency at WEDGE_DEGREE_CAP) is bounded at C(cap,2)
    pairs per pivot regardless of H. Timing both at H and 4H proves
    the bound: capped wall stays ~flat while uncapped grows ~16x in
    wedge rows. Synthetic edges (no corpus build) — this isolates the
    wedge stage from LSH candidate generation."""
    from lime_etl_spark.operators.graph import (
        WEDGE_DEGREE_CAP,
        node_jaccard_from_edges,
    )

    out: dict = {"cap": WEDGE_DEGREE_CAP, "hub_degrees": list(degrees)}
    for mode_name, cap in (("capped", WEDGE_DEGREE_CAP), ("uncapped", None)):
        mode: dict[str, float] = {}
        for h in degrees:
            edges = (
                spark.range(1, h + 1, 1, 32)
                .select(F.lit(0).cast("bigint").alias("doc_a"), F.col("id").alias("doc_b"))
                .persist()
            )
            edges.count()

            def run(edges=edges, cap=cap):
                node_jaccard_from_edges(edges, cap=cap).write.mode(
                    "overwrite"
                ).format("noop").save()

            mode[f"h{h}_sec"] = _median(run, 3)
            mode[f"h{h}_wedge_rows"] = (
                (WEDGE_DEGREE_CAP * (WEDGE_DEGREE_CAP - 1)) // 2
                if cap is not None
                else h * (h - 1) // 2
            )
            edges.unpersist()
        mode["ratio"] = round(
            mode[f"h{degrees[-1]}_sec"] / mode[f"h{degrees[0]}_sec"], 2
        )
        out[mode_name] = mode
    return out


def build_scaled(spark: SparkSession, src: str, out: str, k: int) -> None:
    os.makedirs(out, exist_ok=True)
    for t in DIMS:
        shutil.copyfile(
            os.path.join(src, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )
    alpha = "abcdefghijklmnopqrstuvwxyz"
    for t, keys in FACTS.items():
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        shifts = {c: df.agg(F.max(c)).collect()[0][0] + 1 for c in keys}

        def replica(i: int, df=df, keys=keys, t=t, shifts=shifts):
            cols = []
            for c in df.columns:
                if c in keys:
                    cols.append((F.col(c) + F.lit(i * shifts[c])).alias(c))
                elif t == "documents" and c == "text":
                    # per-replica alphabet rotation (see BUCKETED_QUERIES
                    # note): intra-replica similarity structure is
                    # preserved bijectively; replicas don't alias
                    rot = alpha[i % 26 :] + alpha[: i % 26]
                    cols.append(F.translate(F.col(c), alpha, rot).alias(c))
                else:
                    cols.append(F.col(c))
            return df.select(*cols)

        copies = [replica(i) for i in range(k)]
        union = copies[0]
        for c in copies[1:]:
            union = union.unionByName(c)
        # uniform 32-file layout at EVERY k: otherwise k=1 facts land
        # in one parquet file and the k=1 timings measure parallelism
        # starvation (1 split on 32 cores), not data cost — at k=16
        # that artifact made the LSH leg look FASTER than k=1. With
        # the layout held constant the ratio isolates the data term.
        union.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )


def bpe_leg(
    spark: SparkSession, rounds: int = 96, k: int = 8,
    vocab_limit: int = 50_000, n_words: int = 50_000,
) -> dict:
    """Production-merge-count BPE leg (r6 verdict #4): run the batched
    trainer to rounds*k >= 512 merges and report seconds per
    merge-round. The 50k-merge production claim rests on per-round
    cost being FLAT (model-state-bounded collects + the measured
    _BATCH_CHECKPOINT_EVERY=2 localCheckpoint cadence — see bpe.py for
    the cadence A/B); flatness_ratio compares the mean
    of the last 8 rounds to the first 8 — ~1.0 means the curve does
    not bend and 50k merges cost rounds*cost, not rounds^2.

    Word universe: the fixture corpus has only 31 distinct lowercase
    words, so whole-corpus BPE legitimately EXHAUSTS at ~90 merges
    regardless of vocab_limit — too few to probe the 512+ regime. The
    leg therefore feeds the real trainer a synthesized 50k-word vocab
    (md5 hex re-lettered onto a 16-letter alphabet): the claim under
    test is the TRAINER'S mechanics (collect cadence, replace-chain
    lineage, checkpoint reset), which don't care what the words mean,
    only that pairs remain to merge."""
    from lime_etl_spark.operators.bpe import bpe_merge_table_batched

    docs = spark.range(0, n_words, 1, 32).select(
        F.translate(
            F.md5(F.col("id").cast("string")), "0123456789", "ghijklmnop"
        ).alias("text")
    )
    times: dict[int, float] = {}

    def on_round(r: int, sec: float) -> None:
        times[r] = round(sec, 4)

    merged = bpe_merge_table_batched(
        docs, rounds=rounds, k=k, vocab_limit=vocab_limit, on_round=on_round
    )
    n_merges = merged.count()
    order = sorted(times)
    head = [times[r] for r in order[:8]]
    tail = [times[r] for r in order[-8:]]
    total = sum(times.values())
    return {
        "rounds": len(times),
        "k": k,
        "n_merges": n_merges,
        "total_sec": round(total, 2),
        "sec_per_round_first8": round(sum(head) / len(head), 4),
        "sec_per_round_last8": round(sum(tail) / len(tail), 4),
        "flatness_ratio": round((sum(tail) / len(tail)) / (sum(head) / len(head)), 2),
        # every 8th round's wall: the shape of the curve, compactly
        "round_times_sampled": {r: times[r] for r in order[::8]},
    }


def _median(run, n: int) -> float:
    run()  # warm: parquet footers, codegen, broadcast caches
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 4)


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    query_set = sys.argv[3] if len(sys.argv) > 3 else "core"
    if query_set in ("hub", "bpe"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName(f"scale-bench-{query_set}")
            .config("spark.sql.shuffle.partitions", cpus)
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.driver.memory", "48g")
            .getOrCreate()
        )
        if query_set == "hub":
            print(json.dumps({"metric": "scale_leg_hub", **hub_leg(spark)}))
        else:
            print(json.dumps({"metric": "scale_leg_bpe", **bpe_leg(spark)}))
        spark.stop()
        return 0
    if query_set not in QUERY_SETS:
        print(
            f"unknown query set {query_set!r}; choose from {sorted(QUERY_SETS)}",
            file=sys.stderr,
        )
        return 2
    queries = QUERY_SETS[query_set]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    from lime_etl_spark.plans.registry import all_queries, hygienic

    # v3: per-replica rotated document text (v1 verbatim clones would
    # quadratically inflate the dedup legs) + uniform 32-file layout
    # at every k (v2's single-file k=1 dirs measured parallelism
    # starvation, not data cost)
    base = "/tmp/sparkgraft_scale_v3"
    dirs = {1: os.path.join(base, "k1"), k: os.path.join(base, f"k{k}")}
    for kk, d in dirs.items():
        if not os.path.isdir(os.path.join(d, "lineitem.parquet")):
            build_scaled(spark, src, d, kk)

    registry = all_queries()
    fact_rows = {
        t: spark.read.parquet(os.path.join(dirs[1], f"{t}.parquet")).count()
        for t in set(queries.values())
    }
    out: dict[str, dict] = {}
    for name, fact in queries.items():
        if name not in registry:
            continue
        builder = hygienic(registry[name].builder)
        row: dict[str, float] = {}
        for kk, d in dirs.items():
            def run(d=d, builder=builder):
                builder(spark, d).write.mode("overwrite").format("noop").save()

            row[f"k{kk}_sec"] = _median(run, 3)
        row["ratio"] = round(row[f"k{k}_sec"] / row["k1_sec"], 2)
        # the number that extrapolates: wall-time increase per extra
        # input row, with each query's fixed overhead subtracted out
        extra_rows = fact_rows[fact] * (k - 1)
        row["fact_rows_k1"] = fact_rows[fact]
        row["marginal_ns_per_row"] = round(
            (row[f"k{k}_sec"] - row["k1_sec"]) * 1e9 / extra_rows, 1
        )
        out[name] = row
    total1 = round(sum(r["k1_sec"] for r in out.values()), 4)
    totalk = round(sum(r[f"k{k}_sec"] for r in out.values()), 4)
    print(
        json.dumps(
            {
                "metric": "scale_leg_total",
                "query_set": query_set,
                "k": k,
                "src_sf": src.rstrip("/").rsplit("sf", 1)[-1],
                "total_k1_sec": total1,
                f"total_k{k}_sec": totalk,
                "total_ratio": round(totalk / total1, 2),
                "queries": out,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
