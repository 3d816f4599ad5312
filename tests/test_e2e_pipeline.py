"""End-to-end composition test: the orchestration runtime driving the
LLM-curation operator family as a dependent job DAG — the lime-etl
story completed (jobs exist to PERFORM this ETL; reference e2e model:
tests/e2e/test_runner.py runs a multi-job batch with deps and tests).

ingest → {dedup clusters, quality gate} → cluster-aware split →
final cross-table data tests, all bookkept in the parquet admin store.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lime_etl_spark.adapter.admin_store import SparkAdminStore
from lime_etl_spark.domain.specs import SimpleJobSpec, SparkBatchSpec
from lime_etl_spark.domain.statuses import SimpleTestResult
from lime_etl_spark.domain.value_objects import Result


def _check(name: str, ok: bool, detail: str = "") -> SimpleTestResult:
    return SimpleTestResult(
        test_name=name,
        outcome=Result.success() if ok else Result.failure(detail or name),
    )
from lime_etl_spark.operators.dedup import (
    JACCARD_TAU,
    doc_shingles,
    jaccard_pairs,
    lsh_candidates,
    minhash_signatures,
)
from lime_etl_spark.operators.graph import connected_components
from lime_etl_spark.operators.training import hash_bucket
from lime_etl_spark.service.runner import run_batch
from lime_etl_spark.service.table_jobs import DataTestJob, TableRefreshJob
from lime_etl_spark.sources.readers import load_table


def test_curation_pipeline_batch(spark, sf_dir, tmp_path):
    docs_path = str(tmp_path / "docs")
    clusters_path = str(tmp_path / "clusters")
    quality_path = str(tmp_path / "quality")
    split_path = str(tmp_path / "split")
    store = SparkAdminStore(spark, str(tmp_path / "admin"))

    def corpus(s):
        docs = load_table(s, sf_dir, "documents").select("doc_id", "text", "n_chars")
        copies = docs.where(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text", "n_chars"
        )
        return docs.unionByName(copies)

    ingest = TableRefreshJob(
        name="ingest_docs", source=corpus, target_path=docs_path, expect_min_rows=10
    )

    def build_clusters(ctx):
        docs = ctx.spark.read.parquet(docs_path)
        sh = doc_shingles(docs).persist()
        pairs = jaccard_pairs(
            sh, candidates=lsh_candidates(minhash_signatures(sh))
        ).where(F.col("jaccard") >= JACCARD_TAU)
        cc = connected_components(
            docs.select(F.col("doc_id").alias("vid")),
            pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        )
        sh.unpersist()
        cc.select(F.col("vid").alias("doc_id"), F.col("label").alias("component_id")).write.mode(
            "overwrite"
        ).parquet(clusters_path)

    def clusters_tests(ctx):
        docs_n = ctx.spark.read.parquet(docs_path).count()
        cl = ctx.spark.read.parquet(clusters_path)
        exhaustive = cl.count() == docs_n
        # planted copies MUST land in their original's cluster
        planted = (
            cl.alias("a")
            .join(cl.alias("b"), F.col("a.doc_id") + 1000000 == F.col("b.doc_id"))
            .where(F.col("a.component_id") != F.col("b.component_id"))
            .count()
        )
        return [
            _check("clusters_exhaustive", exhaustive, f"{cl.count()} vs {docs_n}"),
            _check("planted_dups_clustered", planted == 0, f"{planted} strays"),
        ]

    clusters = SimpleJobSpec(
        name="dedup_clusters",
        run=build_clusters,
        test=clusters_tests,
        dependencies=["ingest_docs"],
    )

    def build_quality(ctx):
        docs = ctx.spark.read.parquet(docs_path)
        toks = F.split(F.col("text"), " ")
        docs.select(
            "doc_id",
            (F.size(toks) >= 5).alias("keep"),
        ).write.mode("overwrite").parquet(quality_path)

    quality = SimpleJobSpec(
        name="quality_gate", run=build_quality, dependencies=["ingest_docs"]
    )

    def build_split(ctx):
        cl = ctx.spark.read.parquet(clusters_path)
        b = hash_bucket(F.col("component_id"), 100)
        split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
        cl.select("doc_id", split.alias("split")).write.mode("overwrite").parquet(split_path)

    def split_tests(ctx):
        sp = ctx.spark.read.parquet(split_path)
        n_splits = sp.select("split").distinct().count()
        docs_n = ctx.spark.read.parquet(docs_path).count()
        return [
            _check("three_way_split", n_splits == 3, f"{n_splits} splits"),
            _check("split_exhaustive", sp.count() == docs_n),
        ]

    split = SimpleJobSpec(
        name="cluster_split",
        run=build_split,
        test=split_tests,
        dependencies=["dedup_clusters"],
    )

    def keep_rate_check(s):
        q = s.read.parquet(quality_path)
        rate = q.where("keep").count() / q.count()
        return _check("keep_rate_sane", 0.0 < rate <= 1.0, f"rate={rate:.3f}")

    def counts_reconcile(s):
        a = s.read.parquet(docs_path).count()
        b = s.read.parquet(clusters_path).count()
        c = s.read.parquet(split_path).count()
        return _check("counts_reconcile", a == b == c, f"{a}/{b}/{c}")

    report = DataTestJob(
        name="final_report",
        checks=[keep_rate_check, counts_reconcile],
        dependencies=["quality_gate", "cluster_split"],
    )

    batch = SparkBatchSpec(
        name="curation_pipeline",
        jobs=[ingest, clusters, quality, split, report],
    )
    status = run_batch(batch, spark, store)

    assert status.broken_jobs == set()
    assert {r.job_name for r in status.job_results} == {
        "ingest_docs", "dedup_clusters", "quality_gate", "cluster_split", "final_report",
    }
    # admin bookkeeping: every job has a last-success timestamp and the
    # DAG's data tests are all recorded as passing
    for jn in ("ingest_docs", "dedup_clusters", "cluster_split", "final_report"):
        assert store.get_last_successful_ts(jn) is not None
    results = store.latest_test_results("dedup_clusters")
    assert results and all(r.outcome.is_success for r in results)
    # the split table exists and is cluster-consistent: no component
    # spans two splits
    cl = spark.read.parquet(clusters_path)
    sp = spark.read.parquet(split_path)
    spans = (
        cl.join(sp, "doc_id")
        .groupBy("component_id")
        .agg(F.countDistinct("split").alias("ns"))
        .where(F.col("ns") > 1)
        .count()
    )
    assert spans == 0
