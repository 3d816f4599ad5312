"""Curation operator family (operators/curation.py): oracle matches at
sf0.001 plus behavioral tests the hash compare can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lime_etl_spark.operators.curation import scrub_text
from lime_etl_spark.plans.registry import get
from tests.oracle import assert_query_matches_oracle

CURATION = [
    "cur_decontaminate",
    "cur_repetition_ratio",
    "cur_scrub_stats",
    "cur_quality_gate",
    "cur_split_leakage",
    "samp_cluster_split",
    "cur_rarity_score",
    "cur_perplexity_bigram",
]


def test_cluster_split_has_zero_leakage(spark, sf_dir):
    """The cluster-aware split must make cross-split near-dup pairs
    structurally impossible — the property the naive doc-hash split
    violates (cur_split_leakage's off-diagonal cells)."""
    from lime_etl_spark.operators.curation import cluster_split_assignment
    from lime_etl_spark.operators.dedup import dedup_minhash_lsh

    asg = cluster_split_assignment(spark, sf_dir)
    pairs = dedup_minhash_lsh(spark, sf_dir)
    leaks = (
        pairs.join(
            asg.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "sa"),
            "doc_a",
        )
        .join(
            asg.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "sb"),
            "doc_b",
        )
        .where(F.col("sa") != F.col("sb"))
        .count()
    )
    assert leaks == 0


def test_split_leakage_counts_reconcile(spark, sf_dir):
    """Cell counts must sum to the verified near-dup pair total, and
    the is_leaky flag must mark exactly the off-diagonal cells."""
    from lime_etl_spark.operators.dedup import dedup_minhash_lsh

    rows = get("cur_split_leakage").builder(spark, sf_dir).collect()
    total_pairs = dedup_minhash_lsh(spark, sf_dir).count()
    assert sum(r["n_pairs"] for r in rows) == total_pairs
    for r in rows:
        assert r["is_leaky"] == (r["split_lo"] != r["split_hi"])


@pytest.mark.parametrize("name", CURATION)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_decontaminate_finds_cross_split_copies(spark, sf_dir):
    """The synthetic corpus holds exact duplicates; some straddle the
    train/test hash split, so contamination must be non-empty and every
    flagged doc must really share a 13-gram with a test doc."""
    rows = get("cur_decontaminate").builder(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["n_shared_grams"] >= 1 for r in rows)


def test_quality_gate_all_verdicts_present(spark, sf_dir):
    verdicts = {
        r["verdict"]: r["n_docs"]
        for r in get("cur_quality_gate").builder(spark, sf_dir).collect()
    }
    assert "keep" in verdicts and verdicts["keep"] > 0
    assert "too_short" in verdicts and "too_long" in verdicts
    # gate is exhaustive: verdict counts cover the whole corpus
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert sum(verdicts.values()) == docs.count()


def test_scrub_text_redacts_and_preserves(spark):
    df = spark.createDataFrame(
        [
            (1, "contact bob@example.com or https://a.example/x?q=1 now"),
            (2, "call 123456789012 twice 987654321"),
            (3, "clean text stays untouched"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["scrubbed"]
        for r in df.select("doc_id", scrub_text(F.col("text")).alias("scrubbed")).collect()
    }
    assert out[1] == "contact <EMAIL> or <URL> now"
    assert out[2] == "call <NUM> twice <NUM>"
    assert out[3] == "clean text stays untouched"


def test_repetition_flags_looping_doc(spark):
    """A doc that repeats one phrase must score far below a fresh doc
    and trip the flag."""
    loop = " ".join(["spark is fast"] * 12)
    fresh = " ".join(f"w{i}" for i in range(36))
    df = spark.createDataFrame([(1, loop), (2, fresh)], ["doc_id", "text"])

    from lime_etl_spark.functions.text import tokens, word_shingles

    grams = word_shingles(tokens(), 3)
    got = {
        r["doc_id"]: (r["ratio"], r["nd"], r["ng"])
        for r in df.select(
            "doc_id",
            (F.size(F.array_distinct(grams)).cast("double") / F.size(grams)).alias("ratio"),
            F.size(F.array_distinct(grams)).alias("nd"),
            F.size(grams).alias("ng"),
        ).collect()
    }
    assert got[1][0] < 0.15 and got[2][0] == 1.0


def test_decontaminate_test_side_broadcasts(spark, sf_dir):
    """Scale gate: the benchmark-gram side must be the broadcast build
    side — the 100 TB train side must not shuffle for the join."""
    df = get("cur_decontaminate").builder(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    assert "BroadcastHashJoin" in plan


def test_bigram_gate_catches_planted_word_salad(spark):
    """r7 verdict #4 done-condition: a word-salad document with the
    RIGHT unigram distribution but shuffled order scores exactly clean
    under the unigram proxy (its per-doc score is a mean over the same
    token multiset — provable blindness) but strictly worse under the
    interpolated bigram LM, whose lambda*p_bi mass collapses on the
    salad's rare (prev, tok) pairs."""
    from lime_etl_spark.operators.curation import _bigram_doc_scores

    fluent = " ".join(["a b"] * 20)  # alternating: every bigram common
    salad = " ".join(["a"] * 20 + ["b"] * 20)  # same multiset, sorted
    rows = [(i, "en", fluent) for i in range(8)] + [(100, "en", salad)]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")

    # unigram blindness, replayed with the proxy's exact integer chain:
    # both docs are 20 a + 20 b, so their unigram score_e6 is the SAME
    # integer (sum of identical per-token bits div 40) by construction.
    import math

    toks = [t for _i, _l, txt in rows for t in txt.split(" ")]
    total, ct_a, ct_b = len(toks), toks.count("a"), toks.count("b")
    bits = {
        "a": math.floor(math.log2(total / ct_a) * 1000000),
        "b": math.floor(math.log2(total / ct_b) * 1000000),
    }
    uni_fluent = sum(bits[t] for t in fluent.split(" ")) // 40
    uni_salad = sum(bits[t] for t in salad.split(" ")) // 40
    assert uni_fluent == uni_salad  # the unigram gate PROVABLY can't see it

    scores = {r.doc_id: r.score_e6 for r in _bigram_doc_scores(docs).collect()}
    assert scores[100] > scores[0]  # the bigram gate catches it
    assert all(scores[i] == scores[0] for i in range(8))
