"""Sets E (dedup), F (similarity), G (text) vs DuckDB oracle."""

from __future__ import annotations

import pytest

from tests.oracle import assert_query_matches_oracle

ORACLED = [
    "txt_token_count",
    "txt_quality_score",
    "txt_langid",
    "txt_fingerprint",
    "txt_ngram_stats",
    "txt_chunk_windows",
    "txt_doc_frequency",
    "txt_langid_confusion",
    "txt_tfidf_topk",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_ivf_multiprobe",
    "knn_label_vote",
    "emb_quantize_error",
    "emb_label_centroids",
]


@pytest.mark.parametrize("name", ORACLED)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_minhash_candidates_superset_check(spark, sf_dir):
    """LSH output must be a subset of the exhaustive Jaccard pairs."""
    from lime_etl_spark.operators.dedup import dedup_minhash_lsh, dedup_ngram_jaccard

    lsh = {
        (r["doc_a"], r["doc_b"]) for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]) for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    assert lsh <= exact
    # at tau=0.5 with 4x4 bands the planted near-dups should be caught
    assert len(exact) > 0
    assert len(lsh) / len(exact) >= 0.8  # LSH recall on this corpus


def test_embedding_cosine_banding_recall(spark, sf_dir):
    """Sign-band LSH candidates must be a subset of the all-pairs
    truth, with high recall on the fixture corpus (13/14 at sf0.001).
    The all-pairs twin is pytest-only ground truth — quadratic per
    label block, never the shipped default."""
    from lime_etl_spark.operators.dedup import (
        dedup_embedding_cosine,
        embedding_cosine_allpairs,
    )

    banded = {
        (r["vec_a"], r["vec_b"])
        for r in dedup_embedding_cosine(spark, sf_dir).collect()
    }
    truth = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_cosine_allpairs(spark, sf_dir).collect()
    }
    assert banded <= truth
    assert len(truth) > 0
    # Probabilistic bound, floored below the measured 13/14 ≈ 0.93 at
    # sf0.001 so fixture regeneration can't flip it without a real
    # recall regression: 16 bands × 4 sign bits give analytic recall
    # ≈0.91 at the τ=0.35 boundary, → 1.0 for true near-dups.
    assert len(banded) / len(truth) >= 0.85


def test_embedding_leakage_banding_recall(spark, sf_dir):
    """ADVICE r3: cur_embedding_leakage is a leakage DETECTOR — false
    negatives are its failure mode — so pin its banded n_leaky_eval
    counts against an all-pairs truth twin, mirroring the
    dedup_embedding_cosine recall gate. The truth is computed inline
    with the operator's OWN split/dot helpers (quadratic per label
    block — pytest-only, fixture scale)."""
    from pyspark.sql import functions as F

    from lime_etl_spark.operators.dedup import _emb_dot
    from lime_etl_spark.operators.insights3 import (
        LEAK_TAU,
        LEAK_TRAIN_BUCKETS,
        cur_embedding_leakage,
    )
    from lime_etl_spark.operators.training import hash_bucket
    from lime_etl_spark.sources.readers import load_table

    got = {r["label"]: r for r in cur_embedding_leakage(spark, sf_dir).collect()}
    assert got, "leakage scan returned nothing"

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .withColumn("norm", F.sqrt(_emb_dot(F.col("embedding"), F.col("embedding"))))
        .withColumn(
            "is_train",
            (hash_bucket(F.col("vec_id"), 10) < LEAK_TRAIN_BUCKETS).cast("int"),
        )
    )
    t = emb.where("is_train = 1").select(
        "label", F.col("embedding").alias("emb_t"), F.col("norm").alias("norm_t")
    )
    v = emb.where("is_train = 0").select(
        "label",
        F.col("vec_id").alias("eval_vec"),
        F.col("embedding").alias("emb_v"),
        F.col("norm").alias("norm_v"),
    )
    cos = _emb_dot(F.col("emb_t"), F.col("emb_v")) / (
        F.col("norm_t") * F.col("norm_v")
    )
    truth = (
        t.join(v, "label")
        .where(cos >= LEAK_TAU)
        .groupBy("label")
        .agg(F.countDistinct("eval_vec").alias("n_leaky_true"))
    )
    truth_rows = {r["label"]: r["n_leaky_true"] for r in truth.collect()}
    n_true = sum(truth_rows.values())
    n_got = sum(r["n_leaky_eval"] for r in got.values())
    assert n_true > 0
    # Banded candidates ⊆ all pairs, so the detector may only
    # UNDERcount; same analytic ≥0.85 recall bound as the dedup twin
    # (16 bands × 4 sign bits ≈ 0.91 at the τ boundary, → 1.0 for
    # true near-dups).
    assert n_got <= n_true
    assert n_got / n_true >= 0.85
    for label, r in got.items():
        assert r["n_leaky_eval"] <= truth_rows.get(label, 0)


def test_simhash_invariants(spark, sf_dir):
    from lime_etl_spark.operators.dedup import (
        HAMMING_MAX,
        dedup_simhash,
        simhash_signatures,
    )
    from lime_etl_spark.sources.readers import load_table

    pairs = dedup_simhash(spark, sf_dir).collect()
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(load_table(spark, sf_dir, "documents")).collect()
    }
    for r in pairs:
        assert r["doc_a"] < r["doc_b"]
        ham = bin((sigs[r["doc_a"]] ^ sigs[r["doc_b"]]) & ((1 << 64) - 1)).count("1")
        assert ham == r["hamming"]
        assert ham <= HAMMING_MAX


def test_ivf_is_subset_of_bruteforce_universe(spark, sf_dir):
    """IVF results only pair vectors sharing a bucket; ranks are 1..k dense."""
    from lime_etl_spark.operators.similarity import ann_ivf_topk

    pdf = ann_ivf_topk(spark, sf_dir).toPandas()
    for _, grp in pdf.groupby("q_vec_id"):
        ranks = sorted(grp["rank"])
        assert ranks == list(range(1, len(ranks) + 1))


def test_trained_ivf_recall(spark, sf_dir):
    """Trained-centroid IVF (k-means cells, 4 probes of 16) must
    recover most of the exact top-k, be deterministic across runs, and
    produce dense per-query ranks."""
    from lime_etl_spark.plans.registry import all_queries

    def run():
        return all_queries()["ann_ivf_trained"].builder(spark, sf_dir).collect()

    rows = run()
    got = {(r["q_vec_id"], r["n_vec_id"]) for r in rows}
    truth = {
        (r["q_vec_id"], r["n_vec_id"])
        for r in all_queries()["ann_bruteforce_topk"].builder(spark, sf_dir).collect()
    }
    recall = len(got & truth) / len(truth)
    # Probabilistic floor with margin: the 500-vector fixture has 50
    # truth pairs, so one boundary pair moves recall by 0.02 — the r4
    # md5-init model measures 0.48 here (the SAME number the r3
    # tuning table recorded for this corpus); 0.44 only fails on a
    # real (≥2-pair) regression, not an init reshuffle.
    assert recall >= 0.44, f"trained IVF recall {recall:.2f} too low"
    # determinism: integer fixed-point means + struct tie-breaks →
    # identical rerun
    rerun = {(r["q_vec_id"], r["n_vec_id"], r["rank"]) for r in run()}
    assert rerun == {(r["q_vec_id"], r["n_vec_id"], r["rank"]) for r in rows}


def test_kmeans_model_shape_and_convergence(spark, sf_dir):
    """Model is k × dim; one extra Lloyd step must not increase the
    within-cluster cost (monotone convergence)."""
    from lime_etl_spark.functions.clustering import kmeans_fit, nearest_centroid
    from lime_etl_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])

    def cost(model):
        cells = [
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("v"),
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(model)
        ]
        return (
            emb.select(F.col("embedding").cast("array<double>").alias("v"))
            .select(F.array_min(F.array(*cells))["d"].alias("d"))
            .agg(F.sum("d"))
            .first()[0]
        )

    m2 = kmeans_fit(emb, k=8, iters=2)
    m3 = kmeans_fit(emb, k=8, iters=3)
    assert len(m2) == 8 and all(len(c) == dim for c in m2)
    assert cost(m3) <= cost(m2) + 1e-9
    assert nearest_centroid is not None


def test_multiprobe_recall_beats_single_probe(spark, sf_dir):
    """Multi-probe must recover at least as many true neighbors as a
    single probe (and in this corpus, strictly more)."""
    from lime_etl_spark.plans.registry import all_queries

    def pairs(name):
        return {
            (r["q_vec_id"], r["n_vec_id"])
            for r in all_queries()[name].builder(spark, sf_dir).collect()
        }

    truth = pairs("ann_bruteforce_topk")
    single = pairs("ann_ivf_topk") & truth
    multi = pairs("ann_ivf_multiprobe") & truth
    assert single <= multi
    assert len(multi) > len(single)


def test_simhash_scaled_equals_full_clustering(spark, sf_dir):
    """Connected components over the scaled edge list (star edges for
    identical signatures + banding over distinct signatures) must equal
    components over the full banded pair list."""
    from lime_etl_spark.operators.dedup import (
        HAMMING_MAX,
        simhash_band_pairs,
        simhash_edges_scaled,
        simhash_signatures,
    )
    from lime_etl_spark.operators.graph import connected_components
    from lime_etl_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    sigs = simhash_signatures(load_table(spark, sf_dir, "documents")).persist()
    verts = sigs.select(F.col("doc_id").alias("vid"))

    def comps(edges):
        labels = connected_components(
            verts, edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        )
        return {(r["vid"], r["label"]) for r in labels.collect()}

    full = simhash_band_pairs(sigs).where(F.col("hamming") <= HAMMING_MAX)
    scaled = simhash_edges_scaled(sigs)
    assert comps(scaled) == comps(full)
    sigs.unpersist()


def test_simhash_scaled_collapses_templated_corpus(spark):
    """A boilerplate corpus (many identical docs) must band-join over
    distinct signatures only: the star edges are linear in group size
    and the representative pair list stays tiny."""
    from lime_etl_spark.operators.dedup import simhash_edges_scaled, simhash_signatures
    from pyspark.sql import functions as F

    template = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, template) for i in range(200)] + [
        (1000, "an entirely different document about spark shuffles"),
        (1001, "an entirely different document about spark shuffles"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = simhash_signatures(docs).persist()
    assert sigs.select("simhash").distinct().count() == 2

    edges = simhash_edges_scaled(sigs).collect()
    star = [e for e in edges if e["hamming"] == 0]
    # linear, not quadratic: 199 star edges for the template group,
    # 1 for the pair — not C(200,2)+C(2,2)
    assert len(star) == 200
    assert all(e["doc_a"] in (0, 1000) for e in star)
    sigs.unpersist()
