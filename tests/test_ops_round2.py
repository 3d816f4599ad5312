"""Round-2 operator tests: repeated-span memorization audit,
epoch-shuffle determinism, best-fit packing invariants."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lime_etl_spark.operators.training import PACK_BUDGET
from lime_etl_spark.plans.registry import all_queries
from tests.oracle import assert_query_matches_oracle


@pytest.mark.parametrize(
    "name", ["dedup_repeated_spans", "samp_epoch_shuffle"]
)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_repeated_spans_catches_planted_excerpt(spark):
    """A document quoting a 20-token excerpt of another must surface
    with the right coverage ratio; unrelated docs must not."""
    from lime_etl_spark.operators.dedup import SPAN_N

    base_words = [f"w{i}" for i in range(60)]
    excerpt = base_words[10:30]  # 20 tokens → 20-SPAN_N+1 shared starts
    quoter = [f"q{i}" for i in range(10)] + excerpt + [f"z{i}" for i in range(10)]
    other = [f"x{i}" for i in range(50)]
    docs = spark.createDataFrame(
        [
            (1, " ".join(base_words), "en", "s", len(" ".join(base_words))),
            (2, " ".join(quoter), "en", "s", len(" ".join(quoter))),
            (3, " ".join(other), "en", "s", len(" ".join(other))),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {
            r.doc_id: r
            for r in all_queries()["dedup_repeated_spans"]
            .builder(spark, d)
            .collect()
        }
    assert 3 not in out  # no shared spans
    assert set(out) == {1, 2}
    shared_starts = len(excerpt) - SPAN_N + 1
    assert out[2].n_shared_starts == shared_starts
    assert out[1].n_shared_starts == shared_starts
    # the quoter (40 tokens) has higher coverage than the source (60)
    assert out[2].shared_ratio > out[1].shared_ratio


def test_epoch_shuffle_decorrelates(spark, sf_dir):
    """Epochs must actually reshuffle: few fixed points, mass spread
    beyond the zero-displacement decile."""
    rows = all_queries()["samp_epoch_shuffle"].builder(spark, sf_dir).collect()
    total = sum(r.n_docs for r in rows)
    fixed = sum(r.n_fixed_points for r in rows)
    assert fixed < 0.05 * total  # a replayed epoch would be 100% fixed
    decile0 = next(r.n_docs for r in rows if r.displacement_decile == 0)
    assert decile0 < 0.5 * total


def test_best_fit_invariants_and_beats_greedy(spark, sf_dir):
    qs = all_queries()
    bf = qs["pack_best_fit"].builder(spark, sf_dir).toPandas()
    # no regular bin exceeds the budget; oversize bins are exactly the >budget docs
    regular = bf[~bf.oversize]
    assert (regular.used_tokens <= PACK_BUDGET).all()
    assert (bf[bf.oversize].n_docs == 1).all()
    assert (bf[bf.oversize].used_tokens > PACK_BUDGET).all()

    # every doc is packed exactly once
    from lime_etl_spark.operators.text import BPE_RE
    from lime_etl_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert int(bf.n_docs.sum()) == n_docs
    toks = docs.select(
        F.sum(F.regexp_count("text", F.lit(BPE_RE)).cast("bigint")).alias("t")
    ).collect()[0].t
    assert int(bf.used_tokens.sum()) == toks  # token mass conserved

    # BFD uses no more bins than a budget-respecting next-fit greedy
    # (pack_sequences is a running-sum splitter whose packs may
    # overflow the budget, so bin counts aren't comparable with it)
    sized = (
        docs.select(
            "doc_id",
            "lang",
            (F.col("doc_id") % 8).alias("shard"),
            F.regexp_count("text", F.lit(BPE_RE)).cast("bigint").alias("n"),
        )
        .toPandas()
        .sort_values("doc_id")
    )
    next_fit_bins = 0
    for _, grp in sized.groupby(["lang", "shard"]):
        used = PACK_BUDGET + 1  # force-open the first bin
        for n in grp.n:
            n = int(n)
            if used + n > PACK_BUDGET:
                next_fit_bins += 1
                used = 0
            used += n
    assert len(bf) <= next_fit_bins

    # deterministic: a rerun is byte-identical
    bf2 = qs["pack_best_fit"].builder(spark, sf_dir).toPandas()
    key = ["lang", "shard", "bin_id"]
    assert bf.sort_values(key).reset_index(drop=True).equals(
        bf2.sort_values(key).reset_index(drop=True)
    )


def test_best_fit_is_arrow_batched(spark, sf_dir):
    plan = (
        all_queries()["pack_best_fit"]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapGroupsInPandas" in plan


_ = pd  # imported for type availability in applyInPandas operators


# --- emb_silhouette_audit (driver round 2) ----------------------------------


def test_silhouette_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "emb_silhouette_audit")


def test_silhouette_bounds_and_determinism(spark, sf_dir):
    rows = all_queries()["emb_silhouette_audit"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["mean_silhouette"] <= 1.0
        assert 0 <= r["n_nearest_other"] <= r["n_vecs"]
        assert 0.0 <= r["misassign_share"] <= 1.0
    again = all_queries()["emb_silhouette_audit"].builder(spark, sf_dir).collect()
    assert rows == again


def test_silhouette_separated_clusters_score_high(spark):
    """Two well-separated synthetic clusters must score near +1 with
    zero misassignments; swapping half the labels must crater both."""
    import pyspark.sql.functions as SF

    from lime_etl_spark.operators.similarity import emb_silhouette_audit

    def corpus(flip: bool):
        rows = []
        for i in range(40):
            base = [10.0, 0.0] if i % 2 == 0 else [0.0, 10.0]
            vec = [base[0] + (i % 5) * 0.1, base[1] + (i % 7) * 0.1] + [0.0] * 6
            label = i % 2
            if flip and i < 20:
                label = 1 - label
            rows.append((i, label, vec))
        return spark.createDataFrame(
            rows, "vec_id bigint, label int, embedding array<float>"
        )

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        corpus(False).write.parquet(os.path.join(d, "embeddings.parquet"))
        good = {r["label"]: r for r in emb_silhouette_audit(spark, d).collect()}
        assert all(r["mean_silhouette"] > 0.8 for r in good.values())
        assert all(r["n_nearest_other"] == 0 for r in good.values())
    with tempfile.TemporaryDirectory() as d:
        corpus(True).write.parquet(os.path.join(d, "embeddings.parquet"))
        bad = {r["label"]: r for r in emb_silhouette_audit(spark, d).collect()}
        assert all(r["misassign_share"] >= 0.4 for r in bad.values())


# --- samp_importance_dsir (driver round 2) ----------------------------------


def test_dsir_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "samp_importance_dsir")


def test_dsir_target_language_scores_highest(spark, sf_dir):
    """The target slice must dominate its own importance distribution:
    mean importance for 'en' strictly above every other language, and
    its selected share the largest."""
    rows = {r["lang"]: r for r in all_queries()["samp_importance_dsir"].builder(spark, sf_dir).collect()}
    assert "en" in rows and len(rows) > 1
    en = rows["en"]
    for lang, r in rows.items():
        assert r["n_docs"] > 0
        assert 0.0 <= r["share_selected"] <= 1.0
        if lang != "en":
            assert en["mean_importance"] > r["mean_importance"]
            assert en["share_selected"] >= r["share_selected"]


# --- cur_perplexity_proxy (driver round 2) ----------------------------------


def test_perplexity_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "cur_perplexity_proxy")


def test_perplexity_gibberish_scores_high_boilerplate_low(spark):
    """Under the corpus unigram LM, a doc of unique-everywhere tokens
    must score far above a doc made of the corpus's most common
    tokens — the separation the quality gate relies on."""
    import os
    import tempfile

    from lime_etl_spark.operators.curation import cur_perplexity_proxy

    common = " ".join(["the quick brown fox"] * 25)  # high-frequency mass
    rows = [(i, common, "common", "s", len(common)) for i in range(20)]
    gib = " ".join(f"zq{i}x{i * 7}" for i in range(100))
    rows.append((100, gib, "gibberish", "s", len(gib)))
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["lang"]: r for r in cur_perplexity_proxy(spark, d).collect()}
    assert out["gibberish"]["mean_bits_per_token"] > 3 * out["common"]["mean_bits_per_token"]
    assert out["gibberish"]["share_above_corpus_mean"] == 1.0
    assert out["common"]["share_above_corpus_mean"] == 0.0


# --- emb_dim_correlation (driver round 2) -----------------------------------


def test_dim_correlation_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "emb_dim_correlation")


def test_dim_correlation_finds_planted_copy_dim(spark):
    """A dimension that duplicates another must surface as the top
    pair with corr ~ 1; an anti-correlated pair as corr ~ -1."""
    import os
    import tempfile

    from lime_etl_spark.operators.similarity import emb_dim_correlation

    rows = []
    for i in range(200):
        base = [((i * 37 + j * 11) % 97) / 97.0 - 0.5 for j in range(6)]
        vec = base + [base[0], -base[1]]  # dim6=copy(dim0), dim7=-dim1
        rows.append((i, i % 3, vec))
    docs = spark.createDataFrame(rows, "vec_id bigint, label int, embedding array<float>")
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "embeddings.parquet"))
        out = emb_dim_correlation(spark, d).collect()
    top = {(r["dim_a"], r["dim_b"]): r["corr"] for r in out[:2]}
    assert top[(0, 6)] > 0.999
    assert top[(1, 7)] < -0.999


# --- dq_inclusion_dependencies (driver round 2) -----------------------------


def test_inclusion_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "dq_inclusion_dependencies")


def test_inclusion_discovers_tpch_fk_graph(spark, sf_dir):
    """Every real TPC-H FK must surface with inclusion exactly 1.0 —
    the data-driven ERD reconstruction the operator exists for."""
    rows = {
        (r["child_col"], r["parent_col"]): r["inclusion"]
        for r in all_queries()["dq_inclusion_dependencies"].builder(spark, sf_dir).collect()
    }
    expected_fks = [
        ("nation.n_regionkey", "region.r_regionkey"),
        ("customer.c_nationkey", "nation.n_nationkey"),
        ("supplier.s_nationkey", "nation.n_nationkey"),
        ("orders.o_custkey", "customer.c_custkey"),
        ("lineitem.l_orderkey", "orders.o_orderkey"),
        ("lineitem.l_partkey", "part.p_partkey"),
        ("lineitem.l_suppkey", "supplier.s_suppkey"),
    ]
    for fk in expected_fks:
        assert rows.get(fk) == 1.0, (fk, rows.get(fk))


# --- cur_budget_select (driver round 2) -------------------------------------


def test_budget_select_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "cur_budget_select")


def test_budget_select_respects_budget_and_prefix(spark, sf_dir):
    """Selected token mass must stay within the 30% budget, selection
    must be non-empty, and no language can be selected-out entirely
    unless its docs all rank below the cut."""
    from lime_etl_spark.operators.curation import BUDGET_PCT
    from lime_etl_spark.operators.text import BPE_RE
    from lime_etl_spark.sources.readers import load_table

    rows = all_queries()["cur_budget_select"].builder(spark, sf_dir).collect()
    assert rows
    total = (
        load_table(spark, sf_dir, "documents")
        .selectExpr(f"sum(regexp_count(text, '{BPE_RE}')) AS t")
        .collect()[0]["t"]
    )
    picked = sum(r["selected_tokens"] for r in rows)
    assert 0 < picked * 100 <= total * BUDGET_PCT
    for r in rows:
        assert 0.0 <= r["share_selected"] <= 1.0
        assert r["n_selected"] <= r["n_docs"]


# --- dq_functional_dependencies (driver round 2) ----------------------------


def test_fd_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "dq_functional_dependencies")


def test_fd_verdicts_are_discriminating(spark, sf_dir):
    """Key→attribute FDs must hold with zero violations; the planted
    non-FDs (segment by nationkey, flag by orderkey) must not."""
    rows = {
        (r["determinant"], r["dependent"]): r
        for r in all_queries()["dq_functional_dependencies"].builder(spark, sf_dir).collect()
    }
    for det, dep in [
        ("r_regionkey", "r_name"),
        ("n_nationkey", "n_name"),
        ("c_custkey", "c_mktsegment"),
        ("o_orderkey", "o_custkey"),
        ("p_partkey", "p_brand"),
    ]:
        assert rows[(det, dep)]["holds"] and rows[(det, dep)]["n_violations"] == 0
    for det, dep in [("c_nationkey", "c_mktsegment"), ("l_orderkey", "l_returnflag")]:
        assert not rows[(det, dep)]["holds"]
        assert rows[(det, dep)]["n_violations"] > 0


# --- txt_code_score (driver round 2) ----------------------------------------


def test_code_score_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "txt_code_score")


def test_code_score_separates_code_from_prose(spark):
    """A source of planted code snippets must flag ~100% code-like; a
    prose source ~0%."""
    import os
    import tempfile

    from lime_etl_spark.operators.text import txt_code_score

    code = "def foo(bar_baz):\n    if bar_baz >= 0: return {x: y[i] for i in range(10)};"
    prose = "the quiet afternoon settled over the harbor as fishermen mended their nets"
    rows = [(i, code, "en", "code_dump", len(code)) for i in range(15)]
    rows += [(100 + i, prose, "en", "books", len(prose)) for i in range(15)]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["source"]: r for r in txt_code_score(spark, d).collect()}
    assert out["code_dump"]["share_code_like"] == 1.0
    assert out["books"]["share_code_like"] == 0.0
    assert out["code_dump"]["mean_code_density"] > 10 * out["books"]["mean_code_density"]


# --- etl_late_arriving_dim (driver round 2) ---------------------------------


def test_late_dim_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "etl_late_arriving_dim")


def test_late_dim_ledger_conserves_and_backfills(spark, sf_dir):
    """Every order lands in exactly one ledger bucket; the planted lag
    means backfilled > 0 and (dim being complete in phase 2)
    orphaned is absent."""
    from lime_etl_spark.sources.readers import load_table

    rows = {r["final_status"]: r for r in all_queries()["etl_late_arriving_dim"].builder(spark, sf_dir).collect()}
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n_orders"] for r in rows.values()) == n_orders
    assert rows["backfilled"]["n_orders"] > 0
    assert "orphaned" not in rows  # full dim backfills every parked fact
    assert rows["matched"]["n_orders"] > rows["backfilled"]["n_orders"]


# --- ev_diff_in_diff (driver round 2) ---------------------------------------


def test_did_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "ev_diff_in_diff")


def test_did_parallel_trends_on_untreated_data(spark, sf_dir):
    """With no real intervention the DiD estimate is pure sampling
    noise: assert it stays within the revenue-per-user scale (order-
    of-magnitude sanity — a planted uplift would exceed it), and that
    the table is structurally sound. The tight-parallel-trends claim
    is a large-sample property; at sf0.01 the arms hold only a few
    hundred users each, so a small bound would be asserting noise."""
    rows = {r["arm"]: r for r in all_queries()["ev_diff_in_diff"].builder(spark, sf_dir).collect()}
    assert set(rows) == {"control", "treatment"}
    for r in rows.values():
        assert r["pre_users"] > 0 and r["post_users"] > 0
        assert r["delta"] == pytest.approx(
            r["post_rev_per_user"] - r["pre_rev_per_user"]
        )
    did = rows["treatment"]["delta"] - rows["control"]["delta"]
    scale = abs(rows["control"]["pre_rev_per_user"]) + 1e-9
    assert abs(did) / scale < 1.0, (did, scale)


# --- q_discount_elasticity / txt_novelty_rate (driver round 2) ---------------


@pytest.mark.parametrize("name", ["q_discount_elasticity", "txt_novelty_rate"])
def test_r2_batch2_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_novelty_duplicated_corpus_halves_novelty(spark):
    """A corpus where every doc has an exact later copy: the copies
    introduce nothing, so corpus novelty is ~n_unique/n_total and
    every copy counts as mostly-redundant."""
    import os
    import tempfile

    from lime_etl_spark.operators.text import txt_novelty_rate

    base = [
        (i, " ".join(f"tok{i}_{j}" for j in range(30)), "en", "s", 100)
        for i in range(10)
    ]
    copies = [(100 + i, t, lang, s_, n) for i, (j, t, lang, s_, n) in enumerate(base)]
    docs = spark.createDataFrame(
        base + copies,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        row = txt_novelty_rate(spark, d).collect()[0]
    assert row["novelty_rate"] == 0.5
    assert row["n_mostly_redundant_docs"] == 10


def test_elasticity_recovers_planted_slope(spark, sf_dir, tmp_path):
    """On a synthetic lineitem where qty = 3*discount_pts + 5 exactly,
    the OLS slope must come back as exactly 3.0."""
    import os

    from lime_etl_spark.operators.relational_more import q_discount_elasticity

    rows = []
    for i in range(200):
        disc = (i % 11) / 100.0  # 0.00..0.10
        qty = 3 * (i % 11) + 5
        rows.append((i, i % 7 + 1, 1, 1, float(qty), 100.0, disc, 0.0, "N", "O", "2024-01-01"))
    li = spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double, l_tax double,"
        " l_returnflag string, l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    part = spark.createDataFrame(
        [(k, f"part{k}", f"Brand#{k % 3}", "t", 1, 10.0) for k in range(1, 8)],
        "p_partkey bigint, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    )
    d = str(tmp_path)
    li.write.parquet(os.path.join(d, "lineitem.parquet"))
    part.write.parquet(os.path.join(d, "part.parquet"))
    out = q_discount_elasticity(spark, d).collect()
    assert out
    for r in out:
        assert r["qty_per_discount_pt"] == pytest.approx(3.0)


@pytest.mark.parametrize(
    "name", ["q_brand_share_by_segment", "dedup_prefix_clusters"]
)
def test_r2_batch3_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_brand_share_lift_recovers_planted_mix(spark):
    """S1 buys only B1; S2 splits evenly B1/B2. Overall B1 share is
    2/3, so lift(S1,B1)=1.5, lift(S2,B1)=0.75, lift(S2,B2)=1.5 — and
    seg_share sums to 1 within each segment."""
    import os
    import tempfile

    from lime_etl_spark.operators.insights3 import q_brand_share_by_segment

    li = spark.createDataFrame(
        [(1, 1, 100.0, 0.0), (2, 1, 100.0, 0.0), (2, 2, 100.0, 0.0)],
        "l_orderkey bigint, l_partkey bigint, l_extendedprice double, l_discount double",
    )
    orders = spark.createDataFrame(
        [(1, 10), (2, 20)], "o_orderkey bigint, o_custkey bigint"
    )
    cust = spark.createDataFrame(
        [(10, "S1"), (20, "S2")], "c_custkey bigint, c_mktsegment string"
    )
    part = spark.createDataFrame(
        [(1, "B1"), (2, "B2")], "p_partkey bigint, p_brand string"
    )
    with tempfile.TemporaryDirectory() as d:
        li.write.parquet(os.path.join(d, "lineitem.parquet"))
        orders.write.parquet(os.path.join(d, "orders.parquet"))
        cust.write.parquet(os.path.join(d, "customer.parquet"))
        part.write.parquet(os.path.join(d, "part.parquet"))
        out = {
            (r["segment"], r["p_brand"]): r
            for r in q_brand_share_by_segment(spark, d).collect()
        }
    assert out[("S1", "B1")]["segment_lift"] == 1.5
    assert out[("S2", "B1")]["segment_lift"] == 0.75
    assert out[("S2", "B2")]["segment_lift"] == 1.5
    assert out[("S1", "B1")]["seg_share"] == 1.0
    assert out[("S2", "B1")]["seg_share"] + out[("S2", "B2")]["seg_share"] == 1.0


def test_prefix_clusters_find_planted_template(spark):
    """Three docs sharing a 70-char opening across two sources form one
    cross-source cluster of 3; unique-opening docs stay out."""
    import os
    import tempfile

    from lime_etl_spark.operators.insights3 import dedup_prefix_clusters

    header = "THE STANDARD LICENSE HEADER " * 4  # 112 chars, same first 64
    rows = [
        (1, header + "body one", "web", 100),
        (2, header + "completely different body", "web", 100),
        (3, header + "third variant", "wiki", 100),
        (4, "a unique opening line that matches nothing else at all ok", "web", 58),
        (5, "another distinct opening line with no shared prefix here!!", "wiki", 59),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", s, n) for i, t, s, n in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = dedup_prefix_clusters(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["cluster_size"], r["n_clusters"], r["n_docs"], r["n_cross_source"]) == (
        3, 1, 3, 1,
    )


@pytest.mark.parametrize(
    "name", ["q_intra_order_dispersion", "q_acctbal_spend_deciles"]
)
def test_r2_batch4_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_intra_order_dispersion_planted_variance(spark):
    """Two 2-line orders: one with equal prices (variance 0), one with
    prices 100/300 (per-order variance 10000 exactly, floored intact).
    Pooled mean variance for the n=2 bucket = (0+40000)/(2*4) = 5000."""
    import os
    import tempfile

    from lime_etl_spark.operators.insights3 import q_intra_order_dispersion

    li = spark.createDataFrame(
        [
            (1, 200.0), (1, 200.0),       # var 0
            (2, 100.0), (2, 300.0),       # mean 200, var 10000
        ],
        "l_orderkey bigint, l_extendedprice double",
    )
    with tempfile.TemporaryDirectory() as d:
        li.write.parquet(os.path.join(d, "lineitem.parquet"))
        out = q_intra_order_dispersion(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_lines"], r["n_orders"]) == (2, 2)
    assert r["mean_line_price"] == 200.0
    assert r["mean_within_var"] == 5000.0


def test_acctbal_deciles_are_balanced_and_ordered(spark, sf_dir):
    """Deciles partition all customers near-evenly and avg balance is
    strictly decreasing down the deciles (desc ordering check)."""
    from lime_etl_spark.operators.insights3 import q_acctbal_spend_deciles

    rows = q_acctbal_spend_deciles(spark, sf_dir).collect()
    assert [r["bal_decile"] for r in rows] == list(range(1, 11))
    sizes = [r["n_customers"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    bals = [r["avg_acctbal"] for r in rows]
    assert all(a > b for a, b in zip(bals, bals[1:]))


@pytest.mark.parametrize(
    "name", ["q_nation_price_index", "q_dual_sourcing_balance"]
)
def test_r2_batch5_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_price_index_detects_planted_premium_nation(spark):
    """Nation B sells the same part at exactly 2x nation A's unit
    price: with equal volumes the part mean is 1.5x, so index(A)=2/3,
    index(B)=4/3, and every B line is premium."""
    import os
    import tempfile

    from lime_etl_spark.operators.insights3 import q_nation_price_index

    li = spark.createDataFrame(
        [(1, 1, 1.0, 100.0), (1, 2, 1.0, 200.0)] * 5,
        "l_partkey bigint, l_suppkey bigint, l_quantity double, l_extendedprice double",
    )
    supp = spark.createDataFrame(
        [(1, 10), (2, 20)], "s_suppkey bigint, s_nationkey bigint"
    )
    nation = spark.createDataFrame(
        [(10, "A"), (20, "B")], "n_nationkey bigint, n_name string"
    )
    with tempfile.TemporaryDirectory() as d:
        li.write.parquet(os.path.join(d, "lineitem.parquet"))
        supp.write.parquet(os.path.join(d, "supplier.parquet"))
        nation.write.parquet(os.path.join(d, "nation.parquet"))
        out = {r["n_name"]: r for r in q_nation_price_index(spark, d).collect()}
    assert abs(out["A"]["price_index"] - 2 / 3) < 1e-9
    assert abs(out["B"]["price_index"] - 4 / 3) < 1e-9
    assert out["A"]["n_premium_lines"] == 0
    assert out["B"]["premium_share"] == 1.0


def test_dual_sourcing_flags_planted_dominant_lead(spark):
    """Part 1: lead supplier has 80% (dominant); part 2: two equal
    suppliers (2*max > tot is FALSE at exactly 50/50)."""
    import os
    import tempfile

    from lime_etl_spark.operators.insights3 import q_dual_sourcing_balance

    li = spark.createDataFrame(
        [
            (1, 1, 800.0), (1, 2, 200.0),
            (2, 1, 500.0), (2, 2, 500.0),
        ],
        "l_partkey bigint, l_suppkey bigint, l_extendedprice double",
    )
    with tempfile.TemporaryDirectory() as d:
        li.write.parquet(os.path.join(d, "lineitem.parquet"))
        out = q_dual_sourcing_balance(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_suppliers"], r["n_parts"], r["n_lead_over_half"]) == (2, 2, 1)
    assert r["pooled_lead_share"] == (800.0 + 500.0) / 2000.0


@pytest.mark.parametrize(
    "name", ["q_purchase_episodes", "ev_followup_purchase_rate"]
)
def test_r2_batch6_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_purchase_episodes_chain_and_split(spark):
    """Three orders 10 days apart chain into ONE 3-order episode; a
    40-day gap then starts a fresh single-order episode."""
    import datetime
    import os
    import tempfile

    from lime_etl_spark.operators.insights3 import q_purchase_episodes

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 7, base, 100.0),
        (2, 7, base + datetime.timedelta(days=10), 100.0),
        (3, 7, base + datetime.timedelta(days=20), 100.0),
        (4, 7, base + datetime.timedelta(days=60), 50.0),
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp, o_totalprice double"
    )
    with tempfile.TemporaryDirectory() as d:
        orders.write.parquet(os.path.join(d, "orders.parquet"))
        out = {r["orders_in_episode"]: r for r in q_purchase_episodes(spark, d).collect()}
    assert out[3]["n_episodes"] == 1 and out[3]["mean_span_days"] == 20.0
    assert out[1]["n_episodes"] == 1 and out[1]["mean_value"] == 50.0


def test_followup_rate_window_edges(spark):
    """A purchase exactly 24h after a view counts (inclusive edge); one
    at 24h+1us does not; simultaneous purchases don't follow themselves."""
    import datetime
    import os
    import tempfile

    from lime_etl_spark.operators.insights3 import ev_followup_purchase_rate

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 10, "view", t0),
        (2, 10, "purchase", t0 + datetime.timedelta(hours=24)),          # inclusive
        (3, 20, "view", t0),
        (4, 20, "purchase", t0 + datetime.timedelta(hours=24, microseconds=1)),
        (5, 30, "purchase", t0),                                          # lone
    ]
    ev = spark.createDataFrame(
        [(i, u, ty, ts, 0.0, "{}") for i, u, ty, ts in rows],
        "event_id bigint, user_id bigint, event_type string, ts timestamp, value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        out = {r["event_type"]: r for r in ev_followup_purchase_rate(spark, d).collect()}
    assert out["view"]["n_events"] == 2 and out["view"]["n_followed"] == 1
    assert out["purchase"]["n_followed"] == 0


def test_cuped_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "ev_cuped_adjustment")


def test_cuped_kills_variance_on_linear_covariate(spark):
    """post = 2*pre + 100 exactly: theta recovers ~200 cents/dollar and
    the adjustment removes almost all post-period variance in BOTH
    arms (residue is the dollar-grain quantization only)."""
    import datetime
    import os
    import tempfile

    from lime_etl_spark.operators.insights3 import ev_cuped_adjustment

    pre_t = datetime.datetime(2024, 1, 5)
    post_t = datetime.datetime(2024, 1, 20)
    rows = []
    for u in range(1, 201):
        x = float(u)  # pre covariate: 1..200 dollars
        y = 2.0 * u + 100.0
        rows.append((2 * u, u, "view", pre_t, x, "{}"))
        rows.append((2 * u + 1, u, "purchase", post_t, y, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, event_type string, ts timestamp, value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        out = {r["arm"]: r for r in ev_cuped_adjustment(spark, d).collect()}
    assert set(out) == {"control", "treatment"}
    for arm in out.values():
        assert abs(arm["theta_e6"] - 200_000_000) < 2_000_000  # ~200 c/$
        assert arm["var_reduction"] > 0.95
    # the adjusted means converge to the same value even though the raw
    # arm means differ (different user-id mixes)
    raw_gap = abs(out["control"]["mean_post"] - out["treatment"]["mean_post"])
    adj_gap = abs(
        out["control"]["mean_adjusted"] - out["treatment"]["mean_adjusted"]
    )
    assert adj_gap < raw_gap / 10


def test_embedding_leakage_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "cur_embedding_leakage")


def test_embedding_leakage_finds_planted_twin(spark):
    """An eval vector that is an exact copy of a train vector must be
    flagged (cosine 1); an orthogonal eval vector must not. Bucket
    membership is pinned by probing the real hash."""
    import os
    import tempfile

    from lime_etl_spark.operators.insights3 import (
        LEAK_TRAIN_BUCKETS,
        cur_embedding_leakage,
    )
    from lime_etl_spark.operators.training import hash_bucket

    ids = spark.createDataFrame([(i,) for i in range(1, 60)], "vec_id bigint")
    buckets = {
        r["vec_id"]: r["b"]
        for r in ids.select(
            "vec_id", hash_bucket(F.col("vec_id"), 10).alias("b")
        ).collect()
    }
    train_id = next(i for i, b in buckets.items() if b < LEAK_TRAIN_BUCKETS)
    evals = [i for i, b in buckets.items() if b >= LEAK_TRAIN_BUCKETS]
    twin_id, clean_id = evals[0], evals[1]
    rows = [
        (train_id, [1.0, 0.0, 0.0, 0.0], 7),
        (twin_id, [1.0, 0.0, 0.0, 0.0], 7),   # exact copy of train vec
        (clean_id, [0.0, 1.0, 0.0, 0.0], 7),  # orthogonal: cos 0
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label bigint"
    )
    with tempfile.TemporaryDirectory() as d:
        emb.write.parquet(os.path.join(d, "embeddings.parquet"))
        out = cur_embedding_leakage(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_eval"], r["n_leaky_eval"], r["n_cross_pairs"]) == (2, 1, 1)
    assert r["leak_rate"] == 0.5


@pytest.mark.parametrize(
    "name", ["dedup_survivor_mix_shift", "q_nation_trade_balance"]
)
def test_r2_batch7_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_survivor_shift_deltas_sum_to_zero_and_counts_conserve(spark, sf_dir):
    """Share deltas across languages must net to ~0 and survivor
    counts must never exceed originals."""
    from lime_etl_spark.operators.insights3 import dedup_survivor_mix_shift

    rows = dedup_survivor_mix_shift(spark, sf_dir).collect()
    assert abs(sum(r["share_delta"] for r in rows)) < 1e-9
    assert all(0 < r["n_after"] <= r["n_before"] for r in rows)
    assert abs(sum(r["share_before"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["share_after"] for r in rows) - 1.0) < 1e-9


def test_trade_balance_nets_to_zero(spark, sf_dir):
    """One nation's export is another's import: balances sum to ~0 and
    total exports equal total imports."""
    from lime_etl_spark.operators.insights3 import q_nation_trade_balance

    rows = q_nation_trade_balance(spark, sf_dir).collect()
    assert abs(sum(r["balance"] for r in rows)) < 1e-6
    assert abs(sum(r["exports"] for r in rows) - sum(r["imports"] for r in rows)) < 1e-6
    assert len(rows) == 25  # every nation reports, zeros included
    assert any(r["exports"] == 0.0 for r in rows)  # supplier-less nations


def test_experiment_power_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "ev_experiment_power")


def test_power_mde_shrinks_with_linear_covariate(spark):
    """On the perfectly-predictive covariate fixture the adjusted
    metric's MDE must collapse vs the raw metric's (variance ~0), and
    both rows must share arm sizes and near-equal means."""
    import datetime
    import os
    import tempfile

    from lime_etl_spark.operators.insights3 import ev_experiment_power

    pre_t = datetime.datetime(2024, 1, 5)
    post_t = datetime.datetime(2024, 1, 20)
    rows = []
    for u in range(1, 201):
        rows.append((2 * u, u, "view", pre_t, float(u), "{}"))
        rows.append((2 * u + 1, u, "purchase", post_t, 2.0 * u + 100.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, event_type string, ts timestamp, value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        out = {r["metric"]: r for r in ev_experiment_power(spark, d).collect()}
    adj, post = out["cuped_adjusted"], out["post"]
    assert (adj["n_control"], adj["n_treatment"]) == (
        post["n_control"], post["n_treatment"],
    )
    assert adj["mde_abs"] < post["mde_abs"] / 5
    assert abs(adj["mean_value"] - post["mean_value"]) < 1.0


def test_decomposition_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "q_revenue_decomposition")


def test_decomposition_recovers_planted_trend_and_season(spark):
    """Planted revenue = 1000 + 50*m + seasonal bump of +1200 every
    December: slope ~50/month, December's seasonal factor ~ +1100
    (the bump minus its own contribution to the grand mean), and
    residuals stay small."""
    import datetime
    import os
    import tempfile

    from lime_etl_spark.operators.insights3 import q_revenue_decomposition

    rows = []
    k = 0
    for m in range(48):  # 4 years monthly
        y, mo = 1995 + m // 12, m % 12 + 1
        rev = 1000.0 + 50.0 * m + (1200.0 if mo == 12 else 0.0)
        rows.append((k, datetime.datetime(y, mo, 1), rev))
        k += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey bigint, o_orderdate timestamp, o_totalprice double"
    )
    with tempfile.TemporaryDirectory() as d:
        orders.write.parquet(os.path.join(d, "orders.parquet"))
        out = q_revenue_decomposition(spark, d).collect()
    assert len(out) == 48
    # identity: revenue(yd grain) = trend + seasonal + residual (within
    # the <=1 dollar cents->dollars floor)
    for r in out:
        assert abs(r["revenue"] - (r["trend"] + r["seasonal"] + r["residual"])) <= 1.0
    dec_rows = [r for r in out if r["month_key"].endswith("-12")]
    other = [r for r in out if not r["month_key"].endswith("-12")]
    assert all(r["seasonal"] > 1000 for r in dec_rows)
    assert all(abs(r["residual"]) < 150 for r in out)
    assert sum(abs(r["seasonal"]) for r in other) / len(other) < 150


@pytest.mark.parametrize(
    "name", ["dq_partition_parity", "ev_attribution_window_sweep"]
)
def test_r2_batch8_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_partition_checksums_mod_sum_to_table_total(spark, sf_dir):
    """The incremental-verification property: month subtotals mod-sum
    to the whole-table checksum computed on the same identity cols."""
    from lime_etl_spark.operators.etl import table_checksum
    from lime_etl_spark.operators.insights3 import _PP_MOD, dq_partition_parity
    from lime_etl_spark.sources.readers import load_table

    parts = dq_partition_parity(spark, sf_dir).collect()
    total = table_checksum(
        load_table(spark, sf_dir, "orders"),
        ("o_orderkey", "o_orderstatus", "o_orderpriority"),
        "orders",
    ).collect()[0]
    assert sum(r["n_rows"] for r in parts) == total["n_rows"]
    assert sum(r["row_checksum"] for r in parts) % _PP_MOD == total["row_checksum"]


def test_attribution_sweep_monotone_and_consistent_with_followup(spark, sf_dir):
    """Wider window can only convert more; the 24h column must equal
    ev_followup_purchase_rate's n_followed (same semantics)."""
    from lime_etl_spark.operators.insights3 import ev_attribution_window_sweep
    from lime_etl_spark.plans.registry import get

    rows = ev_attribution_window_sweep(spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for grp in by_type.values():
        grp.sort(key=lambda r: r["window_h"])
        convs = [r["n_converted"] for r in grp]
        assert convs == sorted(convs)
        assert len({r["n_events"] for r in grp}) == 1
    fu = {
        r["event_type"]: r["n_followed"]
        for r in get("ev_followup_purchase_rate").builder(spark, sf_dir).collect()
    }
    for t, grp in by_type.items():
        at24 = next(r for r in grp if r["window_h"] == 24)
        assert at24["n_converted"] == fu[t]


@pytest.mark.parametrize(
    "name", ["ev_dau_deseasonalized", "cur_keeper_policy_delta"]
)
def test_r2_batch9_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_deseasonalized_flattens_planted_weekend_sawtooth(spark):
    """DAU 100 on weekdays / 200 on weekends for 4 exact weeks: the
    adjusted series must be flat (all days equal within quantization)
    while raw DAU swings 2x."""
    import datetime
    import os
    import tempfile

    from lime_etl_spark.operators.insights3 import ev_dau_deseasonalized

    rows = []
    eid = 0
    d0 = datetime.date(2024, 1, 1)  # a Monday
    for day in range(28):
        d = d0 + datetime.timedelta(days=day)
        dau = 200 if d.isoweekday() >= 6 else 100
        for u in range(dau):
            rows.append(
                (eid, u, "view", datetime.datetime.combine(d, datetime.time(12)), 1.0, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, event_type string, ts timestamp, value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        out = ev_dau_deseasonalized(spark, d).collect()
    assert len(out) == 28
    adj = [r["adjusted_dau"] for r in out]
    assert max(adj) - min(adj) < 0.01
    sat = next(r for r in out if r["weekday"] == 6)
    mon = next(r for r in out if r["weekday"] == 1)
    assert abs(sat["weekday_factor"] / mon["weekday_factor"] - 2.0) < 1e-3


def test_keeper_delta_flags_planted_excerpt_cluster(spark):
    """A near-dup pair where the LONGER member has the HIGHER id: the
    min-id and longest-member keepers must disagree and chars_gained
    must equal the length difference."""
    import os
    import tempfile

    from lime_etl_spark.operators.insights3 import cur_keeper_policy_delta

    base = " ".join(f"w{i}" for i in range(40))
    longer = base + " extra tokens"
    other = " ".join(f"z{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, base, "en", "s", len(base)),
            (2, longer, "en", "s", len(longer)),
            (3, other, "en", "s", len(other)),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = cur_keeper_policy_delta(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["cluster_size"], r["n_clusters"], r["n_keeper_differs"]) == (2, 1, 1)
    assert r["chars_gained"] == len(longer) - len(base)


def test_centroid_shift_matches_oracle(spark, sf_dir):
    assert_query_matches_oracle(spark, sf_dir, "emb_dedup_centroid_shift")


def test_centroid_shift_zero_without_dups_and_positive_with(spark, sf_dir):
    """Dup-injected corpus: every label drops its vec_id%10==0 copies
    and a label whose dups sit off-center must shift; dedup never
    increases the vector count."""
    from lime_etl_spark.operators.insights3 import emb_dedup_centroid_shift

    rows = emb_dedup_centroid_shift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_vecs"] == r["n_unique"] + r["n_dropped"]
        assert r["n_dropped"] >= 0
        assert r["centroid_shift_q"] >= 0.0
    assert any(r["n_dropped"] > 0 for r in rows)
    assert any(r["centroid_shift_q"] > 0 for r in rows)


@pytest.mark.parametrize(
    "name", ["q_revenue_waterfall", "ev_props_correlation"]
)
def test_r2_batch10_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


def test_waterfall_identities_hold_exactly(spark, sf_dir):
    """gross - discount == net and net + tax == charged, per year, to
    float round-off of exact decimals."""
    from lime_etl_spark.operators.insights3 import q_revenue_waterfall

    for r in q_revenue_waterfall(spark, sf_dir).collect():
        assert abs(r["gross_revenue"] - r["discount_given"] - r["net_revenue"]) < 1e-6
        assert abs(r["net_revenue"] + r["tax_collected"] - r["charged_amount"]) < 1e-6
        assert 0.0 <= r["discount_rate"] <= 0.2


def test_props_correlation_recovers_planted_linear_k(spark):
    """value = k dollars exactly -> r ~ 1; value independent of k -> |r| small."""
    import datetime
    import os
    import tempfile

    from lime_etl_spark.operators.insights3 import ev_props_correlation

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(200):
        k = i % 50 + 1
        rows.append((i, i, "click", t0, float(k), '{"k": %d}' % k))        # r=1
        rows.append((1000 + i, i, "view", t0, float((i * 7) % 40 + 1), '{"k": %d}' % k))
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, event_type string, ts timestamp, value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(os.path.join(d, "events.parquet"))
        out = {r["event_type"]: r for r in ev_props_correlation(spark, d).collect()}
    assert out["click"]["pearson_r"] > 0.999
    assert abs(out["view"]["pearson_r"]) < 0.3
