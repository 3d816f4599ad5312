"""Batch-2 continuation operators (containment dedup, YoY growth, RFM
segments, charset profile) vs DuckDB oracle at sf0.001 + invariants."""

from __future__ import annotations

import pytest

from lime_etl_spark.plans.registry import get
from tests.oracle import assert_query_matches_oracle

SET_C = [
    "dedup_containment",
    "q_yoy_growth",
    "q_rfm_segments",
    "txt_charset_profile",
]


@pytest.mark.parametrize("name", SET_C)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


@pytest.mark.parametrize("name", SET_C)
def test_nonempty(spark, sf_dir, name):
    assert get(name).builder(spark, sf_dir).count() > 0


def test_containment_catches_planted_excerpts(spark, sf_dir):
    """Every planted half-doc excerpt must pair with its source at
    containment ~1.0 — and at a Jaccard BELOW the symmetric-dedup
    threshold, which is the whole reason this operator exists."""
    rows = get("dedup_containment").builder(spark, sf_dir).collect()
    planted = {(r["doc_a"], r["doc_b"]): r for r in rows if r["doc_b"] >= 2000000}
    assert planted, "no excerpt pairs found"
    src_excerpt = [r for (a, b), r in planted.items() if b - 2000000 == a]
    assert src_excerpt, "excerpts did not pair with their sources"
    assert all(r["containment"] >= 0.8 for r in src_excerpt)
    from lime_etl_spark.operators.dedup import JACCARD_TAU

    assert any(r["jaccard"] < JACCARD_TAU for r in src_excerpt)


def test_rfm_segments_cover_all_customers(spark, sf_dir):
    from lime_etl_spark.sources.readers import load_table

    rows = get("q_rfm_segments").builder(spark, sf_dir).collect()
    n_cust_with_orders = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust_with_orders
    for r in rows:
        seg = r["segment"]
        assert 111 <= seg <= 444
        assert all(1 <= int(d) <= 4 for d in str(seg))


def test_charset_ratios_bounded(spark, sf_dir):
    rows = get("txt_charset_profile").builder(spark, sf_dir).collect()
    for r in rows:
        for c in ("alpha_ratio", "digit_ratio", "space_ratio", "punct_ratio"):
            assert 0.0 <= r[c] <= 1.0
        assert 0 <= r["n_non_ascii"] <= r["n_chars"]
    # the synthetic corpus is ASCII word-salad in every lang: the
    # profile must agree (this is exactly the wrong-charset signal the
    # operator exists to raise on a real zh corpus)
    for r in rows:
        assert r["n_non_ascii"] == 0
        assert r["alpha_ratio"] + r["space_ratio"] > 0.95


def test_yoy_growth_first_year_null(spark, sf_dir):
    rows = get("q_yoy_growth").builder(spark, sf_dir).collect()
    by_nation: dict[str, list] = {}
    for r in rows:
        by_nation.setdefault(r["n_name"], []).append(r)
    for seq in by_nation.values():
        assert seq[0]["prev_revenue"] is None and seq[0]["yoy_growth"] is None
        for prev, cur in zip(seq, seq[1:]):
            assert cur["prev_revenue"] == prev["revenue"]
