"""Subquery-pattern relational set (operators/relational_sub.py) vs
DuckDB oracle at sf0.001, plus result-shape sanity checks the hash
compare can't express (non-emptiness of the interesting slices)."""

from __future__ import annotations

import pytest

from tests.oracle import assert_query_matches_oracle
from lime_etl_spark.plans.registry import get

SUBQUERY_SET = [
    "q4_late_ship_priority",
    "q7_nation_trade",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_qty_revenue",
    "q19_bracket_predicates",
    "q21_sole_blame_supplier",
    "q22_dormant_customers",
]


@pytest.mark.parametrize("name", SUBQUERY_SET)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


@pytest.mark.parametrize(
    "name",
    [
        "q4_late_ship_priority",
        "q7_nation_trade",
        "q15_top_supplier",
        "q16_supplier_variety",
        "q21_sole_blame_supplier",
        "q22_dormant_customers",
    ],
)
def test_interesting_slices_nonempty(spark, sf_dir, name):
    """An oracle match on an empty result proves nothing — every
    semi/anti/threshold query must actually select rows at sf0.001."""
    assert get(name).builder(spark, sf_dir).count() > 0
