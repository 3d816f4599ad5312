"""Third relational set (operators/relational_more.py) vs DuckDB
oracle at sf0.001, plus non-emptiness of the threshold-selected
slices (a hash match on an empty result proves nothing)."""

from __future__ import annotations

import pytest

from tests.oracle import assert_query_matches_oracle
from lime_etl_spark.plans.registry import get

MORE_SET = [
    "q2_min_price_supplier",
    "q9_product_profit",
    "q11_important_parts",
    "q12_ship_delay_buckets",
    "q13_order_count_distribution",
    "q20_concentrated_shippers",
    "q_customer_set_ops",
    "q_open_orders_sweep",
    "q_supplier_rank_pct",
]


@pytest.mark.parametrize("name", MORE_SET)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)


@pytest.mark.parametrize("name", MORE_SET)
def test_nonempty(spark, sf_dir, name):
    assert get(name).builder(spark, sf_dir).count() > 0


def test_q13_includes_zero_order_customers(spark, sf_dir):
    """The outer-join zero bucket is the point of Q13 — the priority
    filter must leave some customers with no qualifying orders."""
    rows = {
        r["c_count"]: r["custdist"]
        for r in get("q13_order_count_distribution").builder(spark, sf_dir).collect()
    }
    assert 0 in rows and rows[0] > 0
