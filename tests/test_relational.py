"""Set A (relational analytics) vs DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from tests.oracle import assert_query_matches_oracle

RELATIONAL = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q14_promo_effect",
    "q18_large_orders",
    "q_market_share",
    "q_top_parts_by_region",
    "q_customer_ltv_window",
    "q_order_priority_monthly",
    "q_rollup_revenue",
    "q_price_quantiles",
    "q_order_gaps",
    "q_cube_returns",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_matches_oracle(spark, sf_dir, name):
    assert_query_matches_oracle(spark, sf_dir, name)
