"""The comparator must be as dtype-strict as the driver's value hash.

Round-1 regression: `dq_checksum_parity` emitted DECIMAL(38,0) sums;
Spark's toPandas() returned exact Decimals, DuckDB's fetchdf()
downcast to float64 — numerically equal, hash-different. The old
`_canon` collapsed Decimal→float and could never catch it. These
tests pin the strict behavior.
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd

from tests.oracle import _canon, compare_frames

# The actual round-1 divergent value (customer table checksum).
_ROUND1_CHECKSUM = 860571908368739884058


def test_wide_integral_decimal_does_not_equal_float64():
    """Reproduces the round-1 dq_checksum_parity driver failure: the
    exact DECIMAL(38,0) and its float64 downcast must NOT canon equal."""
    assert _canon(Decimal(_ROUND1_CHECKSUM)) != _canon(float(_ROUND1_CHECKSUM))


def test_wide_decimal_vs_float_frame_mismatch():
    spark_side = pd.DataFrame({"row_checksum": [Decimal(_ROUND1_CHECKSUM)]})
    duck_side = pd.DataFrame({"row_checksum": [float(_ROUND1_CHECKSUM)]})
    assert compare_frames(spark_side, duck_side), (
        "driver-sim must flag the decimal-vs-float divergence the driver punishes"
    )


def test_float_exact_decimal_still_matches_float():
    """Small float-exact decimals (e.g. DECIMAL that is 2^-n-exact)
    still compare equal to the same float — strictness only bites when
    the value is not float64-representable."""
    assert _canon(Decimal("123.25")) == _canon(123.25)
    assert _canon(Decimal(42)) == _canon(42.0)


def test_non_float_exact_fraction_is_strict():
    # 0.1 is not binary-exact: decimal 0.1 != float 0.1 under the
    # driver's dtype-strict hash, so the comparator must flag it too
    # (forcing operators to cast final money columns to double).
    assert _canon(Decimal("0.1")) != _canon(0.1)


def test_checksum_output_is_bigint(spark, sf_dir):
    """dq_checksum_parity now emits int64 — no decimal anywhere in the
    output schema, and it matches the oracle under the strict canon."""
    from lime_etl_spark.plans.registry import get
    from pyspark.sql.types import DecimalType

    df = get("dq_checksum_parity").builder(spark, sf_dir)
    assert not any(isinstance(f.dataType, DecimalType) for f in df.schema.fields)
    from tests.oracle import assert_query_matches_oracle

    assert_query_matches_oracle(spark, sf_dir, "dq_checksum_parity")


def test_order_reconcile_output_is_double(spark, sf_dir):
    from lime_etl_spark.plans.registry import get
    from pyspark.sql.types import DecimalType

    df = get("dq_order_reconcile").builder(spark, sf_dir)
    assert not any(isinstance(f.dataType, DecimalType) for f in df.schema.fields)
    from tests.oracle import assert_query_matches_oracle

    assert_query_matches_oracle(spark, sf_dir, "dq_order_reconcile")
