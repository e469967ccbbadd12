"""Self-tests for the differential-oracle harness (tests/util.py):
prove the comparator actually FAILS on each discrepancy class — a
compare that silently passes everything would turn the whole oracle
gate vacuous, which no green suite would ever reveal.
"""

from __future__ import annotations

import duckdb
import pytest

from .util import assert_parity, assert_scalar_schema, norm_df


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _df(spark, sql):
    return spark.sql(sql)


def test_parity_passes_on_equal(spark, duck):
    assert_parity(
        _df(spark, "SELECT 1 AS a, 'x' AS b UNION ALL SELECT 2, 'y'"),
        duck,
        "SELECT 2 AS a, 'y' AS b UNION ALL SELECT 1, 'x'",  # order-insensitive
        "equal",
    )


def test_parity_fails_on_value_diff(spark, duck):
    with pytest.raises(AssertionError, match="values differ"):
        assert_parity(
            _df(spark, "SELECT 1 AS a"), duck, "SELECT 2 AS a", "valdiff"
        )


def test_parity_fails_on_rowcount_diff(spark, duck):
    with pytest.raises(AssertionError, match="rowcount"):
        assert_parity(
            _df(spark, "SELECT 1 AS a"),
            duck,
            "SELECT 1 AS a UNION ALL SELECT 1",
            "rowdiff",
        )


def test_parity_fails_on_column_diff(spark, duck):
    with pytest.raises(AssertionError, match="columns"):
        assert_parity(
            _df(spark, "SELECT 1 AS a"), duck, "SELECT 1 AS b", "coldiff"
        )


def test_parity_fails_on_float_ulp(spark, duck):
    """One ULP of double difference must NOT slip through — the entire
    hash-safety discipline (decimal sums, fixed-point, grids) exists
    because the comparator is this strict."""
    with pytest.raises(AssertionError, match="values differ"):
        assert_parity(
            _df(spark, "SELECT CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE) AS x"),
            duck,
            "SELECT CAST(0.3 AS DOUBLE) AS x",  # 0.1+0.2 != 0.3 in IEEE
            "ulp",
        )


def test_parity_distinguishes_null_from_zero(spark, duck):
    with pytest.raises(AssertionError, match="values differ"):
        assert_parity(
            _df(spark, "SELECT CAST(NULL AS INT) AS x"),
            duck,
            "SELECT 0 AS x",
            "nullzero",
        )


def test_scalar_schema_guard_rejects_nested(spark):
    for sql, kind in [
        ("SELECT array(1, 2) AS a", "array"),
        ("SELECT map('k', 1) AS m", "map"),
        ("SELECT named_struct('f', 1) AS s", "struct"),
    ]:
        with pytest.raises(AssertionError, match="non-scalar"):
            assert_scalar_schema(_df(spark, sql), kind)
    assert_scalar_schema(_df(spark, "SELECT 1 AS a, 'x' AS b"), "scalars-ok")


def test_norm_df_canonicalization(spark):
    """Row order and column order must not affect the canonical form;
    NaN and NULL must stay distinguishable."""
    a = norm_df(_df(spark, "SELECT 1 AS a, 2 AS b UNION ALL SELECT 3, 4").toPandas())
    b = norm_df(_df(spark, "SELECT 4 AS b, 3 AS a UNION ALL SELECT 2, 1").toPandas())
    assert a == b
    # DOCUMENTED LIMIT: pandas materialization folds a NULL double into
    # NaN, so the comparator cannot distinguish them for float columns
    # (the driver's canonicalizer shares this property). Integer NULLs
    # stay distinct (test_parity_distinguishes_null_from_zero above).
    nan = norm_df(_df(spark, "SELECT CAST('NaN' AS DOUBLE) AS x").toPandas())
    nul = norm_df(_df(spark, "SELECT CAST(NULL AS DOUBLE) AS x").toPandas())
    assert nan == nul
