"""The local mirror must reproduce the driver's hasher semantics.

Round 1 shipped two driver CORRECTNESS failures that the repr-based local
gate could not see (VERDICT.md "What's wrong"): DuckDB HUGEINT degrading
to float64 against Spark int64, and nested array cells crashing the
pandas row-sort. These tests pin the canonicalizer (tools/canon.py) to
catch exactly those classes — on the literal shapes that failed.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from tools.canon import OracleCompareError, compare_canonical


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_hugeint_sum_degrades_to_float_and_is_caught(con):
    """Uncast SUM(int) → HUGEINT → float64 in pandas; Spark emits int64.

    This is the round-1 ``sessionize_batch`` failure (rows_match=true,
    hash_match=false). Values are numerically identical — only the dtype
    kind differs — and the mirror must still fail.
    """
    d = con.execute("SELECT SUM(v) AS sid FROM (VALUES (1),(2)) t(v)").df()
    assert d["sid"].dtype == np.float64  # the degradation itself
    s = pd.DataFrame({"sid": np.array([3], dtype="int64")})
    with pytest.raises(OracleCompareError, match="dtype kind"):
        compare_canonical(s, d)


def test_hugeint_cast_to_bigint_passes(con):
    d = con.execute(
        "SELECT CAST(SUM(v) AS BIGINT) AS sid FROM (VALUES (1),(2)) t(v)"
    ).df()
    assert d["sid"].dtype == np.int64
    compare_canonical(pd.DataFrame({"sid": np.array([3], dtype="int64")}), d)


def test_nested_array_cell_is_caught(con):
    """ARRAY output columns crash the driver's pandas hasher (round-1
    ``agg_collect_sorted``: TypeError unhashable numpy.ndarray)."""
    d = con.execute("SELECT [1, 2, 3] AS supp_keys").df()
    s = pd.DataFrame({"supp_keys": [np.array([1, 2, 3])]})
    with pytest.raises(OracleCompareError, match="nested cell"):
        compare_canonical(s, d)


def test_serialized_array_passes(con):
    d = con.execute(
        "SELECT array_to_string(list_sort([3,1,2]), ',') AS supp_keys"
    ).df()
    compare_canonical(pd.DataFrame({"supp_keys": ["1,2,3"]}), d)


def test_decimal_vs_double_is_caught(con):
    """DuckDB DECIMAL also lands as float64 in pandas; if Spark keeps a
    DecimalType (object cells in pandas) the kinds diverge — same class,
    caught preemptively."""
    import decimal

    d = con.execute("SELECT CAST(1.50 AS DECIMAL(10,2)) AS x").df()
    s = pd.DataFrame({"x": [decimal.Decimal("1.50")]})
    with pytest.raises(OracleCompareError, match="dtype kind"):
        compare_canonical(s, d)


def test_float_nan_equality(con):
    d = con.execute("SELECT CAST('nan' AS DOUBLE) AS x UNION ALL SELECT 1.5").df()
    s = pd.DataFrame({"x": np.array([1.5, np.nan])})
    compare_canonical(s, d)  # NaN == NaN under the hasher's multiset view


def test_value_difference_still_caught(con):
    d = con.execute("SELECT CAST(3 AS BIGINT) AS x").df()
    s = pd.DataFrame({"x": np.array([4], dtype="int64")})
    with pytest.raises(OracleCompareError, match="int values differ"):
        compare_canonical(s, d)
