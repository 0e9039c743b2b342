"""Differential gate: every oracle-checkable query, Spark vs DuckDB.

This is a local mirror of the driver's t2 correctness check (SURVEY.md
§5.1) at sf0.001 — row count, column names, and order-insensitive values
must all match. Rows-only queries (no oracle) are smoke-run and must
return a well-formed non-erroring DataFrame.
"""

from __future__ import annotations

import pytest

from analyse_the_sky_with_apache_spark_spark import registry
from tests.conftest import SF_DIR, assert_matches_oracle

registry.load_all_modules()
_QUERIES = registry.queries()
_ORACLE = registry.oracle_sql()

_CHECKED = sorted(k for k in _QUERIES if k in _ORACLE)
_ROWS_ONLY = sorted(k for k in _QUERIES if k not in _ORACLE)


@pytest.mark.parametrize("key", _CHECKED)
def test_matches_oracle(spark, duck, key):
    assert_matches_oracle(spark, duck, _QUERIES[key], _ORACLE[key])


@pytest.mark.parametrize("key", _ROWS_ONLY)
def test_rows_only_runs(spark, key):
    df = _QUERIES[key](spark, SF_DIR)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0
