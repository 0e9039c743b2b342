"""Shared fixtures: one SparkSession + one DuckDB connection per run."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyse_the_sky_with_apache_spark_spark.catalog import TABLES
from analyse_the_sky_with_apache_spark_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def norm_cell(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return repr(v)


def norm_rows(cols, rows):
    """Order-insensitive multiset form: sort columns by name, then rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def assert_matches_oracle(spark, duck, fn, sql, sf_dir=SF_DIR):
    df = fn(spark, sf_dir)
    s_cols, s_rows = norm_rows(df.columns, [tuple(r) for r in df.collect()])
    rel = duck.execute(sql)
    d_cols, d_rows = norm_rows(
        [c[0] for c in rel.description], rel.fetchall()
    )
    assert s_cols == d_cols, f"columns: spark={s_cols} duck={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"rowcount: spark={len(s_rows)} duck={len(d_rows)}"
    )
    if s_rows != d_rows:
        first = next(i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b)
        raise AssertionError(
            f"values differ; first @{first}:\n"
            f"  spark={s_rows[first]}\n  duck ={d_rows[first]}"
        )
