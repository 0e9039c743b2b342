"""asof_join edge semantics not reachable through the fixture oracle."""

from __future__ import annotations

from analyse_the_sky_with_apache_spark_spark.operators.asof import asof_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_duplicate_right_rows_fill_deterministically(spark):
    """Two right rows at the same (key, ts): the window tie-break orders
    by the payload value, so the fill is the MAX duplicate — every run,
    every partitioning (previously shuffle-order-dependent)."""
    left = _mk(spark, [(7, 10), (7, 20)], "k INT, ts INT")
    right = _mk(
        spark,
        [(7, 10, 5.0), (7, 10, 9.0), (7, 15, 2.0)],
        "k INT, ts INT, price DOUBLE",
    )
    out = {
        (r["k"], r["ts"]): r["price_asof"]
        for r in asof_join(
            left, right, on="k", right_values={"price_asof": "price"}
        ).collect()
    }
    assert out == {(7, 10): 9.0, (7, 20): 2.0}


def test_left_before_any_right_gets_null(spark):
    left = _mk(spark, [(1, 5)], "k INT, ts INT")
    right = _mk(spark, [(1, 10, 3.0)], "k INT, ts INT, price DOUBLE")
    rows = asof_join(
        left, right, on="k", right_values={"price_asof": "price"}
    ).collect()
    assert rows[0]["price_asof"] is None


def test_equal_timestamp_matches(spark):
    """A right row exactly at the left ts IS matched (<= semantics)."""
    left = _mk(spark, [(1, 10)], "k INT, ts INT")
    right = _mk(spark, [(1, 10, 4.0)], "k INT, ts INT, price DOUBLE")
    rows = asof_join(
        left, right, on="k", right_values={"price_asof": "price"}
    ).collect()
    assert rows[0]["price_asof"] == 4.0


def test_multi_value_fill_comes_from_one_row(spark):
    """With several right_values columns and duplicate right rows where
    the tie-winner carries NULL fields, the fill must still be one whole
    right row — never a field mix assembled from different rows."""
    left = _mk(spark, [(7, 12)], "k INT, ts INT")
    right = _mk(
        spark,
        [(7, 10, 1.0, 9.0), (7, 10, 2.0, None)],
        "k INT, ts INT, x DOUBLE, y DOUBLE",
    )
    rows = asof_join(
        left, right, on="k", right_values={"x_asof": "x", "y_asof": "y"}
    ).collect()
    got = (rows[0]["x_asof"], rows[0]["y_asof"])
    # struct tie-break: (x=2.0, y=NULL) sorts after (x=1.0, y=9.0), so the
    # whole second row wins — including its NULL y.
    assert got == (2.0, None), got


def test_forward_basic_and_null_and_inclusive(spark):
    """Forward as-of: earliest right at-or-after; NULL when none follows;
    equal timestamps match (inclusive)."""
    from analyse_the_sky_with_apache_spark_spark.operators.asof import (
        asof_join_forward,
    )

    left = _mk(spark, [(1, 10), (1, 25), (1, 31)], "k INT, ts INT")
    right = _mk(
        spark,
        [(1, 10, 1.0), (1, 20, 2.0), (1, 30, 3.0)],
        "k INT, ts INT, price DOUBLE",
    )
    rows = {
        r["ts"]: r["price_next"]
        for r in asof_join_forward(
            left, right, on="k", right_values={"price_next": "price"}
        ).collect()
    }
    assert rows == {10: 1.0, 25: 3.0, 31: None}, rows
