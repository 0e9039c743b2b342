"""Property-based differential for the as-of join kernels (SURVEY §5.2).

The as-of join is a LIBRARY operator (Spark SQL has no ASOF), so unlike
the SQL-fragment families in test_property_differential.py there is no
shared query text — instead Hypothesis generates random (key, ts)
event/quote tables and the SAME instance runs through BOTH our
union+last-over-window kernel (operators/asof.py) and DuckDB's native
``ASOF JOIN``. Any mismatch is a semantics bug in the kernel (backward
``<=`` / forward ``>=`` inclusive tie rules, per-key isolation, rows
with no match staying NULL).

Right-side (key, ts) pairs are generated UNIQUE: with duplicate right
rows at the same instant, the winner is engine-defined on both sides
(our kernel breaks field-lexicographically, DuckDB arbitrarily), so
that corner stays out of the generated space per the §5.3 discipline —
it is pinned separately by tests/test_asof.py's explicit fixtures.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from analyse_the_sky_with_apache_spark_spark.operators.asof import (
    asof_join,
    asof_join_forward,
)

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# left: events (key, ts) — duplicates allowed (real event streams have
# them; every duplicate must receive the same fill).
_left_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=50),
    ),
    min_size=1,
    max_size=25,
)

# right: quotes with unique (key, ts); the value derives from the pair
# so both engines see identical payloads without an extra draw.
_right_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=50),
    ),
    min_size=0,
    max_size=25,
    unique=True,
)


def _build(spark, duck, lrows, rrows):
    left = spark.createDataFrame(
        [(k, t, 100 * t + k) for k, t in lrows], "k int, ts int, lv int"
    )
    right = spark.createDataFrame(
        [(k, t, 10 * t + k) for k, t in rrows], "k int, ts int, rv int"
    )
    duck.execute("DROP TABLE IF EXISTS lt; DROP TABLE IF EXISTS rt")
    duck.execute("CREATE TABLE lt (k INT, ts INT, lv INT)")
    duck.execute("CREATE TABLE rt (k INT, ts INT, rv INT)")
    if lrows:
        duck.executemany(
            "INSERT INTO lt VALUES (?, ?, ?)",
            [(k, t, 100 * t + k) for k, t in lrows],
        )
    if rrows:
        duck.executemany(
            "INSERT INTO rt VALUES (?, ?, ?)",
            [(k, t, 10 * t + k) for k, t in rrows],
        )


def _spark_rows(df):
    return sorted(
        (r["k"], r["ts"], r["lv"], r["rv"]) for r in df.collect()
    )


@_SETTINGS
@given(lrows=_left_rows, rrows=_right_rows)
def test_backward_asof_matches_duckdb(spark, duck, lrows, rrows):
    _build(spark, duck, lrows, rrows)
    ours = asof_join(
        spark.createDataFrame(
            [(k, t, 100 * t + k) for k, t in lrows], "k int, ts int, lv int"
        ),
        spark.createDataFrame(
            [(k, t, 10 * t + k) for k, t in rrows], "k int, ts int, rv int"
        ),
        on="k",
        right_values={"rv": "rv"},
    ).select("k", "ts", "lv", "rv")
    theirs = sorted(
        duck.execute(
            "SELECT l.k, l.ts, l.lv, r.rv FROM lt l "
            "ASOF LEFT JOIN rt r ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    )
    assert _spark_rows(ours) == theirs, (lrows, rrows)


@_SETTINGS
@given(lrows=_left_rows, rrows=_right_rows)
def test_forward_asof_matches_duckdb(spark, duck, lrows, rrows):
    _build(spark, duck, lrows, rrows)
    ours = asof_join_forward(
        spark.createDataFrame(
            [(k, t, 100 * t + k) for k, t in lrows], "k int, ts int, lv int"
        ),
        spark.createDataFrame(
            [(k, t, 10 * t + k) for k, t in rrows], "k int, ts int, rv int"
        ),
        on="k",
        right_values={"rv": "rv"},
    ).select("k", "ts", "lv", "rv")
    theirs = sorted(
        duck.execute(
            "SELECT l.k, l.ts, l.lv, r.rv FROM lt l "
            "ASOF LEFT JOIN rt r ON l.k = r.k AND l.ts <= r.ts"
        ).fetchall()
    )
    assert _spark_rows(ours) == theirs, (lrows, rrows)
