"""Property-based differential for bag-semantics set operations.

UNION / UNION ALL / INTERSECT / INTERSECT ALL / EXCEPT / EXCEPT ALL
have subtle MULTIPLICITY rules (INTERSECT ALL keeps min(m, n) copies,
EXCEPT ALL keeps max(m − n, 0)) that are easy to get wrong in a
rewrite and invisible to the fixture oracles (whose inputs rarely
carry duplicates). Hypothesis generates small duplicate-heavy VALUES
tables, renders ONE identical SQL text, and runs it through both our
Spark session and DuckDB — the multiplicities must agree exactly.

Inline VALUES keep the instance self-contained (no temp views), and
the generated space is integers × a 3-letter alphabet so every value
renders identically in both engines (§5.3 determinism discipline).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import norm_rows

_row = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.sampled_from(["x", "y", "z"]),
)
_rows = st.lists(_row, min_size=1, max_size=12)

_OPS = (
    "UNION",
    "UNION ALL",
    "INTERSECT",
    "INTERSECT ALL",
    "EXCEPT",
    "EXCEPT ALL",
)


def _values(rows):
    return ", ".join(f"({a}, '{b}')" for a, b in rows)


def _run_both(spark, duck, sql):
    sdf = spark.sql(sql)
    s_cols, s_rows = norm_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    rel = duck.execute(sql)
    d_cols, d_rows = norm_rows([c[0] for c in rel.description], rel.fetchall())
    assert s_cols == d_cols, sql
    assert s_rows == d_rows, (
        f"{sql}\nspark={sorted(s_rows)}\nduck={sorted(d_rows)}"
    )


_SETTINGS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SETTINGS
@given(left=_rows, right=_rows, op=st.sampled_from(_OPS))
def test_setop_multiplicities_agree(spark, duck, left, right, op):
    _run_both(
        spark,
        duck,
        f"SELECT a, b FROM (VALUES {_values(left)}) AS t(a, b) "
        f"{op} "
        f"SELECT a, b FROM (VALUES {_values(right)}) AS s(a, b)",
    )


@_SETTINGS
@given(left=_rows, right=_rows, mid=_rows, op1=st.sampled_from(_OPS), op2=st.sampled_from(_OPS))
def test_chained_setops_agree(spark, duck, left, mid, right, op1, op2):
    """Chained ops pin associativity/precedence handling too: ANSI gives
    INTERSECT higher precedence than UNION/EXCEPT — both engines must
    parse the unparenthesized chain the same way."""
    _run_both(
        spark,
        duck,
        f"SELECT a, b FROM (VALUES {_values(left)}) AS t(a, b) "
        f"{op1} "
        f"SELECT a, b FROM (VALUES {_values(mid)}) AS m(a, b) "
        f"{op2} "
        f"SELECT a, b FROM (VALUES {_values(right)}) AS s(a, b)",
    )
