"""Property-based differential testing (SURVEY.md §5.2).

Hypothesis generates random relational fragments — filter predicates,
group-key subsets, sort/limit combinations — renders each one BOTH as a
Spark SQL query through our engine's session AND as the identical ANSI
text in DuckDB, and asserts the order-insensitive results match. The
generated space sticks to cross-engine-deterministic ground (integer
aggregates, exact comparisons, tie-broken limits) so any mismatch is a
real semantics bug, not a float/ordering hazard (§5.3).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from analyse_the_sky_with_apache_spark_spark.catalog import load_table
from tests.conftest import SF_DIR, norm_rows

# --- the generated fragment space (lineitem) ---------------------------

_NUM_COLS = ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
_STR_COLS = ("l_returnflag", "l_linestatus")
_CMP_OPS = ("<", "<=", "=", ">=", ">", "<>")

_num_pred = st.builds(
    lambda c, op, v: f"{c} {op} {v}",
    st.sampled_from(_NUM_COLS),
    st.sampled_from(_CMP_OPS),
    st.integers(min_value=0, max_value=6000),
)
_str_pred = st.builds(
    lambda c, vs: f"{c} IN ({', '.join(repr(v) for v in vs)})",
    st.sampled_from(_STR_COLS),
    st.lists(
        st.sampled_from(["A", "N", "R", "O", "F"]),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
_date_pred = st.builds(
    lambda y1, m1, y2, m2: (
        f"l_shipdate BETWEEN TIMESTAMP '{min(y1, y2)}-{min(m1, m2):02d}-01 00:00:00'"
        f" AND TIMESTAMP '{max(y1, y2)}-{max(m1, m2):02d}-28 00:00:00'"
    ),
    st.integers(min_value=1995, max_value=2001),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1995, max_value=2001),
    st.integers(min_value=1, max_value=12),
)
_pred = st.one_of(_num_pred, _str_pred, _date_pred)

_predicates = st.builds(
    lambda ps, conj: f" {conj} ".join(f"({p})" for p in ps),
    st.lists(_pred, min_size=1, max_size=3),
    st.sampled_from(["AND", "OR"]),
)

_group_keys = st.lists(
    st.sampled_from(_STR_COLS + ("l_linenumber",)),
    min_size=1,
    max_size=2,
    unique=True,
)


def _run_both(spark, duck, sql: str):
    """Execute identical SQL in both engines, return normalized results."""
    load_table(spark, SF_DIR, "lineitem").createOrReplaceTempView("lineitem")
    sdf = spark.sql(sql)
    s_cols, s_rows = norm_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    rel = duck.execute(sql)
    d_cols, d_rows = norm_rows([c[0] for c in rel.description], rel.fetchall())
    assert s_cols == d_cols, sql
    assert s_rows == d_rows, (
        f"{sql}\nspark rows={len(s_rows)} duck rows={len(d_rows)}"
    )


_SETTINGS = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SETTINGS
@given(where=_predicates)
def test_filter_agrees(spark, duck, where):
    _run_both(
        spark,
        duck,
        f"SELECT l_orderkey, l_linenumber FROM lineitem WHERE {where}",
    )


@_SETTINGS
@given(where=_predicates, keys=_group_keys)
def test_filtered_group_count_agrees(spark, duck, where, keys):
    k = ", ".join(keys)
    _run_both(
        spark,
        duck,
        f"SELECT {k}, COUNT(*) AS n, MIN(l_orderkey) AS mn,"
        f" MAX(l_orderkey) AS mx, SUM(l_linenumber) AS s"
        f" FROM lineitem WHERE {where} GROUP BY {k}",
    )


@_SETTINGS
@given(
    where=_predicates,
    limit=st.integers(min_value=1, max_value=50),
    desc=st.booleans(),
)
def test_tiebroken_limit_agrees(spark, duck, where, limit, desc):
    d = "DESC" if desc else "ASC"
    _run_both(
        spark,
        duck,
        f"SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem"
        f" WHERE {where}"
        f" ORDER BY l_quantity {d}, l_orderkey {d}, l_linenumber {d}"
        f" LIMIT {limit}",
    )


def _run_both_tables(spark, duck, sql: str, tables=("lineitem", "orders")):
    for t in tables:
        load_table(spark, SF_DIR, t).createOrReplaceTempView(t)
    sdf = spark.sql(sql)
    s_cols, s_rows = norm_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    rel = duck.execute(sql)
    d_cols, d_rows = norm_rows([c[0] for c in rel.description], rel.fetchall())
    assert s_cols == d_cols, sql
    assert s_rows == d_rows, (
        f"{sql}\nspark rows={len(s_rows)} duck rows={len(d_rows)}"
    )


@_SETTINGS
@given(
    where=_predicates,
    jtype=st.sampled_from(["JOIN", "LEFT JOIN", "SEMI JOIN", "ANTI JOIN"]),
)
def test_join_types_agree(spark, duck, where, jtype):
    cols = (
        "o.o_orderkey, o.o_custkey"
        if "SEMI" in jtype or "ANTI" in jtype
        else "o.o_orderkey, o.o_custkey, l.l_linenumber"
    )
    sub = f"(SELECT * FROM lineitem WHERE {where}) l"
    _run_both_tables(
        spark,
        duck,
        f"SELECT {cols} FROM orders o {jtype} {sub}"
        f" ON o.o_orderkey = l.l_orderkey",
    )


@_SETTINGS
@given(
    where_a=_predicates,
    where_b=_predicates,
    op=st.sampled_from(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]),
)
def test_set_ops_agree(spark, duck, where_a, where_b, op):
    _run_both_tables(
        spark,
        duck,
        f"SELECT l_orderkey, l_linenumber FROM lineitem WHERE {where_a}"
        f" {op} "
        f"SELECT l_orderkey, l_linenumber FROM lineitem WHERE {where_b}",
        tables=("lineitem",),
    )


@_SETTINGS
@given(
    where=_predicates,
    min_n=st.integers(min_value=1, max_value=30),
)
def test_having_agrees(spark, duck, where, min_n):
    _run_both_tables(
        spark,
        duck,
        f"SELECT l_orderkey, COUNT(*) AS n, MIN(l_linenumber) AS mn"
        f" FROM lineitem WHERE {where}"
        f" GROUP BY l_orderkey HAVING COUNT(*) >= {min_n}",
        tables=("lineitem",),
    )


@_SETTINGS
@given(
    where=_predicates,
    frame=st.integers(min_value=0, max_value=9),
)
def test_window_frames_agree(spark, duck, where, frame):
    _run_both_tables(
        spark,
        duck,
        f"SELECT l_orderkey, l_linenumber,"
        f" SUM(l_linenumber) OVER (PARTITION BY l_orderkey"
        f"   ORDER BY l_linenumber"
        f"   ROWS BETWEEN {frame} PRECEDING AND CURRENT ROW) AS s,"
        f" ROW_NUMBER() OVER (PARTITION BY l_orderkey"
        f"   ORDER BY l_linenumber) AS rn"
        f" FROM lineitem WHERE {where}",
        tables=("lineitem",),
    )


# --- scalar expression trees (engine-portable fragments only) ----------

_int_leaf = st.one_of(
    st.sampled_from([f"CAST({c} AS BIGINT)" for c in _NUM_COLS]),
    st.integers(min_value=1, max_value=99).map(
        lambda v: f"CAST({v} AS BIGINT)"
    ),
)
_int_expr = st.recursive(
    _int_leaf,
    lambda inner: st.one_of(
        st.builds(
            lambda a, op, b: f"({a} {op} {b})",
            inner,
            st.sampled_from(["+", "-", "*"]),
            inner,
        ),
        st.builds(lambda a: f"abs({a})", inner),
        st.builds(lambda a, b: f"greatest({a}, {b})", inner, inner),
        st.builds(lambda a, b: f"least({a}, {b})", inner, inner),
    ),
    max_leaves=4,
)

_str_leaf = st.one_of(
    st.sampled_from(_STR_COLS),
    st.sampled_from(["'x'", "'Qz'"]),
)
_str_expr = st.recursive(
    _str_leaf,
    lambda inner: st.one_of(
        st.builds(lambda a: f"upper({a})", inner),
        st.builds(lambda a: f"lower({a})", inner),
        st.builds(lambda a: f"reverse({a})", inner),
        st.builds(lambda a, b: f"concat({a}, {b})", inner, inner),
        st.builds(lambda a: f"substr({a}, 1, 2)", inner),
        st.builds(lambda a: f"lpad({a}, 4, '_')", inner),
    ),
    max_leaves=4,
)


@_SETTINGS
@given(ei=_int_expr, es=_str_expr, where=_predicates)
def test_scalar_exprs_agree(spark, duck, ei, es, where):
    """Random integer/string expression trees evaluate identically.

    Leaves cast to BIGINT so arithmetic never overflows 32-bit lanes
    differently across engines; string ops restricted to the
    portable-core set (upper/lower/reverse/concat/substr/lpad).
    """
    _run_both(
        spark,
        duck,
        f"SELECT l_orderkey, l_linenumber, {ei} AS ei, {es} AS es "
        f"FROM lineitem WHERE ({where}) AND l_orderkey < 2000",
    )


@_SETTINGS
@given(
    keys=_group_keys,
    where=_predicates,
    cube=st.booleans(),
)
def test_rollup_cube_agree(spark, duck, keys, where, cube):
    """Random ROLLUP/CUBE groupings agree — exercises the Expand-based
    multi-grouping plan against DuckDB's grouping-set execution
    (super-aggregate NULL rows included).

    Known, fuzzer-found divergence fenced off by the HAVING guard: on
    EMPTY input the SQL standard (and DuckDB) still emits the ()-set
    grand-total row (n=0), while Spark's Expand plan emits nothing.
    ``HAVING COUNT(*) > 0`` drops that row on the DuckDB side only,
    aligning the engines on the non-degenerate semantics both share.
    """
    k = ", ".join(keys)
    form = "CUBE" if cube else "ROLLUP"
    _run_both_tables(
        spark,
        duck,
        f"SELECT {k}, COUNT(*) AS n, SUM(l_linenumber) AS s"
        f" FROM lineitem WHERE {where} GROUP BY {form} ({k})"
        f" HAVING COUNT(*) > 0",
        tables=("lineitem",),
    )


_orders_pred = st.builds(
    lambda op, v: f"o_orderkey {op} {v}",
    st.sampled_from(_CMP_OPS),
    st.integers(min_value=0, max_value=6000),
)


@_SETTINGS
@given(where_o=_orders_pred, where_l=_predicates, anti=st.booleans())
def test_in_subquery_agrees(spark, duck, where_o, where_l, anti):
    """IN / NOT IN subqueries decorrelate to the same semi/anti result
    both engines compute (the o_orderkey key is non-null on both sides,
    so NOT IN's three-valued-logic trap stays armed but agreed)."""
    neg = "NOT " if anti else ""
    _run_both_tables(
        spark,
        duck,
        f"SELECT o_orderkey, o_custkey FROM orders"
        f" WHERE ({where_o}) AND o_orderkey {neg}IN"
        f" (SELECT l_orderkey FROM lineitem WHERE {where_l})",
    )


_cust_pred = st.builds(
    lambda op, v: f"c_custkey {op} {v}",
    st.sampled_from(_CMP_OPS),
    st.integers(min_value=0, max_value=1500),
)


@_SETTINGS
@given(where=_predicates, cond=_num_pred)
def test_conditional_aggregation_agrees(spark, duck, where, cond):
    """Conditional aggregation (SUM/COUNT over CASE) under random
    predicates — the filtered-aggregate shape q8/q12 lean on, checked
    for agreement on integer ground."""
    _run_both(
        spark,
        duck,
        f"SELECT l_returnflag,"
        f" CAST(SUM(CASE WHEN ({cond}) THEN 1 ELSE 0 END) AS BIGINT)"
        f"   AS n_cond,"
        f" COUNT(*) AS n"
        f" FROM lineitem WHERE ({where}) GROUP BY l_returnflag",
    )


@_SETTINGS
@given(where_l=_predicates, where_o=_orders_pred, where_c=_cust_pred)
def test_three_way_join_agrees(spark, duck, where_l, where_o, where_c):
    """Random predicates pushed through a 3-level join chain
    (lineitem⋈orders⋈customer) must not change the agreed row multiset
    — exercises pushdown + join reordering against DuckDB's planner."""
    _run_both_tables(
        spark,
        duck,
        f"SELECT c_nationkey, COUNT(*) AS n"
        f" FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        f" JOIN customer ON o_custkey = c_custkey"
        f" WHERE ({where_l}) AND ({where_o}) AND ({where_c})"
        f" GROUP BY c_nationkey",
        tables=("lineitem", "orders", "customer"),
    )


# --- window fragments --------------------------------------------------
# The ordering suffix makes every generated ordering EFFECTIVELY total:
# no column subset is guaranteed unique in the synthetic fixtures —
# (l_orderkey, l_linenumber) has 11785 dup pairs at sf0.01, and even
# (l_orderkey, l_linenumber, l_partkey, l_suppkey) has a dup pair at
# sf0.001 whose rows differ in l_quantity (both fuzzer-found) — so the
# suffix also appends every column a generated window function CONSUMES
# (l_quantity for the frame SUM, plus l_shipdate / l_linestatus /
# l_extendedprice as discriminators). Rows still tied after that are
# identical in all consumed and emitted columns, so any tie permutation
# yields the same output multiset: rank/row_number/frame semantics are
# the only thing under test, not tie resolution (§5.3).

_win_part = st.sampled_from(
    ["l_returnflag", "l_linestatus", "l_returnflag, l_linestatus"]
)
_win_order = st.builds(
    lambda c, d: (
        f"{c} {d}, l_orderkey, l_linenumber, l_partkey, l_suppkey,"
        f" l_quantity, l_shipdate, l_linestatus, l_extendedprice"
    ),
    st.sampled_from(("l_quantity", "l_suppkey", "l_shipdate")),
    st.sampled_from(("ASC", "DESC")),
)
_win_fn = st.one_of(
    st.just("ROW_NUMBER()"),
    st.just("RANK()"),
    st.just("DENSE_RANK()"),
    st.builds(
        lambda k: (
            f"SUM(CAST(l_quantity AS BIGINT)) OVER_FRAME"
            f" ROWS BETWEEN {k} PRECEDING AND CURRENT ROW"
        ),
        st.integers(min_value=0, max_value=5),
    ),
    st.builds(
        lambda o: f"LAG(l_orderkey, {o})",
        st.integers(min_value=1, max_value=3),
    ),
)


@_SETTINGS
@given(part=_win_part, order=_win_order, fn=_win_fn, where=_predicates)
def test_window_fragment_agrees(spark, duck, part, order, fn, where):
    spec = f"PARTITION BY {part} ORDER BY {order}"
    if "OVER_FRAME" in fn:
        head, frame = fn.split(" OVER_FRAME ")
        expr = f"{head} OVER ({spec} {frame})"
    else:
        expr = f"{fn} OVER ({spec})"
    _run_both(
        spark,
        duck,
        f"SELECT l_orderkey, l_linenumber, {expr} AS w"
        f" FROM lineitem WHERE {where}",
    )


@_SETTINGS
@given(where=_predicates, outer=st.integers(min_value=0, max_value=3000))
def test_correlated_scalar_subquery_agrees(spark, duck, where, outer):
    """Correlated scalar subqueries (MAX per outer row) decorrelate to
    the same left-join+aggregate both engines compute; NULL for outer
    rows with no matching inner rows rides along, exercising the
    decorrelation + 3VL seam the q17/q20 workloads lean on."""
    _run_both_tables(
        spark,
        duck,
        f"SELECT o_orderkey,"
        f" (SELECT MAX(l_linenumber) FROM lineitem l"
        f"   WHERE l.l_orderkey = o.o_orderkey AND ({where})) AS mx"
        f" FROM orders o WHERE o_orderkey < {outer}",
    )


@_SETTINGS
@given(
    where=_predicates,
    use_distinct_from=st.booleans(),
    v=st.integers(min_value=1, max_value=7),
)
def test_outer_join_null_semantics_agree(spark, duck, where, use_distinct_from, v):
    """LEFT JOIN manufactures NULLs (FIXTURES.md quirk 2), then a
    NULL-sensitive predicate over the nullable side: IS [NOT] DISTINCT
    FROM vs COALESCE must agree — the three-valued-logic ground both
    engines share."""
    pred = (
        f"l.l_linenumber IS DISTINCT FROM {v}"
        if use_distinct_from
        else f"COALESCE(l.l_linenumber, -1) <> {v}"
    )
    _run_both_tables(
        spark,
        duck,
        f"SELECT o.o_orderkey, l.l_linenumber"
        f" FROM orders o LEFT JOIN"
        f" (SELECT * FROM lineitem WHERE {where}) l"
        f" ON o.o_orderkey = l.l_orderkey"
        f" WHERE {pred} AND o.o_orderkey < 2000",
    )


@_SETTINGS
@given(where=_predicates, mod=st.integers(min_value=2, max_value=9))
def test_distinct_on_expression_agrees(spark, duck, where, mod):
    """SELECT DISTINCT over computed expressions (modular bucketing +
    string concat) — distinct-on-expression dedups the same multiset in
    both engines on exact integer/string ground."""
    _run_both(
        spark,
        duck,
        f"SELECT DISTINCT l_linenumber % {mod} AS bucket,"
        f" concat(l_returnflag, '|', l_linestatus) AS tag"
        f" FROM lineitem WHERE {where}",
    )


@_SETTINGS
@given(
    where=_predicates,
    keys=st.lists(
        st.sampled_from(("l_returnflag", "l_linestatus", "l_linenumber")),
        min_size=2,
        max_size=3,
        unique=True,
    ),
    form=st.sampled_from(("ROLLUP", "CUBE", "GROUPING SETS")),
)
def test_grouping_hierarchy_agrees(spark, duck, where, keys, form):
    """ROLLUP / CUBE / GROUPING SETS over generated key subsets:
    super-aggregate rows mix NULL group keys with GROUPING() flags —
    the NULL-vs-flag disambiguation must agree across engines on exact
    integer ground (COUNT + SUM of an int column)."""
    kl = ", ".join(keys)
    if form == "GROUPING SETS":
        sets = f"(({kl}), ({keys[0]}), ())"
        grp = f"GROUPING SETS {sets}"
    else:
        grp = f"{form} ({kl})"
    gflags = ", ".join(f"GROUPING({k}) AS g_{k}" for k in keys)
    sql = (
        f"SELECT {kl}, {gflags}, COUNT(*) AS n,"
        f" SUM(l_linenumber) AS s"
        f" FROM lineitem WHERE {where} GROUP BY {grp}"
    )
    probe = f"SELECT COUNT(*) FROM lineitem WHERE {where}"
    if duck.execute(probe).fetchone()[0] == 0:
        # FIXTURES.md quirk 7: on EMPTY input DuckDB still emits the ()
        # grand-total grouping-set row (n=0), Spark emits nothing. Pin
        # the divergence instead of comparing.
        load_table(spark, SF_DIR, "lineitem").createOrReplaceTempView(
            "lineitem"
        )
        assert spark.sql(sql).count() == 0
        drows = duck.execute(sql).fetchall()
        ncol = len(keys)  # key cols lead, then flags, then n, s
        assert all(r[ncol : 2 * ncol] == tuple([1] * ncol) for r in drows)
        return
    _run_both(spark, duck, sql)


@_SETTINGS
@given(
    where=_predicates,
    form=st.sampled_from(("EXISTS", "NOT EXISTS", "IN", "NOT IN")),
    cap=st.integers(min_value=0, max_value=3000),
)
def test_subquery_membership_agrees(spark, duck, where, form, cap):
    """EXISTS / NOT EXISTS / IN / NOT IN membership subqueries over a
    generated inner predicate: both engines decorrelate to semi/anti
    joins. The fixture has no NULLs (FIXTURES.md quirk 2), so NOT IN's
    NULL-poisoning trapdoor stays shut and the anti-join ground is
    exact."""
    # correlation must stay CONJUNCTIVE: under an OR Spark (correctly)
    # refuses to decorrelate, so the generated predicate is parenthesized
    # as one unit before the correlation term is attached.
    inner = f"SELECT l_orderkey FROM lineitem l WHERE ({where})"
    if form in ("EXISTS", "NOT EXISTS"):
        pred = f"{form} ({inner} AND l.l_orderkey = o.o_orderkey)"
    else:
        pred = f"o.o_orderkey {form} ({inner})"
    _run_both_tables(
        spark,
        duck,
        f"SELECT o.o_orderkey, o.o_orderpriority FROM orders o"
        f" WHERE {pred} AND o.o_orderkey < {cap}",
    )
