"""Composite multi-operator workloads (TPC-H-shape Q3 / Q5 / Q10 / Q18).

The single-operator registry keys prove each relational piece in
isolation; these workloads prove the pieces COMPOSE — multi-join
star shapes with selective filters, aggregation over the join result,
decorrelated HAVING subqueries, and tie-broken top-k, all in one plan.
They are the queries a reference user actually runs end-to-end, and at
100 TB they exercise the planner work that matters most: join ordering,
broadcast selection for the dimension tables, AQE skew handling on the
fact-side shuffles, and TakeOrderedAndProject for the top-k (no global
sort of the aggregate).

Determinism discipline (SURVEY.md §5.3): every money/quantity sum is the
exact scaled-long form (functions/exact.py), including the Q18 HAVING
threshold — comparing a float SUM against a constant near the boundary
would let the two engines disagree on row MEMBERSHIP, not just digits;
the scaled-integer comparison makes the cut exact on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .functions.exact import dsum, dsum_sql
from .registry import register

_Q3_CUTOFF = "1998-06-01"
_Q5_LO, _Q5_HI = "1996-01-01", "1999-01-01"
_Q18_MIN_QTY = 250


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue', 4)}
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{_Q3_CUTOFF}'
  AND l_shipdate  > TIMESTAMP '{_Q3_CUTOFF}'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped orders by revenue for one market
    segment. Plan properties that matter at scale: the customer filter
    prunes BEFORE the join (pushed to the scan), customer broadcasts
    into orders, the lineitem date filter is pushed, and the top-10 is
    TakeOrderedAndProject over the aggregate — never a global sort.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _Q3_CUTOFF
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _Q3_CUTOFF
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 4))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier",
    oracle=f"""
SELECT n_name, {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue', 4)}
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '{_Q5_LO}'
  AND o_orderdate <  TIMESTAMP '{_Q5_HI}'
GROUP BY n_name
""",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where the supplier is LOCAL to
    the customer (the s_nationkey = c_nationkey equi-term rides the
    supplier join — no post-join filter pass). nation/region/supplier
    broadcast; the only data-sized shuffles are lineitem⋈orders and the
    final nation rollup, whose partials collapse map-side.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _Q5_LO) & (F.col("o_orderdate") < _Q5_HI)
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 4))
    )


@register(
    "q18_large_orders",
    oracle=f"""
SELECT c_name, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       o_totalprice, {dsum_sql('l_quantity', 'total_qty', 2)}
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) > {_Q18_MIN_QTY * 100}
)
GROUP BY c_name, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the 100 priciest orders whose total quantity
    exceeds a threshold. The IN subquery decorrelates to a semi-join
    against the re-aggregated lineitem — at scale that aggregate is the
    cheap side (one row per qualifying order) and semi-joins into the
    fact scan. The threshold compares an exact scaled-long sum, so both
    engines agree on membership at the boundary; top-100 is
    TakeOrderedAndProject on (o_totalprice, o_orderkey).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(
                F.floor(F.col("l_quantity") * 100.0 + F.lit(0.5))
            ).alias("sq")
        )
        .filter(F.col("sq") > _Q18_MIN_QTY * 100)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
        )
        .agg(dsum("l_quantity", "total_qty", 2))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue', 4)},
       CAST(c_acctbal AS DOUBLE) AS c_acctbal
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers who returned the most revenue
    in a year — the churn-risk report. Fact-side filters (return flag,
    date year) push to both scans before the join; customer and nation
    broadcast; one aggregation on the (customer, nation) key; top-20 is
    TakeOrderedAndProject on the exact revenue with a key tie-break.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 4))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )
