"""Projection / filter / predicate operators (SURVEY.md §2.2).

Everything here is a narrow transformation — zero shuffles. The point at
100 TB is what reaches the scan: every filter below is pushed into the
parquet reader (``PushedFilters`` in the formatted plan) and the select
list prunes ``ReadSchema`` to the referenced columns
(plans/checks.py asserts both in tests/test_plan_shape.py).

The fixtures contain no NULLs, so three-valued-logic coverage
manufactures NULLs with ``nullif`` (SURVEY.md §5.3 hazard 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register


@register(
    "project_compute",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
       CAST(l_quantity AS BIGINT) AS qty
FROM lineitem
""",
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select + derived columns + aliasing.

    Per-row double arithmetic with an identical expression tree is
    IEEE-identical across engines, so the values are emitted RAW —
    ``round()`` would actually *break* agreement (Spark rounds the exact
    binary value HALF_UP; DuckDB rounds via the decimal representation,
    and the two disagree on ...x.xx499 vs ...x.xx5 edge doubles).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_price.alias("revenue"),
        (disc_price * (1 + F.col("l_tax"))).alias("charge"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )


@register(
    "filter_compare",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
       CAST(l_shipdate AS DATE) AS ship_date
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
  AND l_quantity < 25
  AND l_discount >= 0.02
  AND l_linenumber <> 7
""",
)
def filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison predicates incl. BETWEEN on timestamps — all pushed to
    the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between("1996-01-01", "1996-12-31")
        & (F.col("l_quantity") < 25)
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_linenumber") != 7)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_discount",
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )


@register(
    "filter_in_like_null",
    oracle="""
SELECT c_custkey, c_mktsegment,
       NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
       (NULLIF(c_mktsegment, 'BUILDING') IS NULL) AS is_building
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'FURNITURE')
  AND c_name LIKE '%1%'
  AND NOT (c_acctbal < 0 OR c_custkey % 10 = 3)
""",
)
def filter_in_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list, LIKE, boolean AND/OR/NOT, and manufactured NULLs for
    three-valued logic + IS NULL."""
    c = load_table(spark, sf_dir, "customer")
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "FURNITURE")
        & F.col("c_name").like("%1%")
        & ~((F.col("c_acctbal") < 0) | (F.col("c_custkey") % 10 == 3))
    ).select(
        "c_custkey",
        "c_mktsegment",
        seg_or_null.alias("seg_or_null"),
        seg_or_null.isNull().alias("is_building"),
    )


@register(
    "filter_conditional",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'jumbo'
            WHEN o_totalprice >= 100000 THEN 'large'
            ELSE 'small' END AS size_class,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
       GREATEST(o_totalprice, 150000.0) AS at_least,
       LEAST(o_totalprice, 150000.0) AS at_most
FROM orders
""",
)
def filter_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / greatest / least."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "jumbo")
        .when(F.col("o_totalprice") >= 100000, "large")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")
        ).alias("status_label"),
        F.greatest(F.col("o_totalprice"), F.lit(150000.0)).alias("at_least"),
        F.least(F.col("o_totalprice"), F.lit(150000.0)).alias("at_most"),
    )


@register(
    "obs_metrics",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_quantity >= 45
""",
)
def obs_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability: ``observe`` metrics riding on a filter.

    ``Observation`` attaches named aggregate metrics (row count, sum)
    to a point in the plan; they are computed DURING the action as
    accumulator-style side output — no second scan, no extra job. The
    production use at 100 TB: every pipeline stage reports rows-in /
    rows-out / null-rate for data-quality monitoring at zero marginal
    cost. The observed DataFrame's rows are unchanged (hash-checked);
    the metric values themselves are asserted in
    tests/test_plan_shape.py.
    """
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("filter_stage")
    return li.select("l_orderkey", "l_linenumber", "l_quantity").observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum((F.col("l_quantity") >= 45).cast("long")).alias("rows_kept"),
    ).filter(F.col("l_quantity") >= 45)
