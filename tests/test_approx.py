"""Approximate-operator error bounds (SURVEY.md §2.4).

approx_count_distinct has no cross-engine oracle (different sketches), so
its contract is asserted directly: the HLL++ estimate must sit within the
configured relative standard deviation of the exact count (with a 4-sigma
safety margin — the rsd is a standard deviation, not a hard bound).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from analyse_the_sky_with_apache_spark_spark.catalog import load_table
from analyse_the_sky_with_apache_spark_spark.registry import queries
from tests.conftest import SF_DIR


def test_approx_count_distinct_within_rsd(spark):
    approx = queries()["agg_approx_distinct"](spark, SF_DIR).collect()[0]
    exact = (
        load_table(spark, SF_DIR, "lineitem")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.countDistinct("l_suppkey").alias("supps"),
        )
        .collect()[0]
    )
    for est, true in (
        (approx["approx_parts"], exact["parts"]),
        (approx["approx_supps"], exact["supps"]),
    ):
        assert abs(est - true) <= max(4 * 0.01 * true, 1), (est, true)


def test_hll_sketch_union_within_bound(spark):
    """Sketch-merge estimate must track the exact rollup within ~2% (lgK=14)."""
    rows = {
        r["o_orderstatus"]: r["approx_custkeys"]
        for r in queries()["agg_hll_sketch"](spark, SF_DIR).collect()
    }
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in load_table(spark, SF_DIR, "orders")
        .groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert rows.keys() == exact.keys()
    for status, est in rows.items():
        true = exact[status]
        assert abs(est - true) <= max(4 * 0.02 * true, 2), (status, est, true)


def test_approx_percentile_within_rank_error(spark):
    """The SMALL-accuracy regime (the setting a 100-TB deployment runs,
    where the registered key's accuracy>=n exactness no longer holds):
    percentile_approx(accuracy=10000) must land within a 1/10000 rank
    neighborhood of the exact percentile — checked by value against the
    exact interpolated percentiles, with a tolerance derived from the
    local value spread (the fixture's price distribution is smooth, so
    rank error ≈ small relative value error)."""
    approx_rows = {
        r["l_returnflag"]: [r["p25"], r["p50"], r["p90"]]
        for r in load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice",
                F.array(F.lit(0.25), F.lit(0.5), F.lit(0.9)),
                F.lit(10000),
            ).alias("ap")
        )
        .select(
            "l_returnflag",
            F.col("ap").getItem(0).alias("p25"),
            F.col("ap").getItem(1).alias("p50"),
            F.col("ap").getItem(2).alias("p90"),
        )
        .collect()
    }
    exact_rows = {
        r["l_returnflag"]: [r["p25"], r["p50"], r["p90"]]
        for r in load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.25)).alias("p25"),
            F.percentile("l_extendedprice", F.lit(0.50)).alias("p50"),
            F.percentile("l_extendedprice", F.lit(0.90)).alias("p90"),
        )
        .collect()
    }
    assert approx_rows.keys() == exact_rows.keys()
    for flag, approx in approx_rows.items():
        for est, true in zip(approx, exact_rows[flag]):
            # 1% value slack: generous vs the 0.01% rank guarantee, tight
            # enough to catch a broken sketch or wrong column
            assert abs(est - true) <= 0.01 * abs(true) + 1, (flag, est, true)
