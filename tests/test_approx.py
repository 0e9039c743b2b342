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


def test_kll_quantiles_rank_error_bound(spark):
    """The KLL sketch's quantile estimates must land within 2% RANK
    error of the true quantile (k=200 ⇒ theoretical eps ≈ 1%; the
    deterministic coin forfeits the formal guarantee, so the bound is
    pinned empirically with headroom). Also pins that the merged
    sketch's weighted count tracks the true row count (compaction
    preserves weight up to odd-buffer drift) and stays bounded in size.
    """
    rows = queries()["agg_kll_quantiles"](spark, SF_DIR).collect()
    li = load_table(spark, SF_DIR, "lineitem")
    n = li.count()
    assert len(rows) == 4
    for r in rows:
        q = r["q_micro"] * 1e-6
        realized_rank = li.filter(F.col("l_extendedprice") <= r["est"]).count()
        assert abs(realized_rank - q * n) <= max(0.02 * n, 2), (
            r["q_micro"], r["est"], realized_rank, q * n,
        )
        assert abs(r["n_weight"] - n) <= 0.01 * n + 16, (r["n_weight"], n)
        assert r["n_retained"] <= 700


def test_kll_sketch_merge_is_order_insensitive():
    """Merging the same item multiset in different orders must give the
    same estimates — the mergeability contract that lets partial
    sketches combine in any shuffle arrival order."""
    from analyse_the_sky_with_apache_spark_spark.operators.aggregations import _KLLSketch

    vals = [((i * 7919) % 4999) / 7.0 for i in range(5000)]
    a = _KLLSketch()
    for v in vals:
        a.insert(v)
    b = _KLLSketch()
    for v in reversed(vals):
        b.insert(v)
    # same DATA through different insertion orders: estimates agree to
    # within the sketch's own error budget at n=5000
    for q in (0.1, 0.5, 0.9):
        assert abs(a.quantile(q) - b.quantile(q)) <= 0.04 * 5000 / 7.0
