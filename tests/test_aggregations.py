"""Sketch-aggregation semantics beyond the oracle gate."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_hll_overlap_close_to_exact(spark):
    """Inclusion–exclusion over HLL sketches must land within 5% of the
    exact click∩view audience (lgK=14 → ~0.8% per-sketch error; the
    difference of three estimates compounds, hence the loose bound)."""
    from pyspark.sql import functions as F

    from analyse_the_sky_with_apache_spark_spark.catalog import load_table
    from analyse_the_sky_with_apache_spark_spark.registry import queries

    row = queries()["agg_hll_overlap"](spark, SF_DIR).collect()[0]
    ev = load_table(spark, SF_DIR, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    viewers = ev.filter(F.col("event_type") == "view").select("user_id")
    exact = clickers.intersect(viewers).count()
    assert exact > 0
    rel_err = abs(row["est_intersection"] - exact) / exact
    assert rel_err < 0.05, f"overlap est {row['est_intersection']} vs exact {exact}"


def test_bitmap_jaccard_matches_exact_sets(spark):
    """The inner word join claim in bitmap_audience_jaccard's docstring:
    on this data the bitmap Jaccard must equal exact set arithmetic for
    every type pair."""
    from pyspark.sql import functions as F

    from analyse_the_sky_with_apache_spark_spark.catalog import load_table
    from analyse_the_sky_with_apache_spark_spark.registry import queries

    rows = queries()["bitmap_audience_jaccard"](spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    sets = {
        r["event_type"]: set()
        for r in ev.select("event_type").distinct().collect()
    }
    for r in ev.select("event_type", "user_id").distinct().collect():
        sets[r["event_type"]].add(r["user_id"])
    assert rows
    for r in rows:
        a, b = sets[r["type_a"]], sets[r["type_b"]]
        assert r["n_inter"] == len(a & b)
        assert r["n_union"] == len(a | b)


def test_interval_merge_islands_partition_the_orders(spark):
    """Merged islands must be disjoint per customer, ordered, and
    account for every order exactly once."""
    from collections import defaultdict

    from analyse_the_sky_with_apache_spark_spark.catalog import load_table
    from analyse_the_sky_with_apache_spark_spark.registry import queries

    rows = queries()["interval_merge"](spark, SF_DIR).collect()
    per_cust = defaultdict(list)
    for r in rows:
        per_cust[r["o_custkey"]].append(r)
    total_orders = sum(r["n_orders"] for r in rows)
    assert total_orders == load_table(spark, SF_DIR, "orders").count()
    for _, islands in per_cust.items():
        islands.sort(key=lambda r: r["island_id"])
        for a, b in zip(islands, islands[1:]):
            # strictly separated: the next island starts after this end
            assert b["island_start"] > a["island_end"], (a, b)
            assert a["island_start"] <= a["island_end"]


def test_cusum_statistic_properties(spark):
    """CUSUM is non-negative everywhere and alarms exactly where the
    statistic exceeds the decision interval."""
    from analyse_the_sky_with_apache_spark_spark.catalog import load_table
    from analyse_the_sky_with_apache_spark_spark.registry import queries

    rows = queries()["ts_cusum_alarm"](spark, SF_DIR).collect()
    assert rows
    ev_days = (
        load_table(spark, SF_DIR, "events")
        .selectExpr("CAST(ts AS DATE) AS day")
        .distinct()
        .count()
    )
    assert len(rows) == ev_days
    mu = None
    total = sum(r["x"] for r in rows)
    mu = total // len(rows)
    for r in rows:
        assert r["cusum"] >= 0, r
        assert r["alarm"] == (1 if r["cusum"] > 3 * mu else 0), r


def test_louvain_move_communities_cover_all_nodes(spark):
    """Every co-purchase node lands in exactly one community, and
    community sizes sum to the node count."""
    from analyse_the_sky_with_apache_spark_spark.registry import queries

    rows = queries()["graph_louvain_move"](spark, SF_DIR).collect()
    from analyse_the_sky_with_apache_spark_spark.operators.graph import (
        _edges_cached,
    )

    e = _edges_cached(spark, SF_DIR)
    n_nodes = (
        e.selectExpr("u AS node")
        .unionAll(e.selectExpr("v AS node"))
        .distinct()
        .count()
    )
    assert sum(r["size"] for r in rows) == n_nodes
    assert all(r["size"] >= 1 for r in rows)
