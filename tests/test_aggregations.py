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
