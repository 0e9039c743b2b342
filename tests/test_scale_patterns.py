"""Property tests for the scale-pattern operators.

The oracle differential already pins exact results; these pin the
SCALE properties the operators exist for — the z-curve's locality
bound and the bloom prefilter's actual selectivity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from analyse_the_sky_with_apache_spark_spark import registry
from analyse_the_sky_with_apache_spark_spark.operators.sorts import _Z_BITS
from tests.conftest import SF_DIR

registry.load_all_modules()


def test_zorder_buckets_bound_both_dims(spark):
    """Each z-bucket (2^14 consecutive z values) must cover at most a
    128×128 tile — the Morton-curve guarantee that makes file-level
    min/max stats prunable on BOTH dimensions. A plain (x, y) sort
    would pass this for x and blow the y bound wide open."""
    rows = registry.queries()["zorder_layout"](spark, SF_DIR).collect()
    assert rows, "zorder_layout returned no buckets"
    # 2^14 z values interleave 7 low bits of each dim → 2^7 tile width.
    tile = 1 << 7
    for r in rows:
        assert r["x_max"] - r["x_min"] < tile, r
        assert r["y_max"] - r["y_min"] < tile, r
    # buckets jointly cover the full x domain (the curve isn't degenerate)
    assert max(r["x_max"] for r in rows) > tile


def test_bloom_prefilter_is_selective(spark):
    """The bloom stage must pass far fewer rows than the full fact scan
    (selectivity is its whole point), while the final exact join keeps
    every true match — equality with the plain semi-join is already
    pinned by the oracle differential; here we re-derive the bitmap and
    measure the pass-rate."""
    from analyse_the_sky_with_apache_spark_spark.catalog import load_table
    from analyse_the_sky_with_apache_spark_spark.operators.joins import (
        _BLOOM_BITS,
        _BLOOM_K,
    )

    o = load_table(spark, SF_DIR, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= "2000-01-01")
    )
    li = load_table(spark, SF_DIR, "lineitem")

    def positions(col):
        return F.array(
            *[
                F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(_BLOOM_BITS))
                for i in range(_BLOOM_K)
            ]
        )

    bitmap = (
        o.select(F.explode(positions("o_orderkey")).alias("pos"))
        .distinct()
        .groupBy((F.col("pos") / 64).cast("long").alias("word"))
        .agg(F.bit_or(F.expr("shiftleft(1L, CAST(pos % 64 AS INT))")).alias("mask"))
    )
    assert bitmap.count() <= _BLOOM_BITS // 64

    probe = li.withColumn("rid", F.monotonically_increasing_id()).select(
        "rid",
        F.explode(positions("l_orderkey")).alias("pos"),
    ).select(
        "rid",
        (F.col("pos") / 64).cast("long").alias("word"),
        (F.col("pos") % 64).cast("int").alias("bit"),
    )
    passed = (
        probe.join(F.broadcast(bitmap), "word")
        .filter(F.expr("shiftleft(1L, bit) & mask") != 0)
        .groupBy("rid")
        .agg(F.count(F.lit(1)).alias("nbits"))
        .filter(F.col("nbits") == _BLOOM_K)
        .count()
    )
    total = li.count()
    exact = li.join(o, li.l_orderkey == o.o_orderkey, "left_semi").count()
    assert exact <= passed, "bloom dropped a true match (false negative)"
    assert passed < total * 0.5, (
        f"bloom passed {passed}/{total} rows — not selective"
    )


def test_countmin_estimate_bounds(spark):
    """Count-min point estimates must dominate the true count (never
    under-count) and stay within eN of it for the probed keys
    (e = e/w ≈ 0.0106 at w = 256; with d = 4 rows the failure
    probability e^-4 ≈ 2% per key — the fixture keys are fixed, so a
    pass here is stable, not probabilistic)."""
    import math

    from analyse_the_sky_with_apache_spark_spark.catalog import load_table
    from analyse_the_sky_with_apache_spark_spark.operators.warehouse import (
        _CM_D,
        _CM_W,
    )

    sketch = {
        (r["j"], r["cell"]): r["cnt"]
        for r in registry.queries()["agg_countmin"](spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    n_total = li.count()
    truth = {
        r["l_partkey"]: r["cnt"]
        for r in li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "l_partkey")
        .limit(10)
        .collect()
    }
    eps_n = math.e / _CM_W * n_total
    import hashlib

    for key, true_cnt in truth.items():
        est = min(
            sketch.get(
                (
                    j,
                    int(hashlib.md5(f"{key}-{j}".encode()).hexdigest()[:6], 16)
                    % _CM_W,
                ),
                0,
            )
            for j in range(_CM_D)
        )
        assert est >= true_cnt, f"count-min under-counted key {key}"
        assert est <= true_cnt + eps_n, (
            f"key {key}: est {est} exceeds true {true_cnt} + eN {eps_n:.0f}"
        )


def test_pagerank_matches_python_integer_recurrence(spark):
    """The promoted integer-grid trade PageRank must reproduce a
    driver-side replay of the IDENTICAL int recurrence exactly — and
    its total rank mass must stay within the documented floor-loss
    envelope of the 1e12 scale (every nation has outbound trade, so
    the only mass loss is integer flooring)."""
    from analyse_the_sky_with_apache_spark_spark.catalog import load_table
    from analyse_the_sky_with_apache_spark_spark.operators.graph import (
        _PRT_DAMP_DEN,
        _PRT_DAMP_NUM,
        _PRT_ITERS,
        _PRT_SCALE,
    )

    rows = registry.queries()["graph_pagerank"](spark, SF_DIR).collect()
    got = {r["node"]: r["rank"] for r in rows}

    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer")
    s = load_table(spark, SF_DIR, "supplier")
    ew = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()
    )
    nodes = sorted({r["src"] for r in ew} | {r["dst"] for r in ew})
    n = len(nodes)
    outw = {}
    for r in ew:
        outw[r["src"]] = outw.get(r["src"], 0) + r["w"]
    assert set(outw) == set(nodes), "dangling nation (no outbound trade)"

    rank = {v: _PRT_SCALE // n for v in nodes}
    base = ((100 - _PRT_DAMP_NUM) * _PRT_SCALE) // (_PRT_DAMP_DEN * n)
    for _ in range(_PRT_ITERS):
        inflow = dict.fromkeys(nodes, 0)
        for r in ew:
            inflow[r["dst"]] += (rank[r["src"]] * r["w"]) // outw[r["src"]]
        rank = {
            v: base + (_PRT_DAMP_NUM * inflow[v]) // _PRT_DAMP_DEN
            for v in nodes
        }

    assert got == rank, "Spark integer recurrence diverged from replay"
    # floor-loss envelope: each division drops < 1 unit per term
    total = sum(got.values())
    assert 0.999 * _PRT_SCALE < total <= _PRT_SCALE


def test_linreg_matches_numpy_lstsq(spark):
    """The promoted integer-grid normal-equation fit must match numpy
    lstsq on the SAME gridded design matrix (quantity; discount,
    tax ×100; price in cents) to 1e-6 relative — Cramer's rule on the
    exact sums and lstsq on the raw matrix agree to float precision on
    this well-conditioned 4-feature design."""
    import numpy as np

    from analyse_the_sky_with_apache_spark_spark.catalog import load_table
    from analyse_the_sky_with_apache_spark_spark.pipeline.clustering import (
        _LR_FEATURES,
    )

    got = {
        r["feature"]: r["coefficient"]
        for r in registry.queries()["ml_linreg_normal"](spark, SF_DIR).collect()
    }
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select(*_LR_FEATURES, "l_extendedprice")
        .collect()
    )
    x = np.array(
        [
            [
                1.0,
                float(int(r["l_quantity"])),
                float(int(np.floor(r["l_discount"] * 100.0 + 0.5))),
                float(int(np.floor(r["l_tax"] * 100.0 + 0.5))),
            ]
            for r in li
        ]
    )
    y = np.array(
        [float(int(np.floor(r["l_extendedprice"] * 100.0 + 0.5))) for r in li]
    )
    ref, *_ = np.linalg.lstsq(x, y, rcond=None)
    names = ["intercept", *_LR_FEATURES]
    for n, r in zip(names, ref):
        assert abs(got[n] - r) <= 1e-6 * max(1.0, abs(r)), (n, got[n], r)
