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


def test_pagerank_matches_numpy_reference(spark):
    """Ten DataFrame power iterations must match a driver-side numpy
    power iteration on the same transition matrix to 1e-9, the ranks
    must sum to ~1 (no dangling-mass leak — every nation has outbound
    trade), and all ranks must be positive."""
    import numpy as np

    from analyse_the_sky_with_apache_spark_spark.catalog import load_table
    from analyse_the_sky_with_apache_spark_spark.operators.graph import (
        _PR_DAMP,
        _PR_ITERS,
    )

    rows = registry.queries()["graph_pagerank"](spark, SF_DIR).collect()
    got = {r["node"]: r["pr"] for r in rows}

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
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    t = np.zeros((n, n))
    for r in ew:
        t[idx[r["src"]], idx[r["dst"]]] = r["w"]
    assert (t.sum(axis=1) > 0).all(), "dangling nation (no outbound trade)"
    t /= t.sum(axis=1, keepdims=True)
    pr = np.full(n, 1.0 / n)
    for _ in range(_PR_ITERS):
        pr = (1.0 - _PR_DAMP) / n + _PR_DAMP * (t.T @ pr)

    assert abs(sum(got.values()) - 1.0) < 1e-9
    for v, i in idx.items():
        assert got[v] > 0
        assert abs(got[v] - pr[i]) < 1e-9, f"node {v}: {got[v]} vs {pr[i]}"


def test_linreg_matches_numpy_lstsq(spark):
    """The distributed normal-equation fit must match numpy lstsq on the
    same design matrix to 1e-6 relative."""
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
        [[1.0, *[r[c] for c in _LR_FEATURES]] for r in li]
    )
    y = np.array([r["l_extendedprice"] for r in li])
    ref, *_ = np.linalg.lstsq(x, y, rcond=None)
    names = ["intercept", *_LR_FEATURES]
    for n, r in zip(names, ref):
        assert abs(got[n] - r) <= 1e-6 * max(1.0, abs(r)), (n, got[n], r)
