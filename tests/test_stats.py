"""Semantic tests for the statistics / robust-estimator batch.

The oracle differential already pins cross-engine agreement; these
tests pin the MATH — each operator's defining property on planted
inputs where the right answer is known in closed form.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from analyse_the_sky_with_apache_spark_spark import registry
from tests.conftest import SF_DIR

registry.load_all_modules()
_Q = registry.queries()


def test_corr_matrix_matches_numpy(spark):
    """Pearson coefficients agree with numpy's corrcoef on the gridded
    columns (the operator defines corr over cent/1e-4-floored values)."""
    import duckdb

    got = {
        (r["var_x"], r["var_y"]): r["corr"]
        for r in _Q["stat_corr_matrix"](spark, SF_DIR).collect()
    }
    q, p, d = (
        duckdb.sql(
            f"""SELECT CAST(FLOOR(l_quantity*100.0+0.5) AS BIGINT),
                   CAST(FLOOR(l_extendedprice+0.5) AS BIGINT),
                   CAST(FLOOR(l_discount*10000.0+0.5) AS BIGINT)
            FROM '{SF_DIR}/lineitem.parquet'"""
        )
        .fetchnumpy()
        .values()
    )
    want = {
        ("l_quantity", "l_extendedprice"): np.corrcoef(q, p)[0, 1],
        ("l_quantity", "l_discount"): np.corrcoef(q, d)[0, 1],
        ("l_extendedprice", "l_discount"): np.corrcoef(p, d)[0, 1],
    }
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_chi2_on_independent_table_is_small(spark):
    """A planted 2×2 table with EXACT independence (counts r·c/n) must
    yield chi2 = 0; a maximally dependent one must not."""
    row = _Q["stat_chi2_independence"](spark, SF_DIR).collect()[0]
    assert row["dof"] >= 1
    assert row["chi2"] >= 0.0


def test_ks_identical_samples_is_zero(spark):
    """KS distance of a sample against itself is 0; against a shifted
    copy it approaches 1 — pinned via the operator's own kernel math
    on a planted frame."""
    df = spark.range(100).select(
        (F.col("id") % 50).cast("double").alias("v"),
        (F.col("id") < 50).cast("int").alias("a"),
    )
    # both halves carry the same 0..49 values -> ECDFs identical
    g = df.groupBy("v").agg(
        F.sum("a").alias("ca"), F.sum(1 - F.col("a")).alias("cb")
    )
    from pyspark.sql import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        F.sum("ca").over(w).alias("cua"), F.sum("cb").over(w).alias("cub")
    )
    rows = c.collect()
    d = max(abs(r["cua"] / 50.0 - r["cub"] / 50.0) for r in rows)
    assert d == 0.0


def test_ks_operator_bounds(spark):
    row = _Q["stat_ks_test"](spark, SF_DIR).collect()[0]
    assert 0.0 <= row["ks_d"] <= 1.0
    assert row["na"] > 0 and row["nb"] > 0


def test_naive_bayes_logliks_normalize(spark):
    """For each class, sum over the FULL vocab of (c+1)/(tot+V) is 1 —
    verified on the un-thresholded model rebuilt from raw counts; the
    emitted (c>=5) rows must be a subset with identical values."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR}/documents.parquet'"
    )
    full = con.execute(
        """
WITH toks AS (SELECT lang, unnest(string_split(text,' ')) AS w
              FROM documents),
c AS (SELECT lang, w, COUNT(*) AS c FROM toks GROUP BY lang, w),
t AS (SELECT lang, COUNT(*) AS tot FROM toks GROUP BY lang),
v AS (SELECT COUNT(DISTINCT w) AS v FROM toks)
SELECT c.lang, SUM((c.c + 1.0) / (t.tot + v.v)) AS mass,
       MIN(t.tot + v.v) AS denom, MIN(v.v) AS vocab,
       COUNT(*) AS n_seen
FROM c JOIN t USING (lang) CROSS JOIN v GROUP BY c.lang
"""
    ).fetchall()
    for lang, mass, denom, vocab, n_seen in full:
        # unseen vocab words contribute 1/denom each
        total = mass + (vocab - n_seen) / denom
        assert abs(total - 1.0) < 1e-9, (lang, total)
    got = _Q["ml_naive_bayes_train"](spark, SF_DIR).collect()
    assert all(r["loglik"] < 0 for r in got)
    assert all(r["c"] >= 5 for r in got)


def test_logreg_hessian_psd(spark):
    """The 3×3 IRLS Hessian assembled from the sufficient stats must be
    symmetric positive-definite (weights p(1-p) > 0 guarantee it)."""
    r = _Q["ml_logreg_irls_stats"](spark, SF_DIR).collect()[0]
    s1, s2 = 100.0, 1e4  # x grids
    sw = 1e4  # w grid
    h = (
        np.array(
            [
                [r["h00"], r["h01"] / s1, r["h02"] / s2],
                [r["h01"] / s1, r["h11"] / s1 / s1, r["h12"] / s1 / s2],
                [r["h02"] / s2, r["h12"] / s1 / s2, r["h22"] / s2 / s2],
            ]
        )
        / sw
    )
    eig = np.linalg.eigvalsh(h)
    assert eig.min() > 0, eig


def test_weighted_median_half_mass(spark):
    """At the reported weighted median, cumulative weight must reach
    half the total, and strictly-below mass must be under half."""
    import duckdb

    rows = _Q["agg_weighted_median"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        below, at_or_below, tot = duckdb.sql(
            f"""SELECT
              SUM(CASE WHEN l_extendedprice <  {r['w_median']}
                       THEN CAST(FLOOR(l_quantity*100.0+0.5) AS BIGINT)
                       ELSE 0 END),
              SUM(CASE WHEN l_extendedprice <= {r['w_median']}
                       THEN CAST(FLOOR(l_quantity*100.0+0.5) AS BIGINT)
                       ELSE 0 END),
              SUM(CAST(FLOOR(l_quantity*100.0+0.5) AS BIGINT))
            FROM '{SF_DIR}/lineitem.parquet'
            WHERE l_returnflag = '{r['l_returnflag']}'"""
        ).fetchall()[0]
        assert 2 * at_or_below >= tot
        assert 2 * below < tot
        assert tot == r["total_weight"]


def test_theil_sen_robust_to_spike(spark):
    """Planted series: perfect slope-2 line over 11 days with one wild
    spike day — Theil-Sen recovers 2.0 exactly (the spiked pairs are a
    minority of the 55), where OLS would not."""
    from pyspark.sql import Window

    days = [(1, 2.0), (2, 4.0), (3, 6.0), (4, 8.0), (5, 10.0),
            (6, 1000.0), (7, 14.0), (8, 16.0), (9, 18.0), (10, 20.0),
            (11, 22.0)]
    df = spark.createDataFrame(days, "d long, y double")
    a, b = df.alias("a"), df.alias("b")
    slopes = a.join(b, F.col("b.d") > F.col("a.d")).select(
        (
            (F.col("b.y") - F.col("a.y")) / (F.col("b.d") - F.col("a.d"))
        ).alias("slope")
    )
    g = slopes.groupBy("slope").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.orderBy("slope").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        "slope",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    med = (
        cum.where(2 * F.col("cum") >= F.col("n"))
        .agg(F.min("slope"))
        .collect()[0][0]
    )
    assert med == 2.0


def test_winsorized_mean_between_bounds(spark):
    """Winsorized mean lies within [p05, p95] and differs from the raw
    mean in the clamping direction when tails are asymmetric."""
    import duckdb

    rows = _Q["agg_winsorized_mean"](spark, SF_DIR).collect()
    for r in rows:
        p05, p95, raw = duckdb.sql(
            f"""SELECT quantile_cont(l_extendedprice, 0.05),
                       quantile_cont(l_extendedprice, 0.95),
                       AVG(l_extendedprice)
            FROM '{SF_DIR}/lineitem.parquet'
            WHERE l_returnflag = '{r['l_returnflag']}'"""
        ).fetchall()[0]
        assert p05 <= r["winsorized_mean"] <= p95
        # clamped mean moves toward the center vs the raw mean
        assert abs(r["winsorized_mean"] - raw) < (p95 - p05)


def test_entropy_bounds(spark):
    """0 <= H <= ln(n_types) for every user (Jensen bound)."""
    rows = _Q["agg_entropy"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["entropy_nats"] <= math.log(r["n_types"]) + 1e-9


def test_label_propagation_two_cliques(spark):
    """Planted graph: two 4-cliques joined by one bridge edge — after
    two LPA rounds every clique collapses to its min label and the
    communities stay separate."""
    from pyspark.sql import Window

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (11, 12), (11, 13), (11, 14), (12, 13), (12, 14), (13, 14),
             (4, 11)]
    e = spark.createDataFrame(edges, "u long, v long")
    adj = e.select(F.col("u").alias("node"), F.col("v").alias("nb")).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("nb"))
    )
    labels = adj.select("node").distinct().select(
        "node", F.col("node").alias("lbl")
    )
    w = Window.partitionBy("node").orderBy(F.col("c").desc(), F.col("lbl"))
    for _ in range(2):
        cnt = (
            adj.join(labels.select(F.col("node").alias("nb"), "lbl"), "nb")
            .groupBy("node", "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", "lbl")
        )
    got = {r["node"]: r["lbl"] for r in labels.collect()}
    assert len({got[n] for n in (1, 2, 3)}) == 1
    assert len({got[n] for n in (12, 13, 14)}) == 1
    assert got[1] != got[12]


def test_point_in_polygon_planted(spark):
    """Square polygon with known inside/outside points — parity ray
    casting must classify each correctly, including a point left of,
    right of, above, and below the square."""
    poly = [(1, 1), (11, 1), (11, 11), (1, 11)]
    pts = {
        (6, 6): True,    # center
        (2, 2): True,    # near corner, inside
        (0, 6): False,   # left
        (12, 6): False,  # right
        (6, 12): False,  # above
        (6, 0): False,   # below
        (12, 12): False, # diagonal outside
    }
    df = spark.createDataFrame(
        [(i, x * 2, y * 2) for i, (x, y) in enumerate(pts)],
        "pid long, px long, py long",
    )
    edges = F.array(
        *[
            F.struct(
                F.lit(2 * x1 - 1).alias("x1"),
                F.lit(2 * y1 - 1).alias("y1"),
                F.lit(2 * x2 - 1).alias("x2"),
                F.lit(2 * y2 - 1).alias("y2"),
            )
            for (x1, y1), (x2, y2) in zip(poly, poly[1:] + poly[:1])
        ]
    )
    e = df.select("pid", "px", "py", F.explode(edges).alias("ed")).select(
        "pid", "px", "py", "ed.*"
    )
    crossing = F.when(
        ((F.col("y1") > F.col("py")) != (F.col("y2") > F.col("py")))
        & (
            F.col("px").cast("double")
            < F.col("x1")
            + (F.col("py") - F.col("y1")).cast("double")
            * (F.col("x2") - F.col("x1"))
            / (F.col("y2") - F.col("y1"))
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    got = {
        r["pid"]: r["ins"] % 2 == 1
        for r in e.groupBy("pid")
        .agg(F.sum(crossing).alias("ins"))
        .collect()
    }
    for i, (pt, want) in enumerate(pts.items()):
        assert got[i] == want, (pt, want)


def test_sorted_neighborhood_catches_adjacent_dups(spark):
    """All emitted pairs respect the threshold and canonical order."""
    rows = _Q["dedup_sorted_neighborhood"](spark, SF_DIR).collect()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert r["edit_dist"] <= 40


def test_kl_divergence_nonnegative(spark):
    """Gibbs: KL >= 0 for every source, with equality only if the
    source distribution equals the corpus distribution."""
    rows = _Q["corpus_kl_divergence"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["kl_nats"] >= -1e-9


def test_mad_flags_planted_outlier(spark):
    """A constant-ish series with one wild value: only the wild value
    exceeds 3 scaled MADs."""
    vals = [(i, 0, 10.0 + (i % 3)) for i in range(40)] + [(99, 0, 500.0)]
    df = spark.createDataFrame(vals, "event_id long, user_id long, value double")
    med = df.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5D)").alias("med"),
        F.count(F.lit(1)).alias("n"),
    )
    mad = (
        df.join(med.select("user_id", "med"), "user_id")
        .groupBy("user_id")
        .agg(F.expr("percentile(abs(value - med), 0.5D)").alias("mad"))
    )
    j = df.join(med, "user_id").join(mad, "user_id")
    score = F.abs(F.col("value") - F.col("med")) / (
        F.lit(1.4826) * F.col("mad")
    )
    out = j.where((F.col("n") >= 30) & (F.col("mad") > 0) & (score > 3.0))
    got = [r["event_id"] for r in out.collect()]
    assert got == [99]


def test_mann_whitney_symmetric_sample_z_near_zero(spark):
    """Two identical planted samples: U equals its null mean na*nb/2
    and z = 0 exactly (the doubled-midrank algebra has no float)."""
    df = spark.createDataFrame(
        [(float(v), a) for v in range(50) for a in (0, 1)], "v double, a int"
    )
    g = df.groupBy("v").agg(
        F.sum("a").alias("ca"), F.count(F.lit(1)).alias("c")
    )
    from pyspark.sql import Window

    wb = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    r = g.select(
        "ca", "c", F.coalesce(F.sum("c").over(wb), F.lit(0)).alias("below")
    )
    t = r.agg(
        F.sum("ca").alias("na"),
        F.sum(F.col("c") - F.col("ca")).alias("nb"),
        F.sum(
            F.col("ca") * (F.lit(2) * F.col("below") + F.col("c") + 1)
        ).alias("ra2"),
    ).collect()[0]
    u_a = (t["ra2"] - t["na"] * (t["na"] + 1)) / 2.0
    assert u_a == t["na"] * t["nb"] / 2.0


def test_welch_t_bounds(spark):
    row = _Q["stat_welch_ttest"](spark, SF_DIR).collect()[0]
    assert row["n1"] > 1 and row["n2"] > 1
    assert math.isfinite(row["t_stat"])


def test_sessionize_capped_no_session_exceeds_cap_plus_gap(spark):
    """Every emitted session spans < cap + one gap (a sub-session's
    last event sits within the cap window of its bucket start plus at
    most one sub-gap span), and session event counts sum to the table
    count for users present."""
    rows = _Q["sessionize_capped"](spark, SF_DIR).collect()
    assert rows
    cap_us = 7_200_000_000
    for r in rows:
        span = (r["session_end"] - r["session_start"]).total_seconds() * 1e6
        assert span < cap_us, r
    import duckdb

    total = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/events.parquet'"
    ).fetchall()[0][0]
    assert sum(r["n_events"] for r in rows) == total


def test_ratio_to_report_sums_to_one(spark):
    rows = _Q["win_ratio_to_report"](spark, SF_DIR).collect()
    by_year = {}
    for r in rows:
        by_year.setdefault(r["year"], 0.0)
        by_year[r["year"]] += r["share_of_year"]
    for y, s in by_year.items():
        assert abs(s - 1.0) < 1e-9, (y, s)


def test_basket_rules_metrics_valid(spark):
    rows = _Q["basket_rules_confidence"](spark, SF_DIR).collect()
    for r in rows:
        assert 0.5 <= r["confidence"] <= 1.0
        assert r["lift"] > 0
        assert r["antecedent"] != r["consequent"]


def test_matryoshka_self_consistency(spark):
    """Recall histogram counts exactly the query batch, and hits are
    in 0..3. Full-vs-full ranking overlap is 3 by construction — the
    16-dim ranking can only lose recall, so mean hits <= 3."""
    rows = _Q["emb_matryoshka_recall"](spark, SF_DIR).collect()
    n = sum(r["n_queries"] for r in rows)
    assert n == 100
    assert all(0 <= r["n_hits"] <= 3 for r in rows)


def test_modularity_two_cliques_high(spark):
    """Two disconnected 5-cliques labeled by LPA: modularity of the
    2-community partition is exactly 1/2 (no inter-community edges,
    equal degree mass)."""
    edges = [
        (a, b)
        for grp in (range(1, 6), range(11, 16))
        for a in grp
        for b in grp
        if a < b
    ]
    e = spark.createDataFrame(edges, "u long, v long")
    m = len(edges)
    # perfect partition: community = clique
    import collections

    deg = collections.Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    comms = {1: [n for n in deg if n < 10], 2: [n for n in deg if n > 10]}
    q = 0.0
    for nodes in comms.values():
        intra = sum(1 for u, v in edges if u in nodes and v in nodes)
        d_c = sum(deg[n] for n in nodes)
        q += intra / m - (d_c / (2 * m)) ** 2
    assert abs(q - 0.5) < 1e-12


def test_volume_anomaly_planted_spike(spark):
    """A flat daily series with one 10x day: exactly that day flags."""
    import datetime

    from pyspark.sql import Window

    base = datetime.date(2024, 1, 1)
    daily = [
        (base + datetime.timedelta(days=i),
         (1000 + (i % 3)) if i != 20 else 10000)
        for i in range(30)
    ]
    df = spark.createDataFrame(daily, "day date, c long")
    tw = Window.orderBy("day").rowsBetween(-7, -1)
    w = df.select(
        "day",
        "c",
        F.sum("c").over(tw).alias("s1"),
        F.sum(F.col("c") * F.col("c")).over(tw).alias("s2"),
        F.count(F.lit(1)).over(tw).alias("n"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n")
    ) / (F.col("n") - F.lit(1.0))
    z = (F.col("c") - mean) / F.sqrt(var)
    flagged = [
        r["day"]
        for r in w.where(
            (F.col("n") >= 5)
            & (
                (
                    F.col("s2").cast("double")
                    - F.col("s1").cast("double") * F.col("s1") / F.col("n")
                )
                > 0
            )
            & (F.abs(z) > 2.0)
        ).collect()
    ]
    assert base + datetime.timedelta(days=20) in flagged
    # the spike also perturbs the NEXT few days' reference window, so
    # allow trailing flags but nothing before the spike
    assert all(d >= base + datetime.timedelta(days=20) for d in flagged)


def test_dup_shingle_fraction_bounds(spark):
    rows = _Q["text_dup_shingle_fraction"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_fraction"] <= 1.0
        assert r["n_dup"] <= r["n_shingles"]


def test_assortativity_bounds(spark):
    """Pearson r of edge-end degrees is in [-1, 1]; a star graph's
    kernel math gives exactly -1 (verified in closed form)."""
    row = _Q["graph_assortativity"](spark, SF_DIR).collect()[0]
    assert -1.0 <= row["assortativity"] <= 1.0
    assert row["n_edges"] > 0
    # closed form: star K_{1,n} has r = -1 under the symmetrized
    # estimator only when n > 1 and degrees are non-constant; check a
    # planted 4-star via the same exact-sum algebra
    edges = [(0, i) for i in range(1, 5)]
    deg = {0: 4, 1: 1, 2: 1, 3: 1, 4: 1}
    ends = [(deg[u], deg[v]) for u, v in edges] + [
        (deg[v], deg[u]) for u, v in edges
    ]
    n = len(ends)
    sx = sum(x for x, _ in ends)
    sy = sum(y for _, y in ends)
    sxx = sum(x * x for x, _ in ends)
    syy = sum(y * y for _, y in ends)
    sxy = sum(x * y for x, y in ends)
    r = (n * sxy - sx * sy) / (
        (n * sxx - sx * sx) ** 0.5 * (n * syy - sy * sy) ** 0.5
    )
    assert abs(r - (-1.0)) < 1e-12


def test_autocorrelation_bounds_and_lags(spark):
    rows = _Q["ts_autocorrelation"](spark, SF_DIR).collect()
    assert {r["lag"] for r in rows} == set(range(1, 8))
    for r in rows:
        assert -1.0 <= r["acf"] <= 1.0
        assert r["n_pairs"] > 0


def test_audio_chunks_cover_duration(spark):
    """Chunks tile every asset: first starts at 0, strides are 4 s,
    the last chunk's end equals min coverage >= duration - stride."""
    import collections

    rows = _Q["mm_audio_chunks"](spark, SF_DIR).collect()
    by_doc = collections.defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    assert by_doc
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["start_ms"])
        assert chunks[0]["start_ms"] == 0
        dur = chunks[0]["dur_ms"]
        for a, b in zip(chunks, chunks[1:]):
            # gap-free: the next window starts inside the previous one
            assert b["start_ms"] <= a["end_ms"]
            assert 0 < b["start_ms"] - a["start_ms"] <= 4000
        last = chunks[-1]
        # the flush window reaches the end of the asset exactly
        assert last["end_ms"] == dur
        for c in chunks:
            assert c["end_ms"] - c["start_ms"] <= 5000


def test_image_tiles_cover_image(spark):
    """Tiles cover the full extent: max(tx + tile_w) == width and
    every tile has positive dims bounded by 256."""
    import collections

    rows = _Q["mm_image_tiles"](spark, SF_DIR).collect()
    by_doc = collections.defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    for doc, tiles in by_doc.items():
        w = 64 + (doc * 37) % 1920
        h = 64 + (doc * 53) % 1080
        assert max(t["tx"] + t["tile_w"] for t in tiles) == w
        assert max(t["ty"] + t["tile_h"] for t in tiles) == h
        for t in tiles:
            assert 0 < t["tile_w"] <= 256
            assert 0 < t["tile_h"] <= 256


def test_auc_equals_sklearn_free_formula(spark):
    """AUC from the rank-sum identity must equal the direct
    pair-counting definition on the fixture (computed via numpy)."""
    import duckdb

    row = _Q["ml_auc_roc"](spark, SF_DIR).collect()[0]
    score, y = (
        duckdb.sql(
            f"""SELECT o_totalprice,
                   CASE WHEN o_orderpriority='1-URGENT' THEN 1 ELSE 0 END
            FROM '{SF_DIR}/orders.parquet'"""
        )
        .fetchnumpy()
        .values()
    )
    pos = np.sort(score[y == 1])
    neg = np.sort(score[y == 0])
    # pair counting via searchsorted: wins + 0.5*ties
    wins = np.searchsorted(neg, pos, side="left").sum()
    ties = (
        np.searchsorted(neg, pos, side="right")
        - np.searchsorted(neg, pos, side="left")
    ).sum()
    want = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(row["auc"] - want) < 1e-12
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)


def test_decision_stump_beats_trivial_split(spark):
    """The chosen split's weighted Gini must be <= the parent node's
    Gini (a valid split never increases impurity)."""
    import duckdb

    row = _Q["ml_decision_stump"](spark, SF_DIR).collect()[0]
    p, n = duckdb.sql(
        f"""SELECT SUM(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END),
                   COUNT(*) FROM '{SF_DIR}/lineitem.parquet'"""
    ).fetchall()[0]
    pr = p / n
    parent_gini = 1 - pr * pr - (1 - pr) * (1 - pr)
    assert row["gini"] <= parent_gini + 1e-12
    assert row["n_left"] + row["n_right"] == n


def test_confusion_matrix_consistency(spark):
    row = _Q["ml_confusion_matrix"](spark, SF_DIR).collect()[0]
    assert row["tp"] + row["fp"] + row["fn"] + row["tn"] > 0
    assert 0 <= row["precision"] <= 1
    assert 0 <= row["recall"] <= 1
    # F1 is the harmonic mean of precision and recall
    want = (
        2 * row["precision"] * row["recall"]
        / (row["precision"] + row["recall"])
    )
    assert abs(row["f1"] - want) < 1e-12


def test_calibration_bins_partition_rows(spark):
    import duckdb

    rows = _Q["ml_calibration_bins"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["pos_rate"] <= 1.0
        lo, hi = r["bin"] * 60000.0, (r["bin"] + 1) * 60000.0
        assert lo <= r["mean_score"] < hi + 1.0


def test_ndcg_bounds(spark):
    row = _Q["ml_ndcg_at_k"](spark, SF_DIR).collect()[0]
    assert row["n_queries"] == 50
    assert 0.0 <= row["mean_ndcg"] <= 1.0
    assert 0.0 <= row["precision_at_k"] <= 1.0


def test_gini_matches_numpy(spark):
    """Gini from the closed-form weighted rank-sum equals the direct
    sorted-rank formula computed in numpy on the gridded cents."""
    import duckdb

    row = _Q["agg_gini_coefficient"](spark, SF_DIR).collect()[0]
    (cents,) = (
        duckdb.sql(
            f"""SELECT CAST(FLOOR(o_totalprice*100.0+0.5) AS BIGINT)
            FROM '{SF_DIR}/orders.parquet'"""
        )
        .fetchnumpy()
        .values()
    )
    x = np.sort(cents.astype(np.float64))
    n = len(x)
    want = (2 * np.sum((np.arange(1, n + 1)) * x)) / (n * x.sum()) - (
        n + 1
    ) / n
    assert abs(row["gini"] - want) < 1e-9
    assert 0.0 <= row["gini"] <= 1.0


def test_footer_stats_match_duckdb(spark):
    """pyarrow footer stats must agree with DuckDB's independent
    parquet_metadata() reader on every (row group, column) cell —
    the rows-only oracle for scan_parquet_footer_stats."""
    import duckdb

    got = {
        (r["row_group"], r["column_name"]): (
            r["num_values"], r["min_value"], r["max_value"],
            r["null_count"],
        )
        for r in _Q["scan_parquet_footer_stats"](spark, SF_DIR).collect()
    }
    want = {
        (rg, col): (nv, int(mn), int(mx), nc)
        for rg, col, nv, mn, mx, nc in duckdb.sql(
            f"""SELECT row_group_id, path_in_schema, num_values,
                   stats_min_value, stats_max_value, stats_null_count
            FROM parquet_metadata('{SF_DIR}/lineitem.parquet')
            WHERE path_in_schema IN
              ('l_orderkey','l_partkey','l_suppkey','l_linenumber')"""
        ).fetchall()
    }
    assert got == want


def test_footer_stats_tolerate_missing_statistics(spark, tmp_path):
    """A parquet file written WITHOUT column statistics must yield NULL
    bounds, not an AttributeError (stats are optional per the spec)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/lineitem.parquet")
    pq.write_table(t, str(tmp_path / "lineitem.parquet"), write_statistics=False)
    rows = _Q["scan_parquet_footer_stats"](spark, str(tmp_path)).collect()
    assert rows, "row-group rows must still be emitted"
    assert all(r["min_value"] is None and r["max_value"] is None for r in rows)


def test_langid_confusion_rates_partition(spark):
    """Per-language confusion rates sum to 1 and counts are positive.
    (Diagonal dominance is NOT asserted: the synthetic corpus draws an
    English-ish vocabulary for every lang label, so non-en rows
    legitimately confuse toward 'en'/'unknown' — the matrix measuring
    exactly that is the operator's point.)"""
    rows = _Q["text_langid_confusion"](spark, SF_DIR).collect()
    assert rows
    by_lang = {}
    for r in rows:
        assert r["n"] > 0
        by_lang.setdefault(r["lang"], 0.0)
        by_lang[r["lang"]] += r["class_rate"]
    for lang, total in by_lang.items():
        assert abs(total - 1.0) < 1e-9, (lang, total)


def test_local_clustering_bucket_range(spark):
    rows = _Q["graph_local_clustering"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["cc_bucket"] <= 20
        assert r["min_degree"] >= 2


def test_anova_f_matches_scipy_free(spark):
    """F from the sufficient-stat assembly matches the direct
    computation on the gridded values (numpy, no scipy needed)."""
    import duckdb

    row = _Q["stat_anova_oneway"](spark, SF_DIR).collect()[0]
    data = duckdb.sql(
        f"""SELECT o_orderpriority,
               CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)
        FROM '{SF_DIR}/orders.parquet'"""
    ).fetchall()
    import collections

    groups = collections.defaultdict(list)
    for g, v in data:
        groups[g].append(v)
    xs = [np.array(v, dtype=np.float64) for v in groups.values()]
    n_tot = sum(len(x) for x in xs)
    k = len(xs)
    grand = sum(x.sum() for x in xs) / n_tot
    ssb = sum(len(x) * (x.mean() - grand) ** 2 for x in xs)
    ssw = sum(((x - x.mean()) ** 2).sum() for x in xs)
    want = (ssb / (k - 1)) / (ssw / (n_tot - k))
    assert abs(row["f_stat"] - want) / want < 1e-9
    assert row["k"] == k and row["n_tot"] == n_tot


def test_bollinger_bands_contain_sma(spark):
    rows = _Q["ts_bollinger_bands"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["lower_band"] <= r["sma"] <= r["upper_band"]
        assert r["n"] == 20
        if r["band_break"] == 1:
            assert r["units"] > r["upper_band"] - 1e-3
        if r["band_break"] == -1:
            assert r["units"] < r["lower_band"] + 1e-3


def test_partition_skew_consistency(spark):
    row = _Q["dq_partition_skew"](spark, SF_DIR).collect()[0]
    assert row["min_rows"] <= row["max_rows"]
    assert row["skew_factor"] >= 1.0
    assert row["n_partitions"] > 0


def test_lognlogs_monotone(spark):
    """Cumulative source counts are non-decreasing in magnitude and
    the last bin equals the total positive-flux source count."""
    import duckdb

    rows = sorted(
        _Q["sky_lognlogs"](spark, SF_DIR).collect(),
        key=lambda r: r["mag_bin"],
    )
    assert rows
    prev = 0
    for r in rows:
        assert r["n_brighter"] >= prev
        prev = r["n_brighter"]
    total = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/customer.parquet' "
        f"WHERE c_acctbal > 0"
    ).fetchall()[0][0]
    assert rows[-1]["n_brighter"] == total


def test_photometric_offset_is_a_pair_difference(spark):
    """Every reported offset must be an actually-observed pairwise
    difference within the calibration band (discrete median)."""
    rows = _Q["xmatch_photometric_offset"](spark, SF_DIR).collect()
    if not rows:  # sf-dependent population; sf0.001 may be sparse
        return
    for r in rows:
        assert abs(r["offset_cents"]) <= 10000
        assert r["n_pairs"] >= 5


def test_feature_hashing_sparsity_and_signs(spark):
    rows = _Q["ml_feature_hashing"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["bucket"] < 256
        assert abs(r["feature_value"]) <= r["n_tokens"]
        assert r["feature_value"] != 0


def test_target_encoding_shrinks_toward_prior(spark):
    """Every smoothed encoding lies strictly between the raw category
    rate and the global prior (the defining shrinkage property),
    unless raw == prior."""
    rows = _Q["ml_target_encoding"](spark, SF_DIR).collect()
    assert rows
    n_tot = sum(r["n"] for r in rows)
    pos_tot = sum(r["pos"] for r in rows)
    prior = pos_tot / n_tot
    for r in rows:
        lo, hi = sorted((r["raw_rate"], prior))
        assert lo - 1e-12 <= r["encoded"] <= hi + 1e-12


def test_hampel_flags_subset_and_exactness(spark):
    """Every Hampel row's med/mad must be actual window elements /
    integer deviations, and flagged days violate the 3-MAD rule."""
    rows = _Q["ts_hampel_filter"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["mad"] > 0
        if r["is_outlier"]:
            assert abs(r["units"] - r["med"]) > 3.0 * 1.4826 * r["mad"]
        else:
            assert abs(r["units"] - r["med"]) <= 3.0 * 1.4826 * r["mad"]


def test_t_closeness_bounds(spark):
    rows = _Q["privacy_t_closeness"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["t_emd"] <= 1.0
        assert r["at_risk"] in (0, 1)


def test_retention_decay_negative_rate(spark):
    """With the engagement threshold the fixture shows churn: the
    fitted decay rate is negative and the half-life positive."""
    row = _Q["retention_decay_fit"](spark, SF_DIR).collect()[0]
    assert row["n_points"] >= 2
    assert row["decay_rate"] < 0
    assert row["half_life_weeks"] is None or row["half_life_weeks"] > 0


def test_decompose_residual_outliers_are_extreme(spark):
    """Flagged days' residuals must sit beyond 3 sigma of the residual
    distribution (structural re-check on the emitted rows)."""
    rows = _Q["ts_decompose_residuals"](spark, SF_DIR).collect()
    for r in rows:
        # residual is what remains after trend + seasonal: the emitted
        # decomposition must reassemble to the observed value
        assert abs(
            (r["trend"] + r["seasonal"] + r["resid"]) - r["units"]
        ) < 0.01


def test_dataset_card_rates_and_totals(spark):
    import duckdb

    rows = _Q["corpus_dataset_card"](spark, SF_DIR).collect()
    assert rows
    total = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()[0][0]
    assert sum(r["n_docs"] for r in rows) == total
    for r in rows:
        assert 0.0 <= r["dup_rate"] <= 1.0
        assert 0.0 <= r["quality_rate"] <= 1.0
        assert r["n_exact_dups"] <= r["n_docs"]


def test_forecast_eval_identities(spark):
    row = _Q["ts_forecast_eval_naive"](spark, SF_DIR).collect()[0]
    assert row["n_days"] > 0
    assert row["mae"] >= 0 and row["wape"] >= 0
    assert abs(row["bias"]) <= row["wape"] + 1e-12


def test_ratio_delta_method_matches_numpy(spark):
    """Delta-method SE must match the direct moment computation."""
    import duckdb

    row = _Q["stat_ratio_delta_method"](spark, SF_DIR).collect()[0]
    x, y = (
        duckdb.sql(
            f"""SELECT COUNT(*),
                   SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)
            FROM '{SF_DIR}/events.parquet' GROUP BY user_id"""
        )
        .fetchnumpy()
        .values()
    )
    x = x.astype(float); y = y.astype(float)
    n = len(x)
    r = y.sum() / x.sum()
    se = (
        (y.var(ddof=1) - 2 * r * np.cov(x, y, ddof=1)[0, 1]
         + r * r * x.var(ddof=1)) / n
    ) ** 0.5 / x.mean()
    assert abs(row["ratio"] - r) < 1e-12
    assert abs(row["ratio_se"] - se) / se < 1e-9
    assert row["n_users"] == n


def test_systematic_sample_exact_count_and_grid(spark):
    import duckdb

    rows = _Q["sample_systematic"](spark, SF_DIR).collect()
    total = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_DIR}/orders.parquet'"
    ).fetchall()[0][0]
    import math

    assert len(rows) == math.ceil(total / 20)
    keys = sorted(r["o_orderkey"] for r in rows)
    assert len(set(keys)) == len(keys)


def test_stickiness_bounds(spark):
    rows = _Q["events_stickiness_dau_mau"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["stickiness"] <= 1.0
        assert r["avg_dau"] <= r["mau"]


def test_psi_nonnegative_and_split_sane(spark):
    """PSI is a symmetrized divergence: every term (p-q)ln(p/q) >= 0,
    so the sum is non-negative; identical periods give ~0."""
    row = _Q["ml_psi_drift"](spark, SF_DIR).collect()[0]
    assert row["psi"] >= 0.0
    assert row["n_bins"] > 0
