"""Behavioral pins for the round-8 rank/normality/serial-correlation
batch, beyond the oracle hashes: the classical rank-sum identities that
hold exactly when ranks are assigned correctly (so a tie-handling bug
fails a named assertion, not a hash), JB's platykurtic reading on the
uniform quantity column, and DW's [0, 4] range contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from analyse_the_sky_with_apache_spark_spark.registry import queries
from tests.conftest import SF_DIR


def test_kruskal_wallis_rank_sum_identity(spark):
    """Sum of per-group rank sums must equal N(N+1)/2 exactly (2x scale:
    sum(rj2) == N(N+1)) — the invariant average-tie ranks preserve and
    min/max-rank conventions break."""
    rows = queries()["stat_kruskal_wallis"](spark, SF_DIR).collect()
    assert len(rows) == 3  # one per return flag
    n = rows[0]["n"]
    assert sum(r["rj2"] for r in rows) == n * (n + 1)
    assert sum(r["nj"] for r in rows) == n
    # quantity is iid across return flags: H must not scream.
    assert all(not r["reject"] for r in rows)
    assert all(r["h_adj_micro"] >= 0 for r in rows)


def test_friedman_rank_sum_identity(spark):
    """Within every complete block the 2x ranks sum to k(k+1), so the
    per-treatment rank sums total n*k*(k+1)."""
    rows = queries()["stat_friedman_test"](spark, SF_DIR).collect()
    k = rows[0]["k"]
    n = rows[0]["n"]
    assert len(rows) == k == 5
    assert sum(r["rj2"] for r in rows) == n * k * (k + 1)
    assert all(r["nblocks"] == n for r in rows)


def test_jarque_bera_uniform_quantity_is_platykurtic(spark):
    """quantity ~ Uniform{1..50}: skewness ~ 0, excess kurtosis ~ -1.2,
    and JB rejects normality at any real n."""
    rows = queries()["stat_jarque_bera"](spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        assert abs(r["skew_micro"]) < 100_000  # |skew| < 0.1
        assert -1_400_000 < r["exkurt_micro"] < -1_000_000
        assert r["non_normal"]
        assert r["jb_milli"] > 0


def test_durbin_watson_range_and_rho_consistency(spark):
    """DW lives in [0, 4] and rho_micro must equal 1 - dw/2 on the same
    grid (both sides are floored from the same double)."""
    row = queries()["stat_durbin_watson"](spark, SF_DIR).collect()[0]
    assert 0 <= row["dw_micro"] <= 4_000_000
    assert abs(row["rho_micro"] - (1_000_000 - row["dw_micro"] // 2)) <= 1
    assert row["n"] > 100  # hourly series over the 30-day fixture


def test_permutation_entropy_bounds(spark):
    """Normalized PE of order 3 is bounded by ln(8)/ln(6) (tie patterns
    can push the 3-bit encoding past the 6 strict orderings) and the
    pattern histogram by 8; counts must cover n = |series| - 2."""
    rows = queries()["ts_permutation_entropy"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 1 <= r["patterns_seen"] <= 8
        assert 0 <= r["h_norm_micro"] <= 1_160_964  # ln(8)/ln(6) + grid
        assert r["n"] > 0


def test_brier_murphy_identity(spark):
    """Brier = REL - RES + UNC must hold on the nano grid (forecast is
    constant within each decile, so the identity is exact up to
    10 half-ulp grid roundings)."""
    row = queries()["ml_brier_decomposition"](spark, SF_DIR).collect()[0]
    lhs = row["brier_nano"]
    rhs = row["rel_nano"] - row["res_nano"] + row["unc_nano"]
    assert abs(lhs - rhs) <= 15
    assert 0 <= lhs <= 1_000_000_000  # Brier of a binary outcome <= 1


def test_knn_classify_covers_every_query(spark):
    """Every held-out query must get exactly one prediction; per-class
    counts must total the query-split size."""
    from tests.conftest import SF_DIR as sd
    from analyse_the_sky_with_apache_spark_spark.catalog import load_table
    from analyse_the_sky_with_apache_spark_spark.pipeline.similarity import (
        _KNN_CLS_CAP,
        _KNN_CLS_STRIDE,
    )

    rows = queries()["ml_knn_classify"](spark, sd).collect()
    n_queries = sum(r["n_queries"] for r in rows)
    expected = (
        load_table(spark, sd, "embeddings")
        .filter(
            (F.col("vec_id") % _KNN_CLS_STRIDE == 0)
            & (F.col("vec_id") < _KNN_CLS_CAP)
        )
        .count()
    )
    assert n_queries == expected
    for r in rows:
        assert 0 <= r["n_correct"] <= r["n_queries"]


def test_hurst_single_exponent_rides_along(spark):
    """One hurst estimate rides along all four size rows; R/S grows
    with the window size (the monotonicity R/S analysis relies on)."""
    rows = queries()["ts_hurst_rs"](spark, SF_DIR).collect()
    sizes = [r["s"] for r in rows]
    assert sizes == sorted(sizes)
    assert set(sizes) <= {8, 16, 32, 64} and sizes
    assert len({r["hurst_micro"] for r in rows}) == 1
    rs = [r["mean_rs_micro"] for r in rows]
    assert rs == sorted(rs)
    if len(rows) >= 2:  # the fit needs two surviving sizes
        assert 0 < rows[0]["hurst_micro"] < 1_200_000
    else:  # sparse fixture: the fit row is absent -> NULL rides along
        assert rows[0]["hurst_micro"] is None


def test_heaps_vocab_and_tokens_monotone(spark):
    """Cumulative tokens and cumulative vocabulary must both be
    non-decreasing in the checkpoint index, and vocab <= tokens."""
    rows = queries()["text_heaps_law"](spark, SF_DIR).collect()
    assert len(rows) == 10
    toks = [r["n_tokens"] for r in rows]
    vocs = [r["vocab"] for r in rows]
    assert toks == sorted(toks) and vocs == sorted(vocs)
    assert all(v <= t for v, t in zip(vocs, toks))
    assert len({r["beta_micro"] for r in rows}) == 1
    # sublinear growth; 0 is legal when vocab saturates in the first
    # checkpoint (tiny fixtures with heavy token reuse)
    assert 0 <= rows[0]["beta_micro"] < 1_000_000


def test_rouge_f1_bounds_and_clipping(spark):
    """F1 is bounded by min(recall, precision)*2/(1+min/max)<=1 and the
    clipped overlap can exceed neither side's bigram total."""
    rows = queries()["text_rouge_overlap"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["ov"] <= min(r["tot1"], r["tot2"])
        assert 0 <= r["f1_micro"] <= 1_000_000
        assert r["d2"] == r["d1"] + 1


def test_wap_failing_branch_stays_quarantined(spark):
    """The buggy-dedupe branch must fail its audit, remain staged on
    disk, and leave no trace in the published table (final_rows equals
    the base count)."""
    import os

    from analyse_the_sky_with_apache_spark_spark.sources import scans

    rows = {
        r["branch"]: r
        for r in queries()["txn_log_wap_publish"](spark, SF_DIR).collect()
    }
    assert not rows["baddedup"]["passed"]
    assert rows["uplift"]["passed"] and rows["uplift"]["published"]
    assert rows["uplift"]["final_rows"] == rows["uplift"]["n_base"]
    root = scans._txn_wap_roots[SF_DIR]
    assert os.path.exists(os.path.join(root, "_staged", "baddedup.json"))
    assert not os.path.exists(os.path.join(root, "_staged", "uplift.json"))
    # published version 1 exists
    assert os.path.exists(os.path.join(root, "_log", "00000001.json"))


def test_fisher_p_value_is_a_probability(spark):
    """Two-sided Fisher p in (0, 1]; the observed table's own
    probability is always included, so p > 0; k_terms is bounded by
    min(r1, c1) + 1."""
    row = queries()["stat_fisher_exact"](spark, SF_DIR).collect()[0]
    assert 0 < row["p_two_pico"] <= 1_000_000_000_000 + 1
    assert row["a"] <= min(row["r1"], row["c1"])
    assert row["k_terms"] <= min(row["r1"], row["c1"]) + 1


def test_harmonic_closeness_weights_are_exact(spark):
    """harmonic_micro must equal the exact integer combination of the
    hop counts — no float path exists to disagree with."""
    rows = queries()["graph_harmonic_closeness"](spark, SF_DIR).collect()
    assert rows and len(rows) <= 20
    for r in rows:
        assert (
            r["harmonic_micro"]
            == 1_000_000 * r["n1"] + 500_000 * r["n2"] + 333_333 * r["n3"]
        )
        assert r["n1"] > 0  # a top-degree hub has neighbors


def test_runs_test_counts_are_consistent(spark):
    """Run count is bounded by the sign count and at least 1; mu lives
    between 1 and n/2 + 1."""
    row = queries()["stat_runs_test"](spark, SF_DIR).collect()[0]
    n = row["n1"] + row["n2"]
    assert 1 <= row["r"] <= n
    assert 1_000_000 <= row["mu_micro"] <= (n // 2 + 1) * 1_000_000 + 1


def test_qq_deciles_monotone_per_group(spark):
    """Quantiles must be non-decreasing in q within each group — the
    basic property of any quantile function."""
    rows = queries()["stat_qq_deciles"](spark, SF_DIR).collect()
    assert [r["q"] for r in rows] == list(range(5, 100, 5))
    qa = [r["qa_cents"] for r in rows]
    qr = [r["qr_cents"] for r in rows]
    assert qa == sorted(qa) and qr == sorted(qr)
    for r in rows:
        assert r["diff_cents"] == r["qa_cents"] - r["qr_cents"]


def test_learning_curve_prefixes_nest(spark):
    """Training-set sizes must be non-decreasing in the fraction and
    the 100% prefix must contain every training vector; every fraction
    evaluates the same test batch."""
    rows = queries()["ml_learning_curve"](spark, SF_DIR).collect()
    assert [r["f_pct"] for r in rows] == [25, 50, 75, 100]
    sizes = [r["n_train"] for r in rows]
    assert sizes == sorted(sizes)
    assert len({r["n_test"] for r in rows}) == 1
    for r in rows:
        assert 0 <= r["n_correct"] <= r["n_test"]


def test_microaggregation_group_sizes_and_loss(spark):
    """Every group holds exactly k records except possibly the last
    (which holds n mod k, or k when n divides evenly); information loss
    of a sorted cut is a fraction of total SSE."""
    row = queries()["privacy_microaggregation"](spark, SF_DIR).collect()[0]
    k, n = row["k"], row["n"]
    assert row["n_groups"] == (n + k - 1) // k
    assert row["max_gn"] == k
    assert row["min_gn"] == (n % k if n % k else k)
    assert 0 <= row["info_loss_micro"] <= 1_000_000
    # sorted grouping is near-optimal: loss must be tiny vs random
    assert row["info_loss_micro"] < 100_000


def test_bipartite_weights_bounded_by_customer_overlap(spark):
    """Every projected edge weight >= 2 by the filter, and the pair is
    ordered pa < pb."""
    rows = queries()["graph_bipartite_projection"](spark, SF_DIR).collect()
    for r in rows:
        assert r["w"] >= 2
        assert r["pa"] < r["pb"]


def test_cointegration_outputs_are_finite(spark):
    """Gamma must be negative-leaning for a mean-reverting residual
    (OLS residuals are centered by construction) and the ADF t-stat
    must carry gamma's sign."""
    row = queries()["ts_cointegration_egr"](spark, SF_DIR).collect()[0]
    assert row["n_obs"] > 10
    assert (row["gamma_micro"] < 0) == (row["adf_t_micro"] < 0)


def test_threshold_sweep_confusion_identities(spark):
    """Every swept row's confusion cells must total n and be
    non-negative; cost must equal the declared linear combination."""
    from analyse_the_sky_with_apache_spark_spark.pipeline.stats import (
        _THR_FN_COST,
        _THR_FP_COST,
    )

    rows = queries()["ml_threshold_sweep"](spark, SF_DIR).collect()
    assert len(rows) == 10
    total = rows[0]["tp"] + rows[0]["fp"] + rows[0]["fn"] + rows[0]["tn"]
    costs = [r["cost"] for r in rows]
    assert costs == sorted(costs)
    for r in rows:
        assert min(r["tp"], r["fp"], r["fn"], r["tn"]) >= 0
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == total
        assert r["cost"] == _THR_FP_COST * r["fp"] + _THR_FN_COST * r["fn"]


def test_power_analysis_sample_size_sane(spark):
    """Required n per arm must be positive and shrink as the observed
    gap grows — here just pin positivity and the z/significance link."""
    row = queries()["stat_power_analysis"](spark, SF_DIR).collect()[0]
    assert row["n_per_arm_80pct"] >= 1
    assert row["significant_now"] == (abs(row["z_micro"]) > 1_959_964)


def test_additive_fit_seasonality_never_hurts(spark):
    """Adding the dow component can only reduce SSE, so R^2(full) >=
    R^2(trend); dow effects are one-per-dow over the day grid."""
    rows = queries()["ts_additive_model_fit"](spark, SF_DIR).collect()
    assert [r["dow"] for r in rows] == sorted({r["dow"] for r in rows})
    assert len(rows) <= 7
    r = rows[0]
    assert r["r2_full_micro"] >= r["r2_trend_micro"] - 1  # grid slack


def test_anderson_darling_matches_direct_row_rank_form(spark):
    """The histogram-collapsed A^2 must match a direct numpy evaluation
    of the classic row-rank formula on the same data (catches
    rank-weight algebra errors the oracle hash CANNOT catch, since both
    engines share the SQL formula)."""
    import numpy as np

    from analyse_the_sky_with_apache_spark_spark.catalog import load_table

    row = queries()["stat_anderson_darling"](spark, SF_DIR).collect()[0]
    cents = (
        load_table(spark, SF_DIR, "orders")
        .select(
            (
                F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
                .cast("long") % 100
            ).alias("x")
        )
        .toPandas()["x"]
        .to_numpy()
    )
    x = np.sort(cents)
    n = len(x)
    f = (x + 1.0) / 100.0
    i = np.arange(1, n + 1)
    fr = f[::-1]
    term2 = np.where(fr < 1.0, np.log(1.0 - fr), 0.0)
    a2 = -n - np.mean((2 * i - 1) * (np.log(f) + term2))
    assert abs(row["a2_micro"] - round(a2 * 1e6)) <= 2


def test_ljung_box_q_matches_rho_recombination(spark):
    """Q must equal n(n+2) * sum(rho_k^2/(n-k)) recomputed from the
    reported rhos (grid slack only) and every |rho| <= 1."""
    row = queries()["stat_ljung_box"](spark, SF_DIR).collect()[0]
    n = row["n"]
    q = 0.0
    for k in range(1, 6):
        rho = row[f"rho{k}_micro"] / 1e6
        assert abs(rho) <= 1.000001
        q += rho * rho / (n - k)
    q *= n * (n + 2)
    # rho grid slack amplifies by ~n(n+2)/(n-k): scale the tolerance
    assert abs(q * 1e6 - row["q_micro"]) < 10 * n
    assert row["autocorrelated"] == (row["q_micro"] > 11_070_000)


def test_jaro_winkler_python_matches_duckdb_builtin(spark):
    """The Arrow-batched kernel must agree with DuckDB's independent
    implementation pair-by-pair on real fixture keys (not just the
    top-50 the oracle hashes)."""
    import duckdb

    from analyse_the_sky_with_apache_spark_spark.pipeline.dedup import (
        _jaro_winkler_py,
    )

    con = duckdb.connect()
    pairs = con.execute(
        f"""
        WITH k AS (SELECT doc_id, substr(text, 1, 32) AS fkey,
                          substr(text, 1, 8) AS blk
                   FROM read_parquet('{SF_DIR}/documents.parquet'))
        SELECT a.fkey, b.fkey, jaro_winkler_similarity(a.fkey, b.fkey)
        FROM k a JOIN k b ON a.blk = b.blk AND a.doc_id < b.doc_id
        LIMIT 500
        """
    ).fetchall()
    assert pairs
    for fa, fb, duck in pairs:
        assert abs(_jaro_winkler_py(fa, fb) - duck) < 1e-12


def test_bayes_ab_matches_closed_form(spark):
    """The gridded midpoint integral must land within 1e-4 of the
    EXACT closed-form P(p1 > p2) for integer Beta posteriors — an
    independent identity the oracle hash cannot check (both engines
    share the grid)."""
    import math

    row = queries()["stat_bayes_ab_posterior"](spark, SF_DIR).collect()[0]
    a1, b1 = row["x1"] + 1, row["n1"] - row["x1"] + 1
    a2, b2 = row["x2"] + 1, row["n2"] - row["x2"] + 1

    def lbeta(a, b):
        return math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)

    p = 0.0
    for i in range(a1):
        p += math.exp(
            lbeta(a2 + i, b1 + b2)
            - math.log(b1 + i)
            - lbeta(1 + i, b1)
            - lbeta(a2, b2)
        )
    assert abs(row["prob_p1_gt_p2_micro"] - round(p * 1e6)) <= 100
    assert row["decisive"] == (row["prob_p1_gt_p2_micro"] > 950_000)


def test_sample_entropy_a_subset_of_b(spark):
    """Every 3-step template match is also a 2-step match, so A <= B
    and SampEn >= 0."""
    row = queries()["ts_sample_entropy"](spark, SF_DIR).collect()[0]
    assert 0 <= row["a"] <= row["b"]
    assert row["sampen_micro"] >= 0
    assert row["r"] > 0


def test_tost_consistency_with_power_counts(spark):
    """TOST and power analysis must agree on the underlying counts
    (same conditional aggregate), and TOST's two z's must straddle the
    margin: z_lower + z_upper = 2*margin/se > 0."""
    tost = queries()["stat_tost_equivalence"](spark, SF_DIR).collect()[0]
    power = queries()["stat_power_analysis"](spark, SF_DIR).collect()[0]
    assert (tost["n1"], tost["x1"], tost["n2"], tost["x2"]) == (
        power["n1"], power["x1"], power["n2"], power["x2"],
    )
    assert tost["z_lower_micro"] + tost["z_upper_micro"] > 0


def test_cuped_rho_bounds_and_ratio_identity(spark):
    """|rho| <= 1 and the variance ratio must equal 1 - rho^2 on the
    grid."""
    row = queries()["events_cuped_variance_reduction"](
        spark, SF_DIR
    ).collect()[0]
    rho = row["corr_micro"] / 1e6
    assert abs(rho) <= 1.000001
    assert abs(row["var_ratio_micro"] - round((1 - rho * rho) * 1e6)) <= 5
    assert row["n"] > 0


def test_stateful_timeout_emits_fewer_than_batch(spark):
    """Event-time-timeout sessionization must emit strictly fewer
    sessions than batch sessionization whenever any user's final
    session ends inside the gap+delay horizon — and every emitted
    session must be a genuine batch session (subset check)."""
    from pyspark.sql import Window as W

    from analyse_the_sky_with_apache_spark_spark.catalog import load_table
    from analyse_the_sky_with_apache_spark_spark.streaming.queries import (
        _SESS_GAP_MIN,
    )

    emitted = queries()["stream_stateful_timeout"](spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    w = W.partitionBy("user_id").orderBy("ts")
    brk = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            > _SESS_GAP_MIN * 60 * 1_000_000
        ),
        1,
    ).otherwise(0)
    sess = ev.select("user_id", "ts", brk.alias("brk")).select(
        "user_id", "ts",
        F.sum("brk").over(w.rowsBetween(W.unboundedPreceding, 0))
        .alias("sid"),
    )
    batch = (
        sess.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    )
    batch_set = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch
    }
    emitted_set = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in emitted
    }
    assert emitted_set <= batch_set
    assert len(emitted_set) < len(batch_set)


def test_katz_score_is_exact_integer_combination(spark):
    """katz_scaled must equal 100*w1 + 10*w2 + w3 exactly, walks must
    be monotone in horizon for any node with degree >= 1 on a graph
    with min degree >= 1 (each walk extends)."""
    rows = queries()["graph_katz_bounded"](spark, SF_DIR).collect()
    assert rows
    scores = [r["katz_scaled"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["katz_scaled"] == (
            100 * r["walks1"] + 10 * r["walks2"] + r["walks3"]
        )
        assert r["walks1"] <= r["walks2"] <= r["walks3"]


def test_rolling_slope_needs_full_window(spark):
    """Exactly |days| - 6 rows per event type (the first 6 days are
    suppressed), so no degenerate fits leak out."""
    rows = queries()["win_rolling_regression_slope"](spark, SF_DIR).collect()
    assert rows
    from collections import Counter

    per_type = Counter(r["event_type"] for r in rows)
    assert len(set(per_type.values())) == 1  # same day span per type


def test_woe_shares_and_iv_nonnegative(spark):
    """Good/bad totals reconcile with the lift-curve counts and IV is
    non-negative by construction (share-gap and WoE share a sign)."""
    rows = queries()["ml_woe_iv"](spark, SF_DIR).collect()
    assert [r["decile"] for r in rows] == list(range(10))
    assert len({r["iv_total_nano"] for r in rows}) == 1
    assert rows[0]["iv_total_nano"] >= 0
    lift = queries()["ml_lift_curve"](spark, SF_DIR).collect()
    assert sum(r["g"] + r["b"] for r in rows) == sum(r["n"] for r in lift)


def test_rich_club_membership_shrinks_with_k(spark):
    """Club size and internal edges are non-increasing in k, and
    phi is a density in [0, 1]."""
    rows = queries()["graph_rich_club"](spark, SF_DIR).collect()
    ns = [r["n_k"] for r in rows]
    es = [r["e_k"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert es == sorted(es, reverse=True)
    for r in rows:
        if r["phi_micro"] is not None:
            assert 0 <= r["phi_micro"] <= 1_000_000
            assert r["e_k"] <= r["n_k"] * (r["n_k"] - 1) // 2


def test_offset_false_rate_below_true(spark):
    """A +10-price offset kills genuine coincidence structure, so the
    offset count must sit well below the true count."""
    row = queries()["xmatch_offset_false_rate"](spark, SF_DIR).collect()[0]
    assert 0 < row["n_offset"] < row["n_true"]
    assert row["n_real_excess"] == row["n_true"] - row["n_offset"]
    assert 0 < row["false_rate_micro"] < 1_000_000


def test_cox_one_step_is_logrank_identity(spark):
    """beta = U/I and chi2 = z^2 must reconcile with the logrank
    outputs exactly (both read the same risk-set sums)."""
    cox = queries()["ml_cox_one_step"](spark, SF_DIR).collect()[0]
    lr = queries()["stat_logrank_test"](spark, SF_DIR).collect()[0]
    u = lr["o1_sum"] * 1_000_000 - lr["e1_micro_sum"]
    beta = u / lr["v_micro_sum"]
    assert abs(cox["beta_micro"] - int(beta * 1e6 + (0.5 if beta > 0 else -0.5))) <= 1
    # z^2 == logrank chi2 (same standardization)
    z = beta / (1.0 / (lr["v_micro_sum"] / 1e6) ** 0.5)
    assert abs(z * z - lr["chi2"]) < 1e-6 * max(1.0, lr["chi2"])
    assert cox["hr_ci_lo_micro"] <= cox["hazard_ratio_micro"] <= cox["hr_ci_hi_micro"]


def test_star_except_prunes_scan_schema(spark):
    """The excluded column must not appear in the result nor in the
    parquet ReadSchema (analysis-time pruning reaches the scan)."""
    df = queries()["sql_star_except"](spark, SF_DIR)
    assert "o_totalprice" not in df.columns
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "o_totalprice" not in plan.split("ReadSchema")[-1][:400]


def test_modality_router_sniff_roundtrip(spark):
    """Every framed payload must sniff back to its assigned modality
    (n_sniff_correct == n_docs per modality, no 'unknown' row)."""
    rows = queries()["mm_modality_router"](spark, SF_DIR).collect()
    mods = {r["modality"] for r in rows}
    assert mods == {"jpeg", "png", "wav"}
    for r in rows:
        assert r["n_sniff_correct"] == r["n_docs"]
        assert r["total_bytes"] > r["n_docs"] * 3  # header + content


def test_payload_dedup_wasted_bytes_accounting(spark):
    """wasted_bytes of an exact cluster is (copies-1) x payload size
    (identical payloads), and the survivor is the minimum doc id."""
    rows = queries()["mm_payload_dedup"](spark, SF_DIR).collect()
    for r in rows:
        assert r["n_copies"] >= 2
        assert r["wasted_bytes"] % (r["n_copies"] - 1) == 0


def test_backtest_methods_share_origins(spark):
    """All three methods evaluate the same origin set, and RMSE >= MAE
    (Jensen) for each."""
    rows = queries()["ts_forecast_backtest"](spark, SF_DIR).collect()
    assert {r["method"] for r in rows} == {"naive", "drift", "seasonal"}
    assert len({r["n_origins"] for r in rows}) == 1
    for r in rows:
        assert r["rmse_milli"] >= r["mae_milli"] - 1  # grid slack


def test_mcnemar_cells_partition_users(spark):
    """The four cells partition the paired-user universe; the statistic
    only exists when discordant pairs exist."""
    from analyse_the_sky_with_apache_spark_spark.catalog import load_table

    row = queries()["stat_mcnemar"](spark, SF_DIR).collect()[0]
    n_users = (
        load_table(spark, SF_DIR, "events")
        .select("user_id").distinct().count()
    )
    assert row["a"] + row["b"] + row["c"] + row["d"] == n_users
    if row["b"] + row["c"] > 0:
        assert row["chi2_micro"] is not None and row["chi2_micro"] >= 0
    else:
        assert row["chi2_micro"] is None


def test_poisson_rate_exposures_positive(spark):
    """Exposure hours on both sides of the cut must be positive and
    the rate ratio consistent with the reported counts/exposures."""
    row = queries()["events_poisson_rate_test"](spark, SF_DIR).collect()[0]
    assert row["t1"] > 0 and row["t2"] > 0
    rr = (row["x1"] / row["t1"]) / (row["x2"] / row["t2"])
    assert abs(row["rate_ratio_micro"] - round(rr * 1e6)) <= 1


def test_cochran_q_reduces_to_mcnemar_shape(spark):
    """Q with all-concordant rows dropped behaves like the paired
    family: per-week totals bounded by n, Q non-negative."""
    row = queries()["stat_cochran_q"](spark, SF_DIR).collect()[0]
    for j in range(1, 5):
        assert 0 <= row[f"g{j}"] <= row["n"]
    if row["q_micro"] is not None:
        assert row["q_micro"] >= 0


def test_dunn_pairs_cover_groups_and_antisymmetry(spark):
    """Exactly k(k-1)/2 ordered pairs; the z sign matches the rank-diff
    sign (same standardization for every pair)."""
    rows = queries()["stat_dunn_posthoc"](spark, SF_DIR).collect()
    assert len(rows) == 3  # 3 return flags
    for r in rows:
        assert r["grp_a"] < r["grp_b"]
        if r["rank_diff_milli"] != 0:
            assert (r["z_micro"] > 0) == (r["rank_diff_milli"] > 0)


def test_page_l_consistent_with_friedman_ranks(spark):
    """Page's L (2x-halved) must equal sum(j * Rj) recomputed from the
    Friedman rank sums in the same alphabetical treatment order."""
    fr = queries()["stat_friedman_test"](spark, SF_DIR).collect()
    page = queries()["stat_page_trend"](spark, SF_DIR).collect()[0]
    fr_sorted = sorted(fr, key=lambda r: r["event_type"])
    l2 = sum((j + 1) * r["rj2"] for j, r in enumerate(fr_sorted))
    assert page["page_l_x2_halved"] == l2 // 2
    assert page["k"] == len(fr_sorted)
