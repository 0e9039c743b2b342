"""Behavioral pins for the round-8 rank/normality/serial-correlation
batch, beyond the oracle hashes: the classical rank-sum identities that
hold exactly when ranks are assigned correctly (so a tie-handling bug
fails a named assertion, not a hash), JB's platykurtic reading on the
uniform quantity column, and DW's [0, 4] range contract.
"""

from __future__ import annotations

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
