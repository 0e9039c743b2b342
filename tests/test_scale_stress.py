"""10× stress regression: the overflow class the small fixtures can't see.

Round 7's scaleup sweep caught two operators whose exact-integer
accumulators overflowed int64 only at ~10× bench scale
(`stat_spearman_corr` rank products, `ts_decompose_residuals` residual
moments — both now on the DECIMAL(38,0) lane). This test pins the fix:
it generates the replica fixture once per checkout (tools/scaleup.py,
~30 s, cached under .scale/) and runs the previously-overflowing keys
plus one representative per exact-sum family end-to-end at sf1.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from analyse_the_sky_with_apache_spark_spark.registry import queries

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SF1 = os.path.join(_REPO, ".scale", "sf1")

#: previously-overflowing keys + exact-sum representatives.
_KEYS = (
    "stat_spearman_corr",
    "ts_decompose_residuals",
    "ts_bollinger_bands",
    "ts_forecast_eval_naive",
    "agg_group_basic",
    "ts_max_drawdown",
)


@pytest.fixture(scope="session")
def sf1_dir():
    if not os.path.exists(os.path.join(_SF1, "lineitem.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(_REPO, "tools", "scaleup.py")],
            check=True,
            cwd=_REPO,
            capture_output=True,
        )
    return _SF1


@pytest.mark.parametrize("key", _KEYS)
def test_runs_at_10x(spark, sf1_dir, key):
    # collect(), NOT count(): count() lets Catalyst prune the very
    # aggregate expressions whose overflow this test exists to catch.
    rows = queries()[key](spark, sf1_dir).collect()
    assert rows, f"{key} returned no rows at the 10× fixture"
