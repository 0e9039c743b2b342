"""Driver-visibility ordering contract.

The rounds 1–4 drivers produced CORRECTNESS rows for exactly the first
50 keys of ``queries()`` in dict insertion order, so insertion order
decides which operators get externally verified each round. These tests
pin the round-5 window: 50 oracle-carrying keys, none of which already
has a green hash row from an earlier round (re-sampling a key that was
previously ``no_oracle`` is allowed — that's how a rows-only→oracle
promotion gets its driver-recorded hash row), with every dark family
still ≥10 keys deep after r01–r04 represented.
"""

from __future__ import annotations

import glob
import json
import os

from analyse_the_sky_with_apache_spark_spark import registry

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ROUNDS = tuple(
    sorted(os.path.basename(p) for p in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")))
)

#: darkest families after r01–r04 (tools/driver_gap.py) — each must be
#: represented among the never-sampled round-5 window keys.
_TARGET_FAMILIES = (
    "sources.scans",
    "operators.windows",
    "operators.xmatch",
    "operators.graph",
    "pipeline.stats",
    "workloads2",
    "operators.warehouse",
    "pipeline.dedup",
    "pipeline.quality",
    "functions.scalar",
)


def _hash_green() -> set[str]:
    """Keys that already have a driver-recorded hash match."""
    seen: set[str] = set()
    for fname in _ROUNDS:
        with open(os.path.join(_REPO, fname)) as f:
            rows = json.load(f)
        seen.update(k for k, v in rows.items() if v.get("hash_match"))
    return seen


def _sampled() -> set[str]:
    """Keys with any CORRECTNESS row so far (green or rows-only)."""
    seen: set[str] = set()
    for fname in _ROUNDS:
        with open(os.path.join(_REPO, fname)) as f:
            seen.update(json.load(f).keys())
    return seen


def test_priority_keys_lead_the_registry():
    keys = list(registry.queries())
    assert tuple(keys[: len(registry._PRIORITY)]) == registry._PRIORITY


def test_priority_is_exactly_the_driver_window():
    assert len(registry._PRIORITY) == 50


def test_every_priority_key_exists():
    keys = set(registry.queries())
    missing = [k for k in registry._PRIORITY if k not in keys]
    assert not missing, f"priority names unknown keys: {missing}"


def test_window_is_all_oracle():
    """Every round-4 window key carries an oracle, so CORRECTNESS_r04
    should be 50 hash rows and 0 ``no_oracle`` rows."""
    osql = set(registry.oracle_sql())
    missing = [k for k in registry._PRIORITY if k not in osql]
    assert not missing, f"window keys without an oracle: {missing}"


def test_window_wastes_no_slot_on_green_keys():
    """No window slot may re-sample a key that already has a
    driver-recorded hash match from rounds 1–3."""
    wasted = [k for k in registry._PRIORITY if k in _hash_green()]
    assert not wasted, f"already-green keys occupying the window: {wasted}"


def test_window_covers_the_dark_families():
    """VERDICT round-3 task 1: windows/aggregations/warehouse/stats/
    workloads families must be represented among the never-sampled
    window keys."""
    qs = registry.queries()
    sampled = _sampled()
    fresh_mods = {
        qs[k].__module__.split("analyse_the_sky_with_apache_spark_spark.")[-1]
        for k in registry._PRIORITY
        if k not in sampled
    }
    missing = [f for f in _TARGET_FAMILIES if f not in fresh_mods]
    assert not missing, f"dark families absent from the window: {missing}"


def test_oracle_dict_order_matches_queries():
    q = list(registry.queries())
    o = list(registry.oracle_sql())
    assert o == [k for k in q if k in set(o)]
