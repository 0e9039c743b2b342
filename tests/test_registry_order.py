"""Driver-visibility ordering contract.

The rounds 1–5 drivers produced CORRECTNESS rows for exactly the first
50 keys of ``queries()`` in dict insertion order, so insertion order
decides which operators get externally verified each round. These tests
pin the live rotation page (``registry._PRIORITY``): 50 oracle-carrying
keys, none of which already has a green hash row from a *previous*
round, with every dark family represented.

Round-boundary hygiene (ADVICE r5 / VERDICT r5 defect 1): the repo
workflow commits round-N results BEFORE rotating ``_PRIORITY`` to the
round-N+1 page, so for a short interval a CORRECTNESS file exists whose
rows are exactly the current window's own results. Counting that file
made ``test_window_wastes_no_slot_on_green_keys`` go stale at every
round close. Fix: a CORRECTNESS file whose key set equals the current
``_PRIORITY`` window is the in-flight round's own output and is
excluded from the "already sampled/green" baseline.
"""

from __future__ import annotations

import glob
import json
import os

from analyse_the_sky_with_apache_spark_spark import registry


def _round_files() -> list[str]:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))


def _prior_rows() -> list[dict]:
    """Per-round row dicts, excluding the in-flight round's own file
    (identified by its key set matching the current window)."""
    window = set(registry._PRIORITY)
    out = []
    for path in _round_files():
        with open(path) as f:
            rows = json.load(f)
        if set(rows) == window:
            continue  # the current window's own results — not "prior"
        out.append(rows)
    return out


#: darkest families after r01–r05 (tools/driver_gap.py) — each must be
#: represented among the never-sampled window keys. The round-6 page is
#: drawn round-robin over ALL families, so this is a floor, not a spec.
_TARGET_FAMILIES = (
    "sources.scans",
    "operators.aggregations",
    "operators.windows",
    "operators.xmatch",
    "operators.graph",
    "pipeline.stats",
    "pipeline.corpus",
    "operators.warehouse",
    "pipeline.dedup",
    "pipeline.quality",
    "functions.scalar",
    "workloads2",
)


def _hash_green() -> set[str]:
    """Keys with a driver-recorded hash match from a prior round."""
    seen: set[str] = set()
    for rows in _prior_rows():
        seen.update(k for k, v in rows.items() if v.get("hash_match"))
    return seen


def _sampled() -> set[str]:
    """Keys with any prior-round CORRECTNESS row (green or rows-only)."""
    seen: set[str] = set()
    for rows in _prior_rows():
        seen.update(rows.keys())
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


#: Rows-only keys deliberately scheduled for driver visibility (VERDICT
#: r10 task 3): their driver rows will be ``no_oracle`` smoke rows by
#: design — the page/window oracle invariants exempt exactly these.
#: They sat in the round-12 window (CORRECTNESS_r12 carries their smoke
#: rows); the round-13 window is all-oracle.
_SCHEDULED_ROWS_ONLY = {
    "scan_parquet_footer_stats", "agg_hll_overlap", "agg_kll_quantiles",
    "ann_recall_eval",
}


def test_rotation_pages_exist_and_are_disjoint():
    """The committed retirement schedule (VERDICT r5 task 2): pages must
    name real registered keys — oracle-backed except the documented
    rows-only schedule — and never overlap the live window."""
    keys = set(registry.queries())
    osql = set(registry.oracle_sql())
    live = set(registry._PRIORITY)
    pages = (registry._ROTATION_R14,)
    for page in pages:
        missing = [k for k in page if k not in keys]
        assert not missing, f"rotation page names unknown keys: {missing}"
        no_oracle = [k for k in page
                     if k not in osql and k not in _SCHEDULED_ROWS_ONLY]
        assert not no_oracle, f"rotation page keys without oracle: {no_oracle}"
        assert not (set(page) & live), "rotation page overlaps live window"
    for i in range(len(pages)):
        for j in range(i + 1, len(pages)):
            assert not (set(pages[i]) & set(pages[j])), (i, j)


def test_rotation_pages_fit_the_driver_window():
    """A rotation page must never outgrow one 50-key driver window —
    when a page reaches 50, new keys must open the next page (the
    VERDICT r8 task-8 split discipline, made automatic)."""
    for name in ("_ROTATION_R14",):
        page = getattr(registry, name)
        assert len(page) <= 50, f"{name} holds {len(page)} keys — split it"


def test_every_oracle_key_is_scheduled():
    """Retirement-schedule completeness: every oracle-backed key is
    either already driver-sampled, in the live window, or on a future
    rotation page — so adding a key without scheduling it fails here,
    and no key can silently stay driver-invisible forever."""
    osql = set(registry.oracle_sql())
    covered = (
        _sampled()
        | set(registry._PRIORITY)
        | set(registry._ROTATION_R14)
    )
    unscheduled = sorted(osql - covered)
    assert not unscheduled, f"oracle keys missing from the schedule: {unscheduled}"


def test_window_is_all_oracle():
    """Every live-window key carries an oracle — except the four
    deliberately-scheduled rows-only keys (``_SCHEDULED_ROWS_ONLY``),
    whose driver rows are ``no_oracle`` smoke rows by design — so the
    round's CORRECTNESS file should be 46 hash rows + 4 smoke rows."""
    osql = set(registry.oracle_sql())
    missing = [k for k in registry._PRIORITY
               if k not in osql and k not in _SCHEDULED_ROWS_ONLY]
    assert not missing, f"window keys without an oracle: {missing}"


def test_window_wastes_no_slot_on_green_keys():
    """No window slot may re-sample a key that already has a
    driver-recorded hash match from a PRIOR round (the in-flight
    round's own file is excluded — see module docstring) — UNLESS the
    key is on the documented re-sample schedule
    (``registry._RESAMPLE_R13``): optimization-round rewrites and
    conf-affected keys must be re-verified by the driver even though
    an older implementation's row is green (VERDICT r12 items 1/4)."""
    allowed = set(registry._RESAMPLE_R13)
    wasted = [k for k in registry._PRIORITY
              if k in _hash_green() and k not in allowed]
    assert not wasted, f"already-green keys occupying the window: {wasted}"


def test_window_covers_the_dark_families():
    """Each target family with never-sampled keys REMAINING must be
    represented in the window; a family that is fully driver-sampled
    (e.g. workloads2 after r08) has no fresh key to schedule and is
    exempt — the floor can't demand what no page can supply."""
    qs = registry.queries()
    sampled = _sampled()

    def fam(k: str) -> str:
        return qs[k].__module__.split(
            "analyse_the_sky_with_apache_spark_spark.")[-1]

    still_dark = {fam(k) for k in qs if k not in sampled}
    fresh_mods = {fam(k) for k in registry._PRIORITY if k not in sampled}
    missing = [f for f in _TARGET_FAMILIES
               if f in still_dark and f not in fresh_mods]
    assert not missing, f"dark families absent from the window: {missing}"


def test_oracle_dict_order_matches_queries():
    q = list(registry.queries())
    o = list(registry.oracle_sql())
    assert o == [k for k in q if k in set(o)]


def test_readme_headline_counts_match_registry():
    """README.md's headline counts are generated claims (VERDICT r5
    defect 2) — they must track the live registry exactly."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "README.md")) as f:
        head = f.read(2000)
    n_q, n_o = len(registry.queries()), len(registry.oracle_sql())
    assert f"{n_q} registered operators, {n_o} of them hash-verified" in head, (
        f"README headline stale: registry is {n_q} registered / {n_o} oracle-checked"
    )
