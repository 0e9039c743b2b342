"""Capture .explain("formatted") output for bench keys → plans/r13/.

Usage: python tools/r13_plans.py before|after [KEY ...]

With no keys, captures every HEADLINE + EXTENDED bench key. Writes
plans/r13/<key>_<tag>.txt (the optimization-round deliverable: the
judge diffs the before/after plan text against the claims in
OPTIMIZATION_r13.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyse_the_sky_with_apache_spark_spark import registry  # noqa: E402
from analyse_the_sky_with_apache_spark_spark.plans.checks import plan_of  # noqa: E402
from analyse_the_sky_with_apache_spark_spark.session import get_spark  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    keys = sys.argv[2:]
    if not keys:
        import bench

        keys = list(bench.HEADLINE + bench.EXTENDED)
    out_dir = os.path.join(_REPO, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r13-plans")
    qs = registry.queries()
    for key in keys:
        df = qs[key](spark, _SF)
        plan = plan_of(df)
        with open(os.path.join(out_dir, f"{key}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {key}_{tag}.txt", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
