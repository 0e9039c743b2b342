"""Refresh captured physical plans in PLANS.md for the given keys.

Re-executes each key at sf0.1 (so AQE finalizes) and replaces the
fenced plan block under its ``## `key` `` section, leaving the
hand-written **Scale property** line untouched.

Usage: python tools/plans_refresh.py KEY [KEY ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyse_the_sky_with_apache_spark_spark import registry  # noqa: E402
from analyse_the_sky_with_apache_spark_spark.plans.checks import plan_of  # noqa: E402
from analyse_the_sky_with_apache_spark_spark.session import get_spark  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SF = "/root/testdata/sf0.1"


def main() -> int:
    keys = sys.argv[1:]
    if not keys:
        print("usage: plans_refresh.py KEY [KEY ...]")
        return 2
    spark = get_spark("plans")
    path = os.path.join(_REPO, "PLANS.md")
    with open(path) as f:
        text = f.read()
    qs = registry.queries()
    for key in keys:
        df = qs[key](spark, _SF)
        df.collect()  # finalize AQE
        plan = plan_of(df).rstrip()
        pat = re.compile(
            r"(## `" + re.escape(key) + r"`\n(?:.*?\n)*?)```\n.*?\n```",
            re.DOTALL,
        )
        if not pat.search(text):
            print(f"SKIP {key}: no section in PLANS.md")
            continue
        text = pat.sub(lambda m: m.group(1) + "```\n" + plan + "\n```", text, count=1)
        print(f"refreshed {key}")
    with open(path, "w") as f:
        f.write(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
