"""Per-key wall-clock sweep (Spark side only, no oracle).

Runs every registry key once, fresh-DataFrame (see stat_bootstrap_ci's
AQE stage-reuse note — timings on a reused DataFrame are fiction),
against the given sf dir and prints a sorted table. Used to spot
operators whose cost is dominated by the single-input-split map stage
(SCALE.md round-8) or that regressed since the last sweep.

Usage: python tools/timing_sweep.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyse_the_sky_with_apache_spark_spark import registry  # noqa: E402
from analyse_the_sky_with_apache_spark_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("sweep")
    qs = registry.queries()
    times: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            # noop sink, not count(): count() lets Spark prune output
            # columns, under-measuring operators whose cost is in the
            # final projection (e.g. dedup_substring_cut's text_clean
            # assembly). The noop format materializes every column
            # JVM-side with zero write cost.
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001
            times[name] = -1.0
            print(f"ERR  {name}: {type(e).__name__}: {e}", flush=True)
    for name, dt in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"{dt:9.3f}  {name}")
    if out:
        with open(out, "w") as f:
            json.dump(times, f, indent=1, sort_keys=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
