"""A/B timing for selected keys with bench.py's exact methodology.

Warm session (one warm-up collect of agg_group_basic), then per key:
fresh DataFrame per rep, ``collect()`` timed, median of N reps
(default 5). Prints one JSON line compatible with bench.py's
``queries`` map so before/after numbers are directly comparable.

Usage: python tools/ab_bench.py KEY [KEY ...]
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_RUNS
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from analyse_the_sky_with_apache_spark_spark import registry  # noqa: E402
from analyse_the_sky_with_apache_spark_spark.session import get_spark  # noqa: E402


def main() -> int:
    keys = sys.argv[1:]
    if not keys:
        print("usage: ab_bench.py KEY [KEY ...]")
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    spark = get_spark("ab-bench")
    qs = registry.queries()
    qs["agg_group_basic"](spark, sf_dir).collect()  # warm-up
    per: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    for key in keys:
        fn = qs[key]
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(round(time.perf_counter() - t0, 4))
        per[key] = round(statistics.median(samples), 4)
        raw[key] = samples
        print(f"# {key}: median {per[key]}  reps {samples}", flush=True)
    print(json.dumps({"queries": per, "raw": raw, "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
