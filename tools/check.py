"""Local mirror of the driver's correctness gate.

Runs every registered query through Spark AND its oracle SQL through
DuckDB at a given scale factor, then compares row count, column names and
order-insensitive values — the same contract the driver's t2 enforces.

Usage:  python tools/check.py [--vanilla] [sf_dir] [key ...]

``--vanilla`` runs against a bare ``SparkSession.builder`` session with
none of the engine's confs — exactly what the external driver builds —
so conf-dependence bugs surface here first.
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from analyse_the_sky_with_apache_spark_spark import registry  # noqa: E402
from analyse_the_sky_with_apache_spark_spark.catalog import TABLES  # noqa: E402
from analyse_the_sky_with_apache_spark_spark.session import get_spark  # noqa: E402


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact float equality is the target; repr makes diffs visible
        return repr(v)
    return repr(v)


def _norm_rows(cols, rows):
    """Sort columns by name, then rows — order-insensitive multiset form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main() -> int:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    if vanilla:
        args = [a for a in args if a != "--vanilla"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    if vanilla:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = registry.queries(), registry.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(s_rows)} rows (rows-only, {dt:.1f}s)")
            n_rows_only += 1
            continue
        try:
            rel = con.execute(oracles[name])
            d_cols = [c[0] for c in rel.description]
            d_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sc, sr = _norm_rows(s_cols, s_rows)
        dc, dr = _norm_rows(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL  {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL  {name}: rowcount spark={len(sr)} duck={len(dr)}")
            n_fail += 1
        elif sr != dr:
            diffs = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
            i = diffs[0]
            print(
                f"FAIL  {name}: {len(diffs)}/{len(sr)} rows differ; first @"
                f"{i}:\n  spark={sr[i]}\n  duck ={dr[i]}"
            )
            n_fail += 1
        else:
            print(f"ok    {name}: {len(sr)} rows match ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} FAIL")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
