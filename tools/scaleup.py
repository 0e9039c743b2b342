"""Synthesize a larger scale factor from an existing fixture directory.

Replicates every big table K times with per-replica key OFFSETS chosen
so referential integrity survives (lineitem→orders→customer,
lineitem→part/supplier, events→users, embeddings→documents): replica r
shifts each table's keys by r·|table|. Dimension enums (nation, region)
copy through unshifted, so per-replica join selectivities and group
cardinalities match the source — groups simply get K× bigger, which is
exactly the shape a real scale-up has.

Usage:  python tools/scaleup.py [src_dir] [dst_dir] [K] [--perturb]
        (defaults: /root/testdata/sf0.1 → .scale/sf1, K=10)

The output is a THROWAWAY perf fixture (dedup/similarity queries will
legitimately find K× duplicates in it — content is replicated, only
keys shift); use it with bench.py via SPARK_GRAFT_SF_DIR to measure
scaling ratios, not semantic output.

``--perturb`` additionally mutates content per replica — a replica tag
appended to each document's text (n_chars adjusted) and a shifted
first embedding component — so the PAIR-SPACE families (dedup,
similarity, set-similarity joins) see realistic near-dup density
instead of K coincident copies of everything.
"""

from __future__ import annotations

import os
import sys

import duckdb

#: table → list of (column, offset_table) — each key column shifts by
#: r·|offset_table| in replica r.
_SHIFTS: dict[str, list[tuple[str, str]]] = {
    "customer": [("c_custkey", "customer")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "part": [("p_partkey", "part")],
    "supplier": [("s_suppkey", "supplier")],
    "events": [("event_id", "events"), ("user_id", "__users")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "documents")],
}
_COPY = ("nation", "region")


#: --perturb: per-replica content mutations keyed by replica index r.
_PERTURB = {
    "documents": {
        "text": "CASE WHEN r.r = 0 THEN text"
        " ELSE text || ' replica' || CAST(r.r AS VARCHAR) END",
        "n_chars": "CASE WHEN r.r = 0 THEN n_chars"
        " ELSE n_chars + 8 + len(CAST(r.r AS VARCHAR)) END",
    },
    "embeddings": {
        "embedding": "[embedding[1] + r.r * 0.01] || embedding[2:len(embedding)]",
    },
}


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--perturb"]
    perturb = "--perturb" in sys.argv
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    dst = args[1] if len(args) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale",
        "sf1",
    )
    k = int(args[2]) if len(args) > 2 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    counts = {
        t: con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{src}/{t}.parquet')"
        ).fetchone()[0]
        for t in _SHIFTS
    }
    # events.user_id references a user-id space, not |events|
    counts["__users"] = con.execute(
        f"SELECT MAX(user_id) + 1 FROM read_parquet('{src}/events.parquet')"
    ).fetchone()[0]

    for t in _COPY:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, shifts in _SHIFTS.items():
        cols = con.execute(
            f"SELECT * FROM read_parquet('{src}/{t}.parquet') LIMIT 0"
        ).df().columns
        shifted = {c: f"{c} + r.r * {counts[ot]}" for c, ot in shifts}
        if perturb:
            shifted.update(_PERTURB.get(t, {}))
        proj = ", ".join(shifted.get(c, c) + f" AS {c}" for c in cols)
        con.execute(
            f"COPY (SELECT {proj} "
            f"      FROM read_parquet('{src}/{t}.parquet'), "
            f"           range(0, {k}) r(r)) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: {counts.get(t, '?')} × {k}")
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
