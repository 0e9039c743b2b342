"""Fixture loaders.

Single choke-point for reading the test tables so every operator gets the
same schemas — in particular the ``events`` nanosecond-timestamp conversion
happens exactly once, here (SURVEY.md §1.1).

Scale note: loaders return *unmaterialized* scans. Predicate pushdown and
column pruning happen against the parquet source (verify with
``df.explain("formatted")`` → ``PushedFilters`` / ``ReadSchema``); at 100 TB
the same code reads a partitioned table and Catalyst prunes partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_confs

#: all fixture tables (TESTDATA.md + FIXTURES.md; documents/embeddings are
#: in scope even though TESTDATA.md's table list omits them).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: session → {(sf_dir, table) → lazy scan DataFrame}. A DataFrame is an
#: immutable logical plan, so reusing one across queries is safe and skips
#: the per-call footer read + analysis round-trip (~80 ms measured). The
#: outer key is a WEAK reference to the SparkSession: identity-keyed (so a
#: recycled id() can never alias a new session to a stopped session's
#: plans) but evicted when the host drops the session, so a long-lived
#: driver that cycles sessions doesn't pin every one for process life.
import weakref  # noqa: E402

_SCANS: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table, normalizing engine-hostile physical types.

    ``events.ts`` is parquet TIMESTAMP(NANOS); Spark 4 reads it only as
    BIGINT ns (legacy flag, set by ensure_confs). We convert with *integer*
    division — ``ts div 1000`` — not float division: epoch-ns ≈ 1.7e18
    exceeds double's 53-bit mantissa, so ``/1000`` would round-trip through
    an imprecise double and can be off by a microsecond vs DuckDB's exact
    truncation.

    ``ensure_confs`` runs on EVERY call (cache hit or not) — the session
    contract is that each registered query re-pins the runtime confs, so
    a host that flips e.g. the session timezone between queries can't
    silently diverge from the oracles.
    """
    ensure_confs(spark)
    per_session = _SCANS.setdefault(spark, {})
    key = (sf_dir, name)
    cached = per_session.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    per_session[key] = df
    return df


def fan_out(df: DataFrame, *cols: str) -> DataFrame:
    """Spread an under-split scan across the session's cores (guide §2.5).

    The local fixtures are single-row-group parquet files, so a scan is
    ONE input split and everything narrow below it (digest projections,
    explodes, Python batches, map-side partial aggregates) serializes
    into a single task; a repartition fixes that. But an UNCONDITIONAL
    ``repartition(defaultParallelism)`` is scale-unsafe (ADVICE r12):
    ``repartition(N)`` always shuffles every row it sees, and on a
    pre-split 100-TB scan (~10^5 input tasks) it would both add a
    full-data exchange and CAP the stage at N partitions — spill and
    lost parallelism, the opposite of its purpose. So fire only in the
    regime the fan-out was measured in: when the input arrives with
    fewer partitions than the session has cores.

    ``cols`` keeps a keyed fan-out keyed (a hash exchange a downstream
    window/groupBy on the same key can reuse); no cols → round-robin.
    The partition probe plans the subtree once (`.rdd` is lazy — no job
    runs); at these call sites the input is a scan + narrow projection,
    so the probe costs milliseconds of planning, not data.
    """
    try:
        spark = df.sparkSession
        target = int(spark.sparkContext.defaultParallelism)
        n = df.rdd.getNumPartitions()
    except Exception:  # Connect-style session: no sparkContext / .rdd
        return df
    if n >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table (lazy scans; nothing is materialized)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views for the ``spark.sql`` door."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
