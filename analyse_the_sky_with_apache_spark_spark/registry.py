"""Query/oracle registry — the driver-facing contract surface.

Every operator module registers its demonstration query here with::

    @register("agg_group_basic", oracle=\"\"\"SELECT ... \"\"\")
    def agg_group_basic(spark, sf_dir) -> DataFrame: ...

``oracle=None`` registers a rows-only query (non-SQL-expressible op; the
driver records a weaker check — SURVEY.md §2 legend).

Discipline enforced by convention (SURVEY.md §5.3):
- alias every computed column identically in Spark and SQL;
- round float aggregates in BOTH sides;
- fully tie-break every ordered/LIMIT query;
- cast date-like timestamps to date.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

#: modules that register queries; imported lazily by load_all_modules().
_MODULES = (
    "sources.scans",
    "operators.filters",
    "operators.joins",
    "operators.aggregations",
    "operators.windows",
    "operators.sorts",
    "operators.setops",
    "operators.xmatch",
    "operators.bucketing",
    "functions.scalar",
    "streaming.queries",
    "pipeline.dedup",
    "pipeline.similarity",
    "pipeline.text",
    "pipeline.multimodal",
    "pipeline.udfs",
    "pipeline.clustering",
)

_loaded = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all_modules() -> None:
    """Import every operator module exactly once, populating the registry."""
    global _loaded
    if _loaded:
        return
    pkg = __name__.rsplit(".", 1)[0]
    for mod in _MODULES:
        importlib.import_module(f"{pkg}.{mod}")
    _loaded = True


def queries() -> dict[str, QueryFn]:
    load_all_modules()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    load_all_modules()
    return dict(ORACLE)
