"""Physical-plan inspection helpers.

Correctness checks prove the values; these prove the PLAN — that a filter
reached the parquet reader, a dimension broadcast, a top-k skipped the
global sort, a bucketed join needed no Exchange. They exist because the
properties that make a query viable at 100 TB are plan properties, not
result properties, and a refactor can silently lose one while every
value-hash stays green.

Used by tests/test_plan_shape.py; also handy interactively::

    from analyse_the_sky_with_apache_spark_spark.plans.checks import plan_of
    print(plan_of(df))
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_of(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (same output as ``df.explain(mode)``).

    Under AQE the pre-execution plan is provisional (``isFinalPlan=false``)
    — for codegen/exchange assertions, execute the DataFrame first and
    call this afterwards to see the final adaptive plan.
    """
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def has_node(df: DataFrame, node: str) -> bool:
    """True if the physical plan contains an operator whose name includes
    ``node`` (e.g. "BroadcastHashJoin", "TakeOrderedAndProject")."""
    return node in plan_of(df)


def pushed_filters(df: DataFrame) -> str:
    """The ``PushedFilters: [...]`` line of the scan, or '' if none."""
    for line in plan_of(df).splitlines():
        if "PushedFilters" in line:
            return line.strip()
    return ""


def read_schema(df: DataFrame) -> str:
    """The ``ReadSchema: ...`` line of the scan — what the reader will
    actually decode; columns absent here are pruned at the source."""
    for line in plan_of(df).splitlines():
        if "ReadSchema" in line:
            return line.strip()
    return ""


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle/broadcast-exchange) nodes in the plan —
    the scale-cost headline of any query."""
    return sum(
        1
        for line in plan_of(df).splitlines()
        if line.strip().startswith("(") and "Exchange" in line
    )
