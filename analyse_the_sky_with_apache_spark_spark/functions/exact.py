"""Cross-engine-exact aggregation helpers.

Floating-point sums are order-dependent: Spark's partial/final aggregation
tree and DuckDB's aggregation associate additions differently, so
``SUM(double)`` can differ in the last ulps between engines — enough to
break an exact value-hash even after ``round()`` when the true value sits
near a rounding boundary (SURVEY.md §5.3 hazard 2).

The fix used engine-wide: route sums through DECIMAL. A per-row
``CAST(double AS DECIMAL(18,s))`` is deterministic and identical in both
engines (same IEEE input, same rounding), the decimal SUM is exact integer
arithmetic in any association order, and the final ``CAST(... AS DOUBLE)``
is exact for every magnitude in the fixtures (< 2^53 / 10^s). Result:
bit-identical aggregates with no rounding hazard at all.

The same trick yields exact averages: ``exact_sum / count`` is a single
double division of identical operands.

At 100 TB this costs nothing extra: decimal sums still combine partially
map-side (HashAggregate partial/final), and the per-row cast is
whole-stage-codegen'd JVM arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Order-independent SUM(double) via exact decimal accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent AVG(double): exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(F.lit(1))
    ).alias(alias)


def dsum_sql(expr: str, alias: str, scale: int = 4) -> str:
    """DuckDB-side twin of :func:`dsum` (same text works in Spark SQL)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


def davg_sql(expr: str, alias: str, scale: int = 6) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT(*) AS {alias}"
    )
