"""Cross-engine-exact aggregation helpers.

Floating-point sums are order-dependent: Spark's partial/final aggregation
tree and DuckDB's aggregation associate additions differently, so
``SUM(double)`` can differ in the last ulps between engines — enough to
break an exact value-hash even after ``round()`` when the true value sits
near a rounding boundary (SURVEY.md §5.3 hazard 2).

The fix used engine-wide: **scaled-integer accumulation**. Per row,
``FLOOR(x * 10^s + 0.5)`` is deterministic IEEE arithmetic — both engines
evaluate the same multiply tree on the same double; the input carries ≤ s
decimal digits, so the scaled value sits within ulps of an integer and
never near a .5 boundary, making the +0.5/floor round-to-grid identical
everywhere (positive or negative). The integer SUM is exact in any
association order, and the final ``CAST(sum AS DOUBLE) / 10^s`` is a
single, identical division in both engines. Result: bit-identical
aggregates with no rounding hazard.

FLOOR, not ROUND: Spark's ROUND(double) routes through BigDecimal
HALF_UP (an allocation per value — measured 2.2× slower on the Q1
aggregate), while FLOOR is a JVM intrinsic that stays in primitive
codegen. ROUND would also be wrong-by-engine at exact .5 inputs; the
grid argument above is what makes floor+0.5 safe.

Why not DECIMAL: casting per-row to decimal(18,s) also works (and an
earlier revision did), but Spark promotes the sum buffer past 18 digits of
precision, off the long-backed fast path onto Int128/BigDecimal — measured
2.5× slower on the Q1 shape at sf0.1 (1.25 s vs 0.51 s). Long sums stay
inside whole-stage codegen as primitive arithmetic.

Scale bounds: the long accumulator is safe while
``n_rows × max|x| × 10^s < 2^63`` — for the largest fixture expression
(charge ≈ 1.2e5 × 10^6) that is ~7.6e13 rows, i.e. multi-petabyte
lineitem. Beyond that, or for hot skewed keys at 100 TB, use
:func:`dsum_wide` (decimal(38,s) accumulator — exact at any cardinality,
~2.5× slower) for the few money columns that need it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _scaled(col: Column | str, scale: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # F.floor on double already yields LongType in Spark
    return F.floor(c * F.lit(float(10**scale)) + F.lit(0.5))


def dsum(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Order-independent SUM(double) via exact scaled-long accumulation."""
    return (F.sum(_scaled(col, scale)).cast("double") / F.lit(float(10**scale))).alias(
        alias
    )


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent AVG(double): exact scaled sum / scale / count."""
    return (
        F.sum(_scaled(col, scale)).cast("double")
        / F.lit(float(10**scale))
        / F.count(F.lit(1))
    ).alias(alias)


def dsum_sql(expr: str, alias: str, scale: int = 4) -> str:
    """DuckDB-side twin of :func:`dsum` (same text works in Spark SQL)."""
    s = float(10**scale)
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {s} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {s} AS {alias}"
    )


def davg_sql(expr: str, alias: str, scale: int = 6) -> str:
    """DuckDB-side twin of :func:`davg`."""
    s = float(10**scale)
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {s} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {s} / COUNT(*) AS {alias}"
    )


def dsum_wide(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Exact SUM for cardinalities past the long accumulator's bound.

    decimal(38,s) accumulation — exact at any scale factor, but off the
    codegen'd primitive fast path (~2.5× slower). Reserve for the rare
    100-TB aggregate whose scaled sum could exceed 2^63.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double").alias(alias)
