"""As-of (nearest-earlier) join — a library operator Spark SQL lacks.

Semantics: for every left row, attach values from the latest right row
with the same key whose timestamp is <= the left timestamp (backward
as-of, DuckDB's ``ASOF JOIN`` / pandas ``merge_asof`` default).

Implementation is the union + last-over-window rewrite, chosen over a
range-join for scale:

- a range join (``l.ts >= r.ts``) is a BroadcastNestedLoop / O(n·m)
  unless banded, and banding needs a priori gap bounds;
- this rewrite is ONE shuffle (hash by key) + ONE sort per partition
  (ts) — exactly the cost of a sort-merge join, with no blowup on skewed
  keys, and it streams: no per-key state beyond the running last value.

At 100 TB both sides shuffle once on the key; AQE handles skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: dict[str, str] | None = None,
) -> DataFrame:
    """Backward as-of join. ``right_values`` maps output-name -> right col
    (default: {"<right_ts>_asof": right_ts}).

    Tie rule: a right row with timestamp exactly equal to the left row's
    timestamp IS matched (right rows sort before left rows at equal ts).
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_values = right_values or {f"{right_ts}_asof": right_ts}

    left_payload = [c for c in left.columns if c not in keys and c != left_ts]

    # the right payload travels as ONE struct column: last(ignorenulls)
    # then picks one whole right ROW (the struct is non-null for every
    # right row even when individual fields are NULL), so a left row can
    # never be filled with a field mix from different duplicate right
    # rows — the row-integrity guarantee ASOF joins promise.
    rv_struct = F.struct(
        *[F.col(src).alias(out) for out, src in right_values.items()]
    )
    l_side = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        *[F.col(c) for c in left_payload],
        F.lit(None)
        .cast(
            "struct<"
            + ", ".join(
                f"{out}: {right.schema[src].dataType.simpleString()}"
                for out, src in right_values.items()
            )
            + ">"
        )
        .alias("__rv"),
        F.lit(1).alias("__is_left"),
    )
    r_side = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        rv_struct.alias("__rv"),
        F.lit(0).alias("__is_left"),
    )

    # right rows first at equal ts => "<=" semantics; the trailing struct
    # column breaks ties between DUPLICATE right rows at the same
    # (key, ts) by field-lexicographic order — deterministic under any
    # shuffle order. Left rows carry a NULL struct and never win the fill.
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__is_left", "__rv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last("__rv", ignorenulls=True).over(w).alias("__rv_filled")
    return (
        l_side.unionByName(r_side)
        .select(*keys, "__ts", *left_payload, filled, "__is_left")
        .filter(F.col("__is_left") == 1)
        .select(
            *keys,
            F.col("__ts").alias(left_ts),
            *left_payload,
            *[F.col(f"__rv_filled.{out}").alias(out) for out in right_values],
        )
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: dict[str, str] | None = None,
) -> DataFrame:
    """Forward as-of join: attach the EARLIEST right row with
    ``right.ts >= left.ts`` per key (pandas ``merge_asof
    direction='forward'``). Same one-shuffle union+window kernel as
    :func:`asof_join`, mirrored: left rows sort BEFORE right rows at
    equal ts (inclusive match), the frame looks FORWARD
    (current → unbounded following), and ``first(ignorenulls)`` picks
    the nearest-later right struct. Ties between duplicate right rows at
    the same (key, ts) break field-lexicographically via the struct —
    deterministic under any shuffle order.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_values = right_values or {f"{right_ts}_asof": right_ts}
    left_payload = [c for c in left.columns if c not in keys and c != left_ts]

    rv_struct = F.struct(
        *[F.col(src).alias(out) for out, src in right_values.items()]
    )
    rv_type = (
        "struct<"
        + ", ".join(
            f"{out}: {right.schema[src].dataType.simpleString()}"
            for out, src in right_values.items()
        )
        + ">"
    )
    l_side = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(rv_type).alias("__rv"),
        F.lit(0).alias("__is_right"),
    )
    r_side = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        rv_struct.alias("__rv"),
        F.lit(1).alias("__is_right"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__is_right", "__rv")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    filled = F.first("__rv", ignorenulls=True).over(w).alias("__rv_filled")
    return (
        l_side.unionByName(r_side)
        .select(*keys, "__ts", *left_payload, filled, "__is_right")
        .filter(F.col("__is_right") == 0)
        .select(
            *keys,
            F.col("__ts").alias(left_ts),
            *left_payload,
            *[F.col(f"__rv_filled.{out}").alias(out) for out in right_values],
        )
    )
