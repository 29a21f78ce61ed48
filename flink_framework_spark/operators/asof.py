"""As-of join: for each left row, the latest right row at-or-before it.

The reference world builds this with keyed state in a process function
(Flink ``KeyedProcessFunction`` buffering the right stream; SURVEY.md
§2 C10 [F]); DuckDB spells it ``ASOF JOIN``. Spark has no native batch
as-of join, so we compose one from native operators with a
*merge-style* plan rather than the naive O(L×R) candidate join:

1. tag both inputs and union them (cheap, no shuffle yet),
2. single shuffle+sort by ``(keys, time, side)``,
3. ``last(right_payload, ignorenulls=True)`` over the running window
   picks, for every left row, the most recent right row with
   ``right.time <= left.time`` (right sorts before left on ties, so
   the bound is inclusive, matching DuckDB ``ON l.t >= r.t``).

Cost at scale: ONE shuffle of |L|+|R| rows plus a per-partition sort —
the same asymptotics as a sort-merge join, with no pair blow-up, no
skew amplification beyond the key distribution itself, and it stays
entirely in whole-stage codegen (no UDFs).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_tiebreak: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to the latest right row with
    ``right[right_time] <= left[left_time]``, per ``on`` key group.

    Returns the left columns plus the right columns (right's key/time
    columns are dropped; remaining right columns keep their names —
    they must not collide with left column names).

    ``right_tiebreak``: column ordering right rows that share a
    timestamp (the later one under this ordering wins). ``how`` is
    ``inner`` (drop unmatched left rows) or ``left``.
    """
    keys = list(on)
    # left_time is restored from the merged __t column; keeping it in
    # the payload too would emit a duplicate (ambiguous) column.
    lpayload = [c for c in left.columns if c not in keys and c != left_time]
    rpayload = [c for c in right.columns if c not in keys and c != right_time]
    if right_tiebreak is not None and right_tiebreak not in rpayload:
        rpayload.append(right_tiebreak)

    lhs = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in lpayload]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in rpayload]).alias("s"))
            .schema["s"]
            .dataType
        ).alias("__r"),
    )
    rhs = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lpayload]).alias("s"))
            .schema["s"]
            .dataType
        ).alias("__l"),
        F.struct(*[F.col(c) for c in rpayload]).alias("__r"),
    )

    order = [F.col("__t"), F.col("__side")]
    if right_tiebreak is not None:
        order.append(F.col(f"__r.{right_tiebreak}"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    merged = lhs.unionByName(rhs).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__side") == 1).select(
        *keys,
        F.col("__t").alias(left_time),
        *[F.col(f"__l.{c}").alias(c) for c in lpayload],
        *[F.col(f"__match.{c}").alias(c) for c in rpayload],
        F.col("__match").isNotNull().alias("__matched"),
    )
    if how == "inner":
        out = out.filter(F.col("__matched"))
    return out.drop("__matched")
