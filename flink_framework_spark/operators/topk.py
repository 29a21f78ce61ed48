"""Top-k per group — the Flink pattern of a keyed process function
holding a bounded heap (SURVEY.md §2 F2 [F]), expressed natively.

``row_number`` over a partitioned window + filter compiles to a
WindowExec after a single shuffle on the group keys; with AQE, skewed
groups are split. The ordering must be given a total order (append
tiebreak keys) for deterministic results — enforced here by taking an
explicit ordering list.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Keep the first k rows of each group under a total order."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("long"))
        .filter(F.col(rank_col) <= k)
    )
