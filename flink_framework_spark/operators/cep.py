"""CEP-lite: ordered event-sequence matching (SURVEY.md §2 I8).

Flink ships a CEP library for pattern matching over keyed streams; the
batch-relational equivalent of its core ``A -> B -> C within T``
pattern is a chain of per-key interval joins, which is exactly what
``match_sequence`` builds — one equi-join per step, each shuffling on
the key only (no cross joins), so the plan scales like any other
fact-fact join chain. The 2-step special case is the funnel
(``q_funnel``); the streaming twin for arbitrary steps generalizes
``streaming.stateful.funnel_conversions`` (state = per-step pending
timestamps).

Combinatorial note: output is one row per complete match; callers
aggregate (count distinct keys, first match per key) rather than
materializing matches for hot keys.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def match_sequence(
    events: DataFrame,
    steps: Sequence[str],
    within: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """All complete matches of ``steps`` in order, with every step
    inside ``within`` of the FIRST step, per key.

    Returns: key column plus ``ts_0..ts_{n-1}`` and ``id_0..id_{n-1}``
    for the matched events (strictly increasing timestamps).
    """
    if len(steps) < 2:
        raise ValueError("a sequence pattern needs at least 2 steps")

    def step_df(i: int, step: str) -> DataFrame:
        return events.filter(F.col(type_col) == step).select(
            F.col(key_col).alias(f"__k{i}"),
            F.col(ts_col).alias(f"ts_{i}"),
            F.col(id_col).alias(f"id_{i}"),
        )

    cur = step_df(0, steps[0])
    horizon = F.expr(f"INTERVAL {within}")
    for i, step in enumerate(steps[1:], start=1):
        nxt = step_df(i, step)
        cur = cur.join(
            nxt,
            (F.col(f"__k{i}") == F.col("__k0"))
            & (F.col(f"ts_{i}") > F.col(f"ts_{i-1}"))
            & (F.col(f"ts_{i}") <= F.col("ts_0") + horizon),
        ).drop(f"__k{i}")
    return cur.withColumnRenamed("__k0", key_col)
