"""Physical-plan inspection: the engine's guardrails for 100 TB scale.

The reference executes the user's operator graph verbatim (no
optimizer — SURVEY.md §4.1); this engine leans on Catalyst, so its
scale posture is only as good as the plans Catalyst actually picks.
These helpers turn `.explain("formatted")` into assertable facts:

- filters/columns reach the parquet scan (PushedFilters / ReadSchema),
- small dimensions broadcast (BroadcastHashJoin),
- an operator's shuffle count matches its design (count_exchanges).

tests/test_plans.py pins these properties per flagship operator, so a
regression that silently de-optimizes a plan (e.g. a UDF blocking
pushdown) fails CI instead of melting a cluster later.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (works on classic
    sessions via the JVM handle, falls back to capturing
    df.explain for Spark Connect)."""
    try:
        return df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    except Exception:  # pragma: no cover - Connect sessions
        import contextlib
        import io as _io

        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema (projected columns) of each file scan in the plan."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges (excluding broadcast exchanges) in
    the final physical plan — the scale-defining cost of an operator."""
    plan = formatted_plan(df)
    return len(re.findall(r"Arguments: (?:hash|range)partitioning", plan))
