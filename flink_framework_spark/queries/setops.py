"""G. Set operations — Flink's native ``union`` plus the CoGroup-built
distinct set ops (SURVEY.md §2 G1-G4 [F])."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.registry import register


@register(
    "q_union_all",
    family="G",
    oracle="""
SELECT 'click' AS src, event_id FROM events WHERE event_type = 'click'
UNION ALL
SELECT 'purchase' AS src, event_id FROM events WHERE event_type = 'purchase'
""",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no shuffle)."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit("click").alias("src"), "event_id"
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.lit("purchase").alias("src"), "event_id"
    )
    return clicks.unionByName(buys)


@register(
    "q_union_distinct",
    family="G",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'view'
UNION
SELECT user_id FROM events WHERE event_type = 'click'
""",
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    return views.unionByName(clicks).distinct()


@register(
    "q_intersect",
    family="G",
    oracle="""
SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
""",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    ev = table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


@register(
    "q_except",
    family="G",
    oracle="""
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 150
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND value > 150
""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT. The value>150 predicate keeps it non-degenerate (every
    user has every event type in the fixtures — SURVEY.md §5.3)."""
    ev = table(spark, sf_dir, "events")
    a = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 150)).select(
        "user_id"
    )
    b = ev.filter((F.col("event_type") == "error") & (F.col("value") > 150)).select(
        "user_id"
    )
    return a.subtract(b)
