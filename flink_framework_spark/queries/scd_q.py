"""Temporal-table queries: SCD2 dimension build + point-in-time join.

The fixture's changelog is the purchase stream: each purchase
re-states its user's spend tier (a CASE over ``value``), so the
versioned dimension is "what tier was this user in, when" and the
temporal join asks "what tier was the user in at click time" — the
Flink temporal-table-join shape (SURVEY.md §2 C10 [F]) on the driver's
tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import fmt_ts
from flink_framework_spark.io import table
from flink_framework_spark.operators.scd import scd2_build, temporal_join
from flink_framework_spark.registry import register

_TIER = """CASE WHEN value >= 300 THEN 'gold'
              WHEN value >= 100 THEN 'silver'
              ELSE 'bronze' END"""

_VERSIONS_SQL = f"""
cl AS (
  SELECT user_id, ts, event_id, {_TIER} AS tier
  FROM events WHERE event_type = 'purchase'),
last_per_ts AS (
  SELECT user_id, ts, tier FROM (
    SELECT user_id, ts, tier,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS next_ts
    FROM cl) t
  WHERE next_ts IS NULL OR next_ts <> ts),
chg AS (
  SELECT user_id, ts, tier FROM (
    SELECT user_id, ts, tier,
           LAG(tier) OVER (PARTITION BY user_id ORDER BY ts) AS prev
    FROM last_per_ts) t
  WHERE prev IS NULL OR prev <> tier),
v AS (
  SELECT user_id, tier, ts AS valid_from,
         LEAD(ts) OVER w AS valid_to,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS version
  FROM chg WINDOW w AS (PARTITION BY user_id ORDER BY ts))
"""


def _tier_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("value") >= 300, "gold")
        .when(F.col("value") >= 100, "silver")
        .otherwise("bronze")
        .alias("tier"),
    )


def tier_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The versioned user-tier dimension (shared by both queries)."""
    return scd2_build(
        _tier_changelog(spark, sf_dir),
        key_cols=["user_id"],
        ts_col="ts",
        attr_cols=["tier"],
        seq_col="event_id",
    )


@register(
    "q_scd2_dim",
    family="C",
    oracle=f"""
WITH {_VERSIONS_SQL}
SELECT user_id, tier,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(valid_to, '%Y-%m-%d %H:%M:%S') AS valid_to,
       version, valid_to IS NULL AS is_current
FROM v
""",
)
def q_scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension build (`operators.scd.scd2_build`): the
    purchase changelog collapsed to user-tier versions — change
    compression (re-stated tiers open no version), half-open validity
    intervals tiling each user's timeline, 1-based version numbers.
    One shuffle end-to-end (plan-asserted in tests/test_scd.py)."""
    v = tier_versions(spark, sf_dir)
    return v.select(
        "user_id",
        "tier",
        fmt_ts("valid_from").alias("valid_from"),
        fmt_ts("valid_to").alias("valid_to"),
        "version",
        "is_current",
    )


@register(
    "q_temporal_join",
    family="C",
    oracle=f"""
WITH {_VERSIONS_SQL},
cl2 AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT c.event_id, c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       v.tier, v.version
FROM cl2 c ASOF JOIN v
  ON c.user_id = v.user_id AND c.ts >= v.valid_from
""",
)
def q_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment (`operators.scd.temporal_join`): each
    click gets the tier version valid at its timestamp. Because the
    dimension tiles each key's timeline, containment degenerates to an
    as-of join — one merge-style shuffle, no interval explosion
    (DuckDB spells the same thing ASOF JOIN)."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    dim = tier_versions(spark, sf_dir)
    out = temporal_join(clicks, dim, on=["user_id"], fact_ts="ts")
    return out.select(
        "event_id",
        "user_id",
        fmt_ts("ts").alias("ts"),
        "tier",
        "version",
    )
