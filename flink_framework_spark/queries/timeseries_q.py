"""Time-series queries (hypertable surface beyond the hierarchical
rollup): gap-filled dense spines with LOCF interpolation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_framework_spark.functions.helpers import fmt_ts
from flink_framework_spark.io import table
from flink_framework_spark.operators.timeseries import gap_fill_locf
from flink_framework_spark.registry import register


@register(
    "q_gapfill_locf",
    family="K",
    oracle="""
WITH b AS (
  SELECT event_type AS series, date_trunc('hour', ts) AS bucket,
         COUNT(*) AS n_events, AVG(value) AS avg_v
  FROM events GROUP BY 1, 2),
bounds AS (SELECT MIN(bucket) AS mn, MAX(bucket) AS mx FROM b),
spine AS (
  SELECT s.series, g.bucket
  FROM (SELECT DISTINCT series FROM b) s
  CROSS JOIN (SELECT UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR))
              AS bucket FROM bounds) g)
SELECT s.series,
       strftime(s.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
       COALESCE(b.n_events, 0) AS n_events,
       ROUND(LAST_VALUE(b.avg_v IGNORE NULLS) OVER (
         PARTITION BY s.series ORDER BY s.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
         AS avg_value,
       b.avg_v IS NULL AS is_gap
FROM spine s
LEFT JOIN b ON b.series = s.series AND b.bucket = s.bucket
""",
)
def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB ``time_bucket_gapfill + locf`` shape: densify each
    event-type series to every hour between the global bounds (the
    fixture has ~45 missing hours per series out of 720), carrying the
    last observed hourly average forward into the gaps. Spine bounds
    derive from a one-row aggregate — no driver collect; see
    ``operators.timeseries`` for the scale notes."""
    out = gap_fill_locf(table(spark, sf_dir, "events"))
    return out.withColumn("bucket", fmt_ts("bucket"))
