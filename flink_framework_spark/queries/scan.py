"""A. Sources: parquet scan surface (SURVEY.md §2 A1).

The reference's sources are generated Kafka consumers per subject
([R]); the batch-checkable equivalent is the parquet scan. Counting
every table proves the whole lake loads with stable schemas; the scan
itself is the piece Catalyst pushes filters/projections into.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_framework_spark.io import TABLES, table
from flink_framework_spark.registry import register

_ORACLE = """
SELECT 'region' AS tbl, COUNT(*) AS n FROM region
UNION ALL SELECT 'nation', COUNT(*) FROM nation
UNION ALL SELECT 'customer', COUNT(*) FROM customer
UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
UNION ALL SELECT 'part', COUNT(*) FROM part
UNION ALL SELECT 'orders', COUNT(*) FROM orders
UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
UNION ALL SELECT 'events', COUNT(*) FROM events
UNION ALL SELECT 'documents', COUNT(*) FROM documents
UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings
"""


@register("q_scan_counts", oracle=_ORACLE, family="A")
def q_scan_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row count of every table in the lake (scan smoke for all sources)."""
    parts = [
        table(spark, sf_dir, t)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(t).alias("tbl"), "n")
        for t in TABLES
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)
