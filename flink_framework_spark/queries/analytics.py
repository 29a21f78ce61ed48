"""Product/behavioral analytics queries: histograms, cohort
retention, Markov event transitions, and a recursive-CTE hierarchy
rollup (Spark 4's ``WITH RECURSIVE``).

All four are pure Catalyst plans (no Python in the hot path). The
recursive CTE executes as Spark's iterative UnionLoop — each step is
a distributed equi-join, and the number of steps is the hierarchy
depth (logarithmic in table size for the balanced tree here), so the
shape survives a 100 TB scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import round_duck
from flink_framework_spark.io import table
from flink_framework_spark.registry import register


@register(
    "q_histogram",
    family="D",
    oracle="""
WITH w AS (
  SELECT 'width' AS method,
         CASE WHEN o_totalprice >= 600000 THEN 13
              WHEN o_totalprice < 0 THEN 0
              ELSE CAST(FLOOR(o_totalprice / 50000) AS BIGINT) + 1 END AS bucket,
         o_totalprice AS v
  FROM orders
  UNION ALL
  SELECT 'magnitude' AS method,
         LENGTH(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR)) AS bucket,
         o_totalprice AS v
  FROM orders)
SELECT method, bucket, COUNT(*) AS n_orders,
       MIN(v) AS lo, MAX(v) AS hi
FROM w GROUP BY method, bucket
""",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two order-value histograms in one tagged melt: equi-width via
    ``width_bucket`` (12 buckets of 50k over [0, 600k)) and an
    order-of-magnitude histogram keyed by integer digit count (exact
    integer logic on both engines — no float ``log10`` boundary
    hazard). Narrow map + one hash aggregate; DuckDB lacks
    ``width_bucket`` so the oracle spells out the same arithmetic."""
    orders = table(spark, sf_dir, "orders")
    width = orders.select(
        F.lit("width").alias("method"),
        F.expr("width_bucket(o_totalprice, 0, 600000, 12)")
        .cast("long")
        .alias("bucket"),
        F.col("o_totalprice").alias("v"),
    )
    magnitude = orders.select(
        F.lit("magnitude").alias("method"),
        F.length(F.floor("o_totalprice").cast("long").cast("string"))
        .cast("long")
        .alias("bucket"),
        F.col("o_totalprice").alias("v"),
    )
    return (
        width.unionAll(magnitude)
        .groupBy("method", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )


@register(
    "q_retention",
    family="K",
    oracle="""
WITH p AS (
  SELECT user_id, date_trunc('week', ts) AS wk
  FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, MIN(wk) AS cohort FROM p GROUP BY user_id),
s AS (SELECT cohort, COUNT(*) AS cohort_size FROM c GROUP BY cohort),
a AS (
  SELECT DISTINCT p.user_id, c.cohort,
         CAST(date_diff('week', c.cohort, p.wk) AS BIGINT) AS week_offset
  FROM p JOIN c ON p.user_id = c.user_id)
SELECT strftime(a.cohort, '%Y-%m-%d') AS cohort_week,
       a.week_offset,
       COUNT(*) AS n_active,
       ROUND(COUNT(*) * 1.0 / MAX(s.cohort_size), 4) AS retention
FROM a JOIN s ON s.cohort = a.cohort
GROUP BY a.cohort, a.week_offset
""",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention on purchase events: cohort = the week
    of a user's first purchase; a cohort-week cell counts users from
    that cohort who purchased ``week_offset`` weeks later. Three hash
    aggregates and two equi-joins on (user_id | cohort) — the cohort
    dimension is tiny (weeks), so the size join broadcasts."""
    p = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.date_trunc("week", "ts").alias("wk"))
    )
    c = p.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    s = c.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    a = (
        p.join(c, "user_id")
        .select(
            "user_id",
            "cohort",
            (F.datediff("wk", "cohort") / 7).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return (
        a.join(F.broadcast(s), "cohort")
        .groupBy("cohort", "week_offset")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            round_duck(F.count(F.lit(1)) * 1.0 / F.max("cohort_size"), 4).alias(
                "retention"
            ),
        )
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "retention",
        )
    )


@register(
    "q_event_transitions",
    family="K",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events)
SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n,
       ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY prev), 4) AS p
FROM s WHERE prev IS NOT NULL
GROUP BY prev, event_type
""",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: ``lag`` within each user's timeline, then a (from, to)
    count with row-normalized probabilities. The lag window is
    partitioned by user (distributed); the normalizing window runs on
    the ≤|event_types|² aggregate, which is tiny at any scale.
    Ordering is deterministic: the fixture has no (user_id, ts)
    duplicates."""
    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts"))
        .alias("prev"),
    ).filter(F.col("prev").isNotNull())
    counts = s.groupBy(
        F.col("prev").alias("from_type"), F.col("event_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    norm = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        round_duck(F.col("n") * 1.0 / F.sum("n").over(norm), 4).alias("p"),
    )


@register(
    "q_recursive_depth",
    family="K",
    oracle="""
WITH RECURSIVE h (ck, depth) AS (
  SELECT c_custkey, 0 FROM customer WHERE c_custkey = 1
  UNION ALL
  SELECT c.c_custkey, h.depth + 1
  FROM customer c JOIN h ON c.c_custkey // 2 = h.ck
)
SELECT h.depth, COUNT(*) AS n_customers,
       ROUND(SUM(c.c_acctbal), 2) AS sum_acctbal
FROM h JOIN customer c ON c.c_custkey = h.ck
GROUP BY h.depth
""",
)
def q_recursive_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``) over an implicit
    balanced hierarchy: customer k reports to customer k // 2, rooted
    at key 1; the recursion labels every customer with its depth, then
    rolls up headcount and balance per level. Each iteration is one
    distributed equi-join and the iteration count is log₂(N) — ~31
    levels at 10⁹ customers — so the loop stays cheap at 100 TB."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("rcte_customer")
    return spark.sql(
        """
        WITH RECURSIVE h (ck, depth) AS (
          SELECT c_custkey, 0 FROM rcte_customer WHERE c_custkey = 1
          UNION ALL
          SELECT c.c_custkey, h.depth + 1
          FROM rcte_customer c JOIN h ON c.c_custkey DIV 2 = h.ck
        )
        SELECT h.depth, COUNT(*) AS n_customers,
               ROUND(SUM(c.c_acctbal) * 100.0, 0) / 100.0 AS sum_acctbal
        FROM h JOIN rcte_customer c ON c.c_custkey = h.ck
        GROUP BY h.depth
        """
    )
