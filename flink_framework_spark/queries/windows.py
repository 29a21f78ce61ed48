"""E. Analytic (OVER) window functions — absent from the raw Flink
DataStream API (buildable only with keyed process functions + sorted
state [F]); in Spark they are native ``Window`` specs (SURVEY.md §2 E).

Every ordering carries explicit tiebreak keys for a total order
(SURVEY.md §5.3), and rank-like integer outputs are cast to long to
match DuckDB's BIGINT window results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import round_duck
from flink_framework_spark.io import table
from flink_framework_spark.registry import register


@register(
    "q_win_topn",
    family="E",
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3
""",
)
def q_win_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number top-N per partition."""
    od = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        od.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q_win_rank_dense",
    family="E",
    oracle="""
SELECT c_mktsegment, c_custkey,
       RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rk,
       DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drk
FROM customer
""",
)
def q_win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank."""
    cu = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"))
    return cu.select(
        "c_mktsegment",
        "c_custkey",
        F.rank().over(w).cast("long").alias("rk"),
        F.dense_rank().over(w).cast("long").alias("drk"),
    )


@register(
    "q_win_lag",
    family="E",
    oracle="""
SELECT event_id, user_id,
       ROUND(value - LAG(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id), 2) AS dvalue
FROM events
""",
)
def q_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag over an ordered per-key stream (delta encoding)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        round_duck(F.col("value") - F.lag("value").over(w), 2).alias("dvalue"),
    )


@register(
    "q_win_running",
    family="E",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total
FROM orders
""",
)
def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per key."""
    od = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        round_duck(F.sum("o_totalprice").over(w), 2).alias("run_total"),
    )


@register(
    "q_win_moving",
    family="E",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS rev
  FROM orders GROUP BY CAST(o_orderdate AS DATE))
SELECT strftime(d, '%Y-%m-%d') AS day,
       ROUND(AVG(rev) OVER (ORDER BY d
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2) AS ma4
FROM daily
""",
)
def q_win_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-day moving average over pre-aggregated daily revenue.

    The global (unpartitioned) window runs on the *aggregated* daily
    series — a few thousand rows even at warehouse scale — so the
    single-partition sort is fine; the heavy lifting (raw -> daily) is
    a distributed hash aggregate."""
    od = table(spark, sf_dir, "orders")
    daily = od.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("d").rowsBetween(-3, Window.currentRow)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        round_duck(F.avg("rev").over(w), 2).alias("ma4"),
    )


@register(
    "q_win_ntile",
    family="E",
    oracle="""
SELECT c_custkey,
       NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
       ROUND(PERCENT_RANK() OVER (ORDER BY c_acctbal), 4) AS pr,
       ROUND(CUME_DIST() OVER (ORDER BY c_acctbal), 4) AS cd
FROM customer
""",
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist."""
    cu = table(spark, sf_dir, "customer")
    wq = Window.orderBy("c_acctbal", "c_custkey")
    wp = Window.orderBy("c_acctbal")
    return cu.select(
        "c_custkey",
        F.ntile(4).over(wq).cast("long").alias("quartile"),
        round_duck(F.percent_rank().over(wp), 4).alias("pr"),
        round_duck(F.cume_dist().over(wp), 4).alias("cd"),
    )


@register(
    "q_win_firstlast",
    family="E",
    oracle="""
SELECT DISTINCT user_id,
  FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_ev,
  LAST_VALUE(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ev
FROM events
""",
)
def q_win_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value with a full frame."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_ev"),
        F.last("event_type").over(wfull).alias("last_ev"),
    ).distinct()


@register(
    "q_win_time_range",
    family="E",
    oracle="""
SELECT user_id, event_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS trail_n,
       ROUND(SUM(value) OVER w, 2) AS trail_sum
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
)
def q_win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame (Flink SQL ``OVER (... ORDER BY rowtime
    RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)``):
    per event, the trailing-hour count and value sum for its user.
    Unlike ROWS frames, the frame is defined by the TIME VALUES —
    same-timestamp peers are always all included, so the result is
    total-order-independent and needs no tie-break column. Runs as
    one native Spark SQL window (JVM-side, one keyed shuffle)."""
    ev = table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("ev_time_range")
    return spark.sql("""
        SELECT user_id, event_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS trail_n,
               ROUND(SUM(value) OVER w, 2) AS trail_sum
        FROM ev_time_range
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                     AND CURRENT ROW)
    """)
