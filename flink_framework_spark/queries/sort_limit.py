"""F. Sort / limit / top-k (SURVEY.md §2 F1-F3).

Global sort+limit compiles to TakeOrderedAndProject (per-partition
top-N then a tiny driver merge — no full global sort), which is the
right plan at any scale. Orderings carry tiebreak keys so LIMIT picks
identical rows in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import round_duck
from flink_framework_spark.io import table
from flink_framework_spark.operators.topk import top_k_per_group
from flink_framework_spark.registry import register


@register(
    "q_sort_limit",
    family="F",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount), 2) AS revenue
FROM lineitem
ORDER BY revenue DESC, l_orderkey, l_linenumber
LIMIT 20
""",
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort + limit (TakeOrderedAndProject)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            round_duck(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "revenue"
            ),
        )
        .orderBy(F.desc("revenue"), "l_orderkey", "l_linenumber")
        .limit(20)
    )


@register(
    "q_topk_group",
    family="F",
    oracle="""
SELECT p_brand, p_partkey, total FROM (
  SELECT p.p_brand, p.p_partkey,
         ROUND(SUM(l.l_extendedprice), 2) AS total,
         ROW_NUMBER() OVER (PARTITION BY p.p_brand
                            ORDER BY SUM(l.l_extendedprice) DESC, p.p_partkey) AS rn
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, p.p_partkey) t
WHERE rn <= 2
""",
)
def q_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group over an aggregate (operators.topk)."""
    li = table(spark, sf_dir, "lineitem")
    pa = table(spark, sf_dir, "part")
    totals = (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum("l_extendedprice").alias("total_raw"))
    )
    ranked = top_k_per_group(
        totals,
        group_by=["p_brand"],
        order_by=[F.desc("total_raw"), F.col("p_partkey")],
        k=2,
    )
    return ranked.select(
        "p_brand", "p_partkey", round_duck("total_raw", 2).alias("total")
    )


@register(
    "q_limit_offset",
    family="F",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10 OFFSET 5
""",
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: offset + limit under a total order."""
    od = table(spark, sf_dir, "orders")
    return (
        od.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(5)
        .limit(10)
    )
