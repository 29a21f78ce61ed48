"""B. Projection / filter / conditional — the reference's ``map`` and
``filter`` DataStream operators (SURVEY.md §2 B1-B3 [F]) as narrow,
fully codegen'd Spark transformations. Filters and the 3-column
projection push down into the parquet scan (verified in plan tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import round_duck
from flink_framework_spark.io import table
from flink_framework_spark.registry import register


@register(
    "q_select_project",
    family="B",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount), 2) AS revenue
FROM lineitem
""",
)
def q_select_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + scalar arithmetic (Flink ``map`` analogue)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        round_duck(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
            "revenue"
        ),
    )


@register(
    "q_filter_pred",
    family="B",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1999-01-01'
  AND l_discount > 0.03
  AND l_returnflag IN ('A','R')
  AND l_quantity BETWEEN 10 AND 40
""",
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate filter (AND/IN/BETWEEN) — pushes to parquet."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1999-01-01")
        & (F.col("l_discount") > 0.03)
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_quantity").between(10, 40)
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "q_case_when",
    family="B",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small' END AS bucket
FROM orders
""",
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expression (CASE WHEN)."""
    od = table(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
    )
