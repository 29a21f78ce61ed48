"""Graph-iteration queries: PageRank over the customer–supplier
trade graph. The operators live in ``operators.iterative`` (the
Flink ``iterate()`` surface: connected components, k-means,
PageRank)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.iterative import pagerank
from flink_framework_spark.registry import register

# supplier node ids are offset so they cannot collide with customer
# keys (both are dense small integers in the fixtures)
_SUPP_OFFSET = 10_000_000


@register(
    "q_pagerank",
    family="K",
    oracle="""
SELECT * FROM read_parquet(
  '/root/repo/tests/golden_driver/q_pagerank_sf0.01.parquet')
""",
    oracle_sf="sf0.01",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bidirectional customer<->supplier graph
    (an edge per distinct trade relationship from orders x lineitem).
    Fixed-point int64 power iteration, 5 rounds — deterministic under
    any partitioning, value-checked against a frozen sf0.01 golden;
    convergence/conservation properties in tests/test_pagerank.py.

    Bidirectional edges mean every node has an out-edge, so the
    per-round dangling-mass job is skipped (handle_dangling=False);
    the operator's dangling path is property-tested separately.
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # pairs are distinct and the reversed copies cannot collide with
    # the originals (supplier ids are offset), so the union is already
    # a distinct edge list
    return pagerank(edges, n_iter=5, handle_dangling=False, assume_distinct=True)
