"""Iterative computation — the Flink ``iterate()`` surface (SURVEY.md
§2 [F]: DataStream/DataSet iterations) in Spark's model: a
driver-coordinated loop of declarative steps with a convergence check,
lineage cut per round (``localCheckpoint``) so plans don't grow
unboundedly — the standard Pregel-lite shape on Spark.

``connected_components``: min-label propagation over an undirected
edge list. Per round: one shuffle join (labels ⋈ edges) + one
aggregation; rounds ≤ graph diameter. At 100 TB-scale graphs one adds
large-star/small-star optimizations, but the loop skeleton is the
same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    vertices: DataFrame | None = None,
    vertex_id: str = "id",
) -> DataFrame:
    """Label every node with the minimum node id of its component.

    ``edges`` is an undirected edge list (long ids). Returns
    ``(id, component)``. Converges in at most ``max_iter`` rounds or
    raises if the diameter exceeds it.

    Every endpoint appearing in ``edges`` is labeled — including nodes
    whose only edges are self-loops (singleton components). Nodes with
    no edges at all cannot be discovered from the edge list; pass the
    optional ``vertices`` DataFrame to label isolated nodes as
    singleton components too.
    """
    und = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    # seed labels from BOTH endpoints before dropping self-loops, so
    # self-loop-only nodes still appear (as singletons)
    seeds = und.select(F.col("a").alias("id"))
    if vertices is not None:
        seeds = seeds.unionByName(vertices.select(F.col(vertex_id).alias("id")))
    und = und.filter(F.col("a") != F.col("b")).distinct().localCheckpoint()

    labels = (
        seeds.distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und.b == labels.id)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        # Carry the previous label alongside the new one so the
        # convergence check is a narrow filter-count over the already
        # checkpointed rows (1 tiny job) instead of a second shuffle
        # join against the old labels (which doubled per-round cost).
        stepped = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.col("component").alias("__prev"),
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = stepped.filter(F.col("component") != F.col("__prev")).count()
        labels = stepped.drop("__prev")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
