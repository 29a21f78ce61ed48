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

from flink_framework_spark.functions.helpers import round_duck


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


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Distributed Lloyd's k-means over a vector column — the classic
    dataset-iteration example, in Spark's model: per round one narrow
    assignment map (literal-centroid distances, no join/shuffle — the
    same ``_cell_dists`` expression the IVF index uses) plus one
    shuffle aggregate of k*dim partial sums; the k*dim centroid
    update is the only driver round-trip (bounded, independent of
    corpus size).

    Fully deterministic — golden-snapshot safe:

    - init: farthest-first traversal (maxmin seeding) from the
      lowest-id vector — no RNG, and unlike lowest-k-ids it cannot
      seed every centroid inside one cluster; each of the k-1 steps
      is a narrow distance map + TakeOrdered(1), ties on distance
      broken by ascending id;
    - a fixed ``n_iter`` rounds (no data-dependent stopping);
    - centroid updates sum components as DECIMAL, which Spark
      aggregates exactly (order-independent), so the result does not
      depend on partitioning — a plain double sum would drift by ulps
      between runs and flip boundary assignments;
    - the final division happens driver-side in ``decimal.Decimal``.

    Returns (id, cluster, d2) — final assignment and its squared L2
    distance, rounded.
    """
    from flink_framework_spark.operators.similarity import (
        _cell_dists,
        to_double_array,
    )

    staged = df.select(
        F.col(id_col), to_double_array(vec_col).alias("__v")
    )
    first = staged.orderBy(id_col).limit(1).collect()
    if not first:
        raise ValueError("cannot run k-means on an empty input")
    chosen: list[list[float]] = [list(first[0]["__v"])]
    while len(chosen) < k:
        dmin = F.array_min(
            _cell_dists(F.col("__v"), list(enumerate(chosen)))
        ).getField("d")
        far = (
            staged.select(F.col(id_col), F.col("__v"), dmin.alias("__d"))
            .orderBy(F.col("__d").desc(), F.col(id_col))
            .limit(1)
            .collect()[0]
        )
        chosen.append(list(far["__v"]))
    centroids = list(enumerate(chosen))

    for _ in range(n_iter):
        assigned = staged.withColumn(
            "__c",
            F.array_min(_cell_dists(F.col("__v"), centroids)).getField(
                "cell"
            ),
        )
        stats = (
            assigned.select(
                "__c", F.posexplode("__v").alias("__pos", "__val")
            )
            .groupBy("__c", "__pos")
            .agg(
                F.sum(F.col("__val").cast("decimal(28,14)")).alias("__s"),
                F.count(F.lit(1)).alias("__n"),
            )
            .collect()
        )
        dims: dict[int, dict[int, float]] = {}
        for r in stats:
            dims.setdefault(r["__c"], {})[r["__pos"]] = float(
                r["__s"] / r["__n"]
            )
        centroids = [
            (
                c,
                [dims[c][p] for p in range(len(old))]
                if c in dims  # empty cluster keeps its old centroid
                else old,
            )
            for c, old in centroids
        ]

    from flink_framework_spark.operators.similarity import _cell_dists

    # two-step select so the distance array is evaluated once per row
    best = staged.select(
        F.col(id_col),
        F.array_min(_cell_dists(F.col("__v"), centroids)).alias("__best"),
    )
    return best.select(
        F.col(id_col),
        F.col("__best.cell").cast("long").alias("cluster"),
        round_duck(F.col("__best.d"), 4).alias("d2"),
    )
