"""Similarity search over embedding columns (SURVEY.md §2 K3).

Two paths, same per-pair kernel (``functions.helpers.cosine_sim``, a
JVM higher-order-function fold in double precision):

- ``brute_force_topk``: exact top-k by scoring every (query, corpus)
  pair. The small query side is broadcast, so the plan is a broadcast
  nested-loop with no shuffle of the corpus — correct baseline, O(Q·N).
- ``bucketed_topk``: the scale path — restrict candidates to a
  precomputed coarse bucket (IVF-style cell id: here any integer
  column, e.g. a k-means cluster id computed offline; the fixtures'
  ``label`` column plays that role). Candidate generation becomes an
  equi-join on the bucket id — shuffle-partitioned, skew-handled by
  AQE — and scoring cost drops by the bucket fan-out factor. At 100 TB
  this is the difference between an impossible cross join and a
  bounded per-cell scan; recall depends on bucket quality, which is
  why the exact path stays as the verification baseline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import cosine_sim, round_duck, to_double_array


def _score_and_rank(
    pairs: DataFrame, k: int, query_id: str, neighbor_id: str
) -> DataFrame:
    cos = cosine_sim(F.col("__qv"), F.col("__cv"))
    w = Window.partitionBy(query_id).orderBy(F.desc("__cos"), F.col(neighbor_id))
    return (
        pairs.withColumn("__cos", cos)
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(
            query_id,
            neighbor_id,
            round_duck("__cos", 4).alias("cosim"),
            "rn",
        )
    )


def _prep(df: DataFrame, id_col: str, vec_col: str, out_id: str, out_vec: str,
          extra: list[str] | None = None) -> DataFrame:
    cols = [F.col(id_col).alias(out_id), to_double_array(vec_col).alias(out_vec)]
    cols += [F.col(c) for c in (extra or [])]
    return df.select(*cols)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set over the
    corpus. Output: query_id, neighbor_id, cosim (rounded 4), rn."""
    q = _prep(queries, id_col, vec_col, "query_id", "__qv")
    c = _prep(corpus, id_col, vec_col, "neighbor_id", "__cv")
    pairs = F.broadcast(q).join(c, F.col("query_id") != F.col("neighbor_id"))
    return _score_and_rank(pairs, k, "query_id", "neighbor_id")


def bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    bucket_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k searching only the query's coarse bucket
    (IVF cell / LSH bucket). Equi-join on the bucket id keeps the
    candidate set per query bounded."""
    q = _prep(queries, id_col, vec_col, "query_id", "__qv", [bucket_col]).withColumnRenamed(
        bucket_col, "__qb"
    )
    c = _prep(corpus, id_col, vec_col, "neighbor_id", "__cv", [bucket_col]).withColumnRenamed(
        bucket_col, "__cb"
    )
    pairs = q.join(
        c,
        (F.col("__qb") == F.col("__cb"))
        & (F.col("query_id") != F.col("neighbor_id")),
    )
    return _score_and_rank(pairs, k, "query_id", "neighbor_id")


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    bucket_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within coarse buckets.

    Same candidate-pruning discipline as ``bucketed_topk``: the
    equi-join on the bucket id bounds the pair space; the cosine
    kernel verifies. Output: vec_a < vec_b with cosine >= threshold.
    """
    e = df.select(
        F.col(id_col).alias("__eid"),
        to_double_array(vec_col).alias("__v"),
        F.col(bucket_col).alias("__bk"),
    )
    a = e.select(
        F.col("__eid").alias("vec_a"), F.col("__v").alias("__va"), "__bk"
    )
    b = e.select(
        F.col("__eid").alias("vec_b"), F.col("__v").alias("__vb"), "__bk"
    )
    cos = cosine_sim(F.col("__va"), F.col("__vb"))
    return (
        a.join(b, ["__bk"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("__cos", cos)
        .filter(F.col("__cos") >= threshold)
        .select("vec_a", "vec_b", round_duck("__cos", 4).alias("cosim"))
    )


def train_ivf_centroids(
    df: DataFrame,
    n_cells: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 8,
):
    """Train IVF coarse cells: k-means over the corpus (Spark MLlib).

    Returns a small driver-side list of (cell_id, centroid) — the
    offline artifact a production deployment would persist alongside
    the lake and broadcast to queries. Training is a few passes over
    the vectors; at 100 TB one trains on a sample.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    ).select(array_to_vector(to_double_array(vec_col)).alias("features"))
    # random init: for an IVF *coarse* quantizer the cells only need to
    # partition space roughly; k-means|| init doubles the pass count
    # for no recall benefit here
    model = KMeans(
        k=n_cells, seed=seed, maxIter=max_iter, initMode="random"
    ).fit(feats)
    return [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]


def _cell_dists(vec_col: Column, centroids) -> Column:
    """array<struct<d,cell>> of squared-L2 distances to each centroid,
    built from LITERAL centroids — a pure per-row expression, so cell
    assignment is a narrow map with NO join and NO shuffle. vec_col
    must be a materialized column reference (see minhash_signature)."""
    return F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        vec_col,
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d"),
                F.lit(i).alias("cell"),
            )
            for i, c in centroids
        ]
    )


def _cell_assign(df: DataFrame, centroids, vec_col: str, out: str) -> DataFrame:
    """Assign each vector to its nearest centroid (min by (d, cell)
    struct order — deterministic tiebreak), as a narrow map."""
    staged = df.withColumn("__v", to_double_array(vec_col))
    return staged.withColumn(
        out, F.array_min(_cell_dists(F.col("__v"), centroids)).getField("cell")
    ).drop("__v")


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate kNN: corpus vectors live in their nearest cell;
    each query probes its ``nprobe`` nearest cells. Candidate
    generation is an equi-join on cell id — the 100 TB plan — and
    recall grows with nprobe (property-tested against brute force).
    """
    corpus_cells = _cell_assign(corpus, centroids, vec_col, "__cell")

    probes = (
        queries.select(
            F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("__qv")
        )
        .withColumn(
            "__probe",
            F.explode(
                F.slice(
                    F.array_sort(_cell_dists(F.col("__qv"), centroids)), 1, nprobe
                )
            ),
        )
        .select("query_id", "__qv", F.col("__probe.cell").alias("__cell"))
    )

    cands = probes.join(
        corpus_cells.select(
            F.col(id_col).alias("neighbor_id"),
            to_double_array(vec_col).alias("__cv"),
            "__cell",
        ),
        "__cell",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    return _score_and_rank(cands, k, "query_id", "neighbor_id")
