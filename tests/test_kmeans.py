"""Distributed Lloyd's k-means (operators.iterative.kmeans_lloyd):
exact-recovery on separable blobs, determinism across partitioning,
empty-cluster behavior."""

from __future__ import annotations

import pytest

from flink_framework_spark.operators.iterative import kmeans_lloyd


def _blobs(spark, centers, n_per, spread=0.05):
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for j in range(n_per):
            # deterministic jitter, alternating sign per dim
            vec = [
                x + spread * ((-1) ** (vid + d)) * ((j % 5) / 5.0)
                for d, x in enumerate(c)
            ]
            rows.append((vid, vec, ci))
            vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding", "blob"])


def test_kmeans_recovers_separated_blobs(spark):
    centers = [[0.0, 0.0, 0.0, 0.0], [10.0, 10.0, 0.0, 0.0], [0.0, 0.0, 10.0, 10.0]]
    df = _blobs(spark, centers, n_per=20)
    out = kmeans_lloyd(df, k=3, n_iter=4).toPandas()
    truth = df.select("vec_id", "blob").toPandas()
    m = out.merge(truth, on="vec_id")
    # each blob maps to exactly one cluster and vice versa
    mapping = m.groupby("blob")["cluster"].nunique()
    assert (mapping == 1).all()
    assert m["cluster"].nunique() == 3
    # tight blobs: every point within spread of its centroid
    assert (m["d2"] < 1.0).all()


def test_kmeans_deterministic_across_partitioning(spark, sf_dir):
    from flink_framework_spark.io import table

    emb = table(spark, sf_dir, "embeddings")
    a = (
        kmeans_lloyd(emb.repartition(3), k=4, n_iter=2)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        kmeans_lloyd(emb.repartition(17), k=4, n_iter=2)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_kmeans_empty_cluster_keeps_seed_centroid(spark):
    # two distinct points, k=3: the third seed never wins any point,
    # its cluster stays empty and the loop must not crash
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 5.0]), (3, [5.0, 5.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = kmeans_lloyd(df, k=3, n_iter=3).toPandas()
    assert len(out) == 4
    assert set(out["cluster"]) <= {0, 1, 2}
    assert (out["d2"] == 0.0).all()


def test_kmeans_empty_input_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=2, n_iter=1)
