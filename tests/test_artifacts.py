"""Artifact persistence round-trips (operators.artifacts): the
offline-train / online-query deployment split must be BIT-EXACT —
queries running on a reloaded artifact produce identical output to
queries running on the freshly trained one."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.artifacts import (
    load_centroids,
    load_codebooks,
    load_weights,
    save_centroids,
    save_codebooks,
    save_weights,
)


def test_centroids_roundtrip_bit_exact_query(spark, sf_dir, tmp_path):
    from flink_framework_spark.operators.similarity import (
        ivf_topk,
        train_ivf_centroids,
    )

    em = table(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(em, n_cells=8)
    path = str(tmp_path / "ivf_centroids")
    save_centroids(spark, cents, path)
    loaded = load_centroids(spark, path)
    assert loaded == cents  # float64 end-to-end: bit-exact

    q = em.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivf_topk(q, em, cents, k=3).collect()))
    b = sorted(map(tuple, ivf_topk(q, em, loaded, k=3).collect()))
    assert a == b


def test_codebooks_roundtrip_bit_exact(spark, sf_dir, tmp_path):
    from flink_framework_spark.operators.pq import pq_train

    em = table(spark, sf_dir, "embeddings")
    books = pq_train(em, m=8, n_codes=16)
    path = str(tmp_path / "pq_codebooks")
    save_codebooks(spark, books, path)
    assert load_codebooks(spark, path) == books


def test_weights_roundtrip(spark, tmp_path):
    w = [0.125, -3.5, 2.25, 1e-9]
    path = str(tmp_path / "weights")
    save_weights(spark, w, path)
    assert load_weights(spark, path) == w


def test_artifact_readable_by_duckdb(spark, sf_dir, tmp_path):
    """The artifact table is plain parquet — the oracle engine (or
    any other reader) can inspect it; no pickle opacity."""
    import glob

    import duckdb

    from flink_framework_spark.operators.similarity import train_ivf_centroids

    em = table(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(em, n_cells=4)
    path = str(tmp_path / "cent_duck")
    save_centroids(spark, cents, path)
    files = glob.glob(f"{path}/*.parquet")
    n, dim = duckdb.sql(
        f"SELECT COUNT(*), MAX(len(vec)) FROM read_parquet({files!r})"
    ).fetchone()
    assert n == 4 and dim == 64
