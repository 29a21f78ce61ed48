"""Persistence for trained driver-side artifacts (IVF centroids, PQ
codebooks, logreg weights, BPE merges).

Several operators train a small deterministic artifact on a bounded
sample (``similarity.train_ivf_centroids``, ``pq.pq_train``,
``mllite.logreg_train``) and note that "a production deployment would
persist this alongside the lake". These helpers make that real: each
artifact round-trips through a parquet table, so the expensive
training pass runs offline/once and every query (batch or streaming
micro-batch) loads the frozen artifact instead of retraining —
the exact FAISS/index-deployment discipline. Parquet (not pickle):
artifacts are inspectable, schema-checked, and readable by any
engine, including the DuckDB oracle.

All values are float64 end to end, so a save/load round-trip is
BIT-EXACT and downstream query output is unchanged (round-trip
identity is asserted in tests/test_artifacts.py).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

Centroids = list[tuple[int, list[float]]]
Codebooks = list[list[list[float]]]


def save_centroids(spark: SparkSession, centroids: Centroids, path: str) -> None:
    """Persist IVF/k-means centroids as (cell int, vec array<double>)."""
    df = spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in centroids],
        "cell int, vec array<double>",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def load_centroids(spark: SparkSession, path: str) -> Centroids:
    rows = spark.read.parquet(path).collect()
    return [
        (int(r["cell"]), [float(x) for x in r["vec"]])
        for r in sorted(rows, key=lambda r: r["cell"])
    ]


def save_codebooks(spark: SparkSession, books: Codebooks, path: str) -> None:
    """Persist PQ codebooks as (subspace int, code int, vec array<double>)."""
    rows = [
        (s, c, [float(x) for x in vec])
        for s, book in enumerate(books)
        for c, vec in enumerate(book)
    ]
    df = spark.createDataFrame(rows, "subspace int, code int, vec array<double>")
    df.coalesce(1).write.mode("overwrite").parquet(path)


def load_codebooks(spark: SparkSession, path: str) -> Codebooks:
    rows = spark.read.parquet(path).collect()
    by_sub: dict[int, dict[int, list[float]]] = {}
    for r in rows:
        by_sub.setdefault(int(r["subspace"]), {})[int(r["code"])] = [
            float(x) for x in r["vec"]
        ]
    return [
        [by_sub[s][c] for c in sorted(by_sub[s])] for s in sorted(by_sub)
    ]


def save_weights(spark: SparkSession, weights: list[float], path: str) -> None:
    """Persist a weight vector (bias first) as (idx int, w double)."""
    df = spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate(weights)], "idx int, w double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


def load_weights(spark: SparkSession, path: str) -> list[float]:
    rows = spark.read.parquet(path).collect()
    return [float(r["w"]) for r in sorted(rows, key=lambda r: r["idx"])]
