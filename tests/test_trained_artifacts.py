"""Drift pin for the frozen trained-artifact literals.

The round-10 golden conversion inlines the sf0.01-trained quantizers
(queries/_trained_sf001.py) into live DuckDB oracles
(queries/_oracle_trained.py). The queries still TRAIN at runtime, so
any change to the training code (sampling, init, update arithmetic)
would silently shift the runtime model away from the frozen oracle
constants — this test retrains at sf0.01 and asserts bit-for-bit
equality, turning that drift into a loud failure that says "re-run
tools/freeze_trained_artifacts.py and re-check the oracles"."""

from __future__ import annotations

SF001 = "/root/testdata/sf0.01"


def test_retraining_reproduces_frozen_artifacts(spark):
    from flink_framework_spark.io import table
    from flink_framework_spark.operators.iterative import kmeans_lloyd
    from flink_framework_spark.operators.pq import pq_train
    from flink_framework_spark.operators.similarity import (
        train_imi,
        train_ivf_centroids,
    )
    from pyspark.sql import functions as F

    from flink_framework_spark.queries._trained_sf001 import (
        IMI_BOOKS,
        IVF_CENTROIDS,
        IVF_CENTROIDS_CORPUS400,
        KMEANS_CENTROIDS,
        PQ_BOOKS,
    )

    em = table(spark, SF001, "embeddings")
    _, kmeans_cents = kmeans_lloyd(em, k=8, n_iter=5, return_centroids=True)
    assert kmeans_cents == KMEANS_CENTROIDS
    assert train_ivf_centroids(em, n_cells=8) == IVF_CENTROIDS
    assert (
        train_ivf_centroids(em.filter(F.col("vec_id") < 400), n_cells=8)
        == IVF_CENTROIDS_CORPUS400
    )
    books = [
        [[float(x) for x in row] for row in b]
        for b in train_imi(em, k_per_half=3)
    ]
    assert books == IMI_BOOKS
    pq = [
        [[float(x) for x in comp] for comp in book]
        for book in pq_train(em, m=8, n_codes=64)
    ]
    assert pq == PQ_BOOKS
    from flink_framework_spark.operators.mllite import logreg_train
    from flink_framework_spark.queries._trained_sf001 import LOGREG_WEIGHTS
    from flink_framework_spark.queries.quality_model import (
        _FEATS,
        _featurized,
    )

    w = logreg_train(
        _featurized(spark, SF001),
        _FEATS,
        label_col="label",
        order_col=F.struct("doc_id", "variant"),
    )
    assert w == LOGREG_WEIGHTS


def test_oracle_builders_embed_full_precision_literals():
    """EVERY frozen artifact value must survive the literal
    round-trip bit-for-bit under the builders' emitter (_dlit:
    exponent notation -> DOUBLE via strtod; a bare decimal literal
    parses as DECIMAL whose DOUBLE conversion is 1 ulp off for ~15%
    of 17-digit values — the bug this test exists to catch)."""
    import duckdb

    from flink_framework_spark.queries._oracle_trained import _dlit
    from flink_framework_spark.queries._trained_sf001 import (
        IMI_BOOKS,
        IVF_CENTROIDS,
        IVF_CENTROIDS_CORPUS400,
        KMEANS_CENTROIDS,
        PQ_BOOKS,
    )

    vals = (
        [v for _, vec in KMEANS_CENTROIDS for v in vec]
        + [v for _, vec in IVF_CENTROIDS for v in vec]
        + [v for _, vec in IVF_CENTROIDS_CORPUS400 for v in vec]
        + [v for b in IMI_BOOKS for row in b for v in row]
        + [v for b in PQ_BOOKS for row in b for v in row]
    )
    from flink_framework_spark.queries._trained_sf001 import LOGREG_WEIGHTS

    vals += list(LOGREG_WEIGHTS)
    con = duckdb.connect()
    got = []
    for i in range(0, len(vals), 256):
        got += list(
            con.execute(
                "SELECT "
                + ", ".join(_dlit(v) for v in vals[i : i + 256])
            ).fetchone()
        )
    assert got == vals
    # and the Python-side emitter itself round-trips
    assert all(float(_dlit(v)) == v for v in vals)
