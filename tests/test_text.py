"""Text-operator properties: language ID accuracy on a genuinely
multilingual corpus, approximate aggregates within tolerance of exact
(SURVEY.md §2 D10/D11)."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.text import (
    predict_lang,
    train_char_ngram_langid,
)

EN = "the quick brown fox jumps over the lazy dog and runs through the green fields with great speed while the sun shines".split()
DE = "der schnelle braune fuchs springt über den faulen hund und läuft durch die grünen felder mit großer geschwindigkeit während die sonne scheint".split()
ES = "el zorro marrón rápido salta sobre el perro perezoso y corre por los campos verdes con gran velocidad mientras brilla el sol".split()


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(3)
    rows = []
    for lang, vocab in (("en", EN), ("de", DE), ("es", ES)):
        for i in range(60):
            rows.append((lang, " ".join(rng.choice(vocab) for _ in range(30))))
    return spark.createDataFrame(rows, "lang string, text string")


def test_langid_accuracy(spark, corpus):
    train = corpus.sample(0.5, seed=1)
    model = train_char_ngram_langid(train)
    pred = predict_lang(corpus, model)
    stats = pred.select(
        F.avg((F.col("lang") == F.col("pred_lang")).cast("double")).alias("acc")
    ).collect()[0]
    assert stats["acc"] >= 0.95, stats


def test_approx_count_distinct_tolerance(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    rows = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).collect()
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / r["exact"] <= 0.08, r


def test_approx_percentile_tolerance(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    rows = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.9).alias("exact"),
        F.percentile_approx("l_extendedprice", 0.9, 1000).alias("approx"),
    ).collect()
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / r["exact"] <= 0.02, r


def test_ivf_topk_recall_vs_brute_force(spark, sf_dir):
    """IVF with k-means cells: recall@5 vs exact brute force must rise
    with nprobe and clear a floor at nprobe=4 of 8 cells."""
    from flink_framework_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    em = table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 20)
    exact = brute_force_topk(queries, em, k=5)
    truth = {
        (r["query_id"], r["neighbor_id"]) for r in exact.collect()
    }
    cents = train_ivf_centroids(em, n_cells=8)
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(queries, em, cents, k=5, nprobe=4).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.6, recall
    got1 = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(queries, em, cents, k=5, nprobe=1).collect()
    }
    recall1 = len(got1 & truth) / len(truth)
    assert recall1 <= recall
