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
