"""Curation-pipeline invariants (examples/training_data_pipeline.py):
monotone stage sizes, near-dup losers actually removed, budget adds up.
Uses a corpus with planted exact + near duplicates."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from examples.training_data_pipeline import curate

VOCAB = [f"t{i}" for i in range(300)]


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(11)
    rows = []
    for i in range(80):
        text = " ".join(rng.choice(VOCAB) for _ in range(40))
        rows.append((i, text, "src%d" % (i % 4), len(text)))
    # exact dups of docs 0..9 (higher ids)
    for j in range(10):
        base = rows[j]
        rows.append((1000 + j, base[1], base[2], base[3]))
    # near dups of docs 10..19
    for j in range(10):
        words = rows[10 + j][1].split()
        words[3] = rng.choice(VOCAB)
        text = " ".join(words)
        rows.append((2000 + j, text, rows[10 + j][2], len(text)))
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )


def test_pipeline_invariants(spark, corpus):
    stages = curate(spark, corpus, near_dup_threshold=0.5, min_quality=0.0)
    n_raw = stages["raw"].count()
    n_exact = stages["exact_unique"].count()
    n_near = stages["near_unique"].count()
    n_kept = stages["kept"].count()
    assert n_raw == 100
    assert n_exact == 90  # the 10 exact dups removed
    assert n_near == 80  # the 10 near dups removed
    assert 0 < n_kept <= n_near
    # representatives kept are the smallest ids (1000+/2000+ all gone)
    ids = {r["doc_id"] for r in stages["near_unique"].select("doc_id").collect()}
    assert not any(i >= 1000 for i in ids)
    # token budget covers exactly the kept docs
    budget = stages["budget"]
    assert budget.agg(F.sum("n_docs")).collect()[0][0] == n_kept
    assert budget.agg(F.min("total_tokens")).collect()[0][0] > 0
