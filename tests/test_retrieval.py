"""Semantics + plan-shape tests for operators.retrieval (BM25,
TF-IDF keywords, token-window chunking)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from flink_framework_spark.operators.retrieval import (
    bm25_topk,
    chunk_documents,
    tfidf_keywords,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "hash join merge hash join hash"),
        (2, "scan filter scan filter scan filter scan filter"),
        (3, "hash table lookup probe build side"),
        (4, "merge sort spill disk run generation"),
        (5, "join order optimizer search space pruning join"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_ranks_all_term_doc_first(corpus):
    out = bm25_topk(corpus, ["hash", "join", "merge"], k=5).collect()
    assert out[0]["doc_id"] == 1  # contains every query term, repeatedly
    ids = [r["doc_id"] for r in out]
    assert 2 not in ids  # no query term at all -> never retrieved
    # scores strictly ordered (desc) with doc_id tiebreak
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_bm25_idf_downweights_common_terms(spark):
    # "common" appears in every doc, "rare" in one: for the query
    # {common, rare} the rare-term doc must outscore pure-common docs.
    rows = [(i, "common filler text here") for i in range(1, 9)]
    rows.append((9, "common rare"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_topk(df, ["common", "rare"], k=3).collect()
    assert out[0]["doc_id"] == 9


def test_tfidf_rank_is_dense_per_doc(corpus):
    out = tfidf_keywords(corpus, per_doc=3).toPandas()
    for _, grp in out.groupby("doc_id"):
        assert sorted(grp["kw_rank"]) == list(range(1, len(grp) + 1))
    # a term present in every doc has idf ln(1)=0 -> never a top
    # keyword unless fewer than per_doc distinct terms exist
    assert (out["tfidf"] >= 0).all()


def test_tfidf_matches_reference_formula(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c c c")], ["doc_id", "text"]
    )
    out = {
        (r["doc_id"], r["term"]): r["tfidf"]
        for r in tfidf_keywords(df, per_doc=3).collect()
    }
    # doc 1: tf(a)=2/3, df(a)=1 -> tfidf = 2/3 * ln(2)
    assert out[(1, "a")] == pytest.approx((2 / 3) * math.log(2), abs=1e-6)
    # b appears in both docs -> idf = ln(1) = 0
    assert out[(1, "b")] == 0.0


def test_chunks_cover_every_token_once_per_window(spark):
    n_words = 100
    text = " ".join(f"w{i}" for i in range(n_words))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    chunks = sorted(
        (r["chunk_start"], r["n_tokens"])
        for r in chunk_documents(df, chunk_size=32, stride=24).collect()
    )
    # starts at every multiple of the stride below n_words
    assert [s for s, _ in chunks] == list(range(0, n_words, 24))
    # all full except the tail; consecutive chunks overlap by 8
    for s, n in chunks:
        assert n == min(32, n_words - s)
    # full coverage: last chunk reaches the final token
    last_start, last_n = chunks[-1]
    assert last_start + last_n == n_words


def test_chunk_fingerprints_detect_shared_windows(spark):
    # identical 32-word prefix -> identical first-chunk fingerprint
    prefix = " ".join(f"p{i}" for i in range(32))
    df = spark.createDataFrame(
        [(1, prefix + " tail one"), (2, prefix + " other ending")],
        ["doc_id", "text"],
    )
    out = chunk_documents(df, chunk_size=32, stride=24).toPandas()
    first = out[out.chunk_start == 0]
    assert first.chunk_md5.nunique() == 1


def test_bm25_plan_shape(spark, sf_dir):
    from flink_framework_spark.plans.inspect import formatted_plan
    from flink_framework_spark.registry import all_queries

    plan = formatted_plan(all_queries()["q_bm25_topk"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # stats/dfreq joins broadcast here
