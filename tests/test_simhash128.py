"""128-bit SimHash (Manku-style combination-block keys).

The blocking's recall contract is EXACT — "returned pairs == all
pairs within max_hamming of the 128-bit fingerprint" — so the primary
check is pair-for-pair equality against a numpy brute-force Hamming
scan over the same fingerprints, for every supported combine level
(which also proves hash-collision candidates are verified away). The
fingerprint itself is cross-checked against the independent 64-bit
implementation (word 0 must match simhash64 bit-for-bit).
"""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.dedup import (
    hashed_shingle_frame,
    simhash64_vec,
    simhash128_near_dup_pairs,
    simhash128_vec,
)


@pytest.fixture(scope="module")
def fingerprints(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    hashes = hashed_shingle_frame(docs)
    rows = hashes.select(
        "__id",
        simhash128_vec()(F.col("__shh")).alias("fp"),
        simhash64_vec()(F.col("__shh")).alias("fp64"),
    ).collect()
    hashes.unpersist()
    return rows


def test_low_word_matches_simhash64(fingerprints):
    assert fingerprints
    for r in fingerprints:
        assert len(r.fp) == 2
        assert r.fp[0] == r.fp64


def _brute_pairs(rows, max_hamming):
    ids = np.array([r["__id"] for r in rows], dtype=np.int64)
    lo = np.array([r.fp[0] for r in rows], dtype=np.int64).astype(np.uint64)
    hi = np.array([r.fp[1] for r in rows], dtype=np.int64).astype(np.uint64)
    want = set()
    for i in range(len(ids)):
        ham = np.array(
            [
                bin(int(a)).count("1") + bin(int(b)).count("1")
                for a, b in zip(lo[i] ^ lo, hi[i] ^ hi)
            ]
        )
        for j in np.flatnonzero(ham <= max_hamming):
            if ids[i] < ids[j]:
                want.add((int(ids[i]), int(ids[j]), int(ham[j])))
    return want


@pytest.mark.parametrize("combine", [1, 2, 3])
def test_blocking_recall_is_exact_vs_brute_force(
    spark, sf_dir, fingerprints, combine
):
    docs = table(spark, sf_dir, "documents")
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash128_near_dup_pairs(
            docs, max_hamming=8, combine_blocks=combine
        ).collect()
    }
    want = _brute_pairs(fingerprints, 8)
    assert got == want
    assert want, "fixture has no near-dup pairs — test is vacuous"


def test_planted_dups_found_at_doubled_threshold(spark):
    """Hamming scales with fingerprint width: a pair at ~h bits on
    the 64-bit sketch sits at ~2h on 128 bits, so the planted corpus
    (2-word substitutions, shingle Jaccard ~0.75-0.9) that the 64-bit
    operator catches at max_hamming=16 is caught here at 32."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(400)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(50))) for i in range(60)
    ]
    truth = set()
    for j in range(20):
        words = rows[j][1].split()
        for _ in range(2):
            words[rng.randrange(len(words))] = rng.choice(vocab)
        rows.append((60 + j, " ".join(words)))
        truth.add((j, 60 + j))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    found = {
        (r.doc_a, r.doc_b)
        for r in simhash128_near_dup_pairs(df, max_hamming=32).collect()
    }
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall}"
    # random 50-word docs over 400 words are far apart in simhash
    # space — nothing beyond the planted set should appear
    assert found <= truth


def test_deterministic_across_runs(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    a = sorted(
        tuple(r) for r in simhash128_near_dup_pairs(docs).collect()
    )
    b = sorted(
        tuple(r)
        for r in simhash128_near_dup_pairs(docs.repartition(7)).collect()
    )
    assert a == b
