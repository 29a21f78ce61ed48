"""Edge cases for the session's new text/similarity operators:
documents too short to carry an n-gram, blocks with no mates, and
hard-negative mining when no wrong-label candidate exists."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_framework_spark.operators.dedup import (
    boilerplate_fraction,
    jaccard_topk,
    simhash128_near_dup_pairs,
)


def test_boilerplate_short_docs_zero_fraction(spark):
    """Docs under the n-gram width have no positions, hence no spans:
    they must still appear with dup_frac 0.0 (one row per input)."""
    df = spark.createDataFrame(
        [
            (1, "tiny doc"),
            (2, "a b c d e f g"),  # 7 tokens < n=8
            (3, " ".join(["x"] * 40) ),
            (4, " ".join(["x"] * 40) ),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in boilerplate_fraction(df, n=8).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1].dup_frac == 0.0 and rows[2].dup_frac == 0.0
    # docs 3/4 are identical 40-token runs: fully covered
    assert rows[3].dup_frac == 1.0 and rows[4].dup_frac == 1.0
    assert rows[3].dup_tokens == 40


def test_jaccard_topk_no_mates_absent(spark):
    """A doc whose min-shingle block contains only itself has no
    candidates and is absent from the output (jac > 0 contract)."""
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma epsilon"),
            (3, "completely different words here"),
        ],
        "doc_id long, text string",
    )
    out = jaccard_topk(df, k=3).collect()
    ids = {r.doc_id for r in out}
    assert 3 not in ids
    got = {(r.doc_id, r.match_id) for r in out}
    assert got == {(1, 2), (2, 1)}
    assert all(r.jac > 0 for r in out)


def test_jaccard_topk_k_bound_and_rank_order(spark):
    base = "w1 w2 w3 w4 w5 w6 w7 w8"
    df = spark.createDataFrame(
        [(i, base + f" extra{i}") for i in range(6)],
        "doc_id long, text string",
    )
    out = jaccard_topk(df, k=2)
    per = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 2 for r in per)
    for r in out.filter(F.col("rn") == 1).collect():
        assert r.jac >= 0.5


def test_simhash128_single_doc_and_empty_overlap(spark):
    df = spark.createDataFrame(
        [(1, "only one document in the corpus at all")],
        "doc_id long, text string",
    )
    assert simhash128_near_dup_pairs(df, max_hamming=8).count() == 0


def test_simhash_rejects_overflow_block_widths(spark):
    """Block widths >= 64 bits would overflow LongType masks; the
    configs that produce them (max_hamming<=1) are exact-dup
    territory and must be rejected, not crash at plan build."""
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    from flink_framework_spark.operators.dedup import (
        simhash_near_dup_pairs as s64,
    )

    with pytest.raises(ValueError, match="n_blocks"):
        s64(df, max_hamming=0, n_blocks=1).count()
    with pytest.raises(ValueError, match="n_blocks"):
        simhash128_near_dup_pairs(df, max_hamming=0).count()
    with pytest.raises(ValueError, match="n_blocks"):
        simhash128_near_dup_pairs(df, max_hamming=8, n_blocks=2).count()


def test_hard_negatives_null_labels_follow_sql_semantics(spark, sf_dir):
    """NULL labels must behave like SQL '<>': pairs with a NULL label
    on either side never match — matching the declared oracle."""
    from flink_framework_spark.io import table
    from flink_framework_spark.operators.similarity import gemm_topk

    em = table(spark, sf_dir, "embeddings").withColumn(
        "label",
        F.when(F.col("vec_id") % 3 == 0, None).otherwise(F.col("label")),
    )
    out = gemm_topk(
        em.filter(F.col("vec_id") < 12), em, k=5, exclude_label_col="label"
    ).collect()
    labels = {r.vec_id: r.label for r in em.select("vec_id", "label").collect()}
    assert out, "some labeled anchors should have wrong-label neighbors"
    for r in out:
        assert labels[r.query_id] is not None
        assert labels[r.neighbor_id] is not None
        assert labels[r.query_id] != labels[r.neighbor_id]


def test_hard_negatives_all_same_label_empty(spark, sf_dir):
    from flink_framework_spark.io import table
    from flink_framework_spark.operators.similarity import gemm_topk

    em = table(spark, sf_dir, "embeddings").withColumn(
        "label", F.lit("same")
    )
    out = gemm_topk(
        em.filter(F.col("vec_id") < 5), em, k=5, exclude_label_col="label"
    )
    assert out.count() == 0
