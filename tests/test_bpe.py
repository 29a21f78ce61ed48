"""BPE training/tokenization properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_framework_spark.operators.bpe import (
    EOW,
    _encode_word,
    bpe_tokenize,
    bpe_train,
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )


def test_bpe_learns_frequent_pair_first(spark):
    # 'aa' dominates: the first merge must be (a, a); 'ab</w>' follows
    df = _df(spark, ["aaab aaab aaab aaab", "xy xy"])
    merges = bpe_train(df, "text", "id", n_merges=3)
    assert merges[0][:2] == ("a", "a")


def test_bpe_tokenize_roundtrip_and_boundaries(spark):
    df = _df(spark, ["low lower lowest", "low low new newer"])
    merges = bpe_train(df, "text", "id", n_merges=30)
    out = df.select(
        "id", bpe_tokenize(F.col("text"), merges).alias("toks")
    ).collect()
    for r in out:
        joined = "".join(t.replace(EOW, " ") for t in r.toks).strip()
        orig = [t for t in df.collect() if t.id == r.id][0].text
        # concatenating tokens and restoring word marks reproduces the text
        assert joined == orig
        # no token spans a word boundary: at most one EOW, at the end
        for t in r.toks:
            assert t.count(EOW) <= 1
            assert EOW not in t or t.endswith(EOW)


def test_bpe_fully_merges_repeated_word(spark):
    # a word that dominates the sample ends up a single token
    df = _df(spark, ["spark " * 50])
    merges = bpe_train(df, "text", "id", n_merges=10)
    assert _encode_word("spark", {
        (a, b): i for i, (a, b, _) in enumerate(merges)
    }) == ["spark" + EOW]


def test_bpe_train_is_deterministic(spark):
    df = _df(spark, ["the quick brown fox", "the slow brown dog"])
    m1 = bpe_train(df, "text", "id", n_merges=20)
    m2 = bpe_train(df, "text", "id", n_merges=20)
    assert m1 == m2
