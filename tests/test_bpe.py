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


def test_train_matches_recount(spark, sf_dir):
    """The r11 incremental pair-maintenance trainer must produce the
    EXACT merge table (pairs, order, counts) of the naive
    recount-every-merge formulation it replaced — run both on fixture
    documents and on a synthetic tie-heavy corpus."""
    from collections import Counter

    from flink_framework_spark.operators.bpe import _word_symbols
    from flink_framework_spark.io import table

    def recount_train(sample_texts, n_merges):
        word_freq = Counter()
        for text in sample_texts:
            word_freq.update((text or "").strip().lower().split(" "))
        vocab = {}
        for w, n in word_freq.items():
            if w:
                vocab[_word_symbols(w)] = vocab.get(_word_symbols(w), 0) + n
        merges = []
        for _ in range(n_merges):
            pairs = Counter()
            for syms, n in vocab.items():
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] += n
            if not pairs:
                break
            (a, b) = min(pairs, key=lambda p: (-pairs[p], p))
            merges.append((a, b, pairs[(a, b)]))
            new_vocab = {}
            for syms, n in vocab.items():
                out = []
                i = 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                key = tuple(out)
                new_vocab[key] = new_vocab.get(key, 0) + n
            vocab = new_vocab
        return merges

    docs = table(spark, sf_dir, "documents")
    sample = [
        r[0]
        for r in docs.orderBy("doc_id").limit(256).select("text").collect()
    ]
    got = bpe_train(
        docs, "text", "doc_id", n_merges=40, train_cap=256
    )
    assert got == recount_train(sample, 40)

    tie_df = _df(spark, ["ab ab cd cd", "ef ef gh gh", "ab cd ef gh"])
    got2 = bpe_train(tie_df, "text", "id", n_merges=10)
    texts2 = ["ab ab cd cd", "ef ef gh gh", "ab cd ef gh"]
    assert got2 == recount_train(texts2, 10)
