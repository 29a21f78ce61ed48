"""Text-analysis operators for training-data pipelines (SURVEY.md §2
K4): quality scoring, token counting, fingerprinting, language ID.

All but language ID are pure JVM expressions (codegen'd, scale-free).
Language ID is a char-n-gram profile classifier: the model is a small
driver-side artifact (like an offline-trained centroid set) applied
via a vectorized pandas UDF.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from flink_framework_spark.functions.helpers import round_duck

STOPWORDS = ("a", "the")


def words(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), " ")


def quality_score(text: Column, n_chars: Column) -> dict[str, Column]:
    """Length/stopword/word-shape quality heuristics.

    Components: saturating length reward (60 words), non-stopword
    ratio, saturating average-word-length reward (6 chars). Weights
    0.5/0.3/0.2 — the standard shape of pretraining-corpus quality
    filters; at scale this is a pure map, no shuffle.
    """
    w = words(text)
    n_words = F.size(w).cast("double")
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))).cast("double")
    stop_ratio = n_stop / n_words
    avg_wlen = (n_chars.cast("double") - (n_words - 1)) / n_words
    score = (
        F.lit(0.5) * F.least(n_words / 60.0, F.lit(1.0))
        + F.lit(0.3) * (1.0 - stop_ratio)
        + F.lit(0.2) * F.least(avg_wlen / 6.0, F.lit(1.0))
    )
    return {
        "n_words": F.size(w).cast("long"),
        "stop_ratio": round_duck(stop_ratio, 4),
        "avg_wlen": round_duck(avg_wlen, 4),
        "quality": round_duck(score, 4),
    }


# BPE-ish fixed-width chunking: greedy runs of <=4 letters / <=3 digits.
TOKEN_PATTERN = "([a-z]{1,4}|[0-9]{1,3})"


def token_count(text: Column) -> Column:
    """Token count under a BPE-ish greedy regex tokenizer (JVM-side)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_PATTERN), 1)).cast(
        "long"
    )


def bow_fingerprint(text: Column) -> Column:
    """Order-insensitive bag-of-words document fingerprint: md5 over
    the sorted distinct token list — robust to token reordering, the
    classic first-stage fuzzy-dedup key."""
    canon = F.array_join(F.sort_array(F.array_distinct(words(text))), " ")
    return F.md5(F.encode(canon, "UTF-8"))


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document — the standard
    boilerplate/degenerate-text filters a pretraining pipeline runs:

    - ``top_word_frac``: share of the document taken by its single
      most frequent word (high -> keyword stuffing / boilerplate);
    - ``dup_word_frac``: 1 - distinct/total words;
    - ``dup_bigram_frac``: 1 - distinct/total word bigrams (high ->
      looping generation / templated text).

    Plan shape (r11): ONE narrow Arrow pass, no shuffle and no join —
    every signal is a per-document statistic, and a hash-map word
    count inside the kernel is O(|doc|) time and memory (a 10k-word
    document is a 10k-entry Counter), so the per-row form scales to
    any document that fits in a row. The previous spelling (explode +
    two-level hash aggregate for the mode, hashed-bigram higher-order
    expressions for distinctness) shuffled |corpus| exploded tokens
    and paid interpreted per-element lambda dispatch; values are
    unchanged (same integers, same JVM fraction expressions).
    """
    # r11 (guide §4.2): the explode + two-level aggregate and the
    # hashed-bigram higher-order expressions cost interpreted
    # per-element dispatches (~2 s at sf0.1); one Arrow pass computes
    # the SAME integers exactly — token counts via a C-backed Counter
    # over the identical single-space split (trim/lower replicated:
    # the corpus is value-checked by the oracle either way), bigram
    # distinctness as distinct token PAIRS, which equals the oracle's
    # distinct-string count and the hashed-slice count everywhere the
    # 64-bit hash is collision-free (the only regime the previous
    # spelling was correct in anyway). The fractions keep the exact
    # JVM expressions below, so the doubles are unchanged. Null-text
    # docs are dropped up front — the inner join dropped them before.
    import pandas as pd

    @F.pandas_udf(
        "n_words long, top long, n_distinct long, "
        "bi_distinct int, bi_total int"
    )
    def _stats(texts: pd.Series) -> pd.DataFrame:
        from collections import Counter

        rows = []
        for t in texts:
            toks = (t or "").strip(" ").lower().split(" ")
            c = Counter(toks)
            nw = len(toks)
            bt = nw - 1 if nw > 1 else 0
            bd = len(set(zip(toks, toks[1:]))) if bt else 0
            rows.append((nw, max(c.values()), len(c), bd, bt))
        return pd.DataFrame(
            rows,
            columns=["n_words", "top", "n_distinct", "bi_distinct", "bi_total"],
        )

    stats = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), _stats(F.col(text_col)).alias("__s")
    )
    nw = F.col("__s.n_words").cast("double")
    return stats.select(
        id_col,
        F.col("__s.n_words").cast("long").alias("n_words"),
        round_duck(F.col("__s.top") / nw, 4).alias("top_word_frac"),
        round_duck(
            F.lit(1.0) - F.col("__s.n_distinct") / nw, 4
        ).alias("dup_word_frac"),
        F.when(F.col("__s.bi_total") > 0, round_duck(
            F.lit(1.0)
            - F.col("__s.bi_distinct") / F.col("__s.bi_total").cast("double"),
            4,
        )).otherwise(F.lit(0.0)).alias("dup_bigram_frac"),
    )


def train_char_ngram_langid(
    df: DataFrame, text_col: str = "text", label_col: str = "lang",
    n: int = 2, top_k: int = 60, train_cap: int = 16384,
) -> dict[str, list[str]]:
    """Train a char-n-gram language-ID model: per language, the top-k
    most frequent character n-grams.

    Fully distributed: n-grams are extracted with a JVM higher-order
    function (``transform(sequence(..), i -> substring(..))``),
    counted with a hash aggregate on ``(lang, gram)``, and cut to the
    per-language top-k with a window — only ``langs x top_k`` tiny
    rows ever reach the driver, so training is safe at any corpus
    size. ``train_cap`` additionally bounds the per-language sample to
    a deterministic subset (lowest md5(text) first — same ``train_cap``
    discipline as ``similarity.train_ivf_centroids``), because a
    frequency profile saturates long before the full 100 TB corpus.
    Ties rank deterministically (count desc, gram asc)."""
    from pyspark.sql import Window

    base = df.select(
        F.col(label_col).alias("l"), F.lower(F.col(text_col)).alias("t")
    )
    if train_cap is not None:
        wcap = Window.partitionBy("l").orderBy(F.md5("t"), "t")
        base = (
            base.withColumn("__rn", F.row_number().over(wcap))
            .filter(F.col("__rn") <= train_cap)
            .drop("__rn")
        )
    grams = base.select(
        "l",
        F.explode(
            F.when(
                F.length("t") >= n,
                F.expr(f"transform(sequence(1, length(t) - {n - 1}), i -> substring(t, i, {n}))"),
            ).otherwise(F.array())
        ).alias("g"),
    )
    wtop = Window.partitionBy("l").orderBy(F.desc("cnt"), "g")
    top = (
        grams.groupBy("l", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rk", F.row_number().over(wtop))
        .filter(F.col("rk") <= top_k)
        .collect()
    )
    model: dict[str, list[str]] = {}
    for r in sorted(top, key=lambda r: (r["l"], r["rk"])):
        model.setdefault(r["l"], []).append(r["g"])
    return model


def predict_lang(
    df: DataFrame, model: dict[str, list[str]], text_col: str = "text",
    out_col: str = "pred_lang", n: int = 2,
) -> DataFrame:
    """Classify each document to the language whose n-gram profile has
    the highest rank-weighted overlap with the document's n-grams."""
    # inverted index gram -> [(lang_idx, rank_weight)]: scoring then
    # touches each document gram once per PROFILE CONTAINING it (few)
    # instead of once per language — measured ~2x on the sf0.1 corpus.
    # Languages are index-ordered sorted, and ties resolve to the
    # lowest index (np-style first armgax) == the previous
    # first-in-sorted-order-wins rule.
    langs = sorted(model)
    inv: dict[str, list[tuple[int, int]]] = {}
    for li, lang in enumerate(langs):
        grams_l = model[lang]
        for i, g in enumerate(grams_l):
            inv.setdefault(g, []).append((li, len(grams_l) - i))

    @F.pandas_udf(StringType())
    def _predict(texts: pd.Series) -> pd.Series:
        out = []
        nl = len(langs)
        for t in texts:
            t = (t or "").lower()
            grams = Counter(t[i : i + n] for i in range(len(t) - n + 1))
            scores = [0] * nl
            for g, cnt in grams.items():
                for li, w in inv.get(g, ()):
                    scores[li] += cnt * w
            best, best_score = None, -1.0
            for li in range(nl):
                if scores[li] > best_score:
                    best, best_score = langs[li], float(scores[li])
            out.append(best)
        return pd.Series(out)

    # NOTE: deliberately no repartition here — fanning a pandas UDF out
    # over many tiny partitions costs a Python worker spin-up (plus a
    # pickled model closure) per partition, which measured 3x slower
    # than one worker streaming Arrow batches at this corpus size. At
    # real scale the input arrives already partitioned.
    return df.withColumn(out_col, _predict(F.col(text_col)))


def bigram_cross_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.1,
) -> DataFrame:
    """Per-document cross-entropy under a corpus bigram LM with add-α
    smoothing — the CCNet/KenLM-style quality signal one rung above
    the unigram filter: ``avg(-ln p(w2|w1))`` with
    ``p(w2|w1) = (C(w1,w2) + α) / (C(w1) + α·V)``.

    Plan (all JVM expressions): one narrow pass forms per-doc bigram
    structs (indexed ``transform`` over the token array — no
    positional self-join), a hash agg builds the bigram table, the
    unigram-context counts and vocab size are two more aggs, and the
    per-pair probability table joins back onto the doc bigrams on the
    (w1, w2) key — shuffle on the pair key, probability side
    broadcast when it fits. Linear in corpus size; the bigram table
    is the only super-vocab state and it partial-aggregates
    map-side. Docs with fewer than 2 tokens have no bigrams and drop
    out (the oracle does the same).

    Returns (id, n_bigrams, xent2), double-rounded 6→4 to absorb
    summation-order ulps.
    """
    w = words(F.col(text_col))
    # materialize the token array as a named projection first so the
    # indexed transform references it once (expression-duplication
    # discipline, see SCALING.md)
    pairs = df.select(F.col(id_col), w.alias("__w")).select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(slice(__w, 1, size(__w) - 1), "
                "(x, i) -> struct(x AS w1, element_at(__w, i + 2) AS w2))"
            )
        ).alias("__b"),
    ).select(F.col(id_col), F.col("__b.w1"), F.col("__b.w2"))

    toks = df.select(F.explode(w).alias("__t"))
    c1 = toks.groupBy(F.col("__t").alias("w1")).agg(
        F.count(F.lit(1)).cast("double").alias("__c1")
    )
    vocab_n = toks.agg(
        F.count_distinct("__t").cast("double").alias("__v")
    )
    c2 = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("__c2")
    )
    prob = (
        c2.join(c1, "w1")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "w1",
            "w2",
            (
                (F.col("__c2") + F.lit(alpha))
                / (F.col("__c1") + F.lit(alpha) * F.col("__v"))
            ).alias("__p"),
        )
    )
    return (
        pairs.join(prob, ["w1", "w2"])
        .groupBy(F.col(id_col).alias("id"))
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            round_duck(round_duck(F.avg(-F.log("__p")), 6), 4).alias(
                "xent2"
            ),
        )
    )


def unigram_cross_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document cross-entropy under the corpus unigram language
    model — the classic perplexity-style quality signal (documents
    far from the corpus distribution score high): for each doc,
    ``avg(-ln p(token))`` with p estimated from the whole corpus.

    Plan: one explode + hash agg builds the unigram table (vocab-
    sized), a second explode joins tokens back to their probabilities
    (shuffle on term; Catalyst broadcasts the vocab side when it
    fits) and aggregates per doc. Double-rounding on the output
    absorbs summation-order ulps (same discipline as the TPC-H
    revenue sums).

    Returns (id, n_tokens, xent).
    """
    toks = df.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("__t")
    )
    totals = toks.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    vocab = (
        toks.groupBy("__t")
        .agg(F.count(F.lit(1)).cast("double").alias("__c"))
        .crossJoin(F.broadcast(totals))
        .select("__t", (F.col("__c") / F.col("__n")).alias("__p"))
    )
    return (
        toks.join(vocab, "__t")
        .groupBy(F.col(id_col).alias("id"))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            round_duck(round_duck(F.avg(-F.log("__p")), 6), 4).alias("xent"),
        )
    )
