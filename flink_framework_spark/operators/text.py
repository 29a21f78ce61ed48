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


def train_char_ngram_langid(
    df: DataFrame, text_col: str = "text", label_col: str = "lang",
    n: int = 2, top_k: int = 60,
) -> dict[str, list[str]]:
    """Train a char-n-gram language-ID model: per language, the top-k
    most frequent character n-grams. The profile set is tiny (langs x
    top_k strings) — a driver-side artifact, broadcast into the
    predict UDF by closure. Training aggregates per-partition counts
    (one shuffle on language)."""
    rows = (
        df.select(F.col(label_col).alias("l"), F.lower(F.col(text_col)).alias("t"))
        .groupBy("l")
        .agg(F.concat_ws(" ", F.collect_list("t")).alias("txt"))
        .collect()
    )
    model: dict[str, list[str]] = {}
    for r in rows:
        grams = Counter(
            r["txt"][i : i + n] for i in range(len(r["txt"]) - n + 1)
        )
        model[r["l"]] = [g for g, _ in grams.most_common(top_k)]
    return model


def predict_lang(
    df: DataFrame, model: dict[str, list[str]], text_col: str = "text",
    out_col: str = "pred_lang", n: int = 2,
) -> DataFrame:
    """Classify each document to the language whose n-gram profile has
    the highest rank-weighted overlap with the document's n-grams."""
    profiles = {
        lang: {g: len(grams) - i for i, g in enumerate(grams)}
        for lang, grams in model.items()
    }

    @F.pandas_udf(StringType())
    def _predict(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            t = (t or "").lower()
            grams = Counter(t[i : i + n] for i in range(len(t) - n + 1))
            best, best_score = None, -1.0
            for lang in sorted(profiles):
                score = sum(
                    cnt * profiles[lang].get(g, 0) for g, cnt in grams.items()
                )
                if score > best_score:
                    best, best_score = lang, float(score)
            out.append(best)
        return pd.Series(out)

    # NOTE: deliberately no repartition here — fanning a pandas UDF out
    # over many tiny partitions costs a Python worker spin-up (plus a
    # pickled model closure) per partition, which measured 3x slower
    # than one worker streaming Arrow batches at this corpus size. At
    # real scale the input arrives already partitioned.
    return df.withColumn(out_col, _predict(F.col(text_col)))
