"""K4 extended: text-analysis queries over the documents table —
quality scoring, BPE-ish token counting, bag-of-words fingerprinting,
language ID. Operators live in ``operators.text``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import round_duck
from flink_framework_spark.io import table
from flink_framework_spark.operators.text import (
    bow_fingerprint,
    predict_lang,
    quality_score,
    repetition_stats,
    token_count,
    train_char_ngram_langid,
    words,
)
from flink_framework_spark.registry import register


@register(
    "q_text_quality",
    family="K",
    oracle="""
WITH t AS (
  SELECT doc_id, n_chars, string_split(lower(trim(text)), ' ') AS w
  FROM documents),
q AS (
  SELECT doc_id,
         CAST(len(w) AS DOUBLE) AS nw,
         CAST(len(list_filter(w, x -> x = 'a' OR x = 'the')) AS DOUBLE) AS ns,
         (CAST(n_chars AS DOUBLE) - (CAST(len(w) AS DOUBLE) - 1))
           / CAST(len(w) AS DOUBLE) AS awl
  FROM t)
SELECT doc_id,
       CAST(nw AS BIGINT) AS n_words,
       ROUND(ns / nw, 4) AS stop_ratio,
       ROUND(awl, 4) AS avg_wlen,
       ROUND(0.5 * LEAST(nw / 60.0, 1.0)
             + 0.3 * (1.0 - ns / nw)
             + 0.2 * LEAST(awl / 6.0, 1.0), 4) AS quality
FROM q
""",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality score: saturating length reward,
    non-stopword ratio, average word length (operators.text)."""
    docs = table(spark, sf_dir, "documents")
    cols = quality_score(F.col("text"), F.col("n_chars"))
    return docs.select("doc_id", *[c.alias(n) for n, c in cols.items()])


@register(
    "q_text_tokens",
    family="K",
    oracle="""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len(regexp_extract_all(lower(text),
                    '([a-z]{1,4}|[0-9]{1,3})', 1))) AS BIGINT) AS total_tokens
FROM documents GROUP BY source
""",
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting under a BPE-ish greedy chunking regex, rolled up
    per source — the 'how many training tokens per provider' query."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).alias("total_tokens"),
    )


@register(
    "q_text_fingerprint",
    family="K",
    oracle="""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(
           string_split(lower(trim(text)), ' '))), ' ')) AS fp
FROM documents
""",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive bag-of-words fingerprint per document — the
    first-stage fuzzy-dedup key (robust to token reordering)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", bow_fingerprint(F.col("text")).alias("fp"))


@register(
    "q_text_langid",
    family="K",
    oracle="""
WITH train AS (
  SELECT lang AS l, lower(text) AS t
  FROM documents WHERE doc_id % 3 = 0
  QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY md5(lower(text)), lower(text)) <= 16384),
tg AS (
  SELECT l, unnest(list_transform(range(1, length(t)),
                                  i -> substring(t, i, 2))) AS g
  FROM train WHERE length(t) >= 2),
cnt AS (SELECT l, g, COUNT(*) AS c FROM tg GROUP BY l, g),
prof60 AS (
  SELECT l, g, rk FROM (
    SELECT l, g, ROW_NUMBER() OVER (PARTITION BY l
                    ORDER BY c DESC, g) AS rk
    FROM cnt) x WHERE rk <= 60),
profw AS (
  SELECT l, g, COUNT(*) OVER (PARTITION BY l) - rk + 1 AS w FROM prof60),
docs AS (SELECT doc_id, lang, lower(text) AS t FROM documents),
dg AS (
  SELECT doc_id, g, COUNT(*) AS cg FROM (
    SELECT doc_id, unnest(list_transform(range(1, length(t)),
                                         i -> substring(t, i, 2))) AS g
    FROM docs WHERE length(t) >= 2) y GROUP BY doc_id, g),
langs AS (SELECT DISTINCT l FROM train),
scores AS (
  SELECT d.doc_id, d.lang, langs.l AS cand,
         COALESCE(SUM(dg.cg * profw.w), 0) AS score
  FROM docs d
  CROSS JOIN langs
  LEFT JOIN dg ON dg.doc_id = d.doc_id
  LEFT JOIN profw ON profw.l = langs.l AND profw.g = dg.g
  GROUP BY d.doc_id, d.lang, langs.l),
best AS (
  SELECT doc_id, lang, cand,
         ROW_NUMBER() OVER (PARTITION BY doc_id
             ORDER BY score DESC, cand) AS rn
  FROM scores)
SELECT lang, cand AS pred_lang, CAST(COUNT(*) AS BIGINT) AS n
FROM best WHERE rn = 1 GROUP BY lang, cand
""",
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-n-gram language ID. Train on the corpus labels, predict,
    report the confusion counts. Upgraded from rows-only to a LIVE
    oracle: profile training (per-lang top-60 bigram window over the
    capped md5-ordered sample) and rank-weighted-overlap scoring are
    pure integer arithmetic, so DuckDB re-derives the whole
    classifier exactly — argmax ties resolve to the first language in
    sorted order on both sides. The fixture vocabulary carries no
    real language signal, so accuracy here is incidental — the
    *operator* is accuracy-tested on a genuinely multilingual corpus
    in tests/test_text.py."""
    docs = table(spark, sf_dir, "documents")
    # train on a deterministic 1/3 subset (profiles saturate quickly;
    # production would train the tiny model offline on a sample)
    model = train_char_ngram_langid(docs.filter(F.col("doc_id") % 3 == 0))
    return (
        predict_lang(docs, model)
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_text_repetition",
    family="K",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
c AS (
  SELECT doc_id, word, COUNT(*) AS cnt
  FROM (SELECT doc_id, UNNEST(w) AS word FROM w) GROUP BY 1, 2),
d AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words, MAX(cnt) AS top,
         COUNT(*) AS nd
  FROM c GROUP BY 1),
b AS (
  SELECT doc_id,
         len(list_distinct(list_transform(range(1, len(w)),
             i -> concat(w[i], ' ', w[i+1])))) AS bd,
         len(w) - 1 AS bt
  FROM w)
SELECT d.doc_id, n_words,
       ROUND(top / CAST(n_words AS DOUBLE), 4) AS top_word_frac,
       ROUND(1.0 - nd / CAST(n_words AS DOUBLE), 4) AS dup_word_frac,
       CASE WHEN bt > 0 THEN ROUND(1.0 - bd / CAST(bt AS DOUBLE), 4)
            ELSE 0.0 END AS dup_bigram_frac
FROM d JOIN b USING (doc_id)
""",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/boilerplate signals per document:
    top-word share, duplicate-word fraction, duplicate-bigram
    fraction (operators.text.repetition_stats — one narrow Arrow
    pass; exact integer counts, JVM-side fractions)."""
    return repetition_stats(table(spark, sf_dir, "documents"))


@register(
    "q_text_perplexity",
    family="K",
    oracle="""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(lower(trim(text)), ' ')) AS t
  FROM documents),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM toks),
vocab AS (
  SELECT t, CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot) AS p
  FROM toks GROUP BY t)
SELECT doc_id AS id, COUNT(*) AS n_tokens,
       ROUND(ROUND(AVG(-ln(p)), 6), 4) AS xent
FROM toks JOIN vocab USING (t)
GROUP BY doc_id
""",
)
def q_text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc cross-entropy under the corpus unigram LM — the
    perplexity-style outlier/quality filter
    (operators.text.unigram_cross_entropy)."""
    from flink_framework_spark.operators.text import unigram_cross_entropy

    return unigram_cross_entropy(table(spark, sf_dir, "documents"))


@register(
    "q_text_zipf",
    family="K",
    oracle="""
WITH toks AS (
  SELECT lang, UNNEST(string_split(lower(trim(text)), ' ')) AS t
  FROM documents),
tf AS (
  SELECT lang, t, CAST(COUNT(*) AS DOUBLE) AS f FROM toks GROUP BY 1, 2),
ranked AS (
  SELECT lang, f, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY f DESC, t) AS r
  FROM tf),
fit AS (
  SELECT lang,
         REGR_SLOPE(LN(f), LN(r)) AS slope,
         REGR_R2(LN(f), LN(r)) AS r2
  FROM ranked WHERE r <= 100 GROUP BY 1),
stats AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(f) AS BIGINT) AS n_tokens
  FROM tf GROUP BY 1)
SELECT s.lang, n_types, n_tokens,
       ROUND(n_types / CAST(n_tokens AS DOUBLE), 4) AS ttr,
       ROUND(ROUND(slope, 6), 4) AS zipf_slope,
       ROUND(ROUND(r2, 6), 4) AS zipf_r2
FROM stats s JOIN fit USING (lang)
""",
)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language lexical statistics for corpus profiling: vocab
    size, token count, type-token ratio, and the Zipf rank-frequency
    fit (OLS slope + R² of ln f vs ln rank over the top-100 terms) —
    the sanity panel a corpus curator reads before trusting a new
    crawl (natural text slopes near -1; near-uniform synthetic or
    boilerplate-heavy corpora flatten out, as the fixtures do).

    Plan: one explode + hash agg builds the per-lang term table; the
    rank window partitions by lang over vocab-sized input; the fit is
    a co-moment aggregate (regr_slope/regr_r2 — partial-merged like
    any avg). Linear in corpus size, vocab-bounded after the agg."""
    toks = table(spark, sf_dir, "documents").select(
        "lang", F.explode(words(F.col("text"))).alias("t")
    )
    tf = toks.groupBy("lang", "t").agg(
        F.count(F.lit(1)).cast("double").alias("f")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.desc("f"), "t")
    ranked = tf.withColumn("r", F.row_number().over(w))
    fit = (
        ranked.filter(F.col("r") <= 100)
        .groupBy("lang")
        .agg(
            F.regr_slope(F.log("f"), F.log("r")).alias("slope"),
            F.regr_r2(F.log("f"), F.log("r")).alias("r2"),
        )
    )
    stats = tf.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("f").cast("long").alias("n_tokens"),
    )
    return stats.join(fit, "lang").select(
        "lang",
        "n_types",
        "n_tokens",
        round_duck(
            F.col("n_types") / F.col("n_tokens").cast("double"), 4
        ).alias("ttr"),
        round_duck(round_duck(F.col("slope"), 6), 4).alias("zipf_slope"),
        round_duck(round_duck(F.col("r2"), 6), 4).alias("zipf_r2"),
    )


@register(
    "q_text_bigram_ppl",
    family="K",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
pairs AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
  FROM w, UNNEST(range(1, len(w))) AS t(i)),
c1 AS (
  SELECT t AS w1, CAST(COUNT(*) AS DOUBLE) AS c1
  FROM (SELECT doc_id, UNNEST(w) AS t FROM w) GROUP BY 1),
v AS (
  SELECT CAST(COUNT(DISTINCT t) AS DOUBLE) AS v
  FROM (SELECT UNNEST(w) AS t FROM w)),
c2 AS (
  SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c2 FROM pairs GROUP BY 1, 2),
prob AS (
  SELECT c2.w1, c2.w2, (c2 + 0.1) / (c1 + 0.1 * (SELECT v FROM v)) AS p
  FROM c2 JOIN c1 USING (w1))
SELECT p.doc_id AS id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(ROUND(AVG(-LN(prob.p)), 6), 4) AS xent2
FROM pairs p JOIN prob ON p.w1 = prob.w1 AND p.w2 = prob.w2
GROUP BY 1
""",
)
def q_text_bigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc cross-entropy under the corpus bigram LM with add-0.1
    smoothing (operators.text.bigram_cross_entropy) — the CCNet-style
    LM quality filter, one rung above q_text_perplexity's unigram
    model: repetitive or out-of-distribution word SEQUENCES score
    high even when their unigram mix looks normal."""
    from flink_framework_spark.operators.text import bigram_cross_entropy

    return bigram_cross_entropy(table(spark, sf_dir, "documents"))


@register(
    "q_outliers",
    family="K",
    oracle="""
WITH stats AS (
  SELECT event_type,
         AVG(value) AS mu,
         STDDEV_SAMP(value) AS sd
  FROM events GROUP BY 1)
SELECT e.event_id, e.event_type,
       ROUND(ROUND((e.value - s.mu) / s.sd, 6), 4) AS z
FROM events e JOIN stats s USING (event_type)
WHERE s.sd > 0 AND abs((e.value - s.mu) / s.sd) > 3.0
""",
)
def q_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise anomaly flags: per event type, rows more than 3
    sample standard deviations from the group mean — the data-quality
    sweep before a training batch ships. One grouped aggregate
    broadcast back onto the stream; double-rounded z absorbs
    summation-order ulps."""
    ev = table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter((F.col("sd") > 0) & (F.abs(z) > 3.0))
        .select(
            "event_id",
            "event_type",
            round_duck(round_duck(z, 6), 4).alias("z"),
        )
    )
