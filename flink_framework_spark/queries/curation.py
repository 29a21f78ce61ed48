"""Corpus-curation queries (operators.curation): deterministic
splits/sampling, benchmark decontamination, PII scrubbing, sequence
packing — the pipeline steps between raw corpus and tokenizer, each
oracle-checked (derived randomness via md5 makes them
SQL-reproducible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.curation import (
    assign_split,
    decontaminate,
    dedup_passages,
    domain_mixture,
    pack_sequences,
    scrub_pii,
    stratified_sample,
    weighted_sample,
)
from flink_framework_spark.registry import register

# shared oracle fragment: the hash_bucket formula in DuckDB
_BUCKET = "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"


@register(
    "q_split_assign",
    family="K",
    oracle=f"""
WITH b AS (SELECT lang, {_BUCKET} AS bk FROM documents)
SELECT CASE WHEN bk < 90 THEN 'train'
            WHEN bk < 95 THEN 'val'
            ELSE 'test' END AS split,
       lang, COUNT(*) AS n
FROM b GROUP BY 1, 2
""",
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by key hash (leakage-
    safe: decided per doc_id, stable under reruns and appends)."""
    docs = assign_split(table(spark, sf_dir, "documents"), "doc_id")
    return docs.groupBy("split", "lang").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_strat_sample",
    family="K",
    oracle=f"""
SELECT lang, COUNT(*) AS n FROM (
  SELECT lang, {_BUCKET} AS bk FROM documents) b
WHERE bk < CASE lang WHEN 'en' THEN 30 WHEN 'zh' THEN 80 ELSE 100 END
GROUP BY lang
""",
)
def q_strat_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-rebalancing stratified sample: downsample the dominant
    language, keep the tail — per-stratum hash quotas, no RNG state,
    no shuffle."""
    docs = stratified_sample(
        table(spark, sf_dir, "documents"),
        strata_col="lang",
        key_col="doc_id",
        fraction_pct={"en": 30, "zh": 80},
        default_pct=100,
    )
    return docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_decontam",
    family="K",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
grams AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 6),
           i -> concat(w[i], ' ', w[i+1], ' ', w[i+2], ' ', w[i+3], ' ',
                       w[i+4], ' ', w[i+5], ' ', w[i+6], ' ', w[i+7]))) AS g
  FROM toks WHERE len(w) >= 8),
bench AS (
  SELECT DISTINCT UNNEST(g) AS gram FROM grams WHERE doc_id % 97 = 0),
contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT doc_id, UNNEST(g) AS gram FROM grams WHERE doc_id % 97 <> 0) t
  JOIN bench USING (gram))
SELECT d.doc_id FROM documents d
WHERE d.doc_id % 97 <> 0
  AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
""",
)
def q_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark n-gram decontamination: drop training docs sharing
    any 8-gram with the held-out slice (doc_id % 97 == 0 stands in for
    the eval set; on the fixtures the planted near-dups make the
    overlap non-trivial)."""
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return decontaminate(train, bench).select("doc_id")


@register(
    "q_pii_scrub",
    family="K",
    oracle="""
WITH contact AS (
  SELECT c_custkey,
         concat(c_name, ' <c', CAST(c_custkey AS VARCHAR),
                '@example.com> or +1 555-867-',
                lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')) AS text
  FROM customer)
SELECT c_custkey,
       regexp_replace(
         regexp_replace(
           regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\\+?[0-9]{1,3}[- .]?\\(?[0-9]{3}\\)?[- .]?[0-9]{3}[- .]?[0-9]{4}',
           '<PHONE>', 'g'),
         '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g')
         AS clean_text,
       CAST(len(regexp_extract_all(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) +
            len(regexp_extract_all(
              regexp_replace(text,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
              '\\+?[0-9]{1,3}[- .]?\\(?[0-9]{3}\\)?[- .]?[0-9]{3}[- .]?[0-9]{4}')) +
            len(regexp_extract_all(
              regexp_replace(
                regexp_replace(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\\+?[0-9]{1,3}[- .]?\\(?[0-9]{3}\\)?[- .]?[0-9]{3}[- .]?[0-9]{4}',
                '<PHONE>', 'g'),
              '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))
         AS BIGINT) AS n_redactions
FROM contact
""",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction with audit counts over a constructed contact
    string (the fixture corpus carries no natural PII, so the query
    derives one deterministic email + phone per customer row — both
    engines build and scrub the identical string)."""
    cu = table(spark, sf_dir, "customer")
    contact = cu.select(
        "c_custkey",
        F.concat(
            F.col("c_name"),
            F.lit(" <c"),
            F.col("c_custkey").cast("string"),
            F.lit("@example.com> or +1 555-867-"),
            F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return scrub_pii(contact).select("c_custkey", "clean_text", "n_redactions")


@register(
    "q_pack_sequences",
    family="K",
    oracle="""
WITH tok AS (
  SELECT lang, doc_id,
         CAST(len(regexp_extract_all(lower(text),
              '([a-z]{1,4}|[0-9]{1,3})', 1)) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT lang, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM tok)
SELECT lang, doc_id, n_tokens,
       CAST(FLOOR((cum - n_tokens) / 2048.0) AS BIGINT) AS bin,
       CAST((cum - n_tokens) % 2048 AS BIGINT) AS bin_offset
FROM c
""",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-budget sequence packing per language shard: one
    windowed cumsum pass assigns each doc its training-sequence bin
    and offset (BPE-ish regex token counts, same tokenizer as
    q_text_tokens)."""
    return pack_sequences(
        table(spark, sf_dir, "documents"),
        target_tokens=2048,
        partition_cols=("lang",),
    )


@register(
    "q_domain_mix",
    family="K",
    oracle="""
WITH a AS (
  SELECT source AS domain, COUNT(*) AS n_docs,
         CAST(SUM(len(regexp_extract_all(lower(text),
              '([a-z]{1,4}|[0-9]{1,3})', 1))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1),
t AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS tot FROM a)
SELECT domain, n_docs, n_tokens,
       ROUND(n_tokens / tot, 6) AS actual_share,
       CASE domain WHEN 'src0' THEN 0.3 WHEN 'src1' THEN 0.2
                   WHEN 'src2' THEN 0.1 ELSE 0.0 END AS target_share,
       ROUND((CASE domain WHEN 'src0' THEN 0.3 WHEN 'src1' THEN 0.2
                          WHEN 'src2' THEN 0.1 ELSE 0.0 END)
             / (n_tokens / tot), 4) AS repeat_factor
FROM a, t
""",
)
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting report (DoReMi/Pile-style): actual
    vs target token share per source and the repeat factor a sampler
    applies to hit the target mixture; unlisted domains target 0."""
    return domain_mixture(
        table(spark, sf_dir, "documents"),
        targets={"src0": 0.3, "src1": 0.2, "src2": 0.1},
    )


@register(
    "q_split_cluster_safe",
    family="K",
    oracle="""
WITH RECURSIVE toks AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS w FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
             i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS s
  FROM toks WHERE len(w) >= 3),
kb AS (SELECT doc_id, s, list_sort(s)[1] AS mink FROM sh),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kb a JOIN kb b ON a.mink = b.mink AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
und AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, e.b FROM reach r JOIN und e ON r.b = e.a WHERE e.b <> r.a),
comp AS (
  SELECT a AS node, LEAST(a, MIN(b)) AS cluster FROM reach GROUP BY a),
want AS (
  SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node)
SELECT doc_id, cluster,
       CASE WHEN bk < 90 THEN 'train' WHEN bk < 95 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, cluster,
             CAST(('0x' || substring(md5(CAST(cluster AS VARCHAR)), 1, 8))
                  AS BIGINT) % 100 AS bk
      FROM want) x
""",
)
def q_split_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate documents
    must land on the SAME side, or eval scores silently measure
    memorization — so the split key is the near-dup CLUSTER (min-
    shingle-blocked n-gram pairs -> connected components), not the
    document. Live oracle: pairs, the transitive closure (recursive
    CTE), and the hash-bucket split are all recomputed in DuckDB.
    Spark side: the CC loop is operators.iterative.connected_components
    (per-round lineage cuts, same exemption as q_dedup_clusters)."""
    from flink_framework_spark.operators.curation import assign_split
    from flink_framework_spark.operators.dedup import ngram_near_dup_pairs
    from flink_framework_spark.operators.iterative import connected_components

    docs = table(spark, sf_dir, "documents")
    pairs = ngram_near_dup_pairs(docs, threshold=0.5)
    comps = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        vertices=docs.select(F.col("doc_id").alias("id")),
    )
    labeled = comps.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster")
    )
    return assign_split(labeled, "cluster").select("doc_id", "cluster", "split")


@register(
    "q_curation_pipeline",
    family="K",
    oracle="""
WITH base AS (
  SELECT doc_id, text, n_chars,
         string_split(lower(trim(text)), ' ') AS w,
         CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS ntok
  FROM documents WHERE doc_id % 97 <> 0),
qual AS (
  SELECT doc_id, text, ntok, w,
         ROUND(0.5 * LEAST(CAST(len(w) AS DOUBLE) / 60.0, 1.0)
             + 0.3 * (1.0 - CAST(len(list_filter(w, x -> x = 'a' OR x = 'the')) AS DOUBLE)
                            / len(w))
             + 0.2 * LEAST(((CAST(n_chars AS DOUBLE) - (len(w) - 1)) / len(w)) / 6.0,
                           1.0), 4) AS q,
         md5(lower(trim(text))) AS fp
  FROM base),
sq AS (SELECT * FROM qual WHERE q >= 0.7),
se AS (SELECT * FROM sq
       QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1),
sh AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
           i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS s
  FROM se WHERE len(w) >= 3),
kb AS (SELECT doc_id, s, list_sort(s)[1] AS mink FROM sh),
ndrop AS (
  SELECT DISTINCT b.doc_id
  FROM kb a JOIN kb b ON a.mink = b.mink AND a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5),
sn AS (SELECT * FROM se WHERE doc_id NOT IN (SELECT doc_id FROM ndrop)),
grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 6),
           i -> concat(w[i], ' ', w[i+1], ' ', w[i+2], ' ', w[i+3], ' ',
                       w[i+4], ' ', w[i+5], ' ', w[i+6], ' ', w[i+7])))) AS gram
  FROM sn WHERE len(w) >= 8),
bgrams AS (
  SELECT DISTINCT unnest(list_transform(range(1, len(w) - 6),
           i -> concat(w[i], ' ', w[i+1], ' ', w[i+2], ' ', w[i+3], ' ',
                       w[i+4], ' ', w[i+5], ' ', w[i+6], ' ', w[i+7]))) AS gram
  FROM (SELECT string_split(lower(trim(text)), ' ') AS w
        FROM documents WHERE doc_id % 97 = 0)
  WHERE len(w) >= 8),
contam AS (SELECT DISTINCT doc_id FROM grams JOIN bgrams USING (gram)),
sd AS (SELECT * FROM sn WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
splits AS (
  SELECT CASE WHEN bk < 90 THEN 'train' WHEN bk < 95 THEN 'val'
              ELSE 'test' END AS sp, ntok
  FROM (SELECT ntok,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 100 AS bk
        FROM sd) x)
SELECT '1_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS n_tokens FROM base
UNION ALL SELECT '2_quality', COUNT(*), CAST(SUM(ntok) AS BIGINT) FROM sq
UNION ALL SELECT '3_exact_dedup', COUNT(*), CAST(SUM(ntok) AS BIGINT) FROM se
UNION ALL SELECT '4_near_dedup', COUNT(*), CAST(SUM(ntok) AS BIGINT) FROM sn
UNION ALL SELECT '5_decontam', COUNT(*), CAST(SUM(ntok) AS BIGINT) FROM sd
UNION ALL SELECT 'split:' || sp, COUNT(*), CAST(SUM(ntok) AS BIGINT)
FROM splits GROUP BY sp
""",
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel (operators.curation.curation_pipeline):
    quality gate -> exact dedup -> blocked n-gram near-dedup ->
    benchmark decontamination -> split assignment, with per-stage doc
    and token counts. The oracle recomputes the ENTIRE composition in
    DuckDB, so a bug in any stage shifts a funnel row and fails the
    hash."""
    from flink_framework_spark.operators.curation import curation_pipeline

    return curation_pipeline(table(spark, sf_dir, "documents"))


@register(
    "q_dsir_weights",
    family="K",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, (lang = 'en') AS tgt,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
  FROM documents),
b AS (
  SELECT doc_id, tgt,
         CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % 256 AS bk
  FROM toks),
cnt AS (
  SELECT bk, COUNT(*) AS cr, COUNT(*) FILTER (tgt) AS ct
  FROM b GROUP BY bk),
tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM cnt),
lr AS (
  SELECT bk, ln((ct + 1.0) / (nt + 256.0)) - ln((cr + 1.0) / (nr + 256.0)) AS lr
  FROM cnt, tot),
doc AS (
  SELECT b.doc_id, SUM(lr.lr) AS raw_lr
  FROM b JOIN lr USING (bk) GROUP BY b.doc_id),
sc AS (
  SELECT doc_id, ROUND(raw_lr, 4) AS logratio,
         ROUND(raw_lr
               - ln(-ln((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                              AS BIGINT) + 1.0) / 4294967297.0)), 6) AS score
  FROM doc)
SELECT doc_id, logratio, score,
       CASE WHEN ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) <= 100
            THEN 1 ELSE 0 END AS selected
FROM sc
""",
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling toward the English slice: hashed
    unigram log-likelihood-ratio weight per document + deterministic
    Gumbel-top-100 selection (operators.curation.dsir_importance).
    The oracle re-derives both hashed LMs, every weight, and the
    selection cut in DuckDB; the oracle's global ROW_NUMBER is
    DuckDB-side only — the Spark plan cuts with TakeOrdered + a 1-row
    broadcast key, no single-partition window."""
    from flink_framework_spark.operators.curation import dsir_importance

    return dsir_importance(
        table(spark, sf_dir, "documents"),
        target_pred=F.col("lang") == "en",
        n_buckets=256,
        select_n=100,
    )


@register(
    "q_weighted_sample",
    family="K",
    oracle="""
WITH pri AS (
  SELECT lang, doc_id,
         ROUND(-ln((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) + 1.0) / 4294967297.0)
               / CAST(n_chars AS DOUBLE), 10) AS pri
  FROM documents)
SELECT lang, doc_id, pri FROM (
  SELECT lang, doc_id, pri,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY pri, doc_id) AS rn
  FROM pri) t
WHERE rn <= 25
""",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-Res,
    derived randomness): 25 docs per language, selection probability
    proportional to document length
    (operators.curation.weighted_sample)."""
    return weighted_sample(
        table(spark, sf_dir, "documents"),
        key_col="doc_id",
        weight_col="n_chars",
        n=25,
        strata_col="lang",
    ).select("lang", "doc_id", "pri")


@register(
    "q_dedup_passages",
    family="K",
    oracle="""
WITH w AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(words, i*8+1, i*8+8), ' ') AS win
  FROM (SELECT doc_id, string_split(trim(text), ' ') AS words
        FROM documents),
       UNNEST(range(CAST(ceil(len(words)/8.0) AS BIGINT))) AS t(i)),
freq AS (
  SELECT md5(win) AS f, COUNT(DISTINCT doc_id) AS nd
  FROM w GROUP BY 1)
SELECT w.doc_id,
       COUNT(*) AS n_passages,
       COUNT(*) FILTER (freq.nd >= 2) AS n_dup_passages,
       ROUND(COUNT(*) FILTER (freq.nd >= 2)
             / CAST(COUNT(*) AS DOUBLE), 4) AS dup_frac,
       md5(COALESCE(string_agg(CASE WHEN freq.nd < 2 THEN w.win END,
                               ' ' ORDER BY w.pos), '')) AS clean_fp
FROM w JOIN freq ON freq.f = md5(w.win)
GROUP BY 1
""",
)
def q_dedup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level cross-document dedup (RefinedWeb line-dedup
    shape): 8-word passages occurring in >= 2 distinct documents are
    stripped and each document is rebuilt in order (clean_fp = md5 of
    the rebuilt text). Equi-shuffles only — fingerprint aggregate,
    fingerprint join, per-doc aggregate; no corpus-wide window
    (operators.curation.dedup_passages)."""
    return dedup_passages(table(spark, sf_dir, "documents"))


@register(
    "q_export_shards",
    family="K",
    oracle=r"""
WITH s AS (
  SELECT CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 16 AS shard,
         doc_id,
         len(string_split_regex(lower(trim(text)), '\s+')) AS ntok,
         length(text) AS nch
  FROM documents)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS n_tokens,
       CAST(SUM(nch) AS BIGINT) AS n_chars,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM s GROUP BY shard
""",
)
def q_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export manifest: deterministic hash-bucket shard
    assignment (narrow map — no global sort; append-stable) rolled up
    to the per-shard stats a dataloader config consumes
    (operators.curation.shard_manifest; write_training_shards
    materializes the hive-partitioned export itself)."""
    from flink_framework_spark.operators.curation import shard_manifest

    return shard_manifest(table(spark, sf_dir, "documents"), n_shards=16)
