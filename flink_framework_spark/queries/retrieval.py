"""Corpus-retrieval queries (K-family extension): BM25 search,
TF-IDF keyword extraction, token-window chunking. Operators live in
``operators.retrieval``; each query has a live DuckDB oracle spelled
with the identical double-op sequence (see the operator docstrings
for the ulp-parity rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_framework_spark.io import table
from flink_framework_spark.operators.retrieval import (
    bm25_topk,
    chunk_documents,
    tfidf_keywords,
)
from flink_framework_spark.registry import register

_QUERY_TERMS = ["hash", "join", "merge"]


@register(
    "q_bm25_topk",
    family="K",
    oracle="""
WITH dl AS (
  SELECT doc_id,
         CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS dl
  FROM documents),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) AS tot_dl
  FROM dl),
post AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id,
               UNNEST(string_split(lower(trim(text)), ' ')) AS term
        FROM documents)
  WHERE term IN ('hash', 'join', 'merge')
  GROUP BY 1, 2),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df_t FROM post GROUP BY 1)
SELECT doc_id, score FROM (
  SELECT p.doc_id,
         ROUND(SUM(
           ln(1.0 + ((s.n_docs - f.df_t) + 0.5) / (f.df_t + 0.5))
           * ((CAST(p.tf AS DOUBLE) * 2.2)
              / (CAST(p.tf AS DOUBLE)
                 + (1.2 * (0.25 + ((0.75 * CAST(d.dl AS DOUBLE))
                                   / (s.tot_dl / s.n_docs))))))
         ), 4) AS score
  FROM post p
  JOIN dfreq f USING (term)
  JOIN dl d USING (doc_id)
  CROSS JOIN stats s
  GROUP BY 1) t
ORDER BY score DESC, doc_id
LIMIT 20
""",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 over the documents table for the query
    {hash, join, merge}: inverted index semi-filtered to query terms
    by a broadcast join, 1-row corpus stats broadcast into the
    scorer, TakeOrdered top-k (operators.retrieval.bm25_topk)."""
    return bm25_topk(table(spark, sf_dir, "documents"), _QUERY_TERMS, k=20)


@register(
    "q_tfidf_keywords",
    family="K",
    oracle="""
WITH post AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM (SELECT doc_id,
               UNNEST(string_split(lower(trim(text)), ' ')) AS term
        FROM documents)
  GROUP BY 1, 2),
dl AS (
  SELECT doc_id,
         CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT) AS dl
  FROM documents),
nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
dfreq AS (
  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df_t FROM post GROUP BY 1),
scored AS (
  SELECT p.doc_id, p.term,
         ROUND((CAST(p.tf AS DOUBLE) / CAST(d.dl AS DOUBLE))
               * ln(n.n_docs / f.df_t), 6) AS tfidf
  FROM post p
  JOIN dl d USING (doc_id)
  JOIN dfreq f USING (term)
  CROSS JOIN nd n)
SELECT doc_id, term, kw_rank, tfidf FROM (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS kw_rank
  FROM scored) t
WHERE kw_rank <= 3
""",
)
def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document: two hash aggregates plus a
    per-doc window, no global sort (operators.retrieval)."""
    return tfidf_keywords(table(spark, sf_dir, "documents"), per_doc=3)


@register(
    "q_doc_chunks",
    family="K",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
  FROM documents),
c AS (
  SELECT doc_id, w, UNNEST(range(0, len(w), 24)) AS chunk_start
  FROM t)
SELECT doc_id,
       CAST(chunk_start AS BIGINT) AS chunk_start,
       CAST(len(list_slice(w, chunk_start + 1, chunk_start + 32)) AS BIGINT)
         AS n_tokens,
       md5(array_to_string(list_slice(w, chunk_start + 1, chunk_start + 32),
                           ' ')) AS chunk_md5
FROM c
""",
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32-word chunks every 24 words per document, chunk
    bodies fingerprinted — shuffle-free narrow map + explode
    (operators.retrieval.chunk_documents)."""
    return chunk_documents(table(spark, sf_dir, "documents"), 32, 24)
