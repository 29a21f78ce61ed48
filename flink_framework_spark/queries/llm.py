"""K. LLM-data-pipeline operators (SURVEY.md §2 K1-K6): dedup,
similarity search, and text analysis over the documents/embeddings
tables. These are first-class engine components — the operators live
in ``operators.dedup`` / ``operators.similarity`` / ``operators.text``;
the queries here are their oracle-checked spellings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import round_duck
from flink_framework_spark.io import table
from flink_framework_spark.operators.dedup import exact_dedup_stats
from flink_framework_spark.operators.similarity import brute_force_topk, bucketed_topk
from flink_framework_spark.queries._oracle_trained import (
    per_sf,
    imi_topk_select_sql,
    ivf_topk_select_sql,
    ivfpq_topk_select_sql,
    kmeans_select_sql,
    semantic_dedup_imi_select_sql,
    semantic_dedup_inc_select_sql,
    semantic_dedup_select_sql,
)
from flink_framework_spark.registry import register


@register(
    "q_dedup_exact",
    family="K",
    oracle="""
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(lower(trim(text)))) AS n_unique
FROM documents
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via normalized-text md5 (K1). Negative control on
    the fixtures: no exact dups exist at sf0.01 (SURVEY.md §5.3)."""
    return exact_dedup_stats(table(spark, sf_dir, "documents"))


@register(
    "q_sim_topk",
    family="K",
    oracle="""
SELECT query_id, neighbor_id, cosim, rn FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])), 4) AS cosim,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                               CAST(e.embedding AS DOUBLE[])) DESC,
                        e.vec_id) AS rn
  FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
  JOIN embeddings e ON e.vec_id <> q.vec_id) t
WHERE rn <= 5
""",
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine kNN, 10 queries x corpus, top-5 (K3 baseline).
    All math in double; ordering on the raw score with vec_id
    tiebreak; rounding only on output (SURVEY.md §5.3)."""
    em = table(spark, sf_dir, "embeddings")
    return brute_force_topk(em.filter(F.col("vec_id") < 10), em, k=5)


@register(
    "q_sim_topk_bucketed",
    family="K",
    oracle="""
SELECT query_id, neighbor_id, cosim, rn FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])), 4) AS cosim,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                               CAST(e.embedding AS DOUBLE[])) DESC,
                        e.vec_id) AS rn
  FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
  JOIN embeddings e ON e.vec_id <> q.vec_id AND e.label = q.label) t
WHERE rn <= 5
""",
)
def q_sim_topk_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate kNN (K3 scale path): candidates restricted
    to the query's coarse bucket (the ``label`` column stands in for an
    offline k-means cell id). Equi-join on the bucket replaces the
    cross join — this is the plan that survives 100 TB."""
    em = table(spark, sf_dir, "embeddings")
    return bucketed_topk(
        em.filter(F.col("vec_id") < 10), em, k=5, bucket_col="label"
    )


@register(
    "q_sim_topk_gemm",
    family="K",
    oracle="""
SELECT query_id, neighbor_id, cosim, rn FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])), 4) AS cosim,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                               CAST(e.embedding AS DOUBLE[])) DESC,
                        e.vec_id) AS rn
  FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
  JOIN embeddings e ON e.vec_id <> q.vec_id) t
WHERE rn <= 5
""",
)
def q_sim_topk_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact kNN via blocked float64 GEMM (SURVEY §4.3.2 block-matrix
    path): one narrow mapInPandas pass over the corpus, per-batch
    top-k, global merge — same results as brute force (identical live
    oracle), with BLAS doing the dot products instead of per-pair
    expression folds (operators.similarity.gemm_topk)."""
    from flink_framework_spark.operators.similarity import gemm_topk

    em = table(spark, sf_dir, "embeddings")
    return gemm_topk(em.filter(F.col("vec_id") < 10), em, k=5)


@register(
    "q_hard_negatives",
    family="K",
    oracle="""
SELECT query_id, neighbor_id, cosim, rn FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])), 4) AS cosim,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                               CAST(e.embedding AS DOUBLE[])) DESC,
                        e.vec_id) AS rn
  FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
  JOIN embeddings e ON e.vec_id <> q.vec_id AND e.label <> q.label) t
WHERE rn <= 5
""",
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    5 nearest WRONG-label vectors — the standard dense-retrieval /
    embedding-training data op. Exact GEMM path with the same-label
    mask applied before per-batch selection
    (operators.similarity.gemm_topk exclude_label_col); identical live
    brute-force oracle with the label exclusion in the join."""
    from flink_framework_spark.operators.similarity import gemm_topk

    em = table(spark, sf_dir, "embeddings")
    return gemm_topk(
        em.filter(F.col("vec_id") < 10),
        em,
        k=5,
        exclude_label_col="label",
    )


@register(
    "q_text_stats",
    family="K",
    oracle="""
SELECT lang, COUNT(*) AS n_docs,
       ROUND(AVG(n_chars), 2) AS avg_chars,
       ROUND(AVG(len(string_split(text, ' '))), 2) AS avg_words
FROM documents GROUP BY lang
""",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics (K4)."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        round_duck(F.avg("n_chars"), 2).alias("avg_chars"),
        round_duck(F.avg(F.size(F.split(F.col("text"), " "))), 2).alias("avg_words"),
    )


@register(
    "q_sim_topk_ivf",
    family="K",
    # LIVE oracle (round-10 golden conversion): the trained coarse
    # cells are frozen as literals and DuckDB recomputes corpus
    # assignment, nprobe probing, and exact-cosine top-k live from
    # the raw parquet (queries/_oracle_trained.py; the artifact is
    # drift-pinned by tests/test_trained_artifacts.py).
    oracle_by_sf=per_sf(lambda sf: ivf_topk_select_sql(k=5, nprobe=2, sf=sf)),
)
def q_sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True IVF kNN: k-means-trained coarse cells, nprobe=2 probing.
    Training is seeded on a deterministic sample, so the centroids are
    stable (verified under varying core / partition counts) and frozen
    as oracle constants; recall vs brute force is property-tested in
    tests/test_text.py. The oracle-checked q_sim_topk_bucketed
    demonstrates the same plan shape on precomputed cells."""
    from flink_framework_spark.operators.similarity import (
        ivf_topk,
        train_ivf_centroids,
    )

    em = table(spark, sf_dir, "embeddings")
    centroids = train_ivf_centroids(em, n_cells=8)
    return ivf_topk(em.filter(F.col("vec_id") < 10), em, centroids, k=5, nprobe=2)


@register(
    "q_sim_topk_ivfpq",
    family="K",
    # LIVE oracle (round-10 golden conversion): the ENTIRE IVF-PQ
    # pipeline — cells, per-subspace codes, ADC lookup scoring,
    # rerank shortlist, exact rescoring — recomputed in DuckDB from
    # the frozen centroids + codebooks (queries/_oracle_trained.py;
    # verified bit-exact at sf0.01, codes agreeing 500/500).
    oracle_by_sf=per_sf(
        lambda sf: ivfpq_topk_select_sql(k=5, nprobe=4, rerank=64, sf=sf)
    ),
)
def q_sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ kNN with exact re-ranking (operators.pq): IVF cells
    generate candidates, product-quantized codes + an ADC lookup
    table score them — the compressed-index plan where the
    corpus-wide pass reads 8 bytes/vector — and the ADC shortlist is
    rescored with exact cosine (FAISS IndexRefine shape), so the
    reported score is exact. Deterministic (seeded per-subspace
    k-means, lowest-code ties, id tiebreaks at both ranking stages) —
    frozen-golden checked; recall vs brute force property-tested in
    tests/test_pq.py."""
    from flink_framework_spark.operators.pq import ivfpq_topk, pq_train
    from flink_framework_spark.operators.similarity import train_ivf_centroids

    em = table(spark, sf_dir, "embeddings")
    centroids = train_ivf_centroids(em, n_cells=8)
    books = pq_train(em, m=8, n_codes=64)
    return ivfpq_topk(
        em.filter(F.col("vec_id") < 10),
        em,
        centroids,
        books,
        k=5,
        nprobe=4,
        rerank=64,
    )


@register(
    "q_sim_topk_imi",
    family="K",
    # LIVE oracle (round-10 golden conversion): product cells and
    # probe cross-sums recomputed from the frozen half-codebooks,
    # exact cosine top-k on the joined candidates
    # (queries/_oracle_trained.py).
    oracle_by_sf=per_sf(lambda sf: imi_topk_select_sql(k=5, nprobe=4, sf=sf)),
)
def q_sim_topk_imi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF kNN over IMI product cells (operators.similarity.imi_topk):
    the ANN rung that survives n_cells ∝ N — corpus assignment scores
    2*sqrt(k) half-distances per vector where flat IVF scores k full
    distances (measured alpha ~1.1 for flat at the 100x tile vs
    sublinear for IMI; SCALING.md). Exact-cosine scoring on probed
    candidates; golden at sf0.01, recall-vs-brute-force props in
    tests/test_imi.py, independent DuckDB brute-force recheck in
    tests/test_oracle_independent.py."""
    from flink_framework_spark.operators.similarity import (
        imi_topk,
        train_imi,
    )

    em = table(spark, sf_dir, "embeddings")
    books = train_imi(em, k_per_half=3)
    return imi_topk(
        em.filter(F.col("vec_id") < 10), em, books, k=5, nprobe=4
    )


@register(
    "q_dedup_semantic",
    family="K",
    # LIVE oracle (round-10 golden conversion): IVF cells from the
    # frozen centroid literals, then the epsilon-ball prune and the
    # lowest-id witness rule recomputed relationally in DuckDB
    # (queries/_oracle_trained.py).
    oracle_by_sf=per_sf(lambda sf: semantic_dedup_select_sql(eps=0.35, sf=sf)),
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup (K2 extension): k-means coarse cells +
    within-cell cosine epsilon-ball pruning with a deterministic
    lowest-id keep rule (operators.similarity.semantic_dedup). The
    trained cells are frozen as oracle constants, so DuckDB recomputes
    assignment AND pruning live; planted-duplicate recall is
    property-tested in tests/test_text.py. eps=0.35 is calibrated
    to the near-isotropic fixture (26 same-bucket pairs above it at
    sf0.01; nearest pair sits 4.7e-4 from the boundary, far beyond
    float64 noise, so the threshold cannot flake)."""
    from flink_framework_spark.operators.similarity import (
        semantic_dedup,
        train_ivf_centroids,
    )

    em = table(spark, sf_dir, "embeddings")
    centroids = train_ivf_centroids(em, n_cells=8)
    return semantic_dedup(em, centroids, eps=0.35)


@register(
    "q_dedup_semantic_imi",
    family="K",
    # LIVE oracle (round-10 golden conversion): IMI product cells
    # recomputed from the frozen half-codebooks (two independent
    # argmins, cell = c0*k1 + c1), then the identical prune
    # (queries/_oracle_trained.py).
    oracle_by_sf=per_sf(
        lambda sf: semantic_dedup_imi_select_sql(eps=0.35, sf=sf)
    ),
)
def q_dedup_semantic_imi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the inverted-multi-index coarse quantizer
    (Babenko & Lempitsky CVPR'12): cells are PAIRS of half-vector
    codes, so assignment scores 2*sqrt(n_cells) half-distances per
    vector instead of n_cells full distances — the at-scale fix for
    flat IVF's O(N*k), k ∝ N assignment term (SCALING.md). Pruning
    kernel, keep rule, and output contract identical to
    q_dedup_semantic; drops are independently re-derived in DuckDB
    given the output's cells (tests/test_oracle_independent.py), and
    the assignment itself is re-verified as per-half argmin in
    tests/test_imi.py. k_per_half=3 spans 9 product cells — the same
    cell granularity as the flat query's n_cells=8."""
    from flink_framework_spark.operators.similarity import (
        semantic_dedup_imi,
        train_imi,
    )

    em = table(spark, sf_dir, "embeddings")
    books = train_imi(em, k_per_half=3)
    return semantic_dedup_imi(em, books, eps=0.35)


@register(
    "q_dedup_semantic_inc",
    family="K",
    # LIVE oracle (round-10 golden conversion): cells from the frozen
    # corpus-prefix-trained centroids, the new-vs-corpus prune
    # recomputed relationally (queries/_oracle_trained.py).
    oracle_by_sf=per_sf(
        lambda sf: semantic_dedup_inc_select_sql(eps=0.35, sf=sf)
    ),
)
def q_dedup_semantic_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch SemDeDup (rolling-ingest shape): the first 400
    vectors play the accumulated corpus, the rest the incoming batch;
    new vectors drop iff a same-cell corpus vector sits within the
    cosine epsilon-ball (operators.similarity.semantic_dedup_incremental).
    The corpus-trained cells are frozen as oracle constants, so DuckDB
    recomputes assignment AND the cross-batch prune live; planted
    cross-batch dups are property-tested."""
    from flink_framework_spark.operators.similarity import (
        semantic_dedup_incremental,
        train_ivf_centroids,
    )

    em = table(spark, sf_dir, "embeddings")
    corpus = em.filter(F.col("vec_id") < 400)
    new = em.filter(F.col("vec_id") >= 400)
    centroids = train_ivf_centroids(corpus, n_cells=8)
    return semantic_dedup_incremental(new, corpus, centroids, eps=0.35)


@register(
    "q_profile_events",
    family="K",
    oracle="""
WITH s AS (SELECT COUNT(*) AS n FROM events)
SELECT 'event_id' AS column, 'bigint' AS dtype, s.n AS n_rows,
       CAST(0 AS BIGINT) AS n_nulls,
       (SELECT COUNT(DISTINCT event_id) FROM events) AS n_distinct,
       ROUND((SELECT CAST(MIN(event_id) AS DOUBLE) FROM events), 4) AS min,
       ROUND((SELECT CAST(MAX(event_id) AS DOUBLE) FROM events), 4) AS max,
       ROUND((SELECT AVG(event_id) FROM events), 4) AS mean
FROM s
UNION ALL
SELECT 'ts', 'timestamp_ntz', s.n, CAST(0 AS BIGINT),
       (SELECT COUNT(DISTINCT ts) FROM events),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM s
UNION ALL
SELECT 'user_id', 'bigint', s.n, CAST(0 AS BIGINT),
       (SELECT COUNT(DISTINCT user_id) FROM events),
       ROUND((SELECT CAST(MIN(user_id) AS DOUBLE) FROM events), 4),
       ROUND((SELECT CAST(MAX(user_id) AS DOUBLE) FROM events), 4),
       ROUND((SELECT AVG(user_id) FROM events), 4)
FROM s
UNION ALL
SELECT 'event_type', 'string', s.n, CAST(0 AS BIGINT),
       (SELECT COUNT(DISTINCT event_type) FROM events),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM s
UNION ALL
SELECT 'value', 'double', s.n, CAST(0 AS BIGINT),
       (SELECT COUNT(DISTINCT value) FROM events),
       ROUND((SELECT CAST(MIN(value) AS DOUBLE) FROM events), 4),
       ROUND((SELECT CAST(MAX(value) AS DOUBLE) FROM events), 4),
       ROUND((SELECT AVG(value) FROM events), 4)
FROM s
UNION ALL
SELECT 'props', 'string', s.n, CAST(0 AS BIGINT),
       (SELECT COUNT(DISTINCT props) FROM events),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM s
""",
)
def q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass per-column profile of the events table (the
    data-quality sweep run before committing an ingestion batch) —
    operators.profile.profile_table."""
    from flink_framework_spark.operators.profile import profile_table

    # exact distincts so the DuckDB oracle can reproduce the values;
    # the operator's scale default is approx_distinct=True (HLL)
    return profile_table(table(spark, sf_dir, "events"), approx_distinct=False)


@register(
    "q_kmeans",
    family="K",
    # LIVE oracle (round-10 golden conversion): the FINAL 5-round
    # centroids are frozen as literals (queries/_trained_sf001.py,
    # drift-pinned by tests/test_trained_artifacts.py) and DuckDB
    # recomputes every output value — nearest-centroid assignment with
    # the shared (d2, cell) tiebreak and the rounded squared distance
    # — from the raw parquet (queries/_oracle_trained.py).
    oracle_by_sf=per_sf(lambda sf: kmeans_select_sql(sf=sf)),
)
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means over the embeddings table (k=8,
    5 fixed rounds): narrow literal-centroid assignment + exact
    DECIMAL centroid sums, so the clustering is deterministic and
    its final centroids freezable as oracle constants
    (operators.iterative.kmeans_lloyd; determinism + quality
    property-tested in tests/test_kmeans.py)."""
    from flink_framework_spark.operators.iterative import kmeans_lloyd

    return kmeans_lloyd(table(spark, sf_dir, "embeddings"), k=8, n_iter=5)
