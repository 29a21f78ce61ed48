"""Independent (non-golden) verification of the frozen-golden
flagships, per the round-2 verdict: the golden snapshots only prove
determinism (the engine checked against its own output); these tests
recompute the CLAIMED PROPERTY in DuckDB SQL — a different engine,
from the raw parquet — so a systematic Spark-side bug cannot
self-confirm.

- q_pagerank needs no test here: its registered oracle is now itself
  an independent unrolled fixed-point SQL recomputation
  (queries.graph._pagerank_oracle_sql), hash-checked by
  tests/test_oracle.py at every scale factor.
- k-means: DuckDB re-verifies, for every point, that the reported
  cluster is the argmin of squared L2 distance over the final
  centroid table (ties to the lowest cell) and the reported d2 is
  that minimum.
- MinHash: DuckDB recomputes the true 3-shingle Jaccard of every
  REPORTED pair from the raw text (soundness: reported pairs are
  real near-dups with the exact reported similarity; recall is
  covered by the planted-dup properties in tests/test_dedup.py).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.iterative import kmeans_lloyd


def test_kmeans_assignment_optimality_in_duckdb(spark, sf_dir):
    out, centroids = kmeans_lloyd(
        table(spark, sf_dir, "embeddings"), k=8, n_iter=5, return_centroids=True
    )
    reported = out.toPandas()

    con = duckdb.connect()
    cent_rows = " UNION ALL ".join(
        f"SELECT {cell} AS cell, {list(map(float, vec))}::DOUBLE[] AS c"
        for cell, vec in centroids
    )
    con.register("reported", reported)
    dim = len(centroids[0][1])
    bad = con.execute(
        f"""
WITH cent AS ({cent_rows}),
dists AS (
  SELECT e.vec_id, cent.cell,
         list_sum(list_transform(range(1, {dim + 1}),
             i -> (CAST(e.embedding[i] AS DOUBLE) - cent.c[i]) ^ 2)) AS d2
  FROM read_parquet('{sf_dir}/embeddings.parquet') e CROSS JOIN cent
),
best AS (
  SELECT vec_id, cell, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
  FROM dists
)
SELECT r.vec_id, r.cluster AS got_cell, b.cell AS want_cell,
       r.d2 AS got_d2, ROUND(b.d2, 4) AS want_d2
FROM reported r JOIN best b ON r.vec_id = b.vec_id AND b.rn = 1
WHERE r.cluster <> b.cell OR ABS(r.d2 - ROUND(b.d2, 4)) > 1e-9
"""
    ).fetchall()
    assert not bad, bad[:5]
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    assert len(reported) == n


def test_minhash_pairs_true_jaccard_in_duckdb(spark, sf_dir):
    from flink_framework_spark.operators.dedup import near_dup_pairs_minhash

    threshold = 0.5
    pairs = near_dup_pairs_minhash(
        table(spark, sf_dir, "documents"), threshold=threshold
    ).toPandas()
    assert len(pairs) > 0, "fixture should contain planted near-dups"

    con = duckdb.connect()
    con.register("reported", pairs)
    bad = con.execute(
        rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
  FROM read_parquet('{sf_dir}/documents.parquet')
),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(tk[i:i+2], ' ')
                        for i in range(1, len(tk) - 1)]) AS s
  FROM toks WHERE len(tk) >= 3
)
SELECT r.doc_a, r.doc_b, r.jaccard AS got,
       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS want
FROM reported r
JOIN sh a ON r.doc_a = a.doc_id
JOIN sh b ON r.doc_b = b.doc_id
WHERE ABS(got - want) > 1e-9 OR want < {threshold}
"""
    ).fetchall()
    assert not bad, bad[:5]
    # every reported pair must have joined (no phantom doc ids)
    n_joined = con.execute(
        rf"""
WITH toks AS (
  SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')
)
SELECT COUNT(*) FROM reported r
JOIN toks a ON r.doc_a = a.doc_id JOIN toks b ON r.doc_b = b.doc_id
"""
    ).fetchone()[0]
    assert n_joined == len(pairs)


def test_minhash_pairs_true_jaccard_in_duckdb_sf001(spark):
    """Same soundness check at the driver's sf0.01 (the scale the
    golden is frozen at)."""
    from flink_framework_spark.operators.dedup import near_dup_pairs_minhash

    sf_dir = "/root/testdata/sf0.01"
    threshold = 0.5
    pairs = near_dup_pairs_minhash(
        table(spark, sf_dir, "documents"), threshold=threshold
    ).toPandas()
    golden = pd.read_parquet(
        "tests/golden_driver/q_dedup_minhash_sf0.01.parquet"
    )
    assert len(pairs) == len(golden)

    con = duckdb.connect()
    con.register("reported", pairs)
    bad = con.execute(
        rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
  FROM read_parquet('{sf_dir}/documents.parquet')
),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(tk[i:i+2], ' ')
                        for i in range(1, len(tk) - 1)]) AS s
  FROM toks WHERE len(tk) >= 3
)
SELECT r.doc_a, r.doc_b, r.jaccard AS got,
       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS want
FROM reported r
JOIN sh a ON r.doc_a = a.doc_id
JOIN sh b ON r.doc_b = b.doc_id
WHERE ABS(got - want) > 1e-9 OR want < {threshold}
"""
    ).fetchall()
    assert not bad, bad[:5]
