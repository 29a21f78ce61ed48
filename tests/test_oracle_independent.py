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


def test_kcore_hindex_fixpoint_in_duckdb(spark):
    """Independent k-core soundness at the driver's sf0.01: DuckDB
    rebuilds the supplier co-occurrence graph from raw parquet and
    re-verifies that the reported cores are (a) a fixpoint of the
    h-index operator (core(v) == H of neighbor cores — the Lü et al.
    convergence criterion the operator iterates to) and (b) degree-
    consistent. Together with the sequential-peeling equivalence
    property (tests/test_kcore.py, independent algorithm) this pins
    the golden from two directions; the fixpoint check alone rules
    out any inflated assignment (claiming core k without k neighbors
    at level k)."""
    from flink_framework_spark.registry import all_queries

    sf_dir = "/root/testdata/sf0.01"
    reported = all_queries()["q_kcore"].fn(spark, sf_dir).toPandas()

    con = duckdb.connect()
    con.register("reported", reported)
    bad = con.execute(
        f"""
WITH li AS (
  SELECT l_orderkey AS k, l_suppkey AS s
  FROM read_parquet('{sf_dir}/lineitem.parquet') WHERE l_quantity >= 48),
pairs AS (
  SELECT DISTINCT a.s AS u, b.s AS v
  FROM li a JOIN li b ON a.k = b.k WHERE a.s < b.s),
und AS (SELECT u AS a, v AS b FROM pairs UNION ALL SELECT v AS a, u AS b FROM pairs),
nbr AS (
  SELECT und.a, r2.core AS nh
  FROM und JOIN reported r2 ON und.b = r2.node),
ranked AS (
  SELECT a, nh, ROW_NUMBER() OVER (PARTITION BY a ORDER BY nh DESC) AS rn
  FROM nbr),
h AS (
  SELECT a, COALESCE(MAX(CASE WHEN nh >= rn THEN rn END), 0) AS h
  FROM ranked GROUP BY a),
deg AS (SELECT a, COUNT(*) AS d FROM und GROUP BY a)
SELECT r.node, r.core, h.h, deg.d
FROM reported r JOIN h ON r.node = h.a JOIN deg ON r.node = deg.a
WHERE r.core <> h.h OR r.degree <> deg.d OR r.core > deg.d
"""
    ).fetchall()
    assert not bad, bad[:5]
    n_nodes = con.execute(
        f"""
WITH li AS (
  SELECT l_orderkey AS k, l_suppkey AS s
  FROM read_parquet('{sf_dir}/lineitem.parquet') WHERE l_quantity >= 48),
pairs AS (
  SELECT DISTINCT a.s AS u, b.s AS v
  FROM li a JOIN li b ON a.k = b.k WHERE a.s < b.s)
SELECT COUNT(DISTINCT x) FROM (SELECT u AS x FROM pairs UNION SELECT v FROM pairs)
"""
    ).fetchone()[0]
    assert len(reported) == n_nodes


def test_dedup_clusters_components_in_duckdb(spark):
    """Independent cluster-manifest check at sf0.01: take the
    (independently Jaccard-verified) MinHash pair list, recompute
    connected components in DuckDB with a recursive-CTE transitive
    closure, and compare cluster label (component min id), size, and
    keep flag for every document — including singleton attachment."""
    from flink_framework_spark.operators.dedup import near_dup_pairs_minhash
    from flink_framework_spark.registry import all_queries

    sf_dir = "/root/testdata/sf0.01"
    reported = all_queries()["q_dedup_clusters"].fn(spark, sf_dir).toPandas()
    pairs = near_dup_pairs_minhash(
        table(spark, sf_dir, "documents"), threshold=0.5
    ).toPandas()[["doc_a", "doc_b"]]

    con = duckdb.connect()
    con.register("reported", reported)
    con.register("pairs", pairs)
    bad = con.execute(
        f"""
WITH RECURSIVE und AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.a, e.b FROM reach r JOIN und e ON r.b = e.a WHERE e.b <> r.a),
comp AS (
  SELECT a AS node, LEAST(a, MIN(b)) AS cluster
  FROM reach GROUP BY a),
all_docs AS (
  SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')),
want AS (
  SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster
  FROM all_docs d LEFT JOIN comp c ON d.doc_id = c.node),
sized AS (
  SELECT doc_id, cluster,
         COUNT(*) OVER (PARTITION BY cluster) AS cluster_size,
         (doc_id = cluster) AS keep
  FROM want)
SELECT r.doc_id FROM reported r JOIN sized s ON r.doc_id = s.doc_id
WHERE r.cluster <> s.cluster OR r.cluster_size <> s.cluster_size
   OR r.keep <> s.keep
"""
    ).fetchall()
    assert not bad, bad[:5]
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()[0]
    assert len(reported) == n
