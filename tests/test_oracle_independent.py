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
- IVF / IVF-PQ: DuckDB brute-forces the exact cosine top-k from the
  raw embeddings (the full O(Q·N) pass the index exists to avoid —
  fine at sf0.01) and checks both recall against the approximate
  index and that every REPORTED score equals the true cosine of that
  pair (the exact-re-ranking contract).
- SimHash: the 64-bit fingerprint uses xxhash, which DuckDB cannot
  reproduce, so the check is semantic soundness: every reported pair
  must be a true near-duplicate by 3-token-shingle Jaccard
  (calibrated: reported pairs measure >= 0.88 while the background
  non-pair average is 4e-5).
- BPE: DuckDB recomputes merge #0 from scratch (weighted adjacent
  initial-symbol pair counts over the same id-ordered sample) and
  must reproduce the pair, its count, and the count of merge #1's
  pair (valid because its symbols are disjoint from merge #0's, so
  the first merge cannot change its count).
- Quality model: DuckDB rebuilds the planted-negative corpus and all
  three features from raw text and re-applies the sigmoid with the
  trained weight vector (the one bounded driver artifact), matching
  every reported score and keep decision.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
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

def test_semantic_dedup_pruning_in_duckdb():
    """Full independent re-verification of q_dedup_semantic's pruning
    stage: given the golden's cell assignment (the only k-means-derived
    input), DuckDB recomputes every within-cell cosine from the raw
    embeddings and re-derives kept/dup_of under the operator's rule —
    dropped iff a lower-id same-cell vector has cosine >= eps, dup_of =
    the smallest such witness. Exact comparison is safe: the nearest
    within-cell pair sits 2.9e-5 from the 0.35 boundary (measured),
    ~10 orders above double noise. Soundness AND completeness of the
    epsilon-ball pruning are both pinned; only the clustering itself
    rests on the golden (and on kmeans' own optimality test above)."""
    _check_semantic_pruning("tests/golden_driver/q_dedup_semantic_sf0.01.parquet")


def test_semantic_dedup_imi_pruning_in_duckdb():
    """The IMI variant runs the SAME prune stage over product cells,
    and the recheck is assignment-agnostic by construction (it takes
    the output's cell column as given) — so the identical full
    soundness+completeness re-derivation applies."""
    _check_semantic_pruning(
        "tests/golden_driver/q_dedup_semantic_imi_sf0.01.parquet"
    )


def _check_semantic_pruning(golden_path: str) -> None:
    sf_dir = "/root/testdata/sf0.01"
    golden = pd.read_parquet(golden_path)
    assert (golden.kept == 0).sum() > 0, "fixture should drop some docs"

    con = duckdb.connect()
    con.register("reported", golden)
    bad = con.execute(
        f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM read_parquet('{sf_dir}/embeddings.parquet')),
m AS (SELECT r.vec_id, r.cell, e.v FROM reported r JOIN e USING (vec_id)),
wit AS (
  SELECT b.vec_id, MIN(a.vec_id) AS dup_of
  FROM m a JOIN m b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= 0.35
  GROUP BY b.vec_id),
want AS (
  SELECT m.vec_id,
         CASE WHEN w.dup_of IS NULL THEN 1 ELSE 0 END AS kept,
         w.dup_of
  FROM m LEFT JOIN wit w USING (vec_id))
SELECT r.vec_id, r.kept, r.dup_of, w.kept AS want_kept, w.dup_of AS want_dup
FROM reported r JOIN want w USING (vec_id)
WHERE r.kept <> w.kept
   OR COALESCE(r.dup_of, -1) <> COALESCE(w.dup_of, -1)
"""
    ).fetchall()
    assert not bad, bad[:5]
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    assert len(golden) == n


def test_semantic_dedup_incremental_in_duckdb():
    """Same full recheck for the cross-batch variant: given the
    output's cells, DuckDB re-derives every new-row drop decision
    from raw embeddings — dropped iff a same-cell CORPUS vector has
    cosine >= eps, dup_of = the smallest such witness — and asserts
    corpus rows are untouched."""
    sf_dir = "/root/testdata/sf0.01"
    golden = pd.read_parquet(
        "tests/golden_driver/q_dedup_semantic_inc_sf0.01.parquet"
    )
    assert ((golden.is_new == 1) & (golden.kept == 0)).sum() > 0
    assert (golden[golden.is_new == 0].kept == 1).all()
    assert golden[golden.is_new == 0].dup_of.isna().all()

    con = duckdb.connect()
    con.register("reported", golden)
    bad = con.execute(
        f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM read_parquet('{sf_dir}/embeddings.parquet')),
m AS (SELECT r.vec_id, r.cell, r.is_new, e.v
      FROM reported r JOIN e USING (vec_id)),
wit AS (
  SELECT n.vec_id, MIN(c.vec_id) AS dup_of
  FROM m n JOIN m c ON n.cell = c.cell AND n.is_new = 1 AND c.is_new = 0
  WHERE list_cosine_similarity(n.v, c.v) >= 0.35
  GROUP BY n.vec_id),
want AS (
  SELECT m.vec_id,
         CASE WHEN m.is_new = 1 AND w.dup_of IS NOT NULL THEN 0
              ELSE 1 END AS kept,
         CASE WHEN m.is_new = 1 THEN w.dup_of END AS dup_of
  FROM m LEFT JOIN wit w USING (vec_id))
SELECT r.vec_id, r.kept, r.dup_of, w.kept, w.dup_of
FROM reported r JOIN want w USING (vec_id)
WHERE r.kept <> w.kept
   OR COALESCE(r.dup_of, -1) <> COALESCE(w.dup_of, -1)
"""
    ).fetchall()
    assert not bad, bad[:5]
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()[0]
    assert len(golden) == n


def _exact_topk_duckdb(con, sf_dir: str, k: int = 5, n_queries: int = 10):
    """Brute-force exact cosine top-k per query in DuckDB (the
    independent engine), doubles end-to-end."""
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM read_parquet('{sf_dir}/embeddings.parquet')),
n AS (SELECT vec_id, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM e),
bf AS (
  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, 65), i -> q.v[i] * d.v[i]))
           / (q.nrm * d.nrm) AS cos,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_sum(list_transform(range(1, 65),
                    i -> q.v[i] * d.v[i])) / (q.nrm * d.nrm) DESC,
                    d.vec_id) AS rn
  FROM n q JOIN n d ON d.vec_id <> q.vec_id WHERE q.vec_id < {n_queries})
SELECT query_id, neighbor_id, cos FROM bf WHERE rn <= {k}
"""


def _check_ann_against_brute_force(name, score_col, min_recall):
    """r11: the 'reported' frame is the registered LIVE oracle's
    output (the pipeline recompute from frozen artifacts, hash-equal
    to the Spark result by tests/test_oracle.py), not a golden
    parquet — so this pins the whole chain to brute force."""
    from flink_framework_spark.registry import all_queries
    from tests.harness import run_oracle

    sf_dir = "/root/testdata/sf0.01"
    q = all_queries()[name]
    reported = run_oracle(q.oracle_by_sf["sf0.01"], sf_dir)

    con = duckdb.connect()
    con.register("reported", reported)
    con.execute(f"CREATE TEMP TABLE exact AS {_exact_topk_duckdb(con, sf_dir)}")
    hits, total = con.execute(
        """
SELECT (SELECT COUNT(*) FROM reported r
        JOIN exact t ON r.query_id = t.query_id
                    AND r.neighbor_id = t.neighbor_id),
       (SELECT COUNT(*) FROM reported)
"""
    ).fetchone()
    assert total == 50
    assert hits / total >= min_recall, (name, hits, total)

    # exact-re-ranking contract: every reported score IS the true
    # cosine of that (query, neighbor) pair, to the reported 4 dp
    bad = con.execute(
        f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM read_parquet('{sf_dir}/embeddings.parquet')),
n AS (SELECT vec_id, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM e)
SELECT r.query_id, r.neighbor_id, r.{score_col},
  ROUND(list_sum(list_transform(range(1, 65), i -> q.v[i] * d.v[i]))
        / (q.nrm * d.nrm), 4) AS want
FROM reported r
JOIN n q ON r.query_id = q.vec_id
JOIN n d ON r.neighbor_id = d.vec_id
WHERE ABS(r.{score_col}
          - ROUND(list_sum(list_transform(range(1, 65),
                   i -> q.v[i] * d.v[i])) / (q.nrm * d.nrm), 4)) > 1e-4
"""
    ).fetchall()
    assert not bad, bad[:5]


def test_ivf_topk_vs_brute_force_in_duckdb():
    """q_sim_topk_ivf's golden vs a DuckDB brute-force exact top-5:
    recall at the nprobe=2/8 probing ceiling (measured 0.58 on the
    fixture; floor set just below) and exact reported scores."""
    _check_ann_against_brute_force("q_sim_topk_ivf", "cosim", 0.55)


def test_imi_topk_vs_brute_force_in_duckdb():
    """q_sim_topk_imi's golden vs DuckDB brute force: recall at the
    measured nprobe=4/9-cell probing level (0.64; floor 0.6) and
    exact reported scores (same exact-cosine kernel as flat IVF)."""
    _check_ann_against_brute_force("q_sim_topk_imi", "cosim", 0.6)


def test_ivfpq_topk_vs_brute_force_in_duckdb():
    """q_sim_topk_ivfpq's golden vs DuckDB brute force: the re-ranked
    shortlist reaches higher recall (measured 0.76; floor 0.70) and
    the IndexRefine contract makes every reported score exact."""
    _check_ann_against_brute_force("q_sim_topk_ivfpq", "score", 0.70)


def test_simhash_pairs_true_similarity_in_duckdb():
    """Soundness of q_dedup_simhash's golden: every reported pair is
    a true near-duplicate by 3-token-shingle Jaccard recomputed in
    DuckDB from raw text (measured: reported pairs >= 0.888, random
    background averages 4e-5 — floor 0.8 separates them by 4 orders
    of magnitude). Recall at hamming <= max_hamming is exact by the
    pigeonhole construction and planted-dup property tests."""
    sf_dir = "/root/testdata/sf0.01"
    reported = pd.read_parquet(
        "tests/golden_driver/q_dedup_simhash_sf0.01.parquet"
    )
    assert len(reported) > 0

    con = duckdb.connect()
    con.register("reported", reported)
    bad = con.execute(
        rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
  FROM read_parquet('{sf_dir}/documents.parquet')
),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(tk[i:i+3], ' ')
                        for i in range(1, len(tk) - 2)]) AS s
  FROM toks WHERE len(tk) >= 3
)
SELECT r.doc_a, r.doc_b,
       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
FROM reported r
JOIN sh a ON r.doc_a = a.doc_id
JOIN sh b ON r.doc_b = b.doc_id
WHERE j < 0.8
"""
    ).fetchall()
    assert not bad, bad[:5]
    n_joined = con.execute(
        f"""
SELECT COUNT(*) FROM reported r
JOIN read_parquet('{sf_dir}/documents.parquet') a ON r.doc_a = a.doc_id
JOIN read_parquet('{sf_dir}/documents.parquet') b ON r.doc_b = b.doc_id
"""
    ).fetchone()[0]
    assert n_joined == len(reported)


def test_simhash128_pairs_true_similarity_in_duckdb():
    """Soundness of q_dedup_simhash128's golden: hamming <= 8 over
    128 bits is the near-exact-dup regime, so every reported pair
    must be a very-high-Jaccard duplicate by 3-token-shingle Jaccard
    recomputed in DuckDB from raw text (measured: all pairs >= 0.95;
    floor 0.9). Recall is exact by the pigeonhole construction,
    verified pair-for-pair against numpy brute force in
    tests/test_simhash128.py."""
    sf_dir = "/root/testdata/sf0.01"
    reported = pd.read_parquet(
        "tests/golden_driver/q_dedup_simhash128_sf0.01.parquet"
    )
    assert len(reported) > 0

    con = duckdb.connect()
    con.register("reported", reported)
    bad = con.execute(
        rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
  FROM read_parquet('{sf_dir}/documents.parquet')
),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(tk[i:i+3], ' ')
                        for i in range(1, len(tk) - 2)]) AS s
  FROM toks WHERE len(tk) >= 3
)
SELECT r.doc_a, r.doc_b,
       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
FROM reported r
JOIN sh a ON r.doc_a = a.doc_id
JOIN sh b ON r.doc_b = b.doc_id
WHERE j < 0.9
"""
    ).fetchall()
    assert not bad, bad[:5]


def test_bpe_first_merges_recomputed_in_duckdb():
    """DuckDB relearns BPE merge #0 from scratch: lowercase
    whitespace words over the same id-ordered sample, end-of-word
    marker on the last character, weighted adjacent-pair counts, the
    operator's (-count, pair) tie-break. Must reproduce the golden's
    merge-0 token AND count. Merge #1 (ow</w>) shares no symbol with
    merge #0 (er</w>), so merging #0 cannot change its pair count —
    its golden count must equal the initial-pair count too. (r11:
    the checked object is the frozen BPE_MERGES artifact literal —
    the oracle's input — rather than a golden result parquet.)"""
    sf_dir = "/root/testdata/sf0.01"
    from flink_framework_spark.queries._trained_sf001 import BPE_MERGES

    class _M:
        def __init__(self, a, b, cnt):
            self.tok, self.n = a + b, cnt

    m0 = _M(*BPE_MERGES[0])
    m1 = _M(*BPE_MERGES[1])

    con = duckdb.connect()
    top = con.execute(
        f"""
WITH words AS (
  SELECT unnest(string_split(lower(trim(text)), ' ')) AS w
  FROM (SELECT text FROM read_parquet('{sf_dir}/documents.parquet')
        ORDER BY doc_id LIMIT 4096)
  WHERE text IS NOT NULL AND trim(text) <> ''
),
wf AS (SELECT w, COUNT(*) AS f FROM words WHERE w <> '' GROUP BY w),
pairs AS (
  SELECT substr(w, i + 1, 1) AS l,
         CASE WHEN i = len(w) - 2 THEN substr(w, i + 2, 1) || '</w>'
              ELSE substr(w, i + 2, 1) END AS r,
         f
  FROM wf, UNNEST(range(0, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
)
SELECT l, r, CAST(SUM(f) AS BIGINT) AS cnt
FROM pairs GROUP BY l, r ORDER BY cnt DESC, l, r LIMIT 2
"""
    ).fetchall()
    assert top[0][0] + top[0][1] == m0.tok and top[0][2] == m0.n, (top[0], m0)
    # disjoint-symbol precondition for the merge-1 count check
    assert not ({top[1][0], top[1][1]} & {top[0][0], top[0][1]})
    assert top[1][0] + top[1][1] == m1.tok and top[1][2] == m1.n, (top[1], m1)


def test_quality_model_scores_recomputed_in_duckdb(spark):
    """DuckDB rebuilds the planted-negative corpus (orig + first-word
    repetition twins), all three features, and the sigmoid from raw
    text; the only Spark-side input is the trained weight vector (a
    bounded deterministic driver artifact). Every golden score must
    match the recomputed sigmoid to the reported 4 dp (tolerance
    5.1e-5 = half-ulp of the rounding + libm exp slack) and every
    keep flag must equal (raw score >= 0.5)."""
    from flink_framework_spark.operators.mllite import logreg_train
    from flink_framework_spark.queries.quality_model import _FEATS, _featurized

    sf_dir = "/root/testdata/sf0.01"
    weights = logreg_train(
        _featurized(spark, sf_dir),
        _FEATS,
        label_col="label",
        order_col=F.struct("doc_id", "variant"),
    )
    bias, w_stop, w_dup, w_wlen = (float(x) for x in weights)
    golden = pd.read_parquet(
        "tests/golden_driver/q_quality_model_sf0.01.parquet"
    )

    con = duckdb.connect()
    con.register("reported", golden)
    bad = con.execute(
        f"""
WITH base AS (
  SELECT doc_id, lower(trim(text)) AS t
  FROM read_parquet('{sf_dir}/documents.parquet')),
corpus AS (
  SELECT doc_id, 'orig' AS variant, t, 1 AS label FROM base
  UNION ALL
  SELECT doc_id, 'rep' AS variant,
         array_to_string([string_split(t, ' ')[1]
                          for i in range(1, len(string_split(t, ' ')) + 1)],
                         ' ') AS t,
         0 AS label
  FROM base WHERE doc_id % 3 = 0),
feats AS (
  SELECT doc_id, variant, label,
         CAST(len(list_filter(string_split(t, ' '),
                              x -> x IN ('a', 'the'))) AS DOUBLE)
           / len(string_split(t, ' ')) AS f_stop,
         1.0 - CAST(len(list_distinct(string_split(t, ' '))) AS DOUBLE)
           / len(string_split(t, ' ')) AS f_dup,
         ((CAST(len(t) AS DOUBLE) - (len(string_split(t, ' ')) - 1))
           / len(string_split(t, ' '))) / 10.0 AS f_wlen
  FROM corpus),
scored AS (
  SELECT doc_id, variant, label,
         1.0 / (1.0 + exp(-({bias} + {w_stop} * f_stop
                            + {w_dup} * f_dup + {w_wlen} * f_wlen))) AS s
  FROM feats)
SELECT r.doc_id, r.variant, r.score, s.s, r.keep
FROM reported r
JOIN scored s ON r.doc_id = s.doc_id AND r.variant = s.variant
WHERE ABS(r.score - s.s) > 5.1e-5
   OR (ABS(s.s - 0.5) > 1e-9 AND r.keep <> (s.s >= 0.5))
   OR r.label <> s.label
"""
    ).fetchall()
    assert not bad, bad[:5]
    n = con.execute(
        f"""
SELECT COUNT(*) + COUNT(*) FILTER (doc_id % 3 = 0)
FROM read_parquet('{sf_dir}/documents.parquet')
"""
    ).fetchone()[0]
    assert len(golden) == n


@pytest.mark.parametrize(
    "sf,floor",
    [("sf0.01", 1.0), ("sf0.1", 0.95)],
)
def test_embed_cells_pairs_sound_and_recall_floor(sf, floor):
    """Brute-force re-verification of the q_dedup_embed_cells
    contract (r11: the pair set comes from the LIVE blocking-aware
    oracle, not a golden parquet): every emitted pair's cosine is
    recomputed from the raw embeddings in DuckDB and must match
    exactly (soundness — no pair below the 0.4 threshold, no wrong
    cosim), and the celled blocking's recall against the full
    brute-force >= 0.4 pair set must hold the measured per-corpus
    floor (top-4 multi-probe sees 59/59 = 100% at sf0.01 and 903/920
    = 98.2% at sf0.1; a cell-count or probe regression trips
    loudly)."""
    import duckdb

    from flink_framework_spark.queries._oracle_trained import (
        embed_cells_select_sql,
    )
    from tests.harness import run_oracle

    sf_dir = f"/root/testdata/{sf}"
    e = f"{sf_dir}/embeddings.parquet"
    con = duckdb.connect()
    bf = con.execute(
        f"""
        SELECT a.vec_id, b.vec_id,
               ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])),
                     4)
        FROM read_parquet('{e}') a JOIN read_parquet('{e}') b
          ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.4
        """
    ).fetchall()
    gp = run_oracle(embed_cells_select_sql(sf=sf), sf_dir).itertuples(
        index=False, name=None
    )
    gp = list(gp)
    truth = {(a, b): c for a, b, c in bf}
    assert all(
        (a, b) in truth and abs(truth[(a, b)] - c) < 1e-9 for a, b, c in gp
    )
    assert len(gp) >= floor * len(bf) > 0
