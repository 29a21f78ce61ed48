"""Graph-iteration queries: PageRank over the customer–supplier
trade graph. The operators live in ``operators.iterative`` (the
Flink ``iterate()`` surface: connected components, k-means,
PageRank)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.iterative import (
    coreness,
    pagerank,
    triangle_counts,
)
from flink_framework_spark.registry import register

# supplier node ids are offset so they cannot collide with customer
# keys (both are dense small integers in the fixtures)
_SUPP_OFFSET = 10_000_000


def _pagerank_oracle_sql(n_iter: int = 5) -> str:
    """Fully INDEPENDENT PageRank oracle: the 5 power-iteration
    rounds unrolled as chained CTEs in exact BIGINT fixed-point
    arithmetic — the same spec ``operators.iterative.pagerank``
    implements (SCALE=1e12, floor divisions, damping 85/100, no
    dangling term because the edge list is bidirectional). Integer
    math is exact in both engines, so the hashes match bit-for-bit;
    this upgrades q_pagerank from a frozen-golden determinism check
    to an independently recomputed value check (the golden snapshot
    stays as a cross-version regression layer,
    tests/test_golden_regression.py)."""
    it = """
r{k} AS (
  SELECT n.id,
         CAST((SELECT base FROM params)
              + (85 * COALESCE(i.s_in, 0)) // 100 AS BIGINT) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.d AS id, SUM(p.r // o.od) AS s_in
    FROM edges e JOIN outdeg o ON e.s = o.s JOIN r{km1} p ON e.s = p.id
    GROUP BY e.d
  ) i ON n.id = i.id
)"""
    rounds = ",".join(it.format(k=k, km1=k - 1) for k in range(1, n_iter + 1))
    return f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey AS src, l_suppkey + {_SUPP_OFFSET} AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT src AS s, dst AS d FROM pairs
  UNION ALL SELECT dst AS s, src AS d FROM pairs
),
outdeg AS (SELECT s, COUNT(*) AS od FROM edges GROUP BY s),
nodes AS (SELECT DISTINCT s AS id FROM edges),
params AS (
  SELECT CAST(1000000000000 // COUNT(*) AS BIGINT) AS r_init,
         CAST((15 * 1000000000000) // (100 * COUNT(*)) AS BIGINT) AS base
  FROM nodes
),
r0 AS (SELECT id, (SELECT r_init FROM params) AS r FROM nodes),{rounds}
SELECT id, ROUND(CAST(r AS DOUBLE) / 1000000000000, 6) AS rank
FROM r{n_iter}
"""


@register(
    "q_pagerank",
    family="K",
    # live unrolled-SQL oracle — valid at ANY SF (the sf0.01 pin was
    # a relic of its frozen-golden era, dropped round 9)
    oracle=_pagerank_oracle_sql(),
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bidirectional customer<->supplier graph
    (an edge per distinct trade relationship from orders x lineitem).
    Fixed-point int64 power iteration, 5 rounds — deterministic under
    any partitioning, value-checked against a frozen sf0.01 golden;
    convergence/conservation properties in tests/test_pagerank.py.

    Bidirectional edges mean every node has an out-edge, so the
    per-round dangling-mass job is skipped (handle_dangling=False);
    the operator's dangling path is property-tested separately.
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )
    # both directions via ONE explode instead of a two-branch union —
    # a union re-executes the join+distinct once per branch (r11,
    # guide §2.4 branch-duplication rule); rows are identical
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                ),
            )
        ).alias("__e")
    ).select("__e.src", "__e.dst")
    # pairs are distinct and the reversed copies cannot collide with
    # the originals (supplier ids are offset), so the exploded frame is
    # already a distinct edge list
    return pagerank(edges, n_iter=5, handle_dangling=False, assume_distinct=True)


@register(
    "q_triangles",
    family="K",
    oracle="""
WITH li AS (SELECT l_orderkey, l_suppkey FROM lineitem
            WHERE l_quantity >= 48),
e AS (SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey),
deg AS (SELECT n, COUNT(*) AS degree FROM (
          SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1 JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
pn AS (SELECT n, COUNT(*) AS tri FROM (
         SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
         UNION ALL SELECT c FROM tri) GROUP BY 1)
SELECT deg.n AS node, deg.degree,
       COALESCE(pn.tri, 0) AS tri,
       ROUND(CASE WHEN deg.degree > 1
             THEN 2.0 * COALESCE(pn.tri, 0)
                  / (deg.degree * (deg.degree - 1))
             ELSE 0.0 END, 4) AS lcc
FROM deg LEFT JOIN pn ON pn.n = deg.n
""",
)
def q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting + local clustering coefficient over the
    supplier co-occurrence graph (suppliers sharing a high-quantity
    order line). Degree-ordered orientation bounds the wedge join by
    the arboricity — O(m^1.5) total work with no skew blowup — and the
    id-ordered oracle closes the same triangle set
    (operators.iterative.triangle_counts)."""
    return triangle_counts(_supplier_edges(spark, sf_dir))


def _supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier co-occurrence graph: distinct (u < v) supplier pairs
    sharing a high-quantity order line."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("v"))
    return (
        a.join(b, "k")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


@register(
    "q_kcore",
    family="K",
    # LIVE independent oracle (round 8, replacing the frozen golden):
    # DuckDB recomputes the same Lü et al. h-index fixpoint from raw
    # parquet with a recursive CTE unrolled 40 synchronous rounds —
    # the iteration is monotone non-increasing and stationary at the
    # fixpoint, so any unroll PAST convergence equals the core
    # numbers exactly (40 >> the observed <15 rounds at these SFs,
    # integer-exact, no float drift).
    oracle="""
WITH RECURSIVE li AS (
  SELECT l_orderkey AS k, l_suppkey AS s
  FROM lineitem WHERE l_quantity >= 48),
pairs AS (
  SELECT DISTINCT a.s AS u, b.s AS v
  FROM li a JOIN li b ON a.k = b.k WHERE a.s < b.s),
und AS (
  SELECT u AS a, v AS b FROM pairs
  UNION ALL
  SELECT v AS a, u AS b FROM pairs),
deg AS (SELECT a AS node, COUNT(*) AS d FROM und GROUP BY a),
it AS (
  SELECT node, d AS core, 0 AS i FROM deg
  UNION ALL
  SELECT a AS node,
         COALESCE(MAX(CASE WHEN nh >= rn THEN rn END), 0) AS core,
         i + 1 AS i
  FROM (
    SELECT und.a, it.i, it.core AS nh,
           ROW_NUMBER() OVER (PARTITION BY und.a, it.i
                              ORDER BY it.core DESC) AS rn
    FROM it JOIN und ON und.b = it.node
    WHERE it.i < 40
  ) ranked
  GROUP BY a, i
)
SELECT it.node, CAST(deg.d AS BIGINT) AS degree,
       CAST(it.core AS BIGINT) AS core
FROM it JOIN deg ON it.node = deg.node WHERE it.i = 40
""",
)
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition of the supplier co-occurrence graph
    (operators.iterative.coreness): every node's core number via
    distributed h-index iteration — integer-exact, partitioning-
    independent. The oracle is a LIVE independent recomputation: the
    same h-index fixpoint unrolled as a DuckDB recursive CTE over the
    raw tables (the q_pagerank oracle pattern); equivalence to
    sequential peeling is additionally property-tested on random
    graphs (tests/test_kcore.py)."""
    return coreness(_supplier_edges(spark, sf_dir))
