"""Extended TPC-H-shaped workload corpus (adapted to the fixture's
reduced schema — no partsupp, no commit/receipt dates) — widens
`queries/tpch.py` (Q3/Q6/Q10/Q18) with the remaining expressible
query shapes: EXISTS / NOT EXISTS decorrelation (Q4/Q22), the
6-way star with a cross-dimension equality (Q5), nation-pair volume
(Q7), market-share ratio (Q8), profit rollup (Q9), conditional
aggregation (Q12), outer-join histogram (Q13), promo ratio (Q14),
scalar-subquery max (Q15), distinct-count grouping (Q16), correlated
scalar subquery (Q17), and disjunctive predicate pushdown (Q19).

These exercise exactly the Catalyst machinery a warehouse relies on:
RewritePredicateSubquery (semi/anti), RewriteCorrelatedScalarSubquery
(Q15/Q17/Q22), join reordering over selective dimension filters, and
disjunctive predicate pushdown into the parquet scan (Q19).

Determinism: money sums over join fan-outs use the Q3 double-round
pattern (snap the raw double sum to its exact 4-decimal grid before
money-rounding — see queries/tpch.py); ratio queries snap numerator
and denominator sums BEFORE dividing so the division inputs are
bit-identical across engines; counts use COUNT(*)/COUNT(col) (BIGINT
in both engines); years cast to long.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import round_duck
from flink_framework_spark.io import table
from flink_framework_spark.registry import register


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _money(col: F.Column) -> F.Column:
    """The Q3 double-round: snap to 4 decimals, then money-round."""
    return round_duck(round_duck(col, 4), 2)


@register(
    "q_tpch_q4",
    family="C",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o.o_orderpriority
""",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking), adapted: the fixture
    has no commit/receipt dates, so 'late' means a lineitem shipped
    more than 60 days after the order date. Correlated EXISTS with a
    non-equi residual -> left-semi join (RewritePredicateSubquery)."""
    od = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    li = table(spark, sf_dir, "lineitem")
    late = od.join(
        li,
        (od.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > od.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "q_tpch_q5",
    family="C",
    oracle="""
SELECT n.n_name AS nation,
       ROUND(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4), 2) AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n.n_name
""",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): 6-way star join whose
    distinguishing feature is the cross-dimension equality
    c_nationkey = s_nationkey (customer and supplier in the same
    nation) — a join-reordering stress test."""
    cu = table(spark, sf_dir, "customer")
    od = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    su = table(spark, sf_dir, "supplier")
    na = table(spark, sf_dir, "nation")
    re = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey)
        .join(li, od.o_orderkey == li.l_orderkey)
        .join(su, (li.l_suppkey == su.s_suppkey) & (cu.c_nationkey == su.s_nationkey))
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(_money(F.sum(_revenue())).alias("revenue"))
    )


@register(
    "q_tpch_q7",
    family="C",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       ROUND(ROUND(SUM(volume), 4), 2) AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) t
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): trade volume between a nation pair
    by year; the nation dimension joins twice under different roles."""
    su = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders")
    cu = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        su.join(li, su.s_suppkey == li.l_suppkey)
        .join(od, od.o_orderkey == li.l_orderkey)
        .join(cu, cu.c_custkey == od.o_custkey)
        .join(F.broadcast(n1), su.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cu.c_nationkey == F.col("n2_key"))
        .filter(pair | rpair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(_money(F.sum(_revenue())).alias("revenue"))
    )


@register(
    "q_tpch_q8",
    family="D",
    oracle="""
SELECT o_year,
       ROUND(ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END), 4)
             / ROUND(SUM(volume), 4), 4) AS mkt_share
FROM (SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n1.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN region r   ON n2.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY') t
GROUP BY o_year
""",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of revenue
    within a region/part-type slice, by order year. Both sums are
    snapped to the 4-decimal grid BEFORE the division so the ratio's
    inputs are bit-identical in both engines."""
    pa = table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = table(spark, sf_dir, "lineitem")
    su = table(spark, sf_dir, "supplier")
    od = table(spark, sf_dir, "orders")
    cu = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    re = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = _revenue()
    nat_vol = F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        F.broadcast(pa)
        .join(li, pa.p_partkey == li.l_partkey)
        .join(su, su.s_suppkey == li.l_suppkey)
        .join(od, od.o_orderkey == li.l_orderkey)
        .join(cu, cu.c_custkey == od.o_custkey)
        .join(F.broadcast(n1), su.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cu.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(re), F.col("n2_region") == re.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            round_duck(
                round_duck(F.sum(nat_vol), 4) / round_duck(F.sum(vol), 4), 4
            ).alias("mkt_share")
        )
    )


@register(
    "q_tpch_q9",
    family="D",
    oracle="""
SELECT nation, o_year, ROUND(ROUND(SUM(amount), 4), 2) AS sum_profit
FROM (SELECT n.n_name AS nation,
             CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.5 * p.p_retailprice * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%widget%') t
GROUP BY nation, o_year
""",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit), adapted: no partsupp in
    the fixture, so supply cost is modeled as half the part's retail
    price. Profit rolled up by supplier nation and order year."""
    pa = table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = table(spark, sf_dir, "lineitem")
    su = table(spark, sf_dir, "supplier")
    od = table(spark, sf_dir, "orders")
    na = table(spark, sf_dir, "nation")
    amount = _revenue() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        F.broadcast(pa)
        .join(li, pa.p_partkey == li.l_partkey)
        .join(su, su.s_suppkey == li.l_suppkey)
        .join(od, od.o_orderkey == li.l_orderkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(_money(F.sum(amount)).alias("sum_profit"))
    )


@register(
    "q_tpch_q12",
    family="D",
    oracle="""
SELECT l.l_returnflag,
       COUNT(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT','2-HIGH')) AS high_line_count,
       COUNT(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l.l_returnflag
""",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / priority), adapted: no
    l_shipmode or receipt dates, so the slice is 'shipped 90+ days
    after ordering in 1997', split into high/low priority counts per
    return flag — conditional aggregation over a non-equi-filtered
    join."""
    od = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        od.join(
            li,
            (od.o_orderkey == li.l_orderkey)
            & (li.l_shipdate >= od.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "q_tpch_q13",
    family="C",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey) t
GROUP BY c_count
""",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): outer join with an ON-clause
    filter (kept customers with zero matching orders), then a
    histogram of the per-customer counts — two chained aggregations."""
    cu = table(spark, sf_dir, "customer")
    od = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q_tpch_q14",
    family="D",
    oracle="""
SELECT ROUND(100.0 * ROUND(SUM(CASE WHEN p.p_type = 'PROMO'
                                    THEN l.l_extendedprice * (1 - l.l_discount)
                                    ELSE 0 END), 4)
             / ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4), 4) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
  AND l.l_shipdate <  TIMESTAMP '1997-10-01'
""",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): promo share of one month's
    revenue; sums snapped to the 4-decimal grid before dividing (see
    q_tpch_q8)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    pa = table(spark, sf_dir, "part")
    rev = _revenue()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .agg(
            round_duck(
                100.0 * round_duck(F.sum(promo), 4) / round_duck(F.sum(rev), 4), 4
            ).alias("promo_revenue")
        )
    )


@register(
    "q_tpch_q15",
    family="D",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(ROUND(SUM(l_extendedprice * (1 - l_discount)), 4), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue per supplier,
    keeping the supplier(s) at the scalar-subquery maximum. The max is
    taken over the ROUNDED revenue so the equality compare is exact."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    su = table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _money(F.sum(_revenue())).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        su.join(revenue, su.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q_tpch_q16",
    family="D",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship), adapted: the
    lineitem fact stands in for partsupp — distinct suppliers that
    shipped each surviving (brand, type, size) combination."""
    pa = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        F.broadcast(pa)
        .join(li, li.l_partkey == pa.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_tpch_q17",
    family="D",
    oracle="""
SELECT ROUND(ROUND(SUM(l.l_extendedprice), 4) / 7.0, 2) AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                      FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
""",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): correlated scalar
    subquery (per-part average quantity) — decorrelated into an
    aggregate + join. The threshold is deterministic across engines
    because l_quantity is integral: its double sum is EXACT regardless
    of accumulation order."""
    li = table(spark, sf_dir, "lineitem")
    pa = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_q = li.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(avg_q, li.l_partkey == F.col("avg_pk"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg((round_duck(F.sum("l_extendedprice"), 4) / 7.0).alias("__raw"))
        .select(round_duck("__raw", 2).alias("avg_yearly"))
    )


@register(
    "q_tpch_q19",
    family="B",
    oracle="""
SELECT ROUND(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4), 2) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): three disjunctive
    brand/size/quantity branches — Catalyst extracts the common
    sub-predicates per side so both scans still get pushed filters."""
    li = table(spark, sf_dir, "lineitem")
    pa = table(spark, sf_dir, "part")
    branch = lambda brand, szhi, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, szhi)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .filter(
            branch("Brand#1", 15, 1, 11)
            | branch("Brand#2", 25, 10, 20)
            | branch("Brand#3", 35, 20, 30)
        )
        .agg(_money(F.sum(_revenue())).alias("revenue"))
    )


@register(
    "q_tpch_q22",
    family="C",
    oracle="""
SELECT c.c_nationkey, COUNT(*) AS numcust,
       ROUND(ROUND(SUM(c.c_acctbal), 4), 2) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                     WHERE c2.c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'P')
GROUP BY c.c_nationkey
""",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity), adapted: rich
    customers (balance above the positive-balance average) with no
    pending ('P') orders, grouped by nation — an uncorrelated scalar
    subquery feeding a filter plus a NOT EXISTS anti join. (Plain
    'no orders at all' would be degenerate: every customer has
    orders — SURVEY.md §5.3.)"""
    cu = table(spark, sf_dir, "customer")
    od = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    avg_bal = cu.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = cu.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    return (
        rich.join(od, rich.c_custkey == od.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _money(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )


@register(
    "q_tpch_q21",
    family="C",
    oracle="""
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name IN
     ('NATION_0', 'NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
    the reduced schema: no commit/receipt dates, so the 'waiting'
    lineitem is one shipped >60 days after the order date that is also
    the strictly-latest ship among the order's suppliers. Exercises
    the full Q21 decorrelation stack: correlated EXISTS (left semi on
    the order key with a supplier-inequality residual) AND correlated
    NOT EXISTS (left anti with inequality + non-equi date residual) on
    the same fact self-joins, then agg + TakeOrdered."""
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(
            "NATION_0", "NATION_1", "NATION_2", "NATION_3", "NATION_4"
        )
    )
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")

    l1 = (
        li.alias("l1")
        .join(orders.alias("o"), F.col("l1.l_orderkey") == F.col("o.o_orderkey"))
        .filter(
            F.col("l1.l_shipdate")
            > F.col("o.o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l1.l_orderkey", "l1.l_suppkey", "l1.l_shipdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3"))
            & (F.col("d3") > F.col("l_shipdate")),
            "left_anti",
        )
    )
    return (
        waiting.join(
            sup.join(nat, sup.s_nationkey == nat.n_nationkey).select(
                "s_suppkey", "s_name"
            ),
            waiting.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
