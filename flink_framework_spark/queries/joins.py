"""C. Joins — the reference's windowed/CoGroup/interval join surface
(SURVEY.md §2 C1-C11 [F]) in batch-relational form.

Scale notes per query are inline; the recurring principles:
- dimension tables (region/nation/customer at star scale) broadcast —
  Spark's JoinSelection does this automatically below the threshold,
  and C11 pins it explicitly with the hint;
- fact-fact joins (interval/as-of on events) shuffle ONCE on the join
  key and stay sort-merge; the as-of join uses the union-merge plan in
  ``operators.asof`` instead of a pair-exploding theta join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import round_duck
from flink_framework_spark.io import table
from flink_framework_spark.operators.asof import asof_join
from flink_framework_spark.registry import register


@register(
    "q_join_inner",
    family="C",
    oracle="""
SELECT c.c_mktsegment AS mktsegment, COUNT(*) AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + grouped agg."""
    od = table(spark, sf_dir, "orders")
    cu = table(spark, sf_dir, "customer")
    return (
        od.join(cu, od.o_custkey == cu.c_custkey, "inner")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            round_duck(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "q_join_multi",
    family="C",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey  = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY r.r_name, n.n_name
""",
)
def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 5-table star join + revenue rollup (TPC-H Q5 shape).

    lineitem->orders is the only fact-fact edge; customer/nation/region
    are dims that Spark broadcasts, so the plan is one shuffle for the
    big join plus broadcast hash joins — exactly what we want at scale.
    """
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1996-01-01")
    cu = table(spark, sf_dir, "customer")
    na = table(spark, sf_dir, "nation")
    re = table(spark, sf_dir, "region")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            round_duck(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "q_join_left",
    family="C",
    oracle="""
SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
""",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join (CoGroup analogue), counting non-null matches."""
    cu = table(spark, sf_dir, "customer")
    od = table(spark, sf_dir, "orders")
    return (
        cu.join(od, od.o_custkey == cu.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "q_join_full",
    family="C",
    oracle="""
SELECT COALESCE(cn.k, sn.k) AS nationkey,
       COALESCE(cn.n_cust, 0) AS n_cust,
       COALESCE(sn.n_supp, 0) AS n_supp
FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) cn
FULL JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) sn
  ON cn.k = sn.k
""",
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates."""
    cn = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cn.join(sn, cn.ck == sn.sk, "full").select(
        F.coalesce("ck", "sk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "q_join_semi",
    family="C",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS)."""
    cu = table(spark, sf_dir, "customer")
    od = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    family="C",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS). Status 'P' keeps it non-degenerate
    (every customer has >=1 order in the fixtures — SURVEY.md §5.3)."""
    cu = table(spark, sf_dir, "customer")
    od = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_cross",
    family="C",
    oracle="""
SELECT r.r_name, s.o_orderstatus
FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
""",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (small x small only — guarded by design)."""
    re = table(spark, sf_dir, "region").select("r_name")
    st = table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return re.crossJoin(st)


@register(
    "q_join_theta",
    family="C",
    oracle="""
SELECT p.p_brand, COUNT(*) AS n
FROM lineitem l JOIN part p
  ON l.l_partkey = p.p_partkey AND l.l_quantity < p.p_size
GROUP BY p.p_brand
""",
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key + inequality residual (stays a hash join
    on the equi part; the inequality is a post-filter, not a BNLJ)."""
    li = table(spark, sf_dir, "lineitem")
    pa = table(spark, sf_dir, "part")
    return (
        li.join(pa, (li.l_partkey == pa.p_partkey) & (li.l_quantity < pa.p_size))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_join_interval",
    family="C",
    oracle="""
SELECT e1.event_id AS view_id, e2.event_id AS purchase_id
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id
 AND e1.event_type = 'view' AND e2.event_type = 'purchase'
 AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL '10 minutes'
""",
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of Flink's keyed interval join (C9/I6): equi on the
    key, bounded time range as residual. One shuffle on user_id; the
    streaming twin is the watermarked stream-stream join in
    ``streaming.twins``."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return views.join(
        buys,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select("view_id", "purchase_id")


@register(
    "q_join_interval_outer",
    family="C",
    oracle="""
SELECT e1.event_id AS view_id, e2.event_id AS purchase_id
FROM (SELECT * FROM events WHERE event_type = 'view') e1
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') e2
  ON e1.user_id = e2.user_id
 AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL '10 minutes'
""",
)
def q_join_interval_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER interval join (C9's outer rung — Flink's
    IntervalJoin with unmatched-row emission): views that led to a
    purchase within 10 minutes keep the pair, views that didn't
    surface with a NULL purchase_id. Same single-shuffle equi-key
    plan as the inner form; the streaming twin (watermark-evicted
    outer state, left AND full outer) is verified row-for-row in
    tests/test_streaming_joins.py."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return views.join(
        buys,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 10 MINUTES")),
        "left_outer",
    ).select("view_id", "purchase_id")


@register(
    "q_join_asof",
    family="C",
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the union-merge operator (see operators.asof):
    latest click at-or-before each purchase, per user."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        right_tiebreak="click_id",
        how="inner",
    )
    return joined.select("purchase_id", "click_id")


@register(
    "q_join_broadcast",
    family="C",
    oracle="""
SELECT p.p_type, ROUND(SUM(l.l_extendedprice), 2) AS total
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_type
""",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join of the part dimension (C11):
    shuffle-free join regardless of lineitem size."""
    li = table(spark, sf_dir, "lineitem")
    pa = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .groupBy("p_type")
        .agg(round_duck(F.sum("l_extendedprice"), 2).alias("total"))
    )
