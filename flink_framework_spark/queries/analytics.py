"""Product/behavioral analytics queries: histograms, cohort
retention, Markov event transitions, and a recursive-CTE hierarchy
rollup (Spark 4's ``WITH RECURSIVE``).

All four are pure Catalyst plans (no Python in the hot path). The
recursive CTE executes as Spark's iterative UnionLoop — each step is
a distributed equi-join, and the number of steps is the hierarchy
depth (logarithmic in table size for the balanced tree here), so the
shape survives a 100 TB scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import round_duck
from flink_framework_spark.io import table
from flink_framework_spark.operators.asof import asof_join
from flink_framework_spark.operators.layout import morton_code
from flink_framework_spark.registry import register


def _morton_sql(d1: str, d2: str, bits: int) -> str:
    """ANSI-SQL spelling of ``operators.layout.morton_code`` for two
    dimensions: a sum of disjoint shifted bits (d1 → odd positions,
    d2 → even), so the oracle runs the same integer arithmetic."""
    terms = []
    for i in range(bits):
        terms.append(f"((({d1} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({d2} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


@register(
    "q_histogram",
    family="D",
    oracle="""
WITH w AS (
  SELECT 'width' AS method,
         CASE WHEN o_totalprice >= 600000 THEN 13
              WHEN o_totalprice < 0 THEN 0
              ELSE CAST(FLOOR(o_totalprice / 50000) AS BIGINT) + 1 END AS bucket,
         o_totalprice AS v
  FROM orders
  UNION ALL
  SELECT 'magnitude' AS method,
         LENGTH(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR)) AS bucket,
         o_totalprice AS v
  FROM orders)
SELECT method, bucket, COUNT(*) AS n_orders,
       MIN(v) AS lo, MAX(v) AS hi
FROM w GROUP BY method, bucket
""",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two order-value histograms in one tagged melt: equi-width via
    ``width_bucket`` (12 buckets of 50k over [0, 600k)) and an
    order-of-magnitude histogram keyed by integer digit count (exact
    integer logic on both engines — no float ``log10`` boundary
    hazard). Narrow map + one hash aggregate; DuckDB lacks
    ``width_bucket`` so the oracle spells out the same arithmetic."""
    orders = table(spark, sf_dir, "orders")
    width = orders.select(
        F.lit("width").alias("method"),
        F.expr("width_bucket(o_totalprice, 0, 600000, 12)")
        .cast("long")
        .alias("bucket"),
        F.col("o_totalprice").alias("v"),
    )
    magnitude = orders.select(
        F.lit("magnitude").alias("method"),
        F.length(F.floor("o_totalprice").cast("long").cast("string"))
        .cast("long")
        .alias("bucket"),
        F.col("o_totalprice").alias("v"),
    )
    return (
        width.unionAll(magnitude)
        .groupBy("method", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )


@register(
    "q_retention",
    family="K",
    oracle="""
WITH p AS (
  SELECT user_id, date_trunc('week', ts) AS wk
  FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, MIN(wk) AS cohort FROM p GROUP BY user_id),
s AS (SELECT cohort, COUNT(*) AS cohort_size FROM c GROUP BY cohort),
a AS (
  SELECT DISTINCT p.user_id, c.cohort,
         CAST(date_diff('week', c.cohort, p.wk) AS BIGINT) AS week_offset
  FROM p JOIN c ON p.user_id = c.user_id)
SELECT strftime(a.cohort, '%Y-%m-%d') AS cohort_week,
       a.week_offset,
       COUNT(*) AS n_active,
       ROUND(COUNT(*) * 1.0 / MAX(s.cohort_size), 4) AS retention
FROM a JOIN s ON s.cohort = a.cohort
GROUP BY a.cohort, a.week_offset
""",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention on purchase events: cohort = the week
    of a user's first purchase; a cohort-week cell counts users from
    that cohort who purchased ``week_offset`` weeks later. Three hash
    aggregates and two equi-joins on (user_id | cohort) — the cohort
    dimension is tiny (weeks), so the size join broadcasts."""
    p = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.date_trunc("week", "ts").alias("wk"))
    )
    c = p.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    s = c.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    a = (
        p.join(c, "user_id")
        .select(
            "user_id",
            "cohort",
            (F.datediff("wk", "cohort") / 7).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return (
        a.join(F.broadcast(s), "cohort")
        .groupBy("cohort", "week_offset")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            round_duck(F.count(F.lit(1)) * 1.0 / F.max("cohort_size"), 4).alias(
                "retention"
            ),
        )
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "retention",
        )
    )


@register(
    "q_event_transitions",
    family="K",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events)
SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n,
       ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY prev), 4) AS p
FROM s WHERE prev IS NOT NULL
GROUP BY prev, event_type
""",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: ``lag`` within each user's timeline, then a (from, to)
    count with row-normalized probabilities. The lag window is
    partitioned by user (distributed); the normalizing window runs on
    the ≤|event_types|² aggregate, which is tiny at any scale.
    Ordering is deterministic: the fixture has no (user_id, ts)
    duplicates."""
    ev = table(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts"))
        .alias("prev"),
    ).filter(F.col("prev").isNotNull())
    counts = s.groupBy(
        F.col("prev").alias("from_type"), F.col("event_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    norm = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        round_duck(F.col("n") * 1.0 / F.sum("n").over(norm), 4).alias("p"),
    )


@register(
    "q_lateral_topk",
    family="C",
    oracle="""
SELECT c.c_mktsegment,
       COUNT(*) AS n_top,
       ROUND((SUM(CAST(ROUND(o.v * 100, 0) AS BIGINT)) / 100.0)
             / COUNT(*), 2) AS avg_top_price,
       MAX(o.v) AS max_top_price
FROM customer c,
     LATERAL (SELECT o_totalprice AS v FROM orders
              WHERE o_custkey = c.c_custkey
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
GROUP BY c.c_mktsegment
""",
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: each
    customer's top-2 order totals, rolled up per market segment.
    Exercises Catalyst's LateralJoin decorrelation (it rewrites the
    per-row limit into a ranked window join — the same physical shape
    as the F2 top-k operator, derived by the optimizer rather than
    hand-written). The orderkey tiebreak keeps ties deterministic,
    and the average sums exact integer cents so the result is
    independent of float addition order (the naive AVG landed on a
    half-cent knife edge at sf0.01)."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    table(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql(
        """
        SELECT c.c_mktsegment,
               COUNT(*) AS n_top,
               ROUND((SUM(CAST(ROUND(o.v * 100, 0) AS BIGINT)) / 100.0D)
                     / COUNT(*) * 100.0D, 0) / 100.0D AS avg_top_price,
               MAX(o.v) AS max_top_price
        FROM lat_customer c,
             LATERAL (SELECT o_totalprice AS v FROM lat_orders
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        GROUP BY c.c_mktsegment
        """
    )


@register(
    "q_regr_stats",
    family="D",
    oracle="""
SELECT l_returnflag,
       ROUND(corr(l_extendedprice, l_quantity), 4) AS r,
       ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
       ROUND(covar_samp(l_extendedprice, l_quantity) / 1000, 3) AS covar_k,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_regr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics suite per return flag: Pearson r, OLS
    slope/intercept, R², and sample covariance (reported in thousands
    so 3-decimal rounding sits far above float merge-order noise).
    All are single-pass co-moment aggregates — Catalyst plans partial
    + final merges, so one shuffle of constant-size state at any
    scale."""
    li = table(spark, sf_dir, "lineitem")
    x, y = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        round_duck(F.corr(x, y), 4).alias("r"),
        round_duck(F.regr_slope(x, y), 4).alias("slope"),
        round_duck(F.regr_intercept(x, y), 4).alias("intercept"),
        round_duck(F.regr_r2(x, y), 4).alias("r2"),
        round_duck(F.covar_samp(x, y) / 1000, 3).alias("covar_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_ewma_recursive",
    family="K",
    oracle="""
WITH RECURSIVE daily AS (
  SELECT event_type AS series, date_trunc('day', ts) AS day,
         CAST(COUNT(*) AS DOUBLE) AS x,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('day', ts)) - 1 AS idx
  FROM events GROUP BY event_type, date_trunc('day', ts)),
ew (series, day, idx, y) AS (
  SELECT series, day, idx, x FROM daily WHERE idx = 0
  UNION ALL
  SELECT d.series, d.day, d.idx, 0.3 * d.x + 0.7 * ew.y
  FROM daily d JOIN ew ON d.series = ew.series AND d.idx = ew.idx + 1)
SELECT series, strftime(day, '%Y-%m-%d') AS day, ROUND(y, 4) AS ewma
FROM ew
""",
)
def q_ewma_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α=0.3) of daily event
    counts per series. The recurrence `y = 0.3·x + 0.7·y_prev` runs
    as ONE Arrow pass per series (applyInPandas over the tiny
    pre-aggregated daily grain) executing the identical float op
    sequence as the oracle's WITH RECURSIVE, so results stay
    bit-exact (a closed-form `Σ x·(1-α)^(i-j)` spelling would hit
    libm pow divergence). An earlier recursive-CTE spelling was
    semantically identical but paid one Spark UnionLoop job per DAY
    of history (9.9 s at sf0.1 vs ~1 s now); the scale-correct split
    is unchanged — the distributed agg reduces 100 TB of events to
    series × days rows, and the sequential tail is per-series."""
    import numpy as np
    import pandas as pd

    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("series"),
            F.date_trunc("day", F.col("ts")).alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )

    def _ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        xs = pdf["x"].to_numpy()
        ys = np.empty_like(xs)
        y = xs[0]
        ys[0] = y
        for i in range(1, len(xs)):
            # same op order as the oracle's `0.3 * d.x + 0.7 * ew.y`
            y = 0.3 * xs[i] + 0.7 * y
            ys[i] = y
        pdf["y"] = ys
        return pdf[["series", "day", "y"]]

    # day is TIMESTAMP_NTZ (date_trunc of the NTZ event time); declare
    # it NTZ in the Arrow schema too so no session-timezone
    # interpretation happens on the way out
    ew = daily.groupBy("series").applyInPandas(
        _ewma, "series string, day timestamp_ntz, y double"
    )
    return ew.select(
        "series",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (F.round(F.col("y") * 10000.0, 0) / 10000.0).alias("ewma"),
    )


@register(
    "q_ab_welch",
    family="D",
    oracle="""
WITH g AS (
  SELECT user_id % 2 AS variant, value
  FROM events WHERE event_type = 'purchase'),
s AS (
  SELECT COUNT(*) FILTER (WHERE variant = 0) AS n0,
         COUNT(*) FILTER (WHERE variant = 1) AS n1,
         AVG(value) FILTER (WHERE variant = 0) AS m0,
         AVG(value) FILTER (WHERE variant = 1) AS m1,
         VAR_SAMP(value) FILTER (WHERE variant = 0) AS v0,
         VAR_SAMP(value) FILTER (WHERE variant = 1) AS v1
  FROM g)
SELECT n0, n1, ROUND(m0, 4) AS mean0, ROUND(m1, 4) AS mean1,
       ROUND((m1 - m0) / SQRT(v0 / n0 + v1 / n1), 4) AS t_stat,
       ROUND(POWER(v0 / n0 + v1 / n1, 2)
             / (POWER(v0 / n0, 2) / (n0 - 1)
                + POWER(v1 / n1, 2) / (n1 - 1)), 2) AS welch_df
FROM s
""",
)
def q_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test over purchase values, variants split
    by user parity: conditional (FILTER) aggregates produce both
    groups' moments in ONE pass — no self-join, no second scan — then
    the t statistic and Welch–Satterthwaite df are scalar arithmetic
    on the single moment row. POWER(x, 2) is plain x·x in both
    engines, so no libm divergence."""
    g = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select((F.col("user_id") % 2).alias("variant"), "value")
    )
    v = F.col("value")
    is0, is1 = F.col("variant") == 0, F.col("variant") == 1
    s = g.agg(
        F.count(F.when(is0, 1)).alias("n0"),
        F.count(F.when(is1, 1)).alias("n1"),
        F.avg(F.when(is0, v)).alias("m0"),
        F.avg(F.when(is1, v)).alias("m1"),
        F.var_samp(F.when(is0, v)).alias("v0"),
        F.var_samp(F.when(is1, v)).alias("v1"),
    )
    se2 = F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")
    return s.select(
        "n0",
        "n1",
        round_duck(F.col("m0"), 4).alias("mean0"),
        round_duck(F.col("m1"), 4).alias("mean1"),
        round_duck((F.col("m1") - F.col("m0")) / F.sqrt(se2), 4).alias("t_stat"),
        round_duck(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v0") / F.col("n0"), 2) / (F.col("n0") - 1)
                + F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
            ),
            2,
        ).alias("welch_df"),
    )


@register(
    "q_attribution",
    family="K",
    oracle="""
WITH p AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
t AS (
  SELECT user_id, ts, event_type FROM events WHERE event_type <> 'purchase')
SELECT COALESCE(t.event_type, 'direct') AS channel,
       COUNT(*) AS n_purchases,
       ROUND(SUM(p.value), 2) AS revenue,
       ROUND(AVG(date_diff('second', t.ts, p.ts)), 2) AS avg_lag_s
FROM p ASOF LEFT JOIN t
  ON p.user_id = t.user_id AND p.ts >= t.ts
GROUP BY COALESCE(t.event_type, 'direct')
""",
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the most
    recent preceding non-purchase event of the same user ('direct'
    when none exists), then revenue and touch-to-purchase lag roll up
    per channel. Composes the C10 as-of operator (one shuffle+sort,
    no pair blow-up) — the oracle is DuckDB's *native* ASOF LEFT
    JOIN, pinning our composed operator against a first-class
    implementation. Lag uses truncate-then-subtract second semantics
    to match ``date_diff('second', ...)`` exactly."""
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), "value"
    )
    t = (
        ev.filter(F.col("event_type") != "purchase")
        .select("user_id", "ts", F.col("event_type"))
        .withColumn("touch_ts", F.col("ts"))
    )
    joined = asof_join(
        p, t, on=["user_id"], left_time="pts", right_time="ts", how="left"
    )
    lag_s = F.expr(
        "timestampdiff(MICROSECOND, date_trunc('SECOND', touch_ts),"
        " date_trunc('SECOND', pts))"
    ) / F.lit(1000000)
    return (
        joined.select(
            F.coalesce("event_type", F.lit("direct")).alias("channel"),
            "value",
            lag_s.cast("long").alias("lag_s"),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            round_duck(F.sum("value"), 2).alias("revenue"),
            round_duck(F.avg("lag_s"), 2).alias("avg_lag_s"),
        )
    )


@register(
    "q_zorder_layout",
    family="K",
    oracle=f"""
WITH d AS (
  SELECT o_custkey % 1024 AS d1,
         LEAST(CAST(FLOOR(o_totalprice / 600) AS BIGINT), 1023) AS d2
  FROM orders),
z AS (SELECT d1, d2, {_morton_sql('d1', 'd2', 10)} AS zcode FROM d)
SELECT zcode // 4096 AS zbucket, COUNT(*) AS n,
       MIN(d1) AS min_cust, MAX(d1) AS max_cust,
       MIN(d2) AS min_price, MAX(d2) AS max_price
FROM z GROUP BY zcode // 4096
""",
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering audit: interleave 10 bits of
    customer key and bucketized order value, split the 20-bit code
    space into 256 range buckets (one per would-be output file), and
    report each bucket's min/max on BOTH dimensions. Tight per-bucket
    ranges on every interleaved column are precisely what makes
    footer-stats skipping work for predicates on either column —
    `operators.layout.zorder_sort` produces this layout physically
    with one range-repartition; the audit here is layout-independent
    (pure integer expression + hash aggregate), so it verifies the
    code math at any scale."""
    d = table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 1024).alias("d1"),
        F.least(
            F.floor(F.col("o_totalprice") / 600).cast("long"), F.lit(1023)
        ).alias("d2"),
    )
    z = d.withColumn("zcode", morton_code([F.col("d1"), F.col("d2")], 10))
    return (
        z.groupBy((F.col("zcode") / 4096).cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("d1").alias("min_cust"),
            F.max("d1").alias("max_cust"),
            F.min("d2").alias("min_price"),
            F.max("d2").alias("max_price"),
        )
    )


@register(
    "q_recursive_depth",
    family="K",
    oracle="""
WITH RECURSIVE h (ck, depth) AS (
  SELECT c_custkey, 0 FROM customer WHERE c_custkey = 1
  UNION ALL
  SELECT c.c_custkey, h.depth + 1
  FROM customer c JOIN h ON c.c_custkey // 2 = h.ck
)
SELECT h.depth, COUNT(*) AS n_customers,
       ROUND(SUM(c.c_acctbal), 2) AS sum_acctbal
FROM h JOIN customer c ON c.c_custkey = h.ck
GROUP BY h.depth
""",
)
def q_recursive_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``) over an implicit
    balanced hierarchy: customer k reports to customer k // 2, rooted
    at key 1; the recursion labels every customer with its depth, then
    rolls up headcount and balance per level. Each iteration is one
    distributed equi-join and the iteration count is log₂(N) — ~31
    levels at 10⁹ customers — so the loop stays cheap at 100 TB."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("rcte_customer")
    return spark.sql(
        """
        WITH RECURSIVE h (ck, depth) AS (
          SELECT c_custkey, 0 FROM rcte_customer WHERE c_custkey = 1
          UNION ALL
          SELECT c.c_custkey, h.depth + 1
          FROM rcte_customer c JOIN h ON c.c_custkey DIV 2 = h.ck
        )
        SELECT h.depth, COUNT(*) AS n_customers,
               ROUND(SUM(c.c_acctbal) * 100.0, 0) / 100.0 AS sum_acctbal
        FROM h JOIN rcte_customer c ON c.c_custkey = h.ck
        GROUP BY h.depth
        """
    )
