"""J. UDF / UDAF / grouped-map surface (SURVEY.md §2 J1-J4).

The reference's entire job surface is user code over streams (Scala
map/flatMap/process functions [R]); PySpark's tiers are demonstrated
here deliberately — one row-at-a-time UDF (J1, the slow path, kept off
hot paths everywhere else), Arrow-vectorized pandas UDFs (J2/J4), and
a grouped-map applyInPandas (J3). Oracles inline the same logic as SQL.

UDFs are created inside the query functions (PySpark requires an
active session to resolve DDL return types).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from flink_framework_spark.functions.helpers import round_duck
from flink_framework_spark.io import table
from flink_framework_spark.registry import register


def _bucket(revenue: float) -> str:
    if revenue > 50000:
        return "high"
    if revenue > 20000:
        return "mid"
    return "low"


@register(
    "q_udf_python",
    family="J",
    oracle="""
SELECT bucket, COUNT(*) AS n FROM (
  SELECT CASE WHEN l_extendedprice * (1 - l_discount) > 50000 THEN 'high'
              WHEN l_extendedprice * (1 - l_discount) > 20000 THEN 'mid'
              ELSE 'low' END AS bucket
  FROM lineitem) t
GROUP BY bucket
""",
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (J1). The revenue arithmetic stays
    JVM-side; only the bucketing crosses into Python."""
    bucket_udf = F.udf(_bucket, StringType())
    li = table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    return (
        li.select(rev)
        .select(bucket_udf("revenue").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q_udf_pandas",
    family="J",
    oracle="""
SELECT event_id, ROUND((value - 250.0) / 100.0, 4) AS zvalue FROM events
""",
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow) scalar pandas UDF (J2); final ROUND runs
    JVM-side so rounding semantics match the oracle exactly."""

    @F.pandas_udf(DoubleType())
    def zscale(value: pd.Series) -> pd.Series:
        return (value - 250.0) / 100.0

    ev = table(spark, sf_dir, "events")
    return ev.select("event_id", round_duck(zscale("value"), 4).alias("zvalue"))


def _demean(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf[["user_id"]].copy()
    out["dev"] = pdf["value"] - pdf["value"].mean()
    return out


@register(
    "q_udf_grouped_map",
    family="J",
    oracle="""
SELECT user_id, ROUND(SUM(POW(value - avgv, 2)), 2) AS ss FROM (
  SELECT user_id, value,
         AVG(value) OVER (PARTITION BY user_id) AS avgv
  FROM events) t
GROUP BY user_id
""",
)
def q_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (J3): demean per user in pandas, then
    aggregate the squared deviations JVM-side."""
    ev = table(spark, sf_dir, "events").select("user_id", "value")
    deviations = ev.groupBy("user_id").applyInPandas(
        _demean, schema="user_id long, dev double"
    )
    return deviations.groupBy("user_id").agg(
        round_duck(F.sum(F.col("dev") * F.col("dev")), 2).alias("ss")
    )


@register(
    "q_udaf_geomean",
    family="J",
    oracle="""
SELECT event_type, ROUND(EXP(AVG(LN(value))), 4) AS gmean
FROM events WHERE value > 0 GROUP BY event_type
""",
)
def q_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF as a grouped-agg pandas UDF (J4): geometric mean
    (exp∘avg∘ln) over the positive domain — sf0.1 events contain a
    handful of exact zeros, so both sides filter value > 0."""

    @F.pandas_udf(DoubleType())
    def geomean(value: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(value.to_numpy()).mean()))

    ev = table(spark, sf_dir, "events").filter(F.col("value") > 0)
    return ev.groupBy("event_type").agg(
        round_duck(geomean("value"), 4).alias("gmean")
    )


@register(
    "q_udtf_ngrams",
    family="J",
    oracle="""
SELECT doc_id, pos, gram FROM (
  SELECT doc_id,
         UNNEST(range(1, greatest(len(w), 1))) AS pos,
         w
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
        FROM documents WHERE doc_id % 20 = 0) t) u
CROSS JOIN LATERAL (
  SELECT w[pos] || ' ' || w[pos + 1] AS gram) g
""",
)
def q_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A true Python UDTF (Spark 4 ``@udtf``, 1->N table function —
    the J5 contract in its native API, beside the mapInPandas
    spelling in q_multimodal_meta): emit (pos, bigram) rows per
    document. Restricted to every 20th doc — a UDTF runs row-at-a-
    time Python, so the engine keeps it off wide paths (the
    JVM-expression bigram spelling lives in the dedup shinglers);
    this query pins the API surface, not a hot path."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos int, gram string")
    class Bigrams:
        def eval(self, doc_id: int, text: str):  # noqa: ANN001
            toks = str(text).lower().strip().split(" ")
            for i in range(max(len(toks) - 1, 0)):
                yield i + 1, f"{toks[i]} {toks[i + 1]}"

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("bigrams_udtf", Bigrams)
    return spark.sql(
        """
        SELECT d.doc_id, b.pos, b.gram
        FROM udtf_docs d, LATERAL bigrams_udtf(d.doc_id, d.text) b
        """
    )


@register(
    "q_udf_cogroup",
    family="J",
    oracle="""
SELECT c.c_custkey,
       COALESCE(o.n_orders, 0) AS n_orders,
       ROUND(COALESCE(o.total, 0.0) / c.c_acctbal, 4) AS spend_ratio
FROM customer c
LEFT JOIN (
  SELECT o_custkey, COUNT(*) AS n_orders, SUM(o_totalprice) AS total
  FROM orders GROUP BY 1) o
  ON o.o_custkey = c.c_custkey
WHERE c.c_acctbal > 0
""",
)
def q_udf_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-input keyed operator — the Flink connect/CoProcessFunction
    analogue: ``cogroup(...).applyInPandas`` receives BOTH inputs for
    a key partition in one call (customers and their orders) and emits
    fused rows.

    Scale shape: cogrouping on the raw key would invoke Python once per
    key (~15k calls at sf0.1, measured 18 s). Instead we cogroup on a
    KEY GROUP — ``xxhash64(key) % 64`` — exactly Flink's key-group
    mechanism (keys are hashed into maxParallelism key groups and
    operator state is partitioned by group, not by key). Each Python
    call then fuses a whole group's customers and orders with a
    vectorized pandas merge: 64 calls total, and the call count stays
    64 at 100 TB while per-call batch size scales with data/64.

    Kept semantically SQL-checkable (count/sum/ratio) so the driver
    oracle can verify the cogroup wiring end-to-end."""
    import numpy as np
    import pandas as pd

    n_key_groups = 64
    cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select("c_custkey", "c_acctbal")
        .withColumn("kg", F.pmod(F.xxhash64("c_custkey"), F.lit(n_key_groups)))
    )
    orders = (
        table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .withColumn("kg", F.pmod(F.xxhash64("o_custkey"), F.lit(n_key_groups)))
    )

    def fuse(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:  # order rows whose customers were all filtered out
            return pd.DataFrame(
                {"c_custkey": [], "n_orders": [], "spend_ratio": []}
            )
        if right.empty:
            agg = pd.DataFrame({"n_orders": [], "total": []})
            agg.index.name = "o_custkey"
        else:
            agg = right.groupby("o_custkey")["o_totalprice"].agg(
                n_orders="count", total="sum"
            )
        m = left.merge(agg, left_on="c_custkey", right_index=True, how="left")
        total = m["total"].fillna(0.0).to_numpy()
        r = total / m["c_acctbal"].to_numpy()
        # round-half-away-from-zero at 4 dp, matching DuckDB ROUND
        ratio = np.floor(np.abs(r) * 1e4 + 0.5) / 1e4 * np.where(r < 0, -1, 1)
        return pd.DataFrame(
            {
                "c_custkey": m["c_custkey"].astype("int64"),
                "n_orders": m["n_orders"].fillna(0).astype("int64"),
                "spend_ratio": ratio,
            }
        )

    return (
        cust.groupBy("kg")
        .cogroup(orders.groupBy("kg"))
        .applyInPandas(
            fuse, schema="c_custkey long, n_orders long, spend_ratio double"
        )
    )
