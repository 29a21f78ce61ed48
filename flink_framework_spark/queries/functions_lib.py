"""H. Scalar function library (SURVEY.md §2 H1-H8).

One query per family exercises several functions at once. Integer-
returning functions are aligned across engines (DuckDB widens most to
BIGINT; Spark often returns INT) by casting the Spark side to long —
values are identical, the cast only normalizes the physical type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import round_duck
from flink_framework_spark.io import table
from flink_framework_spark.registry import register


@register(
    "q_str_funcs",
    family="H",
    oracle="""
SELECT c_custkey,
       UPPER(c_name) AS u, LOWER(c_mktsegment) AS lo,
       SUBSTRING(c_name, 1, 8) AS sub, CAST(LENGTH(c_name) AS BIGINT) AS len,
       CONCAT(c_mktsegment, '#', c_name) AS cc,
       LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS pad,
       REPLACE(c_name, 'Customer', 'Cust') AS rep
FROM customer
""",
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: upper/lower/substring/length/concat/lpad/replace."""
    cu = table(spark, sf_dir, "customer")
    return cu.select(
        "c_custkey",
        F.upper("c_name").alias("u"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("sub"),
        F.length("c_name").cast("long").alias("len"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_name")).alias("cc"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("pad"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("rep"),
    )


@register(
    "q_str_regex",
    family="H",
    oracle="""
SELECT c_custkey,
       regexp_extract(c_name, '([0-9]+)', 1) AS num,
       regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS repl
FROM customer
""",
)
def q_str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract/replace (patterns in the RE2 ∩ Java common subset;
    Spark replace is global by default, DuckDB needs the 'g' flag)."""
    cu = table(spark, sf_dir, "customer")
    return cu.select(
        "c_custkey",
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("num"),
        F.regexp_replace("c_mktsegment", r"[AEIOU]", "_").alias("repl"),
    )


@register(
    "q_date_funcs",
    family="H",
    oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
       CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS d,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS q,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(o_orderdate + INTERVAL '30 days', '%Y-%m-%d') AS plus30,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS age_days
FROM orders
""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions: extract, trunc, interval arithmetic, diff."""
    od = table(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("d"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("plus30"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("age_days"),
    )


@register(
    "q_math_funcs",
    family="H",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(SQRT(l_quantity), 4) AS sq,
       CAST(FLOOR(l_discount * 100) AS BIGINT) AS fl,
       CAST(CEIL(l_tax * 100) AS BIGINT) AS ce,
       ABS(l_quantity - 25) AS ab,
       ROUND(POW(l_quantity, 2), 2) AS p2,
       ROUND(LN(l_extendedprice), 4) AS lnp,
       MOD(CAST(l_quantity AS INT), 7) AS md,
       CAST(SIGN(l_discount - 0.05) AS BIGINT) AS sg
FROM lineitem
""",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions: sqrt/floor/ceil/abs/pow/ln/mod/sign."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        round_duck(F.sqrt("l_quantity"), 4).alias("sq"),
        F.floor(F.col("l_discount") * 100).alias("fl"),
        F.ceil(F.col("l_tax") * 100).alias("ce"),
        F.abs(F.col("l_quantity") - 25).alias("ab"),
        round_duck(F.pow("l_quantity", F.lit(2)), 2).alias("p2"),
        round_duck(F.log("l_extendedprice"), 4).alias("lnp"),
        (F.col("l_quantity").cast("int") % 7).alias("md"),
        F.signum(F.col("l_discount") - 0.05).cast("long").alias("sg"),
    )


@register(
    "q_cond_funcs",
    family="H",
    oracle="""
SELECT o_orderkey,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS st,
       ROUND(GREATEST(o_totalprice, 100000.0), 2) AS hi,
       ROUND(LEAST(o_totalprice, 100000.0), 2) AS lo
FROM orders
""",
)
def q_cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null functions: coalesce/nullif/greatest/least."""
    od = table(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "st"
        ),
        round_duck(F.greatest(F.col("o_totalprice"), F.lit(100000.0)), 2).alias("hi"),
        round_duck(F.least(F.col("o_totalprice"), F.lit(100000.0)), 2).alias("lo"),
    )


@register(
    "q_array_funcs",
    family="H",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       list_contains(string_split(text, ' '), 'spark') AS has_spark
FROM documents
""",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over tokenized text: size, contains."""
    docs = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.array_contains(words, "spark").alias("has_spark"),
    )


@register(
    "q_array_embed",
    family="H",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 4) AS e1,
       ROUND(list_sum(list_transform(embedding[1:4],
                                     x -> CAST(x AS DOUBLE))), 4) AS head_sum
FROM embeddings
""",
)
def q_array_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array element/slice/higher-order fold on the embedding column.

    DuckDB list slice [1:4] is 1-based inclusive => 4 elements =>
    Spark slice(col, 1, 4). Fold accumulates in double sequentially in
    both engines (bit-identical, SURVEY.md §5.3)."""
    em = table(spark, sf_dir, "embeddings")
    head = F.slice(F.col("embedding"), 1, 4)
    return em.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        round_duck(F.element_at("embedding", 1).cast("double"), 4).alias("e1"),
        round_duck(
            F.aggregate(head, F.lit(0.0), lambda acc, x: acc + x.cast("double")), 4
        ).alias("head_sum"),
    )


@register(
    "q_map_json",
    family="H",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events GROUP BY event_type
""",
)
def q_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction + cast + aggregate."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_text_wordcount",
    family="H",
    oracle="""
SELECT w AS word, COUNT(*) AS n FROM (
  SELECT UNNEST(string_split(lower(text), ' ')) AS w FROM documents) t
WHERE w <> ''
GROUP BY w
""",
)
def q_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatMap/explode (UNNEST) + word count — the canonical streaming
    hello-world of the reference's world (B4/H8/K4)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
