"""Z-order layout: the physical property that justifies it — every
output partition covers a tight range of EVERY interleaved dimension,
so footer min/max stats can skip files for predicates on any of them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.layout import morton_code, zorder_sort


def _partition_spans(df, dim_cols, n_parts):
    """Sum of per-partition (max-min) spans for each dimension —
    the proxy for how much a min/max-pruned scan could skip."""
    with_pid = df.withColumn("__pid", F.spark_partition_id())
    rows = (
        with_pid.groupBy("__pid")
        .agg(
            *[F.min(c).alias(f"mn_{c}") for c in dim_cols],
            *[F.max(c).alias(f"mx_{c}") for c in dim_cols],
        )
        .collect()
    )
    assert len(rows) <= n_parts
    return {
        c: sum(r[f"mx_{c}"] - r[f"mn_{c}"] for r in rows) / len(rows)
        for c in dim_cols
    }


def test_zorder_tightens_both_dimensions(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    d = orders.select(
        (F.col("o_custkey") % 1024).alias("d1"),
        F.least(F.floor(F.col("o_totalprice") / 600).cast("long"), F.lit(1023)).alias(
            "d2"
        ),
    )
    n_parts = 8
    code = morton_code([F.col("d1"), F.col("d2")], 10)
    z = zorder_sort(d, code, n_partitions=n_parts)

    # Baseline 1: range-partition on d1 alone — perfect for d1,
    # useless for d2 (each partition spans d2's full range).
    single = d.repartitionByRange(n_parts, "d1")

    z_spans = _partition_spans(z, ["d1", "d2"], n_parts)
    s_spans = _partition_spans(single, ["d1", "d2"], n_parts)

    full_d2 = s_spans["d2"]
    # Z-order must cut the second dimension's average span well below
    # the single-key layout's (which covers ~the whole domain), while
    # keeping d1 locality far better than unsorted (full-span) too.
    assert z_spans["d2"] < 0.75 * full_d2, (z_spans, s_spans)
    assert z_spans["d1"] < 0.75 * 1024, (z_spans, s_spans)


def test_morton_code_is_bijective_on_grid(spark):
    # Every (d1, d2) pair on a small grid maps to a distinct code and
    # decodes back via bit de-interleaving.
    df = (
        spark.range(0, 32)
        .withColumnRenamed("id", "d1")
        .crossJoin(spark.range(0, 32).withColumnRenamed("id", "d2"))
    )
    coded = df.withColumn("z", morton_code([F.col("d1"), F.col("d2")], 5))
    assert coded.select("z").distinct().count() == 32 * 32
    mx = coded.agg(F.max("z")).collect()[0][0]
    assert mx == (1 << 10) - 1
