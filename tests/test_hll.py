"""Mergeable HLL sketch rollup (operators.profile.hll_rollup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.profile import hll_rollup


def _rollup(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return hll_rollup(
        ev, "user_id", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd"), "day"
    )


def test_union_of_bucket_sketches_equals_direct_sketch(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    merged = {
        r["day"]: r["est_distinct"] for r in _rollup(spark, sf_dir).collect()
    }["__all__"]
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
    ).collect()[0]["e"]
    assert merged == direct  # same registers -> identical, not just close


def test_estimates_within_tolerance_of_exact(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    exact = ev.select("user_id").distinct().count()
    merged = {
        r["day"]: r["est_distinct"] for r in _rollup(spark, sf_dir).collect()
    }["__all__"]
    assert abs(merged - exact) / exact < 0.05


def test_sketch_deterministic_across_partitioning(spark, sf_dir):
    ev = table(spark, sf_dir, "events")

    def run(parts):
        return sorted(
            map(
                tuple,
                hll_rollup(
                    ev.repartition(parts),
                    "user_id",
                    F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd"),
                    "day",
                ).collect(),
            )
        )

    assert run(3) == run(17)


def test_observe_quality_counts_without_second_scan(spark, sf_dir):
    """Observation metrics computed inside the consuming action match
    a direct profile of the same frame."""
    from flink_framework_spark.operators.profile import observe_quality

    ev = table(spark, sf_dir, "events").select("user_id", "props")
    observed, obs = observe_quality(ev, ["props"], name="q")
    n = observed.count()  # the action the metrics piggyback on
    got = obs.get
    assert got["n_rows"] == n
    direct = ev.agg(
        F.sum(F.col("props").isNull().cast("long")).alias("k")
    ).collect()[0]["k"]
    assert got["nulls_props"] == (direct or 0)
