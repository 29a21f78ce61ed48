"""Cross-version regression layer for queries whose registered
oracle was upgraded from a frozen golden to an independent
recomputation: the golden snapshot stays frozen in the repo and this
test pins the engine's output to it, so a semantics change shows up
as an explicit diff (and a deliberate one is re-frozen via
tools/freeze_driver_golden.py)."""

from __future__ import annotations

import pandas as pd

from flink_framework_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.01"


def test_pagerank_matches_frozen_golden(spark):
    got = (
        all_queries()["q_pagerank"]
        .fn(spark, SF_DIR)
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = (
        pd.read_parquet("tests/golden_driver/q_pagerank_sf0.01.parquet")
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hll_datasketches_matches_frozen_golden(spark):
    """q_hll_rollup's driver oracle went LIVE in round 9 by switching
    the query to the portable (md5-register) spelling; the
    DataSketches-native operator keeps its frozen snapshot here so a
    sketch-semantics change still shows up as an explicit diff."""
    from pyspark.sql import functions as F

    from flink_framework_spark.io import table
    from flink_framework_spark.operators.profile import hll_rollup

    got = (
        hll_rollup(
            table(spark, SF_DIR, "events"),
            "user_id",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd"),
            "day",
        )
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    want = (
        pd.read_parquet("tests/golden_driver/q_hll_rollup_sf0.01.parquet")
        .sort_values("day")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
