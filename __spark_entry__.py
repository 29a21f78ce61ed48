"""Driver contract for the spark-graft builder (PySpark target).

Delegates to the ``flink_framework_spark`` package: the registry in
``flink_framework_spark.registry`` is the single source of truth for
the implemented SURVEY.md §2 inventory (Spark callable + DuckDB oracle
per query).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_framework_spark.registry import all_queries  # noqa: E402
from flink_framework_spark.session import configure_session  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (5-table star join + revenue rollup) at sf0.001."""
    configure_session(spark)
    return all_queries()["q_join_multi"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(q.fn) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle}
