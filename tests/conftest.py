"""Shared fixtures.

The session deliberately uses a NON-UTC timezone: the driver hands our
queries an arbitrary session, so every query must be tz-independent —
running the whole oracle suite under America/New_York proves it.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_T2 = os.environ.get("SPARK_GRAFT_T2_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    from flink_framework_spark.session import configure_session

    s = (
        SparkSession.builder.master("local[4]")
        .appName("flink-framework-spark-tests")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    configure_session(s)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture()
def spark_session_holder(spark):
    """Ensures the shared session exists before hypothesis @given
    bodies run (they can't take fixtures directly)."""
    return spark
