"""SparkSession construction with the engine's recommended configs.

The driver may hand us its own session (``queries()`` callables take an
arbitrary ``SparkSession``), so nothing in the engine may *depend* on
these configs — every query is written to be timezone- and
config-independent. ``configure_session`` applies the few runtime-safe
settings we do need (notably reading nanosecond parquet timestamps).

Scale posture (SURVEY.md §4.2 / K6): AQE enabled for runtime
re-planning (skew-join splitting, partition coalescing), shuffle
partitions sized for the local harness but overridable via env for a
real cluster, Arrow enabled so the few pandas-UDF operators use
vectorized transfer.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs every entry point applies defensively.
# nanosAsLong: the events table is parquet TIMESTAMP(NANOS); Spark 4
# refuses it by default. Reading it as a long and converting to
# TIMESTAMP_NTZ ourselves (io.load_events) matches DuckDB's ns->us
# truncation bit-for-bit (verified empirically).
RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
}


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally provided session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static
            pass
    return spark


def get_spark(
    app_name: str = "flink-framework-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build the engine's own session (tests, bench, CLI use).

    - ``local[$SPARK_GRAFT_CPUS]`` by default; a real deployment passes
      a cluster master and sizes shuffle partitions to ~2-3x total
      cores (at 100 TB: thousands, or rely on AQE coalescing from a
      high initial count).
    - UTC session timezone: queries themselves are tz-independent, but
      UTC keeps any ad-hoc exploration deterministic.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    return configure_session(spark)
