"""Unbounded sources & sinks (SURVEY.md §2 A2/A3/A5/A6/I9).

Kafka is the reference's transport between jobs; in Spark it is the
``kafka`` DSv2 connector. The connector jar is not on this
container's classpath, so ``kafka_source``/``kafka_sink`` build the
correct reader/writer configuration and fail with a clear message if
the format is unavailable — the call sites and options are the real,
tested-shape API (format, subscribe/topic, bootstrap servers,
checkpointing), exactly what a cluster deployment uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql.types import StructType


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic benchmark stream (``timestamp``, ``value``)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def file_stream_source(
    spark: SparkSession,
    directory: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    path_glob_filter: str | None = None,
) -> DataFrame:
    """Directory-watching file source (the test-friendly 'topic')."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if path_glob_filter is not None:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    return reader.format(fmt).load(directory)


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    subscribe: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka subject source (per-subject topic, as the reference
    generates). Requires the spark-sql-kafka connector on the
    classpath; raises a clear error otherwise."""
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", subscribe)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as exc:  # pragma: no cover - connector not bundled
        raise RuntimeError(
            "kafka connector unavailable: add the spark-sql-kafka-0-10 "
            "package to the session (spark.jars.packages) to use Kafka "
            "subjects"
        ) from exc


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
) -> DataStreamWriter:
    """Kafka subject sink (value must be a serialized string/binary
    column named 'value'). Returned writer still needs ``.start()``."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
    )


def console_sink(df: DataFrame, output_mode: str = "append") -> DataStreamWriter:
    return df.writeStream.format("console").outputMode(output_mode)
