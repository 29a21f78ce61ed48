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
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


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


# The fixed schema every Kafka DSv2 source produces (Spark docs,
# "Structured Streaming + Kafka Integration Guide"). Pinned as a
# contract so downstream deserialization code is testable without a
# broker: tests/test_kafka_contract.py builds frames of this schema
# and runs the real deserializers against them.
KAFKA_SOURCE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


def kafka_source_options(
    bootstrap_servers: str,
    subscribe: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = True,
) -> dict[str, str]:
    """Reader options for a Kafka subject source — the exact DSv2
    option set a cluster deployment passes (pure, contract-tested)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": subscribe,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }


def kafka_sink_options(
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
) -> dict[str, str]:
    """Writer options for a Kafka subject sink (pure, contract-tested)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint_location,
    }


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
            .options(
                **kafka_source_options(
                    bootstrap_servers, subscribe, starting_offsets
                )
            )
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
    return df.writeStream.format("kafka").options(
        **kafka_sink_options(bootstrap_servers, topic, checkpoint_location)
    )


def serialize_for_kafka(
    df: DataFrame, key_col: str, value_cols: list[str] | None = None
) -> DataFrame:
    """Producer-side record shape: (key, value) with the payload
    serialized to JSON — the engine's standard subject encoding. Pure
    column expressions (JVM json serde), usable on batch or stream."""
    payload = (
        F.struct(*[F.col(c) for c in value_cols]) if value_cols
        else F.struct(*[F.col(c) for c in df.columns])
    )
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(payload).alias("value"),
    )


def deserialize_from_kafka(
    df: DataFrame, value_schema: StructType, key_type: str = "string"
) -> DataFrame:
    """Consumer-side decode of the DSv2 record shape
    (``KAFKA_SOURCE_SCHEMA``): cast the key, parse the JSON value into
    typed columns, keep the broker metadata."""
    return df.select(
        # binary -> string first (UTF-8 wire encoding), then the target
        F.col("key").cast("string").cast(key_type).alias("key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    ).select("key", "v.*", "topic", "partition", "offset", "timestamp")


def console_sink(df: DataFrame, output_mode: str = "append") -> DataStreamWriter:
    return df.writeStream.format("console").outputMode(output_mode)
