"""Kafka connector contract (A2/A3) — broker-free pinning.

The spark-sql-kafka jar and a broker are absent from this container,
so the end-to-end path can't run here. These tests pin everything on
OUR side of the contract instead: the exact DSv2 options the builders
emit, the documented source schema, and the real producer/consumer
serde expressions (which run fine on batch frames of the pinned
schema) — a deployment only adds the jar and a bootstrap address.
"""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from flink_framework_spark.io import table
from flink_framework_spark.sources.streaming import (
    KAFKA_SOURCE_SCHEMA,
    deserialize_from_kafka,
    kafka_sink_options,
    kafka_source,
    kafka_source_options,
    serialize_for_kafka,
)

SF_DIR = "/root/testdata/sf0.001"


def test_source_options_exact():
    assert kafka_source_options("broker:9092", "events-subject") == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "events-subject",
        "startingOffsets": "earliest",
        "failOnDataLoss": "true",
    }
    assert (
        kafka_source_options("b:9092", "t", starting_offsets="latest",
                             fail_on_data_loss=False)["startingOffsets"]
        == "latest"
    )


def test_sink_options_exact():
    assert kafka_sink_options("broker:9092", "out-topic", "/ckpt/dir") == {
        "kafka.bootstrap.servers": "broker:9092",
        "topic": "out-topic",
        "checkpointLocation": "/ckpt/dir",
    }


def test_source_schema_is_the_documented_dsv2_shape(spark):
    assert KAFKA_SOURCE_SCHEMA == StructType.fromDDL(
        "key BINARY, value BINARY, topic STRING, partition INT, "
        "offset BIGINT, timestamp TIMESTAMP, timestampType INT"
    )


def test_serde_round_trip_through_record_shape(spark):
    """events -> (key, value json) -> DSv2 record frame -> decoded
    events: the full producer/consumer path minus the broker hop."""
    ev = table(spark, SF_DIR, "events").limit(50)
    wire = serialize_for_kafka(
        ev, key_col="user_id", value_cols=["event_id", "event_type", "value"]
    )
    assert [f.name for f in wire.schema.fields] == ["key", "value"]

    # simulate the broker round-trip: records come back in the pinned
    # DSv2 source schema with binary key/value + metadata
    records = wire.select(
        F.encode("key", "UTF-8").alias("key"),
        F.encode("value", "UTF-8").alias("value"),
        F.lit("events-subject").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    # literals make some fields non-nullable; the contract is names+types
    assert [(f.name, f.dataType) for f in records.schema.fields] == [
        (f.name, f.dataType) for f in KAFKA_SOURCE_SCHEMA.fields
    ]

    decoded = deserialize_from_kafka(
        records,
        StructType.fromDDL("event_id BIGINT, event_type STRING, value DOUBLE"),
        key_type="bigint",
    )
    got = {
        (r["key"], r["event_id"], r["event_type"], r["value"])
        for r in decoded.collect()
    }
    want = {
        (r["user_id"], r["event_id"], r["event_type"], r["value"])
        for r in ev.collect()
    }
    assert got == want


def test_kafka_source_fails_with_clear_message_without_connector(spark):
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_source(spark, "broker:9092", "t").writeStream  # noqa: B018
