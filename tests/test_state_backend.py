"""RocksDB state store (the Flink RocksDB-state-backend analogue,
SURVEY.md §4.1): the same streaming aggregation runs with the RocksDB
provider and produces identical results — the backend that bounds
executor memory when keyed state outgrows the heap at 100 TB."""

from __future__ import annotations

from flink_framework_spark.io import table
from flink_framework_spark.operators.streaming_ops import hourly_tumble
from flink_framework_spark.streaming.twins import read_events_stream, run_to_memory

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def test_rocksdb_state_store_matches_batch(spark, sf_dir):
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB)
    try:
        stream = run_to_memory(
            hourly_tumble(read_events_stream(spark, sf_dir)),
            query_name="t_rocksdb",
            output_mode="complete",
        )
        batch = hourly_tumble(table(spark, sf_dir, "events"))
        cols = sorted(batch.columns)
        a = sorted(map(repr, stream.toPandas()[cols].itertuples(index=False, name=None)))
        b = sorted(map(repr, batch.toPandas()[cols].itertuples(index=False, name=None)))
        assert a == b
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
