"""Late-data side output (I4 Flink parity): the foreachBatch split
must reproduce q_stream_late's batch emulation exactly, across
arbitrary micro-batch chunking, and the on-time slice must equal the
complement."""

from __future__ import annotations

from collections import Counter

import pytest

from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.registry import all_queries
from flink_framework_spark.streaming.late import (
    LateSideOutputProcessor,
    run_with_late_side_output,
)

SF_DIR = "/root/testdata/sf0.001"
N_FILES = 7  # deliberately != the 5 used elsewhere: chunking must not matter


@pytest.fixture(scope="module")
def arrival_spool(spark, tmp_path_factory):
    """events spooled in ARRIVAL order (the jittered order q_stream_late
    declares) as N_FILES contiguous slices."""
    out = tmp_path_factory.mktemp("late_spool")
    ev = (
        table(spark, SF_DIR, "events")
        .withColumn(
            "arrival",
            F.col("ts")
            + F.expr("make_dt_interval(0, 0, CAST(3*(event_id % 10) AS INT), 0)"),
        )
        .orderBy("arrival", "event_id")
        .toPandas()
    )
    for c in ("ts", "arrival"):
        ev[c] = ev[c].astype("datetime64[us]").astype("int64")
    chunk = (len(ev) + N_FILES - 1) // N_FILES
    for i in range(N_FILES):
        ev.iloc[i * chunk : (i + 1) * chunk].to_parquet(
            out / f"part-{i:05d}.parquet", index=False
        )
    return str(out)


def _stream(spark, directory, max_files_per_trigger=1):
    schema = (
        table(spark, SF_DIR, "events")
        .withColumn("ts", F.lit(0).cast("long"))
        .withColumn("arrival", F.lit(0).cast("long"))
        .schema
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.parquet(directory)
        .withColumn("ts", F.timestamp_micros("ts"))
        .withColumn("arrival", F.timestamp_micros("arrival"))
    )


def test_late_side_output_equals_batch_emulation(spark, arrival_spool):
    proc = run_with_late_side_output(
        _stream(spark, arrival_spool),
        LateSideOutputProcessor(
            event_time_col="ts",
            order_cols=("arrival", "event_id"),
            delay="10 minutes",
        ),
        query_name="t_late_side",
    )
    stream_late = Counter(r["event_type"] for r in proc.late_rows)
    batch = {
        r["event_type"]: r["n_late"]
        for r in all_queries()["q_stream_late"].fn(spark, SF_DIR).collect()
    }
    assert stream_late == Counter(batch)

    # complement check: on-time + late partitions the stream, and the
    # main aggregate over the on-time slice equals batch-minus-late
    total = table(spark, SF_DIR, "events").count()
    assert len(proc.on_time_rows) + len(proc.late_rows) == total
    on_time_by_type = Counter(r["event_type"] for r in proc.on_time_rows)
    all_by_type = {
        r["event_type"]: r["n"]
        for r in table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for etype, n in all_by_type.items():
        assert on_time_by_type[etype] + stream_late.get(etype, 0) == n


def test_late_side_output_chunking_invariance(spark, arrival_spool):
    """One big batch (all files in a single trigger) produces the same
    late set as 7 single-file triggers — the carried watermark is
    exactly the associative running max."""
    proc = run_with_late_side_output(
        _stream(spark, arrival_spool, max_files_per_trigger=None),
        LateSideOutputProcessor(order_cols=("arrival", "event_id")),
        query_name="t_late_oneshot",
    )
    stream_late = Counter(r["event_type"] for r in proc.late_rows)
    batch = {
        r["event_type"]: r["n_late"]
        for r in all_queries()["q_stream_late"].fn(spark, SF_DIR).collect()
    }
    assert stream_late == Counter(batch)
