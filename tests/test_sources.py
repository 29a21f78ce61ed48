"""Sources/sinks/catalog: partition pruning on the lake layout, csv
and json round-trips, subject registry contract, rate source."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.streaming.drain import await_drain
from flink_framework_spark.plans.inspect import formatted_plan
from flink_framework_spark.sources.batch import (
    read_csv,
    read_json,
    read_parquet,
    write_partitioned_lake,
)
from flink_framework_spark.sources.catalog import SubjectRegistry
from flink_framework_spark.sources.streaming import rate_source


def test_partitioned_lake_prunes(spark, sf_dir, tmp_path):
    """Writing partitioned by a coarse key and filtering on it must
    produce a scan with PartitionFilters — IO eliminated pre-read,
    the property that makes a 100 TB lake usable."""
    lake = str(tmp_path / "orders_lake")
    od = table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    write_partitioned_lake(od, lake, partition_by=["order_year"])
    pruned = read_parquet(spark, lake).filter(F.col("order_year") == 1997)
    plan = formatted_plan(pruned)
    assert "PartitionFilters: [" in plan
    assert "order_year" in plan.split("PartitionFilters:")[1].split("]")[0]
    # correctness of the pruned read
    expected = od.filter(F.col("order_year") == 1997).count()
    assert pruned.count() == expected > 0


def test_csv_json_round_trip(spark, sf_dir, tmp_path):
    re_df = table(spark, sf_dir, "region")
    csv_path = str(tmp_path / "region_csv")
    json_path = str(tmp_path / "region_json")
    re_df.write.option("header", "true").csv(csv_path)
    re_df.write.json(json_path)
    back_csv = read_csv(spark, csv_path, schema=re_df.schema)
    back_json = read_json(spark, json_path, schema=re_df.schema)
    assert sorted(map(tuple, back_csv.collect())) == sorted(
        map(tuple, re_df.collect())
    )
    assert sorted(map(tuple, back_json.collect())) == sorted(
        map(tuple, re_df.collect())
    )


def test_subject_registry_contract(spark, sf_dir):
    reg = SubjectRegistry(spark)
    ev = table(spark, sf_dir, "events")
    reg.register("subject_events", ev, "event stream")
    assert reg.get("subject_events").count() == ev.count()
    assert reg.schema("subject_events") == ev.schema
    assert [s.name for s in reg.list()] == ["subject_events"]
    # same name + same schema: fine (idempotent)
    reg.register("subject_events", ev)
    # different schema: refused
    with pytest.raises(ValueError):
        reg.register("subject_events", ev.select("user_id"))
    reg.unregister("subject_events")
    with pytest.raises(KeyError):
        reg.get("subject_events")


def test_rate_source_streams(spark):
    src = rate_source(spark, rows_per_second=500)
    assert src.isStreaming
    assert src.columns == ["timestamp", "value"]
    q = src.writeStream.format("memory").queryName("t_rate").start()
    try:
        q.awaitTermination(3)  # rate source never drains; sample then stop
    finally:
        q.stop()
    # query started and produced the expected schema
    assert spark.table("t_rate").columns == ["timestamp", "value"]


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    """Bucketed tables on the join key: the join plans with NO shuffle
    exchange on either side (co-located join) — the layout that
    removes the dominant cost of fact-fact joins at 100 TB."""
    from flink_framework_spark.plans.inspect import count_exchanges
    from flink_framework_spark.sources.batch import write_bucketed_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    try:
        od = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        write_bucketed_table(od, "b_orders", ["o_orderkey"], 8)
        write_bucketed_table(li, "b_lineitem", ["l_orderkey"], 8)
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        assert count_exchanges(joined) == 0
        assert joined.count() == li.join(od, li.l_orderkey == od.o_orderkey).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_subject_hub_job_composition(spark, sf_dir, tmp_path):
    """The reference's core pattern end-to-end: job A publishes a
    derived subject; job B — knowing only the subject NAME — discovers
    its schema from the hub and consumes it as a stream. Re-publishing
    is exactly-once (checkpointed); schema drift is refused."""
    from flink_framework_spark.sources.subjects import StreamingSubjectHub
    from flink_framework_spark.streaming.twins import read_events_stream, run_to_memory

    hub = StreamingSubjectHub(spark, str(tmp_path / "subjects"))

    # job A: enrich the raw event stream, publish as a subject
    raw = read_events_stream(spark, sf_dir)
    enriched = raw.select(
        "event_id", "user_id", "event_type",
        (F.col("value") * 100).alias("value_cents"),
    )
    q = hub.publish("enriched_events", enriched)
    await_drain(q, "t_src", timeout_sec=120)

    assert hub.list_subjects() == ["enriched_events"]
    assert "value_cents" in [f.name for f in hub.schema("enriched_events").fields]

    # job B: independent consumer, schema via the hub only
    consumed = run_to_memory(
        hub.subscribe("enriched_events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n")),
        query_name="t_subject_consumer",
        output_mode="complete",
    )
    batch = table(spark, sf_dir, "events").groupBy("event_type").count()
    got = {(r["event_type"], r["n"]) for r in consumed.collect()}
    want = {(r["event_type"], r["count"]) for r in batch.collect()}
    assert got == want

    # replay of job A: checkpoint makes it a no-op (no duplicates)
    q2 = hub.publish("enriched_events", enriched)
    await_drain(q2, "t_src2", timeout_sec=120)
    assert hub.read("enriched_events").count() == sum(n for _, n in want)

    # schema drift refused
    with pytest.raises(ValueError):
        hub.publish("enriched_events", raw.select("event_id"))


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """A lake partition written before a column existed must read
    back unified under mergeSchema, nulls filling the gap — the
    append-only schema-evolution contract an ingest pipeline needs."""
    old = spark.createDataFrame([(1, "a")], ["id", "txt"])
    new = spark.createDataFrame([(2, "b", 0.5)], ["id", "txt", "score"])
    old.write.parquet(f"{tmp_path}/batch=0")
    new.write.parquet(f"{tmp_path}/batch=1")
    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path))
    assert set(merged.columns) == {"id", "txt", "score", "batch"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 0.5
