"""General side-output splitting (Flink split/getSideOutput parity):
the tag slices plus the default output must partition the input
exactly, with first-match-wins routing, in batch and through a
multi-micro-batch stream."""

from __future__ import annotations

from collections import Counter

import pytest

from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.streaming.sideout import (
    DEFAULT_TAG,
    SideOutputRouter,
    run_with_side_outputs,
    split_batch,
)

SF_DIR = "/root/testdata/sf0.001"

def _tags():
    return {
        "big_purchase": (F.col("event_type") == "purchase")
        & (F.col("value") > 200),
        "purchase": F.col("event_type") == "purchase",
        "error": F.col("event_type") == "error",
    }


def test_split_batch_partitions_input(spark):
    ev = table(spark, SF_DIR, "events")
    tags = _tags()
    parts = split_batch(ev, tags)
    n_total = ev.count()
    sizes = {k: v.count() for k, v in parts.items()}
    assert sum(sizes.values()) == n_total
    # first-match-wins: plain 'purchase' excludes the big ones
    big = parts["big_purchase"]
    assert big.filter(F.col("value") <= 200).count() == 0
    assert parts["purchase"].filter(F.col("value") > 200).count() == 0
    assert parts["error"].filter(F.col("event_type") != "error").count() == 0
    # default = everything the tags didn't claim
    assert (
        parts[DEFAULT_TAG]
        .filter(F.col("event_type").isin("purchase", "error"))
        .count()
        == 0
    )


@pytest.fixture(scope="module")
def event_spool(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("sideout_spool")
    ev = table(spark, SF_DIR, "events").orderBy("event_id").toPandas()
    ev["ts"] = ev["ts"].astype("datetime64[us]").astype("int64")
    n_files = 5
    chunk = (len(ev) + n_files - 1) // n_files
    for i in range(n_files):
        ev.iloc[i * chunk : (i + 1) * chunk].to_parquet(
            out / f"part-{i:05d}.parquet", index=False
        )
    return str(out)


def test_streaming_side_outputs_match_batch(spark, event_spool):
    schema = spark.read.parquet(event_spool).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_spool)
    )
    tags = _tags()
    router = run_with_side_outputs(sdf, SideOutputRouter(tags))
    batch = split_batch(spark.read.parquet(event_spool), tags)
    for name in [*tags, DEFAULT_TAG]:
        got = Counter(r.event_id for r in router.rows[name])
        want = Counter(r.event_id for r in batch[name].collect())
        assert got == want, name
    assert sum(len(v) for v in router.rows.values()) == spark.read.parquet(
        event_spool
    ).count()
