"""Cross-micro-batch state: split the event stream into several files
processed one per trigger, so keyed state (funnel), window state, and
the watermark genuinely carry across micro-batches — the execution
shape a production stream actually has."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.streaming_ops import hourly_tumble
from flink_framework_spark.streaming.stateful import funnel_conversions
from flink_framework_spark.streaming.twins import run_to_memory

N_FILES = 5


@pytest.fixture(scope="module")
def spooled_dir(spark, tmp_path_factory):
    """events as N_FILES parquet files in arrival (event_id) order —
    file i holds the i-th contiguous slice of the stream."""
    sf_dir = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("spool")
    ev = table(spark, sf_dir, "events").orderBy("event_id").toPandas()
    # spool ts as epoch-microsecond int64 so the stream can rebuild a
    # true instant (timestamp_micros) independent of session timezone
    ev["ts"] = ev["ts"].astype("datetime64[us]").astype("int64")
    chunk = (len(ev) + N_FILES - 1) // N_FILES
    for i in range(N_FILES):
        part = ev.iloc[i * chunk : (i + 1) * chunk]
        part.to_parquet(out / f"part-{i:05d}.parquet", index=False)
    return str(out), sf_dir


def _stream(spark, directory, sf_dir, watermark=None):
    schema = (
        table(spark, sf_dir, "events")
        .withColumn("ts", F.lit(0).cast("long"))
        .schema
    )
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(directory)
        .withColumn("ts", F.timestamp_micros("ts"))
    )
    if watermark:
        sdf = sdf.withWatermark("ts", watermark)
    return sdf


def test_funnel_state_across_batches(spark, spooled_dir):
    """Per-user pending-view state must survive micro-batch boundaries
    (a view in batch k converting in batch k+1 still counts)."""
    directory, sf_dir = spooled_dir
    from flink_framework_spark.registry import all_queries

    batch_n = all_queries()["q_funnel"].fn(spark, sf_dir).collect()[0]["n_users"]
    out = run_to_memory(
        funnel_conversions(_stream(spark, directory, sf_dir)),
        query_name="t_mb_funnel",
        output_mode="update",
    )
    assert out.select("user_id").distinct().count() == batch_n


def test_windows_merge_across_batches(spark, spooled_dir):
    """Complete-mode window aggregation over 5 triggers equals the
    one-shot batch result (window state accumulates per batch)."""
    directory, sf_dir = spooled_dir
    batch = hourly_tumble(table(spark, sf_dir, "events")).toPandas()
    stream = run_to_memory(
        hourly_tumble(_stream(spark, directory, sf_dir)),
        query_name="t_mb_tumble",
        output_mode="complete",
    ).toPandas()
    cols = sorted(batch.columns)
    assert sorted(map(repr, stream[cols].itertuples(index=False, name=None))) == sorted(
        map(repr, batch[cols].itertuples(index=False, name=None))
    )


def test_watermark_advances_across_batches(spark, spooled_dir):
    """Append mode with 5 triggers: windows finalized by intermediate
    watermarks are emitted as the stream progresses; the final output
    is exactly the batch windows whose end <= final watermark."""
    directory, sf_dir = spooled_dir
    events = table(spark, sf_dir, "events")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - pd.Timedelta(minutes=10)
    batch = hourly_tumble(events).toPandas()
    finalized = batch[
        pd.to_datetime(batch["wstart"]) + pd.Timedelta(hours=1) <= cutoff
    ]
    stream = run_to_memory(
        hourly_tumble(_stream(spark, directory, sf_dir, watermark="10 minutes")),
        query_name="t_mb_wm",
        output_mode="append",
    ).toPandas()
    cols = sorted(batch.columns)
    assert sorted(map(repr, stream[cols].itertuples(index=False, name=None))) == sorted(
        map(repr, finalized[cols].itertuples(index=False, name=None))
    )


def test_changelog_state_across_batches(spark, spooled_dir):
    """Last-writer-wins state must survive micro-batch boundaries: the
    winning version and the version counter accumulate across all
    triggers and equal the batch compaction."""
    directory, sf_dir = spooled_dir
    from flink_framework_spark.functions.helpers import round_duck
    from flink_framework_spark.registry import all_queries
    from flink_framework_spark.streaming.stateful import changelog_materialize

    batch = all_queries()["q_changelog_compact"].fn(spark, sf_dir).toPandas()
    raw = run_to_memory(
        changelog_materialize(_stream(spark, directory, sf_dir)),
        query_name="t_mb_changelog",
        output_mode="update",
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n_versions").desc())
    stream = (
        raw.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("last_op") != "error"))
        .select(
            "user_id",
            F.date_format(
                F.convert_timezone(None, F.lit("UTC"), F.col("last_ts")),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("last_ts"),
            "last_op",
            round_duck(F.col("last_value"), 2).alias("last_value"),
            "n_versions",
        )
        .toPandas()
    )
    cols = sorted(batch.columns)
    a = sorted(map(repr, stream[cols].itertuples(index=False, name=None)))
    b = sorted(map(repr, batch[cols].itertuples(index=False, name=None)))
    assert a == b


def test_broadcast_rules_versioned_across_batches(spark, spooled_dir):
    """Flink broadcast-state pattern: every micro-batch is processed
    under the rules snapshot current AT THAT BATCH; a control update
    landing between batches affects later batches only. Streamed
    output must equal a batch-mode replay that applies each batch's
    recorded rules version to that batch's slice."""
    from flink_framework_spark.streaming.broadcast_state import (
        BroadcastRulesProcessor,
        run_broadcast_rules,
    )

    directory, sf_dir = spooled_dir
    initial = [("purchase", 100.0, "big_purchase"), ("error", 0.0, "err")]

    def control(batch_id, rules):
        if batch_id == 2:  # tighten mid-stream + add a rule
            return [
                ("purchase", 200.0, "big_purchase"),
                ("error", 0.0, "err"),
                ("signup", 0.0, "signup"),
            ]
        return rules

    proc = run_broadcast_rules(
        _stream(spark, directory, sf_dir),
        BroadcastRulesProcessor(spark, initial, control=control),
    )
    assert set(proc.rule_versions) == set(range(N_FILES))
    assert proc.rule_versions[0] == initial
    assert proc.rule_versions[4] == control(2, initial)

    # batch-mode replay: same slices, same per-batch rules
    ev = table(spark, sf_dir, "events").orderBy("event_id").toPandas()
    chunk = (len(ev) + N_FILES - 1) // N_FILES
    expected: list[tuple] = []
    for i in range(N_FILES):
        part = ev.iloc[i * chunk : (i + 1) * chunk]
        sl = spark.createDataFrame(part)
        out = proc.apply_rules(sl, proc.rule_versions[i])
        expected.extend(
            tuple(r) for r in out.select(
                "event_id", "event_type", "tag"
            ).collect()
        )
    got = [(r["event_id"], r["event_type"], r["tag"]) for r in proc.rows]
    assert sorted(got) == sorted(expected)
    assert len(got) > 0


def test_rolling_ingest_incremental_dedup_invariant(spark, sf_dir):
    """The rolling-crawl story end to end: documents arrive in 4
    batches, each deduped against the ACCUMULATED surviving corpus
    with incremental_dedup_ngram before joining it. Invariants on the
    final corpus: (a) no surviving cross-batch near-dup pair remains
    (exact Jaccard verify over blocked candidates), (b) the first
    batch survives untouched, (c) every drop has an earlier-batch
    witness — the keep-earliest semantics a production ingest needs
    to be append-stable."""
    from flink_framework_spark.io import table
    from flink_framework_spark.operators.dedup import (
        incremental_dedup_ngram,
        ngram_near_dup_pairs,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    cuts = [0, n // 4, n // 2, 3 * n // 4, n]
    batches = [
        docs.filter(
            (F.col("doc_id") >= cuts[i]) & (F.col("doc_id") < cuts[i + 1])
        )
        for i in range(4)
    ]
    corpus = batches[0]
    first_n = corpus.count()
    for b in batches[1:]:
        survivors = incremental_dedup_ngram(b, corpus, threshold=0.5)
        corpus = corpus.unionByName(survivors).localCheckpoint()
    # (b) batch 0 passes through whole
    assert corpus.filter(F.col("doc_id") < cuts[1]).count() == first_n
    # (a) no cross-batch near-dup pair survives: all remaining >=0.5
    # pairs must be INTRA-batch (incremental never dedups within a
    # batch — that is the self-join operator's contract)
    def batch_of(col):
        expr = F.lit(3)
        for i in (2, 1, 0):
            expr = F.when(col < cuts[i + 1], F.lit(i)).otherwise(expr)
        return expr

    left_pairs = ngram_near_dup_pairs(corpus, threshold=0.5)
    cross = left_pairs.filter(
        batch_of(F.col("doc_a")) != batch_of(F.col("doc_b"))
    )
    assert cross.count() == 0
    # (c) every dropped doc near-duplicates something that survived
    # from an EARLIER batch
    dropped = docs.join(corpus, "doc_id", "left_anti")
    n_dropped = dropped.count()
    assert n_dropped == n - corpus.count()
    assert n_dropped > 0  # the fixture's planted dups straddle batches
    redetect = incremental_dedup_ngram(dropped, corpus, threshold=0.5)
    assert redetect.count() == 0  # every drop still matches the corpus
