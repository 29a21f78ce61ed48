"""True streaming joins (SURVEY.md §2 I6/I7) + processing-time windows
(I11) + salted-join equivalence (K6)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.skew import salted_join
from flink_framework_spark.registry import all_queries
from flink_framework_spark.streaming.twins import read_events_stream, run_to_memory


def test_stream_stream_interval_join(spark, sf_dir):
    """Watermarked stream-stream interval join == the oracle-checked
    batch interval join (in-order arrival => nothing dropped)."""
    batch = (
        all_queries()["q_join_interval"].fn(spark, sf_dir).toPandas()
    )
    views = read_events_stream(spark, sf_dir, with_watermark="30 minutes")
    buys = read_events_stream(spark, sf_dir, with_watermark="30 minutes")
    v = views.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    p = buys.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 10 MINUTES")),
    ).select("view_id", "purchase_id")
    stream = run_to_memory(
        joined, query_name="t_ssjoin", output_mode="append"
    ).toPandas()
    a = sorted(map(tuple, stream[["view_id", "purchase_id"]].itertuples(index=False)))
    b = sorted(map(tuple, batch[["view_id", "purchase_id"]].itertuples(index=False)))
    assert a == b and len(a) > 0


def _outer_join_frames(src_builder, how):
    """view-side x purchase-side interval join, parameterized over the
    source builder so batch and stream share the identical expression
    tree (the twin discipline)."""
    v = src_builder().filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    p = src_builder().filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 10 MINUTES")),
        how,
    ).select("view_id", "purchase_id")


@pytest.mark.parametrize("how", ["leftOuter", "fullOuter"])
def test_stream_stream_outer_interval_join(spark, sf_dir, tmp_path, how):
    """Watermarked stream-stream OUTER interval joins (the Flink
    IntervalJoin emits unmatched rows when the watermark passes the
    interval's end; Spark evicts join state the same way) == the batch
    outer join. Outer results only flush once the watermark moves PAST
    the last real event, so the stream directory carries far-future
    sentinel rows in a second file (maxFilesPerTrigger=1 => they
    arrive in a later micro-batch, advancing the watermark over all
    real state before availableNow's final no-data batch flushes it).
    The sentinel file needs BOTH event types: Catalyst pushes the
    event-type filter below each side's watermark node into its scan,
    so each side's watermark advances only on its own type — a
    view-only sentinel leaves the purchase watermark pinned at the
    last real purchase, which then never evicts as unmatched
    (observed: exactly the max-ts purchase missing)."""
    import datetime
    import glob
    import shutil

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    shutil.copy(f"{sf_dir}/events.parquet", f"{lake}/00_events.parquet")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    mx = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .agg(F.max("ts"))
        .collect()[0][0]
    )
    sentinel_id = 10**9
    far = mx + datetime.timedelta(hours=2)
    spark.createDataFrame(
        [
            (sentinel_id, far, -1, "view", 0.0, "{}"),
            (sentinel_id + 1, far, -1, "purchase", 0.0, "{}"),
        ],
        raw_schema,
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "sent"))
    shutil.copy(
        glob.glob(str(tmp_path / "sent" / "part-*.parquet"))[0],
        f"{lake}/99_sentinel.parquet",
    )

    def stream_src():
        r = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", "1")
        )
        from flink_framework_spark.io import _normalize_events_ts

        return _normalize_events_ts(r.parquet(lake), as_instant=True).withWatermark(
            "ts", "30 minutes"
        )

    got = run_to_memory(
        _outer_join_frames(stream_src, how),
        query_name=f"t_ssouter_{how}",
        output_mode="append",
    ).toPandas()
    got = got[
        ~(
            got.view_id.isin([sentinel_id])
            | got.purchase_id.isin([sentinel_id + 1])
        )
    ]

    want = _outer_join_frames(
        lambda: table(spark, sf_dir, "events"),
        {"leftOuter": "left_outer", "fullOuter": "full_outer"}[how],
    ).toPandas()

    a = sorted(map(tuple, got.fillna(-7).itertuples(index=False)))
    b = sorted(map(tuple, want.fillna(-7).itertuples(index=False)))
    assert a == b and len(a) > 0
    # the outer side actually fired (unmatched rows present)
    assert got.purchase_id.isna().sum() > 0


def test_stream_static_enrichment_join(spark, sf_dir):
    """Streaming events joined to a static per-user dimension (I7 —
    Flink's broadcast-state enrichment pattern; stateless in Spark)."""
    events = table(spark, sf_dir, "events")
    dim = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_events"))
    sdf = read_events_stream(spark, sf_dir)
    enriched = sdf.join(F.broadcast(dim), "user_id").select(
        "event_id", "user_id", "user_events"
    )
    out = run_to_memory(enriched, query_name="t_enrich", output_mode="append")
    assert out.count() == events.count()
    # every event carries its user's total
    chk = (
        out.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("user_events").alias("m"))
        .filter(F.col("n") != F.col("m"))
    )
    assert chk.count() == 0


def test_processing_time_window(spark):
    """I11: windows over arrival (processing) time via the rate
    source's timestamp — inherently non-deterministic content, so the
    check is structural (rows-only)."""
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "200").load()
    )
    agg = src.groupBy(F.window("timestamp", "1 second").alias("w")).agg(
        F.count(F.lit(1)).alias("n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_proctime")
        .outputMode("complete")
        .start()
    )
    try:
        import time

        time.sleep(3)
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table("t_proctime")
    assert out.columns == ["w", "n"]
    assert out.agg(F.sum("n")).collect()[0][0] >= 0


def test_salted_join_equivalence(spark, sf_dir):
    """salted_join == plain join on a skewed key distribution."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # skew it: fold most keys onto one hot key
    skewed = li.withColumn(
        "k", F.when(F.col("l_partkey") % 4 == 0, 0).otherwise(F.col("l_partkey"))
    )
    dim = (
        table(spark, sf_dir, "part")
        .select(F.col("p_partkey").alias("k"), "p_brand")
        .union(spark.createDataFrame([(0, "HOT")], "k long, p_brand string"))
    )
    plain = skewed.join(dim, "k").groupBy("p_brand").count()
    salted = salted_join(skewed, dim, ["k"], salt=8).groupBy("p_brand").count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_stream_static_temporal_table_join(spark, sf_dir):
    """Flink's event-time temporal TABLE join on a stream: the fact
    stream enriched with the SCD2 version valid at each fact's event
    time (streaming.temporal.temporal_join_stream, containment form)
    must equal the batch as-of form (operators.scd.temporal_join) —
    the half-open-tiling equivalence, exercised through the streaming
    engine's micro-batches."""
    from flink_framework_spark.io import _normalize_events_ts
    from flink_framework_spark.operators.scd import scd2_build, temporal_join
    from flink_framework_spark.streaming.temporal import temporal_join_stream

    ev = _normalize_events_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet"), as_instant=True
    )
    # dim changelog: each user's purchases open a new "tier" version
    chg = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.round(F.col("value"), 0).alias("tier")
    )
    dim = scd2_build(chg, key_cols=["user_id"], ts_col="ts",
                     attr_cols=["tier"], seq_col=None)

    want = (
        temporal_join(
            ev.select("user_id", "event_id", "ts"), dim,
            on=["user_id"], fact_ts="ts",
        )
        .select("event_id", "tier", "version")
        .toPandas()
    )
    facts = read_events_stream(spark, sf_dir).select(
        "user_id", "event_id", "ts"
    )
    got = run_to_memory(
        temporal_join_stream(facts, dim, on=["user_id"], fact_ts="ts")
        .select("event_id", "tier", "version"),
        query_name="t_temporal_tbl",
        output_mode="append",
    ).toPandas()
    a = sorted(map(tuple, got.itertuples(index=False)))
    b = sorted(map(tuple, want.itertuples(index=False)))
    assert a == b and len(a) > 0


def test_stream_static_temporal_table_join_left(spark, sf_dir):
    """LEFT variant: facts before a key's first version (or for keys
    with no versions) survive with null attributes — count must equal
    the full fact stream."""
    from flink_framework_spark.io import _normalize_events_ts
    from flink_framework_spark.operators.scd import scd2_build
    from flink_framework_spark.streaming.temporal import temporal_join_stream

    ev = _normalize_events_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet"), as_instant=True
    )
    chg = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.round(F.col("value"), 0).alias("tier")
    )
    dim = scd2_build(chg, key_cols=["user_id"], ts_col="ts",
                     attr_cols=["tier"], seq_col=None)
    facts = read_events_stream(spark, sf_dir).select(
        "user_id", "event_id", "ts"
    )
    got = run_to_memory(
        temporal_join_stream(facts, dim, on=["user_id"], fact_ts="ts",
                             how="left")
        .select("event_id", "tier"),
        query_name="t_temporal_left",
        output_mode="append",
    ).toPandas()
    n_ev = ev.count()
    assert len(got) == n_ev
    assert got.tier.isna().sum() > 0  # pre-first-version facts present


def test_sequence_join_chain_equals_batch_and_state_machine(spark, sf_dir):
    """The cascaded stream-stream join chain (sequence_matches_join)
    drains to EXACTLY the batch match_sequence match set — and
    therefore to the Arrow sequence_matches state machine, which is
    already pinned equal to the batch operator. Fixed chains run on
    the JVM join machine; the decision rule lives on the operator."""
    from flink_framework_spark.operators.cep import match_sequence
    from flink_framework_spark.operators.streaming_ops import (
        _fmt_event_time,
    )
    from flink_framework_spark.streaming.stateful import (
        sequence_matches_join,
    )
    from flink_framework_spark.streaming.twins import (
        read_events_stream,
        run_to_memory,
    )

    steps = ["view", "click", "purchase"]

    def fmt(df, src_events):
        # render every boundary Spark-side in UTC so instants (stream)
        # and NTZ (batch) compare identically under any session tz
        cols = [F.col("user_id")]
        for i in range(len(steps)):
            cols.append(
                _fmt_event_time(src_events, F.col(f"ts_{i}")).alias(
                    f"ts_{i}"
                )
            )
            cols.append(F.col(f"id_{i}"))
        return df.select(*cols)

    sdf = read_events_stream(spark, sf_dir)
    got = run_to_memory(
        fmt(sequence_matches_join(sdf, steps, "12 HOURS"), sdf),
        query_name="t_seq_join_chain",
        output_mode="append",
    ).toPandas()
    bat = table(spark, sf_dir, "events")
    exp = fmt(match_sequence(bat, steps, "12 HOURS"), bat).toPandas()

    def key(df):
        return sorted(
            map(repr, df[sorted(df.columns)].itertuples(index=False,
                                                        name=None))
        )

    assert len(got) == len(exp) > 0
    assert key(got) == key(exp)


def test_changelog_temporal_join_equals_batch(spark, sf_dir, tmp_path):
    """Stream-stream temporal join with a CHANGELOG build side
    (streaming.temporal.temporal_join_changelog_stream): dim updates
    and facts interleave across micro-batches, and the drained result
    must equal the batch pipeline — scd2_build over the FINAL
    changelog, then the as-of temporal_join. This is Flink's temporal
    table-FUNCTION join (versioned keyed state, probe gated on the
    global watermark), not the stream-static re-read."""
    from flink_framework_spark.io import _normalize_events_ts
    from flink_framework_spark.operators.scd import scd2_build, temporal_join
    from flink_framework_spark.streaming.temporal import (
        temporal_join_changelog_stream,
    )

    ev = _normalize_events_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet"), as_instant=True
    )
    # dim changelog: each purchase opens a new "tier" version; dedupe
    # exact (user_id, ts) so version identity is arrival-order-free
    chg = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max(F.round(F.col("value"), 0)).alias("tier"))
    )
    facts = ev.select("user_id", F.col("ts"), "event_id")

    dim = scd2_build(chg, key_cols=["user_id"], ts_col="ts",
                     attr_cols=["tier"], seq_col=None)
    want = (
        temporal_join(facts, dim, on=["user_id"], fact_ts="ts")
        .select("event_id", "tier")
        .toPandas()
    )

    # two file lakes, each side split into ts-ordered chunks so the
    # union's micro-batches interleave dim updates and facts
    import datetime

    d_lake, f_lake = tmp_path / "dim", tmp_path / "facts"
    n_chunks = 4
    chg_p = chg.orderBy("ts", "user_id").toPandas()
    f_p = facts.orderBy("ts", "event_id").toPandas()
    for i in range(n_chunks):
        spark.createDataFrame(
            chg_p.iloc[
                i * len(chg_p) // n_chunks:(i + 1) * len(chg_p) // n_chunks
            ],
            schema=chg.schema,
        ).coalesce(1).write.mode("append").parquet(str(d_lake))
        spark.createDataFrame(
            f_p.iloc[
                i * len(f_p) // n_chunks:(i + 1) * len(f_p) // n_chunks
            ],
            schema=facts.schema,
        ).coalesce(1).write.mode("append").parquet(str(f_lake))
    mx = ev.agg(F.max("ts")).collect()[0][0]
    far = mx + datetime.timedelta(hours=2)
    for k in (1, 2):  # wm-advancing batch + timer-evaluation batch
        spark.createDataFrame(
            [(-1, far + datetime.timedelta(minutes=k), float(k))],
            schema=chg.schema,
        ).coalesce(1).write.mode("append").parquet(str(d_lake))
        spark.createDataFrame(
            [(-1, far + datetime.timedelta(minutes=k), -10**9 - k)],
            schema=facts.schema,
        ).coalesce(1).write.mode("append").parquet(str(f_lake))

    d_stream = (
        spark.readStream.schema(chg.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d_lake))
        .withColumnRenamed("ts", "dim_ts")
        .withWatermark("dim_ts", "30 minutes")
    )
    f_stream = (
        spark.readStream.schema(facts.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(f_lake))
        .withWatermark("ts", "30 minutes")
    )
    got = run_to_memory(
        temporal_join_changelog_stream(
            f_stream, d_stream, on="user_id", fact_ts="ts",
            dim_ts="dim_ts",
        ),
        query_name="t_cl_temporal",
        output_mode="update",
    ).toPandas()
    got = got[got.user_id >= 0][["event_id", "tier"]]
    a = sorted(map(tuple, got.itertuples(index=False)))
    b = sorted(map(tuple, want.itertuples(index=False)))
    assert a == b and len(a) > 0


def test_changelog_temporal_join_late_dim_corrects(spark, tmp_path):
    """A dim update that ARRIVES after a pending fact (but is still
    above the watermark) must correct the enrichment before the fact
    is emitted — the property the stream-static form cannot give.
    Also pins LEFT semantics: a fact before its key's first version
    survives with a null attribute, and inner drops it."""
    from flink_framework_spark.streaming.temporal import (
        temporal_join_changelog_stream,
    )

    def dimf(rows):
        return spark.createDataFrame(
            [(u, f"2024-01-01 {h:02d}:{m:02d}:00", t) for u, h, m, t in rows],
            "user_id long, dim_ts string, tier long",
        ).selectExpr(
            "user_id", "CAST(dim_ts AS timestamp) AS dim_ts", "tier"
        )

    def factf(rows):
        return spark.createDataFrame(
            [(u, f"2024-01-01 {h:02d}:{m:02d}:00", e) for u, h, m, e in rows],
            "user_id long, ts string, event_id long",
        ).selectExpr(
            "user_id", "CAST(ts AS timestamp) AS ts", "event_id"
        )

    d_lake, f_lake = tmp_path / "dim", tmp_path / "facts"
    # batch 1: key 1's fact at 10:05 + early version 9:00/tier 1; key
    # 2's fact at 09:30 with NO version ever (left-vs-inner probe)
    dimf([(1, 9, 0, 1)]).coalesce(1).write.mode("append").parquet(str(d_lake))
    factf([(1, 10, 5, 100), (2, 9, 30, 200)]).coalesce(1).write.mode(
        "append"
    ).parquet(str(f_lake))
    # batch 2: the LATE dim update at 10:00/tier 2 — arrives after the
    # fact, still above the watermark; it must win the as-of pick
    dimf([(1, 10, 0, 2)]).coalesce(1).write.mode("append").parquet(str(d_lake))
    factf([(1, 10, 6, 300)]).coalesce(1).write.mode("append").parquet(
        str(f_lake)
    )
    # batch 3: push the watermark past every pending fact; batch 4
    # evaluates the timers against it
    for k in (3, 4):
        dimf([(9, 11, 30 + k, 9)]).coalesce(1).write.mode("append").parquet(
            str(d_lake)
        )
        factf([(9, 11, 30 + k, 900 + k)]).coalesce(1).write.mode(
            "append"
        ).parquet(str(f_lake))

    def src():
        d = (
            spark.readStream.schema(dimf([]).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d_lake))
            .withWatermark("dim_ts", "10 minutes")
        )
        f = (
            spark.readStream.schema(factf([]).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(f_lake))
            .withWatermark("ts", "10 minutes")
        )
        return f, d

    f, d = src()
    inner = run_to_memory(
        temporal_join_changelog_stream(
            f, d, on="user_id", fact_ts="ts", dim_ts="dim_ts"
        ),
        query_name="t_cl_late_inner",
        output_mode="update",
    ).toPandas()
    by_eid = {int(r.event_id): r for r in inner.itertuples(index=False)}
    assert by_eid[100].tier == 2  # late 10:00 update corrected the pick
    assert 200 not in by_eid  # inner drops the version-less fact
    assert by_eid[300].tier == 2

    f, d = src()
    left = run_to_memory(
        temporal_join_changelog_stream(
            f, d, on="user_id", fact_ts="ts", dim_ts="dim_ts", how="left"
        ),
        query_name="t_cl_late_left",
        output_mode="update",
    ).toPandas()
    lby = {int(r.event_id): r for r in left.itertuples(index=False)}
    assert lby[100].tier == 2
    assert 200 in lby and pd.isna(lby[200].tier)


def test_changelog_temporal_join_interval_fast_path(
    spark, sf_dir, tmp_path
):
    """The JVM fast path (interval join + max_by aggregation, zero
    Python) under a declared version-spacing bound: with
    version_interval spanning the corpus the bound holds for every
    key, so the drained append stream must equal the batch as-of
    pipeline — the same oracle the keyed-state general form is pinned
    to. Routed through the general entry point's version_interval
    parameter."""
    import datetime

    from flink_framework_spark.io import _normalize_events_ts
    from flink_framework_spark.operators.scd import (
        scd2_build,
        temporal_join,
    )
    from flink_framework_spark.streaming.temporal import (
        temporal_join_changelog_stream,
    )

    ev = _normalize_events_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet"), as_instant=True
    )
    chg = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max(F.round(F.col("value"), 0)).alias("tier"))
    )
    facts = ev.select("user_id", F.col("ts"), "event_id")
    dim = scd2_build(chg, key_cols=["user_id"], ts_col="ts",
                     attr_cols=["tier"], seq_col=None)
    want = (
        temporal_join(facts, dim, on=["user_id"], fact_ts="ts")
        .select("event_id", "tier")
        .toPandas()
    )

    d_lake, f_lake = tmp_path / "dim", tmp_path / "facts"
    n_chunks = 3
    chg_p = chg.orderBy("ts", "user_id").toPandas()
    f_p = facts.orderBy("ts", "event_id").toPandas()
    for i in range(n_chunks):
        spark.createDataFrame(
            chg_p.iloc[
                i * len(chg_p) // n_chunks:(i + 1) * len(chg_p) // n_chunks
            ],
            schema=chg.schema,
        ).coalesce(1).write.mode("append").parquet(str(d_lake))
        spark.createDataFrame(
            f_p.iloc[
                i * len(f_p) // n_chunks:(i + 1) * len(f_p) // n_chunks
            ],
            schema=facts.schema,
        ).coalesce(1).write.mode("append").parquet(str(f_lake))
    mx = ev.agg(F.max("ts")).collect()[0][0]
    # the fast path finalizes a fact only when the watermark passes
    # fact_ts + version_interval (the join must prove no in-bound dim
    # update can still arrive) — the declared bound IS the emission
    # latency, so the closing sentinels sit past it
    far = mx + datetime.timedelta(days=61)
    for k in (1, 2):
        spark.createDataFrame(
            [(-1, far + datetime.timedelta(minutes=k), float(k))],
            schema=chg.schema,
        ).coalesce(1).write.mode("append").parquet(str(d_lake))
        spark.createDataFrame(
            [(-1, far + datetime.timedelta(minutes=k), -10**9 - k)],
            schema=facts.schema,
        ).coalesce(1).write.mode("append").parquet(str(f_lake))

    d_stream = (
        spark.readStream.schema(chg.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d_lake))
        .withColumnRenamed("ts", "dim_ts")
        .withWatermark("dim_ts", "30 minutes")
    )
    f_stream = (
        spark.readStream.schema(facts.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(f_lake))
        .withWatermark("ts", "30 minutes")
    )
    out = temporal_join_changelog_stream(
        f_stream, d_stream, on="user_id", fact_ts="ts",
        dim_ts="dim_ts", version_interval="60 DAYS",
    )
    assert "FlatMapGroupsInPandasWithState" not in (
        out._jdf.queryExecution().analyzed().toString()
    )  # the fast path is all JVM
    got = run_to_memory(
        out, query_name="t_cl_temporal_fast", output_mode="append"
    ).toPandas()
    got = got[got.user_id >= 0][["event_id", "tier"]]
    a = sorted(map(tuple, got.itertuples(index=False)))
    b = sorted(map(tuple, want.itertuples(index=False)))
    assert a == b and len(a) > 0


def test_changelog_interval_fast_path_contract_violation(
    spark, tmp_path
):
    """A dim gap WIDER than the declared version_interval makes a
    fact miss its version — dropped under inner, null under left
    (the declared-contract violation surfaced, not silent wrongness
    with stale attributes)."""
    import pandas as pd

    from flink_framework_spark.streaming.temporal import (
        temporal_join_changelog_stream,
    )

    def lake(rows, schema, path):
        for r in rows:
            spark.createDataFrame([r], schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(path))

    d_lake, f_lake = tmp_path / "d", tmp_path / "f"
    dsch = "user_id long, dim_ts timestamp, tier double"
    fsch = "user_id long, ts timestamp, event_id long"
    t0 = pd.Timestamp("2024-01-01 10:00:00")

    def T(mins):
        return (t0 + pd.Timedelta(minutes=mins)).to_pydatetime()

    # version at t0; facts at +5 (inside the 10-minute bound) and
    # +30 (outside it — the contract violation)
    lake([(1, T(0), 1.0)], dsch, d_lake)
    lake(
        [(1, T(5), 100), (1, T(30), 101),
         (-1, T(600), -1), (-1, T(601), -2)],
        fsch, f_lake,
    )
    lake([(-1, T(600), 0.0), (-1, T(601), 0.0)], dsch, d_lake)

    def drain(how):
        d = (spark.readStream.schema(dsch).option("maxFilesPerTrigger", 1)
             .parquet(str(d_lake)).withWatermark("dim_ts", "1 minute"))
        f = (spark.readStream.schema(fsch).option("maxFilesPerTrigger", 1)
             .parquet(str(f_lake)).withWatermark("ts", "1 minute"))
        out = run_to_memory(
            temporal_join_changelog_stream(
                f, d, on="user_id", fact_ts="ts", dim_ts="dim_ts",
                how=how, version_interval="10 minutes",
            ),
            query_name=f"t_cl_viol_{how}",
            output_mode="append",
        ).toPandas()
        return {
            (r.event_id, None if pd.isna(r.tier) else r.tier)
            for r in out[out.user_id >= 0].itertuples()
        }

    assert drain("inner") == {(100, 1.0)}
    assert drain("left") == {(100, 1.0), (101, None)}


def test_changelog_interval_unique_versions_single_join(
    spark, tmp_path
):
    """unique_versions: a fixed-cadence dim (exactly one update per
    key per V) makes the interval join itself the as-of pick — no
    aggregation stage in the plan — and the drained stream equals the
    as-of recompute; 'left' keeps version-less facts with null
    attributes."""
    import pandas as pd

    from flink_framework_spark.streaming.temporal import (
        temporal_join_changelog_stream,
    )

    dsch = "user_id long, dim_ts timestamp, tier double"
    fsch = "user_id long, ts timestamp, event_id long"
    t0 = pd.Timestamp("2024-01-01 10:00:00")

    def T(mins):
        return (t0 + pd.Timedelta(minutes=mins)).to_pydatetime()

    d_lake, f_lake = tmp_path / "d", tmp_path / "f"
    # key 1 updates at exactly 10-minute cadence; facts land between
    dim_rows = [[(1, T(10 * i), float(i))] for i in range(4)]
    fact_rows = [
        [(1, T(3), 100)], [(1, T(14), 101)],
        [(1, T(27), 102)], [(2, T(15), 200)],  # key 2: no version
    ]
    for ch in dim_rows + [[(-1, T(600), 0.0)], [(-1, T(601), 0.0)]]:
        spark.createDataFrame(ch, dsch).coalesce(1).write.mode(
            "append"
        ).parquet(str(d_lake))
    for ch in fact_rows + [[(-1, T(600), -1)], [(-1, T(601), -2)]]:
        spark.createDataFrame(ch, fsch).coalesce(1).write.mode(
            "append"
        ).parquet(str(f_lake))

    def drain(how):
        d = (spark.readStream.schema(dsch)
             .option("maxFilesPerTrigger", 1)
             .parquet(str(d_lake)).withWatermark("dim_ts", "1 minute"))
        f = (spark.readStream.schema(fsch)
             .option("maxFilesPerTrigger", 1)
             .parquet(str(f_lake)).withWatermark("ts", "1 minute"))
        out = temporal_join_changelog_stream(
            f, d, on="user_id", fact_ts="ts", dim_ts="dim_ts",
            how=how, version_interval="10 minutes",
            unique_versions=True,
        )
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "Aggregate" not in plan  # single join, nothing else
        got = run_to_memory(
            out, query_name=f"t_cl_uniq_{how}", output_mode="append"
        ).toPandas()
        return {
            (r.event_id, None if pd.isna(r.tier) else r.tier)
            for r in got[got.user_id >= 0].itertuples()
        }

    # as-of picks: fact@3 -> version@0 (tier 0), fact@14 ->
    # version@10 (tier 1), fact@27 -> version@20 (tier 2)
    assert drain("inner") == {(100, 0.0), (101, 1.0), (102, 2.0)}
    assert drain("left") == {
        (100, 0.0), (101, 1.0), (102, 2.0), (200, None)
    }
    with pytest.raises(ValueError, match="set both"):
        temporal_join_changelog_stream(
            None, None, on="user_id", fact_ts="ts", dim_ts="dim_ts",
            unique_versions=True,
        )
