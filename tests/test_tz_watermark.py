"""Watermark-clock alignment under non-UTC sessions (round 9).

``getCurrentWatermarkMs`` is an instant epoch while Arrow hands
TIMESTAMP columns to pandas as SESSION-TIMEZONE wall-clock naive
values; state twins that compare the two raw scales are wrong by the
session offset. Found by running the trigger drain under Asia/Tokyo
(+9: every firing deferred 9h past the sentinels -> zero rows emitted;
the default America/New_York suite masked it because a negative offset
WIDENS the watermark). These tests pin the fixed operators under a
Tokyo session created via ``spark.newSession()`` — the adversarial
direction, where an unconverted watermark emits nothing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def tokyo(spark):
    s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    return s2


def _frame(s, rows):
    return s.createDataFrame(
        [
            (k, f"2024-01-01 {10 + m // 60:02d}:{m % 60:02d}:00", e, v)
            for (k, m, e, v) in rows
        ],
        "event_type string, ts string, event_id long, value double",
    ).select(
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        "value",
    )


def test_count_trigger_fires_under_tokyo_session(tokyo, tmp_path):
    from flink_framework_spark.operators.triggers import fire_on_count
    from flink_framework_spark.streaming.triggers import (
        count_trigger_stream,
    )
    from flink_framework_spark.streaming.twins import run_to_memory

    rows = [("a", m, i + 1, float(i)) for i, m in enumerate(range(0, 55, 5))]
    sent = [("zzz", 300, 99990, 0.0), ("zzz", 360, 99991, 0.0)]
    src = tmp_path / "src"
    half = len(rows) // 2
    for ch in (rows[:half], rows[half:], [sent[0]], [sent[1]]):
        _frame(tokyo, ch).coalesce(1).write.mode("append").parquet(
            str(src)
        )
    want = sorted(
        (r[0], int(r[2]), int(r[3]), round(float(r[4]), 6))
        for r in fire_on_count(
            _frame(tokyo, rows), 5, window="1 hour"
        ).collect()
    )
    assert want  # 11 elements -> firings at 5 and 10
    sdf = (
        tokyo.readStream.schema(_frame(tokyo, rows).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "1 minute")
    )
    out = run_to_memory(
        count_trigger_stream(sdf, 5, window_s=3600.0),
        query_name="t_tz_count",
        output_mode="update",
    ).filter(F.col("key") != "zzz")
    got = sorted(
        (r[0], int(r[1]), int(r[2]), round(float(r[3]), 6))
        for r in out.select(
            "key", "firing_seq", "n_elems", "sum_v"
        ).collect()
    )
    assert got == want


def test_over_window_drains_under_tokyo_session(tokyo, tmp_path):
    from flink_framework_spark.streaming.stateful import (
        over_window_running,
    )
    from flink_framework_spark.streaming.twins import run_to_memory

    src = tmp_path / "src"
    rows = [(1, m, 10 + m, float(m)) for m in range(0, 40, 10)]
    sent = [(9, 300, 99990, 0.0), (9, 301, 99991, 0.0)]
    for ch in (rows[:2], rows[2:], [sent[0]], [sent[1]]):
        _frame(tokyo, [("u", m, e, v) for (_, m, e, v) in ch]).select(
            F.lit(1).alias("user_id"), "ts", "event_id", "value"
        ).coalesce(1).write.mode("append").parquet(str(src))
    sdf = (
        tokyo.readStream.schema(
            "user_id int, ts timestamp, event_id long, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .selectExpr(
            "CAST(user_id AS LONG) user_id", "ts", "event_id", "value"
        )
        .withWatermark("ts", "1 minute")
    )
    out = run_to_memory(
        over_window_running(sdf),
        query_name="t_tz_over",
        output_mode="update",
    ).toPandas()
    main = out[out.event_id < 99990]
    # all four data rows flushed through the running accumulator
    assert sorted(main.run_n.tolist()) == [1, 2, 3, 4]
    assert max(main.run_sum.tolist()) == sum(
        v for (_, _, _, v) in rows
    )


def test_streaming_mr_drains_under_tokyo_session(tokyo, tmp_path):
    from flink_framework_spark.operators.match_recognize import (
        match_recognize,
    )
    from flink_framework_spark.streaming.mr import match_recognize_stream
    from flink_framework_spark.streaming.twins import run_to_memory

    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, B.event_id AS b_id
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (A B)
        WITHIN INTERVAL '30' MINUTE
        DEFINE A AS A.event_type = 'view',
               B AS B.event_type = 'purchase'"""
    rows = [
        (1, 0, 1, "view"), (1, 5, 2, "purchase"),
        (1, 10, 3, "view"), (1, 20, 4, "purchase"),
        (2, 0, 5, "view"), (2, 40, 6, "purchase"),  # outside WITHIN
    ]
    sent = [(9, 300, 99990, "error"), (9, 301, 99991, "error")]

    def frame(s, rws):
        return s.createDataFrame(
            [
                (u, f"2024-01-01 {10 + m // 60:02d}:{m % 60:02d}:00",
                 e, t)
                for (u, m, e, t) in rws
            ],
            "user_id long, ts string, event_id long, event_type string",
        ).select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"),
            "event_id", "event_type",
        )

    src = tmp_path / "src"
    for ch in (rows[:3], rows[3:], [sent[0]], [sent[1]]):
        frame(tokyo, ch).coalesce(1).write.mode("append").parquet(
            str(src)
        )
    want = sorted(
        (r["user_id"], r["a_id"], r["b_id"])
        for r in match_recognize(
            frame(tokyo, rows), clause, engine="nfa"
        ).collect()
    )
    assert want  # user 1's two matches
    sdf = (
        tokyo.readStream.schema(frame(tokyo, rows).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "1 minute")
    )
    out = run_to_memory(
        match_recognize_stream(sdf, clause, engine="nfa"),
        query_name="t_tz_mr",
        output_mode="update",
    )
    got = sorted(
        (r["user_id"], r["a_id"], r["b_id"])
        for r in out.collect()
        if r["user_id"] != 9
    )
    assert got == want


def test_changelog_temporal_join_under_tokyo_session(tokyo, tmp_path):
    import pandas as pd

    from flink_framework_spark.streaming.temporal import (
        temporal_join_changelog_stream,
    )
    from flink_framework_spark.streaming.twins import run_to_memory

    def dimf(rows):
        return tokyo.createDataFrame(
            [(u, f"2024-01-01 {h:02d}:{m:02d}:00", t) for u, h, m, t in rows],
            "user_id long, dim_ts string, tier long",
        ).selectExpr(
            "user_id", "CAST(dim_ts AS timestamp) AS dim_ts", "tier"
        )

    def factf(rows):
        return tokyo.createDataFrame(
            [(u, f"2024-01-01 {h:02d}:{m:02d}:00", e) for u, h, m, e in rows],
            "user_id long, ts string, event_id long",
        ).selectExpr(
            "user_id", "CAST(ts AS timestamp) AS ts", "event_id"
        )

    d_lake, f_lake = tmp_path / "dim", tmp_path / "facts"
    dimf([(1, 9, 0, 1)]).coalesce(1).write.mode("append").parquet(str(d_lake))
    factf([(1, 10, 5, 100)]).coalesce(1).write.mode("append").parquet(
        str(f_lake)
    )
    # the LATE dim update in the NEXT batch must still win the as-of
    # pick — under the unconverted watermark a Tokyo session would
    # never emit (or an NY session would emit before the correction)
    dimf([(1, 10, 0, 2)]).coalesce(1).write.mode("append").parquet(str(d_lake))
    factf([(1, 10, 6, 300)]).coalesce(1).write.mode("append").parquet(
        str(f_lake)
    )
    for k in (3, 4):
        dimf([(9, 11, 30 + k, 9)]).coalesce(1).write.mode("append").parquet(
            str(d_lake)
        )
        factf([(9, 11, 30 + k, 900 + k)]).coalesce(1).write.mode(
            "append"
        ).parquet(str(f_lake))
    d = (
        tokyo.readStream.schema(dimf([]).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d_lake))
        .withWatermark("dim_ts", "10 minutes")
    )
    f = (
        tokyo.readStream.schema(factf([]).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(f_lake))
        .withWatermark("ts", "10 minutes")
    )
    got = run_to_memory(
        temporal_join_changelog_stream(
            f, d, on="user_id", fact_ts="ts", dim_ts="dim_ts"
        ),
        query_name="t_tz_temporal",
        output_mode="update",
    ).toPandas()
    by_eid = {
        int(r.event_id): int(r.tier)
        for r in got[got.user_id == 1].itertuples()
    }
    assert by_eid == {100: 2, 300: 2}
