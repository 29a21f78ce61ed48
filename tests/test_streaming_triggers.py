"""Streaming trigger/evictor twins == batch operators: the drained
CountTrigger / ContinuousEventTimeTrigger streams must equal
operators.triggers.fire_on_count / fire_continuous row-for-row on a
multi-micro-batch parquet stream (each firing emitted exactly once,
when the watermark passes its position), including the CountEvictor
and TimeEvictor variants and cross-batch window continuation."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flink_framework_spark.operators.triggers import (
    fire_continuous,
    fire_on_count,
)
from flink_framework_spark.streaming.triggers import (
    continuous_trigger_stream,
    count_trigger_stream,
)
from flink_framework_spark.streaming.twins import run_to_memory

_SENTINEL = "zzz"


def _frame(spark, rows):
    """rows: (key, minute_offset, event_id, value); ts = 2024-01-01
    10:00 + offset minutes (UTC-naive, cast to event-time TIMESTAMP
    for the stream side)."""
    return spark.createDataFrame(
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


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    """Two keys, elements spread over two 1-hour windows with ties,
    written as four parquet chunks (two data + two sentinel batches
    that only advance the watermark past every firing position)."""
    import random

    rng = random.Random(99)
    rows, eid = [], 0
    for k in ("a", "b"):
        for m in sorted(rng.sample(range(0, 115), 40)):
            eid += 1
            rows.append((k, m, eid, float(rng.randint(0, 99)) / 4))
    # duplicate-timestamp tie inside one window
    rows.append(("a", 7, 9001, 1.25))
    rows.append(("a", 7, 9002, 2.5))
    sent = [
        (_SENTINEL, 300, 99990, 0.0),
        (_SENTINEL, 360, 99991, 0.0),
    ]
    src = tmp_path_factory.mktemp("trig") / "src"
    half = len(rows) // 2
    for ch in (rows[:half], rows[half:], [sent[0]], [sent[1]]):
        _frame(spark, ch).coalesce(1).write.mode("append").parquet(
            str(src)
        )
    return _frame(spark, rows), str(src), _frame(spark, rows).schema


def _drain(spark, src, schema, build):
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "1 minute")
    )
    out = run_to_memory(
        build(sdf), query_name="t_trig", output_mode="update"
    )
    return out.filter(F.col("key") != _SENTINEL)


def _canon_count(df, key="event_type"):
    return sorted(
        (
            r[0],
            str(r[1]),
            int(r[2]),
            int(r[3]),
            round(float(r[4]), 6),
        )
        for r in df.select(
            key, "w_start", "firing_seq", "n_elems", "sum_v"
        ).collect()
    )


def _canon_cont(df, key="event_type"):
    return sorted(
        (
            r[0],
            str(r[1]),
            str(r[2]),
            r[3],
            int(r[4]),
            round(float(r[5]), 6),
        )
        for r in df.select(
            key, "w_start", "fire_at", "firing", "n_elems", "sum_v"
        ).collect()
    )


@pytest.mark.parametrize("evict", [None, 3])
def test_count_trigger_stream_equals_batch(spark, planted, evict):
    batch_df, src, schema = planted
    want = _canon_count(
        fire_on_count(batch_df, 5, window="1 hour", evict_last=evict)
    )
    assert want, "fixture must fire"
    got = _canon_count(
        _drain(
            spark,
            src,
            schema,
            lambda s: count_trigger_stream(
                s, 5, window_s=3600.0, evict_last=evict
            ),
        ),
        key="key",
    )
    assert got == want


@pytest.mark.parametrize("keep", [None, 600.0])
def test_continuous_trigger_stream_equals_batch(spark, planted, keep):
    batch_df, src, schema = planted
    want = _canon_cont(
        fire_continuous(
            batch_df,
            "10 minutes",
            "1 hour",
            evict_keep="10 minutes" if keep else None,
        )
    )
    assert any(r[3] == "early" for r in want), "fixture must fire early"
    assert any(r[3] == "final" for r in want)
    got = _canon_cont(
        _drain(
            spark,
            src,
            schema,
            lambda s: continuous_trigger_stream(
                s, 600.0, 3600.0, evict_keep_s=keep
            ),
        ),
        key="key",
    )
    assert got == want


def test_trigger_validation():
    import pandas as pd  # noqa: F401

    with pytest.raises(ValueError, match="n >= 1"):
        count_trigger_stream(None, 0)
    with pytest.raises(ValueError, match="keep >= 1"):
        count_trigger_stream(None, 5, evict_last=0)
    with pytest.raises(ValueError, match="interval < window"):
        continuous_trigger_stream(None, 7200.0, 3600.0)


# ------------------------------------------- allowedLateness refinement


def test_allowed_lateness_refines_fired_window_across_batches(
    spark, tmp_path_factory
):
    """Flink allowedLateness(): a window fires on time when the
    watermark passes its end, then RE-FIRES a corrected aggregate for
    each late-but-within-lateness element arriving after, and drops
    elements past the horizon. Planted one-late-element-per-batch so
    the twin's batch-granular firings equal the batch operator's
    row-granular (arrival-ordered) sequence exactly."""
    from flink_framework_spark.operators.triggers import (
        fire_allowed_lateness,
    )
    from flink_framework_spark.streaming.triggers import (
        allowed_lateness_stream,
    )

    # window 1h, delay 1 min, lateness 30 min; W = [10:00, 11:00)
    batches = [
        # batch 1: on-time rows in W
        [("a", 5, 1, 1.0), ("a", 20, 2, 2.0), ("b", 10, 3, 4.0)],
        # batch 2: pusher (W2) — flink wm -> 11:01 for batch 3
        [("c", 62, 4, 0.5)],
        # batch 3: late row for W ('a' 10:30) — W fires on_time AND
        # the first late correction in this batch
        [("a", 30, 9, 10.0)],
        # batch 4: second late row (10:45) — second correction
        [("a", 45, 10, 100.0)],
        # batch 5: pusher to 11:45 — flink wm -> 11:44 > 11:30 horizon
        [("c", 105, 11, 0.25)],
        # batch 6: past-horizon row (10:50): dropped, no firing
        [("a", 50, 12, 7.0)],
        # batches 7/8: sentinels close W2 and flush timers
        [(_SENTINEL, 300, 99990, 0.0)],
        [(_SENTINEL, 360, 99991, 0.0)],
    ]
    src = tmp_path_factory.mktemp("lateref") / "src"
    flat = []
    for bi, ch in enumerate(batches):
        _frame(spark, ch).coalesce(1).write.mode("append").parquet(
            str(src)
        )
        flat.extend((bi,) + r for r in ch)

    # batch operator: arrival = (batch index, event_id)
    bdf = _frame(spark, [r[1:] for r in flat]).join(
        spark.createDataFrame(
            [(r[3], r[0]) for r in flat], "event_id long, arrival int"
        ),
        "event_id",
    )
    want = sorted(
        (r[0], str(r[1]), r[2], int(r[3]), int(r[4]), round(r[5], 6))
        for r in fire_allowed_lateness(
            bdf,
            window="1 hour",
            delay="1 minute",
            lateness="30 minutes",
            order_cols=("arrival", "event_id"),
        ).collect()
        if r[0] != _SENTINEL
    )
    # the planted refinement sequence, verified literally (w_start
    # rendering depends on the collect-side timezone — compare the
    # sequence by fire order, one shared window for key 'a')
    a_rows = sorted(
        [w for w in want if w[0] == "a"], key=lambda w: w[3]
    )
    assert len({w[1] for w in a_rows}) == 1  # all in window W
    assert [(w[2], w[3], w[4], w[5]) for w in a_rows] == [
        ("on_time", 0, 2, 3.0),
        ("late", 1, 3, 13.0),
        ("late", 2, 4, 113.0),
    ]
    assert [
        (w[2], w[4], w[5]) for w in want if w[0] == "b"
    ] == [("on_time", 1, 4.0)]

    sdf = (
        spark.readStream.schema(_frame(spark, batches[0]).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )  # NO withWatermark: the operator shifts and applies its own
    out = run_to_memory(
        allowed_lateness_stream(
            sdf, window_s=3600.0, delay_s=60.0, lateness_s=1800.0
        ),
        query_name="t_late_refine",
        output_mode="update",
    ).filter(F.col("key") != _SENTINEL)
    got = sorted(
        (r[0], str(r[1]), r[2], int(r[3]), int(r[4]), round(r[5], 6))
        for r in out.select(
            "key", "w_start", "firing", "fire_seq", "n_elems", "sum_v"
        ).collect()
    )
    assert got == want
