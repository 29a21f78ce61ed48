"""Shared logical expressions for the streaming operators.

Each function takes a DataFrame that may come from ``spark.read`` OR
``spark.readStream`` and applies the identical transformation — this
is how the engine guarantees batch/stream equivalence (property-tested
in the suite): one logical definition, two execution modes, exactly
the Flink model of "batch is a bounded stream" (SURVEY.md §1.1).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import fmt_ts, round_duck


def _is_instant(events: DataFrame) -> bool:
    return events.schema["ts"].dataType.simpleString() == "timestamp"


def _fmt_event_time(events: DataFrame, col):
    """Render an event-time boundary as the UTC wall-clock string.

    Batch twins carry TIMESTAMP_NTZ (naive UTC); streaming twins carry
    TIMESTAMP instants (watermarks require it). Both render to the
    same string: instants are converted to UTC-naive first so the
    output never depends on the session timezone."""
    if _is_instant(events):
        col = F.convert_timezone(None, F.lit("UTC"), col)
    return fmt_ts(col)


def hourly_tumble(events: DataFrame) -> DataFrame:
    """1-hour tumbling event-time windows per event type."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_duck(F.sum("value"), 2).alias("sumv"),
        )
        .select(
            _fmt_event_time(events, F.col("w.start")).alias("wstart"),
            "event_type",
            "n",
            "sumv",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 15 minutes (4 windows per event)."""
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_duck(F.sum("value"), 2).alias("sumv"),
        )
        .select(_fmt_event_time(events, F.col("w.start")).alias("wstart"), "n", "sumv")
    )


def session_windows(events: DataFrame) -> DataFrame:
    """Per (user, 30-min-gap session): event count and ms duration.

    Duration is DuckDB ``date_diff('millisecond', ...)`` semantics:
    truncate each endpoint to the millisecond, then subtract."""
    trunc_ms = lambda c: F.date_trunc("millisecond", c)  # noqa: E731
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_ev"),
            F.min("ts").alias("mn"),
            F.max("ts").alias("mx"),
        )
        .select(
            "user_id",
            "n_ev",
            (
                F.expr(
                    "timestampdiff(MICROSECOND, date_trunc('MILLISECOND', mn),"
                    " date_trunc('MILLISECOND', mx))"
                )
                / F.lit(1000)
            )
            .cast("long")
            .alias("dur_ms"),
        )
    )


def session_stats(events: DataFrame) -> DataFrame:
    """Roll session windows up to per-user stats (q_stream_session)."""
    sess = session_windows(events)
    return sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_ev").alias("n_events"),
        F.max("dur_ms").alias("max_dur_ms"),
    )


def dynamic_session_windows(events: DataFrame) -> DataFrame:
    """Per-event DYNAMIC session gap — Flink's
    ``SessionWindowTimeGapExtractor``: each event extends its session
    by its own gap (purchases close fast at 10 minutes, everything
    else idles out at 30), and overlapping per-event intervals
    ``[ts, ts+gap)`` merge into one window whose end is the MAX
    interval end. Spark's ``session_window`` takes the gap as an
    expression, so this stays a single JVM-side keyed aggregation —
    batch or streaming — with no custom state code."""
    gap = F.when(F.col("event_type") == "purchase", "10 minutes").otherwise(
        "30 minutes"
    )
    return (
        events.groupBy(
            "user_id", F.session_window("ts", gap).alias("sw")
        )
        .agg(
            F.count(F.lit(1)).alias("n_ev"),
            round_duck(F.sum("value"), 2).alias("sumv"),
        )
        .select(
            "user_id",
            _fmt_event_time(events, F.col("sw.start")).alias("ws"),
            _fmt_event_time(events, F.col("sw.end")).alias("we"),
            "n_ev",
            "sumv",
        )
    )


def cumulate_exploded(
    events: DataFrame, step_minutes: int = 15, size_minutes: int = 60
) -> DataFrame:
    """Assign each event to its Flink CUMULATE windows (exploded form).

    Flink's ``CUMULATE(TABLE t, DESCRIPTOR(ts), step, size)`` TVF
    (FLIP-145) emits, for every ``size``-aligned big window, a
    cumulative sub-window per ``step``: ``[start, start+step)``,
    ``[start, start+2*step)``, … ``[start, start+size)``. A row
    belongs to every sub-window whose end is strictly after its
    timestamp. Spark has no CUMULATE expression, but the assignment
    is a pure built-in composition: tumble into the big window, then
    ``sequence(k_min, n_steps)`` + ``explode`` for the sub-window
    indices — fully codegen'd, no Python. The explode factor is
    bounded by ``size/step`` (here 4), so at 100 TB this is a
    constant-factor flatMap feeding one keyed shuffle, exactly how
    Flink's own implementation shares per-step panes.

    Returns the input columns plus ``w`` (big window struct), ``k``
    (sub-window index, 1-based) and ``end_ts`` (sub-window end, an
    event-time column usable for watermarking in the streaming twin).
    """
    if size_minutes % step_minutes:
        raise ValueError(
            f"size ({size_minutes}m) must be a multiple of step ({step_minutes}m)"
        )
    n_steps = size_minutes // step_minutes
    step_sec = step_minutes * 60
    return (
        events.withColumn("w", F.window("ts", f"{size_minutes} minutes"))
        .withColumn(
            "k",
            F.explode(
                F.sequence(
                    (
                        F.floor(
                            F.expr("timestampdiff(SECOND, w.start, ts)")
                            / F.lit(step_sec)
                        )
                        + F.lit(1)
                    ).cast("int"),
                    F.lit(n_steps),
                )
            ),
        )
        .withColumn(
            "end_ts",
            F.expr(f"w.start + make_dt_interval(0, 0, {step_minutes} * k, 0)"),
        )
    )


def cumulate_counts(
    events: DataFrame, step_minutes: int = 15, size_minutes: int = 60
) -> DataFrame:
    """Flink CUMULATE window aggregate (1h size, 15m step): per
    cumulative sub-window, event count and value sum. Early-firing
    cumulative totals — the dashboard "running hour so far" shape
    Flink added the TVF for."""
    e = cumulate_exploded(events, step_minutes, size_minutes)
    return (
        e.groupBy("w", "end_ts")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_duck(F.sum("value"), 2).alias("sumv"),
        )
        .select(
            _fmt_event_time(events, F.col("w.start")).alias("wstart"),
            _fmt_event_time(events, F.col("end_ts")).alias("wend"),
            "n",
            "sumv",
        )
    )


def window_join(
    left: DataFrame,
    right: DataFrame,
    size: str = "1 hour",
    keys: Sequence[str] = ("user_id",),
    how: str = "inner",
) -> DataFrame:
    """Flink window-join TVF (FLIP-145 window join): tumble both
    sides into the same ``size`` windows, then equi-join on
    (window, keys). Unlike the interval join (relative time bound per
    row), the window join co-partitions both streams by an ALIGNED
    window — in streaming both sides carry a watermark and state for
    a window is dropped the moment the watermark passes its end,
    which is why Flink recommends it over the interval join for
    high-fanout keys. In Spark the same expression runs batch or as a
    watermarked stream-stream join on the window struct.

    At scale: one shuffle per side on (window, keys) — the join is
    an equi-join (no range condition), so AQE can pick SMJ or
    shuffled hash and skew-split hot windows.

    Returns left columns prefixed ``l_``, right prefixed ``r_``, plus
    the shared ``w`` window struct (right columns NULL for outer
    non-matches).
    """
    lw = left.withColumn("w", F.window("ts", size))
    rw = right.withColumn("w", F.window("ts", size))
    lsel = lw.select(
        "w", *[F.col(c).alias(f"l_{c}") for c in left.columns]
    )
    rsel = rw.select(
        F.col("w").alias("__rw"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
    )
    cond = [lsel["w"] == rsel["__rw"]] + [
        lsel[f"l_{k}"] == rsel[f"r_{k}"] for k in keys
    ]
    joined = lsel.join(rsel, cond, how)
    return joined.drop("__rw")


def stream_dedup(events: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Dedup on keys; in streaming mode pair with withWatermark so
    state stays bounded (streaming.twins does)."""
    return events.select(*keys).dropDuplicates(list(keys))


def late_data_split(
    events: DataFrame,
    arrival_order: list,
    delay: str = "10 minutes",
    ts_col: str = "ts",
):
    """Flink-style late-data SIDE OUTPUT, batch form (SURVEY.md §4.3.4).

    Spark's streaming watermark silently DROPS late rows; Flink can
    divert them to a side output. This operator closes that parity
    gap for bounded replays: given the arrival order (columns sorting
    the stream as it arrived), it computes the running-max watermark
    and returns (on_time, late) DataFrames — the late one is exactly
    the set a Flink job would side-output and a Spark streaming job
    would drop.
    """
    w = (
        Window.orderBy(*arrival_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = events.withColumn("__wm", F.max(ts_col).over(w))
    is_late = F.col("__wm").isNotNull() & (
        F.col(ts_col) < F.col("__wm") - F.expr(f"INTERVAL {delay}")
    )
    on_time = marked.filter(~is_late).drop("__wm")
    late = marked.filter(is_late).drop("__wm")
    return on_time, late


def hierarchical_rollup(events: DataFrame) -> DataFrame:
    """Continuous-aggregate style hierarchical time rollup: minute ->
    hour -> day, where each coarser grain re-aggregates the FINER
    pre-aggregate, never the raw table — the TimescaleDB/materialized-
    rollup pattern. At 100 TB the raw scan happens once (minute
    grain); the hour re-agg reads 60x fewer rows and the day re-agg
    24x fewer again, and in a lake deployment each level is its own
    materialized table refreshed incrementally.

    Value sums are carried as DECIMAL(18,6) from the leaf level up so
    the nested re-aggregation is exact and engine-order-independent
    (nested double sums would differ from a flat sum by ulps).

    Returns (grain, bucket, n, sumv) for grains minute/hour/day.
    """
    minute = (
        events.groupBy(
            F.date_trunc("minute", F.col("ts")).alias("bucket")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
        )
    )
    hour = (
        minute.groupBy(
            F.date_trunc("hour", F.col("bucket")).alias("bucket")
        ).agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )
    day = (
        hour.groupBy(
            F.date_trunc("day", F.col("bucket")).alias("bucket")
        ).agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )

    def lvl(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            _fmt_event_time(events, F.col("bucket")).alias("bucket"),
            F.col("n"),
            F.col("s").cast("double").alias("sumv"),
        )

    return (
        lvl(minute, "minute").unionByName(lvl(hour, "hour")).unionByName(lvl(day, "day"))
    )


def compact_changelog(
    df: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str,
    delete_op: str,
) -> DataFrame:
    """Materialize an upsert/retract changelog into final table state
    — the Flink "upsert stream -> table" conversion, batch form:
    last-writer-wins per key (ordered by ``seq_cols``), rows whose
    final op is ``delete_op`` are dropped. ``seq_cols`` must be a
    deterministic total order per key (e.g. event time + a unique id
    as tiebreak).

    One window over the key partitioning (row_number desc, no global
    sort) — at scale this is a single shuffle on the key, and in a
    lake deployment it is exactly the compaction step a CDC ingest
    job runs per partition. Keeps every input column plus
    ``n_versions`` (changelog depth per key, an audit column).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_versions", F.count(F.lit(1)).over(
            Window.partitionBy(*key_cols)
        ))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != delete_op))
        .drop("__rn")
    )
