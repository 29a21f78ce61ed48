"""Custom window triggers and evictors (SURVEY.md §2 I-family tail —
Flink ``Trigger``/``Evictor`` on windowed streams).

Flink lets a windowed aggregation fire on conditions other than the
watermark passing the window end: ``CountTrigger(n)`` fires every n
elements, ``ContinuousEventTimeTrigger(interval)`` fires early at
every event-time interval boundary (plus the final firing at the
window end), and an ``Evictor`` (``CountEvictor(m)`` /
``TimeEvictor(t)``) restricts which buffered elements each firing
aggregates. Spark's built-in windowed aggregation knows only the
watermark-final firing (append) and the per-micro-batch partial
(update) — neither is Flink's deterministic trigger sequence — so
these operators implement the trigger semantics directly.

Determinism contract (both engines, batch and streaming twins):
firing positions are defined over the PER-KEY-PER-WINDOW EVENT-TIME
ORDER ``(ts, id)``, not arrival order. Flink's CountTrigger counts
arrivals, which makes its output arrival-order-dependent; the
event-time spelling is the deterministic realization — equal to
Flink's whenever elements arrive in event-time order — and it is
what makes a value-hash oracle possible at all.

Scale shape: both batch operators are pure window-function plans —
one keyed sort per (key, window), running/frame aggregates in
whole-stage codegen, the boundary generation an ``explode(sequence)``
sized by window/interval (a small constant) — no joins beyond the
optional boundary-element range join, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fire_on_count(
    events: DataFrame,
    n: int,
    window: str = "1 day",
    evict_last: int | None = None,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Flink ``CountTrigger(n)`` (+ optional ``CountEvictor``) on a
    tumbling event-time window: within each (key, window), a firing
    happens at every n-th element in ``(ts, id)`` order. Each firing
    aggregates the WHOLE window buffer so far (Flink FIRE without
    purge); with ``evict_last=m`` only the last m elements survive
    eviction before the aggregate (``CountEvictor(m)``). Windows
    never fire at the watermark — pure CountTrigger semantics, the
    leftover tail below the last multiple of n is discarded when the
    window is GC'd, exactly like Flink.

    Output: one row per firing — ``(key_col, w_start, firing_seq,
    n_elems, sum_v)`` where ``firing_seq`` counts firings within the
    window (1-based), ``n_elems``/``sum_v`` aggregate the buffer
    (prefix, or last-m frame under eviction).
    """
    from pyspark.sql import Window as W

    if n < 1:
        raise ValueError("CountTrigger needs n >= 1")
    if evict_last is not None and evict_last < 1:
        raise ValueError("CountEvictor needs keep >= 1")
    win = F.window(ts_col, window)
    base = events.select(
        F.col(key_col).alias("__k"),
        win.start.alias("w_start"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(val_col).cast("double").alias("__v"),
    )
    order = W.partitionBy("__k", "w_start").orderBy("__ts", "__id")
    if evict_last is None:
        frame = order.rowsBetween(W.unboundedPreceding, W.currentRow)
    else:
        frame = order.rowsBetween(-(evict_last - 1), W.currentRow)
    ranked = base.select(
        "__k",
        "w_start",
        F.row_number().over(order).alias("__rn"),
        F.count(F.lit(1)).over(frame).alias("n_elems"),
        F.sum("__v").over(frame).alias("sum_v"),
    )
    return ranked.filter(F.col("__rn") % n == 0).select(
        F.col("__k").alias(key_col),
        "w_start",
        (F.col("__rn") / n).cast("int").alias("firing_seq"),
        F.col("n_elems").cast("bigint").alias("n_elems"),
        "sum_v",
    )


def fire_continuous(
    events: DataFrame,
    interval: str = "6 hours",
    window: str = "1 day",
    evict_keep: str | None = None,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Flink ``ContinuousEventTimeTrigger(interval)`` (+ optional
    ``TimeEvictor``) on a tumbling event-time window: per (key,
    window), EARLY firings at every epoch-aligned event-time
    boundary ``b`` (multiples of ``interval``) from the first
    element's aligned boundary up to (excluding) the window end, plus
    the FINAL firing at the window end — Flink's trigger registers
    exactly this timer chain from the first element on. The firing at
    boundary ``b`` aggregates elements with ``ts <= b`` (what has
    arrived when the watermark passes ``b``, under in-order-per-key
    event time — the deterministic contract shared with the streaming
    twin); with ``evict_keep=t`` only elements within ``t`` of the
    boundary survive (``TimeEvictor(t)``: keep the trailing t of
    buffer at each firing).

    Output: ``(key_col, w_start, fire_at, firing, n_elems, sum_v)``
    with ``firing`` = 'early' | 'final'.

    Boundary alignment is to the WINDOW START (``w_start + k *
    interval``), which equals Flink's epoch alignment whenever the
    tumbling window start is itself interval-aligned — always true
    when ``interval`` divides ``window``, the sane configuration.
    Like Flink's ceil alignment, the first boundary is STRICTLY
    after the first element. All timestamp arithmetic goes through
    naive-epoch microseconds (``unix_micros(to_utc_timestamp(x,
    'UTC'))``) so the plan is timezone-independent on TIMESTAMP_NTZ
    data.

    Scale shape: boundary generation is ``explode(sequence(...))``
    per (key, window) first-element row — window/interval rows each,
    a small constant — then ONE range join back to the window's
    elements on the key+window equi pair; no per-element Python, no
    cross join (the join is equi on (key, w_start) with the boundary
    comparison as residual).
    """
    import pandas as pd

    ivl_s = pd.Timedelta(interval.lower()).total_seconds()
    win_s = pd.Timedelta(window.lower()).total_seconds()
    if ivl_s <= 0 or ivl_s >= win_s:
        raise ValueError(
            "ContinuousEventTimeTrigger needs 0 < interval < window"
        )
    if win_s % ivl_s != 0:
        raise ValueError(
            f"interval {interval!r} must divide window {window!r}: "
            "boundaries here align to the window start, which equals "
            "Flink's epoch alignment only when the tumbling window "
            "start is itself interval-aligned — a non-dividing "
            "interval would fire at different instants than Flink"
        )
    ivl = F.expr(f"INTERVAL {interval}")
    win = F.window(ts_col, window)
    base = events.select(
        F.col(key_col).alias("__k"),
        win.start.alias("w_start"),
        win.end.alias("w_end"),
        F.col(ts_col).alias("__ts"),
        F.col(val_col).cast("double").alias("__v"),
    )

    def naive_us(c):
        return F.unix_micros(F.to_utc_timestamp(c, "UTC"))

    # first element per (key, window) anchors the timer chain; the
    # first boundary is strictly after it (Flink's ceil alignment)
    firsts = base.groupBy("__k", "w_start", "w_end").agg(
        F.min("__ts").alias("__first")
    )
    ivl_us = round(ivl_s * 1e6)
    k0 = (
        F.floor(
            (naive_us(F.col("__first")) - naive_us(F.col("w_start")))
            / F.lit(ivl_us)
        )
        + 1
    ).cast("int")
    # clamp: a first element inside the last interval would put b0
    # past w_end, which sequence() rejects; the < w_end filter then
    # leaves no early firings, as it should
    b0 = F.least(F.col("w_start") + ivl * k0, F.col("w_end"))
    bounds = firsts.select(
        "__k",
        "w_start",
        "w_end",
        F.explode(F.sequence(b0, F.col("w_end"), ivl)).alias("fire_at"),
    ).filter(F.col("fire_at") < F.col("w_end"))
    finals = firsts.select(
        "__k", "w_start", "w_end", F.col("w_end").alias("fire_at")
    )
    all_bounds = bounds.unionByName(finals).select(
        "__k",
        "w_start",
        "fire_at",
        F.when(F.col("fire_at") < F.col("w_end"), F.lit("early"))
        .otherwise(F.lit("final"))
        .alias("firing"),
    )
    cond = (
        (F.col("e.__k").eqNullSafe(F.col("b.__k")))
        & (F.col("e.w_start") == F.col("b.w_start"))
        & (F.col("e.__ts") <= F.col("b.fire_at"))
    )
    if evict_keep is not None:
        keep = F.expr(f"INTERVAL {evict_keep}")
        cond = cond & (F.col("e.__ts") > F.col("b.fire_at") - keep)
    joined = all_bounds.alias("b").join(base.alias("e"), cond)
    return (
        joined.groupBy(
            F.col("b.__k").alias(key_col),
            F.col("b.w_start").alias("w_start"),
            F.col("b.fire_at").alias("fire_at"),
            F.col("b.firing").alias("firing"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_elems"),
            F.sum("e.__v").alias("sum_v"),
        )
    )


def fire_allowed_lateness(
    events: DataFrame,
    window: str = "1 day",
    delay: str = "10 minutes",
    lateness: str = "1 hour",
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    order_cols: tuple[str, ...] = ("arrival", "event_id"),
) -> DataFrame:
    """Flink ``allowedLateness(lateness)`` on a tumbling event-time
    window (batch emulation of the refinement FIRING SEQUENCE).

    The arrival process is made explicit (``order_cols``, a total
    arrival order; the streaming twin's micro-batch order): the watermark at a row is
    the running max event time of rows that arrived STRICTLY before
    it, minus ``delay`` (``BoundedOutOfOrdernessWatermarks``, the
    same row-granular bound as :mod:`streaming.late`). A window
    ``[w_start, w_end)`` then fires

    - ``'on_time'`` (``fire_seq`` 0) when the watermark passes
      ``w_end`` — aggregating the rows that arrived while
      ``wm < w_end`` (skipped when the window had no on-time rows:
      no timer was pending, Flink fires nothing);
    - ``'late'`` (``fire_seq`` 1..k) once PER admitted late row, in
      arrival order, each with the CORRECTED cumulative aggregate —
      Flink's per-element late firing under the default
      EventTimeTrigger. A late row is admitted iff Flink's
      ``isElementLate`` says so: ``wm < w_end + lateness`` at its
      arrival (window-based, NOT element-timestamp-based);
    - nothing past the lateness horizon — those rows are dropped
      (route them to :mod:`streaming.late`'s side output for
      observability).

    Windows whose end the watermark never passes fire nothing (their
    state would still be buffered). Output: ``(key_col, w_start,
    firing, fire_seq, n_elems, sum_v)``.

    Scale shape: one global ordered window computes the arrival
    watermark (inherent — a watermark IS one global monotone bound,
    same note as ``streaming/late.py``), then everything is keyed:
    one aggregate for the on-time firings and one cumulative window
    over ADMITTED LATE rows only (late rows are rare by
    construction). No Python, no joins beyond the final union.
    """
    from pyspark.sql import Window

    dly = F.expr(f"INTERVAL {delay}")
    late_iv = F.expr(f"INTERVAL {lateness}")
    win = F.window(ts_col, window)
    aw = (
        Window.orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = events.select(
        F.col(key_col).alias("__k"),
        win.start.alias("w_start"),
        win.end.alias("w_end"),
        F.col(ts_col).alias("__ts"),
        F.col(val_col).cast("double").alias("__v"),
        (F.max(ts_col).over(aw) - dly).alias("__wm"),
        *[F.col(c) for c in order_cols],
    )
    # the final watermark decides which windows ever fired at all
    final_wm = F.max(F.col("__ts")).over(
        Window.partitionBy(F.lit(1))
    ) - dly
    base = base.withColumn("__final_wm", final_wm).withColumn(
        "__cls",
        F.when(
            F.col("__wm").isNull() | (F.col("__wm") < F.col("w_end")),
            F.lit("on_time"),
        )
        .when(F.col("__wm") < F.col("w_end") + late_iv, F.lit("late"))
        .otherwise(F.lit("dropped")),
    )
    on_time = (
        base.filter(
            (F.col("__cls") == "on_time")
            & (F.col("__final_wm") >= F.col("w_end"))
        )
        .groupBy("__k", "w_start")
        .agg(
            F.count(F.lit(1)).alias("n_elems"),
            F.sum("__v").alias("sum_v"),
        )
        .select(
            F.col("__k").alias(key_col),
            "w_start",
            F.lit("on_time").alias("firing"),
            F.lit(0).cast("bigint").alias("fire_seq"),
            "n_elems",
            "sum_v",
        )
    )
    lw = Window.partitionBy("__k", "w_start").orderBy(*order_cols)
    late_rows = (
        base.filter(F.col("__cls") == "late")
        .withColumn("__seq", F.row_number().over(lw))
        .withColumn("__cn", F.count(F.lit(1)).over(
            lw.rowsBetween(Window.unboundedPreceding, 0)
        ))
        .withColumn("__cs", F.sum("__v").over(
            lw.rowsBetween(Window.unboundedPreceding, 0)
        ))
    )
    # each late firing corrects the on-time aggregate (0 when the
    # window had no on-time rows — the late element created it)
    ot_agg = (
        base.filter(F.col("__cls") == "on_time")
        .groupBy("__k", "w_start")
        .agg(
            F.count(F.lit(1)).alias("__on"),
            F.sum("__v").alias("__os"),
        )
    )
    late = (
        late_rows.join(ot_agg, ["__k", "w_start"], "left")
        .select(
            F.col("__k").alias(key_col),
            "w_start",
            F.lit("late").alias("firing"),
            F.col("__seq").cast("bigint").alias("fire_seq"),
            (F.coalesce(F.col("__on"), F.lit(0)) + F.col("__cn"))
            .alias("n_elems"),
            (F.coalesce(F.col("__os"), F.lit(0.0)) + F.col("__cs"))
            .alias("sum_v"),
        )
    )
    return on_time.unionByName(late)
