"""I. Streaming operators, batch-checkable form (SURVEY.md §2 I1-I8).

These are the reference's core identity: event-time windows, session
gaps, watermarks, dedup, funnels. Spark's ``window``/``session_window``
expressions evaluate identically over a batch DataFrame and a
``readStream`` DataFrame, so each query here shares its logical
expression with the true streaming twin in ``streaming.twins`` (the
oracle can only check the batch side; the stream side is
property-tested batch==stream in the suite).

The shared logical ops live in ``operators.streaming_ops``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import round_duck
from flink_framework_spark.io import table
from flink_framework_spark.operators.streaming_ops import (
    hourly_tumble,
    session_stats,
    sliding_counts,
    stream_dedup,
)
from flink_framework_spark.registry import register


@register(
    "q_stream_tumble",
    family="I",
    oracle="""
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS wstart,
       event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sumv
FROM events GROUP BY wstart, event_type
""",
)
def q_stream_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window aggregate (Flink
    TumblingEventTimeWindows ≡ Spark ``window(ts, '1 hour')``)."""
    return hourly_tumble(table(spark, sf_dir, "events"))


@register(
    "q_stream_slide",
    family="I",
    oracle="""
SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
                - to_minutes(15 * CAST(r.range AS INT)),
                '%Y-%m-%d %H:%M:%S') AS wstart,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS sumv
FROM events, range(4) r
GROUP BY wstart
""",
)
def q_stream_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window aggregate (1h window, 15m slide — each event
    lands in exactly 4 windows)."""
    return sliding_counts(table(spark, sf_dir, "events"))


@register(
    "q_stream_session",
    family="I",
    oracle="""
WITH m AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM m),
sess AS (
  SELECT user_id, sid, COUNT(*) AS n_ev,
         date_diff('millisecond', MIN(ts), MAX(ts)) AS dur_ms
  FROM s GROUP BY user_id, sid)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_ev) AS BIGINT) AS n_events,
       CAST(MAX(dur_ms) AS BIGINT) AS max_dur_ms
FROM sess GROUP BY user_id
""",
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30 min) + per-user session stats.

    Boundary semantics: a gap >= 30min starts a NEW session (both
    engines, SURVEY.md §5.3). Durations are millisecond *boundary*
    diffs (DuckDB date_diff), i.e. truncate-each-then-subtract — the
    fixtures carry sub-millisecond timestamps, so truncating the
    difference instead would be off by one."""
    return session_stats(table(spark, sf_dir, "events"))


@register(
    "q_stream_dedup",
    family="I",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup's batch twin (dropDuplicates)."""
    return stream_dedup(table(spark, sf_dir, "events"), ["user_id", "event_type"])


@register(
    "q_stream_late",
    family="I",
    oracle="""
SELECT event_type, COUNT(*) AS n_late FROM (
  SELECT event_type, ts,
         MAX(ts) OVER (ORDER BY ts + to_minutes(CAST(3 * (event_id % 10) AS INT)),
                       event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM events) t
WHERE wm IS NOT NULL AND ts < wm - INTERVAL '10 minutes'
GROUP BY event_type
""",
)
def q_stream_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark / late-data emulation (I4).

    events.ts is fully sorted by event_id (no natural disorder), so
    arrival order is deterministically jittered by 3*(event_id%10)
    minutes; the running max of event time over already-arrived rows
    is the watermark, and rows more than 10 minutes behind it are
    'late' — exactly what ``withWatermark('ts','10 minutes')`` drops
    in the streaming twin. The global ordered window mirrors the fact
    that a watermark is a single global monotone bound."""
    ev = table(spark, sf_dir, "events").withColumn(
        "arrival", F.col("ts") + F.expr("make_dt_interval(0, 0, CAST(3*(event_id % 10) AS INT), 0)")
    )
    w = (
        Window.orderBy("arrival", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    late = ev.withColumn("wm", F.max("ts").over(w)).filter(
        F.col("wm").isNotNull()
        & (F.col("ts") < F.col("wm") - F.expr("INTERVAL 10 MINUTES"))
    )
    return late.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_late"))


@register(
    "q_funnel",
    family="I",
    oracle="""
SELECT COUNT(DISTINCT e1.user_id) AS n_users
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id
 AND e1.event_type = 'view' AND e2.event_type = 'purchase'
 AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL '30 minutes'
""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stateful CEP pattern (I8): users with a
    view->purchase conversion within 30 minutes. The streaming twin
    keeps per-user state (streaming.stateful)."""
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        views.join(
            buys,
            (F.col("v_user") == F.col("p_user"))
            & (F.col("p_ts") > F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .agg(F.countDistinct("v_user").alias("n_users"))
    )


@register(
    "q_cep_sequence",
    family="I",
    oracle="""
SELECT COUNT(DISTINCT v.user_id) AS n_users
FROM events v
JOIN events c ON c.user_id = v.user_id AND c.event_type = 'click'
             AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL '30 minutes'
JOIN events p ON p.user_id = v.user_id AND p.event_type = 'purchase'
             AND p.ts > c.ts AND p.ts <= v.ts + INTERVAL '30 minutes'
WHERE v.event_type = 'view'
""",
)
def q_cep_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP-lite 3-step pattern (I8 generalization): users completing
    view -> click -> purchase, in order, within 30 minutes of the
    view. Built by operators.cep.match_sequence as chained per-key
    interval joins."""
    from flink_framework_spark.operators.cep import match_sequence

    ev = table(spark, sf_dir, "events")
    matches = match_sequence(ev, ["view", "click", "purchase"], "30 MINUTES")
    return matches.agg(F.countDistinct("user_id").alias("n_users"))


@register(
    "q_cep_negation",
    family="I",
    oracle="""
SELECT COUNT(DISTINCT v.user_id) AS n_users
FROM events v
JOIN events p ON p.user_id = v.user_id AND p.event_type = 'purchase'
            AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL '30 minutes'
WHERE v.event_type = 'view'
  AND NOT EXISTS (
    SELECT 1 FROM events c
    WHERE c.user_id = v.user_id AND c.event_type = 'click'
      AND c.ts > v.ts AND c.ts < p.ts)
""",
)
def q_cep_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP negation (Flink ``notFollowedBy``): users converting
    view -> purchase within 30 minutes with NO click strictly between
    the view and the purchase — the "organic conversion" pattern.
    Built by operators.cep.match_sequence_negated: positive matches,
    then one keyed LEFT ANTI join against the absent-type events."""
    from flink_framework_spark.operators.cep import match_sequence_negated

    ev = table(spark, sf_dir, "events")
    matches = match_sequence_negated(
        ev, ["view", "purchase"], absent="click", within="30 MINUTES"
    )
    return matches.agg(F.countDistinct("user_id").alias("n_users"))


@register(
    "q_cep_times",
    family="I",
    oracle="""
WITH a AS (
  SELECT user_id, ts,
         LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS f2,
         LAG(ts, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS f3
  FROM events WHERE event_type = 'click'),
c AS (
  SELECT user_id, 2 AS n_reps, f2 AS ts_first, ts AS ts_last FROM a
  WHERE f2 IS NOT NULL AND ts <= f2 + INTERVAL '12 hours'
  UNION ALL
  SELECT user_id, 3, f3, ts FROM a
  WHERE f3 IS NOT NULL AND ts <= f3 + INTERVAL '12 hours')
SELECT n_reps, COUNT(*) AS n_matches,
       COUNT(DISTINCT user_id) AS n_users
FROM c
WHERE EXISTS (
  SELECT 1 FROM events p
  WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
    AND p.ts > c.ts_last AND p.ts <= c.ts_first + INTERVAL '12 hours')
GROUP BY n_reps
""",
)
def q_cep_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP bounded looping quantifier (Flink ``times(2, 3)``): 2-3
    consecutive clicks followed by a purchase, all within 12 hours of
    the first click (sized to the fixture's ~2-day inter-click gaps so
    the check is non-trivial at both oracle SFs) — the "burst then convert" pattern. Built by
    operators.cep.match_times: one window pass computes every lag
    depth, stack melts to per-n candidates, LEFT SEMI checks the
    follower."""
    from flink_framework_spark.operators.cep import match_times

    ev = table(spark, sf_dir, "events")
    m = match_times(ev, "click", "purchase", 2, 3, "12 HOURS")
    return m.groupBy("n_reps").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_stream_count_window",
    family="I",
    oracle="""
SELECT user_id, CAST(FLOOR((rn - 1) / 20.0) AS BIGINT) AS win_id,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS sumv
FROM (SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events) t
GROUP BY user_id, win_id
""",
)
def q_stream_count_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count windows — Flink ``keyBy().countWindow(20)``: every 20
    events per key form a window, independent of time. Spark has no
    native streaming count window (it would be a small
    applyInPandasWithState: counter + buffer per key); the batch form
    is a ranked bucket assignment, oracle-checked here."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("win_id", F.floor((F.col("rn") - 1) / 20.0))
        .groupBy("user_id", "win_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            round_duck(F.sum("value"), 2).alias("sumv"),
        )
    )


@register(
    "q_rollup_hier",
    family="I",
    oracle="""
WITH minute AS (
  SELECT time_bucket(INTERVAL '1 minute', ts) AS bucket,
         COUNT(*) AS n, SUM(CAST(value AS DECIMAL(18,6))) AS s
  FROM events GROUP BY 1),
hour AS (
  SELECT time_bucket(INTERVAL '1 hour', bucket) AS bucket,
         SUM(n) AS n, SUM(s) AS s
  FROM minute GROUP BY 1),
day AS (
  SELECT time_bucket(INTERVAL '1 day', bucket) AS bucket,
         SUM(n) AS n, SUM(s) AS s
  FROM hour GROUP BY 1)
SELECT 'minute' AS grain, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
       CAST(n AS BIGINT) AS n, CAST(s AS DOUBLE) AS sumv FROM minute
UNION ALL
SELECT 'hour', strftime(bucket, '%Y-%m-%d %H:%M:%S'),
       CAST(n AS BIGINT), CAST(s AS DOUBLE) FROM hour
UNION ALL
SELECT 'day', strftime(bucket, '%Y-%m-%d %H:%M:%S'),
       CAST(n AS BIGINT), CAST(s AS DOUBLE) FROM day
""",
)
def q_rollup_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical continuous-aggregate rollup (minute -> hour ->
    day), each grain re-aggregating the previous pre-aggregate with
    exact DECIMAL carries (operators.streaming_ops.hierarchical_rollup)."""
    from flink_framework_spark.operators.streaming_ops import hierarchical_rollup

    return hierarchical_rollup(table(spark, sf_dir, "events"))


@register(
    "q_changelog_compact",
    family="I",
    oracle="""
WITH ranked AS (
  SELECT user_id, ts, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_versions
  FROM events)
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
       event_type AS last_op,
       ROUND(value, 2) AS last_value,
       CAST(n_versions AS BIGINT) AS n_versions
FROM ranked
WHERE rn = 1 AND event_type <> 'error'
""",
)
def q_changelog_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert-stream materialization (Flink changelog -> table, batch
    form): events as a per-user changelog ordered by (ts, event_id),
    last-writer-wins, final 'error' op acts as the tombstone/DELETE
    (operators.streaming_ops.compact_changelog)."""
    from flink_framework_spark.operators.streaming_ops import (
        _fmt_event_time,
        compact_changelog,
    )

    ev = table(spark, sf_dir, "events")
    out = compact_changelog(
        ev, ["user_id"], ["ts", "event_id"], "event_type", "error"
    )
    return out.select(
        "user_id",
        _fmt_event_time(ev, F.col("ts")).alias("last_ts"),
        F.col("event_type").alias("last_op"),
        round_duck(F.col("value"), 2).alias("last_value"),
        F.col("n_versions"),
    )


@register(
    "q_window_topn",
    family="I",
    oracle="""
SELECT wstart, event_type, n, rnk FROM (
  SELECT wstart, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY wstart
                            ORDER BY n DESC, event_type) AS rnk
  FROM (
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                    '%Y-%m-%d %H:%M:%S') AS wstart,
           event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2) a) b
WHERE rnk <= 2
""",
)
def q_window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink SQL's Window Top-N pattern: rank inside each event-time
    window, keep the top 2 event types per hour. Tumbling agg then a
    window-partitioned row_number — no global sort."""
    ev = table(spark, sf_dir, "events")
    from flink_framework_spark.operators.streaming_ops import hourly_tumble

    counts = hourly_tumble(ev).select("wstart", "event_type", "n")
    w = Window.partitionBy("wstart").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 2)
        .select("wstart", "event_type", "n", "rnk")
    )


@register(
    "q_cep_skip",
    family="I",
    oracle="""
WITH RECURSIVE cand AS (
  SELECT user_id, n_reps, ts_first, ts_last FROM (
    WITH a AS (
      SELECT user_id, ts,
             LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS f2,
             LAG(ts, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS f3
      FROM events WHERE event_type = 'click'),
    c AS (
      SELECT user_id, 2 AS n_reps, f2 AS ts_first, ts AS ts_last FROM a
      WHERE f2 IS NOT NULL AND ts <= f2 + INTERVAL '12 hours'
      UNION ALL
      SELECT user_id, 3, f3, ts FROM a
      WHERE f3 IS NOT NULL AND ts <= f3 + INTERVAL '12 hours')
    SELECT * FROM c
    WHERE EXISTS (
      SELECT 1 FROM events p
      WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
        AND p.ts > c.ts_last AND p.ts <= c.ts_first + INTERVAL '12 hours'))),
sel AS (
  (SELECT user_id, n_reps, ts_first, ts_last
   FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts_first, ts_last, n_reps) AS rn FROM cand)
   WHERE rn = 1)
  UNION ALL
  (SELECT user_id, n_reps, ts_first, ts_last
   FROM (SELECT c.user_id, c.n_reps, c.ts_first, c.ts_last,
                ROW_NUMBER() OVER (PARTITION BY c.user_id
                     ORDER BY c.ts_first, c.ts_last, c.n_reps) AS rn
         FROM cand c JOIN sel s
           ON c.user_id = s.user_id AND c.ts_first > s.ts_last)
   WHERE rn = 1)
)
SELECT user_id, n_reps,
       strftime(ts_first, '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
       strftime(ts_last, '%Y-%m-%d %H:%M:%S.%f') AS last_ts
FROM sel
""",
)
def q_cep_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP after-match skip strategy (Flink SKIP_PAST_LAST_EVENT):
    the q_cep_times match stream reduced to non-overlapping matches —
    per user, earliest-starting match wins, everything starting at or
    before its last event is skipped, repeat. Spark side is the
    sequential-per-key grouped map operators.cep.skip_past_last; the
    oracle re-derives the same greedy selection as a recursive CTE, so
    the cross-engine check pins the selection order itself."""
    from flink_framework_spark.operators.cep import match_times, skip_past_last

    ev = table(spark, sf_dir, "events")
    m = match_times(ev, "click", "purchase", 2, 3, "12 HOURS")
    sel = skip_past_last(m)
    return sel.select(
        "user_id",
        "n_reps",
        F.date_format("ts_first", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "first_ts"
        ),
        F.date_format("ts_last", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "last_ts"
        ),
    )


@register(
    "q_cep_optional",
    family="I",
    oracle="""
WITH full_m AS (
  SELECT v.user_id, TRUE AS with_click
  FROM events v
  JOIN events c ON c.user_id = v.user_id AND c.event_type = 'click'
               AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL '12 hours'
  JOIN events p ON p.user_id = v.user_id AND p.event_type = 'purchase'
               AND p.ts > c.ts AND p.ts <= v.ts + INTERVAL '12 hours'
  WHERE v.event_type = 'view'),
red_m AS (
  SELECT v.user_id, FALSE AS with_click
  FROM events v
  JOIN events p ON p.user_id = v.user_id AND p.event_type = 'purchase'
               AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL '12 hours'
  WHERE v.event_type = 'view'),
u AS (SELECT * FROM full_m UNION ALL SELECT * FROM red_m)
SELECT with_click, CAST(COUNT(*) AS BIGINT) AS n_matches,
       COUNT(DISTINCT user_id) AS n_users
FROM u GROUP BY with_click
""",
)
def q_cep_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP optional step (Flink ``optional()``): view ->
    click.optional() -> purchase within 12 hours (sized so BOTH
    branches are non-empty at every oracle SF) — under NO_SKIP both
    branches are emitted, the match consuming a click and the match
    skipping it. Built by operators.cep.match_optional as the union
    of the full and reduced match_sequence chains; grouped here by
    whether the optional step participated."""
    from flink_framework_spark.operators.cep import match_optional

    ev = table(spark, sf_dir, "events")
    m = match_optional(ev, ["view", "click", "purchase"], 1, "12 HOURS")
    return m.groupBy(
        F.col("ts_1").isNotNull().alias("with_click")
    ).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_cep_greedy",
    family="I",
    oracle="""
WITH c AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts > LAG(ts) OVER w + INTERVAL '24 hours'
              THEN 1 ELSE 0 END AS brk
  FROM events WHERE event_type = 'click'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
r AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM c),
runs AS (
  SELECT user_id, run_id, MIN(ts) AS ts_first, MAX(ts) AS ts_last,
         COUNT(*) AS n_reps
  FROM r GROUP BY 1, 2),
m AS (
  SELECT * FROM runs
  WHERE ts_last <= ts_first + INTERVAL '7 days'
    AND EXISTS (
      SELECT 1 FROM events p
      WHERE p.user_id = runs.user_id AND p.event_type = 'purchase'
        AND p.ts > runs.ts_last
        AND p.ts <= runs.ts_first + INTERVAL '7 days'))
SELECT CAST(n_reps AS BIGINT) AS n_reps, CAST(COUNT(*) AS BIGINT) AS n_matches,
       COUNT(DISTINCT user_id) AS n_users
FROM m GROUP BY n_reps
""",
)
def q_cep_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP greedy unbounded looping (Flink ``oneOrMore().greedy()``):
    maximal runs of clicks (successive clicks within 24 hours)
    followed by a purchase within 7 days of the run's start — only the
    maximal run per burst is a match, never its prefixes. Built by
    operators.cep.match_one_or_more via gaps-and-islands; the oracle
    re-derives the islands with the same window spelling in DuckDB."""
    from flink_framework_spark.operators.cep import match_one_or_more

    ev = table(spark, sf_dir, "events")
    m = match_one_or_more(ev, "click", "purchase", "24 HOURS", "7 DAYS")
    return m.groupBy("n_reps").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_cep_pattern",
    family="I",
    oracle="""
WITH full_m AS (
  SELECT v.user_id, TRUE AS with_click, v.ts AS ts0, p.ts AS tsN
  FROM events v
  JOIN events c ON c.user_id = v.user_id AND c.event_type = 'click'
               AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL '12 hours'
  JOIN events p ON p.user_id = v.user_id AND p.event_type = 'purchase'
               AND p.ts > c.ts AND p.ts <= v.ts + INTERVAL '12 hours'
  WHERE v.event_type = 'view'),
red_m AS (
  SELECT v.user_id, FALSE AS with_click, v.ts AS ts0, p.ts AS tsN
  FROM events v
  JOIN events p ON p.user_id = v.user_id AND p.event_type = 'purchase'
               AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL '12 hours'
  WHERE v.event_type = 'view'),
u AS (
  SELECT * FROM (SELECT * FROM full_m UNION ALL SELECT * FROM red_m) b
  WHERE NOT EXISTS (
    SELECT 1 FROM events x
    WHERE x.user_id = b.user_id AND x.event_type = 'error'
      AND x.ts > b.ts0 AND x.ts < b.tsN))
SELECT with_click, CAST(COUNT(*) AS BIGINT) AS n_matches,
       COUNT(DISTINCT user_id) AS n_users
FROM u GROUP BY with_click
""",
)
def q_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fluent CEP pattern API (Flink Pattern.begin(..).followedBy(..)
    .optional().notFollowedBy(..).within(..)): view -> click? ->
    purchase with NO error between the view and the purchase, within
    12 hours — the optional+negation COMBO only the pattern compiler
    composes (branch union, then one anti-join over every branch).
    Built by operators.pattern.Pattern; the oracle re-derives both
    branches with the shared NOT EXISTS filter."""
    from flink_framework_spark.operators.pattern import Pattern

    ev = table(spark, sf_dir, "events")
    p = (
        Pattern.begin("view")
        .followed_by("click")
        .optional()
        .followed_by("purchase")
        .not_followed_by("error")
        .within("12 HOURS")
    )
    return p.match(ev).groupBy(
        F.col("ts_1").isNotNull().alias("with_click")
    ).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_cep_until",
    family="I",
    oracle="""
WITH mixed AS (
  SELECT user_id, ts, event_id,
         event_type = 'error' AS is_until
  FROM events WHERE event_type IN ('click', 'error')),
ann AS (
  SELECT user_id, ts, event_id, last_until FROM (
    SELECT user_id, ts, event_id, is_until,
           MAX(CASE WHEN is_until THEN ts END) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS last_until
    FROM mixed)
  WHERE NOT is_until),
c AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts > LAG(ts) OVER w + INTERVAL '24 hours'
                OR (last_until IS NOT NULL
                    AND last_until > LAG(ts) OVER w
                    AND last_until < ts)
              THEN 1 ELSE 0 END AS brk
  FROM ann
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
r AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM c),
runs AS (
  SELECT user_id, run_id, MIN(ts) AS ts_first, MAX(ts) AS ts_last,
         COUNT(*) AS n_reps
  FROM r GROUP BY 1, 2),
m AS (
  SELECT * FROM runs
  WHERE ts_last <= ts_first + INTERVAL '7 days'
    AND EXISTS (
      SELECT 1 FROM events p
      WHERE p.user_id = runs.user_id AND p.event_type = 'purchase'
        AND p.ts > runs.ts_last
        AND p.ts <= runs.ts_first + INTERVAL '7 days'))
SELECT CAST(n_reps AS BIGINT) AS n_reps, CAST(COUNT(*) AS BIGINT) AS n_matches,
       COUNT(DISTINCT user_id) AS n_users
FROM m GROUP BY n_reps
""",
)
def q_cep_until(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP loop stop condition (Flink ``oneOrMore().until()``):
    maximal click runs as in q_cep_greedy, but an ERROR event stops
    the loop — a run cannot span one. Built by
    operators.cep.match_one_or_more(until='error'): a running-max
    window over the unioned click+error stream feeds the island
    breaks; the oracle re-derives the same annotation in DuckDB (the
    window runs over the mixed stream in a subquery, THEN the until
    rows are dropped with WHERE NOT is_until)."""
    from flink_framework_spark.operators.cep import match_one_or_more

    ev = table(spark, sf_dir, "events")
    m = match_one_or_more(
        ev, "click", "purchase", "24 HOURS", "7 DAYS", until="error"
    )
    return m.groupBy("n_reps").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_cep_skip_last",
    family="I",
    oracle="""
WITH RECURSIVE cand AS (
  SELECT user_id, n_reps, ts_first, ts_last FROM (
    WITH a AS (
      SELECT user_id, ts,
             LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS f2,
             LAG(ts, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS f3
      FROM events WHERE event_type = 'click'),
    c AS (
      SELECT user_id, 2 AS n_reps, f2 AS ts_first, ts AS ts_last FROM a
      WHERE f2 IS NOT NULL AND ts <= f2 + INTERVAL '12 hours'
      UNION ALL
      SELECT user_id, 3, f3, ts FROM a
      WHERE f3 IS NOT NULL AND ts <= f3 + INTERVAL '12 hours')
    SELECT * FROM c
    WHERE EXISTS (
      SELECT 1 FROM events p
      WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
        AND p.ts > c.ts_last AND p.ts <= c.ts_first + INTERVAL '12 hours'))),
sel AS (
  (SELECT user_id, n_reps, ts_first, ts_last
   FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts_first, ts_last, n_reps) AS rn FROM cand)
   WHERE rn = 1)
  UNION ALL
  (SELECT user_id, n_reps, ts_first, ts_last
   FROM (SELECT c.user_id, c.n_reps, c.ts_first, c.ts_last,
                ROW_NUMBER() OVER (PARTITION BY c.user_id
                     ORDER BY c.ts_first, c.ts_last, c.n_reps) AS rn
         FROM cand c JOIN sel s
           ON c.user_id = s.user_id AND c.ts_first >= s.ts_last)
   WHERE rn = 1)
)
SELECT user_id, CAST(n_reps AS BIGINT) AS n_reps,
       strftime(ts_first, '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
       strftime(ts_last, '%Y-%m-%d %H:%M:%S.%f') AS last_ts
FROM sel
""",
)
def q_cep_skip_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP after-match skip strategy (Flink SKIP_TO_LAST): the
    q_cep_times match stream pruned greedily like q_cep_skip, but the
    next match may START AT the previous pick's last event (boundary
    repetition shared) — strictly-before starts are skipped. The
    oracle recursion uses >= where q_cep_skip uses strict > (no cycle:
    every pick's ts_last strictly exceeds its ts_first, so successive
    picks advance)."""
    from flink_framework_spark.operators.cep import match_times, skip_to_last

    ev = table(spark, sf_dir, "events")
    m = match_times(ev, "click", "purchase", 2, 3, "12 HOURS")
    sel = skip_to_last(m)
    return sel.select(
        "user_id",
        "n_reps",
        F.date_format("ts_first", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "first_ts"
        ),
        F.date_format("ts_last", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "last_ts"
        ),
    )


@register(
    "q_cep_first",
    family="I",
    oracle="""
WITH s0 AS (
  SELECT user_id, ts AS ts_0, event_id AS id_0
  FROM events WHERE event_type = 'view'),
f1 AS (
  SELECT user_id, ts_0, id_0, ts_1, id_1 FROM (
    SELECT s0.user_id, s0.ts_0, s0.id_0, c.ts AS ts_1,
           c.event_id AS id_1,
           ROW_NUMBER() OVER (PARTITION BY s0.user_id, s0.id_0
                              ORDER BY c.ts, c.event_id) AS rn
    FROM s0 JOIN events c
      ON c.user_id = s0.user_id AND c.event_type = 'click'
     AND c.ts > s0.ts_0 AND c.ts <= s0.ts_0 + INTERVAL '12 hours')
  WHERE rn = 1),
f2 AS (
  SELECT user_id, ts_0 FROM (
    SELECT f1.user_id, f1.ts_0,
           ROW_NUMBER() OVER (PARTITION BY f1.user_id, f1.id_0, f1.id_1
                              ORDER BY p.ts, p.event_id) AS rn
    FROM f1 JOIN events p
      ON p.user_id = f1.user_id AND p.event_type = 'purchase'
     AND p.ts > f1.ts_1 AND p.ts <= f1.ts_0 + INTERVAL '12 hours')
  WHERE rn = 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_matches,
       COUNT(DISTINCT user_id) AS n_users
FROM f2
""",
)
def q_cep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP first-occurrence selection (Flink's ``followedBy`` proper,
    vs the all-combinations ``followedByAny`` of q_cep_sequence):
    view -> first click after it -> first purchase after that, within
    12 hours of the view — ONE match per starting view. Built by
    operators.cep.match_sequence_first (a row_number()==1 window per
    step over the same keyed interval joins), spelled through the
    Pattern builder's select_strategy('first')."""
    from flink_framework_spark.operators.pattern import Pattern

    ev = table(spark, sf_dir, "events")
    p = (
        Pattern.begin("view")
        .followed_by("click")
        .followed_by("purchase")
        .within("12 HOURS")
        .select_strategy("first")
    )
    return p.match(ev).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_cep_strict",
    family="I",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_matches,
       COUNT(DISTINCT v.user_id) AS n_users
FROM events v
JOIN events c ON c.user_id = v.user_id AND c.event_type = 'click'
             AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL '12 hours'
JOIN events p ON p.user_id = v.user_id AND p.event_type = 'purchase'
             AND p.ts > c.ts AND p.ts <= v.ts + INTERVAL '12 hours'
WHERE v.event_type = 'view'
  AND NOT EXISTS (
    SELECT 1 FROM events x
    WHERE x.user_id = v.user_id AND x.ts > v.ts AND x.ts < c.ts)
""",
)
def q_cep_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP strict contiguity (Flink ``next()`` vs ``followedBy()``):
    view -> click with NO event of ANY type between them -> purchase,
    within 12 hours — "clicked straight from the view". Built by the
    Pattern builder's next_step(), which composes
    enforce_strict_contiguity (one keyed anti-join per strict pair)
    over the relaxed chain."""
    from flink_framework_spark.operators.pattern import Pattern

    ev = table(spark, sf_dir, "events")
    p = (
        Pattern.begin("view")
        .next_step("click")
        .followed_by("purchase")
        .within("12 HOURS")
    )
    return p.match(ev).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_cep_group",
    family="I",
    oracle="""
WITH c0 AS (
  SELECT user_id, ts AS ts0, ts AS prev FROM events
  WHERE event_type = 'view'),
c1 AS (
  SELECT c0.user_id, c0.ts0, e.ts AS prev FROM c0
  JOIN events e ON e.user_id = c0.user_id AND e.event_type = 'click'
    AND e.ts > c0.prev AND e.ts <= c0.ts0 + INTERVAL '48 hours'),
c2 AS (
  SELECT c1.user_id, c1.ts0, e.ts AS prev FROM c1
  JOIN events e ON e.user_id = c1.user_id AND e.event_type = 'view'
    AND e.ts > c1.prev AND e.ts <= c1.ts0 + INTERVAL '48 hours'),
c3 AS (
  SELECT c2.user_id, c2.ts0, e.ts AS prev FROM c2
  JOIN events e ON e.user_id = c2.user_id AND e.event_type = 'click'
    AND e.ts > c2.prev AND e.ts <= c2.ts0 + INTERVAL '48 hours'),
m AS (
  SELECT 1 AS n_reps, c1.user_id FROM c1
  JOIN events e ON e.user_id = c1.user_id AND e.event_type = 'purchase'
    AND e.ts > c1.prev AND e.ts <= c1.ts0 + INTERVAL '48 hours'
  UNION ALL
  SELECT 2, c3.user_id FROM c3
  JOIN events e ON e.user_id = c3.user_id AND e.event_type = 'purchase'
    AND e.ts > c3.prev AND e.ts <= c3.ts0 + INTERVAL '48 hours')
SELECT CAST(n_reps AS INT) AS n_reps,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       COUNT(DISTINCT user_id) AS n_users
FROM m GROUP BY n_reps
""",
)
def q_cep_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP GroupPattern (Flink ``Pattern.begin(subPattern)
    .times(m, n)``): the GROUP (view -> click) repeated 1..2 times,
    then a purchase, everything within 48 hours of the first view —
    "one or two browse cycles ending in a purchase". The Pattern
    builder lowers the quantified group by UNROLLING to a bounded
    union of plain join chains (r=1: view click purchase; r=2: view
    click view click purchase), each a chain of keyed interval joins,
    with ``n_reps`` tagging the branch — no NFA, no cross joins. The
    oracle spells the same unroll as chained CTEs (DuckDB's
    optimizer mis-orders the flat 5-way self-join spelling)."""
    from flink_framework_spark.operators.pattern import Pattern

    ev = table(spark, sf_dir, "events")
    g = Pattern.begin("view").followed_by("click")
    p = (
        Pattern.begin(g)
        .times(1, 2)
        .followed_by("purchase")
        .within("48 HOURS")
    )
    return p.match(ev).groupBy("n_reps").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_cep_where",
    family="I",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_matches,
       COUNT(DISTINCT v.user_id) AS n_users,
       ROUND(SUM(p.value), 2) AS sum_purchase
FROM events v
JOIN events p ON p.user_id = v.user_id
             AND p.event_type = 'purchase' AND p.value >= 80
             AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL '12 hours'
WHERE v.event_type = 'view' AND v.value < 20
""",
)
def q_cep_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP row-level conditions (Flink ``Pattern.where(
    SimpleCondition)``): a low-engagement view (value < 20) followed
    within 12 hours by a HIGH-value purchase (value >= 80) — the
    predicate-carrying pattern every porting Flink user writes. Each
    ``where()`` ANDs into its step's type filter inside
    operators.cep's single predicate chokepoint, so the condition is
    compiled JVM-side and pushed into the step's scan like any
    filter; conditions restrict step BINDING only (a where-excluded
    event still breaks next_step contiguity, Flink's any-event
    rule)."""
    from flink_framework_spark.functions.helpers import round_duck
    from flink_framework_spark.operators.pattern import Pattern

    ev = table(spark, sf_dir, "events")
    p = (
        Pattern.begin("view")
        .where("value < 20")
        .followed_by("purchase")
        .where("value >= 80")
        .within("12 HOURS")
    )
    m = p.match(ev)
    val = ev.select(
        F.col("event_id").alias("id_1"), F.col("value").alias("__pv")
    )
    return (
        m.join(val, "id_1")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.countDistinct("user_id").alias("n_users"),
            round_duck(F.sum("__pv"), 2).alias("sum_purchase"),
        )
    )


@register(
    "q_cep_combinations",
    family="I",
    oracle="""
WITH RECURSIVE steps AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
combos AS (
  SELECT user_id, ts AS ts_first, event_id AS id_first,
         ts AS ts_last, event_id AS id_last, 1 AS n
  FROM steps
  UNION ALL
  SELECT c.user_id, c.ts_first, c.id_first, s.ts, s.event_id, c.n + 1
  FROM combos c JOIN steps s ON s.user_id = c.user_id
    AND (s.ts > c.ts_last
         OR (s.ts = c.ts_last AND s.event_id > c.id_last))
    AND s.ts <= c.ts_first + INTERVAL '24 hours')
SELECT CAST(n AS INT) AS n_reps,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       COUNT(DISTINCT user_id) AS n_users
FROM combos c
WHERE EXISTS (
  SELECT 1 FROM events p
  WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
    AND p.ts > c.ts_last AND p.ts <= c.ts_first + INTERVAL '24 hours')
GROUP BY n
""",
)
def q_cep_combinations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP ``allowCombinations()`` (Flink non-deterministic relaxed
    contiguity): click subsequences — EVERY ordered subset of a
    user's clicks inside the 24-hour anchor window, not just
    consecutive runs — followed by a purchase, counted per
    repetition depth. Built by the Pattern builder's
    ``one_or_more().allow_combinations()``, which lowers to
    :func:`operators.cep.match_combinations`: level-synchronous
    keyed-join expansion (level k+1 = level k extended by one
    strictly-later click), all JVM, linear in the (intrinsically
    exponential-in-burst) match count. The oracle enumerates the
    same combinations with a recursive CTE — live independent truth,
    not a golden pin."""
    from flink_framework_spark.operators.pattern import Pattern

    ev = table(spark, sf_dir, "events")
    p = (
        Pattern.begin("click")
        .one_or_more()
        .allow_combinations()
        .followed_by("purchase")
        .within("24 HOURS")
    )
    return p.match(ev).groupBy("n_reps").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_cep_subtype",
    family="I",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_matches,
       COUNT(DISTINCT i.user_id) AS n_users
FROM events i
JOIN events c ON c.user_id = i.user_id
             AND c.event_type IN ('purchase', 'signup')
             AND c.ts > i.ts AND c.ts <= i.ts + INTERVAL '30 minutes'
WHERE i.event_type IN ('click', 'view')
""",
)
def q_cep_subtype(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP type hierarchy (Flink ``Pattern.subtype(SubEvent.class)``):
    any INTERACTION (view | click) followed by any CONVERSION
    (purchase | signup) within 30 minutes. The Pattern builder's
    ``with_hierarchy`` + ``subtype`` desugar abstract event types to
    ``event_type IN (...)`` per step — the flat-schema spelling of
    Flink's class-hierarchy narrowing (the reference's subjects are
    case classes, so a parent type IS the set of its concrete record
    types). The hierarchy is nested ('activity' -> 'interaction' |
    'conversion') and the first step is built by NARROWING 'activity'
    with subtype('interaction'), exercising the resolution path."""
    from flink_framework_spark.operators.pattern import Pattern

    ev = table(spark, sf_dir, "events")
    p = (
        Pattern.begin("activity")
        .with_hierarchy(
            {
                "interaction": ["view", "click"],
                "conversion": ["purchase", "signup"],
                "activity": ["interaction", "conversion"],
            }
        )
        .subtype("interaction")
        .followed_by("conversion")
        .within("30 MINUTES")
    )
    return p.match(ev).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "q_cep_skip_next",
    family="I",
    oracle="""
WITH a AS (
  SELECT user_id, ts,
         LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS f2,
         LAG(ts, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS f3
  FROM events WHERE event_type = 'click'),
cand AS (
  SELECT user_id, 2 AS n_reps, f2 AS ts_first, ts AS ts_last FROM a
  WHERE f2 IS NOT NULL AND ts <= f2 + INTERVAL '12 hours'
  UNION ALL
  SELECT user_id, 3, f3, ts FROM a
  WHERE f3 IS NOT NULL AND ts <= f3 + INTERVAL '12 hours'),
m AS (
  SELECT * FROM cand
  WHERE EXISTS (
    SELECT 1 FROM events p
    WHERE p.user_id = cand.user_id AND p.event_type = 'purchase'
      AND p.ts > cand.ts_last AND p.ts <= cand.ts_first + INTERVAL '12 hours')),
sel AS (
  SELECT user_id, n_reps, ts_first, ts_last FROM (
    SELECT m.*, ROW_NUMBER() OVER (PARTITION BY user_id, ts_first
                                   ORDER BY ts_last, n_reps) AS rn
    FROM m)
  WHERE rn = 1)
SELECT user_id, CAST(n_reps AS BIGINT) AS n_reps,
       strftime(ts_first, '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
       strftime(ts_last, '%Y-%m-%d %H:%M:%S.%f') AS last_ts
FROM sel
""",
)
def q_cep_skip_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP after-match skip strategy (Flink SKIP_TO_NEXT): the
    q_cep_times match stream pruned to one match per start event —
    per (user, first repetition) only the earliest-ending match
    survives (a 3-rep burst emits its 2-rep prefix, not both). Spark
    side is the pure-window operators.cep.skip_to_next; contrast with
    q_cep_skip's SKIP_PAST_LAST_EVENT which also prunes across
    bursts."""
    from flink_framework_spark.operators.cep import match_times, skip_to_next

    ev = table(spark, sf_dir, "events")
    m = match_times(ev, "click", "purchase", 2, 3, "12 HOURS")
    sel = skip_to_next(m)
    return sel.select(
        "user_id",
        "n_reps",
        F.date_format("ts_first", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "first_ts"
        ),
        F.date_format("ts_last", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "last_ts"
        ),
    )


@register(
    "q_stream_cumulate",
    family="I",
    oracle="""
SELECT strftime(e.bstart, '%Y-%m-%d %H:%M:%S') AS wstart,
       strftime(e.bstart + to_minutes(15 * CAST(k.range AS INT)),
                '%Y-%m-%d %H:%M:%S') AS wend,
       COUNT(*) AS n, ROUND(SUM(e.value), 2) AS sumv
FROM (SELECT time_bucket(INTERVAL '1 hour', ts) AS bstart, ts, value
      FROM events) e, range(1, 5) k
WHERE e.ts < e.bstart + to_minutes(15 * CAST(k.range AS INT))
GROUP BY 1, 2
""",
)
def q_stream_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink CUMULATE window TVF (FLIP-145), batch-checkable form:
    1-hour big windows with 15-minute cumulative firing — each hour
    emits four rows, the running "hour so far" at :15/:30/:45/:00.
    The assignment is tumble + bounded sequence/explode (all
    built-ins, operators.streaming_ops.cumulate_exploded); the
    streaming twin runs the identical expression, plus an append-mode
    variant watermarked on the sub-window END boundary — the Flink
    firing semantics (each cumulative pane finalizes when the
    watermark passes its end)."""
    from flink_framework_spark.operators.streaming_ops import cumulate_counts

    return cumulate_counts(table(spark, sf_dir, "events"))


@register(
    "q_trigger_count",
    family="I",
    oracle="""
WITH w AS (
  SELECT event_type,
         time_bucket(INTERVAL '1 day', ts) AS w_start, ts, event_id,
         value,
         ROW_NUMBER() OVER ord AS rn,
         COUNT(*) OVER (ord ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS n_all,
         ROUND(SUM(value) OVER (ord ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW), 2) AS s_all,
         COUNT(*) OVER (ord ROWS BETWEEN 4 PRECEDING
                        AND CURRENT ROW) AS n_last5,
         ROUND(SUM(value) OVER (ord ROWS BETWEEN 4 PRECEDING
                                AND CURRENT ROW), 2) AS s_last5
  FROM events
  WINDOW ord AS (PARTITION BY event_type,
                              time_bucket(INTERVAL '1 day', ts)
                 ORDER BY ts, event_id))
SELECT 'all' AS part, event_type,
       strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
       CAST(rn / 10 AS INT) AS firing_seq,
       CAST(n_all AS BIGINT) AS n_elems, s_all AS sum_v
FROM w WHERE rn % 10 = 0
UNION ALL
SELECT 'last5', event_type, strftime(w_start, '%Y-%m-%d %H:%M:%S'),
       CAST(rn / 10 AS INT), CAST(n_last5 AS BIGINT), s_last5
FROM w WHERE rn % 10 = 0
""",
)
def q_trigger_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink ``CountTrigger(10)`` on 1-day tumbling event-time
    windows keyed by event type, melted with its ``CountEvictor(5)``
    variant: a firing at every 10th element (per-key-per-window
    event-time order — the deterministic realization of Flink's
    arrival-count trigger), aggregating the whole buffer ('all') or
    only the last 5 surviving eviction ('last5'). Built by
    operators.triggers.fire_on_count — one keyed sort + running/frame
    aggregates in whole-stage codegen, no firing never happens at
    the watermark (pure CountTrigger, the sub-10 tail is discarded
    like Flink's window GC)."""
    from flink_framework_spark.functions.helpers import round_duck
    from flink_framework_spark.operators.triggers import fire_on_count

    ev = table(spark, sf_dir, "events")

    def part(tag, kw):
        return fire_on_count(ev, 10, **kw).select(
            F.lit(tag).alias("part"),
            "event_type",
            F.date_format("w_start", "yyyy-MM-dd HH:mm:ss").alias(
                "w_start"
            ),
            "firing_seq",
            "n_elems",
            round_duck("sum_v", 2).alias("sum_v"),
        )

    return part("all", {}).unionByName(part("last5", {"evict_last": 5}))


@register(
    "q_trigger_early",
    family="I",
    oracle="""
WITH e AS (
  SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS w_start,
         ts, value
  FROM events),
f AS (
  SELECT event_type, w_start,
         w_start + INTERVAL 1 DAY AS w_end, MIN(ts) AS first_ts
  FROM e GROUP BY 1, 2),
b AS (
  SELECT event_type, w_start, w_end,
         UNNEST(generate_series(
           LEAST(w_start + INTERVAL 6 HOUR *
             (CAST(FLOOR(epoch(first_ts - w_start) / 21600) AS INT) + 1),
             w_end),
           w_end, INTERVAL 6 HOUR)) AS fire_at
  FROM f),
bounds AS (
  SELECT event_type, w_start, fire_at,
         CASE WHEN fire_at < w_end THEN 'early' ELSE 'final' END
           AS firing
  FROM b WHERE fire_at < w_end
  UNION ALL
  SELECT event_type, w_start, w_end, 'final' FROM f)
SELECT 'cum' AS part, b.event_type,
       strftime(b.w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
       strftime(b.fire_at, '%Y-%m-%d %H:%M:%S') AS fire_at,
       b.firing, CAST(COUNT(*) AS BIGINT) AS n_elems,
       ROUND(SUM(e.value), 2) AS sum_v
FROM bounds b JOIN e ON e.event_type = b.event_type
 AND e.w_start = b.w_start AND e.ts <= b.fire_at
GROUP BY 2, 3, 4, 5
UNION ALL
SELECT 'keep3h', b.event_type,
       strftime(b.w_start, '%Y-%m-%d %H:%M:%S'),
       strftime(b.fire_at, '%Y-%m-%d %H:%M:%S'),
       b.firing, CAST(COUNT(*) AS BIGINT),
       ROUND(SUM(e.value), 2)
FROM bounds b JOIN e ON e.event_type = b.event_type
 AND e.w_start = b.w_start AND e.ts <= b.fire_at
 AND e.ts > b.fire_at - INTERVAL 3 HOUR
GROUP BY 2, 3, 4, 5
""",
)
def q_trigger_early(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink ``ContinuousEventTimeTrigger(6h)`` on 1-day tumbling
    windows keyed by event type, melted with its ``TimeEvictor(3h)``
    variant: early firings at every 6-hour boundary strictly after
    the window's first element (Flink's ceil-aligned timer chain)
    plus the final firing at the window end; each firing aggregates
    elements with ts <= boundary ('cum'), or only the trailing 3
    hours of buffer under eviction ('keep3h'). Built by
    operators.triggers.fire_continuous — boundaries via
    explode(sequence()) per (key, window), one keyed range join back
    to the elements, timezone-independent naive-epoch arithmetic."""
    from flink_framework_spark.functions.helpers import round_duck
    from flink_framework_spark.operators.triggers import fire_continuous

    ev = table(spark, sf_dir, "events")

    def part(tag, kw):
        return fire_continuous(ev, "6 HOURS", "1 DAY", **kw).select(
            F.lit(tag).alias("part"),
            "event_type",
            F.date_format("w_start", "yyyy-MM-dd HH:mm:ss").alias(
                "w_start"
            ),
            F.date_format("fire_at", "yyyy-MM-dd HH:mm:ss").alias(
                "fire_at"
            ),
            "firing",
            "n_elems",
            round_duck("sum_v", 2).alias("sum_v"),
        )

    return part("cum", {}).unionByName(
        part("keep3h", {"evict_keep": "3 HOURS"})
    )


@register(
    "q_allowed_lateness",
    family="I",
    oracle="""
WITH ev AS (
  SELECT event_type, ts, value, event_id,
         ts + to_minutes(3 * CAST(event_id % 10 AS INT)) AS arrival
  FROM events),
o AS (
  SELECT *, time_bucket(INTERVAL '1 hour', ts) AS w_start,
         time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS w_end,
         MAX(ts) OVER (ORDER BY arrival, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING)
           - INTERVAL 5 MINUTE AS wm,
         (SELECT MAX(ts) FROM ev) - INTERVAL 5 MINUTE AS final_wm
  FROM ev),
c AS (
  SELECT *, CASE
      WHEN wm IS NULL OR wm < w_end THEN 'on_time'
      WHEN wm < w_end + INTERVAL 10 MINUTE THEN 'late'
      ELSE 'dropped' END AS cls
  FROM o),
ot AS (
  SELECT event_type, w_start, CAST(COUNT(*) AS BIGINT) AS n_on,
         SUM(value) AS s_on, ANY_VALUE(final_wm >= w_end) AS fired
  FROM c WHERE cls = 'on_time'
  GROUP BY 1, 2),
lt AS (
  SELECT event_type, w_start,
         ROW_NUMBER() OVER pk AS fire_seq,
         SUM(value) OVER (pk ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cs
  FROM c WHERE cls = 'late'
  WINDOW pk AS (PARTITION BY event_type, w_start
                ORDER BY arrival, event_id))
SELECT event_type, strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start,
       'on_time' AS firing, CAST(0 AS BIGINT) AS fire_seq,
       n_on AS n_elems, ROUND(s_on, 2) AS sum_v
FROM ot WHERE fired
UNION ALL
SELECT lt.event_type, strftime(lt.w_start, '%Y-%m-%d %H:%M:%S'),
       'late', fire_seq,
       COALESCE(ot.n_on, 0) + fire_seq,
       ROUND(COALESCE(ot.s_on, 0) + cs, 2)
FROM lt LEFT JOIN ot
  ON ot.event_type = lt.event_type AND ot.w_start = lt.w_start
""",
)
def q_allowed_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink ``allowedLateness()`` window refinement (I4 tail): 1-hour
    tumbling windows keyed by event type under a 5-minute watermark
    and 10 minutes of allowed lateness, over the deterministic
    jittered arrival process q_stream_late pins. Each window fires
    'on_time' when the arrival watermark passes its end, then one
    CORRECTED 'late' firing per admitted late row (Flink's
    per-element refinement under the default EventTimeTrigger,
    ``isElementLate`` window-based admission); rows past the horizon
    are dropped. Built by operators.triggers.fire_allowed_lateness —
    one global arrival-watermark window (a watermark IS one global
    monotone bound), then keyed aggregates/cumsums only; streaming
    twin: streaming.triggers.allowed_lateness_stream (shifted-
    watermark state machine, drain-equality pinned in
    tests/test_streaming_triggers.py)."""
    from flink_framework_spark.functions.helpers import round_duck
    from flink_framework_spark.operators.triggers import (
        fire_allowed_lateness,
    )

    ev = table(spark, sf_dir, "events").withColumn(
        "arrival",
        F.col("ts")
        + F.expr("make_dt_interval(0, 0, CAST(3*(event_id % 10) AS INT), 0)"),
    )
    out = fire_allowed_lateness(
        ev, window="1 hour", delay="5 minutes", lateness="10 minutes"
    )
    return out.select(
        "event_type",
        F.date_format("w_start", "yyyy-MM-dd HH:mm:ss").alias("w_start"),
        "firing",
        "fire_seq",
        "n_elems",
        round_duck("sum_v", 2).alias("sum_v"),
    )


@register(
    "q_window_join",
    family="I",
    oracle="""
WITH c AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS w, user_id
           FROM events WHERE event_type = 'click'),
p AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS w, user_id
      FROM events WHERE event_type = 'purchase')
SELECT 'inner' AS part, strftime(c.w, '%Y-%m-%d %H:%M:%S') AS wstart,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       COUNT(DISTINCT c.user_id) AS n_users
FROM c JOIN p ON p.w = c.w AND p.user_id = c.user_id
GROUP BY 1, 2
UNION ALL
SELECT 'left_unmatched', strftime(c.w, '%Y-%m-%d %H:%M:%S'),
       CAST(COUNT(*) AS BIGINT), COUNT(DISTINCT c.user_id)
FROM c
WHERE NOT EXISTS (
  SELECT 1 FROM p WHERE p.w = c.w AND p.user_id = c.user_id)
GROUP BY 1, 2
""",
)
def q_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink window-join TVF (FLIP-145): clicks joined to purchases
    by the SAME 1-hour tumbling window and user — the aligned-window
    alternative to the interval join (state per window is dropped
    when the watermark passes its end, so it survives high-fanout
    keys). Two parts: per-window click-purchase pair counts (inner)
    and clicks with no same-window purchase (the left-outer
    complement). Spark side is operators.streaming_ops.window_join —
    a pure (window, key) equi-join, batch or watermarked
    stream-stream."""
    from flink_framework_spark.operators.streaming_ops import window_join

    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    j = window_join(clicks, purchases, "1 hour", ("user_id",), "left")
    tag = F.when(F.col("r_user_id").isNotNull(), "inner").otherwise(
        "left_unmatched"
    )
    return (
        j.groupBy(tag.alias("part"), F.col("w.start").alias("ws"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("l_user_id").alias("n_users"),
        )
        .select(
            "part",
            F.date_format("ws", "yyyy-MM-dd HH:mm:ss").alias("wstart"),
            "n_pairs",
            "n_users",
        )
    )


@register(
    "q_stream_over",
    family="I",
    oracle="""
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ets,
       event_id,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS run_n,
       ROUND(SUM(value) OVER w, 2) AS run_sum
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def q_stream_over(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time OVER aggregation (Flink SQL ``SUM(value) OVER
    (PARTITION BY key ORDER BY rowtime ROWS UNBOUNDED PRECEDING)``),
    batch-checkable form: per-key running count + value sum in
    (ts, event_id) order — the complete total order both engines and
    the streaming twin share (a running float sum is only
    deterministic under a total order; event_id breaks ts ties). The
    true streaming form is streaming.stateful.over_window_running:
    per-row watermark-ordered emission with an event-time re-fire
    timer, equivalence-tested incl. a cross-batch late row slotting
    into its ordinal position."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ets"),
        "event_id",
        F.row_number().over(w).cast("long").alias("run_n"),
        round_duck(F.sum("value").over(w), 2).alias("run_sum"),
    )


@register(
    "q_stream_session_dynamic",
    family="I",
    oracle="""
WITH g AS (
  SELECT user_id, ts, event_id, value,
         ts + CASE WHEN event_type = 'purchase'
                   THEN INTERVAL 10 MINUTE
                   ELSE INTERVAL 30 MINUTE END AS iend
  FROM events),
m AS (
  SELECT *,
         MAX(iend) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS pmax
  FROM g),
s AS (
  SELECT *,
         SUM(CASE WHEN pmax IS NULL OR ts >= pmax THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM m)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS ws,
       strftime(MAX(iend), '%Y-%m-%d %H:%M:%S') AS we,
       COUNT(*) AS n_ev, ROUND(SUM(value), 2) AS sumv
FROM s GROUP BY user_id, sid
""",
)
def q_stream_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic per-event session gap (Flink
    SessionWindowTimeGapExtractor): purchases extend their session by
    only 10 minutes, other events by 30 — per-event intervals
    [ts, ts+gap) merged by union, window end = MAX interval end. One
    JVM-side keyed aggregation (operators.streaming_ops.
    dynamic_session_windows); the oracle re-derives the merge with a
    running-MAX-over-preceding-interval-ends gaps-and-islands."""
    from flink_framework_spark.operators.streaming_ops import (
        dynamic_session_windows,
    )

    return dynamic_session_windows(table(spark, sf_dir, "events"))
