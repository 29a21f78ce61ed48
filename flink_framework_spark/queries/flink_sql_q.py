"""Flink SQL statement-dialect queries (SURVEY.md §2 I1-I3/I8, the
SQL spellings a Flink SQL user runs verbatim).

Each query here is a FULL Flink SQL statement — FLIP-145 window TVFs
in FROM, or MATCH_RECOGNIZE attached to a table — executed through
:func:`flink_framework_spark.sql.flink_sql`, which rewrites those
constructs onto the engine's operators and hands the rest to Spark
SQL. The point under test is the statement path itself: the same
semantics are already attested operator-level (q_stream_window_suite,
q_mr_*); these prove the dialect shim produces identical relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_framework_spark.io import table
from flink_framework_spark.registry import register
from flink_framework_spark.sql import flink_sql

_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def _events(spark: SparkSession, sf_dir: str) -> dict:
    return {"events": table(spark, sf_dir, "events")}


@register(
    "q_fsql_tumble",
    family="I",
    oracle="""
SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                '%Y-%m-%d %H:%M:%S') AS wstart,
       event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sumv
FROM events GROUP BY 1, 2
""",
)
def q_fsql_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLIP-145 ``TUMBLE`` TVF as a statement: the window assignment
    rewrites to ``F.window``; the GROUP BY/aggregate text runs
    through Catalyst untouched."""
    return flink_sql(spark, """
        SELECT DATE_FORMAT(window_start, 'yyyy-MM-dd HH:mm:ss') AS wstart,
               event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sumv
        FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window_start, event_type
    """, tables=_events(spark, sf_dir))


@register(
    "q_fsql_hop",
    family="I",
    oracle="""
SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
                - to_minutes(15 * CAST(r.range AS INT)),
                '%Y-%m-%d %H:%M:%S') AS wstart,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS sumv
FROM events, range(4) r
GROUP BY 1
""",
)
def q_fsql_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLIP-145 ``HOP`` TVF (1 h size, 15 min slide): every event in
    four windows; oracle re-derives the assignment with an explicit
    range join."""
    return flink_sql(spark, """
        SELECT DATE_FORMAT(window_start, 'yyyy-MM-dd HH:mm:ss') AS wstart,
               COUNT(*) AS n, ROUND(SUM(value), 2) AS sumv
        FROM TABLE(HOP(TABLE events, DESCRIPTOR(ts),
                       INTERVAL '15' MINUTE, INTERVAL '1' HOUR))
        GROUP BY window_start
    """, tables=_events(spark, sf_dir))


@register(
    "q_fsql_cumulate",
    family="I",
    oracle="""
SELECT strftime(e.bstart, '%Y-%m-%d %H:%M:%S') AS ws,
       strftime(e.bstart + to_minutes(15 * CAST(k.range AS INT)),
                '%Y-%m-%d %H:%M:%S') AS we,
       COUNT(*) AS n, ROUND(SUM(e.value), 2) AS sumv
FROM (SELECT time_bucket(INTERVAL '1 hour', ts) AS bstart, ts, value
      FROM events) e, range(1, 5) k
WHERE e.ts < e.bstart + to_minutes(15 * CAST(k.range AS INT))
GROUP BY 1, 2
""",
)
def q_fsql_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLIP-145 ``CUMULATE`` TVF as a statement (1 h size, 15 min
    step): rewrites to the bounded-explode assignment
    (operators.streaming_ops.cumulate_exploded)."""
    return flink_sql(spark, """
        SELECT DATE_FORMAT(window_start, 'yyyy-MM-dd HH:mm:ss') AS ws,
               DATE_FORMAT(window_end, 'yyyy-MM-dd HH:mm:ss') AS we,
               COUNT(*) AS n, ROUND(SUM(value), 2) AS sumv
        FROM TABLE(CUMULATE(TABLE events, DESCRIPTOR(ts),
                            INTERVAL '15' MINUTE, INTERVAL '1' HOUR))
        GROUP BY window_start, window_end
    """, tables=_events(spark, sf_dir))


@register(
    "q_fsql_session",
    family="I",
    oracle=f"""
WITH m AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM m)
SELECT user_id, strftime(MIN(ts), '{_TS_FMT_DUCK}') AS ws,
       strftime(MAX(ts) + INTERVAL '30 minutes', '{_TS_FMT_DUCK}') AS we,
       COUNT(*) AS n
FROM s GROUP BY user_id, sid
""",
)
def q_fsql_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLIP-145 ``SESSION`` TVF with ``PARTITION BY`` inside the TVF
    call (30 min gap): rewrites to the gaps-and-islands assignment;
    window_end = last row + gap, exactly the merged bounds Spark's
    session_window and Flink's TVF produce."""
    return flink_sql(spark, """
        SELECT user_id,
               DATE_FORMAT(window_start, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ws,
               DATE_FORMAT(window_end, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS we,
               COUNT(*) AS n
        FROM TABLE(SESSION(TABLE events PARTITION BY user_id,
                           DESCRIPTOR(ts), INTERVAL '30' MINUTE))
        GROUP BY user_id, window_start, window_end
    """, tables=_events(spark, sf_dir))


@register(
    "q_fsql_mr",
    family="I",
    oracle="""
WITH o0 AS (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events),
o AS (
  SELECT *,
         min(CASE WHEN event_type = 'error' THEN rn END)
           OVER (PARTITION BY user_id ORDER BY rn
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
           AS next_err
  FROM o0),
s AS (SELECT user_id, event_id AS first_id, ts AS s_ts, rn AS srn,
             next_err
      FROM o WHERE event_type = 'signup'),
cand AS (
  SELECT s.user_id, s.first_id, s.srn,
         o.event_id AS last_id, o.rn AS prn
  FROM s JOIN o ON o.user_id = s.user_id AND o.rn > s.srn
   AND o.event_type = 'purchase'
   AND o.ts <= s.s_ts + INTERVAL 1 DAY
   AND (s.next_err IS NULL OR o.rn < s.next_err)),
best AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, srn
                               ORDER BY prn DESC) AS rk
  FROM cand)
SELECT user_id, first_id, last_id,
       CAST(prn - srn + 1 AS BIGINT) AS n_rows
FROM best WHERE rk = 1
""",
)
def q_fsql_mr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE embedded in a statement's FROM clause: the
    clause compiles through the same parser/NFA as the operator form
    (q_mr_funnel with a 1-day window), and the outer SELECT runs on
    the match relation as ordinary Spark SQL."""
    return flink_sql(spark, """
        SELECT user_id, first_id, last_id, n_rows
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          MEASURES S.event_id AS first_id, P.event_id AS last_id,
                   COUNT(*) AS n_rows
          ONE ROW PER MATCH
          AFTER MATCH SKIP TO NEXT ROW
          PATTERN (S F* P)
          WITHIN INTERVAL '1' DAY
          DEFINE S AS S.event_type = 'signup',
                 F AS F.event_type <> 'error',
                 P AS P.event_type = 'purchase'
        )
    """, tables=_events(spark, sf_dir))


# the SCD2 versions CTE is shared with the operator-form queries —
# one definition, no drift (queries/scd_q.py)
from flink_framework_spark.queries.scd_q import _VERSIONS_SQL as _VERSIONS_ORACLE


@register(
    "q_fsql_temporal",
    family="C",
    oracle=f"""
WITH {_VERSIONS_ORACLE},
cl2 AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT c.event_id, c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       v.tier, v.version
FROM cl2 c ASOF JOIN v
  ON c.user_id = v.user_id AND c.ts >= v.valid_from
""",
)
def q_fsql_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink temporal (versioned-table) join as a statement:
    ``JOIN tier_dim FOR SYSTEM_TIME AS OF c.ts`` against the SCD2
    user-tier dimension (operators.scd.scd2_build) rewrites to the
    point-in-time containment predicate — same semantics as
    q_temporal_join's operator form (and DuckDB's ASOF JOIN oracle),
    now in the syntax a Flink SQL user writes."""
    from pyspark.sql import functions as F

    from flink_framework_spark.queries.scd_q import tier_versions

    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return flink_sql(spark, """
        SELECT c.event_id, c.user_id,
               DATE_FORMAT(c.ts, 'yyyy-MM-dd HH:mm:ss') AS ts,
               d.tier, d.version
        FROM fsql_clicks c
        JOIN fsql_tier_dim FOR SYSTEM_TIME AS OF c.ts AS d
          ON c.user_id = d.user_id
    """, tables={
        "fsql_clicks": clicks,
        "fsql_tier_dim": tier_versions(spark, sf_dir),
    })
