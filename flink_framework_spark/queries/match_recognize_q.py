"""MATCH_RECOGNIZE queries — the Flink SQL spelling of CEP
(SURVEY.md §2 I8 [F]) over the events table.

Each query is one ``MATCH_RECOGNIZE`` clause run through
:func:`operators.match_recognize.match_recognize` (JVM-side DEFINE
flags + per-key Arrow NFA), oracle-checked against a declarative
DuckDB spelling of the same semantics: strict contiguity via
``lead()`` over the per-key total order, greedy filler binding via
farthest-qualifying-row selection, and greedy quantifier runs via
gaps-and-islands. The (ts, event_id) total order is shared by the
matcher, the oracle, and the measures, so results are exact."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_framework_spark.functions.helpers import round_duck
from flink_framework_spark.io import table
from flink_framework_spark.operators.match_recognize import match_recognize
from flink_framework_spark.registry import register

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"

# Shared clause constants + raw match frames: the granular queries
# below format these for their oracles, and the q_cep_suite melt
# reads the SAME frames off its one shared events scan (re-tabling
# events and rebuilding DEFINE flags four times was the melt's
# round-5 driver-side constant).

_STRICT_PAIR_CLAUSE = """
    PARTITION BY user_id ORDER BY ts
    MEASURES A.event_id AS a_id, A.ts AS a_ts,
             B.event_id AS b_id, B.ts AS b_ts
    ONE ROW PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (A B)
    DEFINE A AS A.event_type = 'view',
           B AS B.event_type = 'purchase'"""

_FUNNEL_CLAUSE = """
    PARTITION BY user_id ORDER BY ts
    MEASURES S.event_id AS s_id, S.ts AS s_ts,
             P.event_id AS p_id, P.ts AS p_ts,
             COUNT(F.*) AS n_f, MATCH_NUMBER() AS mno
    ONE ROW PER MATCH
    AFTER MATCH SKIP TO NEXT ROW
    PATTERN (S F* P)
    WITHIN INTERVAL '3' DAY
    DEFINE S AS S.event_type = 'signup',
           F AS F.event_type <> 'error',
           P AS P.event_type = 'purchase'"""

_RUNS_CLAUSE = """
    PARTITION BY user_id ORDER BY ts
    MEASURES FIRST(A.ts) AS a_first, LAST(A.ts) AS a_last,
             COUNT(A.*) AS n_a, SUM(A.value) AS a_sum,
             FIRST(A.value, 1) AS a_v2,
             B.event_id AS b_id
    ONE ROW PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (A{2,} B)
    WITHIN INTERVAL '30' DAY
    DEFINE A AS A.event_type = 'click',
           B AS B.event_type = 'purchase'"""

_ALL_ROWS_CLAUSE = """
    PARTITION BY user_id ORDER BY ts
    MEASURES CLASSIFIER() AS cls, MATCH_NUMBER() AS mno,
             COUNT(A.*) AS n_a, SUM(A.value) AS a_sum,
             FINAL COUNT(A.*) AS n_a_f, FINAL SUM(A.value) AS a_sum_f,
             FINAL CLASSIFIER() AS cls_f
    ALL ROWS PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (A{2,} B)
    WITHIN INTERVAL '30' DAY
    DEFINE A AS A.event_type = 'click',
           B AS B.event_type = 'purchase'"""


_RELUCTANT_CLAUSE = """
    PARTITION BY user_id ORDER BY ts
    MEASURES S.event_id AS s_id, P.event_id AS p_id,
             COUNT(N.*) AS n_n, MATCH_NUMBER() AS mno
    ONE ROW PER MATCH
    AFTER MATCH SKIP TO NEXT ROW
    PATTERN (S N+? P)
    WITHIN INTERVAL '3' DAY
    DEFINE S AS S.event_type = 'signup',
           N AS N.event_type <> 'error',
           P AS P.event_type = 'purchase'"""

_SKIP_TO_CLAUSE = """
    PARTITION BY user_id ORDER BY ts
    MEASURES X.event_id AS x_id, Z.event_id AS z_id,
             MATCH_NUMBER() AS mno
    ONE ROW PER MATCH
    AFTER MATCH SKIP TO LAST Z
    PATTERN (X Y Z)
    DEFINE X AS X.event_type = 'click',
           Y AS Y.event_type = 'click',
           Z AS Z.event_type = 'click'"""


def mr_strict_pair_frame(ev: DataFrame) -> DataFrame:
    return match_recognize(ev, _STRICT_PAIR_CLAUSE)


def mr_reluctant_frame(ev: DataFrame) -> DataFrame:
    return match_recognize(ev, _RELUCTANT_CLAUSE)


def mr_skip_to_frame(ev: DataFrame) -> DataFrame:
    return match_recognize(ev, _SKIP_TO_CLAUSE)


def mr_funnel_frame(ev: DataFrame) -> DataFrame:
    return match_recognize(ev, _FUNNEL_CLAUSE)


def mr_runs_frame(ev: DataFrame) -> DataFrame:
    return match_recognize(ev, _RUNS_CLAUSE)


def mr_all_rows_frame(ev: DataFrame) -> DataFrame:
    return match_recognize(ev, _ALL_ROWS_CLAUSE)


_AGG_DEFINE_CLAUSE = """
    PARTITION BY user_id ORDER BY ts
    MEASURES FIRST(Q.event_id) AS q1_id, COUNT(Q.*) AS n_q,
             SUM(Q.value) AS q_sum, P.event_id AS p_id
    ONE ROW PER MATCH
    AFTER MATCH SKIP TO NEXT ROW
    PATTERN (Q+ P)
    WITHIN INTERVAL '1' DAY
    DEFINE Q AS Q.event_type <> 'error' AND SUM(Q.value) <= 60.005,
           P AS P.event_type = 'purchase'"""

_DEFINE_NAV_CLAUSE = """
    PARTITION BY user_id ORDER BY ts
    MEASURES FIRST(DOWN.value) AS top_v, LAST(DOWN.value) AS bot_v,
             COUNT(DOWN.*) AS n, FIRST(DOWN.event_id) AS a_id,
             MATCH_NUMBER() AS mno
    ONE ROW PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (DOWN+)
    DEFINE DOWN AS LAST(DOWN.value, 1) IS NULL
                   OR DOWN.value < LAST(DOWN.value, 1)"""


def mr_agg_define_frame(ev: DataFrame) -> DataFrame:
    return match_recognize(ev, _AGG_DEFINE_CLAUSE)


def mr_define_nav_frame(ev: DataFrame) -> DataFrame:
    return match_recognize(ev, _DEFINE_NAV_CLAUSE)


@register(
    "q_mr_strict_pair",
    family="I",
    oracle=f"""
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         lead(event_type) OVER w AS nt,
         lead(event_id) OVER w AS nid,
         lead(ts) OVER w AS nts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, event_id AS a_id,
       strftime(ts, '{_TS_FMT_DUCK}') AS a_ts,
       nid AS b_id, strftime(nts, '{_TS_FMT_DUCK}') AS b_ts
FROM o WHERE event_type = 'view' AND nt = 'purchase'
""",
)
def q_mr_strict_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``PATTERN (A B)`` with no filler: SQL-standard STRICT
    contiguity — B is the row immediately after A in the ordered
    partition (the semantics that distinguish MATCH_RECOGNIZE from
    the Pattern API's relaxed followedBy). Oracle: one ``lead()``
    over the same total order."""
    out = mr_strict_pair_frame(table(spark, sf_dir, "events"))
    return out.select(
        "user_id", "a_id",
        F.date_format("a_ts", _TS_FMT_SPARK).alias("a_ts"),
        "b_id",
        F.date_format("b_ts", _TS_FMT_SPARK).alias("b_ts"),
    )


@register(
    "q_mr_funnel",
    family="I",
    oracle=f"""
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
s AS (SELECT user_id, event_id AS s_id, ts AS s_ts, rn AS srn, next_err
      FROM o WHERE event_type = 'signup'),
cand AS (
  SELECT s.user_id, s.s_id, s.s_ts, s.srn,
         o.event_id AS p_id, o.ts AS p_ts, o.rn AS prn
  FROM s JOIN o ON o.user_id = s.user_id AND o.rn > s.srn
   AND o.event_type = 'purchase'
   AND o.ts <= s.s_ts + INTERVAL 3 DAY
   AND (s.next_err IS NULL OR o.rn < s.next_err)),
best AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, srn
                               ORDER BY prn DESC) AS rk
  FROM cand)
SELECT user_id, s_id, strftime(s_ts, '{_TS_FMT_DUCK}') AS s_ts,
       p_id, strftime(p_ts, '{_TS_FMT_DUCK}') AS p_ts,
       CAST(prn - srn - 1 AS BIGINT) AS n_f,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY srn)
            AS BIGINT) AS mno
FROM best WHERE rk = 1
""",
)
def q_mr_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``PATTERN (S F* P)`` with a defined filler: relaxed funnel,
    greedy F* binds P to the FARTHEST purchase within 3 days of the
    signup with no error row between (F consumes only non-error
    rows). ``SKIP TO NEXT ROW`` gives each signup its own match, so
    MATCH_NUMBER() is the per-user matched-signup ordinal — both
    facts the declarative oracle re-derives with window functions
    (farthest = row_number DESC = 1 over candidate purchases)."""
    out = mr_funnel_frame(table(spark, sf_dir, "events"))
    return out.select(
        "user_id", "s_id",
        F.date_format("s_ts", _TS_FMT_SPARK).alias("s_ts"),
        "p_id",
        F.date_format("p_ts", _TS_FMT_SPARK).alias("p_ts"),
        "n_f", "mno",
    )


@register(
    "q_mr_runs",
    family="I",
    oracle=f"""
WITH o AS (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events),
c AS (
  SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn)
            AS isl
  FROM o WHERE event_type = 'click'),
runs AS (
  SELECT user_id, isl, count(*) AS n_a, min(ts) AS a_first,
         max(ts) AS a_last, min(rn) AS start_rn, max(rn) AS end_rn,
         sum(value) AS a_sum
  FROM c GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT r.user_id,
       strftime(a_first, '{_TS_FMT_DUCK}') AS a_first_ts,
       strftime(a_last, '{_TS_FMT_DUCK}') AS a_last_ts,
       CAST(n_a AS BIGINT) AS n_a, ROUND(a_sum, 2) AS a_sum,
       c2.value AS a_v2,
       o.event_id AS b_id
FROM runs r
JOIN o ON o.user_id = r.user_id AND o.rn = r.end_rn + 1
      AND o.event_type = 'purchase'
JOIN c c2 ON c2.user_id = r.user_id AND c2.rn = r.start_rn + 1
""",
)
def q_mr_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``PATTERN (A{2,} B)``: a maximal run of >= 2 consecutive click
    rows immediately followed by a purchase — greedy consumes the
    whole run (backtracking can't shorten it: the next row would then
    be a click, failing B), so matches are exactly the
    gaps-and-islands the oracle computes. Aggregated measures
    (COUNT/SUM/FIRST/LAST) exercise the quantified-variable measure
    path; ``FIRST(A.value, 1)`` (the run's SECOND click — the Flink
    logical-offset form) pins the offset-aware anchor-side lead
    against the oracle's start_rn + 1 join. WITHIN 30 days never
    binds (the corpus spans < 30 days); window truncation semantics
    are pinned on planted frames in tests/test_match_recognize.py."""
    out = mr_runs_frame(table(spark, sf_dir, "events"))
    return out.select(
        "user_id",
        F.date_format("a_first", _TS_FMT_SPARK).alias("a_first_ts"),
        F.date_format("a_last", _TS_FMT_SPARK).alias("a_last_ts"),
        "n_a",
        round_duck(F.col("a_sum"), 2).alias("a_sum"),
        "a_v2",
        "b_id",
    )


@register(
    "q_mr_all_rows",
    family="I",
    oracle=f"""
WITH o AS (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events),
c AS (
  SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn)
            AS isl
  FROM o WHERE event_type = 'click'),
runs AS (
  SELECT user_id, isl, count(*) AS n_a, min(rn) AS start_rn,
         max(rn) AS end_rn, sum(value) AS a_total
  FROM c GROUP BY 1, 2 HAVING count(*) >= 2),
mm AS (
  SELECT r.*, o.event_id AS b_id, o.ts AS b_ts,
         CAST(row_number() OVER (PARTITION BY r.user_id
                                 ORDER BY r.start_rn) AS BIGINT) AS mno
  FROM runs r
  JOIN o ON o.user_id = r.user_id AND o.rn = r.end_rn + 1
        AND o.event_type = 'purchase'),
arows AS (
  SELECT mm.user_id, strftime(c.ts, '{_TS_FMT_DUCK}') AS ts,
         c.event_id, 'A' AS cls, mm.mno,
         CAST(row_number() OVER (PARTITION BY mm.user_id, mm.isl
                                 ORDER BY c.rn) AS BIGINT) AS n_a,
         ROUND(SUM(c.value) OVER (PARTITION BY mm.user_id, mm.isl
                                  ORDER BY c.rn
                                  ROWS UNBOUNDED PRECEDING), 2) AS a_sum,
         CAST(mm.n_a AS BIGINT) AS n_a_f,
         ROUND(mm.a_total, 2) AS a_sum_f, 'B' AS cls_f
  FROM mm JOIN c ON c.user_id = mm.user_id AND c.isl = mm.isl),
brows AS (
  SELECT user_id, strftime(b_ts, '{_TS_FMT_DUCK}') AS ts, b_id, 'B',
         mno, CAST(n_a AS BIGINT), ROUND(a_total, 2),
         CAST(n_a AS BIGINT), ROUND(a_total, 2), 'B'
  FROM mm)
SELECT * FROM arows UNION ALL SELECT * FROM brows
""",
)
def q_mr_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ALL ROWS PER MATCH`` — the SQL-standard per-row emission
    (BEYOND the reference surface: Flink ships only ONE ROW PER
    MATCH): every matched row of ``PATTERN (A{2,} B)`` comes back
    with its CLASSIFIER, MATCH_NUMBER, RUNNING measures (count and
    sum over the match prefix up to the row), and FINAL measures
    (whole-match count/sum/classifier broadcast to every row — the
    SQL-standard RUNNING/FINAL keyword pair, accepted everywhere but
    only observable here). The declarative oracle re-derives the
    per-row view by joining each matched gaps-and-islands run back
    to its member rows with windowed running aggregates — exactly
    the "matched row joined back to its match_number" spelling; the
    FINAL columns are the island-level totals on every row."""
    out = mr_all_rows_frame(table(spark, sf_dir, "events"))
    return out.select(
        "user_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("ts"),
        "event_id",
        "cls",
        "mno",
        "n_a",
        round_duck(F.col("a_sum"), 2).alias("a_sum"),
        "n_a_f",
        round_duck(F.col("a_sum_f"), 2).alias("a_sum_f"),
        "cls_f",
    )


@register(
    "q_mr_subset",
    family="I",
    oracle="""
WITH o AS (
  SELECT user_id, event_id, ts, event_type, value,
         lead(event_type) OVER w AS nt1,
         lead(event_type, 2) OVER w AS nt2,
         lead(event_id) OVER w AS nid1,
         lead(event_id, 2) OVER w AS nid2,
         lead(value, 2) OVER w AS nv2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, event_id AS u_first, nid2 AS u_last,
       CASE WHEN value IS NULL AND nv2 IS NULL THEN NULL
            ELSE COALESCE(value, 0) + COALESCE(nv2, 0) END AS u_sum,
       CAST(2 AS BIGINT) AS n_u, nid1 AS b_id
FROM o
WHERE event_type = 'view' AND nt1 = 'click' AND nt2 = 'purchase'
""",
)
def q_mr_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard ``SUBSET`` union variables (BEYOND Flink, which
    does not expose SUBSET): the strict view->click->purchase chain
    with ``SUBSET U = (A, C)`` — measures over U aggregate the union
    of A's and C's rows (first/last ids, NULL-aware SUM). On this
    singleton pattern the compiler stays fully relational: subset
    positions are the sorted union of member positions, so every
    measure lowers onto the same lead-window plan, no Python stage
    (disjoint literal DEFINEs keep even the greedy selection
    relational). The oracle re-derives the union measures from the
    same two leads."""
    out = match_recognize(table(spark, sf_dir, "events"), """
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(U.event_id) AS u_first, LAST(U.event_id) AS u_last,
                 SUM(U.value) AS u_sum, COUNT(U.*) AS n_u,
                 B.event_id AS b_id
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B C)
        SUBSET U = (A, C)
        DEFINE A AS A.event_type = 'view',
               B AS B.event_type = 'click',
               C AS C.event_type = 'purchase'""")
    return out.select("user_id", "u_first", "u_last", "u_sum", "n_u", "b_id")


@register(
    "q_mr_reluctant",
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
s AS (SELECT user_id, event_id AS s_id, rn AS srn, ts AS s_ts, next_err
      FROM o WHERE event_type = 'signup'),
cand AS (
  SELECT s.user_id, s.s_id, s.srn,
         o.event_id AS p_id, o.rn AS prn
  FROM s JOIN o ON o.user_id = s.user_id AND o.rn >= s.srn + 2
   AND o.event_type = 'purchase'
   AND o.ts <= s.s_ts + INTERVAL 3 DAY
   AND (s.next_err IS NULL OR o.rn < s.next_err)),
best AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, srn
                               ORDER BY prn ASC) AS rk
  FROM cand)
SELECT user_id, s_id, p_id,
       CAST(prn - srn - 1 AS BIGINT) AS n_n,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY srn)
            AS BIGINT) AS mno
FROM best WHERE rk = 1
""",
)
def q_mr_reluctant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reluctant (lazy) quantifier — ``PATTERN (S N+? P)``: signup,
    then the FEWEST non-error filler rows, then a purchase. The lazy
    ``+?`` binds P to the NEAREST purchase at least two rows after
    the signup (greedy ``N+`` would bind the farthest — exactly
    :func:`q_mr_funnel` with its selection flipped), within 3 days,
    no error row between. Compiles onto the relational run path with
    the greedy max-end argmax flipped to an argmin (ends ASC); the
    oracle is the funnel oracle with ``ORDER BY prn DESC`` flipped
    to ``ASC`` and the >= 1-filler floor added. Flink parity: its
    MATCH_RECOGNIZE ships the same ``??/*?/+?/{m,n}?`` reluctant
    markers."""
    out = mr_reluctant_frame(table(spark, sf_dir, "events"))
    return out.select("user_id", "s_id", "p_id", "n_n", "mno")


@register(
    "q_mr_skip_to",
    family="I",
    oracle="""
WITH o AS (
  SELECT user_id, event_id, event_type, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events),
c AS (
  SELECT user_id, event_id, rn,
         rn - row_number() OVER (PARTITION BY user_id ORDER BY rn)
           AS isl,
         lead(event_id, 2) OVER (PARTITION BY user_id ORDER BY rn)
           AS zid2
  FROM o WHERE event_type = 'click'),
w AS (
  SELECT user_id, event_id, rn, zid2,
         row_number() OVER (PARTITION BY user_id, isl ORDER BY rn) - 1
           AS off,
         count(*) OVER (PARTITION BY user_id, isl) AS len
  FROM c)
SELECT user_id, event_id AS x_id, zid2 AS z_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY rn)
            AS BIGINT) AS mno
FROM w WHERE off % 2 = 0 AND off + 2 <= len - 1
""",
)
def q_mr_skip_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``AFTER MATCH SKIP TO LAST Z`` (Flink parity — the
    variable-targeted resume strategies): click-triples ``(X Y Z)``
    all defined as clicks, so matches chain END-TO-START through a
    click run, sharing their boundary row — a run of 5 clicks yields
    matches at offsets 0 and 2, where PAST LAST ROW would keep only
    the first and TO NEXT ROW all three (all three strategies
    genuinely differ here). Relational singleton path with a
    constant resume stride of 2 (the grouped-map pick runs over
    CANDIDATES only). The oracle derives kept anchors declaratively:
    within each click island (gaps-and-islands), keep even offsets
    with a full triple remaining (``off % 2 = 0 AND off + 2 <=
    len - 1``)."""
    out = mr_skip_to_frame(table(spark, sf_dir, "events"))
    return out.select("user_id", "x_id", "z_id", "mno")


@register(
    "q_mr_prev",
    family="I",
    oracle="""
WITH o AS (
  SELECT user_id, event_id, ts, value,
         row_number() OVER w AS rn,
         lag(value) OVER w AS pv
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
f AS (SELECT *, COALESCE(value < pv, FALSE) AS dn FROM o),
d AS (
  SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn)
            AS isl
  FROM f WHERE dn),
g AS (SELECT user_id, isl, max(rn) AS end_rn FROM d GROUP BY 1, 2),
m AS (
  SELECT d.user_id, d.rn, g.end_rn,
         (g.end_rn - d.rn + 1) AS n_down
  FROM d JOIN g ON g.user_id = d.user_id AND g.isl = d.isl)
SELECT m.user_id, a.value AS strt_v, b.value AS bottom_v,
       u.value AS up_v, CAST(n_down AS BIGINT) AS n_down,
       CAST(row_number() OVER (PARTITION BY m.user_id ORDER BY m.rn)
            AS BIGINT) AS mno
FROM m
JOIN o a ON a.user_id = m.user_id AND a.rn = m.rn - 1
JOIN o b ON b.user_id = m.user_id AND b.rn = m.end_rn
JOIN o u ON u.user_id = m.user_id AND u.rn = m.end_rn + 1
WHERE u.value >= b.value
""",
)
def q_mr_prev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``PREV()`` physical navigation in DEFINE — Flink's flagship
    MATCH_RECOGNIZE example, the V-pattern: a strictly-decreasing
    value run (``DOWN AS DOWN.value < PREV(DOWN.value)``) bottoming
    out into a recovery row (``UP AS UP.value >= PREV(UP.value)``).
    Navigation is input-relative (the SQL-standard physical offset),
    compiled to ONE lag() window pass before flagging, so both
    engines consume plain boolean flags and the run compiler's
    band-join plan is unchanged (zero Python; NULL past the
    partition edge coalesces the flag to false, matching Flink).
    SKIP TO NEXT emits every anchor's greedy match declaratively:
    each down row opens one match anchored just before it, consuming
    the rest of its down-island (greedy cannot stop early — the next
    row would still be DOWN, failing UP), provided the island is
    followed by a row at all and its value comparison is non-NULL —
    exactly the oracle's gaps-and-islands join."""
    out = match_recognize(table(spark, sf_dir, "events"), """
        PARTITION BY user_id ORDER BY ts
        MEASURES STRT.value AS strt_v, LAST(DOWN.value) AS bottom_v,
                 UP.value AS up_v, COUNT(DOWN.*) AS n_down,
                 MATCH_NUMBER() AS mno
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (STRT DOWN+ UP)
        DEFINE DOWN AS DOWN.value < PREV(DOWN.value),
               UP AS UP.value >= PREV(UP.value)""")
    return out.select(
        "user_id", "strt_v", "bottom_v", "up_v", "n_down", "mno"
    )


@register(
    "q_mr_multikey",
    family="I",
    oracle="""
WITH o AS (
  SELECT user_id, event_type, event_id, value,
         row_number() OVER w AS rn,
         lag(value) OVER w AS pv,
         lead(event_id) OVER w AS nid,
         lead(value) OVER w AS nv
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type
               ORDER BY ts, event_id))
SELECT user_id, event_type, event_id AS a_id, value AS a_v,
       nid AS b_id, nv AS b_v,
       CAST(row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY rn) AS BIGINT) AS mno
FROM o WHERE nv > value
""",
)
def q_mr_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column ``PARTITION BY`` (Flink parity) combined with
    ``PREV()`` navigation: within each (user_id, event_type)
    substream, adjacent row pairs whose value rises. The engine
    synthesizes one internal struct key — grouping, the lead-window
    plan, and the navigation lag all ride the SAME single shuffle as
    a one-column key — and re-expands both key fields on output.
    ``B.value > PREV(B.value)`` is input-relative WITHIN the
    composite partition, which is what the oracle's two-column
    window proves. TO NEXT ROW keeps the singleton plan
    selection-free (every candidate emits)."""
    out = match_recognize(table(spark, sf_dir, "events"), """
        PARTITION BY user_id, event_type ORDER BY ts
        MEASURES A.event_id AS a_id, A.value AS a_v,
                 B.event_id AS b_id, B.value AS b_v,
                 MATCH_NUMBER() AS mno
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (A B)
        DEFINE B AS B.value > PREV(B.value)""")
    return out.select(
        "user_id", "event_type", "a_id", "a_v", "b_id", "b_v", "mno"
    )


@register(
    "q_mr_agg_define",
    family="I",
    oracle="""
WITH o AS (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER w AS rn,
         sum(COALESCE(value, 0))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS cum
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
e AS (
  SELECT *,
         COALESCE(min(CASE WHEN event_type = 'error' THEN rn END)
           OVER (PARTITION BY user_id ORDER BY rn
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
           2147483647) AS next_err
  FROM o),
cand AS (
  SELECT a.user_id, a.event_id AS q1_id, a.rn AS arn,
         p.event_id AS p_id, p.rn AS prn,
         (SELECT cum FROM o x WHERE x.user_id = a.user_id
            AND x.rn = p.rn - 1) - (a.cum - COALESCE(a.value, 0))
           AS q_sum
  FROM e a JOIN e p ON p.user_id = a.user_id AND p.rn > a.rn
   AND p.event_type = 'purchase'
   AND p.ts <= a.ts + INTERVAL 1 DAY
   AND a.next_err >= p.rn
  WHERE a.event_type <> 'error'),
best AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, arn
                               ORDER BY prn DESC) AS rk
  FROM cand WHERE q_sum <= 60.005)
SELECT user_id, q1_id, CAST(prn - arn AS BIGINT) AS n_q,
       ROUND(q_sum, 2) AS q_sum, p_id
FROM best WHERE rk = 1
""",
)
def q_mr_agg_define(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregates in DEFINE (Flink's aggregations-in-DEFINE
    feature): ``Q AS Q.event_type <> 'error' AND SUM(Q.value) <=
    60.005`` — a row joins Q only while the running sum INCLUDING it
    stays under the cap (SQL RUNNING semantics), then greedy binds P
    to the farthest in-cap purchase. Anchor-dependent running values
    have no per-row flag spelling, so this is a sanctioned NFA
    query (route_info names the reason); the per-element state is
    O(1) and incremental. events.value is strictly positive, so the
    every-prefix condition collapses to the total (monotone running
    sums) and the oracle spells it as a prefix-sum difference over
    the band join; the cap sits OFF the 2-decimal value grid
    (60.005) so float summation order cannot flip the boundary
    between the engine's incremental sum and the oracle's
    cumsum difference."""
    out = mr_agg_define_frame(table(spark, sf_dir, "events"))
    return out.select(
        "user_id", "q1_id", "n_q",
        round_duck(F.col("q_sum"), 2).alias("q_sum"), "p_id"
    )


@register(
    "q_mr_define_nav",
    family="I",
    oracle="""
WITH o AS (
  SELECT user_id, event_id, ts, value,
         row_number() OVER w AS rn,
         lag(value) OVER w AS pv
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
b AS (
  SELECT *,
         CASE WHEN rn = 1 THEN 1
              WHEN pv IS NULL THEN 0
              WHEN value IS NULL THEN 1
              WHEN value < pv THEN 0
              ELSE 1 END AS brk
  FROM o),
i AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY rn) AS isl
  FROM b),
g AS (
  SELECT user_id, isl, min(rn) AS srn, max(rn) AS ern,
         COUNT(*) AS n
  FROM i GROUP BY 1, 2)
SELECT g.user_id, f.value AS top_v, l.value AS bot_v,
       CAST(g.n AS BIGINT) AS n, f.event_id AS a_id,
       CAST(row_number() OVER (PARTITION BY g.user_id ORDER BY g.srn)
            AS BIGINT) AS mno
FROM g
JOIN o f ON f.user_id = g.user_id AND f.rn = g.srn
JOIN o l ON l.user_id = g.user_id AND l.rn = g.ern
""",
)
def q_mr_define_nav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``LAST()`` match-relative navigation in DEFINE — the Flink-docs
    V-pattern spelling (``DOWN AS price < LAST(DOWN.price, 1)`` with
    the ``IS NULL`` first-row guard), here as the pure falling-run
    segmentation: ``PATTERN (DOWN+)`` with
    ``DOWN AS LAST(DOWN.value, 1) IS NULL OR DOWN.value <
    LAST(DOWN.value, 1)`` under SKIP PAST LAST ROW partitions every
    key's rows into maximal strictly-decreasing runs. The navigated
    value depends on where the match anchored and how far the run
    has grown, so this is the anchor-stateful NFA class (like
    aggregates in DEFINE): the condition compiles to a
    Python-evaluable boolean (operators/match_recognize.py
    ``_compile_nav_define``) evaluated per candidate during the scan
    with O(1) state. The oracle is the equivalent gaps-and-islands:
    an island breaks exactly where the three-valued DEFINE stops
    admitting (non-first row with a non-NULL previous value that the
    current value is not strictly below)."""
    out = mr_define_nav_frame(table(spark, sf_dir, "events"))
    return out.select("user_id", "top_v", "bot_v", "n", "a_id", "mno")


@register(
    "q_mr_define_nav_v",
    family="I",
    oracle="""
WITH o AS (
  SELECT user_id, event_id, ts, value,
         row_number() OVER w AS rn,
         lag(value) OVER w AS pv
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
f AS (SELECT *, COALESCE(value < pv, FALSE) AS dn FROM o),
d AS (
  SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn)
            AS isl
  FROM f WHERE dn),
g AS (SELECT user_id, isl, max(rn) AS end_rn FROM d GROUP BY 1, 2),
m AS (
  SELECT d.user_id, d.rn, g.end_rn,
         (g.end_rn - d.rn + 1) AS n_down
  FROM d JOIN g ON g.user_id = d.user_id AND g.isl = d.isl)
SELECT m.user_id, a.value AS strt_v, b.value AS bottom_v,
       u.value AS up_v, CAST(n_down AS BIGINT) AS n_down,
       CAST(row_number() OVER (PARTITION BY m.user_id ORDER BY m.rn)
            AS BIGINT) AS mno
FROM m
JOIN o a ON a.user_id = m.user_id AND a.rn = m.rn - 1
JOIN o b ON b.user_id = m.user_id AND b.rn = m.end_rn
JOIN o u ON u.user_id = m.user_id AND u.rn = m.end_rn + 1
WHERE u.value >= b.value
""",
)
def q_mr_define_nav_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Flink-docs V-pattern in its MATCH-RELATIVE spelling —
    ``DOWN AS (LAST(DOWN.value, 1) IS NULL AND DOWN.value <
    LAST(STRT.value, 0)) OR DOWN.value < LAST(DOWN.value, 1)`` —
    exercising the whole navigation surface in one clause: the
    ``IS NULL`` first-row guard, self-navigation over the run, and
    the cross-variable ``LAST(STRT.value, 0)`` read of the fixed
    anchor row (the SQL standard's spelling of the anchor
    comparison, which a bare ``STRT.value`` would NOT give under
    this engine's candidate-row DEFINE semantics). Within a
    contiguous run this is value-for-value the physical-PREV
    spelling (q_mr_prev — LAST(DOWN,1) at run position r IS the
    physical previous row, and the first DOWN row's anchor
    comparison IS its physical PREV), so the two queries share one
    declarative gaps-and-islands oracle while compiling to the two
    different engine classes (q_mr_prev: relational run plan with a
    lag pass; this query: the anchor-stateful NFA, route_info names
    the nav-DEFINE reason)."""
    out = match_recognize(table(spark, sf_dir, "events"), """
        PARTITION BY user_id ORDER BY ts
        MEASURES STRT.value AS strt_v, LAST(DOWN.value) AS bottom_v,
                 UP.value AS up_v, COUNT(DOWN.*) AS n_down,
                 MATCH_NUMBER() AS mno
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (STRT DOWN+ UP)
        DEFINE DOWN AS (LAST(DOWN.value, 1) IS NULL
                        AND DOWN.value < LAST(STRT.value, 0))
                       OR DOWN.value < LAST(DOWN.value, 1),
               UP AS UP.value >= PREV(UP.value)""")
    return out.select(
        "user_id", "strt_v", "bottom_v", "up_v", "n_down", "mno"
    )
