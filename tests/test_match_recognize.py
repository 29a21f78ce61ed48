"""MATCH_RECOGNIZE (SQL row-pattern recognition, the Flink SQL CEP
spelling): parser pins, planted-frame semantics (strict contiguity,
greedy backtracking, WITHIN truncation, skip modes, measures), and a
cross-implementation fuzz against an independent brute-force matcher
(full enumeration + lexicographic-max greedy selection, a different
algorithm from the operator's backtracking scan)."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from pyspark.sql import functions as F

from flink_framework_spark.operators.match_recognize import (
    match_recognize,
    parse_match_recognize,
)

EVENTS_SCHEMA = (
    "user_id long, ts string, event_id long, event_type string, value double"
)


def frame(spark, rows):
    return spark.createDataFrame(rows, EVENTS_SCHEMA).selectExpr(
        "user_id", "CAST(ts AS timestamp) AS ts", "event_id",
        "event_type", "value",
    )


# ------------------------------------------------------------- parser


def test_parser_full_clause():
    spec = parse_match_recognize("""
    MATCH_RECOGNIZE (
      PARTITION BY user_id ORDER BY ts
      MEASURES S.ts AS s_ts, LAST(P.ts) AS p_ts, COUNT(F.*) AS n_f,
               COUNT(*) AS n_rows, MATCH_NUMBER() AS mno,
               SUM(F.value) AS f_sum
      ONE ROW PER MATCH
      AFTER MATCH SKIP TO NEXT ROW
      PATTERN (S F* P? Q{2,3} R{2,})
      WITHIN INTERVAL '90' MINUTE
      DEFINE S AS S.event_type = 'view', F AS F.value > 10
    )""")
    assert spec.partition_by == "user_id"
    assert spec.order_by == ["ts"]
    assert spec.skip == "to_next"
    assert [(e.var, e.n_min, e.n_max) for e in spec.elements] == [
        ("S", 1, 1), ("F", 0, None), ("P", 0, 1), ("Q", 2, 3), ("R", 2, None)
    ]
    assert spec.within_s == 5400.0
    assert spec.defines == {
        "S": "S.event_type = 'view'", "F": "F.value > 10"
    }
    assert [(m.name, m.func, m.var, m.col) for m in spec.measures] == [
        ("s_ts", "VAR_COL", "S", "ts"),
        ("p_ts", "LAST", "P", "ts"),
        ("n_f", "COUNT", "F", None),
        ("n_rows", "COUNT_STAR", None, None),
        ("mno", "MATCH_NUMBER", None, None),
        ("f_sum", "SUM", "F", "value"),
    ]


@pytest.mark.parametrize(
    "clause, msg",
    [
        ("PARTITION BY u ORDER BY ts MEASURES X.ts AS t "
         "AFTER MATCH SKIP TO FIRST X PATTERN (X Y)", "infinite loop"),
        ("PARTITION BY u ORDER BY ts MEASURES X.ts AS t "
         "AFTER MATCH SKIP TO LAST X PATTERN (X Y)", "infinite loop"),
        ("PARTITION BY u ORDER BY ts MEASURES X.ts AS t "
         "AFTER MATCH SKIP TO FIRST Z PATTERN (X Y)", "not in PATTERN"),
        ("PARTITION BY u ORDER BY ts MEASURES X.ts AS t "
         "AFTER MATCH SKIP TO LAST U PATTERN (X Y) SUBSET U = (X, Y)",
         "SUBSET"),
        ("PARTITION BY u ORDER BY ts MEASURES Z.ts AS t PATTERN (X Y)",
         "not in PATTERN"),
        ("PARTITION BY u ORDER BY ts MEASURES X.ts AS t PATTERN (X Y) "
         "DEFINE Z AS Z.v = 1", "not in PATTERN"),
        ("PARTITION BY u ORDER BY ts MEASURES X.ts AS t PATTERN (X {2,1})",
         "cannot tokenize|quantifier|unexpected"),
        ("SELECT * FROM t MATCH_RECOGNIZE (PARTITION BY u ORDER BY ts "
         "MEASURES X.ts AS t PATTERN (X Y))", "clause itself"),
    ],
)
def test_parser_rejects(clause, msg):
    import re as _re

    with pytest.raises(ValueError, match=_re.compile(msg, _re.I)):
        parse_match_recognize(clause)


def test_define_match_relative_navigation_rejections(spark):
    """FIRST/LAST in DEFINE is supported (match-relative, NFA-only)
    but bounded loudly: offsets must be literal nonnegative ints, the
    qualifier must be a pattern variable, cross-variable targets must
    bind fixed prefix rows, functions outside the evaluable subset
    reject, and mixing with a running aggregate rejects."""
    df = frame(spark, [(1, "2024-01-01 00:00:00", 1, "view", 1.0)])

    def mr(define):
        return match_recognize(df, f"""PARTITION BY user_id ORDER BY ts
            MEASURES A.ts AS t PATTERN (A B+ C)
            DEFINE {define}""")

    # cross-variable navigation to a quantified / later variable
    with pytest.raises(ValueError, match="fixed positions"):
        mr("C AS C.value > LAST(B.value, 1)")
    with pytest.raises(ValueError, match="fixed positions"):
        mr("A AS A.value > LAST(C.value, 0)")
    # qualifier must be a pattern variable
    with pytest.raises(ValueError, match="pattern\n?\\s*variable"):
        mr("B AS B.value > LAST(tbl.value, 1)")
    # FIRST/LAST need a qualifier (unlike physical PREV/NEXT)
    with pytest.raises(ValueError, match="variable qualifier"):
        mr("B AS B.value > LAST(value, 1)")
    # functions outside the subset reject loudly
    with pytest.raises(ValueError, match="out of scope"):
        mr("B AS abs(B.value) > LAST(B.value, 1)")
    # offset must be a literal nonnegative integer (an arithmetic
    # offset leaves the call unterminated at the '+')
    with pytest.raises(ValueError, match="integer|unterminated"):
        mr("B AS B.value > LAST(B.value, 1 + 1)")
    with pytest.raises(ValueError, match="integer"):
        mr("B AS B.value > LAST(B.value, x)")
    # mixing a running aggregate with navigation in one DEFINE
    with pytest.raises(ValueError, match="out of scope"):
        mr("B AS SUM(B.value) < 10 AND B.value < LAST(B.value, 1)")
    # nav-defined variable must appear exactly once in PATTERN
    with pytest.raises(ValueError, match="exactly once"):
        match_recognize(df, """PARTITION BY user_id ORDER BY ts
            MEASURES A.ts AS t PATTERN (B A B)
            DEFINE B AS B.value < LAST(B.value, 1)""")
    # PREV's argument must be VAR.col with a pattern variable
    with pytest.raises(ValueError, match="pattern\n?\\s*variable"):
        match_recognize(df, """PARTITION BY user_id ORDER BY ts
            MEASURES A.ts AS t PATTERN (A B)
            DEFINE B AS B.value > PREV(tbl.value)""")
    # engine='relational' names the anchor-stateful class
    with pytest.raises(ValueError, match="relational"):
        match_recognize(df, """PARTITION BY user_id ORDER BY ts
            MEASURES A.ts AS t PATTERN (A B+ C)
            DEFINE B AS B.value < LAST(B.value, 1)""",
            engine="relational")


def test_define_nav_v_pattern(spark):
    """Flink's docs V-pattern spelled with LAST in DEFINE (their
    flagship example): equals the physical-PREV twin row for row,
    including the cross-variable LAST(STRT.value, 0) read of the
    anchor row."""
    vals = [10.0, 8.0, 5.0, 3.0, 7.0, 9.0, 4.0, 4.0]
    df = frame(spark, [
        (1, "2024-01-01 10:0%d:00" % j, j + 1, "t", v)
        for j, v in enumerate(vals)
    ])
    nav = """
        PARTITION BY user_id ORDER BY ts
        MEASURES STRT.value AS strt_v, LAST(DOWN.value) AS bottom_v,
                 UP.value AS up_v, COUNT(DOWN.*) AS n_down
        ONE ROW PER MATCH AFTER MATCH SKIP TO NEXT ROW
        PATTERN (STRT DOWN+ UP)
        DEFINE DOWN AS (LAST(DOWN.value, 1) IS NULL
                        AND DOWN.value < LAST(STRT.value, 0))
                       OR DOWN.value < LAST(DOWN.value, 1),
               UP AS LAST(UP.value, 1) IS NULL
                     OR UP.value >= LAST(UP.value, 1)"""
    prev = """
        PARTITION BY user_id ORDER BY ts
        MEASURES STRT.value AS strt_v, LAST(DOWN.value) AS bottom_v,
                 UP.value AS up_v, COUNT(DOWN.*) AS n_down
        ONE ROW PER MATCH AFTER MATCH SKIP TO NEXT ROW
        PATTERN (STRT DOWN+ UP)
        DEFINE DOWN AS DOWN.value < PREV(DOWN.value),
               UP AS UP.value >= PREV(UP.value)"""
    got_nav = sorted(tuple(r) for r in match_recognize(df, nav).collect())
    got_prev = sorted(
        tuple(r) for r in match_recognize(df, prev).collect()
    )
    assert got_nav == got_prev
    assert got_nav == sorted([
        (1, 10.0, 3.0, 7.0, 3),
        (1, 8.0, 3.0, 7.0, 2),
        (1, 5.0, 3.0, 7.0, 1),
        (1, 9.0, 4.0, 4.0, 1),
    ])


def test_define_nav_first_and_islands(spark):
    """FIRST self-navigation (run-start anchored band) and the pure
    falling-run segmentation (gaps-and-islands shape)."""
    vals = [10.0, 8.0, 5.0, 3.0, 7.0, 9.0, 4.0, 4.0]
    df = frame(spark, [
        (1, "2024-01-01 10:0%d:00" % j, j + 1, "t", v)
        for j, v in enumerate(vals)
    ])
    falling = """
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(DOWN.value) AS top_v, LAST(DOWN.value) AS bot_v,
                 COUNT(DOWN.*) AS n
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (DOWN+)
        DEFINE DOWN AS LAST(DOWN.value, 1) IS NULL
                       OR DOWN.value < LAST(DOWN.value, 1)"""
    got = [tuple(r) for r in match_recognize(df, falling).collect()]
    assert got == [
        (1, 10.0, 3.0, 4), (1, 7.0, 7.0, 1),
        (1, 9.0, 4.0, 2), (1, 4.0, 4.0, 1),
    ]
    band = """
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(A.value) AS f_v, COUNT(A.*) AS n
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A+)
        DEFINE A AS FIRST(A.value, 0) - A.value <= 3
                    AND A.value - FIRST(A.value, 0) <= 3"""
    got2 = [tuple(r) for r in match_recognize(df, band).collect()]
    assert got2 == [
        (1, 10.0, 2), (1, 5.0, 3), (1, 9.0, 1), (1, 4.0, 2),
    ]


def test_define_prev_next_navigation(spark):
    """Flink's flagship V-pattern: ``DOWN AS value < PREV(value)``,
    ``UP AS value >= PREV(value)`` — physical input-relative
    navigation compiled to one lag/lead pass before flagging. Both
    engines agree; the partition edge navigates to NULL (flag
    false), so a partition-opening row can never be DOWN."""
    vals = [10.0, 8.0, 5.0, 3.0, 7.0, 9.0, 4.0, 4.0]
    rows = [
        (1, "2024-01-01 10:0%d:00" % j, j + 1, "t", v)
        for j, v in enumerate(vals)
    ]
    df = frame(spark, rows)
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES STRT.value AS strt_v, LAST(DOWN.value) AS bottom_v,
                 UP.value AS up_v, COUNT(DOWN.*) AS n_down
        ONE ROW PER MATCH AFTER MATCH SKIP TO NEXT ROW
        PATTERN (STRT DOWN+ UP)
        DEFINE DOWN AS DOWN.value < PREV(DOWN.value),
               UP AS UP.value >= PREV(UP.value)"""
    expect = [
        (1, 10.0, 3.0, 7.0, 3),
        (1, 8.0, 3.0, 7.0, 2),
        (1, 5.0, 3.0, 7.0, 1),
        (1, 9.0, 4.0, 4.0, 1),
    ]
    for engine in ("relational", "nfa"):
        got = sorted(
            tuple(r)
            for r in match_recognize(df, clause, engine=engine).collect()
        )
        assert got == sorted(expect), engine
    # NEXT with an explicit offset
    clause2 = """
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, B.event_id AS b_id
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B)
        DEFINE A AS NEXT(A.value, 2) > A.value, B AS B.value < 6"""
    for engine in ("relational", "nfa"):
        got = [
            (r.a_id, r.b_id)
            for r in match_recognize(df, clause2, engine=engine).collect()
        ]
        assert got == [(3, 4)], engine


def test_define_unqualified_prev(spark):
    """The SQL-standard/Flink spelling without a variable qualifier —
    ``value < PREV(value)`` — works like the qualified form (bare
    column refs denote the candidate row everywhere in DEFINE)."""
    vals = [10.0, 8.0, 5.0, 9.0]
    rows = [
        (1, "2024-01-01 10:0%d:00" % j, j + 1, "t", v)
        for j, v in enumerate(vals)
    ]
    df = frame(spark, rows)
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(DOWN.event_id) AS fd, COUNT(DOWN.*) AS n_down
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (DOWN+)
        DEFINE DOWN AS value < PREV(value)"""
    for engine in ("relational", "nfa"):
        got = [
            (r.fd, r.n_down)
            for r in match_recognize(df, clause, engine=engine).collect()
        ]
        assert got == [(2, 2)], engine


def test_define_cross_variable_prev_rejected(spark):
    """PREV(B.col) inside DEFINE A is match-relative in the SQL
    standard (navigates from the last row mapped to B) — this
    engine's candidate-row lag compilation would silently return a
    different value, so the spelling rejects loudly. Self-qualified
    and unqualified forms stay supported."""
    df = frame(spark, [(1, "2024-01-01 00:00:00", 1, "view", 1.0)])
    with pytest.raises(ValueError, match="cross-variable"):
        match_recognize(df, """PARTITION BY user_id ORDER BY ts
            MEASURES A.ts AS t PATTERN (A B)
            DEFINE A AS A.value > PREV(B.value)""")
    with pytest.raises(ValueError, match="cross-variable"):
        match_recognize(df, """PARTITION BY user_id ORDER BY ts
            MEASURES A.ts AS t PATTERN (A B)
            DEFINE B AS NEXT(A.value) > 0""")


def test_null_partition_key_engines_agree(spark):
    """A NULL partition key is a real partition (groupBy and window
    partitionBy both keep it) — the relational run path's band join
    and ALL ROWS span join must be null-safe on the key or
    engine='auto' output silently depends on pattern shape for
    NULL-key data."""
    rows = []
    for uid in (None, 1, 2):
        for j, (et, v) in enumerate(
            [("view", 1.0), ("click", 2.0), ("click", 3.0),
             ("purchase", 4.0), ("view", 5.0), ("click", 6.0),
             ("purchase", 7.0)]
        ):
            rows.append(
                (uid, "2024-01-01 10:0%d:00" % j,
                 (0 if uid is None else uid) * 100 + j, et, v)
            )
    df = frame(spark, rows)
    one_row = """
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, COUNT(B.*) AS n_b,
                 C.event_id AS c_id
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B+ C)
        DEFINE A AS A.event_type = 'view',
               B AS B.event_type = 'click',
               C AS C.event_type = 'purchase'"""
    all_rows = one_row.replace("ONE ROW PER MATCH", "ALL ROWS PER MATCH")
    for clause in (one_row, all_rows):
        rel = [
            tuple(r)
            for r in match_recognize(df, clause, engine="relational")
            .collect()
        ]
        nfa = [
            tuple(r)
            for r in match_recognize(df, clause, engine="nfa").collect()
        ]
        # None sorts below nothing — compare via repr keys
        assert sorted(rel, key=repr) == sorted(nfa, key=repr), clause
        # and the NULL-key partition actually matched on both paths
        assert any(r[0] is None for r in rel), clause


def test_mr_stream_rejects_prev_next(spark, sf_dir):
    from flink_framework_spark.io import table
    from flink_framework_spark.streaming.mr import match_recognize_stream

    ev = table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="batch-only"):
        match_recognize_stream(ev, """PARTITION BY user_id ORDER BY ts
            MEASURES A.ts AS t PATTERN (A B)
            WITHIN INTERVAL '1' HOUR
            DEFINE B AS B.value > PREV(B.value)""")
    # navigation text INSIDE a string literal is not navigation, and
    # offset 0 folds to the plain column — neither rejects (same
    # detector as the batch rewrite)
    q = match_recognize_stream(ev, """PARTITION BY user_id ORDER BY ts
        MEASURES A.ts AS t PATTERN (A B)
        WITHIN INTERVAL '1' HOUR
        DEFINE A AS A.event_type <> 'PREV(A.x)',
               B AS B.value >= PREV(B.value, 0)""")
    assert q is not None


# --------------------------------------------------- planted semantics


BASE = [
    (1, "2024-01-01 10:00:00", 1, "view", 1.0),
    (1, "2024-01-01 10:05:00", 2, "click", 2.0),
    (1, "2024-01-01 10:10:00", 3, "purchase", 3.0),
    (1, "2024-01-01 10:20:00", 4, "purchase", 4.0),
    (1, "2024-01-01 10:25:00", 5, "error", 5.0),
    (1, "2024-01-01 10:30:00", 6, "view", 6.0),
    (1, "2024-01-01 10:40:00", 7, "purchase", 7.0),
    (2, "2024-01-01 09:00:00", 8, "view", 1.0),
    (2, "2024-01-01 09:01:00", 9, "error", 1.0),
    (2, "2024-01-01 09:02:00", 10, "purchase", 1.0),
]


def test_strict_contiguity_is_default(spark):
    """PATTERN (A B) with no filler = B is the IMMEDIATELY following
    row (SQL standard), unlike the Pattern API's relaxed followedBy."""
    out = match_recognize(frame(spark, BASE), """
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, B.event_id AS b_id
        PATTERN (A B)
        DEFINE A AS A.event_type = 'view',
               B AS B.event_type = 'purchase'""")
    assert [(r.a_id, r.b_id) for r in out.orderBy("a_id").collect()] == [
        (6, 7)
    ]


def test_greedy_filler_backtracks_to_last_reachable(spark):
    """S F* P: greedy F* consumes past nearer purchases; the match
    binds P to the FARTHEST purchase not blocked by an error row."""
    out = match_recognize(frame(spark, BASE), """
        PARTITION BY user_id ORDER BY ts
        MEASURES S.event_id AS s_id, P.event_id AS p_id,
                 COUNT(F.*) AS n_f, MATCH_NUMBER() AS mno
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (S F* P)
        WITHIN INTERVAL '1' HOUR
        DEFINE S AS S.event_type = 'view',
               F AS F.event_type <> 'error',
               P AS P.event_type = 'purchase'""")
    rows = [(r.user_id, r.s_id, r.p_id, r.n_f, r.mno)
            for r in out.orderBy("user_id", "mno").collect()]
    # user 1: view@1 -> F* {click,purchase@3} -> P=purchase@4 (error blocks
    # nothing before it; greedy passes purchase@3); then view@6 -> purchase@7.
    # user 2: error strictly between view and purchase -> no match.
    assert rows == [(1, 1, 4, 2, 1), (1, 6, 7, 0, 2)]


def test_skip_to_next_allows_overlap(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0),
        (1, "2024-01-01 10:01:00", 2, "view", 1.0),
        (1, "2024-01-01 10:02:00", 3, "purchase", 1.0),
    ]
    clause = """PARTITION BY user_id ORDER BY ts
        MEASURES S.event_id AS s_id, P.event_id AS p_id
        AFTER MATCH SKIP {} PATTERN (S F* P)
        DEFINE S AS S.event_type = 'view',
               F AS F.event_type <> 'error',
               P AS P.event_type = 'purchase'"""
    past = match_recognize(frame(spark, rows), clause.format("PAST LAST ROW"))
    nxt = match_recognize(frame(spark, rows), clause.format("TO NEXT ROW"))
    assert [(r.s_id, r.p_id) for r in past.orderBy("s_id").collect()] == [
        (1, 3)
    ]
    assert [(r.s_id, r.p_id) for r in nxt.orderBy("s_id").collect()] == [
        (1, 3), (2, 3)
    ]


def test_within_truncates_and_scan_advances(spark):
    """A run whose span exceeds WITHIN can't match from its start, but
    the scan advances row-by-row and matches the suffix that fits."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 1.0),
        (1, "2024-01-01 12:30:00", 2, "click", 2.0),
        (1, "2024-01-01 13:00:00", 3, "purchase", 3.0),
    ]
    out = match_recognize(frame(spark, rows), """
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(A.event_id) AS a_first, COUNT(A.*) AS n_a,
                 B.event_id AS b_id
        PATTERN (A{1,2} B)
        WITHIN INTERVAL '1' HOUR
        DEFINE A AS A.event_type = 'click',
               B AS B.event_type = 'purchase'""")
    assert [(r.a_first, r.n_a, r.b_id) for r in out.collect()] == [(2, 1, 3)]


def test_bounded_quantifier_and_measures(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 10.0),
        (1, "2024-01-01 10:01:00", 2, "click", 20.0),
        (1, "2024-01-01 10:02:00", 3, "click", 30.0),
        (1, "2024-01-01 10:03:00", 4, "click", 40.0),
        (1, "2024-01-01 10:04:00", 5, "purchase", 5.0),
    ]
    out = match_recognize(frame(spark, rows), """
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(A.*) AS n_a, FIRST(A.value) AS v_first,
                 LAST(A.value) AS v_last, SUM(A.value) AS v_sum,
                 AVG(A.value) AS v_avg, MIN(A.event_id) AS id_min,
                 MAX(A.event_id) AS id_max, COUNT(*) AS n_rows
        PATTERN (A{2,3} B)
        DEFINE A AS A.event_type = 'click',
               B AS B.event_type = 'purchase'""")
    r = out.collect()
    assert len(r) == 1
    # greedy {2,3} anchored at the scan position: rows 1-4 are clicks;
    # anchor row 1 takes 3 but then B=click@4 fails, backtracks to 2,
    # B=click@3 fails -> no match at row 1; anchor row 2 takes {2,3,4}
    # then B=purchase@5 matches.
    assert (r[0].n_a, r[0].v_first, r[0].v_last, r[0].v_sum, r[0].v_avg,
            r[0].id_min, r[0].id_max, r[0].n_rows) == (
        3, 20.0, 40.0, 90.0, 30.0, 2, 4, 4)


def test_optional_greedy_and_null_measures(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "signup", 1.0),
        (1, "2024-01-01 10:01:00", 2, "click", 2.0),
        (1, "2024-01-01 10:02:00", 3, "view", 3.0),
        (1, "2024-01-01 10:10:00", 4, "signup", 4.0),
        (1, "2024-01-01 10:11:00", 5, "view", 5.0),
    ]
    out = match_recognize(frame(spark, rows), """
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, B.event_id AS b_id,
                 C.event_id AS c_id, COUNT(B.*) AS n_b
        PATTERN (A B? C)
        DEFINE A AS A.event_type = 'signup',
               B AS B.event_type = 'click',
               C AS C.event_type = 'view'""")
    got = [(r.a_id, r.b_id, r.c_id, r.n_b)
           for r in out.orderBy("a_id").collect()]
    assert got == [(1, 2, 3, 1), (4, None, 5, 0)]


def test_null_condition_rows_do_not_match(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", None),
        (1, "2024-01-01 10:01:00", 2, "click", 9.0),
        (1, "2024-01-01 10:02:00", 3, "purchase", 1.0),
    ]
    out = match_recognize(frame(spark, rows), """
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(A.event_id) AS a_id, COUNT(A.*) AS n_a
        PATTERN (A+ B)
        DEFINE A AS A.value < 100,
               B AS B.event_type = 'purchase'""")
    # NULL < 100 is NULL -> treated as no-match (SQL boolean semantics)
    assert [(r.a_id, r.n_a) for r in out.collect()] == [(2, 1)]


def test_undefined_variable_matches_any_row(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "signup", 1.0),
        (1, "2024-01-01 10:01:00", 2, "error", 2.0),
        (1, "2024-01-01 10:02:00", 3, "purchase", 3.0),
    ]
    out = match_recognize(frame(spark, rows), """
        PARTITION BY user_id ORDER BY ts
        MEASURES S.event_id AS s_id, COUNT(F.*) AS n_f,
                 P.event_id AS p_id
        PATTERN (S F* P)
        DEFINE S AS S.event_type = 'signup',
               P AS P.event_type = 'purchase'""")
    assert [(r.s_id, r.n_f, r.p_id) for r in out.collect()] == [(1, 1, 3)]


# ------------------------------------------- reluctant quantifiers


def test_parser_reluctant_flags():
    spec = parse_match_recognize("""
      PARTITION BY user_id ORDER BY ts
      MEASURES COUNT(*) AS n
      PATTERN (A?? B*? C+? D{2,5}? E{3}? F{1,1}? G H?)
      DEFINE A AS A.value > 0""")
    got = [(e.var, e.n_min, e.n_max, e.reluctant) for e in spec.elements]
    assert got == [
        ("A", 0, 1, True),
        ("B", 0, None, True),
        ("C", 1, None, True),
        ("D", 2, 5, True),
        # {n}? and {1,1}? have no repetition choice — normalized to
        # greedy so eligibility proofs see one canonical form
        ("E", 3, 3, False),
        ("F", 1, 1, False),
        ("G", 1, 1, False),
        ("H", 0, 1, False),
    ]


def test_reluctant_prefers_fewest(spark):
    """``A B+?`` stops at ONE b where greedy ``A B+`` eats the run;
    both engines agree (the relational argmax flips to an argmin)."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "a", 1.0),
        (1, "2024-01-01 10:01:00", 2, "b", 2.0),
        (1, "2024-01-01 10:02:00", 3, "b", 3.0),
        (1, "2024-01-01 10:03:00", 4, "b", 4.0),
    ]
    base = """
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(B.*) AS n_b, LAST(B.event_id) AS lb
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B+{q})
        DEFINE A AS A.event_type = 'a', B AS B.event_type = 'b'"""
    df = frame(spark, rows)
    for engine in ("relational", "nfa"):
        lazy = match_recognize(
            df, base.format(q="?"), engine=engine
        ).collect()
        assert [(r.n_b, r.lb) for r in lazy] == [(1, 2)], engine
        greedy = match_recognize(
            df, base.format(q=""), engine=engine
        ).collect()
        assert [(r.n_b, r.lb) for r in greedy] == [(3, 4)], engine


def test_reluctant_rechunks_islands(spark):
    """``B{2,}?`` chops a 5-island into 2+2 (greedy takes all 5):
    the lazy NFA re-anchors INSIDE the island, which is why the
    island-start selection proof is gated to greedy."""
    rows = [
        (1, "2024-01-01 10:0%d:00" % j, j + 1, "b", 1.0) for j in range(5)
    ]
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(B.event_id) AS fb, COUNT(B.*) AS n_b
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (B{2,}?)
        DEFINE B AS B.event_type = 'b'"""
    df = frame(spark, rows)
    for engine in ("relational", "nfa"):
        got = sorted(
            (r.fb, r.n_b)
            for r in match_recognize(df, clause, engine=engine).collect()
        )
        assert got == [(1, 2), (3, 2)], engine


def test_reluctant_optional_prefers_absent(spark):
    """``A B?? C`` binds zero B-rows when C can match immediately;
    greedy ``A B? C`` binds the B row."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "a", 1.0),
        (1, "2024-01-01 10:01:00", 2, "b", 2.0),
        (1, "2024-01-01 10:02:00", 3, "b", 3.0),
    ]
    base = """
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(B.*) AS n_b, C.event_id AS c_id
        ONE ROW PER MATCH AFTER MATCH SKIP TO NEXT ROW
        PATTERN (A B?{q} C)
        DEFINE A AS A.event_type = 'a', C AS C.event_type = 'b'"""
    df = frame(spark, rows)
    for engine in ("relational", "nfa"):
        lazy = match_recognize(
            df, base.format(q="?"), engine=engine
        ).collect()
        assert [(r.n_b, r.c_id) for r in lazy] == [(0, 2)], engine
        greedy = match_recognize(
            df, base.format(q=""), engine=engine
        ).collect()
        assert [(r.n_b, r.c_id) for r in greedy] == [(1, 3)], engine


def test_lone_reluctant_optional_run_emits_nothing(spark):
    """``B*?`` alone: the preferred (lazy) match at every anchor is
    the EMPTY match, which this engine omits — both engines emit
    zero rows (the relational path folds to an empty relation)."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "b", 1.0),
        (1, "2024-01-01 10:01:00", 2, "b", 2.0),
    ]
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(B.*) AS n_b
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (B*?)
        DEFINE B AS B.event_type = 'b'"""
    df = frame(spark, rows)
    for engine in ("relational", "nfa"):
        assert match_recognize(df, clause, engine=engine).count() == 0


def test_route_info_reluctant_run(spark):
    from flink_framework_spark.operators.match_recognize import route_info

    rows = [(1, "2024-01-01 10:00:00", 1, "b", 1.0)]
    df = frame(spark, rows)
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(B.*) AS n_b
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (B{2,}?)
        DEFINE B AS B.event_type = 'b'"""
    info = route_info(clause, df)
    assert info["engine"] == "relational-run"
    assert "min end per anchor" in info["reason"]
    # island-start is a greedy-only proof — reluctant must pick the
    # sequential candidates-only scan
    assert info["selection"] == "grouped-map pick over candidates"


# -------------------------------------- running aggregates in DEFINE


def test_agg_define_sum_cap(spark):
    """Flink's aggregations-in-DEFINE: ``SUM(Q.value) <= 40`` admits
    a row iff the running sum INCLUDING it stays under the cap —
    greedy chunks the stream into maximal capped runs."""
    vals = [10.0, 15.0, 20.0, 5.0, 30.0, 2.0, 3.0]
    rows = [
        (1, "2024-01-01 10:0%d:00" % j, j + 1, "c", v)
        for j, v in enumerate(vals)
    ]
    df = frame(spark, rows)
    out = match_recognize(df, """
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(Q.event_id) AS fq, COUNT(Q.*) AS n_q,
                 SUM(Q.value) AS s_q
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (Q+)
        DEFINE Q AS Q.event_type = 'c' AND SUM(Q.value) <= 40""")
    got = sorted(tuple(r) for r in out.collect())
    assert got == [(1, 1, 2, 25.0), (1, 3, 2, 25.0), (1, 5, 3, 35.0)]
    # AND on the other side + AVG + lazy quantifier
    out2 = match_recognize(df, """
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(Q.event_id) AS fq, COUNT(Q.*) AS n_q
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (Q{2,}?)
        DEFINE Q AS AVG(Q.value) >= 10 AND Q.event_type = 'c'""")
    assert sorted((r.fq, r.n_q) for r in out2.collect()) == [
        (1, 2), (3, 2), (5, 2)
    ]


def test_agg_define_null_and_count_semantics(spark):
    """SQL NULL semantics: an aggregate over zero non-null values is
    NULL and the comparison fails, so a NULL-value row cannot OPEN a
    SUM-capped run (but can ride inside one — the sum is unchanged);
    COUNT(Q.*) counts rows regardless."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "c", None),
        (1, "2024-01-01 10:01:00", 2, "c", 5.0),
        (1, "2024-01-01 10:02:00", 3, "c", None),
        (1, "2024-01-01 10:03:00", 4, "c", 6.0),
    ]
    df = frame(spark, rows)
    out = match_recognize(df, """
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(Q.event_id) AS fq, COUNT(Q.*) AS n_q,
                 SUM(Q.value) AS s_q
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (Q+)
        DEFINE Q AS SUM(Q.value) <= 100""")
    # row 1 (NULL) cannot open; rows 2-4 form one run (NULL rides)
    assert [tuple(r) for r in out.collect()] == [(1, 2, 3, 11.0)]
    out2 = match_recognize(df, """
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(Q.event_id) AS fq, COUNT(Q.*) AS n_q
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (Q+)
        DEFINE Q AS COUNT(Q.*) <= 3""")
    assert sorted((r.fq, r.n_q) for r in out2.collect()) == [
        (1, 3), (4, 1)
    ]


def test_agg_define_rejections(spark):
    bad = [
        ("DEFINE Q AS SUM(Q.value) <= 40 OR Q.value > 0", "AND only"),
        ("DEFINE Q AS Q.value > 0 OR SUM(Q.value) <= 40", "AND only"),
        ("DEFINE Q AS SUM(P.value) <= 40", "variable being defined"),
        ("DEFINE Q AS SUM(Q.value) <= P.value", "unsupported aggregate"),
        ("DEFINE Q AS AVG(Q.*) <= 4", "not a thing"),
        ("DEFINE Q AS SUM(Q.value) <= 4 AND MIN(Q.value) > 0",
         "one aggregate term"),
    ]
    head = """PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(*) AS n PATTERN (Q+ P) """
    for tail, msg in bad:
        with pytest.raises(ValueError, match=msg):
            parse_match_recognize(head + tail)
    # the variable must appear exactly once
    with pytest.raises(ValueError, match="exactly once"):
        parse_match_recognize("""PARTITION BY user_id ORDER BY ts
            MEASURES COUNT(*) AS n PATTERN (Q P Q)
            DEFINE Q AS SUM(Q.value) <= 4""")
    # literal containing an aggregate spelling is inert
    spec = parse_match_recognize("""PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(*) AS n PATTERN (Q P)
        DEFINE Q AS Q.event_type = 'SUM(Q.value)'""")
    assert not spec.agg_defines
    # ...also when a REAL aggregate follows the literal
    spec = parse_match_recognize("""PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(*) AS n PATTERN (Q P)
        DEFINE Q AS Q.props <> 'SUM(Q.v) <= 9' AND SUM(Q.value) <= 40""")
    assert spec.agg_defines == {"Q": ("SUM", "value", "<=", 40.0)}
    # negative bounds parse (the tokenizer spaces the sign)
    spec = parse_match_recognize("""PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(*) AS n PATTERN (Q P)
        DEFINE Q AS SUM(Q.value) <= -3.5""")
    assert spec.agg_defines == {"Q": ("SUM", "value", "<=", -3.5)}
    # a PARENTHESIZED OR in the residual is a fine top-level conjunct
    spec = parse_match_recognize("""PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(*) AS n PATTERN (Q P)
        DEFINE Q AS (Q.event_type = 'a' OR Q.event_type = 'b')
                    AND SUM(Q.value) <= 40""")
    assert spec.agg_defines and "OR" in spec.defines["Q"]


def test_mr_stream_agg_define_matches_batch(spark, tmp_path):
    """The aggregate constraint rides the shared scan core: the
    streaming twin chunks a sum-capped run across micro-batches to
    exactly the batch result (the aggregate column is carried in
    state automatically — it is a needed column)."""
    from flink_framework_spark.streaming.mr import match_recognize_stream
    from flink_framework_spark.streaming.twins import run_to_memory

    vals = [10.0, 15.0, 20.0, 5.0, 30.0]
    evs = [
        (1, "2024-01-01 10:0%d:00" % j, j + 1, "c", v)
        for j, v in enumerate(vals)
    ]
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(Q.event_id) AS fq, COUNT(Q.*) AS n_q,
                 SUM(Q.value) AS s_q
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (Q+)
        WITHIN INTERVAL '10' MINUTE
        DEFINE Q AS SUM(Q.value) <= 40"""
    batch = match_recognize(frame(spark, evs), clause).toPandas()
    sent = [
        (9, "2024-01-01 12:00:00", 90, "s", 0.0),
        (9, "2024-01-01 13:00:00", 91, "s", 0.0),
    ]
    src = tmp_path / "src"
    for b in (evs[:2], evs[2:], [sent[0]], [sent[1]]):
        frame(spark, b).coalesce(1).write.mode("append").parquet(str(src))
    sdf = (
        spark.readStream.schema(frame(spark, evs).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "1 minute")
    )
    out = run_to_memory(
        match_recognize_stream(sdf, clause),
        query_name="t_mr_aggdef",
        output_mode="update",
    )
    stream = out.filter(F.col("user_id") == 1).toPandas()
    cols = sorted(batch.columns)
    a = sorted(map(repr, stream[cols].itertuples(index=False, name=None)))
    b = sorted(map(repr, batch[cols].itertuples(index=False, name=None)))
    # 10+15 | 20+5 | 30 -> three capped chunks
    assert a == b and len(a) == 3


def test_mr_stream_nav_define_matches_batch(spark, tmp_path):
    """FIRST/LAST navigation in DEFINE on the streaming twin: the
    falling-run segmentation chunks across micro-batches to exactly
    the batch result (navigation never reaches before the anchor, so
    the state buffer always holds the navigated rows)."""
    from flink_framework_spark.streaming.mr import match_recognize_stream
    from flink_framework_spark.streaming.twins import run_to_memory

    vals = [10.0, 8.0, 5.0, 3.0, 7.0, 9.0, 4.0, 4.0]
    evs = [
        (1, "2024-01-01 10:0%d:00" % j, j + 1, "c", v)
        for j, v in enumerate(vals)
    ]
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(DOWN.value) AS top_v, LAST(DOWN.value) AS bot_v,
                 COUNT(DOWN.*) AS n
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (DOWN+)
        WITHIN INTERVAL '10' MINUTE
        DEFINE DOWN AS LAST(DOWN.value, 1) IS NULL
                       OR DOWN.value < LAST(DOWN.value, 1)"""
    batch = match_recognize(frame(spark, evs), clause).toPandas()
    sent = [
        (9, "2024-01-01 12:00:00", 90, "s", 0.0),
        (9, "2024-01-01 13:00:00", 91, "s", 0.0),
    ]
    src = tmp_path / "src"
    for b in (evs[:3], evs[3:], [sent[0]], [sent[1]]):
        frame(spark, b).coalesce(1).write.mode("append").parquet(str(src))
    sdf = (
        spark.readStream.schema(frame(spark, evs).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "1 minute")
    )
    out = run_to_memory(
        match_recognize_stream(sdf, clause),
        query_name="t_mr_navdef",
        output_mode="update",
    )
    stream = out.filter(F.col("user_id") == 1).toPandas()
    cols = sorted(batch.columns)
    a = sorted(map(repr, stream[cols].itertuples(index=False, name=None)))
    b = sorted(map(repr, batch[cols].itertuples(index=False, name=None)))
    # [10,8,5,3] | [7] | [9,4] | [4] -> four falling runs
    assert a == b and len(a) == 4
    # physical PREV inside a nav-DEFINE stays batch-only on streams
    with pytest.raises(ValueError, match="batch-only"):
        match_recognize_stream(sdf, """
            PARTITION BY user_id ORDER BY ts
            MEASURES COUNT(DOWN.*) AS n
            ONE ROW PER MATCH PATTERN (DOWN+)
            WITHIN INTERVAL '10' MINUTE
            DEFINE DOWN AS DOWN.value < PREV(DOWN.value)
                           OR LAST(DOWN.value, 1) IS NULL""")


def test_agg_define_vs_bruteforce(spark):
    """16-seed fuzz: random sum/count/avg-capped runs vs an
    independent per-prefix enumeration (the brute force re-checks
    every prefix of every count split, a different algorithm from
    the scan's incremental state)."""
    import random as _random
    from datetime import datetime, timezone

    for seed in range(16):
        rng = _random.Random(5200 + seed)
        rows = []
        t = 0.0
        for eid in range(rng.randint(8, 20)):
            t += 60.0
            val = None if rng.random() < 0.15 else float(
                rng.randint(1, 12)
            )
            rows.append((1, t, eid + 1, rng.choice(["c", "d"]), val))
        func, op, lit = rng.choice(
            [
                ("SUM", "<=", rng.randint(8, 30)),
                ("COUNT", "<", rng.randint(2, 5)),
                ("AVG", ">=", rng.randint(2, 8)),
                ("MAX", "<=", rng.randint(4, 10)),
            ]
        )
        suffix = rng.random() < 0.5
        lazy = "?" if rng.random() < 0.3 else ""
        pat = f"Q+{lazy} P" if suffix else f"Q+{lazy}"
        clause = (
            "PARTITION BY user_id ORDER BY ts "
            "MEASURES FIRST(Q.event_id) AS fq, COUNT(Q.*) AS n_q "
            "ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW "
            f"PATTERN ({pat}) "
            f"DEFINE Q AS Q.event_type = 'c' AND "
            f"{func}(Q.value) {op} {lit}"
            + (", P AS P.event_type = 'd'" if suffix else "")
        )
        df = spark.createDataFrame(
            [
                (u, datetime.fromtimestamp(tt, tz=timezone.utc)
                 .replace(tzinfo=None), e, ty, v)
                for u, tt, e, ty, v in rows
            ],
            "user_id long, ts timestamp, event_id long, "
            "event_type string, value double",
        )
        got = sorted(
            (r.fq, r.n_q) for r in match_recognize(df, clause).collect()
        )

        # brute force: per anchor, enumerate feasible Q counts by
        # re-checking EVERY prefix from scratch
        def q_ok(i):
            return rows[i][3] == "c"

        def prefix_ok(lo, c):
            vals = [rows[lo + t][4] for t in range(c)]
            nn = [v for v in vals if v is not None]
            if func == "COUNT":
                cur = len(nn)
            elif not nn:
                return False
            elif func == "SUM":
                cur = sum(nn)
            elif func == "AVG":
                cur = sum(nn) / len(nn)
            else:
                cur = max(nn)
            import operator as _o

            return {"<": _o.lt, "<=": _o.le, ">": _o.gt,
                    ">=": _o.ge}[op](cur, lit)

        expect, i, nrows = [], 0, len(rows)
        while i < nrows:
            feas = []
            c = 0
            while (
                i + c < nrows
                and q_ok(i + c)
                and all(prefix_ok(i, k) for k in range(1, c + 2))
            ):
                c += 1
                if not suffix:
                    feas.append(c)
                elif (
                    i + c < nrows and rows[i + c][3] == "d"
                ):
                    feas.append(c)
            if not feas:
                i += 1
                continue
            pick = min(feas) if lazy else max(feas)
            expect.append((i + 1, pick))
            i = i + pick + (1 if suffix else 0)
        assert got == sorted(expect), f"seed {seed}: {clause}"


# ------------------------------------- FIRST/LAST logical offsets


def test_measure_logical_offsets(spark):
    """Flink's FIRST(A.x, n)/LAST(A.x, n): the (n+1)-th /
    (n+1)-th-from-last row mapped to the variable; an offset past the
    variable's rows is NULL. Both engines agree on runs, singletons,
    and repeated-position variables."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 10.0),
        (1, "2024-01-01 10:01:00", 2, "click", 20.0),
        (1, "2024-01-01 10:02:00", 3, "click", 30.0),
        (1, "2024-01-01 10:03:00", 4, "purchase", 99.0),
    ]
    df = frame(spark, rows)
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(A.value) AS f0, FIRST(A.value, 1) AS f1,
                 FIRST(A.value, 2) AS f2, FIRST(A.value, 3) AS f3,
                 LAST(A.value, 1) AS l1, LAST(A.value, 2) AS l2,
                 LAST(A.value, 9) AS l9, FIRST(B.value, 1) AS bf1
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A{2,} B)
        DEFINE A AS A.event_type = 'click',
               B AS B.event_type = 'purchase'"""
    for engine in ("relational", "nfa"):
        got = [
            tuple(r)[1:]
            for r in match_recognize(df, clause, engine=engine).collect()
        ]
        assert got == [
            (10.0, 20.0, 30.0, None, 20.0, 10.0, None, None)
        ], engine
    # singleton pattern: repeated variable -> offsets walk positions
    clause2 = """
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(A.value, 1) AS f1, LAST(A.value, 1) AS l1
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A C A)
        DEFINE C AS C.value = 20.0"""
    for engine in ("relational", "nfa"):
        got = [
            (r.f1, r.l1)
            for r in match_recognize(df, clause2, engine=engine).collect()
        ]
        # A binds rows 1 and 3 (values 10, 30): FIRST(,1)=30, LAST(,1)=10
        assert got == [(30.0, 10.0)], engine


def test_measure_offset_rejections():
    with pytest.raises(ValueError, match="offset"):
        parse_match_recognize("""PARTITION BY u ORDER BY ts
            MEASURES SUM(A.value, 1) AS s PATTERN (A B)""")
    with pytest.raises(ValueError, match="non-negative integer"):
        parse_match_recognize("""PARTITION BY u ORDER BY ts
            MEASURES FIRST(A.value, x) AS f PATTERN (A B)""")


# --------------------------------------- multi-column PARTITION BY


MULTIKEY_SCHEMA = (
    "user_id long, region string, ts string, event_id long, "
    "event_type string, value double"
)


def _mk_frame(spark):
    rows = []
    eid = 0
    for u in (1, 2):
        for reg in ("x", "y"):
            for t in ("a", "b", "b", "c"):
                eid += 1
                rows.append(
                    (u, reg, "2024-01-01 10:%02d:00" % eid, eid, t,
                     float(eid))
                )
    return spark.createDataFrame(rows, MULTIKEY_SCHEMA).selectExpr(
        "user_id", "region", "CAST(ts AS timestamp) AS ts", "event_id",
        "event_type", "value",
    )


def test_multi_column_partition_by(spark):
    """Flink allows PARTITION BY several columns; the engine
    synthesizes ONE internal struct key (same shuffle count) and
    re-expands the key fields on output — all paths agree and the
    (user_id, region) pairs never bleed into each other."""
    df = _mk_frame(spark)
    clause = """
        PARTITION BY user_id, region ORDER BY ts
        MEASURES A.event_id AS a_id, COUNT(B.*) AS n_b,
                 C.event_id AS c_id
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B{1,2} C)
        DEFINE A AS A.event_type = 'a', B AS B.event_type = 'b',
               C AS C.event_type = 'c'"""
    expect = [
        (1, "x", 1, 2, 4), (1, "y", 5, 2, 8),
        (2, "x", 9, 2, 12), (2, "y", 13, 2, 16),
    ]
    for engine in ("relational", "nfa"):
        got = sorted(
            tuple(r)
            for r in match_recognize(df, clause, engine=engine).collect()
        )
        assert got == expect, engine
        cols = [
            f.name for f in match_recognize(df, clause, engine=engine).schema
        ]
        assert cols == ["user_id", "region", "a_id", "n_b", "c_id"], engine


def test_multi_column_partition_by_all_rows(spark):
    df = _mk_frame(spark)
    clause = """
        PARTITION BY user_id, region ORDER BY ts
        MEASURES CLASSIFIER() AS cls, FINAL COUNT(*) AS n_f
        ALL ROWS PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B{1,2} C)
        DEFINE A AS A.event_type = 'a', B AS B.event_type = 'b',
               C AS C.event_type = 'c'"""
    a = sorted(
        repr(tuple(r))
        for r in match_recognize(df, clause, engine="relational").collect()
    )
    b = sorted(
        repr(tuple(r))
        for r in match_recognize(df, clause, engine="nfa").collect()
    )
    assert a == b and len(a) == 16  # 4 keys x 4 matched rows


def test_multi_column_partition_by_rejections(spark):
    from flink_framework_spark.io import table as _table
    from flink_framework_spark.streaming.mr import match_recognize_stream

    with pytest.raises(ValueError, match="twice"):
        parse_match_recognize("""PARTITION BY u, u ORDER BY ts
            MEASURES A.ts AS t PATTERN (A B)""")
    df = _mk_frame(spark)
    with pytest.raises(ValueError, match="ONE partition"):
        match_recognize_stream(df, """
            PARTITION BY user_id, region ORDER BY ts
            MEASURES A.ts AS t PATTERN (A B)
            WITHIN INTERVAL '1' HOUR
            DEFINE A AS A.event_type = 'a'""")


# --------------------------------------------- RUNNING / FINAL


def test_final_running_measures_all_rows(spark):
    """SQL-standard RUNNING/FINAL semantics in ALL ROWS PER MATCH:
    RUNNING (default) evaluates the match prefix per row, FINAL the
    whole match on every row — both engines agree; in ONE ROW they
    coincide (Flink documents the same)."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 2.0),
        (1, "2024-01-01 10:01:00", 2, "click", 3.0),
        (1, "2024-01-01 10:02:00", 3, "click", 5.0),
        (1, "2024-01-01 10:03:00", 4, "purchase", 7.0),
    ]
    df = frame(spark, rows)
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES CLASSIFIER() AS cls, FINAL CLASSIFIER() AS cls_f,
                 COUNT(A.*) AS n_a, FINAL COUNT(A.*) AS n_a_f,
                 SUM(A.value) AS s_a, FINAL SUM(A.value) AS s_a_f,
                 RUNNING COUNT(*) AS n_all, FINAL COUNT(*) AS n_all_f,
                 FINAL LAST(A.value) AS last_a_f, FINAL B.value AS b_v_f
        ALL ROWS PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A{2,} B)
        DEFINE A AS A.event_type = 'click',
               B AS B.event_type = 'purchase'"""
    expect = [
        ("A", "B", 1, 3, 2.0, 10.0, 1, 4, 5.0, 7.0),
        ("A", "B", 2, 3, 5.0, 10.0, 2, 4, 5.0, 7.0),
        ("A", "B", 3, 3, 10.0, 10.0, 3, 4, 5.0, 7.0),
        ("B", "B", 3, 3, 10.0, 10.0, 4, 4, 5.0, 7.0),
    ]
    for engine in ("relational", "nfa"):
        got = [
            tuple(r)[3:]  # echo cols: user_id, ts, event_id
            for r in match_recognize(df, clause, engine=engine)
            .orderBy("ts")
            .collect()
        ]
        assert got == expect, engine
    one = """
        PARTITION BY user_id ORDER BY ts
        MEASURES FINAL COUNT(A.*) AS n_a, RUNNING SUM(A.value) AS s_a
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A{2,} B)
        DEFINE A AS A.event_type = 'click',
               B AS B.event_type = 'purchase'"""
    for engine in ("relational", "nfa"):
        got = [
            (r.n_a, r.s_a)
            for r in match_recognize(df, one, engine=engine).collect()
        ]
        assert got == [(3, 10.0)], engine


def test_parser_final_running_flags():
    spec = parse_match_recognize("""
      PARTITION BY user_id ORDER BY ts
      MEASURES FINAL SUM(A.value) AS s_f, RUNNING COUNT(*) AS n_r,
               A.value AS v, FINAL CLASSIFIER() AS c_f
      PATTERN (A B)
      DEFINE A AS A.value > 0""")
    assert [(m.name, m.final) for m in spec.measures] == [
        ("s_f", True), ("n_r", False), ("v", False), ("c_f", True)
    ]


# --------------------------------------- SKIP TO FIRST/LAST <var>


def test_parser_skip_to_var():
    spec = parse_match_recognize("""
      PARTITION BY user_id ORDER BY ts
      MEASURES COUNT(*) AS n
      AFTER MATCH SKIP TO LAST B
      PATTERN (A B C)
      DEFINE A AS A.value > 0""")
    assert (spec.skip, spec.skip_var) == ("to_last", "B")
    spec = parse_match_recognize("""
      PARTITION BY user_id ORDER BY ts
      MEASURES COUNT(*) AS n
      AFTER MATCH SKIP TO FIRST C
      PATTERN (A B C)
      DEFINE A AS A.value > 0""")
    assert (spec.skip, spec.skip_var) == ("to_first", "C")


def test_skip_to_last_overlaps_singleton(spark):
    """``PATTERN (X Y Z)`` over alternating a/b with SKIP TO LAST Z:
    the next match may START AT the previous match's Z row — matches
    chain end-to-start where PAST LAST ROW would drop every other
    one. Both engines agree (the relational pick resumes at a
    constant stride)."""
    rows = [
        (1, "2024-01-01 10:0%d:00" % j, j + 1, ("a" if j % 2 == 0 else "b"),
         1.0)
        for j in range(5)
    ]  # types: a b a b a
    base = """
        PARTITION BY user_id ORDER BY ts
        MEASURES X.event_id AS x_id, Z.event_id AS z_id
        ONE ROW PER MATCH AFTER MATCH SKIP {skip}
        PATTERN (X Y Z)
        DEFINE X AS X.event_type = 'a', Y AS Y.event_type = 'b',
               Z AS Z.event_type = 'a'"""
    df = frame(spark, rows)
    for engine in ("relational", "nfa"):
        chained = match_recognize(
            df, base.format(skip="TO LAST Z"), engine=engine
        ).collect()
        assert sorted((r.x_id, r.z_id) for r in chained) == [
            (1, 3), (3, 5)
        ], engine
        past = match_recognize(
            df, base.format(skip="PAST LAST ROW"), engine=engine
        ).collect()
        assert sorted((r.x_id, r.z_id) for r in past) == [(1, 3)], engine


def test_skip_to_on_run_pattern(spark):
    """Variable-targeted resume on the relational RUN path: TO LAST Q
    re-anchors at the run's final row, TO FIRST S at the suffix —
    engines agree; PAST LAST ROW differs (fewer matches)."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "a", 1.0),
        (1, "2024-01-01 10:01:00", 2, "b", 2.0),
        (1, "2024-01-01 10:02:00", 3, "a", 3.0),
        (1, "2024-01-01 10:03:00", 4, "b", 4.0),
        (1, "2024-01-01 10:04:00", 5, "a", 5.0),
        (1, "2024-01-01 10:05:00", 6, "b", 6.0),
    ]
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES P.event_id AS p_id, COUNT(Q.*) AS n_q,
                 S.event_id AS s_id
        ONE ROW PER MATCH AFTER MATCH SKIP TO FIRST S
        PATTERN (P Q{0,2}? S)
        DEFINE P AS P.event_type = 'a', S AS S.event_type = 'b'"""
    df = frame(spark, rows)
    for engine in ("relational", "nfa"):
        got = sorted(
            (r.p_id, r.n_q, r.s_id)
            for r in match_recognize(df, clause, engine=engine).collect()
        )
        assert got == [(1, 0, 2), (3, 0, 4), (5, 0, 6)], engine


def test_skip_to_runtime_errors(spark):
    """The two SQL-standard runtime errors raise loudly on BOTH
    engines: resume at the match start (infinite loop), and a target
    variable that bound zero rows (miss)."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "b", 1.0),
        (1, "2024-01-01 10:01:00", 2, "c", 2.0),
    ]
    df = frame(spark, rows)
    # Q{1,2} anchored at element 0, TO LAST Q, c == 1 -> resume == start
    loop_clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(Q.*) AS n_q
        ONE ROW PER MATCH AFTER MATCH SKIP TO LAST Q
        PATTERN (Q{1,2} S)
        DEFINE Q AS Q.event_type = 'b', S AS S.event_type = 'c'"""
    from py4j.protocol import Py4JJavaError

    for engine in ("relational", "nfa"):
        with pytest.raises(Exception) as ei:
            match_recognize(df, loop_clause, engine=engine).collect()
        assert "infinite loop" in str(ei.value), engine
    # optional run bound zero rows -> miss (NFA route: trailing
    # optional runs are NFA-only, so this exercises scan_rows)
    miss_clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(Q.*) AS n_q
        ONE ROW PER MATCH AFTER MATCH SKIP TO LAST Q
        PATTERN (B Q?)
        DEFINE B AS B.event_type = 'b', Q AS Q.event_type = 'zzz'"""
    with pytest.raises(Exception) as ei:
        match_recognize(df, miss_clause, engine="nfa").collect()
    assert "matched no rows" in str(ei.value)


def test_mr_stream_reluctant_matches_batch(spark, tmp_path):
    """A reluctant run chunks its island lazily; the streaming twin
    (same scan core, lazy count order) drains to exactly the batch
    result even when the island spans micro-batches."""
    from flink_framework_spark.streaming.mr import match_recognize_stream
    from flink_framework_spark.streaming.twins import run_to_memory

    evs = [
        (1, "2024-01-01 10:0%d:00" % j, j + 1, "b", 1.0) for j in range(5)
    ]
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(B.event_id) AS fb, COUNT(B.*) AS n_b
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (B{2,}?)
        WITHIN INTERVAL '10' MINUTE
        DEFINE B AS B.event_type = 'b'"""
    batch = match_recognize(frame(spark, evs), clause).toPandas()
    sent = [
        (9, "2024-01-01 12:00:00", 90, "s", 0.0),
        (9, "2024-01-01 13:00:00", 91, "s", 0.0),
    ]
    src = tmp_path / "src"
    for b in (evs[:3], evs[3:], [sent[0]], [sent[1]]):
        frame(spark, b).coalesce(1).write.mode("append").parquet(str(src))
    sdf = (
        spark.readStream.schema(frame(spark, evs).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "1 minute")
    )
    out = run_to_memory(
        match_recognize_stream(sdf, clause),
        query_name="t_mr_lazy",
        output_mode="update",
    )
    stream = out.filter(F.col("user_id") == 1).toPandas()
    cols = sorted(batch.columns)
    a = sorted(map(repr, stream[cols].itertuples(index=False, name=None)))
    b = sorted(map(repr, batch[cols].itertuples(index=False, name=None)))
    assert a == b and len(a) == 2  # island of 5 -> lazy 2+2


def test_mr_stream_skip_to_last_matches_batch(spark, tmp_path):
    """SKIP TO LAST chains matches end-to-start across micro-batches:
    the streaming twin drains to exactly the batch result."""
    from flink_framework_spark.streaming.mr import match_recognize_stream
    from flink_framework_spark.streaming.twins import run_to_memory

    def fr(rows):
        return frame(spark, rows)

    # a b a b a per user, split across batches, plus watermark movers
    evs = [
        (1, "2024-01-01 10:0%d:00" % j, j + 1,
         ("a" if j % 2 == 0 else "b"), 1.0)
        for j in range(5)
    ]
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES X.event_id AS x_id, Z.event_id AS z_id
        ONE ROW PER MATCH AFTER MATCH SKIP TO LAST Z
        PATTERN (X Y Z)
        WITHIN INTERVAL '10' MINUTE
        DEFINE X AS X.event_type = 'a', Y AS Y.event_type = 'b',
               Z AS Z.event_type = 'a'"""
    batch = match_recognize(fr(evs), clause).toPandas()
    sent = [
        (9, "2024-01-01 12:00:00", 90, "s", 0.0),
        (9, "2024-01-01 13:00:00", 91, "s", 0.0),
    ]
    src = tmp_path / "src"
    for b in (evs[:3], evs[3:], [sent[0]], [sent[1]]):
        fr(b).coalesce(1).write.mode("append").parquet(str(src))
    sdf = (
        spark.readStream.schema(fr(evs).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "1 minute")
    )
    out = run_to_memory(
        match_recognize_stream(sdf, clause),
        query_name="t_mr_skipto",
        output_mode="update",
    )
    stream = out.filter(F.col("user_id") == 1).toPandas()
    cols = sorted(batch.columns)
    a = sorted(map(repr, stream[cols].itertuples(index=False, name=None)))
    b = sorted(map(repr, batch[cols].itertuples(index=False, name=None)))
    assert a == b and len(a) == 2


# ------------------------------------------------- brute-force fuzz


def _ref_matches(rows, elements, defines, skip, within_s, skip_var=None,
                 nav_defines=None):
    """Independent reference: enumerate ALL feasible contiguous count
    vectors per anchor and pick the preference-lexicographic maximum
    (greedy elements prefer MORE repetitions, reluctant elements
    FEWER — the declarative statement of regex backtracking order:
    the leftmost element's preference decides first). A preferred
    match that is EMPTY is omitted and the scan advances one row
    (the engine's documented empty-match rule). Then apply the
    after-match skip. rows: list of (ts_epoch, event_id, type,
    value), pre-sorted. elements: (var, n_min, n_max, reluctant).
    nav_defines: var -> callable(rows, anchor, pos, run, cand) -> the
    three-valued DEFINE result for a candidate row with ``run`` rows
    already consumed by this element from ``pos`` in the match
    anchored at ``anchor`` — the independent Python spelling of a
    FIRST/LAST-navigation DEFINE (a row is admitted iff True)."""
    n = len(rows)

    def flag(var, i):
        cond = defines.get(var)
        return cond is None or cond(rows[i])

    def pref(vec):
        return tuple(
            -c if elements[j][3] else c for j, c in enumerate(vec)
        )

    out = []
    i = 0
    while i < n:
        vecs = []

        def rec(pos, ei, vec):
            if ei == len(elements):
                vecs.append(tuple(vec))
                return
            var, mn, mx, _rel = elements[ei]
            navf = (nav_defines or {}).get(var)
            cap = (n - pos) if mx is None else min(mx, n - pos)
            for c in range(mn, cap + 1):
                ok = all(flag(var, pos + t) for t in range(c))
                if ok and navf is not None:
                    ok = all(
                        navf(rows, i, pos, t, pos + t) is True
                        for t in range(c)
                    )
                if ok and within_s is not None and pos + c - 1 >= i and c:
                    ok = rows[pos + c - 1][0] - rows[i][0] <= within_s
                if ok:
                    rec(pos + c, ei + 1, vec + [c])

        rec(i, 0, [])
        if not vecs:
            i += 1
            continue
        best = max(vecs, key=pref)
        if sum(best) == 0:
            # the PREFERRED match is empty (all-reluctant optional
            # elements) — omitted, resume at the next row
            i += 1
            continue
        assign, pos = [], i
        for (var, _, _, _), c in zip(elements, best):
            assign.append((var, pos, pos + c))
            pos += c
        out.append((i, pos, assign))
        if skip == "past_last":
            i = pos
        elif skip == "to_next":
            i = i + 1
        else:  # to_first / to_last <var> — fuzz draws guarantee the
            # variable binds >= 1 row and the resume row advances
            vrows = [
                r
                for var, lo, hi in assign
                if var == skip_var
                for r in range(lo, hi)
            ]
            i = vrows[0] if skip == "to_first" else vrows[-1]
    return out


@pytest.mark.parametrize("seed", range(24))
def test_fuzz_vs_bruteforce(spark, seed):
    rng = random.Random(7000 + seed)
    types = ["a", "b", "c"]
    rows = []
    eid = 0
    for uid in (1, 2):
        t = 0.0
        for _ in range(rng.randint(8, 22)):
            t += rng.choice([60.0, 300.0, 1800.0, 7200.0])
            eid += 1
            rows.append((uid, t, eid, rng.choice(types),
                         float(rng.randint(0, 20))))
    # random pattern: 2-3 elements over vars with type-equality
    # defines; quantified elements draw reluctant (lazy) ~35% of the
    # time — preference order is what distinguishes them, so mixed
    # greedy/reluctant chains exercise the leftmost-decides rule
    n_elem = rng.randint(2, 3)
    quants = [(1, 1), (0, 1), (0, None), (1, None), (1, 2), (2, None)]
    elements, defines_sql, defines_py = [], [], {}
    for k in range(n_elem):
        var = f"V{k}"
        mn, mx = rng.choice(quants)
        rel = (mn, mx) != (1, 1) and mn != mx and rng.random() < 0.35
        elements.append((var, mn, mx, rel))
        if rng.random() < 0.8:
            ty = rng.choice(types)
            defines_sql.append(f"{var} AS {var}.event_type = '{ty}'")
            defines_py[var] = (lambda ty: lambda r: r[2] == ty)(ty)
    if all(mn == 0 for _, mn, _, _ in elements):
        elements[0] = (elements[0][0], 1, elements[0][2], elements[0][3])
    # variable-targeted skips are drawn only where they are statically
    # safe: the target binds >= 1 row (no miss) and at least one
    # earlier element consumes >= 1 row (the resume always advances)
    skip_choices = [("past_last", None), ("to_next", None)]
    for j, (v, mn, _mx, _r) in enumerate(elements):
        if j >= 1 and mn >= 1 and any(e[1] >= 1 for e in elements[:j]):
            skip_choices += [("to_first", v), ("to_last", v)]
    skip, skip_var = rng.choice(skip_choices)
    within = rng.choice([None, 3600.0, 14400.0])

    pat = " ".join(
        v
        + {(1, 1): "", (0, 1): "?", (0, None): "*", (1, None): "+",
           (1, 2): "{1,2}", (2, None): "{2,}"}[(mn, mx)]
        + ("?" if rel else "")
        for v, mn, mx, rel in elements
    )
    measures = ", ".join(
        [f"FIRST({v}.event_id) AS first_{v.lower()}"
         for v, _, _, _ in elements]
        + [f"COUNT({v}.*) AS n_{v.lower()}" for v, _, _, _ in elements]
        + ["MATCH_NUMBER() AS mno", "COUNT(*) AS n_rows"]
    )
    skip_sql = {
        "past_last": "PAST LAST ROW",
        "to_next": "TO NEXT ROW",
        "to_first": f"TO FIRST {skip_var}",
        "to_last": f"TO LAST {skip_var}",
    }[skip]
    clause = (
        f"PARTITION BY user_id ORDER BY ts MEASURES {measures} "
        f"AFTER MATCH SKIP {skip_sql} "
        f"PATTERN ({pat}) "
        + (f"WITHIN INTERVAL '{int(within)}' SECOND " if within else "")
        + ("DEFINE " + ", ".join(defines_sql) if defines_sql else "")
    )

    from datetime import datetime, timezone

    df = spark.createDataFrame(
        [
            (u, datetime.fromtimestamp(t, tz=timezone.utc)
             .replace(tzinfo=None), e, ty, v)
            for u, t, e, ty, v in rows
        ],
        "user_id long, ts timestamp, event_id long, event_type string, "
        "value double",
    )
    got = sorted(
        repr(tuple(r)) for r in match_recognize(df, clause).collect()
    )

    expect = []
    for uid in (1, 2):
        urows = sorted(
            [(t, e, ty, v) for u, t, e, ty, v in rows if u == uid],
            key=lambda r: (r[0], r[1]),
        )
        for mno, (s, e, assign) in enumerate(
            _ref_matches(
                urows, elements, defines_py, skip, within, skip_var
            ),
            1,
        ):
            by = {var: (lo, hi) for var, lo, hi in assign}
            rec = [uid]
            for v, _, _, _ in elements:
                lo, hi = by[v]
                rec.append(urows[lo][1] if hi > lo else None)
            for v, _, _, _ in elements:
                lo, hi = by[v]
                rec.append(hi - lo)
            rec.extend([mno, e - s])
            expect.append(repr(tuple(rec)))
    assert got == sorted(expect), f"seed {seed}: {clause}"

    # eligible seeds (all-singleton patterns) must route identically
    # through the relational fast path and the forced NFA
    if all((mn, mx) == (1, 1) for _, mn, mx, _ in elements):
        rel = match_recognize(df, clause)  # auto -> relational
        plan = rel._jdf.queryExecution().executedPlan().toString()
        if skip == "to_next":
            # TO NEXT emits candidates directly: never a Python stage
            assert "FlatMapGroupsInPandas" not in plan
        nfa = sorted(
            repr(tuple(r))
            for r in match_recognize(df, clause, engine="nfa").collect()
        )
        assert sorted(repr(tuple(r)) for r in rel.collect()) == nfa


@pytest.mark.parametrize("seed", range(14))
def test_fuzz_nav_define_vs_bruteforce(spark, seed):
    """FIRST/LAST navigation in DEFINE vs the independent brute force:
    three shapes (falling runs via LAST(V,1), run-start band via
    FIRST(V,0), cross-variable anchor comparison via LAST(S,0)), with
    NULL values mixed in to exercise three-valued logic, greedy and
    reluctant quantifiers, both row-based skips, and optional WITHIN.
    The brute-force twin spells each navigation directly in Python
    (full enumeration + preference-lexicographic max — a different
    algorithm from the NFA's backtracking scan)."""
    rng = random.Random(11500 + seed)
    rows = []
    eid = 0
    for uid in (1, 2):
        t = 0.0
        for _ in range(rng.randint(10, 24)):
            t += rng.choice([60.0, 300.0, 1800.0])
            eid += 1
            v = (
                None
                if rng.random() < 0.12
                else float(rng.randint(0, 12))
            )
            rows.append((uid, t, eid, rng.choice(["a", "b"]), v))

    shape = seed % 3
    rel = rng.random() < 0.35
    lazy = "?" if rel else ""
    if shape == 0:
        # falling runs: previous-run-row comparison; a NULL previous
        # value makes LAST(V,1) IS NULL true (row admitted)
        pat = f"A+{lazy}"
        define = ("A AS LAST(A.value, 1) IS NULL "
                  "OR A.value < LAST(A.value, 1)")
        elements = [("A", 1, None, rel)]

        def nav_a(rows_, anchor, pos, run, cand):
            if run == 0:
                return True
            prev = rows_[cand - 1][3]
            if prev is None:
                return True
            v = rows_[cand][3]
            return v is not None and v < prev

        navs = {"A": nav_a}
        defines_py = {}
    elif shape == 1:
        # run-start band: every run row within the first run row's
        # value (NULL first or current value -> not admitted)
        pat = f"A{{1,3}}{lazy}"
        define = "A AS FIRST(A.value, 0) >= A.value"
        elements = [("A", 1, 3, rel)]

        def nav_a(rows_, anchor, pos, run, cand):
            f, v = rows_[pos][3], rows_[cand][3]
            return f is not None and v is not None and f >= v

        navs = {"A": nav_a}
        defines_py = {}
    else:
        # cross-variable: run rows below the anchor row's value
        pat = f"S A+{lazy} E"
        define = ("S AS S.event_type = 'a', "
                  "A AS A.value < LAST(S.value, 0), "
                  "E AS E.event_type = 'b'")
        elements = [("S", 1, 1, False), ("A", 1, None, rel),
                    ("E", 1, 1, False)]

        def nav_a(rows_, anchor, pos, run, cand):
            sv, v = rows_[anchor][3], rows_[cand][3]
            return sv is not None and v is not None and v < sv

        navs = {"A": nav_a}
        defines_py = {
            "S": lambda r: r[2] == "a",
            "E": lambda r: r[2] == "b",
        }

    skip = rng.choice(["past_last", "to_next"])
    within = rng.choice([None, 3600.0])
    skip_sql = ("PAST LAST ROW" if skip == "past_last"
                else "TO NEXT ROW")
    measures = ", ".join(
        [f"FIRST({v}.event_id) AS first_{v.lower()}"
         for v, _, _, _ in elements]
        + [f"COUNT({v}.*) AS n_{v.lower()}" for v, _, _, _ in elements]
        + ["MATCH_NUMBER() AS mno", "COUNT(*) AS n_rows"]
    )
    clause = (
        f"PARTITION BY user_id ORDER BY ts MEASURES {measures} "
        f"AFTER MATCH SKIP {skip_sql} PATTERN ({pat}) "
        + (f"WITHIN INTERVAL '{int(within)}' SECOND " if within else "")
        + f"DEFINE {define}"
    )

    from datetime import datetime, timezone

    df = spark.createDataFrame(
        [
            (u, datetime.fromtimestamp(t, tz=timezone.utc)
             .replace(tzinfo=None), e, ty, v)
            for u, t, e, ty, v in rows
        ],
        "user_id long, ts timestamp, event_id long, event_type string, "
        "value double",
    )
    got = sorted(
        repr(tuple(r)) for r in match_recognize(df, clause).collect()
    )

    expect = []
    for uid in (1, 2):
        urows = sorted(
            [(t, e, ty, v) for u, t, e, ty, v in rows if u == uid],
            key=lambda r: (r[0], r[1]),
        )
        for mno, (s, e, assign) in enumerate(
            _ref_matches(
                urows, elements, defines_py, skip, within,
                nav_defines=navs,
            ),
            1,
        ):
            by = {var: (lo, hi) for var, lo, hi in assign}
            rec = [uid]
            for v, _, _, _ in elements:
                lo, hi = by[v]
                rec.append(urows[lo][1] if hi > lo else None)
            for v, _, _, _ in elements:
                lo, hi = by[v]
                rec.append(hi - lo)
            rec.extend([mno, e - s])
            expect.append(repr(tuple(rec)))
    assert got == sorted(expect), f"seed {seed}: {clause}"


@pytest.mark.parametrize("seed", range(16))
def test_fuzz_relational_vs_nfa_singletons(spark, seed):
    """Dedicated both-paths fuzz on ELIGIBLE (singleton) patterns:
    random 2-4 element chains, random defines (including undefined
    variables -> overlapping candidates), both skip modes, random
    WITHIN — the relational compilation must equal the forced NFA
    row-for-row, including MATCH_NUMBER numbering."""
    rng = random.Random(9100 + seed)
    types = ["a", "b", "c"]
    rows = []
    eid = 0
    for uid in (1, 2, 3):
        t = 0.0
        for _ in range(rng.randint(8, 25)):
            t += rng.choice([60.0, 300.0, 1800.0, 7200.0])
            eid += 1
            # ~15% NULL values: SUM/AVG/MIN/MAX must follow SQL NULL
            # semantics identically on both engines (NULLs skipped,
            # all-NULL aggregates -> NULL)
            val = (
                None if rng.random() < 0.15 else float(rng.randint(0, 20))
            )
            rows.append((uid, t, eid, rng.choice(types), val))
    k = rng.randint(2, 4)
    variables = [f"V{j}" for j in range(k)]
    if rng.random() < 0.3 and k >= 3:
        variables[-1] = variables[0]  # repeated variable positions
    defines = []
    for v in dict.fromkeys(variables):
        if rng.random() < 0.75:
            defines.append(f"{v} AS {v}.event_type = '{rng.choice(types)}'")
    # singleton patterns always bind every variable, so the only
    # skip-to safety constraint is the parse-time one: the target's
    # first (TO FIRST) / last (TO LAST) position must not be the
    # anchor
    vpos: dict[str, list[int]] = {}
    for j, v in enumerate(variables):
        vpos.setdefault(v, []).append(j)
    skip_opts = ["PAST LAST ROW", "TO NEXT ROW"]
    for v, ps in vpos.items():
        if ps[0] >= 1:
            skip_opts.append(f"TO FIRST {v}")
        if ps[-1] >= 1:
            skip_opts.append(f"TO LAST {v}")
    skip = rng.choice(skip_opts)
    within = rng.choice([None, 3600.0, 14400.0])
    v0 = variables[0]
    measures = ", ".join(
        [f"{v0}.event_id AS a_id", f"FIRST({v0}.ts) AS a_ts",
         f"LAST({variables[-1]}.event_id) AS z_id",
         f"SUM({v0}.value) AS s_v", f"AVG({v0}.value) AS m_v",
         f"MIN({v0}.event_id) AS mn_v", f"MAX({v0}.event_id) AS mx_v",
         f"COUNT({v0}.*) AS n_v", "COUNT(*) AS n_rows",
         "MATCH_NUMBER() AS mno"]
    )
    clause = (
        f"PARTITION BY user_id ORDER BY ts MEASURES {measures} "
        f"ONE ROW PER MATCH AFTER MATCH SKIP {skip} "
        f"PATTERN ({' '.join(variables)}) "
        + (f"WITHIN INTERVAL '{int(within)}' SECOND " if within else "")
        + ("DEFINE " + ", ".join(defines) if defines else "")
    )
    from datetime import datetime, timezone

    df = spark.createDataFrame(
        [
            (u, datetime.fromtimestamp(t, tz=timezone.utc)
             .replace(tzinfo=None), e, ty, v)
            for u, t, e, ty, v in rows
        ],
        "user_id long, ts timestamp, event_id long, event_type string, "
        "value double",
    )
    rel = match_recognize(df, clause, engine="relational")
    nfa = match_recognize(df, clause, engine="nfa")
    assert [f.name for f in rel.schema] == [f.name for f in nfa.schema]
    assert [f.dataType for f in rel.schema] == [
        f.dataType for f in nfa.schema
    ], f"seed {seed}: {clause}"
    a = sorted(repr(tuple(r)) for r in rel.collect())
    b = sorted(repr(tuple(r)) for r in nfa.collect())
    assert a == b, f"seed {seed}: {clause}"


@pytest.mark.parametrize("seed", range(16))
def test_fuzz_relational_vs_nfa_runs(spark, seed):
    """Both-paths fuzz on single-variable RUN patterns (the round-6
    fast path): random quantifier position/bounds (including {0,n}
    optional runs and unbounded {m,}), random defines (undefined ->
    always-true, overlapping suffixes), both skip modes, ONE and ALL
    ROWS, random WITHIN — the relational band-join compilation must
    equal the forced NFA row-for-row. Ineligible draws (trailing
    optional run) are asserted to route to the NFA instead. Odd
    seeds generate ~40% DUPLICATE timestamps so the total-order
    tie-break (event_id) is exercised at island boundaries, WITHIN
    edges, and greedy selection — where ts-only identities break."""
    import random as _random
    from datetime import datetime, timezone

    from flink_framework_spark.operators.match_recognize import (
        _run_pattern_info,
        parse_match_recognize,
    )

    rng = _random.Random(7000 + seed)
    dup_ts = seed % 2 == 1
    rows = []
    eid = 0
    for uid in (1, 2, 3):
        t = 0.0
        for _ in range(rng.randint(8, 28)):
            if not (dup_ts and rng.random() < 0.4):
                t += rng.choice([60.0, 300.0, 1800.0, 7200.0])
            eid += 1
            val = None if rng.random() < 0.2 else float(rng.randint(0, 20))
            rows.append(
                (
                    uid,
                    datetime.fromtimestamp(t, tz=timezone.utc).replace(
                        tzinfo=None
                    ),
                    eid,
                    rng.choice(["a", "b", "c"]),
                    val,
                )
            )
    df = spark.createDataFrame(
        rows,
        "user_id long, ts timestamp, event_id long, event_type string, "
        "value double",
    )
    k = rng.randint(1, 4)
    qi = rng.randrange(k)
    m = rng.choice([0, 1, 2, 3])
    nmax = rng.choice([None, None, m + rng.randint(0, 3)])
    # reluctant runs flip greedy's max-end argmax to an argmin and
    # disable the island-start selection proof — draw them ~40%
    rel_q = rng.random() < 0.4
    names = [f"V{j}" for j in range(k)]
    qv = names[qi]
    pat = []
    for j, v in enumerate(names):
        if j == qi:
            if nmax is None:
                pat.append(f"{v}{{{m},}}" if m != 1 else f"{v}+")
            else:
                pat.append(f"{v}{{{m},{nmax}}}")
            if rel_q:
                pat[-1] += "?"
        else:
            pat.append(v)
    defines = []
    for v in names:
        r = rng.random()
        if r < 0.55:
            defines.append(
                f"{v} AS {v}.event_type = '{rng.choice(['a', 'b', 'c'])}'"
            )
        elif r < 0.7:
            defines.append(f"{v} AS {v}.value >= {rng.randint(0, 15)}")
        elif r < 0.85:
            # physical navigation: both engines read the same
            # precomputed lag/lead flag, so any disagreement is a
            # compiler bug, not a navigation bug
            nav = rng.choice(
                [
                    f"{v}.value < PREV({v}.value)",
                    f"{v}.value >= PREV({v}.value, 2)",
                    f"NEXT({v}.value) > {v}.value",
                ]
            )
            defines.append(f"{v} AS {nav}")
    # variable-targeted skips drawn only where statically safe (the
    # target binds >= 1 row; something before it consumes >= 1 row)
    nmins = [m if j == qi else 1 for j in range(k)]
    skips = ["PAST LAST ROW", "TO NEXT ROW"]
    for j in range(1, k):
        if nmins[j] >= 1 and sum(nmins[:j]) >= 1:
            skips += [f"TO FIRST {names[j]}", f"TO LAST {names[j]}"]
    skip = rng.choice(skips)
    within = rng.choice([None, 3600.0, 14400.0, 86400.0])
    rowsmode = rng.choice(["ONE ROW PER MATCH", "ALL ROWS PER MATCH"])
    meas = [
        f"COUNT({qv}.*) AS n_q",
        f"SUM({qv}.value) AS s_q",
        f"AVG({qv}.value) AS m_q",
        f"FIRST({qv}.event_id) AS f_q",
        f"LAST({qv}.event_id) AS l_q",
        "COUNT(*) AS n_all",
        "CLASSIFIER() AS cls",
        "MATCH_NUMBER() AS mno",
        # FINAL twins — only observable under ALL ROWS, but drawn
        # unconditionally so ONE ROW pins their coincidence too
        f"FINAL SUM({qv}.value) AS s_q_f",
        f"FINAL LAST({qv}.event_id) AS l_q_f",
        "FINAL CLASSIFIER() AS cls_f",
        "FINAL COUNT(*) AS n_all_f",
    ] + [f"{v}.event_id AS id_{j}" for j, v in enumerate(names) if j != qi]
    if rowsmode == "ONE ROW PER MATCH":
        # logical offsets (ALL ROWS + offsets is an NFA-only class,
        # asserted by the refusal branch below when drawn there)
        meas += [
            f"FIRST({qv}.event_id, 1) AS f_q1",
            f"LAST({qv}.event_id, {rng.randint(1, 3)}) AS l_qn",
        ]
    clause = (
        f"PARTITION BY user_id ORDER BY ts MEASURES {', '.join(meas)} "
        f"{rowsmode} AFTER MATCH SKIP {skip} PATTERN ({' '.join(pat)}) "
        + (f"WITHIN INTERVAL '{int(within)}' SECOND " if within else "")
        + ("DEFINE " + ", ".join(defines) if defines else "")
    )
    spec = parse_match_recognize(clause)
    if _run_pattern_info(spec) is None:
        # trailing optional run: NFA only, relational must refuse
        with pytest.raises(ValueError):
            match_recognize(df, clause, engine="relational")
        return
    rel = match_recognize(df, clause, engine="relational")
    nfa = match_recognize(df, clause, engine="nfa")
    assert [f.dataType for f in rel.schema] == [
        f.dataType for f in nfa.schema
    ], f"seed {seed}: {clause}"
    a = sorted(repr(tuple(r)) for r in rel.collect())
    b = sorted(repr(tuple(r)) for r in nfa.collect())
    assert a == b, f"seed {seed}: {clause}"


# ------------------------------------------------ engine-level checks


_STRICT_PAIR = """
    PARTITION BY user_id ORDER BY ts
    MEASURES A.event_id AS a_id, B.event_id AS b_id
    PATTERN (A B)
    DEFINE A AS A.event_type = 'view',
           B AS B.event_type = 'purchase'"""


def test_single_shuffle_plan(spark, sf_dir):
    """Singleton patterns compile to the relational fast path: one
    keyed shuffle, ONE Window node, and — with disjoint DEFINEs — no
    Python stage at all. The NFA stays available behind engine='nfa'
    (same single-shuffle shape) and both agree on the data."""
    from flink_framework_spark.io import table

    ev = table(spark, sf_dir, "events")
    out = match_recognize(ev, _STRICT_PAIR)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one shuffle on the key
    for py_stage in ("FlatMapGroupsInPandas", "ArrowEvalPython",
                     "BatchEvalPython", "MapInPandas"):
        assert py_stage not in plan, py_stage
    assert plan.count("Window") >= 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

    nfa = match_recognize(ev, _STRICT_PAIR, engine="nfa")
    nplan = nfa._jdf.queryExecution().executedPlan().toString()
    assert nplan.count("Exchange") == 1
    assert "MapInPandas" in nplan  # the Arrow NFA operator (batched)

    a = sorted(repr(tuple(r)) for r in out.collect())
    b = sorted(repr(tuple(r)) for r in nfa.collect())
    assert a == b and len(a) > 0


def test_single_quantifier_compiles_relationally(spark, sf_dir):
    """``A+ B`` is a single-variable run: it must compile onto the
    windows + band-join plan with NO Python stage (the suffix DEFINE
    is literal-disjoint from the run's, so even the PAST LAST
    selection is relational), and agree with the NFA."""
    from flink_framework_spark.io import table

    ev = table(spark, sf_dir, "events")
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(A.*) AS n_a, B.event_id AS b_id
        PATTERN (A+ B)
        DEFINE A AS A.event_type = 'click',
               B AS B.event_type = 'purchase'"""
    out = match_recognize(ev, clause)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for py_stage in ("FlatMapGroupsInPandas", "ArrowEvalPython",
                     "BatchEvalPython", "MapInPandas"):
        assert py_stage not in plan, py_stage
    assert "CartesianProduct" not in plan
    a = sorted(repr(tuple(r)) for r in out.collect())
    b = sorted(
        repr(tuple(r))
        for r in match_recognize(ev, clause, engine="nfa").collect()
    )
    assert a == b and len(a) > 0


def test_multi_quantifier_pattern_keeps_nfa(spark, sf_dir):
    """Two quantified variables need genuine backtracking (how A* and
    B* split a run is a search) — stays on the Arrow NFA."""
    from flink_framework_spark.io import table

    ev = table(spark, sf_dir, "events")
    out = match_recognize(ev, """
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(A.*) AS n_a, COUNT(B.*) AS n_b, C.event_id AS c_id
        PATTERN (A+ B* C)
        DEFINE A AS A.event_type = 'click',
               C AS C.event_type = 'purchase'""")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # the batched Arrow NFA


def test_trailing_optional_run_keeps_nfa(spark, sf_dir):
    """``A B*`` (trailing optional run): its c=0 matches have no end
    row to anchor the band join on — stays on the NFA."""
    from flink_framework_spark.io import table

    ev = table(spark, sf_dir, "events")
    out = match_recognize(ev, """
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, COUNT(B.*) AS n_b
        PATTERN (A B*)
        DEFINE A AS A.event_type = 'signup',
               B AS B.event_type = 'click'""")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # the batched Arrow NFA


def test_engine_relational_rejects_multi_quantifier(spark, sf_dir):
    from flink_framework_spark.io import table

    ev = table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="single-variable run"):
        match_recognize(ev, """
            PARTITION BY user_id ORDER BY ts
            MEASURES COUNT(A.*) AS n_a, B.event_id AS b_id
            PATTERN (A* B+ C)
            DEFINE B AS B.event_type = 'purchase'""",
            engine="relational")


def test_run_min_max_measure_keeps_nfa(spark, sf_dir):
    """MIN/MAX over the quantified variable has no prefix-sum
    spelling — the run compiler refuses it and the NFA answers."""
    from flink_framework_spark.io import table

    ev = table(spark, sf_dir, "events")
    out = match_recognize(ev, """
        PARTITION BY user_id ORDER BY ts
        MEASURES MIN(A.value) AS mn, B.event_id AS b_id
        PATTERN (A+ B)
        DEFINE A AS A.event_type = 'click',
               B AS B.event_type = 'purchase'""")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # the batched Arrow NFA


def test_overlapping_candidates_greedy_selection(spark):
    """SKIP PAST LAST ROW with NON-disjoint DEFINEs (both elements
    match 'a' rows, so candidates overlap): the relational path's
    greedy candidate selection must reproduce the NFA's left-to-right
    consumption exactly, and TO NEXT ROW must keep every candidate."""
    rows = (
        # user 1: a,a,a,a,a -> (A A) matches rows 0-1 and 2-3 under
        # PAST LAST (row 4 unpaired); TO NEXT gives all 4 candidates
        [(1, f"2024-01-01 00:{i:02d}:00", i + 1, "a", 0.0) for i in range(5)]
        # user 2: x,a,a,a -> PAST LAST matches rows 1-2 only
        + [
            (2, f"2024-01-01 00:{i:02d}:00", i + 10, ty, 0.0)
            for i, ty in enumerate(["x", "a", "a", "a"])
        ]
    )
    df = frame(spark, rows)
    for skip in ("PAST LAST ROW", "TO NEXT ROW"):
        clause = f"""
            PARTITION BY user_id ORDER BY ts
            MEASURES A.event_id AS a_id, B.event_id AS b_id,
                     MATCH_NUMBER() AS mno
            ONE ROW PER MATCH
            AFTER MATCH SKIP {skip}
            PATTERN (A B)
            DEFINE A AS A.event_type = 'a',
                   B AS B.event_type = 'a'"""
        rel = match_recognize(df, clause)
        plan = rel._jdf.queryExecution().executedPlan().toString()
        if skip == "PAST LAST ROW":
            # overlap possible -> batched pick selection over candidates
            assert "MapInPandas" in plan
        else:
            assert "MapInPandas" not in plan
            assert "FlatMapGroupsInPandas" not in plan
        got = sorted(repr(tuple(r)) for r in rel.collect())
        nfa = sorted(
            repr(tuple(r))
            for r in match_recognize(df, clause, engine="nfa").collect()
        )
        assert got == nfa
        if skip == "PAST LAST ROW":
            assert len(got) == 3
        else:
            assert len(got) == 4 + 2


# ------------------------------------------------- streaming twin


MR_STREAM_CLAUSE = """
    PARTITION BY user_id ORDER BY ts
    MEASURES S.event_id AS s_id, P.event_id AS p_id,
             COUNT(F.*) AS n_f, MATCH_NUMBER() AS mno
    ONE ROW PER MATCH
    AFTER MATCH SKIP TO NEXT ROW
    PATTERN (S F* P)
    WITHIN INTERVAL '3' DAY
    DEFINE S AS S.event_type = 'signup',
           F AS F.event_type <> 'error',
           P AS P.event_type = 'purchase'"""


def test_mr_stream_matches_batch(spark, sf_dir, tmp_path):
    """The streaming MATCH_RECOGNIZE drains to EXACTLY the batch
    result (ids, filler counts, and MATCH_NUMBER continuity) once
    sentinel batches push the watermark past every anchor's WITHIN
    window and fire the re-fire timers."""
    import shutil

    from flink_framework_spark.io import _normalize_events_ts, table
    from flink_framework_spark.streaming.mr import match_recognize_stream
    from flink_framework_spark.streaming.twins import run_to_memory

    batch = match_recognize(
        table(spark, sf_dir, "events"), MR_STREAM_CLAUSE
    ).toPandas()

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "part-0.parquet")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    for i, day in enumerate(("2099-01-01", "2099-01-02")):
        sent = raw.limit(1).select(
            F.lit(-1000 - i).alias("event_id"),
            F.lit(day).cast(raw.schema["ts"].dataType).alias("ts"),
            F.lit(-1).alias("user_id"),
            F.lit("sentinel").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        sent.coalesce(1).write.mode("append").parquet(str(src))

    sdf = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sdf = _normalize_events_ts(sdf, as_instant=True).withWatermark(
        "ts", "10 minutes"
    )
    out = run_to_memory(
        match_recognize_stream(sdf, MR_STREAM_CLAUSE),
        query_name="t_mr_stream",
        output_mode="update",
    )
    stream = out.filter(F.col("user_id") >= 0).toPandas()
    assert len(stream) == len(batch) > 0
    cols = sorted(batch.columns)
    a = sorted(map(repr, stream[cols].itertuples(index=False, name=None)))
    b = sorted(map(repr, batch[cols].itertuples(index=False, name=None)))
    assert a == b


def test_mr_stream_greedy_waits_for_window_close(spark, tmp_path):
    """Greedy finalization is watermark-gated: a purchase arriving in
    a LATER batch (still inside the anchor's WITHIN window) must win
    the greedy F* binding — eager per-batch emission would have bound
    the earlier purchase."""
    from flink_framework_spark.streaming.mr import match_recognize_stream
    from flink_framework_spark.streaming.twins import run_to_memory

    def fr(spark, rows):
        return spark.createDataFrame(
            [(e, f"2024-01-01 {h:02d}:{m:02d}:00", u, t, 0.0)
             for (u, e, h, m, t) in rows],
            "event_id long, ts string, user_id long, event_type string, "
            "value double",
        ).selectExpr(
            "user_id", "CAST(ts AS timestamp) AS ts", "event_id",
            "event_type", "value",
        )

    b1 = [(1, 1, 10, 0, "signup"), (1, 2, 10, 10, "purchase")]
    b2 = [(1, 3, 10, 20, "purchase")]
    b3 = [(9, 90, 12, 0, "click")]    # watermark -> 11:50 (> 10:00 + 1h)
    b4 = [(9, 91, 12, 30, "click")]   # fires user 1's re-fire timer
    src = tmp_path / "src"
    for b in (b1, b2, b3, b4):
        fr(spark, b).coalesce(1).write.mode("append").parquet(str(src))
    sdf = (
        spark.readStream.schema(fr(spark, b1).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "10 minutes")
    )
    clause = """PARTITION BY user_id ORDER BY ts
        MEASURES S.event_id AS s_id, P.event_id AS p_id, COUNT(F.*) AS n_f
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (S F* P)
        WITHIN INTERVAL '1' HOUR
        DEFINE S AS S.event_type = 'signup',
               F AS F.event_type <> 'error',
               P AS P.event_type = 'purchase'"""
    out = run_to_memory(
        match_recognize_stream(sdf, clause),
        query_name="t_mr_greedy",
        output_mode="update",
    )
    rows = [(r.s_id, r.p_id, r.n_f)
            for r in out.filter(F.col("user_id") == 1).collect()]
    # greedy binds the 10:20 purchase (farthest within the hour); the
    # 10:10 purchase is consumed by F*
    assert rows == [(1, 3, 1)]


def test_mr_stream_join_lowering_matches_nfa_and_batch(spark, tmp_path):
    """The eligible PATTERN (A B) class lowers to the JVM
    stream-stream join machine (candidate interval join + LEFT OUTER
    adjacency join): match set == the forced-NFA twin == batch,
    including same-timestamp tie rows resolved by the (ts, id) total
    order."""
    import random as _random

    from flink_framework_spark.streaming.mr import match_recognize_stream
    from flink_framework_spark.streaming.twins import run_to_memory

    rng = _random.Random(42)
    rows, eid = [], 0
    for uid in range(1, 6):
        t0 = 0
        for _ in range(30):
            t0 += rng.choice([30, 120, 600])
            eid += 1
            hh, rem = divmod(t0, 3600)
            mm, ss = divmod(rem, 60)
            rows.append((
                uid, f"2024-01-01 {10 + hh:02d}:{mm:02d}:{ss:02d}", eid,
                rng.choice(["view", "click", "purchase"]),
                float(rng.randint(0, 9)),
            ))
    # same-ts ties: adjacency must follow the (ts, id) order
    rows += [
        (1, "2024-01-01 10:00:30", 9001, "view", 1.0),
        (1, "2024-01-01 10:00:30", 9002, "purchase", 2.0),
        (1, "2024-01-01 10:00:30", 9003, "view", 3.0),
    ]
    # a NULL partition key is a real partition on every engine (the
    # join lowering must use null-safe key equality)
    rows += [
        (None, "2024-01-01 10:00:00", 9101, "view", 1.0),
        (None, "2024-01-01 10:01:00", 9102, "purchase", 2.0),
    ]
    # a NULL-id intruder still breaks adjacency (the null-intruder
    # filter must key on a literal marker, not the data id column)
    rows += [
        (7, "2024-01-01 10:00:00", 9201, "view", 1.0),
        (7, "2024-01-01 10:01:00", None, "click", 0.0),
        (7, "2024-01-01 10:02:00", 9203, "purchase", 2.0),
    ]
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, B.event_id AS b_id, B.value AS b_v
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B)
        WITHIN INTERVAL '10' MINUTE
        DEFINE A AS A.event_type = 'view',
               B AS B.event_type = 'purchase'"""
    batch = sorted(map(repr, (
        (r.a_id, r.b_id, r.b_v)
        for r in match_recognize(frame(spark, rows), clause).collect()
    )))
    assert len(batch) > 0

    src = tmp_path / "src"
    sent = [(99, "2024-01-02 00:00:00", 99990, "s", 0.0),
            (99, "2024-01-03 00:00:00", 99991, "s", 0.0)]
    for ch in (rows[:60], rows[60:], [sent[0]], [sent[1]]):
        frame(spark, ch).coalesce(1).write.mode("append").parquet(str(src))

    def drain(engine, mode):
        sdf = (
            spark.readStream.schema(frame(spark, rows).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .withWatermark("ts", "1 minute")
        )
        out = run_to_memory(
            match_recognize_stream(sdf, clause, engine=engine),
            query_name=f"t_mrj_{engine}",
            output_mode=mode,
        )
        return sorted(map(repr, (
            (r.a_id, r.b_id, r.b_v) for r in out.collect()
        )))

    joined = drain("join", "append")
    nfa = drain("nfa", "update")
    assert joined == batch
    assert nfa == batch
    # the NULL-key partition's match survived on every path...
    assert repr((9101, 9102, 2.0)) in joined
    # ...and the NULL-id intruder's pair was rejected on every path
    assert not any("9201" in m for m in joined)
    # the join path is a pure JVM plan — no Python stages anywhere
    sdf = (
        spark.readStream.schema(frame(spark, rows).schema)
        .parquet(str(src)).withWatermark("ts", "1 minute")
    )
    auto = match_recognize_stream(sdf, clause)  # auto routes to join
    plan = auto._jdf.queryExecution().analyzed().toString()
    assert "FlatMapGroupsInPandas" not in plan


def test_mr_stream_chain_join_matches_nfa_and_batch(spark, tmp_path):
    """The k-chain generalization: an all-singleton PATTERN (A B C)
    lowers to 2 cascaded candidate joins + 2 adjacency outers (zero
    Python) with the same match set as the forced NFA and batch —
    three CONSECUTIVE rows whose flags line up inside WITHIN."""
    import random as _random

    from flink_framework_spark.streaming.mr import match_recognize_stream
    from flink_framework_spark.streaming.twins import run_to_memory

    rng = _random.Random(77)
    rows, eid = [], 0
    for uid in range(1, 6):
        t0 = 0
        for _ in range(40):
            t0 += rng.choice([30, 120, 600])
            eid += 1
            hh, rem = divmod(t0, 3600)
            mm, ss = divmod(rem, 60)
            rows.append((
                uid, f"2024-01-01 {10 + hh:02d}:{mm:02d}:{ss:02d}", eid,
                rng.choice(["view", "click", "purchase"]),
                float(rng.randint(0, 9)),
            ))
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, B.event_id AS b_id,
                 C.event_id AS c_id, C.value AS c_v
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B C)
        WITHIN INTERVAL '30' MINUTE
        DEFINE A AS A.event_type = 'view',
               B AS B.event_type = 'click',
               C AS C.event_type = 'purchase'"""
    batch = sorted(map(repr, (
        (r.a_id, r.b_id, r.c_id, r.c_v)
        for r in match_recognize(frame(spark, rows), clause).collect()
    )))
    assert len(batch) > 0

    src = tmp_path / "src"
    sent = [(99, "2024-01-02 00:00:00", 99990, "s", 0.0),
            (99, "2024-01-03 00:00:00", 99991, "s", 0.0)]
    for ch in (rows[:100], rows[100:], [sent[0]], [sent[1]]):
        frame(spark, ch).coalesce(1).write.mode("append").parquet(str(src))

    def drain(engine, mode):
        sdf = (
            spark.readStream.schema(frame(spark, rows).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .withWatermark("ts", "1 minute")
        )
        out = run_to_memory(
            match_recognize_stream(sdf, clause, engine=engine),
            query_name=f"t_mrc_{engine}",
            output_mode=mode,
        )
        return sorted(map(repr, (
            (r.a_id, r.b_id, r.c_id, r.c_v) for r in out.collect()
        )))

    assert drain("join", "append") == batch
    assert drain("nfa", "update") == batch


def test_define_nav_all_rows(spark):
    """nav-DEFINE composes with ALL ROWS PER MATCH: per-row emission
    with RUNNING vs FINAL counts over falling-run islands."""
    vals = [10.0, 8.0, 5.0, 7.0, 4.0]
    df = frame(spark, [
        (1, "2024-01-01 10:0%d:00" % j, j + 1, "t", v)
        for j, v in enumerate(vals)
    ])
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES CLASSIFIER() AS cls, COUNT(DOWN.*) AS n,
                 FINAL COUNT(DOWN.*) AS n_f, MATCH_NUMBER() AS mno
        ALL ROWS PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (DOWN+)
        DEFINE DOWN AS LAST(DOWN.value, 1) IS NULL
                       OR DOWN.value < LAST(DOWN.value, 1)"""
    got = [
        (r.event_id, r.cls, r.n, r.n_f, r.mno)
        for r in match_recognize(df, clause).collect()
    ]
    # islands [10,8,5] and [7,4]: running n grows per row, FINAL is
    # the whole-match count on every member row
    assert got == [
        (1, "DOWN", 1, 3, 1), (2, "DOWN", 2, 3, 1),
        (3, "DOWN", 3, 3, 1),
        (4, "DOWN", 1, 2, 2), (5, "DOWN", 2, 2, 2),
    ]


def test_mr_stream_join_constant_measures(spark, tmp_path):
    """COUNT(V.*), COUNT(*), and CLASSIFIER() are constants on an
    all-singleton chain — the join lowering emits the literals and
    must equal the NFA twin."""
    from flink_framework_spark.streaming.mr import match_recognize_stream
    from flink_framework_spark.streaming.twins import run_to_memory

    evs = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0),
        (1, "2024-01-01 10:01:00", 2, "purchase", 2.0),
        (1, "2024-01-01 10:05:00", 3, "view", 3.0),
        (1, "2024-01-01 10:06:00", 4, "purchase", 4.0),
    ]
    sent = [(9, "2024-01-02 00:00:00", 90, "s", 0.0),
            (9, "2024-01-03 00:00:00", 91, "s", 0.0)]
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, COUNT(B.*) AS n_b,
                 COUNT(*) AS n_rows, CLASSIFIER() AS cls
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B)
        WITHIN INTERVAL '10' MINUTE
        DEFINE A AS A.event_type = 'view',
               B AS B.event_type = 'purchase'"""
    batch = sorted(map(repr, (
        tuple(r)
        for r in match_recognize(frame(spark, evs), clause).collect()
    )))
    assert batch == sorted(map(repr, [
        (1, 1, 1, 2, "B"), (1, 3, 1, 2, "B"),
    ]))
    src = tmp_path / "src"
    for ch in (evs[:2], evs[2:], [sent[0]], [sent[1]]):
        frame(spark, ch).coalesce(1).write.mode("append").parquet(str(src))
    sdf = (
        spark.readStream.schema(frame(spark, evs).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "1 minute")
    )
    out = run_to_memory(
        match_recognize_stream(sdf, clause, engine="join"),
        query_name="t_mrj_const",
        output_mode="append",
    )
    got = sorted(map(repr, (
        tuple(r) for r in out.filter(F.col("user_id") == 1).collect()
    )))
    assert got == batch


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_mr_stream_join_vs_nfa(spark, tmp_path, seed):
    """Randomized join-lowering fuzz: random chain length (2-3),
    skip (TO NEXT / PAST LAST over disjoint equality defines), WITHIN,
    and data with same-ts ties — the join drain, the NFA drain, and
    the batch engine must produce one match set. Seeds 4-7 quantify a
    random NON-TRAILING element with a random bounded {m, n}
    (n_min 1-2, spread 0-2, sometimes reluctant) and measure
    FIRST/LAST/COUNT over it — the unroll path."""
    import random as _random

    from flink_framework_spark.streaming.mr import match_recognize_stream
    from flink_framework_spark.streaming.twins import run_to_memory

    rng = _random.Random(13100 + seed)
    types = ["view", "click", "purchase"]
    rows, eid = [], 0
    for uid in range(1, 5):
        t0 = 0
        for _ in range(rng.randint(20, 35)):
            # 25% chance of repeating the previous timestamp (ties)
            t0 += 0 if (rng.random() < 0.25 and t0) else rng.choice(
                [30, 120, 600]
            )
            eid += 1
            hh, rem = divmod(t0, 3600)
            mm, ss = divmod(rem, 60)
            rows.append((
                uid, f"2024-01-01 {10 + hh:02d}:{mm:02d}:{ss:02d}", eid,
                rng.choice(types), float(rng.randint(0, 9)),
            ))
    k = rng.choice([2, 3])
    chain_types = rng.sample(types, k)  # distinct -> disjoint defines
    vars_ = [f"E{j}" for j in range(k)]
    skip = rng.choice(["TO NEXT ROW", "PAST LAST ROW"])
    within = rng.choice([10, 30])
    measures = ", ".join(
        f"{v}.event_id AS id_{j}" for j, v in enumerate(vars_)
    )
    pattern_vars = list(vars_)
    if seed >= 4:
        # quantify a random non-trailing element (unroll path); a
        # consuming skip over a quantified/zero-min element does not
        # lower, so those seeds pin TO NEXT
        qj = rng.randrange(k - 1)
        n_min = rng.choice([1, 2])
        n_max = n_min + rng.choice([0, 1, 2])
        lazy = "?" if (n_min < n_max and rng.random() < 0.3) else ""
        pattern_vars[qj] = f"{vars_[qj]}{{{n_min},{n_max}}}{lazy}"
        skip = "TO NEXT ROW"
        measures += (
            f", FIRST({vars_[qj]}.event_id) AS q_first"
            f", LAST({vars_[qj]}.event_id) AS q_last"
            f", COUNT({vars_[qj]}.*) AS q_n"
        )
    defines = ", ".join(
        f"{v} AS {v}.event_type = '{t}'"
        for v, t in zip(vars_, chain_types)
    )
    clause = f"""
        PARTITION BY user_id ORDER BY ts
        MEASURES {measures}
        ONE ROW PER MATCH
        AFTER MATCH SKIP {skip}
        PATTERN ({' '.join(pattern_vars)})
        WITHIN INTERVAL '{within}' MINUTE
        DEFINE {defines}"""
    batch = sorted(map(repr, (
        tuple(r)[1:]
        for r in match_recognize(frame(spark, rows), clause).collect()
    )))

    src = tmp_path / "src"
    sent = [(99, "2024-01-02 00:00:00", 99990, "s", 0.0),
            (99, "2024-01-03 00:00:00", 99991, "s", 0.0)]
    half = len(rows) // 2
    for ch in (rows[:half], rows[half:], [sent[0]], [sent[1]]):
        frame(spark, ch).coalesce(1).write.mode("append").parquet(str(src))

    def drain(engine, mode):
        sdf = (
            spark.readStream.schema(frame(spark, rows).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .withWatermark("ts", "1 minute")
        )
        out = run_to_memory(
            match_recognize_stream(sdf, clause, engine=engine),
            query_name=f"t_mrf_{engine}_{seed}",
            output_mode=mode,
        )
        return sorted(map(repr, (tuple(r)[1:] for r in out.collect())))

    assert drain("join", "append") == batch, f"seed {seed}: {clause}"
    assert drain("nfa", "update") == batch, f"seed {seed}: {clause}"


def test_mr_stream_join_blockers(spark, sf_dir):
    """engine='join' names the blocking reason for every ineligible
    shape; auto falls back to the NFA silently."""
    from flink_framework_spark.io import table
    from flink_framework_spark.streaming.mr import match_recognize_stream

    ev = table(spark, sf_dir, "events")

    def join_raises(clause, msg):
        with pytest.raises(ValueError, match=msg):
            match_recognize_stream(ev, clause, engine="join")

    join_raises("""PARTITION BY user_id ORDER BY ts
        MEASURES S.event_id AS s_id PATTERN (S F* P)
        WITHIN INTERVAL '1' HOUR
        DEFINE S AS S.event_type = 'signup',
               P AS P.event_type = 'purchase'""",
        "unbounded quantifiers")
    # two quantified elements: only one unrolls
    join_raises("""PARTITION BY user_id ORDER BY ts
        MEASURES S.event_id AS s_id PATTERN (S{1,2} F{1,2} P)
        WITHIN INTERVAL '1' HOUR
        DEFINE S AS S.event_type = 'signup',
               F AS F.event_type = 'view',
               P AS P.event_type = 'purchase'""",
        "at most ONE bounded-quantified")
    # trailing open-count quantifier: no follower forces the count
    join_raises("""PARTITION BY user_id ORDER BY ts
        MEASURES S.event_id AS s_id PATTERN (S F{1,2})
        WITHIN INTERVAL '1' HOUR
        DEFINE S AS S.event_type = 'signup',
               F AS F.event_type = 'view'""",
        "TRAILING quantifier")
    # repetition/successor overlap: count would be ambiguous
    join_raises("""PARTITION BY user_id ORDER BY ts
        MEASURES S.event_id AS s_id PATTERN (S F{1,2} P)
        WITHIN INTERVAL '1' HOUR
        DEFINE S AS S.event_type = 'signup',
               F AS F.value > 3, P AS P.value > 1""",
        "provably disjoint")
    # consuming skip with a quantified ANCHOR: reps satisfy the
    # anchor DEFINE, candidates overlap by construction
    join_raises("""PARTITION BY user_id ORDER BY ts
        MEASURES F.event_id AS f_id
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (F{2,2} P) WITHIN INTERVAL '1' HOUR
        DEFINE F AS F.event_type = 'view',
               P AS P.event_type = 'purchase'""",
        "FIXED singleton anchor")
    join_raises("""PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, MATCH_NUMBER() AS mno
        PATTERN (A B) WITHIN INTERVAL '1' HOUR
        DEFINE A AS A.event_type = 'view',
               B AS B.event_type = 'purchase'""",
        "no join spelling")
    # multi-column ORDER BY: the join's adjacency predicates know
    # only the (order_by[0], id) total order
    join_raises("""PARTITION BY user_id ORDER BY ts, value
        MEASURES A.event_id AS a_id
        PATTERN (A B) WITHIN INTERVAL '1' HOUR
        DEFINE A AS A.event_type = 'view',
               B AS B.event_type = 'purchase'""",
        "multi-column ORDER BY")
    # consuming skip without a disjointness proof (non-equality
    # defines): candidates may overlap -> NFA
    join_raises("""PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B) WITHIN INTERVAL '1' HOUR
        DEFINE A AS A.value > 3, B AS B.value <= 3""",
        "provably disjoint")
    # ...but TO NEXT ROW needs no proof (anchors are independent)
    q = match_recognize_stream(
        ev.withWatermark("ts", "1 minute"),
        """PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (A B) WITHIN INTERVAL '1' HOUR
        DEFINE A AS A.value > 3, B AS B.value <= 3""",
        engine="join",
    )
    assert q is not None


def test_mr_stream_requires_within(spark, sf_dir):
    from flink_framework_spark.io import table
    from flink_framework_spark.streaming.mr import match_recognize_stream

    with pytest.raises(ValueError, match="WITHIN"):
        match_recognize_stream(
            table(spark, sf_dir, "events"),
            """PARTITION BY user_id ORDER BY ts
               MEASURES A.event_id AS a_id PATTERN (A B)
               DEFINE A AS A.event_type = 'view',
                      B AS B.event_type = 'purchase'""",
        )


# -------------------------------------- review-regression pins (r4)


def test_define_string_literal_survives_rewrite():
    from flink_framework_spark.operators.match_recognize import (
        _rewrite_define,
    )

    # a literal containing 'A.x' must ride through untouched
    assert (
        _rewrite_define("A.event_type = 'A.x'", ["A", "B"])
        == "event_type = 'A.x'"
    )
    # a literal containing a word.word sequence must not be rejected
    assert (
        _rewrite_define("A.event_type = 'e.g. text'", ["A"])
        == "event_type = 'e.g. text'"
    )
    # a stray qualifier OUTSIDE a literal is still rejected
    with pytest.raises(ValueError, match="only pattern"):
        _rewrite_define("tbl.col = 1", ["A"])


def test_define_string_literal_end_to_end(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 1, "A.x", 1.0),
        (1, "2024-01-01 10:01:00", 2, "purchase", 2.0),
    ]
    out = match_recognize(frame(spark, rows), """
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, B.event_id AS b_id
        PATTERN (A B)
        DEFINE A AS A.event_type = 'A.x',
               B AS B.event_type = 'purchase'""")
    assert [(r.a_id, r.b_id) for r in out.collect()] == [(1, 2)]


def test_define_arithmetic_and_concat_tokenize(spark):
    """'/', '%', '||', and decimal/exponent literals are valid
    single-row Spark SQL and must survive the tokenizer."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "x", 4.0),
        (1, "2024-01-01 10:01:00", 2, "y", 5.0),
    ]
    out = match_recognize(frame(spark, rows), """
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, B.event_id AS b_id
        PATTERN (A B)
        DEFINE A AS A.value % 2 = 0 AND A.value / 2 > 1.5,
               B AS B.event_type || '!' = 'y!' AND B.value < 1e3""")
    assert [(r.a_id, r.b_id) for r in out.collect()] == [(1, 2)]


def _mk_flag_pdf(flags_by_var, ts=None):
    data = {f"__m_{v}": list(fl) for v, fl in flags_by_var.items()}
    if ts is not None:
        data["ts"] = pd.to_datetime(ts, unit="s")
    return pd.DataFrame(data)


def test_multi_unbounded_quantifiers_polynomial():
    """PATTERN (A* B* C* D* E) with A..D undefined and E absent:
    without failed-(pos, element) memoization the backtracker
    enumerates every count split (O(n^4) per anchor — hours at
    n=60); with it, each state is visited once and the whole scan is
    sub-second."""
    import time

    from flink_framework_spark.operators.match_recognize import scan_rows

    n = 60
    pdf = _mk_flag_pdf(
        {v: [True] * n for v in "ABCD"} | {"E": [False] * n}
    )
    t0 = time.monotonic()
    out, resume, _ = scan_rows(
        pdf,
        1,
        elements=[("A", 0, None, False, None), ("B", 0, None, False, None),
                  ("C", 0, None, False, None), ("D", 0, None, False, None),
                  ("E", 1, 1, False, None)],
        measures=[("mno", "MATCH_NUMBER", None, None, False, 0)],
        skip="past_last",
        within_s=None,
        var_names=list("ABCDE"),
        ts_col="ts",
    )
    assert out == [] and resume == n
    assert time.monotonic() - t0 < 20.0


def test_stream_anchor_final_only_strictly_inside_watermark():
    """Spark drops only rows STRICTLY below the watermark, so a row
    at exactly ts == watermark can still arrive; an anchor with
    anchor_ts + WITHIN == watermark is NOT final yet."""
    from flink_framework_spark.operators.match_recognize import scan_rows

    pdf = _mk_flag_pdf({"A": [True], "B": [False]}, ts=[0.0])
    kw = dict(
        elements=[("A", 1, 1, False, None), ("B", 1, 1, False, None)],
        measures=[("n", "COUNT_STAR", None, None, False, 0)],
        skip="past_last",
        within_s=60.0,
        var_names=["A", "B"],
        ts_col="ts",
    )
    out, resume, _ = scan_rows(pdf, 1, anchor_bound_s=60.0, **kw)
    assert (out, resume) == ([], 0)  # window still open — kept in state
    out, resume, _ = scan_rows(pdf, 1, anchor_bound_s=60.001, **kw)
    assert (out, resume) == ([], 1)  # now final: no B arrived, no match


# ------------------------------------------- ALL ROWS PER MATCH mode


ALL_ROWS_CLAUSE = """
    PARTITION BY user_id ORDER BY ts
    MEASURES CLASSIFIER() AS cls, MATCH_NUMBER() AS mno,
             FIRST(A.event_id) AS first_a, COUNT(A.*) AS n_a,
             SUM(A.value) AS s_a, COUNT(*) AS n_rows
    ALL ROWS PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN (A{2,} B)
    DEFINE A AS A.event_type = 'click',
           B AS B.event_type = 'purchase'"""


def test_all_rows_running_semantics(spark):
    """Per-row emission: every matched row appears with CLASSIFIER,
    MATCH_NUMBER, and measures computed over the match PREFIX up to
    the row (running semantics); FIRST stays fixed once bound, and a
    not-yet-bound variable reports NULL/0."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, "click", 2.0),
        (1, "2024-01-01 00:01:00", 2, "click", 3.0),
        (1, "2024-01-01 00:02:00", 3, "purchase", 9.0),
        (1, "2024-01-01 00:03:00", 4, "view", 0.0),
        (1, "2024-01-01 00:04:00", 5, "click", 5.0),
        (1, "2024-01-01 00:05:00", 6, "click", 7.0),
        (1, "2024-01-01 00:06:00", 7, "click", 11.0),
        (1, "2024-01-01 00:07:00", 8, "purchase", 1.0),
    ]
    out = match_recognize(frame(spark, rows), ALL_ROWS_CLAUSE)
    got = [
        (r["event_id"], r["cls"], r["mno"], r["first_a"], r["n_a"],
         r["s_a"], r["n_rows"])
        for r in out.orderBy("mno", "ts", "event_id").collect()
    ]
    assert got == [
        (1, "A", 1, 1, 1, 2.0, 1),
        (2, "A", 1, 1, 2, 5.0, 2),
        (3, "B", 1, 1, 2, 5.0, 3),
        (5, "A", 2, 5, 1, 5.0, 1),
        (6, "A", 2, 5, 2, 12.0, 2),
        (7, "A", 2, 5, 3, 23.0, 3),
        (8, "B", 2, 5, 3, 23.0, 4),
    ]
    # echoed order columns make the row identity explicit
    assert {"ts", "event_id"} <= set(out.columns)


def test_all_rows_final_row_equals_one_row_projection(spark, sf_dir):
    """The LAST emitted row of each ALL-ROWS match carries the full-
    match (final) measure values, so projecting it must reproduce the
    ONE ROW PER MATCH result exactly."""
    from flink_framework_spark.io import table

    one_clause = ALL_ROWS_CLAUSE.replace(
        "ALL ROWS PER MATCH", "ONE ROW PER MATCH"
    )
    ev = table(spark, sf_dir, "events")
    all_rows = match_recognize(ev, ALL_ROWS_CLAUSE).toPandas()
    one = match_recognize(ev, one_clause).toPandas()
    last = (
        all_rows.sort_values(["user_id", "mno", "ts", "event_id"])
        .groupby(["user_id", "mno"], as_index=False)
        .last()[["user_id", "cls", "mno", "first_a", "n_a", "s_a", "n_rows"]]
    )
    key = lambda df: sorted(
        repr(t)
        for t in df[
            ["user_id", "cls", "mno", "first_a", "n_a", "s_a", "n_rows"]
        ].itertuples(index=False, name=None)
    )
    assert len(one) > 0 and key(last) == key(one)


def test_all_rows_rejected_on_streams(spark):
    from flink_framework_spark.streaming.mr import match_recognize_stream

    with pytest.raises(ValueError, match="batch-only"):
        match_recognize_stream(
            spark.readStream.format("rate").load().selectExpr(
                "value AS user_id", "timestamp AS ts",
                "value AS event_id", "'a' AS event_type"
            ).withWatermark("ts", "1 second"),
            ALL_ROWS_CLAUSE + " WITHIN INTERVAL '1' SECOND",
        )


def test_classifier_one_row_mode(spark):
    """In ONE ROW PER MATCH, CLASSIFIER() is the LAST matched row's
    variable — on both engines."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 0.0),
        (1, "2024-01-01 00:01:00", 2, "purchase", 0.0),
    ]
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES CLASSIFIER() AS cls
        ONE ROW PER MATCH
        PATTERN (A B)
        DEFINE A AS A.event_type = 'view',
               B AS B.event_type = 'purchase'"""
    df = frame(spark, rows)
    rel = match_recognize(df, clause).collect()
    nfa = match_recognize(df, clause, engine="nfa").collect()
    assert [r["cls"] for r in rel] == ["B"] == [r["cls"] for r in nfa]


def test_parser_accepts_all_rows_per_match():
    spec = parse_match_recognize("""
        PARTITION BY u ORDER BY ts
        MEASURES CLASSIFIER() AS c, MATCH_NUMBER() AS m
        ALL ROWS PER MATCH
        PATTERN (X Y)""")
    assert spec.rows == "all"
    assert [m.func for m in spec.measures] == ["CLASSIFIER", "MATCH_NUMBER"]


def test_disjointness_proof_requires_same_literal_kind(spark):
    """A string literal and a numeric literal on the same column are
    NOT a disjointness proof: Spark's implicit cast can satisfy both
    for one row ('5' = 5), so the relational path must fall back to
    explicit greedy selection — and still match the NFA."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1],
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime([1, 2, 3, 4], unit="s"),
            "v": ["5", "5", "5", "5"],
        }
    )
    df = spark.createDataFrame(pdf)
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, B.event_id AS b_id
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B)
        DEFINE A AS A.v = '5', B AS B.v = 5"""
    rel = match_recognize(df, clause)
    plan = rel._jdf.queryExecution().executedPlan().toString()
    # both conditions hold for every row -> candidates overlap -> the
    # fast path must run greedy selection (a Python stage), not the
    # emit-all disjoint shortcut
    assert "MapInPandas" in plan
    got = sorted((r["a_id"], r["b_id"]) for r in rel.collect())
    nfa = sorted(
        (r["a_id"], r["b_id"])
        for r in match_recognize(df, clause, engine="nfa").collect()
    )
    assert got == nfa == [(1, 2), (3, 4)]


def test_null_measure_sql_semantics_both_engines(spark):
    """SUM/AVG/MIN/MAX ignore NULLs; an all-NULL set aggregates to
    NULL — pinned identically on the relational path and the NFA
    (the old `+`-chain propagated NULL; the old pandas sum returned
    0.0 for all-NaN)."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, "a", None),
        (1, "2024-01-01 00:01:00", 2, "a", 7.0),
        (1, "2024-01-01 00:02:00", 3, "b", 1.0),
        (2, "2024-01-01 00:00:00", 4, "a", None),
        (2, "2024-01-01 00:01:00", 5, "a", None),
        (2, "2024-01-01 00:02:00", 6, "b", 1.0),
    ]
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES SUM(A.value) AS s, AVG(A.value) AS m,
                 MIN(A.value) AS lo, MAX(A.value) AS hi
        ONE ROW PER MATCH
        PATTERN (A A B)
        DEFINE A AS A.event_type = 'a',
               B AS B.event_type = 'b'"""
    df = frame(spark, rows)
    for engine in ("relational", "nfa"):
        out = sorted(
            (
                (r["s"], r["m"], r["lo"], r["hi"])
                for r in match_recognize(df, clause, engine=engine)
                .collect()
            ),
            key=repr,
        )
        # user 1: one NULL skipped -> 7.0 everywhere; user 2: all
        # NULL -> NULL aggregates
        assert out == [
            (7.0, 7.0, 7.0, 7.0),
            (None, None, None, None),
        ], engine


def test_route_info_names_engine_and_selection(spark, sf_dir):
    """The porting diagnostic reports the engine and the greedy-
    selection proof match_recognize would actually use."""
    from flink_framework_spark.io import table
    from flink_framework_spark.operators.match_recognize import (
        route_info,
    )

    ev = table(spark, sf_dir, "events")
    r = route_info(_STRICT_PAIR, ev)
    assert r["engine"] == "relational-singleton"
    assert "disjoint anchor" in r["selection"]

    runs = """
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(A.*) AS n_a, B.event_id AS b_id
        ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A{2,} B) WITHIN INTERVAL '30' DAY
        DEFINE A AS A.event_type = 'click',
               B AS B.event_type = 'purchase'"""
    r = route_info(runs, ev)
    assert r["engine"] == "relational-run"
    assert "island end" in r["selection"]
    # without a frame, schema-dependent proofs say so
    assert "schema-dependent" in route_info(runs)["selection"]

    multi = """
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(A.*) AS n_a, C.event_id AS c_id
        ONE ROW PER MATCH
        PATTERN (A+ B* C)
        DEFINE C AS C.event_type = 'purchase'"""
    r = route_info(multi)
    assert r["engine"] == "nfa" and "quantified elements" in r["reason"]

    minmax = runs.replace("COUNT(A.*) AS n_a", "MIN(A.value) AS mn")
    r = route_info(minmax)
    assert r["engine"] == "nfa" and "MIN/MAX" in r["reason"]


# ----------------------------------------------------- SUBSET clause


def test_subset_parser_and_validation():
    spec = parse_match_recognize("""
        PARTITION BY user_id ORDER BY ts
        MEASURES LAST(U.ts) AS u_ts, COUNT(U.*) AS n_u
        PATTERN (A B C)
        SUBSET U = (A, C)
        WITHIN INTERVAL '1' HOUR
        DEFINE A AS A.event_type = 'view'""")
    assert spec.subsets == {"U": ["A", "C"]}
    assert spec.within_s == 3600.0
    # WITHIN-then-SUBSET order also accepted
    spec2 = parse_match_recognize("""
        PARTITION BY user_id ORDER BY ts
        MEASURES LAST(U.ts) AS u_ts
        PATTERN (A B)
        WITHIN INTERVAL '1' HOUR
        SUBSET U = (A, B)""")
    assert spec2.subsets == {"U": ["A", "B"]}
    with pytest.raises(ValueError, match="collides"):
        parse_match_recognize(
            "PARTITION BY u ORDER BY ts MEASURES A.ts AS t "
            "PATTERN (A B) SUBSET A = (B)"
        )
    with pytest.raises(ValueError, match="not in PATTERN"):
        parse_match_recognize(
            "PARTITION BY u ORDER BY ts MEASURES A.ts AS t "
            "PATTERN (A B) SUBSET U = (A, Z)"
        )
    with pytest.raises(ValueError, match="twice"):
        parse_match_recognize(
            "PARTITION BY u ORDER BY ts MEASURES A.ts AS t "
            "PATTERN (A B) SUBSET U = (A, A)"
        )
    with pytest.raises(ValueError, match="not in PATTERN or SUBSET"):
        parse_match_recognize(
            "PARTITION BY u ORDER BY ts MEASURES W.ts AS t "
            "PATTERN (A B) SUBSET U = (A, B)"
        )


def test_subset_measures_singleton_relational_equals_nfa(spark):
    """SUBSET union measures over a singleton pattern: the relational
    position-union compilation must equal the NFA row-for-row, and the
    values must be the member rows' union in match order."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 2.0),
        (1, "2024-01-01 10:01:00", 2, "click", 3.0),
        (1, "2024-01-01 10:02:00", 3, "purchase", 5.0),
        (1, "2024-01-01 11:00:00", 4, "view", None),
        (1, "2024-01-01 11:01:00", 5, "click", 7.0),
        (1, "2024-01-01 11:02:00", 6, "purchase", None),
    ]
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES FIRST(U.event_id) AS u_first, LAST(U.event_id) AS u_last,
                 SUM(U.value) AS u_sum, AVG(U.value) AS u_avg,
                 MIN(U.event_id) AS u_min, MAX(U.event_id) AS u_max,
                 COUNT(U.*) AS n_u, B.event_id AS b_id
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A B C)
        SUBSET U = (A, C)
        DEFINE A AS A.event_type = 'view',
               B AS B.event_type = 'click',
               C AS C.event_type = 'purchase'"""
    df = frame(spark, rows)
    rel = match_recognize(df, clause)  # auto -> relational singleton
    plan = rel._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan  # still no Python
    a = sorted(repr(tuple(r)) for r in rel.collect())
    b = sorted(
        repr(tuple(r))
        for r in match_recognize(df, clause, engine="nfa").collect()
    )
    assert a == b
    got = {r["b_id"]: r for r in rel.collect()}
    # match 1: U rows = {view@1, purchase@3}: sum 7, avg 3.5
    assert got[2]["u_first"] == 1 and got[2]["u_last"] == 3
    assert got[2]["u_sum"] == 7.0 and got[2]["n_u"] == 2
    # match 2: both member values NULL -> SUM/AVG are NULL (SQL
    # aggregate semantics, not 0)
    assert got[5]["u_sum"] is None
    assert got[5]["u_avg"] is None
    assert got[5]["u_min"] == 4 and got[5]["u_max"] == 6


def test_subset_on_quantified_pattern_keeps_nfa(spark, sf_dir):
    from flink_framework_spark.io import table
    from flink_framework_spark.operators.match_recognize import (
        route_info,
    )

    ev = table(spark, sf_dir, "events")
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES COUNT(U.*) AS n_u, B.event_id AS b_id
        ONE ROW PER MATCH
        PATTERN (A{2,} B)
        SUBSET U = (A, B)
        DEFINE A AS A.event_type = 'click',
               B AS B.event_type = 'purchase'"""
    out = match_recognize(ev, clause)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # the batched Arrow NFA
    assert route_info(clause)["reason"].startswith("SUBSET measure")
    # and the union count is the whole match here: n_u == n_a + 1
    rows = out.limit(5).collect()
    assert all(r["n_u"] >= 3 for r in rows)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_subset_singleton_vs_nfa(spark, seed):
    """Randomized SUBSET unions over singleton chains, both engines."""
    import random as _random
    from datetime import datetime, timezone

    rng = _random.Random(9900 + seed)
    rows = []
    eid = 0
    for uid in (1, 2):
        t = 0.0
        for _ in range(rng.randint(10, 24)):
            t += rng.choice([60.0, 600.0])
            eid += 1
            val = None if rng.random() < 0.25 else float(rng.randint(0, 9))
            rows.append(
                (
                    uid,
                    datetime.fromtimestamp(t, tz=timezone.utc).replace(
                        tzinfo=None
                    ),
                    eid,
                    rng.choice(["a", "b", "c"]),
                    val,
                )
            )
    df = spark.createDataFrame(
        rows,
        "user_id long, ts timestamp, event_id long, event_type string, "
        "value double",
    )
    k = rng.randint(2, 4)
    names = [f"V{j}" for j in range(k)]
    members = rng.sample(names, rng.randint(2, k))
    defines = [
        f"{v} AS {v}.event_type = '{rng.choice(['a', 'b', 'c'])}'"
        for v in names
        if rng.random() < 0.7
    ]
    skip = rng.choice(["PAST LAST ROW", "TO NEXT ROW"])
    clause = (
        "PARTITION BY user_id ORDER BY ts "
        "MEASURES FIRST(U.event_id) AS f_u, LAST(U.event_id) AS l_u, "
        "SUM(U.value) AS s_u, COUNT(U.*) AS n_u, MATCH_NUMBER() AS mno "
        f"ONE ROW PER MATCH AFTER MATCH SKIP {skip} "
        f"PATTERN ({' '.join(names)}) "
        f"SUBSET U = ({', '.join(members)}) "
        + ("DEFINE " + ", ".join(defines) if defines else "")
    )
    rel = match_recognize(df, clause, engine="relational")
    nfa = match_recognize(df, clause, engine="nfa")
    a = sorted(repr(tuple(r)) for r in rel.collect())
    b = sorted(repr(tuple(r)) for r in nfa.collect())
    assert a == b, f"seed {seed}: {clause}"


def test_stream_route_info(spark, sf_dir):
    """The streaming routing diagnostic mirrors the batch route_info:
    eligible pairs report the join machine (+ its append mode),
    ineligible shapes name the blocker, and consuming skips without a
    schema report the schema dependence instead of guessing."""
    from flink_framework_spark.io import table
    from flink_framework_spark.streaming.mr import stream_route_info

    pair = """PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (A B)
        WITHIN INTERVAL '1' HOUR
        DEFINE A AS A.event_type = 'view',
               B AS B.event_type = 'purchase'"""
    info = stream_route_info(pair)
    assert info["engine"] == "join" and info["output_mode"] == "append"
    info = stream_route_info(pair.replace("PATTERN (A B)",
                                          "PATTERN (A F* B)"))
    assert info["engine"] == "nfa" and "unbounded" in info["reason"]
    consuming = pair.replace("SKIP TO NEXT ROW", "SKIP PAST LAST ROW")
    info = stream_route_info(consuming)
    assert info["engine"] == "nfa" and "schema-dependent" in info["reason"]
    ev = table(spark, sf_dir, "events")
    info = stream_route_info(consuming, ev)
    assert info["engine"] == "join"  # disjoint-anchor proof resolves
    # a BOUNDED quantifier with distinct-literal defines unrolls; the
    # repetition/successor disjointness proof is schema-dependent
    quant = pair.replace("PATTERN (A B)", "PATTERN (A F{1,2} B)").replace(
        "DEFINE A AS", "DEFINE F AS F.event_type = 'click', A AS"
    )
    info = stream_route_info(quant)
    assert (
        info["engine"] == "nfa"
        and "schema-dependent" in info["reason"]
    )
    info = stream_route_info(quant, ev)
    assert info["engine"] == "join" and "unroll" in info["reason"]
    # overlapping repetition/successor defines keep the NFA
    overlap = pair.replace("PATTERN (A B)", "PATTERN (A F{1,2} B)").replace(
        "DEFINE A AS", "DEFINE F AS F.event_type = 'purchase', A AS"
    )
    info = stream_route_info(overlap, ev)
    assert info["engine"] == "nfa" and "disjoint" in info["reason"]
    # an EXACT count needs no proof (the repetition count is fixed)
    exact = pair.replace("PATTERN (A B)", "PATTERN (A F{2,2} B)").replace(
        "DEFINE A AS", "DEFINE F AS F.event_type = 'purchase', A AS"
    )
    info = stream_route_info(exact)
    assert info["engine"] == "join" and "unroll" in info["reason"]
    # schema-independent blockers resolve WITHOUT events even under a
    # consuming skip (no pointless "pass events" errand)
    info = stream_route_info(consuming.replace("PATTERN (A B)",
                                               "PATTERN (A B+)"))
    assert info["engine"] == "nfa" and "unbounded" in info["reason"]
    # clauses the stream entry point itself refuses report 'rejected',
    # not a machine the stream would never start on
    info = stream_route_info(pair.replace(
        "WITHIN INTERVAL '1' HOUR\n", ""))
    assert info["engine"] == "rejected" and "WITHIN" in info["reason"]
    info = stream_route_info(pair.replace(
        "DEFINE A AS A.event_type = 'view'",
        "DEFINE A AS A.value > PREV(A.value)"))
    assert info["engine"] == "rejected" and "batch-only" in info["reason"]


def test_mr_stream_quantified_unroll_matches_nfa_and_batch(
    spark, tmp_path
):
    """Bounded-quantifier join lowering: PATTERN (A B{1,3} C) with
    disjoint type DEFINEs unrolls to three fixed chains (A B C /
    A B B C / A B B B C) whose union equals the forced NFA and the
    batch engine — the disjointness proof forces the repetition count
    per anchor, and the adjacency joins kill every shorter branch
    whose next position lands on a repetition row. Measures exercise
    FIRST/LAST on the quantified variable and COUNT(B.*)."""
    import random as _random

    from flink_framework_spark.streaming.mr import (
        match_recognize_stream,
        stream_route_info,
    )
    from flink_framework_spark.streaming.twins import run_to_memory

    rng = _random.Random(4242)
    rows, eid = [], 0
    for uid in range(1, 6):
        t0 = 0
        for _ in range(45):
            # bias toward click bursts so B-runs of length 1-4 occur
            t0 += 0 if (rng.random() < 0.2 and t0) else rng.choice(
                [30, 120, 600]
            )
            eid += 1
            hh, rem = divmod(t0, 3600)
            mm, ss = divmod(rem, 60)
            rows.append((
                uid, f"2024-01-01 {10 + hh:02d}:{mm:02d}:{ss:02d}", eid,
                rng.choice(
                    ["view", "click", "click", "click", "purchase"]
                ),
                float(rng.randint(0, 9)),
            ))
    clause = """
        PARTITION BY user_id ORDER BY ts
        MEASURES A.event_id AS a_id, FIRST(B.event_id) AS b_first,
                 LAST(B.event_id) AS b_last, COUNT(B.*) AS n_b,
                 C.event_id AS c_id
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (A B{1,3} C)
        WITHIN INTERVAL '30' MINUTE
        DEFINE A AS A.event_type = 'view',
               B AS B.event_type = 'click',
               C AS C.event_type = 'purchase'"""
    df = frame(spark, rows)
    assert stream_route_info(clause, df)["engine"] == "join"
    batch = sorted(map(repr, (
        tuple(r) for r in match_recognize(df, clause).collect()
    )))
    assert batch, "fixture must produce matches"
    # the fixture must exercise more than one repetition depth
    depths = {
        r["n_b"] for r in match_recognize(df, clause).collect()
    }
    assert len(depths) >= 2, depths

    src = tmp_path / "src_q"
    sent = [(99, "2024-01-02 00:00:00", 99990, "s", 0.0),
            (99, "2024-01-03 00:00:00", 99991, "s", 0.0)]
    half = len(rows) // 2
    for ch in (rows[:half], rows[half:], [sent[0]], [sent[1]]):
        frame(spark, ch).coalesce(1).write.mode("append").parquet(
            str(src)
        )

    def drain(engine, mode):
        sdf = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .withWatermark("ts", "1 minute")
        )
        out = run_to_memory(
            match_recognize_stream(sdf, clause, engine=engine),
            query_name=f"t_mrq_{engine}",
            output_mode=mode,
        )
        return sorted(map(repr, (tuple(r) for r in out.collect())))

    assert drain("join", "append") == batch
    assert drain("nfa", "update") == batch
