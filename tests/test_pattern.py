"""Fluent Pattern API: each compiled pattern must equal the direct
operator composition it lowers to (the compiler adds API shape, never
semantics), plus the combo shapes only the compiler can express
(multiple optionals, optional + negation) pinned on planted
timelines. The registered combo query q_cep_pattern is oracle-checked
against live DuckDB SQL; these tests pin the lowering."""

from __future__ import annotations

import pytest

from flink_framework_spark.operators.cep import (
    match_one_or_more,
    match_optional,
    match_sequence,
    match_sequence_negated,
    match_times,
    skip_past_last,
)
from flink_framework_spark.operators.pattern import Pattern
from pyspark.sql import functions as F


def _canon(df):
    return sorted(map(repr, df.toPandas().itertuples(index=False, name=None)))


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from flink_framework_spark.io import table

    return table(spark, sf_dir, "events")


def test_chain_equals_match_sequence(events):
    p = (
        Pattern.begin("view")
        .followed_by("click")
        .followed_by("purchase")
        .within("12 HOURS")
    )
    direct = match_sequence(events, ["view", "click", "purchase"], "12 HOURS")
    assert _canon(p.match(events)) == _canon(
        direct.select(p.match(events).columns)
    )


def test_optional_equals_match_optional(events):
    p = (
        Pattern.begin("view")
        .followed_by("click")
        .optional()
        .followed_by("purchase")
        .within("12 HOURS")
    )
    direct = match_optional(events, ["view", "click", "purchase"], 1, "12 HOURS")
    assert _canon(p.match(events)) == _canon(direct)


def test_negation_equals_match_sequence_negated(events):
    p = (
        Pattern.begin("view")
        .followed_by("purchase")
        .not_followed_by("click")
        .within("12 HOURS")
    )
    direct = match_sequence_negated(
        events, ["view", "purchase"], "click", "12 HOURS"
    )
    assert _canon(p.match(events)) == _canon(
        direct.select(p.match(events).columns)
    )


def test_times_with_skip_equals_composition(events):
    p = (
        Pattern.begin("click")
        .times(2, 3)
        .followed_by("purchase")
        .within("12 HOURS")
        .after_match_skip("skip_past_last")
    )
    direct = skip_past_last(
        match_times(events, "click", "purchase", 2, 3, "12 HOURS")
    )
    assert _canon(p.match(events)) == _canon(direct)


def test_one_or_more_equals_operator(events):
    p = (
        Pattern.begin("click")
        .one_or_more("24 HOURS")
        .followed_by("purchase")
        .within("7 DAYS")
    )
    direct = match_one_or_more(events, "click", "purchase", "24 HOURS", "7 DAYS")
    assert _canon(p.match(events)) == _canon(direct)


def _planted(spark, rows):
    return spark.createDataFrame(
        [(u, e, f"2024-01-01 10:{m:02d}:00", t) for (u, e, m, t) in rows],
        "user_id long, event_id long, ts string, event_type string",
    ).selectExpr(
        "user_id", "event_id", "CAST(ts AS timestamp) AS ts", "event_type"
    )


def test_two_optionals_union_four_branches(spark):
    """view -> click? -> signup? -> purchase: a user with only
    view+purchase matches once (both skipped); a user with all four
    events matches via all four branches."""
    ev = _planted(
        spark,
        [
            (1, 1, 0, "view"),
            (1, 2, 1, "click"),
            (1, 3, 2, "signup"),
            (1, 4, 3, "purchase"),
            (2, 5, 0, "view"),
            (2, 6, 3, "purchase"),
        ],
    )
    p = (
        Pattern.begin("view")
        .followed_by("click")
        .optional()
        .followed_by("signup")
        .optional()
        .followed_by("purchase")
        .within("30 MINUTES")
    )
    got = sorted(
        (r["user_id"], r["ts_1"] is not None, r["ts_2"] is not None)
        for r in p.match(ev).collect()
    )
    assert got == [
        (1, False, False),
        (1, False, True),
        (1, True, False),
        (1, True, True),
        (2, False, False),
    ]


def test_optional_with_negation_applies_to_every_branch(spark):
    """view -> click? -> purchase with NO error between view and
    purchase: the error kills BOTH branches for user 1; user 2 (no
    error, no click) keeps the skip branch."""
    ev = _planted(
        spark,
        [
            (1, 1, 0, "view"),
            (1, 2, 1, "click"),
            (1, 3, 2, "error"),
            (1, 4, 3, "purchase"),
            (2, 5, 0, "view"),
            (2, 6, 3, "purchase"),
        ],
    )
    p = (
        Pattern.begin("view")
        .followed_by("click")
        .optional()
        .followed_by("purchase")
        .not_followed_by("error")
        .within("30 MINUTES")
    )
    got = sorted(
        (r["user_id"], r["ts_1"] is not None) for r in p.match(ev).collect()
    )
    assert got == [(2, False)]


def test_validation_errors(spark):
    ev = _planted(spark, [(1, 1, 0, "view")])
    with pytest.raises(ValueError, match="anchors"):
        Pattern.begin("view").optional()
    with pytest.raises(ValueError, match="within"):
        Pattern.begin("view").followed_by("purchase").match(ev)
    with pytest.raises(ValueError, match="quantified patterns support"):
        (
            Pattern.begin("click")
            .times(2, 3)
            .followed_by("purchase")
            .followed_by("view")
            .within("1 HOUR")
            .match(ev)
        )
    with pytest.raises(ValueError, match="skip applies to quantified"):
        (
            Pattern.begin("view")
            .followed_by("purchase")
            .within("1 HOUR")
            .after_match_skip("skip_to_next")
            .match(ev)
        )
    with pytest.raises(ValueError, match="mandatory"):
        (
            Pattern.begin("view")
            .followed_by("purchase")
            .optional()
            .within("1 HOUR")
            .match(ev)
        )
    with pytest.raises(ValueError, match="one of"):
        Pattern.begin("view").after_match_skip("bogus")


def test_next_step_strict_contiguity(spark):
    """next_step(): an intervening event of ANY type breaks the
    match; followed_by() tolerates it."""
    ev = _planted(
        spark,
        [
            # user 1: view(0) click(1) purchase(5) — strictly
            # consecutive -> matches both ways
            (1, 1, 0, "view"),
            (1, 2, 1, "click"),
            (1, 3, 5, "purchase"),
            # user 2: view(0) error(1) click(2) purchase(5) — the
            # error sits between view and click -> next_step fails,
            # followed_by still matches
            (2, 4, 0, "view"),
            (2, 5, 1, "error"),
            (2, 6, 2, "click"),
            (2, 7, 5, "purchase"),
        ],
    )
    strict = (
        Pattern.begin("view")
        .next_step("click")
        .followed_by("purchase")
        .within("30 MINUTES")
    )
    relaxed = (
        Pattern.begin("view")
        .followed_by("click")
        .followed_by("purchase")
        .within("30 MINUTES")
    )
    assert sorted(
        r["user_id"] for r in strict.match(ev).collect()
    ) == [1]
    assert sorted(
        r["user_id"] for r in relaxed.match(ev).collect()
    ) == [1, 2]


def test_next_step_rejects_optional_neighbors(spark):
    ev = _planted(spark, [(1, 1, 0, "view")])
    with pytest.raises(ValueError, match="mandatory step preceded"):
        (
            Pattern.begin("view")
            .followed_by("click")
            .optional()
            .next_step("purchase")
            .within("1 HOUR")
            .match(ev)
        )


def test_select_first_binds_earliest_per_prefix(spark):
    """select 'first' (Flink followedBy) vs 'any' (followedByAny):
    with two clicks after the view, 'any' emits both chains, 'first'
    only the earlier click's — and the purchase binds after THAT
    click."""
    ev = _planted(
        spark,
        [
            (1, 1, 0, "view"),
            (1, 2, 1, "click"),
            (1, 3, 2, "click"),
            (1, 4, 5, "purchase"),
        ],
    )
    base = lambda: (
        Pattern.begin("view")
        .followed_by("click")
        .followed_by("purchase")
        .within("30 MINUTES")
    )
    any_rows = sorted(
        (r["ts_1"].minute, r["ts_2"].minute)
        for r in base().match(ev).collect()
    )
    first_rows = sorted(
        (r["ts_1"].minute, r["ts_2"].minute)
        for r in base().select_strategy("first").match(ev).collect()
    )
    assert any_rows == [(1, 5), (2, 5)]
    assert first_rows == [(1, 5)]


def test_select_first_equals_operator_and_validates(spark, events):
    from flink_framework_spark.operators.cep import match_sequence_first

    p = (
        Pattern.begin("view")
        .followed_by("click")
        .followed_by("purchase")
        .within("12 HOURS")
        .select_strategy("first")
    )
    direct = match_sequence_first(
        events, ["view", "click", "purchase"], "12 HOURS"
    )
    assert _canon(p.match(events)) == _canon(
        direct.select(p.match(events).columns)
    )
    ev = _planted(spark, [(1, 1, 0, "view")])
    with pytest.raises(ValueError, match="plain chains"):
        (
            Pattern.begin("view")
            .followed_by("click")
            .optional()
            .followed_by("purchase")
            .within("1 HOUR")
            .select_strategy("first")
            .match(ev)
        )
    with pytest.raises(ValueError, match="'any' or 'first'"):
        Pattern.begin("view").select_strategy("all")


def test_select_first_with_negation(spark):
    """'first' + not_followed_by: the negation is evaluated on the
    FIRST-bound events — user 1's first click has an error before the
    purchase (killed, no rebinding to the later clean click — Flink
    kills the run); user 2's first-bound chain is clean."""
    ev = _planted(
        spark,
        [
            (1, 1, 0, "view"),
            (1, 2, 1, "click"),      # first-bound click
            (1, 3, 2, "error"),      # error inside view..purchase span
            (1, 4, 3, "click"),      # later clean click — NOT rebound
            (1, 5, 5, "purchase"),
            (2, 6, 0, "view"),
            (2, 7, 1, "click"),
            (2, 8, 5, "purchase"),
        ],
    )
    p = (
        Pattern.begin("view")
        .followed_by("click")
        .followed_by("purchase")
        .not_followed_by("error")
        .within("30 MINUTES")
        .select_strategy("first")
    )
    got = sorted(r["user_id"] for r in p.match(ev).collect())
    assert got == [2]


def test_one_or_more_until_equals_operator(spark, events):
    from flink_framework_spark.operators.cep import match_one_or_more

    p = (
        Pattern.begin("click")
        .one_or_more("24 HOURS")
        .until("error")
        .followed_by("purchase")
        .within("7 DAYS")
    )
    direct = match_one_or_more(
        events, "click", "purchase", "24 HOURS", "7 DAYS", until="error"
    )
    assert _canon(p.match(events)) == _canon(direct)
    with pytest.raises(ValueError, match="one_or_more"):
        Pattern.begin("click").until("error")


# ------------------------------------------- streaming auto-routing


def _sstream(spark):
    """A tiny unstarted rate-based stream with the events shape —
    enough to compile streaming plans without running them."""
    from pyspark.sql import functions as F

    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 10)
        .load()
        .select(
            (F.col("value") % 5).alias("user_id"),
            F.col("timestamp").alias("ts"),
            F.col("value").alias("event_id"),
            F.when(F.col("value") % 2 == 0, "view")
            .otherwise("purchase")
            .alias("event_type"),
        )
    )


def _has_arrow_state(df) -> bool:
    return "FlatMapGroupsInPandasWithState" in (
        df._jdf.queryExecution().analyzed().toString()
    )


def test_match_stream_fixed_chain_routes_to_join(spark):
    p = Pattern.begin("view").followed_by("purchase").within("30 minutes")
    out = p.match_stream(_sstream(spark))
    assert out.isStreaming
    assert not _has_arrow_state(out)  # JVM join machine, no Python
    assert {"ts_0", "ts_1", "id_0", "id_1"} <= set(out.columns)
    # engine='nfa' forces the Arrow state machine on the same pattern
    nfa = p.match_stream(_sstream(spark), engine="nfa")
    assert _has_arrow_state(nfa)


def test_match_stream_negation_routes_to_nfa(spark):
    p = (
        Pattern.begin("view")
        .followed_by("purchase")
        .not_followed_by("error")
        .within("30 minutes")
    )
    out = p.match_stream(_sstream(spark))
    assert _has_arrow_state(out)
    with pytest.raises(ValueError, match="ANTI"):
        p.match_stream(_sstream(spark), engine="join")


def test_match_stream_quantified_routes_to_state_machines(spark):
    pt = (
        Pattern.begin("view")
        .times(2, 3)
        .followed_by("purchase")
        .within("12 hours")
    )
    assert _has_arrow_state(pt.match_stream(_sstream(spark)))
    pg = (
        Pattern.begin("view")
        .one_or_more("1 hour")
        .followed_by("purchase")
        .within("12 hours")
    )
    assert _has_arrow_state(pg.match_stream(_sstream(spark)))
    with pytest.raises(ValueError, match="join lowering"):
        pt.match_stream(_sstream(spark), engine="join")
    with pytest.raises(ValueError, match="until"):
        (
            Pattern.begin("view")
            .one_or_more("1 hour")
            .until("error")
            .followed_by("purchase")
            .within("12 hours")
        ).match_stream(_sstream(spark))


def test_match_stream_rejects_batch_only_shapes(spark):
    base = Pattern.begin("view").followed_by("purchase").within("1 hour")
    base.skip_strategy = "skip_past_last"
    with pytest.raises(ValueError, match="batch-only"):
        base.match_stream(_sstream(spark))
    p2 = (
        Pattern.begin("view")
        .followed_by("click")
        .optional()
        .followed_by("purchase")
        .within("1 hour")
    )
    with pytest.raises(ValueError, match="streaming twin"):
        p2.match_stream(_sstream(spark))


def test_interval_seconds_parser():
    from flink_framework_spark.operators.pattern import _interval_seconds

    assert _interval_seconds("30 minutes") == 1800.0
    assert _interval_seconds("3 DAYS") == 3 * 86400.0
    assert _interval_seconds("1 hour") == 3600.0
    assert _interval_seconds("500 milliseconds") == 0.5
    with pytest.raises(ValueError, match="parse"):
        _interval_seconds("fortnight")


def test_match_stream_join_equals_nfa_drained(spark, sf_dir):
    """The SAME Pattern drained through both streaming engines yields
    the same match set (the auto-routing must be a pure performance
    choice, never a semantics one)."""
    from flink_framework_spark.operators.streaming_ops import (
        _fmt_event_time,
    )
    from flink_framework_spark.streaming.twins import (
        read_events_stream,
        run_to_memory,
    )

    p = (
        Pattern.begin("view")
        .followed_by("click")
        .followed_by("purchase")
        .within("12 hours")
    )

    def fmt(df, src):
        cols = [F.col("user_id")]
        for i in range(3):
            cols.append(
                _fmt_event_time(src, F.col(f"ts_{i}")).alias(f"ts_{i}")
            )
            cols.append(F.col(f"id_{i}"))
        return df.select(*cols)

    def drained(engine, mode, name):
        sdf = read_events_stream(spark, sf_dir)
        got = run_to_memory(
            fmt(p.match_stream(sdf, engine=engine), sdf),
            query_name=name,
            output_mode=mode,
        ).toPandas()
        return sorted(
            map(
                repr,
                got[sorted(got.columns)].itertuples(index=False, name=None),
            )
        )

    a = drained("auto", "append", "t_ms_join")
    b = drained("nfa", "update", "t_ms_nfa")
    assert len(a) == len(b) > 0
    assert a == b


def test_match_stream_quantified_negation_raises(spark):
    """not_followed_by on a quantified pattern must raise on the
    stream path (the batch compiler rejects the combination too) —
    silently dropping the negation would emit wrong matches."""
    p = (
        Pattern.begin("view")
        .times(2, 3)
        .followed_by("purchase")
        .not_followed_by("error")
        .within("12 hours")
    )
    with pytest.raises(ValueError, match="not_followed_by"):
        p.match_stream(_sstream(spark))


def test_match_stream_one_or_more_accepts_disorder(spark):
    """Round 10: greedy one_or_more streams WITH a disorder allowance
    (the reorder-buffered driver) — previously a loud refusal. The
    drain-equality for out-of-order arrival is pinned in
    tests/test_streaming.py::test_greedy_disorder_*."""
    p = (
        Pattern.begin("view")
        .one_or_more("1 hour")
        .followed_by("purchase")
        .within("12 hours")
    )
    out = p.match_stream(_sstream(spark), disorder_s=60.0)
    assert out.isStreaming and _has_arrow_state(out)


# -- subtype() / type hierarchies (Flink Pattern.subtype) -------------

_H = {
    "interaction": ["view", "click"],
    "conversion": ["purchase", "signup"],
    "activity": ["interaction", "conversion"],  # nested resolution
}


def test_subtype_chain_equals_in_set_expansion(events):
    """An abstract-typed chain equals the hand-expanded IN-set chain —
    the hierarchy is pure desugaring, never semantics."""
    p = (
        Pattern.begin("interaction")
        .followed_by("conversion")
        .within("30 minutes")
        .with_hierarchy(_H)
    )
    direct = match_sequence(
        events,
        [("click", "view"), ("purchase", "signup")],
        "30 MINUTES",
    )
    got = p.match(events)
    assert _canon(got) == _canon(direct.select(got.columns))


def test_subtype_narrows_and_validates(events):
    """subtype() narrows the step to a hierarchy descendant; widening
    or narrowing to a non-subset raises."""
    p = (
        Pattern.begin("activity")
        .with_hierarchy(_H)
        .subtype("interaction")
        .followed_by("conversion")
        .within("30 minutes")
    )
    q = (
        Pattern.begin("interaction")
        .followed_by("conversion")
        .within("30 minutes")
        .with_hierarchy(_H)
    )
    assert _canon(p.match(events)) == _canon(q.match(events))
    with pytest.raises(ValueError, match="narrows"):
        Pattern.begin("interaction").with_hierarchy(_H).subtype(
            "conversion"
        )
    # concrete member is a valid subtype of its parent
    n = (
        Pattern.begin("interaction")
        .with_hierarchy(_H)
        .subtype("view")
        .followed_by("purchase")
        .within("30 minutes")
    )
    direct = match_sequence(events, ["view", "purchase"], "30 MINUTES")
    got = n.match(events)
    assert _canon(got) == _canon(direct.select(got.columns))


def test_subtype_hierarchy_validation():
    with pytest.raises(ValueError, match="non-empty list"):
        Pattern.begin("a").with_hierarchy({"x": "view"})
    with pytest.raises(ValueError, match="non-empty list"):
        Pattern.begin("a").with_hierarchy({"x": []})
    cyc = Pattern.begin("x").with_hierarchy({"x": ["y"], "y": ["x"]})
    with pytest.raises(ValueError, match="cycle"):
        cyc._expand("x")


def test_subtype_negation_and_quantifier(events):
    """Abstract types work as negation absent-types and quantified
    loop/follower/until types."""
    pn = (
        Pattern.begin("view")
        .followed_by("purchase")
        .not_followed_by("interaction")
        .within("30 minutes")
        .with_hierarchy(_H)
    )
    direct = match_sequence_negated(
        events, ["view", "purchase"], ("click", "view"), "30 MINUTES"
    )
    got = pn.match(events)
    assert _canon(got) == _canon(direct.select(got.columns))
    pq = (
        Pattern.begin("interaction")
        .times(2, 3)
        .followed_by("conversion")
        .within("12 hours")
        .with_hierarchy(_H)
    )
    dq = match_times(
        events, ("click", "view"), ("purchase", "signup"), 2, 3, "12 HOURS"
    )
    assert _canon(pq.match(events)) == _canon(dq)
    # until overlap with the looping step set raises
    with pytest.raises(ValueError, match="overlap"):
        (
            Pattern.begin("interaction")
            .one_or_more("1 hour")
            .until("click")
            .followed_by("purchase")
            .within("12 hours")
            .with_hierarchy(_H)
        ).match(events)


def test_subtype_stream_remap_and_overlap_guard(spark):
    """Streaming desugaring rewrites tags to the abstract name
    (machines key transitions on equality); overlapping expansions
    have no single rewrite and are refused loudly."""
    p = (
        Pattern.begin("interaction")
        .followed_by("conversion")
        .within("30 minutes")
        .with_hierarchy(_H)
    )
    src = _planted(
        spark,
        [(1, 1, 0, "view"), (1, 2, 1, "signup"), (1, 3, 2, "error")],
    )
    remapped = p._remap_stream_types(src)
    got = {
        (r["event_id"], r["event_type"]) for r in remapped.collect()
    }
    assert got == {
        (1, "interaction"), (2, "conversion"), (3, "error")
    }
    # streaming plan compiles on the remapped stream (join path)
    out = p.match_stream(_sstream(spark))
    assert out.isStreaming
    # overlap: a concrete step inside another step's expansion
    bad = (
        Pattern.begin("interaction")
        .followed_by("click")
        .within("30 minutes")
        .with_hierarchy(_H)
    )
    with pytest.raises(ValueError, match="disjoint"):
        bad.match_stream(_sstream(spark))


# -- GroupPattern (Flink Pattern.begin(subPattern)) -------------------


def test_group_splice_equals_flat_chain(events):
    """An unquantified group is pure grouping syntax: the spliced
    chain equals the flat spelling, batch and streaming."""
    g = Pattern.begin("view").followed_by("click")
    p = Pattern.begin(g).followed_by("purchase").within("12 HOURS")
    flat = (
        Pattern.begin("view")
        .followed_by("click")
        .followed_by("purchase")
        .within("12 HOURS")
    )
    assert _canon(p.match(events)) == _canon(flat.match(events))


def test_group_times_equals_handbuilt_union(spark):
    """begin((A B)).times(1, 2).followed_by(C): the unroll equals the
    union of the hand-built r=1 and r=2 chains, with the r=1 branch's
    second-repetition columns NULL."""
    ev = _planted(
        spark,
        [
            # user 1: A B A B C — one 2-rep match and (all-combinations)
            # four 1-rep matches (A at 0 or 2 x B at 1 or 3, B after A)
            (1, 1, 0, "view"),
            (1, 2, 1, "click"),
            (1, 3, 2, "view"),
            (1, 4, 3, "click"),
            (1, 5, 4, "purchase"),
            # user 2: A B C only — one 1-rep match
            (2, 6, 0, "view"),
            (2, 7, 1, "click"),
            (2, 8, 2, "purchase"),
        ],
    )
    g = Pattern.begin("view").followed_by("click")
    p = Pattern.begin(g).times(1, 2).followed_by("purchase").within(
        "30 MINUTES"
    )
    got = p.match(ev)
    counts = {
        r["n_reps"]: r["count"]
        for r in got.groupBy("n_reps").count().collect()
    }
    # user 1 1-rep: A∈{0,2} x B∈{1,3} with B>A → (0,1),(0,3),(2,3) = 3
    assert counts == {1: 3 + 1, 2: 1}
    # the r=1 branch NULLs the second repetition's positions (2, 3)
    one = got.filter("n_reps = 1")
    assert one.filter("ts_2 IS NULL AND id_3 IS NULL").count() == 4
    # hand-built equality (modulo the NULL padding + n_reps)
    direct1 = match_sequence(ev, ["view", "click", "purchase"], "30 MINUTES")
    direct2 = match_sequence(
        ev, ["view", "click", "view", "click", "purchase"], "30 MINUTES"
    )
    assert one.count() == direct1.count()
    assert got.filter("n_reps = 2").count() == direct2.count()
    got1 = {
        (r["user_id"], r["ts_0"], r["ts_1"], r["ts_4"])
        for r in one.collect()
    }
    want1 = {
        (r["user_id"], r["ts_0"], r["ts_1"], r["ts_2"])
        for r in direct1.collect()
    }
    assert got1 == want1


def test_group_times_mid_chain_and_hierarchy(spark):
    """A quantified group NOT at the head (prefix step before it) and
    abstract member types resolve correctly."""
    ev = _planted(
        spark,
        [
            (1, 1, 0, "signup"),
            (1, 2, 1, "view"),   # interaction
            (1, 3, 2, "click"),  # interaction
            (1, 4, 3, "purchase"),
        ],
    )
    g = Pattern.begin("interaction").followed_by("interaction")
    p = (
        Pattern.begin("signup")
        .followed_by(g)
        .times(1, 1)
        .followed_by("purchase")
        .within("30 MINUTES")
        .with_hierarchy({"interaction": ["view", "click"]})
    )
    got = p.match(ev)
    # interactions pairs in order: (view,click) = 1 combination... plus
    # (view,view)? no second view; (click,click)? no. exactly 1 match
    assert got.count() == 1
    row = got.collect()[0]
    assert row["n_reps"] == 1 and row["ts_0"].minute == 0


def test_group_validation_errors(spark):
    g = Pattern.begin("view").followed_by("click")
    with pytest.raises(ValueError, match="GREEDY single-step"):
        Pattern.begin(g).one_or_more("1 hour")
    with pytest.raises(ValueError, match="optional"):
        Pattern.begin("signup").followed_by(g).optional()
    with pytest.raises(ValueError, match="subtype"):
        Pattern.begin(g).subtype("view")
    # a group must be a plain chain
    with pytest.raises(ValueError, match="plain chain"):
        Pattern.begin(Pattern.begin("view").followed_by("click").optional())
    with pytest.raises(ValueError, match="plain chain"):
        Pattern.begin(Pattern.begin("view").within("1 hour"))
    # nested groups are refused
    with pytest.raises(ValueError, match="nest"):
        Pattern.begin(Pattern.begin(g))
    ev = _planted(spark, [(1, 1, 0, "view")])
    # unroll cap
    big = Pattern.begin(g).times(1, 5).followed_by("purchase").within(
        "1 hour"
    )
    with pytest.raises(ValueError, match="<= 10"):
        big.match(ev)
    # one quantified group only
    two = Pattern.begin(g).times(1, 2).followed_by(g).times(1, 2).within(
        "1 hour"
    )
    with pytest.raises(ValueError, match="one quantified group"):
        two.match(ev)
    # negation with a quantified group is ambiguous
    neg = (
        Pattern.begin(g)
        .times(1, 2)
        .followed_by("purchase")
        .not_followed_by("error")
        .within("1 hour")
    )
    with pytest.raises(ValueError, match="ambiguous"):
        neg.match(ev)


def test_group_times_stream_equals_batch(spark, sf_dir):
    """The quantified-group streaming unroll (union of join-lowered
    fixed chains, NULL-padded to the maximal layout + n_reps) drains
    equal to the batch unroll."""
    from flink_framework_spark.io import table
    from flink_framework_spark.operators.streaming_ops import (
        _fmt_event_time,
    )
    from flink_framework_spark.streaming.twins import (
        read_events_stream,
        run_to_memory,
    )

    g = Pattern.begin("view").followed_by("click")
    p = (
        Pattern.begin(g)
        .times(1, 2)
        .followed_by("purchase")
        .within("12 hours")
    )
    ev = table(spark, sf_dir, "events")
    batch = p.match(ev)

    def fmt(df, src):
        cols = [F.col("user_id"), F.col("n_reps")]
        for i in range(5):
            cols.append(
                _fmt_event_time(src, F.col(f"ts_{i}")).alias(f"ts_{i}")
            )
            cols.append(F.col(f"id_{i}"))
        return df.select(*cols)

    sdf = read_events_stream(spark, sf_dir)
    out = p.match_stream(sdf)
    assert out.isStreaming and not _has_arrow_state(out)
    got = run_to_memory(
        fmt(out, sdf), query_name="t_ms_group", output_mode="append"
    ).toPandas()
    a = sorted(
        map(
            repr,
            got[sorted(got.columns)].itertuples(index=False, name=None),
        )
    )
    want = fmt(batch, ev).toPandas()
    b = sorted(
        map(
            repr,
            want[sorted(want.columns)].itertuples(
                index=False, name=None
            ),
        )
    )
    assert len(a) == len(b) > 0
    assert {r["n_reps"] for _, r in got.iterrows()} >= {1}
    assert a == b


def test_group_times_stream_validation(spark):
    g = Pattern.begin("view").followed_by("click")
    neg = (
        Pattern.begin(g)
        .times(1, 2)
        .followed_by("purchase")
        .not_followed_by("error")
        .within("1 hour")
    )
    with pytest.raises(ValueError, match="ambiguous"):
        neg.match_stream(_sstream(spark))
    big = Pattern.begin(g).times(1, 5).followed_by("purchase").within(
        "1 hour"
    )
    with pytest.raises(ValueError, match="<= 10"):
        big.match_stream(_sstream(spark))


# -- allowCombinations on the Pattern builder -------------------------


def test_allow_combinations_api_and_lowering(spark):
    from flink_framework_spark.operators.cep import match_combinations

    ev = _planted(
        spark,
        [
            (1, 1, 0, "click"),
            (1, 2, 1, "click"),
            (1, 3, 2, "click"),
            (1, 4, 5, "purchase"),
        ],
    )
    p = (
        Pattern.begin("click")
        .one_or_more()
        .allow_combinations()
        .followed_by("purchase")
        .within("30 MINUTES")
    )
    direct = match_combinations(ev, "click", "purchase", "30 MINUTES")
    assert _canon(p.match(ev)) == _canon(direct)
    # 3 clicks -> 2^3 - 1 = 7 combinations
    assert p.match(ev).count() == 7
    # bounded form rides times(m, n)
    pb = (
        Pattern.begin("click")
        .times(2, 3)
        .allow_combinations()
        .followed_by("purchase")
        .within("30 MINUTES")
    )
    assert pb.match(ev).count() == 3 + 1  # C(3,2) + C(3,3)


def test_allow_combinations_validation(spark):
    with pytest.raises(ValueError, match="quantified"):
        Pattern.begin("click").allow_combinations()
    with pytest.raises(ValueError, match="GREEDY-runs"):
        Pattern.begin("click").one_or_more("1 hour").allow_combinations()
    with pytest.raises(ValueError, match="greedy one_or_more"):
        (
            Pattern.begin("click")
            .one_or_more()
            .followed_by("purchase")
            .within("1 hour")
            .match(_planted(spark, [(1, 1, 0, "click")]))
        )
    with pytest.raises(ValueError, match="greedy one_or_more"):
        (
            Pattern.begin("click")
            .one_or_more()
            .allow_combinations()
            .until("error")
        )
    p = (
        Pattern.begin("click")
        .one_or_more()
        .allow_combinations()
        .followed_by("purchase")
        .within("1 hour")
    )
    with pytest.raises(ValueError, match="no streaming twin"):
        p.match_stream(_sstream(spark))
    # round 9: after_match_skip ON combinations is now the composed
    # skip_combinations lowering (boundary-sharing matches pruned
    # under the pinned canonical order) instead of a refusal
    p.skip_strategy = "skip_past_last"
    ev = _planted(
        spark,
        [
            (1, 1, 0, "click"),
            (1, 2, 1, "click"),
            (1, 3, 5, "purchase"),
        ],
    )
    got = sorted(tuple(r["ids"]) for r in p.match(ev).collect())
    # no-skip would emit (1,), (2,), (1, 2); PAST LAST keeps the
    # non-overlapping singletons only
    assert got == [(1,), (2,)]


# -- where() row-level conditions (Flink SimpleCondition) -------------


def test_where_filters_step_binding_only(spark):
    """where() restricts which events BIND a step; it does not make
    them invisible — a where-excluded event still breaks next_step()
    strict contiguity, exactly Flink's any-event rule."""
    ev = _planted(
        spark,
        [
            (1, 1, 0, "view"),
            (1, 2, 1, "click"),     # intruder between view and purchase
            (1, 3, 2, "purchase"),
            (2, 4, 0, "view"),
            (2, 5, 1, "purchase"),
        ],
    ).withColumn("value", F.col("event_id").cast("double"))
    strict = (
        Pattern.begin("view")
        .next_step("purchase")
        .within("30 MINUTES")
    )
    assert sorted(
        r["user_id"] for r in strict.match(ev).collect()
    ) == [2]
    # user 1's click excluded by a hypothetical filter would wrongly
    # let user 1 match if where() pre-filtered the events frame; the
    # builder keeps contiguity against the UNFILTERED stream
    both = (
        Pattern.begin("view")
        .next_step("purchase")
        .where("value >= 0")
        .within("30 MINUTES")
    )
    assert sorted(
        r["user_id"] for r in both.match(ev).collect()
    ) == [2]


def test_where_equals_prefiltered_chain(events):
    from flink_framework_spark.operators.cep import match_sequence

    p = (
        Pattern.begin("view")
        .where("value > 50")
        .followed_by("purchase")
        .where("value < 50")
        .within("12 HOURS")
    )
    pre = events.filter(
        "event_type != 'view' OR value > 50"
    ).filter("event_type != 'purchase' OR value < 50")
    direct = match_sequence(pre, ["view", "purchase"], "12 HOURS")
    got = p.match(events)
    assert _canon(got) == _canon(direct.select(got.columns))


def test_where_composes_with_quantifiers_and_hierarchy(events):
    from flink_framework_spark.operators.cep import match_times

    p = (
        Pattern.begin("interaction")
        .where("value > 20")
        .times(2, 3)
        .followed_by("conversion")
        .within("12 HOURS")
        .with_hierarchy(_H)
    )
    pre = events.filter(
        "event_type NOT IN ('view', 'click') OR value > 20"
    )
    direct = match_times(
        pre, ("click", "view"), ("purchase", "signup"), 2, 3, "12 HOURS"
    )
    assert _canon(p.match(events)) == _canon(direct)
    # repeated where() calls AND together
    q = (
        Pattern.begin("view")
        .where("value > 10")
        .where("value < 90")
        .followed_by("purchase")
        .within("12 HOURS")
    )
    r = (
        Pattern.begin("view")
        .where("value > 10 AND value < 90")
        .followed_by("purchase")
        .within("12 HOURS")
    )
    assert _canon(q.match(events)) == _canon(r.match(events))


def test_where_validation_and_stream_guard(spark):
    with pytest.raises(ValueError, match="needs a step"):
        Pattern().where("value > 1")
    g = Pattern.begin("view").followed_by("click")
    with pytest.raises(ValueError, match="member step"):
        Pattern.begin(g).where("value > 1")
    with pytest.raises(ValueError, match="plain chain"):
        Pattern.begin(Pattern.begin("view").where("value > 1"))
    # a FIXED chain with conditions streams on the join lowering...
    p = (
        Pattern.begin("view")
        .where("user_id >= 0")
        .followed_by("purchase")
        .within("1 hour")
    )
    out = p.match_stream(_sstream(spark))
    assert out.isStreaming and not _has_arrow_state(out)
    # ...and since round 10 the NFA-requiring shapes stream too: the
    # conditions compile into a pre-filter ahead of the Arrow machines
    # (drain-equality pinned in tests/test_pattern_where_stream.py)
    assert _has_arrow_state(p.match_stream(_sstream(spark), engine="nfa"))
    assert _has_arrow_state(
        (
            Pattern.begin("view")
            .where("user_id >= 0")
            .times(2, 3)
            .followed_by("purchase")
            .within("1 hour")
        ).match_stream(_sstream(spark))
    )
    assert _has_arrow_state(
        (
            Pattern.begin("view")
            .where("user_id >= 0")
            .followed_by("purchase")
            .not_followed_by("error")
            .within("1 hour")
        ).match_stream(_sstream(spark))
    )


def test_match_stream_where_join_equals_batch(spark, sf_dir):
    """A conditioned fixed chain drained through the streaming join
    lowering equals the batch match() — the where() residuals compile
    into the stream-stream joins' step scans."""
    from flink_framework_spark.operators.streaming_ops import (
        _fmt_event_time,
    )
    from flink_framework_spark.io import table
    from flink_framework_spark.streaming.twins import (
        read_events_stream,
        run_to_memory,
    )

    p = (
        Pattern.begin("view")
        .where("value < 50")
        .followed_by("purchase")
        .where("value >= 50")
        .within("12 hours")
    )
    ev = table(spark, sf_dir, "events")
    batch = p.match(ev)

    def fmt(df, src):
        cols = [F.col("user_id")]
        for i in range(2):
            cols.append(
                _fmt_event_time(src, F.col(f"ts_{i}")).alias(f"ts_{i}")
            )
            cols.append(F.col(f"id_{i}"))
        return df.select(*cols)

    sdf = read_events_stream(spark, sf_dir)
    got = run_to_memory(
        fmt(p.match_stream(sdf), sdf),
        query_name="t_ms_where",
        output_mode="append",
    ).toPandas()
    a = sorted(
        map(
            repr,
            got[sorted(got.columns)].itertuples(index=False, name=None),
        )
    )
    want = fmt(batch, ev).toPandas()
    b = sorted(
        map(
            repr,
            want[sorted(want.columns)].itertuples(
                index=False, name=None
            ),
        )
    )
    assert len(a) == len(b) > 0
    assert a == b


def test_group_times_stream_rejects_nfa_union(spark):
    g = Pattern.begin("view").followed_by("click")
    p = Pattern.begin(g).times(1, 2).followed_by("purchase").within(
        "1 hour"
    )
    with pytest.raises(ValueError, match="union of update-mode"):
        p.match_stream(_sstream(spark), engine="nfa")


def test_stream_route_info_agrees_with_actual_routing(spark):
    """The diagnostic must never drift from match_stream's real
    decisions: for every classified shape, 'join'/'join-union' means
    the built plan has no Arrow state and 'nfa' means it does;
    'rejected' means match_stream raises."""
    g = Pattern.begin("view").followed_by("click")
    shapes = [
        Pattern.begin("view").followed_by("purchase").within("1 hour"),
        Pattern.begin("view").where("user_id >= 0").followed_by(
            "purchase"
        ).within("1 hour"),
        Pattern.begin("view").followed_by("purchase").not_followed_by(
            "error"
        ).within("1 hour"),
        Pattern.begin("view").times(2, 3).followed_by("purchase").within(
            "1 hour"
        ),
        Pattern.begin("view").one_or_more("1 hour").followed_by(
            "purchase"
        ).within("2 hours"),
        Pattern.begin(g).times(1, 2).followed_by("purchase").within(
            "1 hour"
        ),
        # where() on a suffix step of a group-times pattern: the
        # unroll clones the condition into each join-lowered branch,
        # so this must stream as join-union (r8 ADVICE: the where
        # guard must not count the GROUP's times as a quantifier)
        Pattern.begin(g).times(1, 2).followed_by("purchase")
        .where("user_id >= 0").within("1 hour"),
        # rejected shapes
        Pattern.begin("view").followed_by("purchase"),
        Pattern.begin("view").followed_by("click").optional()
        .followed_by("purchase").within("1 hour"),
        Pattern.begin("view").where("user_id >= 0").times(2, 3)
        .followed_by("purchase").within("1 hour"),
        Pattern.begin("click").one_or_more().allow_combinations()
        .followed_by("purchase").within("1 hour"),
        # group-times with select/skip settings the group unroll
        # refuses — route_info must mirror those refusals too
        Pattern.begin(g).times(1, 2).followed_by("purchase")
        .within("1 hour").after_match_skip("skip_past_last"),
        Pattern.begin(g).times(1, 2).followed_by("purchase")
        .within("1 hour").select_strategy("first"),
    ]
    for p in shapes:
        info = p.stream_route_info()
        if info["engine"] == "rejected":
            with pytest.raises(ValueError):
                p.match_stream(_sstream(spark))
            continue
        out = p.match_stream(_sstream(spark))
        assert out.isStreaming
        has_arrow = _has_arrow_state(out)
        if info["engine"] in ("join", "join-union"):
            assert not has_arrow, info
            assert info["output_mode"] == "append"
        else:
            assert has_arrow, info
            assert info["output_mode"] == "update"


# -- one_or_more() on a GroupPattern (round 9) -------------------------


def test_group_one_or_more_equals_brute_force(spark):
    """begin((view click)).one_or_more().followed_by(purchase): the
    data-adaptive unroll equals an itertools brute-force enumerator
    of every (view click)^r purchase embedding (relaxed
    all-combinations contiguity, horizon-bounded), with the r
    discovered from the data — no times() bound declared."""
    from itertools import combinations as _comb

    rows = [
        # user 1: v c v c v c p — r up to 3
        (1, 1, 0, "view"), (1, 2, 1, "click"),
        (1, 3, 2, "view"), (1, 4, 3, "click"),
        (1, 5, 4, "view"), (1, 6, 5, "click"),
        (1, 7, 6, "purchase"),
        # user 2: v c p — r = 1 only
        (2, 8, 0, "view"), (2, 9, 1, "click"), (2, 10, 2, "purchase"),
        # user 3: no purchase — nothing
        (3, 11, 0, "view"), (3, 12, 1, "click"),
    ]
    ev = _planted(spark, rows)
    g = Pattern.begin("view").followed_by("click")
    p = Pattern.begin(g).one_or_more().followed_by("purchase").within(
        "30 MINUTES"
    )
    got = p.match(ev)

    # brute force: per user, pick 2r+1 strictly-increasing positions
    # typed v c v c ... v c p, all within the horizon of the first
    by_user: dict = {}
    for (u, e, m, t) in rows:
        by_user.setdefault(u, []).append((m, e, t))
    want = set()
    for u, evs in by_user.items():
        evs.sort()
        n = len(evs)
        for size in range(3, n + 1, 2):
            r = (size - 1) // 2
            for picks in _comb(range(n), size):
                types = [evs[i][2] for i in picks]
                expect = ["view", "click"] * r + ["purchase"]
                if types != expect:
                    continue
                if evs[picks[-1]][0] - evs[picks[0]][0] > 30:
                    continue
                want.add(
                    (u, r) + tuple(evs[i][1] for i in picks)
                )
    # map the padded output layout back to the compact id tuple
    got_set = set()
    max_pos = max(
        int(c.split("_")[1]) for c in got.columns if c.startswith("id_")
    )
    for row in got.collect():
        r = row["n_reps"]
        ids = tuple(
            row[f"id_{i}"] for i in range(2 * r)
        ) + (row[f"id_{max_pos}"],)
        got_set.add((row["user_id"], r) + ids)
    assert want and got_set == want
    # and it equals the explicit times(1, 3) bound
    bounded = Pattern.begin(
        Pattern.begin("view").followed_by("click")
    ).times(1, 3).followed_by("purchase").within("30 MINUTES")
    assert _canon(got) == _canon(bounded.match(ev))


def test_group_one_or_more_empty_and_cap(spark):
    g = Pattern.begin("view").followed_by("click")
    p = Pattern.begin(g).one_or_more().followed_by("purchase").within(
        "30 MINUTES"
    )
    # no match at any depth: empty frame with the r=1 layout
    ev = _planted(spark, [(1, 1, 0, "view"), (1, 2, 1, "click")])
    out = p.match(ev)
    assert out.count() == 0
    assert "n_reps" in out.columns and "ts_2" in out.columns
    # burst deeper than the unroll ceiling: loud refusal, not an
    # unbounded plan (cap for p=0, g=2, s=1 is r=4; plant r=5)
    deep = []
    eid = 0
    for i in range(5):
        deep.append((1, eid, 2 * i, "view")); eid += 1
        deep.append((1, eid, 2 * i + 1, "click")); eid += 1
    deep.append((1, eid, 11, "purchase"))
    with pytest.raises(ValueError, match="tighten within"):
        p.match(_planted(spark, deep))
    # streaming: refused WITHOUT a declared bound (round 10 streams
    # it under group_max_reps; the adaptive probe itself stays batch)
    with pytest.raises(ValueError, match="group_max_reps"):
        p.match_stream(_sstream(spark))
    assert p.stream_route_info()["engine"] == "rejected"
