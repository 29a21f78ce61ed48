"""Round 10: Pattern.where() on quantified / negated / forced-NFA
STREAMING shapes — previously the one non-env-blocked streaming
refusal (VERDICT r9 ask #5).

The Arrow state machines key transitions on the type tag, so
conditions compile into ONE pre-filter ahead of the machine
(operators/pattern.py _stream_where_prefilter). These tests pin the
drain-equality contract (stream == batch match set) for each shape,
plus the loud refusals for type-ambiguous condition bindings where a
pre-filter would be unsound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.pattern import Pattern


def _utc(df, col):
    c = F.col(col)
    if df.schema[col].dataType.simpleString() == "timestamp":
        c = F.convert_timezone(None, F.lit("UTC"), c)
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")


def _canon(pdf):
    return sorted(
        map(repr, pdf[sorted(pdf.columns)].itertuples(index=False, name=None))
    )


def _drain(df, name, mode):
    from flink_framework_spark.streaming.twins import run_to_memory

    return run_to_memory(df, query_name=name, output_mode=mode).toPandas()


def _quant_view(df):
    return df.select(
        "user_id",
        _utc(df, "ts_first").alias("f"),
        _utc(df, "ts_last").alias("l"),
        "n_reps",
    )


def _plant_events(spark, tmp_path, rows):
    """Write a planted events corpus (full events schema) so BOTH
    twins read it — batch via io.table, stream via the file source.
    rows: (user_id, event_id, 'HH:MM', event_type, value)."""
    df = spark.createDataFrame(
        [
            (e, f"2024-01-01 {hm}:00", u, t, v, "{}")
            for (u, e, hm, t, v) in rows
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id",
        "CAST(ts AS timestamp_ntz) AS ts",
        "user_id",
        "event_type",
        "value",
        "props",
    )
    # the twins' file-source glob matches a FILE named events.parquet
    # (the testdata layout) — flatten Spark's output directory
    import glob
    import shutil

    stage = f"{tmp_path}/_stage"
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(f"{stage}/part-*.parquet")[0]
    shutil.copy(part, f"{tmp_path}/events.parquet")
    shutil.rmtree(stage)
    return str(tmp_path)


# Planted quantified timelines. Streaming run CLOSURE needs a later
# step event beyond the gap/horizon (the machines emit maximal runs
# on closure, and a bounded file stream ends instead of closing the
# tail run) — every user gets a far trailing high-value click whose
# own run stays unmatched in both engines, so stream == batch exactly.
# user 1: two qualifying clicks + qualifying purchase -> match n=2.
# user 2: qualifying, FILTERED-OUT (low value), qualifying click —
#         under the condition the low click is invisible and the run
#         is n=2 spanning it (the semantics the pre-filter must get
#         right); unconditioned it is a 3-run -> the condition bites.
# user 3: two qualifying clicks but the only purchase fails the
#         FOLLOWER condition -> no match conditioned, match
#         unconditioned -> the follower condition bites.
_QUANT_ROWS = [
    (1, 100, "10:00", "click", 0.9),
    (1, 101, "10:05", "click", 0.9),
    (1, 102, "10:10", "purchase", 0.9),
    (1, 103, "22:00", "click", 0.9),
    (2, 200, "09:00", "click", 0.9),
    (2, 201, "09:10", "click", 0.1),
    (2, 202, "09:20", "click", 0.9),
    (2, 203, "09:40", "purchase", 0.9),
    (2, 204, "21:00", "click", 0.9),
    (3, 300, "11:00", "click", 0.9),
    (3, 301, "11:05", "click", 0.9),
    (3, 302, "11:30", "purchase", 0.1),
    (3, 303, "23:00", "click", 0.9),
]


def test_times_where_stream_equals_batch(spark, tmp_path):
    """Conditioned times(2,3): head AND follower carry where() —
    the streamed match set equals batch match() on a planted
    timeline, and both conditions provably bite."""
    from flink_framework_spark.streaming.twins import read_events_stream

    d = _plant_events(spark, tmp_path, _QUANT_ROWS)
    p = (
        Pattern.begin("click")
        .where("value > 0.5")
        .times(2, 3)
        .followed_by("purchase")
        .where("value > 0.5")
        .within("2 hours")
    )
    batch = _quant_view(p.match(table(spark, d, "events"))).toPandas()
    # users 1 and 2 match with n_reps=2; user 2's run SPANS the
    # filtered low-value click; user 3 dies on the follower condition
    assert sorted(
        (r["user_id"], r["n_reps"]) for _, r in batch.iterrows()
    ) == [(1, 2), (2, 2)]
    unc = (
        Pattern.begin("click")
        .times(2, 3)
        .followed_by("purchase")
        .within("2 hours")
    )
    unc_pairs = sorted(
        (r["user_id"], r["n_reps"])
        for _, r in _quant_view(unc.match(table(spark, d, "events")))
        .toPandas()
        .iterrows()
    )
    assert (3, 2) in unc_pairs and (2, 3) in unc_pairs  # both bite
    out = p.match_stream(read_events_stream(spark, d))
    got = _drain(_quant_view(out), "t_where_times", "update")
    assert _canon(got) == _canon(batch)


def test_greedy_where_stream_equals_batch(spark, tmp_path):
    """Conditioned greedy one_or_more drains equal to batch on the
    planted timeline (maximal runs measured over QUALIFYING clicks
    only — the filtered click neither extends nor breaks a run)."""
    from flink_framework_spark.streaming.twins import read_events_stream

    d = _plant_events(spark, tmp_path, _QUANT_ROWS)
    p = (
        Pattern.begin("click")
        .where("value > 0.5")
        .one_or_more("30 minutes")
        .followed_by("purchase")
        .within("2 hours")
    )
    batch = _quant_view(p.match(table(spark, d, "events"))).toPandas()
    # no follower condition here, so user 3's low-value purchase
    # qualifies — three users match, each a 2-run of HIGH clicks
    assert sorted(
        (r["user_id"], r["n_reps"]) for _, r in batch.iterrows()
    ) == [(1, 2), (2, 2), (3, 2)]
    # unconditioned, user 2's run is a 3-run (the low click counts)
    unc = (
        Pattern.begin("click")
        .one_or_more("30 minutes")
        .followed_by("purchase")
        .within("2 hours")
    )
    assert (2, 3) in [
        (r["user_id"], r["n_reps"])
        for _, r in _quant_view(unc.match(table(spark, d, "events")))
        .toPandas()
        .iterrows()
    ]
    out = p.match_stream(read_events_stream(spark, d))
    got = _drain(_quant_view(out), "t_where_greedy", "update")
    assert _canon(got) == _canon(batch)


def test_negation_where_stream_equals_batch(spark, sf_dir):
    """Conditioned positive steps around a not_followed_by span: the
    negation state machine sees the pre-filtered stream; absent-type
    events pass through untouched."""
    from flink_framework_spark.streaming.twins import read_events_stream

    p = (
        Pattern.begin("view")
        .where("value > 0.2")
        .followed_by("purchase")
        .not_followed_by("error")
        .within("30 minutes")
    )
    ev = table(spark, sf_dir, "events")
    bdf = p.match(ev)
    batch = bdf.select(
        "user_id",
        _utc(bdf, "ts_0").alias("t0"),
        "id_0",
        _utc(bdf, "ts_1").alias("t1"),
        "id_1",
    ).toPandas()
    out = p.match_stream(read_events_stream(spark, sf_dir))
    got = _drain(
        out.select(
            "user_id",
            _utc(out, "ts_0").alias("t0"),
            "id_0",
            _utc(out, "ts_1").alias("t1"),
            "id_1",
        ),
        "t_where_neg",
        "update",
    )
    assert len(batch) > 0
    assert _canon(got) == _canon(batch)


def test_forced_nfa_where_equals_join_lowering(spark, sf_dir):
    """The SAME conditioned fixed chain drained through engine='nfa'
    (pre-filter) and engine='auto' (join residuals) yields one match
    set — the routing stays a pure performance choice."""
    from flink_framework_spark.streaming.twins import read_events_stream

    p = (
        Pattern.begin("view")
        .where("value > 0.4")
        .followed_by("purchase")
        .within("1 hour")
    )

    def view(df):
        return df.select(
            "user_id",
            _utc(df, "ts_0").alias("t0"),
            "id_0",
            _utc(df, "ts_1").alias("t1"),
            "id_1",
        )

    a = _drain(
        view(p.match_stream(read_events_stream(spark, sf_dir))),
        "t_where_join",
        "append",
    )
    b = _drain(
        view(
            p.match_stream(
                read_events_stream(spark, sf_dir), engine="nfa"
            )
        ),
        "t_where_nfa",
        "update",
    )
    assert len(a) > 0
    assert _canon(a) == _canon(b)


def _sstream(spark):
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


def test_where_prefilter_ambiguity_refusals(spark):
    """Type-ambiguous condition bindings stay loud refusals on the
    state-machine paths (a pre-filter would eat events another step
    still needs)."""
    # same type, two different conditions, forced NFA
    p1 = (
        Pattern.begin("view")
        .where("event_id > 2")
        .followed_by("view")
        .where("event_id > 7")
        .within("1 hour")
    )
    with pytest.raises(ValueError, match="different conditions"):
        p1.match_stream(_sstream(spark), engine="nfa")
    # conditioned + unconditioned same type, forced NFA
    p2 = (
        Pattern.begin("view")
        .where("event_id > 2")
        .followed_by("view")
        .within("1 hour")
    )
    with pytest.raises(ValueError, match="unconditioned"):
        p2.match_stream(_sstream(spark), engine="nfa")
    # negated type carrying a condition
    p3 = (
        Pattern.begin("view")
        .where("event_id > 2")
        .followed_by("purchase")
        .not_followed_by("view")
        .within("1 hour")
    )
    with pytest.raises(ValueError, match="negated type"):
        p3.match_stream(_sstream(spark))
    # ...but the join lowering still streams the per-step-residual
    # case the pre-filter refuses (fixed chain, auto routing)
    assert p1.match_stream(_sstream(spark)).isStreaming


def test_route_info_agrees_with_entry_point(spark):
    """stream_route_info must claim the routes the entry point
    actually takes for conditioned quantified/negated shapes."""
    pt = (
        Pattern.begin("view")
        .where("event_id > 2")
        .times(2, 3)
        .followed_by("purchase")
        .within("1 hour")
    )
    info = pt.stream_route_info()
    assert info["engine"] == "nfa"
    assert "pre-filter" in info["reason"]
    out = pt.match_stream(_sstream(spark))
    assert out.isStreaming
    # ambiguity rejected in BOTH places with the same reason
    bad = (
        Pattern.begin("view")
        .where("event_id > 2")
        .times(2, 3)
        .followed_by("view")
        .within("1 hour")
    )
    inf2 = bad.stream_route_info()
    assert inf2["engine"] == "rejected"
    with pytest.raises(ValueError, match="unconditioned"):
        bad.match_stream(_sstream(spark))


def test_group_one_or_more_streams_under_declared_bound(spark, tmp_path):
    """Round-10 ask #6: one_or_more() on a GroupPattern streams under
    a DECLARED repetition bound (group_max_reps) as the times(1, r)
    join-lowered union — drain-equal to the batch data-adaptive
    unroll when the bound covers the data's maximal depth."""
    from flink_framework_spark.streaming.twins import read_events_stream

    rows = [
        # user 1: (v c)^3 p -> r up to 3
        (1, 1, "10:00", "view", 0.5),
        (1, 2, "10:01", "click", 0.5),
        (1, 3, "10:02", "view", 0.5),
        (1, 4, "10:03", "click", 0.5),
        (1, 5, "10:04", "view", 0.5),
        (1, 6, "10:05", "click", 0.5),
        (1, 7, "10:06", "purchase", 0.5),
        # user 2: one repetition only
        (2, 8, "10:00", "view", 0.5),
        (2, 9, "10:01", "click", 0.5),
        (2, 10, "10:02", "purchase", 0.5),
        # user 3: no purchase -> nothing
        (3, 11, "10:00", "view", 0.5),
        (3, 12, "10:01", "click", 0.5),
        # watermark pusher: a lone far-future view (never completes a
        # chain) so the availableNow drain finalizes every join state
        (9, 99, "23:50", "view", 0.5),
    ]
    d = _plant_events(spark, tmp_path, rows)
    g = Pattern.begin("view").followed_by("click")
    p = (
        Pattern.begin(g)
        .one_or_more()
        .followed_by("purchase")
        .within("30 MINUTES")
    )
    ev = table(spark, d, "events")
    batch = p.match(ev)
    r_max = (
        max(int(c.split("_")[1]) for c in batch.columns if c.startswith("ts_"))
    ) // 2  # layout positions = 2*r_max + 1
    assert r_max == 3

    def view(df):
        # repetition positions 0..2r-1 align across layouts; the
        # suffix (purchase) sits at the LAST position of each layout
        last = max(
            int(c.split("_")[1]) for c in df.columns if c.startswith("ts_")
        )
        cols = [F.col("user_id"), F.col("n_reps")]
        for i in range(2 * r_max):
            cols.append(_utc(df, f"ts_{i}").alias(f"t{i}"))
            cols.append(F.col(f"id_{i}"))
        cols.append(_utc(df, f"ts_{last}").alias("t_suffix"))
        cols.append(F.col(f"id_{last}").alias("id_suffix"))
        return df.select(*cols)

    out = p.match_stream(read_events_stream(spark, d), group_max_reps=r_max)
    assert out.isStreaming
    got = _drain(view(out), "t_group_oom", "append")
    want = view(batch).toPandas()
    assert len(want) > 0
    assert _canon(got) == _canon(want)

    # a LARGER declared bound keeps the same match set (extra
    # repetition columns are NULL padding; compare on the common view)
    wider = p.match_stream(
        read_events_stream(spark, d), group_max_reps=r_max + 1
    )
    got_wider = _drain(view(wider), "t_group_oom_w", "append")
    assert _canon(got_wider) == _canon(want)

    # without the bound: loud refusal naming the knob
    with pytest.raises(ValueError, match="group_max_reps"):
        p.match_stream(read_events_stream(spark, d))
    with pytest.raises(ValueError, match=">= 1"):
        p.match_stream(read_events_stream(spark, d), group_max_reps=0)
    info = p.stream_route_info()
    assert info["engine"] == "rejected"
    assert "group_max_reps" in info["reason"]


# ---- seeded fuzz: random timelines + conditions, stream == batch ----
#
# Each seed plants a guaranteed match motif (two high-value clicks +
# a purchase inside the horizon) plus random noise events and value
# draws from {0.1, 0.3, 0.9} (discrete, away from the thresholds), a
# far trailing click per user to close open runs, and a random
# condition threshold. The drained state machine must equal batch
# match() row-for-row.

def _fuzz_rows(seed: int):
    import random

    rng = random.Random(7_000 + seed)
    rows = []
    eid = 0
    for u in (1, 2, 3):
        # guaranteed motif inside the 2-hour horizon
        base = rng.randrange(0, 30)
        for off in (0, rng.randrange(5, 25)):
            rows.append((u, eid, base + off, "click", 0.9))
            eid += 1
        rows.append((u, eid, base + 40, "purchase", 0.9))
        eid += 1
        # noise
        for _ in range(rng.randrange(4, 9)):
            rows.append(
                (
                    u,
                    eid,
                    rng.randrange(0, 120),
                    "click" if rng.random() < 0.7 else "purchase",
                    rng.choice([0.1, 0.3, 0.9]),
                )
            )
            eid += 1
        # far trailing closer (beyond every horizon)
        rows.append((u, eid, 600, "click", 0.9))
        eid += 1
    # minute -> HH:MM, dedupe (user, minute, type) collisions by
    # keeping distinct event ids (ties are legal input)
    return [
        (u, e, f"{m // 60:02d}:{m % 60:02d}", t, v)
        for (u, e, m, t, v) in rows
    ]


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_times_where_stream_equals_batch(spark, tmp_path, seed):
    from flink_framework_spark.streaming.twins import read_events_stream

    d = _plant_events(spark, tmp_path, _fuzz_rows(seed))
    import random

    rng = random.Random(8_000 + seed)
    thr = rng.choice([0.2, 0.5])
    pat = (
        Pattern.begin("click")
        .where(f"value > {thr}")
        .times(2, 3)
        .followed_by("purchase")
        .within("2 hours")
    )
    if seed % 2 == 1:  # odd seeds also condition the follower
        pat = (
            Pattern.begin("click")
            .where(f"value > {thr}")
            .times(2, 3)
            .followed_by("purchase")
            .where("value > 0.2")
            .within("2 hours")
        )
    batch = _quant_view(pat.match(table(spark, d, "events"))).toPandas()
    got = _drain(
        _quant_view(pat.match_stream(read_events_stream(spark, d))),
        f"t_fz_times_{seed}",
        "update",
    )
    assert len(batch) > 0  # the planted motif guarantees matches
    assert _canon(got) == _canon(batch)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_greedy_where_stream_equals_batch(spark, tmp_path, seed):
    from flink_framework_spark.streaming.twins import read_events_stream

    d = _plant_events(spark, tmp_path, _fuzz_rows(100 + seed))
    import random

    rng = random.Random(9_000 + seed)
    thr = rng.choice([0.2, 0.5])
    pat = (
        Pattern.begin("click")
        .where(f"value > {thr}")
        .one_or_more("30 minutes")
        .followed_by("purchase")
        .within("2 hours")
    )
    batch = _quant_view(pat.match(table(spark, d, "events"))).toPandas()
    got = _drain(
        _quant_view(pat.match_stream(read_events_stream(spark, d))),
        f"t_fz_greedy_{seed}",
        "update",
    )
    assert len(batch) > 0
    assert _canon(got) == _canon(batch)


def test_cep_suite_breakdown_covers_every_component(spark):
    """bench.py's q_cep_suite profile (BENCH.json "breakdown"): one
    wall-time per component, all positive — the measurement-trust
    surface the round-9 verdict asked for, smoke-checked at sf0.001
    so a component rename breaks loudly here, not in the driver's
    bench run."""
    from flink_framework_spark.queries.driver_suite import (
        cep_suite_breakdown,
    )

    got = cep_suite_breakdown(spark, "/root/testdata/sf0.001")
    assert set(got) == {
        "times_skip", "sql9", "mr_strict", "mr_funnel", "mr_runs",
        "mr_all_rows", "mr_reluctant", "mr_skip_to", "mr_agg_define",
        "mr_define_nav",
    }
    assert all(v > 0 for v in got.values())
