"""Flink SQL statement dialect (sql.flink_sql): TVF rewrite
mechanics, MATCH_RECOGNIZE embedding, window_time semantics, and
loud rejection of out-of-scope argument forms. Value equivalence of
the five registered q_fsql_* statements is oracle-checked in
test_oracle.py; these tests pin the shim's own behavior."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from flink_framework_spark.sql import (
    _interval_seconds,
    _scan_balanced,
    _split_top_level,
    flink_sql,
)

EVENTS_SCHEMA = (
    "user_id long, ts string, event_id long, event_type string, value double"
)


def frame(spark, rows):
    # TIMESTAMP_NTZ like the batch tables: the suite session runs
    # under America/New_York, and these tests assert wall-clock
    # window bounds
    return spark.createDataFrame(rows, EVENTS_SCHEMA).selectExpr(
        "user_id", "CAST(ts AS timestamp_ntz) AS ts", "event_id",
        "event_type", "value",
    )


ROWS = [
    (1, "2024-01-01 10:05:00", 1, "view", 1.0),
    (1, "2024-01-01 10:50:00", 2, "click", 2.0),
    (1, "2024-01-01 11:40:00", 3, "purchase", 3.0),
]


def test_interval_parsing():
    assert _interval_seconds("INTERVAL '1' HOUR") == 3600.0
    assert _interval_seconds("interval '15' minutes") == 900.0
    assert _interval_seconds("INTERVAL '2' DAY") == 172800.0
    with pytest.raises(ValueError, match="INTERVAL"):
        _interval_seconds("'1' HOUR")


def test_balanced_scan_skips_literals():
    s = "f(a, '(', g(')'))rest"
    assert s[_scan_balanced(s, 1):] == "rest"
    assert _split_top_level("a, f(b, c), 'x,y'") == ["a", "f(b, c)", "'x,y'"]


def test_tumble_statement_and_window_time(spark):
    ev = frame(spark, ROWS)
    out = flink_sql(spark, """
        SELECT window_start, window_end, window_time, COUNT(*) AS n
        FROM TABLE(TUMBLE(TABLE ev3, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window_start, window_end, window_time
        ORDER BY window_start
    """, tables={"ev3": ev}).collect()
    assert [r.n for r in out] == [2, 1]
    for r in out:
        # Flink: window_time is the window's rowtime = end - 1 ms
        assert (r.window_end - r.window_time).total_seconds() == 0.001


def test_hop_assigns_size_over_slide_windows(spark):
    ev = frame(spark, ROWS[:1])  # one event at 10:05
    out = flink_sql(spark, """
        SELECT window_start FROM TABLE(
          HOP(TABLE ev1, DESCRIPTOR(ts), INTERVAL '15' MINUTE,
              INTERVAL '1' HOUR))
        ORDER BY window_start
    """, tables={"ev1": ev}).collect()
    # 1h windows sliding 15m: the event belongs to 4 of them
    starts = [str(r.window_start) for r in out]
    assert starts == [
        "2024-01-01 09:15:00", "2024-01-01 09:30:00",
        "2024-01-01 09:45:00", "2024-01-01 10:00:00",
    ]


def test_session_tvf_bounds(spark):
    ev = frame(spark, ROWS)  # gaps 45m, 50m with a 30m gap -> 3 sessions
    out = flink_sql(spark, """
        SELECT user_id, window_start, window_end, COUNT(*) AS n
        FROM TABLE(SESSION(TABLE evs PARTITION BY user_id,
                           DESCRIPTOR(ts), INTERVAL '30' MINUTE))
        GROUP BY user_id, window_start, window_end
        ORDER BY window_start
    """, tables={"evs": ev}).collect()
    assert len(out) == 3
    assert str(out[0].window_start) == "2024-01-01 10:05:00"
    assert str(out[0].window_end) == "2024-01-01 10:35:00"  # first + gap


def test_match_recognize_embedded_with_outer_filter(spark):
    ev = frame(spark, ROWS)
    out = flink_sql(spark, """
        SELECT user_id, a_id, b_id
        FROM evm MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          MEASURES A.event_id AS a_id, B.event_id AS b_id
          PATTERN (A B)
          DEFINE A AS A.event_type = 'click',
                 B AS B.event_type = 'purchase'
        ) WHERE b_id > 0
    """, tables={"evm": ev}).collect()
    assert [(r.a_id, r.b_id) for r in out] == [(2, 3)]


def test_match_recognize_embedded_nav_define(spark):
    """Round-7 addition rides through the statement dialect:
    FIRST/LAST match-relative navigation inside DEFINE in a
    FROM-embedded MATCH_RECOGNIZE (falling-run segmentation)."""
    rows = [
        (1, "2024-01-01 10:0%d:00" % j, j + 1, "t", v)
        for j, v in enumerate([10.0, 8.0, 5.0, 7.0, 4.0])
    ]
    out = flink_sql(spark, """
        SELECT user_id, top_v, n
        FROM evm MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          MEASURES FIRST(DOWN.value) AS top_v, COUNT(DOWN.*) AS n
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (DOWN+)
          DEFINE DOWN AS LAST(DOWN.value, 1) IS NULL
                         OR DOWN.value < LAST(DOWN.value, 1)
        )
    """, tables={"evm": frame(spark, rows)}).collect()
    assert sorted((r.top_v, r.n) for r in out) == [(7.0, 2), (10.0, 3)]


def test_match_recognize_embedded_reluctant_and_skip_to(spark):
    """Round-6 additions ride through the statement dialect: a
    reluctant quantifier and a variable-targeted skip inside a
    FROM-embedded MATCH_RECOGNIZE."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 1.0),
        (1, "2024-01-01 10:01:00", 2, "click", 2.0),
        (1, "2024-01-01 10:02:00", 3, "click", 3.0),
        (1, "2024-01-01 10:03:00", 4, "click", 4.0),
        (1, "2024-01-01 10:04:00", 5, "click", 5.0),
    ]
    ev = frame(spark, rows)
    # lazy run: B{2,}? chops the 5-island into 2+2
    out = flink_sql(spark, """
        SELECT user_id, fb, n_b
        FROM evm MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          MEASURES FIRST(B.event_id) AS fb, COUNT(B.*) AS n_b
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (B{2,}?)
          DEFINE B AS B.event_type = 'click'
        )
    """, tables={"evm": ev}).collect()
    assert sorted((r.fb, r.n_b) for r in out) == [(1, 2), (3, 2)]
    # SKIP TO LAST chains triples end-to-start
    out = flink_sql(spark, """
        SELECT user_id, x_id, z_id
        FROM evm MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          MEASURES X.event_id AS x_id, Z.event_id AS z_id
          AFTER MATCH SKIP TO LAST Z
          PATTERN (X Y Z)
          DEFINE X AS X.event_type = 'click',
                 Y AS Y.event_type = 'click',
                 Z AS Z.event_type = 'click'
        )
    """, tables={"evm": ev}).collect()
    assert sorted((r.x_id, r.z_id) for r in out) == [(1, 3), (3, 5)]


def test_tvf_rejects_out_of_scope_forms(spark):
    ev = frame(spark, ROWS)
    ev.createOrReplaceTempView("evx")
    with pytest.raises(ValueError, match="TUMBLE"):
        flink_sql(spark, """
            SELECT * FROM TABLE(TUMBLE(TABLE evx, DESCRIPTOR(ts),
                INTERVAL '1' HOUR, INTERVAL '5' MINUTE,
                INTERVAL '1' MINUTE))""")
    with pytest.raises(ValueError, match="SESSION-only"):
        flink_sql(spark, """
            SELECT * FROM TABLE(TUMBLE(TABLE evx PARTITION BY user_id,
                DESCRIPTOR(ts), INTERVAL '1' HOUR))""")
    with pytest.raises(ValueError, match="DESCRIPTOR"):
        flink_sql(spark, """
            SELECT * FROM TABLE(TUMBLE(TABLE evx, ts, INTERVAL '1' HOUR))""")


def test_statement_without_flink_constructs_passes_through(spark):
    ev = frame(spark, ROWS)
    out = flink_sql(
        spark,
        "SELECT COUNT(*) AS n FROM evp WHERE value > 1.5",
        tables={"evp": ev},
    ).collect()
    assert out[0].n == 2


def test_literal_containing_tvf_text_is_not_rewritten(spark):
    ev = frame(spark, ROWS)
    out = flink_sql(spark, """
        SELECT 'TABLE(TUMBLE(' AS s, COUNT(*) AS n FROM evq GROUP BY 1
    """, tables={"evq": ev}).collect()
    assert out[0].s == "TABLE(TUMBLE(" and out[0].n == 3


def test_tumble_statement_streaming_append_equals_batch(spark, sf_dir):
    """The statement dialect composes with Structured Streaming: a
    watermarked stream registered as the TVF source supports
    append-mode (watermark-finalized) aggregation when the statement
    groups by the preserved ``window`` struct — and the drained
    result equals the same statement run on the batch table."""
    from flink_framework_spark.io import table
    from flink_framework_spark.streaming.twins import (
        read_events_stream,
        run_to_memory,
    )

    stmt = """
        SELECT DATE_FORMAT({start}, 'yyyy-MM-dd HH:mm:ss') AS ws,
               event_type, COUNT(*) AS n, MAX(window.end) AS we
        FROM TABLE(TUMBLE(TABLE {src}, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window, event_type
    """
    sdf = read_events_stream(spark, sf_dir, with_watermark="2 seconds")
    streamed = flink_sql(
        spark,
        # the stream carries TIMESTAMP instants: render the window
        # start in UTC so it matches the batch table's NTZ wall clock
        stmt.format(src="fsql_sev",
                    start="convert_timezone('UTC', window.start)"),
        tables={"fsql_sev": sdf},
    )
    assert streamed.isStreaming
    got = run_to_memory(
        streamed, query_name="t_fsql_stream_tumble", output_mode="append"
    )
    bat = table(spark, sf_dir, "events")
    exp = flink_sql(
        spark,
        stmt.format(src="fsql_bev", start="window.start"),
        tables={"fsql_bev": bat},
    )
    # append mode only emits windows the final watermark closed: the
    # window holding the max event time stays open when the stream
    # drains — exclude it from the batch expectation
    from datetime import timedelta

    wm_final = bat.agg(F.max("ts")).collect()[0][0] - timedelta(seconds=2)
    a = sorted((r.ws, r.event_type, r.n) for r in got.collect())
    b = sorted(
        (r.ws, r.event_type, r.n)
        for r in exp.collect()
        if r.we <= wm_final
    )
    assert a == b and len(a) > 0


def test_tvf_rejects_output_column_collisions(spark):
    ev = frame(spark, ROWS).withColumn("window_start", F.lit(1))
    with pytest.raises(ValueError, match="window_start"):
        flink_sql(spark, """
            SELECT * FROM TABLE(TUMBLE(TABLE evc, DESCRIPTOR(ts),
                INTERVAL '1' HOUR))""", tables={"evc": ev})
    ev2 = frame(spark, ROWS).withColumn("end_ts", F.lit(1))
    with pytest.raises(ValueError, match="end_ts"):
        flink_sql(spark, """
            SELECT * FROM TABLE(CUMULATE(TABLE evc2, DESCRIPTOR(ts),
                INTERVAL '15' MINUTE, INTERVAL '1' HOUR))""",
            tables={"evc2": ev2})


def test_temporal_join_statement(spark):
    dim_rows = [
        (1, "bronze", "2024-01-01 00:00:00", "2024-01-05 00:00:00", 1),
        (1, "gold", "2024-01-05 00:00:00", None, 2),
    ]
    dim = spark.createDataFrame(
        dim_rows, "user_id long, tier string, valid_from string,"
        " valid_to string, version long"
    ).selectExpr(
        "user_id", "tier", "CAST(valid_from AS timestamp_ntz) AS valid_from",
        "CAST(valid_to AS timestamp_ntz) AS valid_to", "version",
    )
    facts = frame(spark, [
        (1, "2023-12-30 12:00:00", 10, "click", 0.0),  # before v1: drops
        (1, "2024-01-02 12:00:00", 11, "click", 0.0),  # inside v1
        (1, "2024-01-05 00:00:00", 12, "click", 0.0),  # v2 boundary
        (1, "2024-06-01 00:00:00", 13, "click", 0.0),  # current version
    ])
    out = flink_sql(spark, """
        SELECT f.event_id, d.tier, d.version
        FROM tj_facts f
        JOIN tj_dim FOR SYSTEM_TIME AS OF f.ts AS d
          ON f.user_id = d.user_id
        ORDER BY f.event_id
    """, tables={"tj_facts": facts, "tj_dim": dim})
    assert [(r.event_id, r.tier, r.version) for r in out.collect()] == [
        (11, "bronze", 1), (12, "gold", 2), (13, "gold", 2),
    ]
    # bare form (no alias): dim name qualifies the predicate
    out2 = flink_sql(spark, """
        SELECT f.event_id, tj_dim.tier
        FROM tj_facts f
        JOIN tj_dim FOR SYSTEM_TIME AS OF f.ts
          ON f.user_id = tj_dim.user_id
        ORDER BY f.event_id
    """)
    assert [r.event_id for r in out2.collect()] == [11, 12, 13]


def test_temporal_join_rejects_unversioned_dim(spark):
    facts = frame(spark, ROWS)
    facts.createOrReplaceTempView("tj_facts2")
    frame(spark, ROWS).createOrReplaceTempView("tj_plain")
    with pytest.raises(ValueError, match="valid_from"):
        flink_sql(spark, """
            SELECT * FROM tj_facts2 f
            JOIN tj_plain FOR SYSTEM_TIME AS OF f.ts AS d
              ON f.user_id = d.user_id""")


def test_temporal_join_parenthesizes_or_condition(spark):
    """A top-level OR in the ON condition must not escape the
    point-in-time filter: the rewrite parenthesizes the original
    condition before ANDing the containment predicate."""
    dim = spark.createDataFrame(
        [(1, "bronze", "2024-01-01 00:00:00", "2024-01-05 00:00:00", 1),
         (1, "gold", "2024-01-05 00:00:00", None, 2)],
        "user_id long, tier string, valid_from string, valid_to string,"
        " version long",
    ).selectExpr(
        "user_id", "tier",
        "CAST(valid_from AS timestamp_ntz) AS valid_from",
        "CAST(valid_to AS timestamp_ntz) AS valid_to", "version",
    )
    facts = frame(spark, [(1, "2024-01-02 12:00:00", 11, "click", 0.0)])
    out = flink_sql(spark, """
        SELECT f.event_id, d.version
        FROM tjp_facts f
        JOIN tjp_dim FOR SYSTEM_TIME AS OF f.ts AS d
          ON f.user_id = d.user_id OR f.event_id = d.user_id
        WHERE f.event_id > 0
    """, tables={"tjp_facts": facts, "tjp_dim": dim})
    # without parenthesization the OR branch would match BOTH versions
    assert [(r.event_id, r.version) for r in out.collect()] == [(11, 1)]


def test_tumble_offset_shifts_grid(spark):
    """FLIP-145 TUMBLE offset: the window grid shifts by the offset
    (Spark startTime) — a 10:20 event with 1-hour windows offset by
    15 minutes lands in [10:15, 11:15)."""
    df = frame(spark, [(1, "2024-01-01 10:20:00", 1, "view", 5.0)])
    out = flink_sql(spark, """
        SELECT window_start, window_end FROM
        TABLE(TUMBLE(TABLE ev, DESCRIPTOR(ts), INTERVAL '1' HOUR,
                     INTERVAL '15' MINUTE))""", tables={"ev": df})
    r = out.collect()[0]
    assert str(r["window_start"]) == "2024-01-01 10:15:00"
    assert str(r["window_end"]) == "2024-01-01 11:15:00"


def test_tumble_negative_offset(spark):
    """Negative offsets (Flink's timezone-shift example) shift the
    grid backwards: -15 minutes puts 10:20 in [09:45, 10:45)."""
    df = frame(spark, [(1, "2024-01-01 10:20:00", 1, "view", 5.0)])
    out = flink_sql(spark, """
        SELECT window_start, window_end FROM
        TABLE(TUMBLE(TABLE ev, DESCRIPTOR(ts), INTERVAL '1' HOUR,
                     INTERVAL '-15' MINUTE))""", tables={"ev": df})
    r = out.collect()[0]
    assert str(r["window_start"]) == "2024-01-01 09:45:00"
    assert str(r["window_end"]) == "2024-01-01 10:45:00"


def test_hop_offset_shifts_every_slide(spark):
    """HOP offset shifts the slide grid: 30m windows sliding 15m with
    a 5m offset give starts congruent to 5m (mod 15m); 10:20 falls in
    [10:05,10:35) and [10:20,10:50) — NOT [09:50,10:20), whose
    exclusive end equals the event time."""
    df = frame(spark, [(1, "2024-01-01 10:20:00", 1, "view", 5.0)])
    out = flink_sql(spark, """
        SELECT window_start, window_end FROM
        TABLE(HOP(TABLE ev, DESCRIPTOR(ts), INTERVAL '15' MINUTE,
                  INTERVAL '30' MINUTE, INTERVAL '5' MINUTE))""",
        tables={"ev": df})
    starts = sorted(str(r["window_start"]) for r in out.collect())
    assert starts == ["2024-01-01 10:05:00", "2024-01-01 10:20:00"]


def test_cumulate_offset_shifts_big_window(spark):
    """CUMULATE offset shifts the size-aligned big window and every
    step pane with it: step 15m / size 1h / offset 10m puts a 10:20
    event in big window [10:10, 11:10) with panes ending 10:25,
    10:40, 10:55, 11:10 — the event belongs to all whose end is
    strictly after 10:20."""
    df = frame(spark, [(1, "2024-01-01 10:20:00", 1, "view", 5.0)])
    out = flink_sql(spark, """
        SELECT window_start, window_end FROM
        TABLE(CUMULATE(TABLE ev, DESCRIPTOR(ts), INTERVAL '15' MINUTE,
                       INTERVAL '1' HOUR, INTERVAL '10' MINUTE))""",
        tables={"ev": df})
    rows = sorted((str(r["window_start"]), str(r["window_end"]))
                  for r in out.collect())
    assert rows == [
        ("2024-01-01 10:10:00", "2024-01-01 10:25:00"),
        ("2024-01-01 10:10:00", "2024-01-01 10:40:00"),
        ("2024-01-01 10:10:00", "2024-01-01 10:55:00"),
        ("2024-01-01 10:10:00", "2024-01-01 11:10:00"),
    ]
    # and the row keeps its ORIGINAL event time in the output
    out2 = flink_sql(spark, """
        SELECT ts FROM
        TABLE(CUMULATE(TABLE ev, DESCRIPTOR(ts), INTERVAL '15' MINUTE,
                       INTERVAL '1' HOUR, INTERVAL '10' MINUTE))""",
        tables={"ev": df})
    assert {str(r["ts"]) for r in out2.collect()} == {
        "2024-01-01 10:20:00"
    }


def test_offset_must_be_smaller_than_grid(spark):
    df = frame(spark, [(1, "2024-01-01 10:20:00", 1, "view", 5.0)])
    with pytest.raises(ValueError, match="smaller in magnitude"):
        flink_sql(spark, """
            SELECT * FROM TABLE(TUMBLE(TABLE ev, DESCRIPTOR(ts),
                INTERVAL '1' HOUR, INTERVAL '1' HOUR))""",
            tables={"ev": df})


def test_session_without_partition_warns_single_partition(spark):
    import warnings as _w

    df = frame(spark, [(1, "2024-01-01 10:20:00", 1, "view", 5.0),
                       (1, "2024-01-01 10:21:00", 2, "view", 6.0)])
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        out = flink_sql(spark, """
            SELECT count(*) AS n FROM
            TABLE(SESSION(TABLE ev, DESCRIPTOR(ts),
                          INTERVAL '5' MINUTE))""", tables={"ev": df})
        assert out.collect()[0]["n"] == 2
    assert any("GLOBAL ordered window" in str(w.message) for w in rec)


def test_tumble_offset_agrees_with_duckdb_time_bucket(spark):
    """Statement-level cross-engine seed: TUMBLE-with-offset grouped
    counts == DuckDB time_bucket(size, ts, offset) on the same rows."""
    import duckdb

    rows = [(1, f"2024-01-01 {h:02d}:{m:02d}:00", i, "view", float(i))
            for i, (h, m) in enumerate(
                [(9, 5), (9, 20), (10, 14), (10, 16), (11, 0), (11, 59)])]
    df = frame(spark, rows)
    got = {
        (str(r["window_start"]), r["n"])
        for r in flink_sql(spark, """
            SELECT window_start, count(*) AS n FROM
            TABLE(TUMBLE(TABLE ev, DESCRIPTOR(ts), INTERVAL '1' HOUR,
                         INTERVAL '15' MINUTE))
            GROUP BY window_start""", tables={"ev": df}).collect()
    }
    con = duckdb.connect()
    exp = {
        (str(b), n)
        for b, n in con.execute(
            "SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP),"
            " INTERVAL '15 minutes') AS b, count(*) FROM (VALUES "
            + ", ".join(f"('{t}')" for _, t, _, _, _ in rows)
            + ") AS v(ts) GROUP BY b"
        ).fetchall()
    }
    assert got == exp


def test_negative_interval_only_valid_as_offset(spark):
    """A negative SIZE/gap must raise loudly (a negative SESSION gap
    would silently make every row its own session with window_end <
    window_start); negative OFFSETS stay accepted."""
    df = frame(spark, [(1, "2024-01-01 10:20:00", 1, "view", 5.0)])
    with pytest.raises(ValueError, match="negative interval"):
        flink_sql(spark, """
            SELECT * FROM TABLE(SESSION(TABLE ev, DESCRIPTOR(ts),
                INTERVAL '-5' MINUTE))""", tables={"ev": df})
    with pytest.raises(ValueError, match="negative interval"):
        flink_sql(spark, """
            SELECT * FROM TABLE(CUMULATE(TABLE ev, DESCRIPTOR(ts),
                INTERVAL '-15' MINUTE, INTERVAL '1' HOUR))""",
            tables={"ev": df})


def test_fractional_offset_rejected_on_all_tvfs(spark):
    """Sub-second offsets raise on CUMULATE too (int() used to
    silently truncate them) — same contract as TUMBLE/HOP."""
    df = frame(spark, [(1, "2024-01-01 10:20:00", 1, "view", 5.0)])
    with pytest.raises(ValueError, match="sub-second window offsets"):
        flink_sql(spark, """
            SELECT * FROM TABLE(CUMULATE(TABLE ev, DESCRIPTOR(ts),
                INTERVAL '15' MINUTE, INTERVAL '1' HOUR,
                INTERVAL '0.5' SECOND))""", tables={"ev": df})


def test_for_system_time_as_of_stream_dim(spark, tmp_path):
    """FOR SYSTEM_TIME AS OF against a STREAMING dim relation routes
    to the changelog temporal join (versioned keyed state), not the
    static containment rewrite — the dim's watermarked column is its
    version time; a late dim update corrects the pick before the
    watermark releases the fact. LEFT JOIN keeps version-less facts."""
    from flink_framework_spark.streaming.twins import run_to_memory

    def dimf(rows):
        return spark.createDataFrame(
            [(u, f"2024-01-01 {h:02d}:{m:02d}:00", t) for u, h, m, t in rows],
            "user_id long, dim_ts string, tier long",
        ).selectExpr(
            "user_id", "CAST(dim_ts AS timestamp) AS dim_ts", "tier"
        )

    def factf(rows):
        return spark.createDataFrame(
            [(u, f"2024-01-01 {h:02d}:{m:02d}:00", e) for u, h, m, e in rows],
            "user_id long, ts string, event_id long",
        ).selectExpr("user_id", "CAST(ts AS timestamp) AS ts", "event_id")

    d_lake, f_lake = tmp_path / "dim", tmp_path / "facts"
    dimf([(1, 9, 0, 1)]).coalesce(1).write.mode("append").parquet(str(d_lake))
    factf([(1, 10, 5, 100), (2, 9, 30, 200)]).coalesce(1).write.mode(
        "append"
    ).parquet(str(f_lake))
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

    def tables():
        d = (
            spark.readStream.schema(dimf([]).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d_lake))
            .withWatermark("dim_ts", "10 minutes")
        )
        f = (
            spark.readStream.schema(factf([]).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(f_lake))
            .withWatermark("ts", "10 minutes")
        )
        return {"fact_s": f, "dim_s": d}

    got = run_to_memory(
        flink_sql(spark, """
            SELECT f.event_id, f.tier
            FROM fact_s f
            JOIN dim_s FOR SYSTEM_TIME AS OF f.ts AS d
              ON f.user_id = d.user_id
        """, tables=tables()),
        query_name="t_sql_stream_tj",
        output_mode="update",
    ).toPandas()
    # key 9's own drain rows are trigger-timing-dependent (file
    # mtime ties can merge batches and advance the watermark past
    # them) — the pinned semantics are keys 1 and 2
    by = {int(r.event_id): r.tier
          for r in got.itertuples(index=False) if r.event_id < 900}
    assert by == {100: 2, 300: 2}

    left = run_to_memory(
        flink_sql(spark, """
            SELECT event_id, tier
            FROM fact_s f
            LEFT JOIN dim_s FOR SYSTEM_TIME AS OF f.ts AS d
              ON f.user_id = d.user_id
        """, tables=tables()),
        query_name="t_sql_stream_tj_left",
        output_mode="update",
    ).toPandas()
    import pandas as pd

    lby = {int(r.event_id): r.tier
           for r in left.itertuples(index=False) if r.event_id < 900}
    assert lby[100] == 2 and lby[300] == 2 and pd.isna(lby[200])
    assert set(lby) == {100, 200, 300}


def test_for_system_time_stream_dim_contract_errors(spark, tmp_path):
    """Loud-contract checks on the streaming temporal-join lowering:
    unwatermarked dim, batch probe, and non-equality ON all raise
    framework errors (not opaque Spark ones)."""

    def mk(schema_sql, path):
        df = spark.createDataFrame([], schema_sql)
        df.write.mode("overwrite").parquet(str(path))
        return (
            spark.readStream.schema(df.schema).parquet(str(path)),
            spark.read.parquet(str(path)),
        )

    f_s, f_b = mk("user_id long, ts timestamp, event_id long",
                  tmp_path / "f")
    d_s, d_b = mk("user_id long, dim_ts timestamp, tier long",
                  tmp_path / "d")
    q = """SELECT * FROM fact_s f JOIN dim_s
           FOR SYSTEM_TIME AS OF f.ts AS d ON f.user_id = d.user_id"""
    with pytest.raises(ValueError, match="watermarked"):
        flink_sql(spark, q, tables={
            "fact_s": f_s.withWatermark("ts", "1 minute"), "dim_s": d_s,
        })
    with pytest.raises(ValueError, match="streaming probe"):
        flink_sql(spark, q, tables={
            "fact_s": f_b,
            "dim_s": d_s.withWatermark("dim_ts", "1 minute"),
        })
    with pytest.raises(ValueError, match="conjunction"):
        flink_sql(
            spark,
            """SELECT * FROM fact_s f JOIN dim_s
               FOR SYSTEM_TIME AS OF f.ts AS d ON f.user_id < d.user_id""",
            tables={
                "fact_s": f_s.withWatermark("ts", "1 minute"),
                "dim_s": d_s.withWatermark("dim_ts", "1 minute"),
            },
        )
