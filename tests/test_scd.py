"""SCD2 build + temporal join: plan shape and semantic properties."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_framework_spark.operators.scd import scd2_build, temporal_join
from flink_framework_spark.plans.inspect import count_exchanges
from flink_framework_spark.queries.scd_q import tier_versions


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _changelog(spark):
    rows = [
        # key 1: restated 'a' must compress; same-ts seq tiebreak at 12:00
        (1, _ts(9), 1, "a"),
        (1, _ts(10), 2, "a"),
        (1, _ts(11), 3, "b"),
        (1, _ts(12), 4, "x"),
        (1, _ts(12), 5, "c"),
        # key 2: single version
        (2, _ts(9, 30), 6, "z"),
    ]
    return spark.createDataFrame(rows, "k int, ts timestamp, seq int, attr string")


def test_scd2_versions_semantics(spark):
    v = scd2_build(
        _changelog(spark), ["k"], "ts", ["attr"], seq_col="seq"
    ).collect()
    byk = {}
    for r in v:
        byk.setdefault(r.k, []).append(r)
    k1 = sorted(byk[1], key=lambda r: r.version)
    # 'a' restatement compressed; same-ts 12:00 keeps only seq=5 ('c')
    assert [(r.attr, r.version, r.is_current) for r in k1] == [
        ("a", 1, False),
        ("b", 2, False),
        ("c", 3, True),
    ]
    # intervals tile: valid_to == next valid_from, last is open
    assert k1[0].valid_to == k1[1].valid_from
    assert k1[1].valid_to == k1[2].valid_from
    assert k1[2].valid_to is None
    assert [(r.attr, r.version, r.is_current) for r in byk[2]] == [("z", 1, True)]


def test_temporal_join_point_in_time(spark):
    dim = scd2_build(_changelog(spark), ["k"], "ts", ["attr"], seq_col="seq")
    facts = spark.createDataFrame(
        [
            (1, _ts(8)),   # before first version -> dropped (inner)
            (1, _ts(9)),   # boundary: version opens AT fact ts -> included
            (1, _ts(10, 30)),  # inside version 1 (restated 'a' span)
            (1, _ts(11)),  # boundary of version 2
            (1, _ts(23)),  # current version
            (2, _ts(12)),
        ],
        "k int, t timestamp",
    )
    out = {
        (r.k, r.t): (r.attr, r.version)
        for r in temporal_join(facts, dim, on=["k"], fact_ts="t").collect()
    }
    assert (1, _ts(8)) not in out
    assert out[(1, _ts(9))] == ("a", 1)
    assert out[(1, _ts(10, 30))] == ("a", 1)
    assert out[(1, _ts(11))] == ("b", 2)
    assert out[(1, _ts(23))] == ("c", 3)
    assert out[(2, _ts(12))] == ("z", 1)
    # left join keeps the pre-history fact with null attributes
    left = temporal_join(facts, dim, on=["k"], fact_ts="t", how="left")
    pre = [r for r in left.collect() if r.k == 1 and r.t == _ts(8)]
    assert len(pre) == 1 and pre[0].attr is None


def test_scd2_build_is_single_shuffle(spark, sf_dir):
    """All three window passes (same-ts dedup, change compression,
    version close) share one keys-only partitioning — the build must
    plan exactly ONE exchange."""
    assert count_exchanges(tier_versions(spark, sf_dir)) == 1


def test_temporal_join_single_merge_shuffle(spark, sf_dir):
    """Dimension build + as-of probe: the probe side adds its one
    union-merge shuffle on top of the build's — no interval-join pair
    blow-up anywhere (and no cartesian/BNLJ nodes)."""
    from flink_framework_spark.plans.inspect import formatted_plan
    from flink_framework_spark.io import table

    dim = tier_versions(spark, sf_dir)
    clicks = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts")
    )
    plan = formatted_plan(temporal_join(clicks, dim, on=["user_id"], fact_ts="ts"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
