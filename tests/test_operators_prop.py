"""Randomized properties for the hand-built operators (hypothesis):
the as-of join against a naive per-row reference, and the salted join
against the plain join, over adversarial small inputs (duplicate
timestamps, empty sides, hot keys)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_framework_spark.operators.asof import asof_join
from flink_framework_spark.operators.skew import salted_join

_spark = None


def _get_spark():
    # hypothesis can't take pytest fixtures in @given functions;
    # reuse the session-scoped instance lazily.
    global _spark
    if _spark is None:
        from pyspark.sql import SparkSession

        _spark = SparkSession.getActiveSession()
    return _spark


row = st.tuples(
    st.integers(0, 2),  # key
    st.integers(0, 20),  # time
    st.integers(0, 999),  # id
)


def _naive_asof(left, right):
    out = []
    for (lk, lt, lid) in left:
        cands = [(rt, rid) for (rk, rt, rid) in right if rk == lk and rt <= lt]
        if cands:
            rt, rid = max(cands)
            out.append((lk, lt, lid, rid))
    return sorted(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(row, min_size=0, max_size=12, unique_by=lambda r: r[2]),
    right=st.lists(row, min_size=0, max_size=12, unique_by=lambda r: r[2]),
)
def test_asof_join_matches_naive(spark_session_holder, left, right):
    spark = _get_spark()
    ldf = spark.createDataFrame(
        left or [(None, None, None)], "k int, t int, lid int"
    ).filter("k is not null")
    rdf = spark.createDataFrame(
        right or [(None, None, None)], "k int, t int, rid int"
    ).filter("k is not null")
    got = sorted(
        (r["k"], r["t"], r["lid"], r["rid"])
        for r in asof_join(
            ldf, rdf, on=["k"], left_time="t", right_time="t",
            right_tiebreak="rid", how="inner",
        ).collect()
    )
    assert got == _naive_asof(left, right)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 99)), max_size=20),
    right=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 99)), max_size=8),
)
def test_salted_join_matches_plain(spark_session_holder, left, right):
    spark = _get_spark()
    ldf = spark.createDataFrame(left or [(None, None)], "k int, lv int").filter(
        "k is not null"
    )
    rdf = spark.createDataFrame(right or [(None, None)], "k int, rv int").filter(
        "k is not null"
    )
    plain = sorted(map(tuple, ldf.join(rdf, "k").collect()))
    salted = sorted(map(tuple, salted_join(ldf, rdf, ["k"], salt=4).collect()))
    assert salted == plain


def test_connected_components_known_graph(spark_session_holder):
    """3 known components (a chain, a triangle + pendant, a pair)."""
    from flink_framework_spark.operators.iterative import connected_components

    spark = _get_spark()
    edges = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),          # chain  -> comp 1
            (10, 11), (11, 12), (12, 10), (12, 13),  # triangle+pendant -> 10
            (20, 21),                          # pair -> 20
        ],
        "src long, dst long",
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }


def test_connected_components_random_unions(spark_session_holder):
    """Random graphs vs a union-find reference."""
    import random

    from flink_framework_spark.operators.iterative import connected_components

    spark = _get_spark()
    rng = random.Random(5)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(45)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(40))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    nodes = {n for e in edges for n in e}
    want = {}
    for n in nodes:
        root = find(n)
        rep = min(m for m in nodes if find(m) == root)
        want[n] = rep

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == want


def test_async_enrich_matches_sync(spark_session_holder, sf_dir):
    """async_enrich with a deterministic fake service == the plain
    column expression it simulates; concurrency cap respected."""
    import asyncio

    from pyspark.sql import functions as F

    from flink_framework_spark.io import table
    from flink_framework_spark.operators.async_io import async_enrich

    spark = _get_spark()
    peak = {"now": 0, "max": 0}

    async def fake_service(user_id):
        peak["now"] += 1
        peak["max"] = max(peak["max"], peak["now"])
        await asyncio.sleep(0)
        peak["now"] -= 1
        return f"user-{user_id % 7}"

    ev = table(spark, sf_dir, "events").select("event_id", "user_id").limit(500)
    got = async_enrich(
        ev, fake_service, "user_id", "segment", max_concurrency=8
    )
    expected = ev.withColumn(
        "segment", F.concat(F.lit("user-"), (F.col("user_id") % 7).cast("string"))
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, expected.collect()))
    assert a == b


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 99)), max_size=24),
    right=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 99)), max_size=8),
    how=st.sampled_from(["inner", "left"]),
)
def test_salted_join_targeted_matches_plain(
    spark_session_holder, left, right, how
):
    from flink_framework_spark.operators.skew import salted_join_targeted

    spark = _get_spark()
    ldf = spark.createDataFrame(left or [(None, None)], "k int, lv int").filter(
        "k is not null"
    )
    rdf = spark.createDataFrame(right or [(None, None)], "k int, rv int").filter(
        "k is not null"
    )
    plain = sorted(map(repr, ldf.join(rdf, "k", how).collect()))
    # explicit hot keys: sampling at this size is degenerate
    targeted = sorted(
        map(
            repr,
            salted_join_targeted(
                ldf, rdf, ["k"], how, salt=4, hot_keys=[0, 1]
            ).collect(),
        )
    )
    assert targeted == plain


def test_salted_join_targeted_detects_hot_keys(spark_session_holder):
    """Sampled detection finds the planted hot key, and the split
    result equals the plain join on a skewed frame."""
    from pyspark.sql import functions as SF

    from flink_framework_spark.operators.skew import salted_join_targeted

    spark = _get_spark()
    left = spark.range(200_000).select(
        SF.when(SF.col("id") % 2 == 0, SF.lit(7))
        .otherwise(SF.col("id") % 1000)
        .alias("k"),
        SF.col("id").alias("lv"),
    )
    right = spark.range(1000).select(
        SF.col("id").alias("k"), (SF.col("id") * 10).alias("rv")
    )
    plain = left.join(right, "k").agg(
        SF.count(SF.lit(1)).alias("n"), SF.sum("rv").alias("s")
    ).collect()[0]
    got = salted_join_targeted(
        left, right, ["k"], sample_frac=0.01, hot_share=0.05
    ).agg(SF.count(SF.lit(1)).alias("n"), SF.sum("rv").alias("s")).collect()[0]
    assert (got["n"], got["s"]) == (plain["n"], plain["s"])


def test_salted_join_targeted_rejects_unsafe_how(spark_session_holder):
    import pytest
    from pyspark.sql import functions as SF

    from flink_framework_spark.operators.skew import salted_join_targeted

    spark = _get_spark()
    df = spark.range(4).select(SF.col("id").alias("k"))
    with pytest.raises(ValueError, match="split safely"):
        salted_join_targeted(df, df, ["k"], how="full")


def test_salted_join_targeted_null_keys(spark_session_holder):
    """Null keys route around the join: inner drops them (as a plain
    join would), left passes them through with null build columns —
    and hot_keys=[None] is rejected loudly instead of silently
    no-opping (isin three-valued logic)."""
    import pytest
    from pyspark.sql import functions as SF

    from flink_framework_spark.operators.skew import salted_join_targeted

    spark = _get_spark()
    left = spark.createDataFrame(
        [(None, 1), (None, 2), (0, 3), (1, 4), (2, 5)], "k int, lv int"
    )
    right = spark.createDataFrame([(0, 10), (1, 11)], "k int, rv int")
    for how in ("inner", "left"):
        plain = sorted(map(repr, left.join(right, "k", how).collect()))
        got = sorted(
            map(
                repr,
                salted_join_targeted(
                    left, right, ["k"], how, salt=4, hot_keys=[0]
                ).collect(),
            )
        )
        assert got == plain, how
    with pytest.raises(ValueError, match="None"):
        salted_join_targeted(left, right, ["k"], hot_keys=[None, 0])
