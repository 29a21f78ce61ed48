"""Skew stress measurement: a pathological hot-key join measured three
ways — AQE skew-split (the first line of defense), no mitigation (the
failure mode), and operators.skew.salted_join (the explicit fallback
for when AQE's split can't engage, e.g. pre-shuffle skew into an
aggregation or a build side AQE won't split).

Tile: a 30x-scale fact (20M rows) with 30% of ALL rows on ONE user_id
(the classic null-key / celebrity-entity shape) joined to a 2M-row
dim. The dim is sized above the broadcast threshold on purpose — a
broadcastable dim would make skew irrelevant (no fact shuffle), which
is the real first-line fix but not what this measures; broadcast is
additionally disabled so the plan is a genuine shuffle join in all
three runs.

Usage: python tools/skew_bench.py  (writes the tile to
/tmp/scaledata/skew30 on first run, ~1 min; prints one JSON line).
Results are recorded in SCALING.md's Skew section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_framework_spark.session import get_spark  # noqa: E402

TILE = "/tmp/scaledata/skew30"
N_FACT = 20_000_000
N_DIM = 2_000_000
HOT_FRAC = 0.30
HOT_KEY = 0


def make_tile(spark) -> None:
    from pyspark.sql import functions as F

    fact = (
        spark.range(N_FACT)
        .select(
            F.when(F.rand(1) < HOT_FRAC, F.lit(HOT_KEY))
            .otherwise((F.rand(2) * N_DIM).cast("long"))
            .alias("user_id"),
            (F.rand(3) * 100).alias("value"),
            F.col("id").alias("event_id"),
        )
    )
    fact.write.mode("overwrite").parquet(f"{TILE}/fact.parquet")
    dim = spark.range(N_DIM).select(
        F.col("id").alias("user_id"),
        F.md5(F.col("id").cast("string")).alias("segment"),
        (F.rand(4) * 10).alias("weight"),
    )
    dim.write.mode("overwrite").parquet(f"{TILE}/dim.parquet")


def main() -> None:
    from pyspark.sql import functions as F

    from flink_framework_spark.operators.skew import (
        salted_join,
        salted_join_targeted,
    )

    spark = get_spark(app_name="skew-bench")
    if not os.path.isdir(TILE):
        make_tile(spark)
    fact = spark.read.parquet(f"{TILE}/fact.parquet")
    dim = spark.read.parquet(f"{TILE}/dim.parquet")

    def run_lazy(build) -> float:
        t0 = time.perf_counter()
        joined = build()
        joined.groupBy("segment").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
        ).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    def run(joined) -> float:
        t0 = time.perf_counter()
        # aggregate AFTER the join so the join output fully
        # materializes but the sink isn't the bottleneck
        joined.groupBy("segment").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
        ).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    conf = spark.conf
    out: dict[str, float] = {}
    try:
        # force a genuine shuffle join in every scenario
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        out["no_mitigation"] = run(fact.join(dim, "user_id"))
        out["salted_full_aqe_off"] = run(
            salted_join(fact, dim, ["user_id"], salt=32)
        )
        # salted_join_targeted's hot-key DETECTION runs an eager
        # sampled scan at DataFrame-construction time — build the
        # frame inside the timed closure so the recorded number is the
        # true end-to-end cost, detection included
        out["salted_targeted_aqe_off"] = run_lazy(
            lambda: salted_join_targeted(fact, dim, ["user_id"], salt=32)
        )

        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        out["aqe_skew_split"] = run(fact.join(dim, "user_id"))
        out["salted_targeted_aqe_on"] = run_lazy(
            lambda: salted_join_targeted(fact, dim, ["user_id"], salt=32)
        )

        # uniform-key control: the same volume without the hot key,
        # so the skew penalty is separable from base join cost
        uni = fact.select(
            (F.rand(5) * N_DIM).cast("long").alias("user_id"),
            "value",
            "event_id",
        )
        out["uniform_control"] = run(uni.join(dim, "user_id"))
    finally:
        conf.unset("spark.sql.autoBroadcastJoinThreshold")
        conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        conf.unset("spark.sql.adaptive.skewJoin.enabled")

    print(json.dumps({"skew_bench": out, "n_fact": N_FACT, "n_dim": N_DIM,
                      "hot_frac": HOT_FRAC}))
    spark.stop()


if __name__ == "__main__":
    main()
