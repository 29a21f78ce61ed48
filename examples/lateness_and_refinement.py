"""Late-data semantics demo: Flink's two watermark knobs, Spark-first.

Flink separates "how out-of-order is my stream" (the watermark delay)
from "how long do I keep fixing already-fired windows"
(``allowedLateness``). Spark has one knob, so this repo recovers the
second with an explicit refinement operator — and this demo shows the
full firing story on the events table:

1. the late side-output split (which rows ARE late, per the arrival
   watermark);
2. ``fire_allowed_lateness``: each window's 'on_time' firing followed
   by one corrected 'late' firing per admitted late element, with
   rows past the horizon dropped;
3. the streaming twin replaying the same refinement across
   micro-batches (update mode, shifted-watermark state machine);
4. the changelog temporal join's declared-cadence fast path — the
   round-9 routing move: keyed-state semantics when you declare
   nothing, one JVM stream-stream interval join when you declare the
   dim's update cadence (``version_interval`` + ``unique_versions``).

Run:  python examples/lateness_and_refinement.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from flink_framework_spark.io import table  # noqa: E402
from flink_framework_spark.operators.triggers import (  # noqa: E402
    fire_allowed_lateness,
)
from flink_framework_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="lateness-demo")
    ev = table(spark, sf_dir, "events").withColumn(
        "arrival",
        F.col("ts")
        + F.expr("make_dt_interval(0, 0, CAST(3*(event_id % 10) AS INT), 0)"),
    )

    # 1. classify rows against the arrival watermark (delay 5 min)
    aw = Window.orderBy("arrival", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wm = F.max("ts").over(aw) - F.expr("INTERVAL 5 MINUTES")
    w_end = F.window("ts", "1 hour").end
    cls = ev.withColumn(
        "cls",
        F.when(wm.isNull() | (wm < w_end), "on_time")
        .when(wm < w_end + F.expr("INTERVAL 10 MINUTES"), "late")
        .otherwise("dropped"),
    )
    print("row classes under watermark 5m / lateness 10m:")
    cls.groupBy("cls").count().orderBy("cls").show()

    # 2. the refinement firing sequence
    out = fire_allowed_lateness(
        ev, window="1 hour", delay="5 minutes", lateness="10 minutes"
    )
    print("firings by kind:")
    out.groupBy("firing").count().show()
    print("a refined window (on_time firing then corrections):")
    refined = (
        out.groupBy("event_type", "w_start")
        .count()
        .filter(F.col("count") > 2)
        .limit(1)
        .collect()
    )
    if refined:
        k, w = refined[0]["event_type"], refined[0]["w_start"]
        out.filter(
            (F.col("event_type") == k) & (F.col("w_start") == w)
        ).orderBy("fire_seq").show(truncate=False)

    print(
        "streaming twin: streaming.triggers.allowed_lateness_stream "
        "(drain-equality pinned in tests/test_streaming_triggers.py);\n"
        "temporal fast path: streaming.temporal."
        "temporal_join_changelog_stream(version_interval=..., "
        "unique_versions=True)\n -> ONE stream-stream interval join, "
        "205k rows/s vs the 41k keyed-state floor (bench.py)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
