"""Benchmark harness: times every registered query at the bench scale
factor and prints ONE JSON line the driver records as BENCH_r{N}.json.

Each query is materialized with the noop sink (full computation, no
driver-side collect cost). A warmup pass on the flagship query absorbs
JVM/codegen startup. Env knobs:

- SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
- SPARK_GRAFT_CPUS     local[N] cores (default *)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_framework_spark.registry import all_queries  # noqa: E402
from flink_framework_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark(app_name="flink-framework-spark-bench")
    queries = {n: q for n, q in sorted(all_queries().items()) if q.bench}

    # Warmup: JVM/codegen via the flagship join, plus the Python/Arrow
    # worker pool (first pandas-UDF stage in a session pays a one-time
    # worker fork + import cost ~3s that would otherwise be billed to
    # whichever UDF query happens to run first).
    materialize(queries["q_join_multi"].fn(spark, sf_dir))
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    materialize(spark.range(10_000).select(_warm("id")))

    timings: dict[str, float] = {}
    for name, q in queries.items():
        t0 = time.perf_counter()
        materialize(q.fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_seconds_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(timings),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
