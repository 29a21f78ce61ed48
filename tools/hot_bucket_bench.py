"""Hot-bucket guard scale measurement (r11, VERDICT r10 #4).

Tile: a corpus whose degenerate block — m byte-identical documents —
lands every band of its MinHash signature in ONE (band, bucket),
embedded in m distinct background docs. The unguarded band join is
quadratic in m (m(m-1)/2 candidate pairs from one bucket); the
guarded path (bucket_cap=1024 default) bounds it at ~m*cap/2
within-group pairs + bridges.

Measured: wall time + emitted pair count for the guarded path at
m = 10k / 30k / 100k (alphas between tiles), and the unguarded path
at m = 3k / 10k only (its 10->30k step would already emit 4.5e8
pairs). Results go to SCALING.md's "Hot-bucket guard" rows.

Usage: python tools/hot_bucket_bench.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_framework_spark.session import get_spark  # noqa: E402


def corpus(spark, m: int):
    from pyspark.sql import functions as F

    ident = spark.range(m).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "the quick brown fox jumps over the lazy dog again and again"
        ).alias("text"),
    )
    distinct = spark.range(m).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat(
            F.lit("unique content block "),
            F.col("id").cast("string"),
            F.lit(" with trailing words "),
            (F.col("id") * 7919).cast("string"),
            F.lit(" and "),
            (F.col("id") * 104729).cast("string"),
        ).alias("text"),
    )
    return ident.unionByName(distinct)


def run(spark, m: int, cap):
    from flink_framework_spark.operators.dedup import minhash_candidates

    t0 = time.time()
    n_pairs = minhash_candidates(corpus(spark, m), bucket_cap=cap).count()
    return round(time.time() - t0, 2), n_pairs


def main() -> None:
    spark = get_spark()
    out = {"guarded": {}, "unguarded": {}}
    for m in (10_000, 30_000, 100_000):
        sec, n = run(spark, m, 1024)
        out["guarded"][str(m)] = {"sec": sec, "pairs": n}
    for m in (3_000, 10_000):
        sec, n = run(spark, m, None)
        out["unguarded"][str(m)] = {"sec": sec, "pairs": n}

    import math

    g = out["guarded"]
    out["alpha_guarded_10k_30k"] = round(
        math.log(g["30000"]["sec"] / g["10000"]["sec"]) / math.log(3), 2
    )
    out["alpha_guarded_30k_100k"] = round(
        math.log(g["100000"]["sec"] / g["30000"]["sec"]) / math.log(100 / 30),
        2,
    )
    u = out["unguarded"]
    out["alpha_unguarded_3k_10k"] = round(
        math.log(u["10000"]["sec"] / u["3000"]["sec"]) / math.log(10 / 3), 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
