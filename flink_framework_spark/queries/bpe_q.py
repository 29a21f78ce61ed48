"""BPE tokenizer query: learned merge table + per-doc tokenization.

One driver-visible slot carries both artifacts, melted to a common
``(tag, id, tok, n)`` shape:

- ``merge`` rows: merge rank, the merged token, its pair count at
  merge time — the vocabulary itself;
- ``doc`` rows: doc_id, an md5 fingerprint of the full token stream
  (so the golden pins the exact tokenization, not just counts), and
  the post-BPE token count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.bpe import bpe_tokenize, bpe_train
from flink_framework_spark.queries._oracle_trained import (
    bpe_vocab_select_sql,
    per_sf,
)
from flink_framework_spark.registry import register


@register(
    "q_bpe_vocab",
    family="K",
    oracle_by_sf=per_sf(lambda sf: bpe_vocab_select_sql(sf=sf)),
)
def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary training + corpus tokenization
    (operators.bpe): 60 merges learned from a bounded id-ordered
    sample, then one Arrow-batched tokenization pass over every
    document. Deterministic (tie-broken merge selection, greedy
    lowest-rank encoding). Oracle is LIVE since r11: DuckDB re-runs
    the greedy encoder from the frozen merge-table literals and
    recomputes every fingerprint (no frozen-result golden remains);
    algorithmic properties in tests/test_bpe.py."""
    docs = table(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", "doc_id", n_merges=60)
    # The merge table is a bounded driver artifact (n_merges rows).
    # Emit it as an exploded struct-array LITERAL over range(1) — the
    # same local-relation construction the centroid/codebook operators
    # use — so the plan stays pure SQL (Range + Generate), with no
    # Scan ExistingRDD (tests/test_plans.py::test_no_rdd_fallback_anywhere).
    if merges:
        mrows = F.array(
            *[
                F.struct(
                    F.lit("merge").alias("tag"),
                    F.lit(i).cast("long").alias("id"),
                    F.lit(a + b).alias("tok"),
                    F.lit(int(cnt)).cast("long").alias("n"),
                )
                for i, (a, b, cnt) in enumerate(merges)
            ]
        )
        mdf = (
            spark.range(1)
            .select(F.explode(mrows).alias("r"))
            .select("r.tag", "r.id", "r.tok", "r.n")
        )
    else:
        # zero learned merges (no pair occurs twice): F.array() would
        # type as array<void> and the struct-field selects would fail
        # — emit an empty, correctly-typed frame instead
        mdf = spark.range(0).select(
            F.lit("merge").alias("tag"),
            F.col("id"),
            F.lit("").alias("tok"),
            F.lit(0).cast("long").alias("n"),
        )
    toks = docs.select(
        "doc_id", bpe_tokenize(F.col("text"), merges).alias("toks")
    )
    ddf = toks.select(
        F.lit("doc").alias("tag"),
        F.col("doc_id").alias("id"),
        F.md5(F.array_join("toks", " ")).alias("tok"),
        F.size("toks").cast("long").alias("n"),
    )
    return mdf.unionByName(ddf)
