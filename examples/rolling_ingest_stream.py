"""Streaming rolling-ingest demo: a document stream deduplicated into
an append-only corpus lake, exactly-once.

    micro-batch of crawled docs
      -> incremental near-dedup vs the ACCUMULATED surviving corpus
         (new-vs-corpus blocking join, never corpus x corpus)
      -> append survivors to the lake as a batch=<id> partition
         (overwrite-by-batch => replays rewrite, never duplicate)

This is `flink_framework_spark.streaming.rolling_dedup` driven by a
file-source stream (one file per trigger), the local stand-in for a
Kafka topic of crawl batches. The same processor accepts any
new-vs-corpus dedup function (`dedup_fn=`) — e.g. semantic dedup over
embeddings — see tests/test_rolling_dedup.py.

Run:  python examples/rolling_ingest_stream.py [sf_dir]
Prints per-batch survivor counts and the final dedup summary.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_framework_spark.io import table  # noqa: E402
from flink_framework_spark.session import get_spark  # noqa: E402
from flink_framework_spark.streaming.rolling_dedup import (  # noqa: E402
    RollingDedupProcessor,
)

N_BATCHES = 4


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="rolling-ingest-demo")
    work = tempfile.mkdtemp(prefix="rolling_ingest_")
    spool, corpus, ckpt = (
        os.path.join(work, d) for d in ("spool", "corpus", "ckpt")
    )
    os.makedirs(spool)

    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    chunk = (len(docs) + N_BATCHES - 1) // N_BATCHES
    for i in range(N_BATCHES):
        p = os.path.join(spool, f"part-{i:05d}.parquet")
        docs.iloc[i * chunk : (i + 1) * chunk].to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(spool)
    )
    proc = RollingDedupProcessor(corpus, threshold=0.5)
    q = proc.attach(stream, ckpt).trigger(availableNow=True).start()
    if not q.awaitTermination(600):
        q.stop()
        raise SystemExit("ingest stream did not finish within 600s")

    lake = spark.read.parquet(corpus)
    per = {
        r.batch: r.n
        for r in lake.groupBy("batch").agg(F.count("*").alias("n")).collect()
    }
    total_in, total_out = len(docs), lake.count()
    print(f"\ningested {total_in} docs in {N_BATCHES} micro-batches:")
    for b in sorted(per):
        arrived = len(docs.iloc[b * chunk : (b + 1) * chunk])
        print(
            f"  batch {b}: {arrived:4d} arrived, {per[b]:4d} survived "
            f"({arrived - per[b]} near-dups of earlier batches dropped)"
        )
    print(
        f"corpus lake: {total_out} docs "
        f"({total_in - total_out} dropped, "
        f"{100 * (total_in - total_out) / total_in:.1f}% cross-batch dup rate)"
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
