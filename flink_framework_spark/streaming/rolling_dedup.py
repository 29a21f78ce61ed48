"""Streaming rolling-ingest near-dedup: the crawl-ingest pipeline as
an actual stream.

The batch operator ``dedup.incremental_dedup_ngram`` already has the
right per-round shape (new-batch-vs-corpus blocking join, never
corpus x corpus); this module runs it under Structured Streaming's
``foreachBatch``, turning a document stream into an append-only
deduplicated corpus lake:

- each micro-batch is deduplicated against the ACCUMULATED surviving
  corpus (keep-earliest, append-stable — the same contract the
  batch-fold test ``test_rolling_ingest_incremental_dedup_invariant``
  pins), then appended;
- the sink is IDEMPOTENT by micro-batch id: survivors land in a
  ``batch=<id>`` partition directory written with overwrite, so a
  retried batch (checkpoint recovery replays the last uncommitted
  micro-batch) rewrites its own partition instead of duplicating it —
  checkpoint + idempotent sink is exactly Structured Streaming's
  recipe for end-to-end exactly-once on file sinks;
- corpus reads use partition discovery over the same directory, so
  the accumulated state IS the lake table a downstream trainer reads
  — no second bookkeeping store. At warehouse scale the corpus side
  of the blocking join grows, but the per-round cost stays
  |new| x bucket-occupancy because candidate generation is an
  equi-join on the blocking key with the NEW side always the small
  probe (see incremental_dedup_ngram).

Equivalence to the batch fold is proven in tests/test_rolling_dedup.py:
streaming the corpus in N files through this processor yields exactly
the batch-sequential loop's surviving doc set.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class RollingDedupProcessor:
    """``foreachBatch`` handler accumulating a deduplicated corpus.

    Parameters
    ----------
    corpus_path : directory of the surviving-corpus lake
        (``batch=<id>`` partition per micro-batch).
    threshold : exact-Jaccard drop threshold (>= threshold = near-dup
        of an earlier survivor -> dropped) for the default text dedup.
    id_col / text_col : document schema in the stream (default mode).
    dedup_fn : optional ``f(new_df, corpus_df) -> surviving new rows``
        replacing the default ``incremental_dedup_ngram`` — any
        incremental dedup with the same new-vs-corpus contract plugs
        in (e.g. ``semantic_dedup_incremental`` over embeddings; see
        tests/test_rolling_dedup.py). With ``dedup_fn``, ``cols``
        names the payload columns to persist per survivor.
    """

    def __init__(
        self,
        corpus_path: str,
        threshold: float = 0.5,
        id_col: str = "doc_id",
        text_col: str = "text",
        dedup_fn=None,
        cols: list[str] | None = None,
    ):
        self.corpus_path = corpus_path
        self.threshold = threshold
        self.id_col = id_col
        self.text_col = text_col
        self.dedup_fn = dedup_fn
        self.cols = cols or [id_col, text_col]

    def _corpus(self, spark, exclude_batch: int) -> DataFrame | None:
        """Accumulated survivors EXCLUDING ``exclude_batch``'s own
        partition: a replayed micro-batch (checkpoint recovery) must
        not dedup against its previous, about-to-be-rewritten output."""
        if not os.path.isdir(self.corpus_path):
            return None
        try:
            df = spark.read.parquet(self.corpus_path)
        except Exception:
            return None
        return df.filter(F.col("batch") != exclude_batch).drop("batch")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from flink_framework_spark.operators.dedup import (
            incremental_dedup_ngram,
        )

        spark = batch_df.sparkSession
        new = batch_df.select(*self.cols)
        corpus = self._corpus(spark, int(batch_id))
        if corpus is not None and corpus.limit(1).count() > 0:
            if self.dedup_fn is not None:
                survivors = self.dedup_fn(new, corpus)
            else:
                survivors = incremental_dedup_ngram(
                    new,
                    corpus,
                    threshold=self.threshold,
                    id_col=self.id_col,
                    text_col=self.text_col,
                )
        else:
            survivors = new
        # idempotent per-batch partition: overwrite ONLY batch=<id>;
        # the batch value comes from the directory name at read time
        # (partition discovery), so the files stay (id, text)-only
        survivors.write.mode("overwrite").parquet(
            os.path.join(self.corpus_path, f"batch={batch_id}")
        )

    def attach(self, stream_df: DataFrame, checkpoint: str):
        """Wire onto a streaming DataFrame; caller starts/awaits."""
        return (
            stream_df.writeStream.foreachBatch(self)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
        )
