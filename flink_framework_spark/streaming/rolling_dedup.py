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
    signature_path : optional directory for a SIGNATURE lake
        maintained alongside the corpus (same ``batch=<id>``
        idempotent layout): each batch's surviving min-shingle rows
        are appended, and subsequent batches dedup against THESE
        fixed-width hash rows instead of re-tokenizing the
        accumulated corpus text — without this, every round pays an
        O(corpus) tokenize pass, which at 100 TB dwarfs the
        |new|-sized blocking join. Text mode only (default
        ``dedup_fn``).
    """

    def __init__(
        self,
        corpus_path: str,
        threshold: float = 0.5,
        id_col: str = "doc_id",
        text_col: str = "text",
        dedup_fn=None,
        cols: list[str] | None = None,
        signature_path: str | None = None,
    ):
        if dedup_fn is not None and signature_path is not None:
            raise ValueError(
                "signature_path applies to the built-in text dedup only"
            )
        self.corpus_path = corpus_path
        self.threshold = threshold
        self.id_col = id_col
        self.text_col = text_col
        self.dedup_fn = dedup_fn
        self.cols = cols or [id_col, text_col]
        self.signature_path = signature_path

    def _read_lake(
        self, spark, path: str, exclude_batch: int
    ) -> DataFrame | None:
        """Accumulated rows EXCLUDING ``exclude_batch``'s own
        partition: a replayed micro-batch (checkpoint recovery) must
        not dedup against its previous, about-to-be-rewritten output.

        Only the two genuinely-empty states map to None (directory
        absent, or no batch= partitions yet); a real read error MUST
        propagate and fail the micro-batch — swallowing it would
        silently skip dedup for the whole batch and commit the
        checkpoint past it."""
        if not os.path.isdir(path):
            return None
        if not any(e.startswith("batch=") for e in os.listdir(path)):
            return None
        df = spark.read.parquet(path)
        return df.filter(F.col("batch") != exclude_batch).drop("batch")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from flink_framework_spark.operators.dedup import (
            incremental_dedup_ngram,
            min_shingle_frame,
        )

        spark = batch_df.sparkSession
        bid = int(batch_id)
        new = batch_df.select(*self.cols)
        new_minsh = None
        if self.signature_path is not None:
            # one tokenize pass for the batch: reused as the dedup's
            # new side AND as the signature rows persisted for the
            # survivors (the corpus text is never re-tokenized)
            new_minsh = min_shingle_frame(new, self.id_col, self.text_col)
            corpus_sig = self._read_lake(spark, self.signature_path, bid)
            if corpus_sig is None or corpus_sig.limit(1).count() == 0:
                # an empty signature lake is only legal while the
                # corpus itself is empty — otherwise dedup would
                # silently skip every existing document (e.g.
                # signature_path newly enabled over an old corpus,
                # or the derived lake was lost). Refuse; backfill
                # with backfill_signatures() first.
                corpus = self._read_lake(spark, self.corpus_path, bid)
                if corpus is not None and corpus.limit(1).count() > 0:
                    raise RuntimeError(
                        "rolling dedup: signature lake at "
                        f"{self.signature_path} is empty but the corpus "
                        f"at {self.corpus_path} is not — run "
                        "backfill_signatures() before streaming"
                    )
            if corpus_sig is not None and corpus_sig.limit(1).count() > 0:
                survivors = incremental_dedup_ngram(
                    new,
                    None,
                    threshold=self.threshold,
                    id_col=self.id_col,
                    text_col=self.text_col,
                    new_minsh=new_minsh,
                    corpus_minsh=corpus_sig,
                )
            else:
                survivors = new
        else:
            corpus = self._read_lake(spark, self.corpus_path, bid)
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
        if new_minsh is not None:
            # signature rows for THIS batch's survivors, same
            # idempotent layout (survivors were just written, so a
            # replay rewrites both partitions consistently)
            surv_ids = spark.read.parquet(
                os.path.join(self.corpus_path, f"batch={batch_id}")
            ).select(F.col(self.id_col).alias("__id"))
            new_minsh.join(surv_ids, "__id", "semi").write.mode(
                "overwrite"
            ).parquet(os.path.join(self.signature_path, f"batch={batch_id}"))
            new_minsh.unpersist()

    def backfill_signatures(self, spark) -> int:
        """Derive the signature lake from an existing corpus lake —
        one min-shingle pass per batch partition, written under the
        same idempotent layout. Returns the number of partitions
        backfilled. Use when enabling ``signature_path`` over a
        corpus built in text mode (or after losing the derived
        lake)."""
        from flink_framework_spark.operators.dedup import (
            min_shingle_frame,
        )

        if self.signature_path is None:
            raise ValueError("no signature_path configured")
        if not os.path.isdir(self.corpus_path):
            return 0
        n = 0
        for entry in sorted(os.listdir(self.corpus_path)):
            if not entry.startswith("batch="):
                continue
            part = spark.read.parquet(
                os.path.join(self.corpus_path, entry)
            )
            minsh = min_shingle_frame(part, self.id_col, self.text_col)
            minsh.write.mode("overwrite").parquet(
                os.path.join(self.signature_path, entry)
            )
            minsh.unpersist()
            n += 1
        return n

    def attach(self, stream_df: DataFrame, checkpoint: str):
        """Wire onto a streaming DataFrame; caller starts/awaits."""
        return (
            stream_df.writeStream.foreachBatch(self)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
        )
