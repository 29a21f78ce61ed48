"""Streaming rolling-ingest dedup (foreachBatch) — equivalence to the
batch fold, idempotent replay, and the keep-earliest contract."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.streaming.drain import await_drain
from flink_framework_spark.streaming.rolling_dedup import (
    RollingDedupProcessor,
)

N_FILES = 4


@pytest.fixture(scope="module")
def doc_spool(spark, sf_dir, tmp_path_factory):
    """documents as N_FILES parquet files in doc_id order with strictly
    increasing mtimes, so the file stream replays them as ordered
    micro-batches."""
    out = tmp_path_factory.mktemp("docspool")
    docs = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    chunk = (len(docs) + N_FILES - 1) // N_FILES
    cuts = []
    for i in range(N_FILES):
        part = docs.iloc[i * chunk : (i + 1) * chunk]
        cuts.append(set(part.doc_id))
        p = out / f"part-{i:05d}.parquet"
        part.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(out), cuts


def _run_stream(spark, directory, corpus_path, checkpoint):
    sdf = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(directory)
    )
    proc = RollingDedupProcessor(corpus_path, threshold=0.5)
    q = (
        proc.attach(sdf, checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, q.name or "rolling_dedup", timeout_sec=120)
    return spark.read.parquet(corpus_path)


def _batch_fold(spark, sf_dir, n_batches):
    from flink_framework_spark.operators.dedup import incremental_dedup_ngram

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    pdf = docs.orderBy("doc_id").toPandas()
    chunk = (len(pdf) + n_batches - 1) // n_batches
    ids = list(pdf.doc_id)
    corpus = docs.filter(F.col("doc_id").isin(ids[:chunk]))
    for i in range(1, n_batches):
        b = docs.filter(F.col("doc_id").isin(ids[i * chunk : (i + 1) * chunk]))
        corpus = corpus.unionByName(
            incremental_dedup_ngram(b, corpus, threshold=0.5)
        ).localCheckpoint()
    return corpus


def test_stream_equals_batch_fold(spark, sf_dir, doc_spool, tmp_path):
    directory, cuts = doc_spool
    corpus_path = str(tmp_path / "corpus")
    got = _run_stream(
        spark, directory, corpus_path, str(tmp_path / "ckpt")
    )
    want = _batch_fold(spark, sf_dir, N_FILES)
    got_ids = {r.doc_id for r in got.select("doc_id").collect()}
    want_ids = {r.doc_id for r in want.select("doc_id").collect()}
    assert got_ids == want_ids
    # batch partition layout: each survivor sits in its arrival batch
    by_batch = {
        r.batch: r.n
        for r in got.groupBy("batch").agg(F.count("*").alias("n")).collect()
    }
    assert set(by_batch) == set(range(N_FILES))
    assert by_batch[0] == len(cuts[0])  # first batch passes whole


def test_replayed_batch_is_idempotent(spark, sf_dir, doc_spool, tmp_path):
    """Re-running the LAST micro-batch (what checkpoint recovery does
    after a sink-side crash) must leave the corpus byte-identical in
    content: the batch partition is overwritten, not appended, and the
    replay does not dedup against its own previous output."""
    directory, _ = doc_spool
    corpus_path = str(tmp_path / "corpus")
    _run_stream(spark, directory, corpus_path, str(tmp_path / "ckpt"))
    before = {
        (r.doc_id, r.batch)
        for r in spark.read.parquet(corpus_path).collect()
    }
    # simulate recovery replay of the final batch
    last = N_FILES - 1
    proc = RollingDedupProcessor(corpus_path, threshold=0.5)
    replay_df = spark.read.parquet(
        os.path.join(directory, f"part-{last:05d}.parquet")
    )
    proc(replay_df, last)
    after = {
        (r.doc_id, r.batch)
        for r in spark.read.parquet(corpus_path).collect()
    }
    assert after == before


def test_signature_lake_mode_equals_text_mode(spark, sf_dir, doc_spool, tmp_path):
    """The signature-lake path (corpus side reads persisted hash rows,
    never re-tokenizes accumulated text) must produce the identical
    surviving corpus, and the signature lake must mirror the corpus
    partitions row-for-row (docs long enough to carry a shingle)."""
    directory, _ = doc_spool
    text_corpus = str(tmp_path / "corpus_text")
    _run_stream(spark, directory, text_corpus, str(tmp_path / "ck1"))
    want = {
        (r.doc_id, r.batch)
        for r in spark.read.parquet(text_corpus).collect()
    }

    sig_corpus = str(tmp_path / "corpus_sig")
    sig_path = str(tmp_path / "sigs")
    sdf = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(directory)
    )
    proc = RollingDedupProcessor(
        sig_corpus, threshold=0.5, signature_path=sig_path
    )
    q = (
        proc.attach(sdf, str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, q.name or "rolling_dedup", timeout_sec=120)
    got = {
        (r.doc_id, r.batch)
        for r in spark.read.parquet(sig_corpus).collect()
    }
    assert got == want
    sigs = spark.read.parquet(sig_path)
    corpus = spark.read.parquet(sig_corpus)
    # every corpus row with >= 3 tokens has its signature row in the
    # SAME batch partition
    n_long = corpus.filter(
        F.size(F.split(F.lower(F.trim("text")), r"\s+")) >= 3
    ).count()
    assert sigs.count() == n_long
    joined = sigs.join(
        corpus.select(F.col("doc_id").alias("__id"), "batch"),
        ["__id", "batch"],
    )
    assert joined.count() == n_long
    # replay of the last batch is idempotent for BOTH lakes
    last = N_FILES - 1
    before = (
        {(r.doc_id, r.batch) for r in corpus.collect()},
        {(r["__id"], r["batch"]) for r in sigs.select("__id", "batch").collect()},
    )
    replay_df = spark.read.parquet(
        os.path.join(directory, f"part-{last:05d}.parquet")
    )
    proc(replay_df, last)
    after = (
        {(r.doc_id, r.batch)
         for r in spark.read.parquet(sig_corpus).collect()},
        {(r["__id"], r["batch"])
         for r in spark.read.parquet(sig_path)
         .select("__id", "batch").collect()},
    )
    assert after == before


def test_signature_mode_refuses_unbackfilled_corpus(
    spark, sf_dir, doc_spool, tmp_path
):
    """Enabling signature_path over an existing text-mode corpus must
    refuse (the empty signature lake would silently skip dedup against
    every existing document); backfill_signatures repairs it and the
    next batch then dedups normally."""
    directory, _ = doc_spool
    corpus_path = str(tmp_path / "corpus")
    _run_stream(spark, directory, corpus_path, str(tmp_path / "ck"))
    proc = RollingDedupProcessor(
        corpus_path, threshold=0.5, signature_path=str(tmp_path / "sigs")
    )
    replay_df = spark.read.parquet(
        os.path.join(directory, "part-00000.parquet")
    )
    with pytest.raises(RuntimeError, match="backfill"):
        proc(replay_df, N_FILES)  # a NEW batch id, not a replay
    n = proc.backfill_signatures(spark)
    assert n == N_FILES
    # after backfill: re-ingesting batch 0's docs as a NEW batch drops
    # every one of them (they are exact dups of corpus survivors)
    proc(replay_df, N_FILES)
    added = spark.read.parquet(corpus_path).filter(
        F.col("batch") == N_FILES
    )
    assert added.count() == 0


def test_torn_partition_replay_repairs(spark, sf_dir, doc_spool, tmp_path):
    """A crash can leave a batch= directory holding only uncommitted
    metadata (_temporary, _SUCCESS) and no data files. The replay
    must treat it as absent — NOT wedge on an unreadable lake — and
    its overwrite repairs the partition."""
    directory, cuts = doc_spool
    corpus_path = str(tmp_path / "corpus")
    full = _run_stream(spark, directory, corpus_path, str(tmp_path / "ck"))
    want = {(r.doc_id, r.batch) for r in full.collect()}
    # simulate the torn write on the LAST batch
    last = N_FILES - 1
    torn = os.path.join(corpus_path, f"batch={last}")
    shutil.rmtree(torn)
    os.makedirs(os.path.join(torn, "_temporary"))
    proc = RollingDedupProcessor(corpus_path, threshold=0.5)
    replay_df = spark.read.parquet(
        os.path.join(directory, f"part-{last:05d}.parquet")
    )
    proc(replay_df, last)  # must not raise
    got = {
        (r.doc_id, r.batch)
        for r in spark.read.parquet(corpus_path).collect()
    }
    assert got == want


def test_partial_signature_lake_detected(spark, sf_dir, doc_spool, tmp_path):
    """Losing one signature partition while its corpus partition
    survives must refuse the next NEW batch (dedup would silently
    skip those documents), naming the missing partition."""
    directory, _ = doc_spool
    corpus_path = str(tmp_path / "corpus")
    sig_path = str(tmp_path / "sigs")
    sdf = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(directory)
    )
    proc = RollingDedupProcessor(
        corpus_path, threshold=0.5, signature_path=sig_path
    )
    q = proc.attach(sdf, str(tmp_path / "ck")).trigger(availableNow=True).start()
    await_drain(q, q.name or "rolling_dedup", timeout_sec=120)
    shutil.rmtree(os.path.join(sig_path, "batch=1"))
    replay_df = spark.read.parquet(
        os.path.join(directory, "part-00000.parquet")
    )
    with pytest.raises(RuntimeError, match="batch=1"):
        proc(replay_df, N_FILES)
    proc.backfill_signatures(spark)
    proc(replay_df, N_FILES)  # repaired


def test_orphaned_signature_partition_detected(
    spark, sf_dir, doc_spool, tmp_path
):
    """A signature partition whose corpus partition is gone would veto
    new documents against ghosts — the consistency check must refuse,
    naming the orphan."""
    directory, _ = doc_spool
    corpus_path = str(tmp_path / "corpus")
    sig_path = str(tmp_path / "sigs")
    sdf = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(directory)
    )
    proc = RollingDedupProcessor(
        corpus_path, threshold=0.5, signature_path=sig_path
    )
    q = proc.attach(sdf, str(tmp_path / "ck")).trigger(availableNow=True).start()
    await_drain(q, q.name or "rolling_dedup", timeout_sec=120)
    shutil.rmtree(os.path.join(corpus_path, "batch=2"))
    replay_df = spark.read.parquet(
        os.path.join(directory, "part-00000.parquet")
    )
    with pytest.raises(RuntimeError, match="orphaned.*batch=2"):
        proc(replay_df, N_FILES)


def test_short_doc_corpus_streams_without_signatures(spark, tmp_path):
    """A corpus whose docs are all too short to carry a shingle has a
    legitimately empty signature lake: streaming must proceed (all
    docs survive) rather than demanding an impossible backfill."""
    import pandas as pd

    spool = tmp_path / "spool"
    spool.mkdir()
    for i in range(2):
        p = str(spool / f"part-{i:05d}.parquet")
        pd.DataFrame(
            {"doc_id": [i * 10 + j for j in range(3)], "text": ["hi there"] * 3}
        ).to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i,) * 2)
    corpus_path = str(tmp_path / "corpus")
    proc = RollingDedupProcessor(
        corpus_path, threshold=0.5, signature_path=str(tmp_path / "sigs")
    )
    sdf = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(spool))
    )
    q = proc.attach(sdf, str(tmp_path / "ck")).trigger(availableNow=True).start()
    await_drain(q, q.name or "rolling_dedup", timeout_sec=120)
    assert spark.read.parquet(corpus_path).count() == 6


def test_semantic_rolling_stream_equals_batch_fold(spark, sf_dir, tmp_path):
    """The pluggable dedup_fn path: stream embeddings in 3 batches
    through semantic_dedup_incremental (fixed centroid artifact) and
    require the surviving vec_id set to equal the batch fold's."""
    from flink_framework_spark.operators.similarity import (
        semantic_dedup_incremental,
        train_ivf_centroids,
    )

    em = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = train_ivf_centroids(em, n_cells=8)

    def sem_fn(new, corpus):
        out = semantic_dedup_incremental(
            new, corpus, cents, eps=0.35
        )
        keep = out.filter(
            (F.col("is_new") == 1) & (F.col("kept") == 1)
        ).select("vec_id")
        return new.join(keep, "vec_id", "semi")

    n = em.count()
    cut = n // 3
    ids = [r.vec_id for r in em.select("vec_id").orderBy("vec_id").collect()]
    parts = [
        em.filter(F.col("vec_id").isin(ids[i * cut : (i + 1) * cut] if i < 2
                                       else ids[2 * cut :]))
        for i in range(3)
    ]
    # spool the three batches as ordered files
    spool = tmp_path / "emspool"
    spool.mkdir()
    for i, p in enumerate(parts):
        f = str(spool / f"part-{i:05d}.parquet")
        p.toPandas().to_parquet(f, index=False)
        os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))
    sdf = (
        spark.readStream.schema(em.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(spool))
    )
    corpus_path = str(tmp_path / "emcorpus")
    proc = RollingDedupProcessor(
        corpus_path, dedup_fn=sem_fn, id_col="vec_id",
        cols=["vec_id", "embedding"],
    )
    q = (
        proc.attach(sdf, str(tmp_path / "emckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_drain(q, q.name or "rolling_dedup", timeout_sec=120)
    got = {
        r.vec_id
        for r in spark.read.parquet(corpus_path).select("vec_id").collect()
    }
    corpus = parts[0]
    for b in parts[1:]:
        corpus = corpus.unionByName(sem_fn(b, corpus)).localCheckpoint()
    want = {r.vec_id for r in corpus.select("vec_id").collect()}
    assert got == want
    assert len(got) < n  # the fold actually drops something


def test_no_cross_batch_dups_survive(spark, sf_dir, doc_spool, tmp_path):
    from flink_framework_spark.operators.dedup import ngram_near_dup_pairs

    directory, cuts = doc_spool
    corpus_path = str(tmp_path / "corpus")
    got = _run_stream(
        spark, directory, corpus_path, str(tmp_path / "ckpt")
    )
    surv = got.select("doc_id", "text", "batch")
    pairs = ngram_near_dup_pairs(surv, threshold=0.5)
    batches = surv.select("doc_id", "batch")
    a = batches.select(
        F.col("doc_id").alias("doc_a"), F.col("batch").alias("ba")
    )
    b = batches.select(
        F.col("doc_id").alias("doc_b"), F.col("batch").alias("bb")
    )
    cross = (
        pairs.join(a, "doc_a").join(b, "doc_b").filter(F.col("ba") != F.col("bb"))
    )
    assert cross.count() == 0


def test_remote_uri_lake_paths_refused():
    from flink_framework_spark.streaming.rolling_dedup import (
        RollingDedupProcessor,
    )

    with pytest.raises(ValueError, match="corpus_path"):
        RollingDedupProcessor("s3a://bucket/corpus")
    with pytest.raises(ValueError, match="signature_path"):
        RollingDedupProcessor(
            "/tmp/ok", signature_path="hdfs://nn/sigs"
        )


def test_rescaled_resume_equals_batch_fold(spark, sf_dir, doc_spool, tmp_path):
    """The savepoint workflow Flink users expect — stop the job,
    resize the cluster, resume — applied to the rolling lake: ingest
    half the spool at one parallelism, QUADRUPLE
    spark.sql.shuffle.partitions, resume from the same checkpoint.
    Because the dedup state lives in the lake (parquet), not in
    Spark's partition-pinned internal state store, the rescaled resume
    must produce the exact batch-fold corpus. This is the app-level
    state-migration evidence backing COVERAGE.md's savepoint-parity
    note (the internal-state counterpart is
    test_state_rescale_pins_original_partitioning)."""
    directory, _ = doc_spool
    stage = tmp_path / "stage"
    stage.mkdir()
    corpus_path = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    def copy_files(idxs):
        for i in idxs:
            name = f"part-{i:05d}.parquet"
            shutil.copy2(os.path.join(directory, name), stage / name)

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        copy_files([0, 1])
        _run_stream(spark, str(stage), corpus_path, ckpt)
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(4 * int(orig))
        )
        copy_files([2, 3])
        got = _run_stream(spark, str(stage), corpus_path, ckpt)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)

    want = _batch_fold(spark, sf_dir, N_FILES)
    got_ids = {r.doc_id for r in got.select("doc_id").collect()}
    want_ids = {r.doc_id for r in want.select("doc_id").collect()}
    assert got_ids == want_ids
