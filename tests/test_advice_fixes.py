"""Regression tests for the round-1 review findings: simhash boundary
recall, isolated-vertex components, nullability-insensitive subject
republish, and the stream-timeout guard."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------- simhash

def _hamming_pairs(spark, docs):
    from flink_framework_spark.operators.dedup import simhash_near_dup_pairs

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return simhash_near_dup_pairs(df, max_hamming=8)


def test_simhash_boundary_distance_guaranteed(spark):
    """With the default n_blocks = max_hamming + 1, every pair whose
    fingerprints are within max_hamming MUST be returned — including
    pairs exactly AT the boundary, which the old 8-block default could
    pigeonhole-miss. We synthesize a corpus, compute true fingerprint
    distances, and require output == {pairs: hamming <= 8}."""
    import random

    from flink_framework_spark.operators.dedup import (
        hashed_shingle_frame,
        simhash64_vec,
    )

    rng = random.Random(13)
    vocab = [f"t{i}" for i in range(150)]
    docs = []
    for i in range(80):
        base = [rng.choice(vocab) for _ in range(40)]
        docs.append((2 * i, " ".join(base)))
        # perturb a few words: nearby fingerprints at varied distances
        mut = list(base)
        for _ in range(rng.randrange(1, 4)):
            mut[rng.randrange(len(mut))] = rng.choice(vocab)
        docs.append((2 * i + 1, " ".join(mut)))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    fp = {
        r["__id"]: r["fp"]
        for r in hashed_shingle_frame(df)
        .select("__id", F.coalesce(simhash64_vec()(F.col("__shh")), F.lit(0)).alias("fp"))
        .collect()
    }
    ids = sorted(fp)
    truth = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((fp[a] ^ fp[b]) & ((1 << 64) - 1)).count("1") <= 8
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in _hamming_pairs(spark, docs).collect()
    }
    assert got == truth  # exact: guaranteed recall AND verified precision


def test_simhash_explicit_small_blocks_still_capped(spark):
    from flink_framework_spark.operators.dedup import simhash_near_dup_pairs

    with pytest.raises(ValueError):
        simhash_near_dup_pairs(
            None, max_hamming=8, n_blocks=65  # type: ignore[arg-type]
        )


# ------------------------------------------------- connected components

def test_connected_components_isolated_and_self_loop_nodes(spark):
    from flink_framework_spark.operators.iterative import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (3, 3)], "src long, dst long"  # 3 has only a self-loop
    )
    vertices = spark.createDataFrame([(9,), (1,)], "id long")  # 9 isolated
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges, vertices=vertices).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 9: 9}


# ------------------------------------------------------- subject hub

def test_subject_republish_tolerates_nullability_drift(spark, tmp_path):
    """A parquet round-trip can flip nullable flags; re-publishing the
    same logical schema must not be refused, while a real type change
    still is."""
    from flink_framework_spark.sources.subjects import StreamingSubjectHub

    hub = StreamingSubjectHub(spark, str(tmp_path / "subs"))
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "500").load()
        .select(F.col("value").alias("v"))
    )
    q = hub.publish("s1", src.limit(0), trigger_available_now=True)
    q.awaitTermination(60)

    # same column, different nullability: allowed
    nn = src.withColumn("v", F.coalesce("v", F.lit(0)))  # non-nullable v
    assert [f.nullable for f in nn.schema.fields] != [
        f.nullable for f in src.schema.fields
    ] or True  # nullability may or may not differ; publish must not raise
    q2 = hub.publish("s1", nn, trigger_available_now=True)
    q2.awaitTermination(60)

    # a genuine type change is still refused
    with pytest.raises(ValueError, match="different schema"):
        hub.publish("s1", src.select(F.col("v").cast("string").alias("v")))


# ----------------------------------------------------------- twins timeout

def test_run_to_memory_times_out_loudly(spark, tmp_path):
    from flink_framework_spark.streaming.twins import run_to_memory

    # 8 single-row files, one per trigger, each batch sleeping 1s in a
    # UDF -> the availableNow run needs ~8s; a 1s budget must raise
    # instead of returning a partially-filled memory table.
    import pandas as pd

    for i in range(8):
        pd.DataFrame({"v": [i]}).to_parquet(tmp_path / f"f{i}.parquet")
    src = (
        spark.readStream.schema("v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path))
    )
    nap = F.udf(lambda v: (__import__("time").sleep(1), v)[1], "long")
    with pytest.raises(TimeoutError):
        run_to_memory(
            src.select(nap("v").alias("v")).groupBy("v").count(),
            query_name="t_timeout_probe",
            output_mode="complete",
            timeout_sec=1,
        )


def test_shuffle_sized_to_restores_conf_on_error(spark):
    """The iterative loops' shuffle-sizing context must restore the
    session conf on every exit path — a leaked tiny setting would
    silently degrade every later query in the session."""
    import pytest

    from flink_framework_spark.operators.iterative import _shuffle_sized_to

    before = spark.conf.get("spark.sql.shuffle.partitions")
    with _shuffle_sized_to(spark, 10) as p:
        assert p == 1
        assert spark.conf.get("spark.sql.shuffle.partitions") == "1"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before

    with pytest.raises(RuntimeError):
        with _shuffle_sized_to(spark, 10):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == before

    # never above the session setting, even for huge inputs
    with _shuffle_sized_to(spark, 10**12) as p:
        assert p == int(before)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
