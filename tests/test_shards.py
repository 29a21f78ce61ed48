"""Training-shard export: round-trip completeness, deterministic
membership, file-size bounds, and manifest consistency."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.curation import (
    assign_shards,
    shard_manifest,
    write_training_shards,
)


def test_write_shards_roundtrip_complete_and_deterministic(
    spark, sf_dir, tmp_path
):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=8)
    back = spark.read.parquet(out)
    # every row exactly once
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    # membership matches the pure assignment function
    want = {
        (r.doc_id, r.shard)
        for r in assign_shards(docs, 8).select("doc_id", "shard").collect()
    }
    got = {(r.doc_id, r.shard) for r in back.select("doc_id", "shard").collect()}
    assert got == want
    # re-export is bit-stable in membership
    out2 = str(tmp_path / "shards2")
    write_training_shards(docs, out2, n_shards=8)
    got2 = {
        (r.doc_id, r.shard)
        for r in spark.read.parquet(out2).select("doc_id", "shard").collect()
    }
    assert got2 == got
    # hive layout: one directory per non-empty shard
    dirs = {os.path.basename(p) for p in glob.glob(f"{out}/shard=*")}
    assert dirs == {f"shard={s}" for _, s in want}


def test_max_records_per_file_bounds_files(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4, max_records_per_file=20)
    import pyarrow.parquet as pq

    for f in glob.glob(f"{out}/shard=*/*.parquet"):
        assert pq.ParquetFile(f).metadata.num_rows <= 20, f


def test_shuffle_within_orders_by_hash(spark, sf_dir, tmp_path):
    """Sequential reads of a shard must yield the deterministic
    md5-permuted order, decorrelated from doc_id ingest order."""
    import hashlib

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4)
    for shard_dir in sorted(glob.glob(f"{out}/shard=*")):
        import pandas as pd

        files = sorted(glob.glob(f"{shard_dir}/*.parquet"))
        ids = list(
            pd.concat([pd.read_parquet(f) for f in files]).doc_id
        )
        want = sorted(
            ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
        )
        assert ids == want
        assert ids != sorted(ids)  # genuinely decorrelated from id order


def test_manifest_sums_match_corpus(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    m = shard_manifest(docs, n_shards=16)
    rows = m.collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    total_chars = docs.agg(
        F.sum(F.length("text").cast("long"))
    ).first()[0]
    assert sum(r.n_chars for r in rows) == total_chars
    # shards reasonably balanced (multinomial: no shard > 3x mean)
    mean = sum(r.n_docs for r in rows) / len(rows)
    assert all(r.n_docs < 3 * mean for r in rows)
