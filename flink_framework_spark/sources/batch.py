"""Bounded sources & sinks.

``write_partitioned_lake`` encodes the layout that makes 100 TB
queryable: hive-style partition directories on coarse, low-cardinality
keys (so static + dynamic partition pruning eliminate IO before it
happens), with optional bucketing on a join key (so co-located joins
skip their shuffle). The companion test asserts PartitionFilters
actually appear in a pruned scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from flink_framework_spark.session import configure_session


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    configure_session(spark)
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_partitioned_lake(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write a partition-pruned parquet lake.

    Partition keys should be coarse (date, region, source) — one
    directory per value; high-cardinality keys belong in bucketing or
    plain columns. ``maxRecordsPerFile`` caps file size so a 100 TB
    table becomes uniformly-sized scan tasks instead of stragglers.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed table: joins/aggregations on the bucket
    key then skip their shuffle entirely (co-located join)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name)
