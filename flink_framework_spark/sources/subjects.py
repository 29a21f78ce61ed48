"""Streaming subject hub — the reference's job-composition mechanism.

In the reference, independent jobs compose by publishing/subscribing
typed subjects: each subject is a Kafka topic plus a schema in the
ZooKeeper registry (SURVEY.md §1.1 [R]). Here a subject is a
*directory of parquet micro-batches plus a persisted schema file* —
the same contract (durable transport + schema discovery + multiple
independent consumers), testable without a Kafka broker; swapping the
transport for Kafka is exactly ``sources.streaming.kafka_source`` /
``kafka_sink`` with the same registry.

Producer job:   hub.publish(name, streaming_df)   (appends batches)
Consumer job:   hub.subscribe(name)               (tails the subject,
                schema recovered from the registry — the consumer
                never needs the producer's code)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def _erase_nullability(schema: StructType) -> StructType:
    """Copy of a schema with every nullable flag (incl. nested fields'
    and array/map element containsNull) forced true, for semantic
    comparison."""
    d = schema.jsonValue()

    def scrub(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k in ("nullable", "containsNull", "valueContainsNull"):
                    node[k] = True
                else:
                    scrub(v)
        elif isinstance(node, list):
            for v in node:
                scrub(v)

    scrub(d)
    return StructType.fromJson(d)


class StreamingSubjectHub:
    def __init__(self, spark: SparkSession, root: str):
        self._spark = spark
        self._root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self._root, name)

    def _schema_path(self, name: str) -> str:
        return os.path.join(self._root, f"{name}.schema.json")

    def publish(
        self,
        name: str,
        df: DataFrame,
        trigger_available_now: bool = True,
    ) -> StreamingQuery:
        """Register the subject's schema and start appending the
        streaming DataFrame to its directory (exactly-once via the
        subject's own checkpoint)."""
        existing = self.schema(name)
        # Compare with nullability erased: a schema recovered from the
        # persisted JSON after a parquet round-trip can legitimately
        # differ only in nullable flags, which is not a semantic change.
        if existing is not None and _erase_nullability(
            existing
        ) != _erase_nullability(df.schema):
            raise ValueError(
                f"subject {name!r} already registered with different schema"
            )
        with open(self._schema_path(name), "w") as f:
            json.dump(df.schema.jsonValue(), f)
        writer = (
            df.writeStream.format("parquet")
            .option("path", self._dir(name))
            .option(
                "checkpointLocation", os.path.join(self._root, f"{name}.ckpt")
            )
            .outputMode("append")
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def schema(self, name: str) -> StructType | None:
        path = self._schema_path(name)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return StructType.fromJson(json.load(f))

    def list_subjects(self) -> list[str]:
        return sorted(
            f[: -len(".schema.json")]
            for f in os.listdir(self._root)
            if f.endswith(".schema.json")
        )

    def subscribe(self, name: str) -> DataFrame:
        """Tail a subject as a stream, schema from the registry."""
        schema = self.schema(name)
        if schema is None:
            raise KeyError(f"unknown subject: {name!r}")
        return self._spark.readStream.schema(schema).parquet(self._dir(name))

    def read(self, name: str) -> DataFrame:
        """Bounded (batch) read of everything published so far."""
        schema = self.schema(name)
        if schema is None:
            raise KeyError(f"unknown subject: {name!r}")
        return self._spark.read.schema(schema).parquet(self._dir(name))
