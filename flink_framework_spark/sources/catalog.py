"""Subject registry — the reference's ZooKeeper subject library
(SURVEY.md §2 A7 [R]) re-expressed on the Spark catalog.

A *subject* is a named, schema-carrying dataset other jobs can
discover and compose with (the reference materializes each as a Kafka
topic; here a subject is a temp view — or a metastore table in a
persistent deployment — plus its registered schema).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


@dataclass(frozen=True)
class Subject:
    name: str
    schema: StructType
    description: str = ""


class SubjectRegistry:
    """Register/discover typed datasets by name within a session.

    Registration is idempotent per (name, schema); re-registering a
    name with a different schema raises — the same contract the
    reference's schema registry enforces so downstream jobs never see
    silent shape changes.
    """

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._subjects: dict[str, Subject] = {}

    def register(self, name: str, df: DataFrame, description: str = "") -> Subject:
        existing = self._subjects.get(name)
        if existing is not None and existing.schema != df.schema:
            raise ValueError(
                f"subject {name!r} already registered with a different "
                f"schema: {existing.schema.simpleString()} != "
                f"{df.schema.simpleString()}"
            )
        df.createOrReplaceTempView(name)
        subject = Subject(name=name, schema=df.schema, description=description)
        self._subjects[name] = subject
        return subject

    def get(self, name: str) -> DataFrame:
        if name not in self._subjects:
            raise KeyError(f"unknown subject: {name!r}")
        return self._spark.table(name)

    def schema(self, name: str) -> StructType:
        return self._subjects[name].schema

    def list(self) -> list[Subject]:
        return sorted(self._subjects.values(), key=lambda s: s.name)

    def unregister(self, name: str) -> None:
        self._subjects.pop(name, None)
        self._spark.catalog.dropTempView(name)
