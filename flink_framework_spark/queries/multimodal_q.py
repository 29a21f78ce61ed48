"""K5: multimodal-column query — binary payload plumbing through an
Arrow-batched decode stage (operators.multimodal). The codec is a
deterministic stub (no imaging libs in this container); the Spark
plumbing (binary column, mapInPandas batch shape, output schema) is
real and oracle-checked end-to-end, because the fake decoder's outputs
are pure functions of payload length that SQL can mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_framework_spark.io import table
from flink_framework_spark.operators.multimodal import attach_payload, decode_media
from flink_framework_spark.registry import register


@register(
    "q_multimodal_meta",
    family="K",
    oracle="""
SELECT doc_id AS media_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS payload_bytes,
       CAST(64 + octet_length(CAST(text AS BLOB)) % 256 AS BIGINT) AS width,
       CAST(64 + (octet_length(CAST(text AS BLOB)) * 7) % 256 AS BIGINT) AS height,
       'application/octet-stream' AS mime,
       concat('mem://', CAST(doc_id AS VARCHAR)) AS source_uri
FROM documents
""",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed meta struct -> mapInPandas decode ->
    feature columns with the meta round-tripped (K5 + J5).

    The payload really is a binary column and the meta really is a
    struct crossing the Arrow boundary; only the pixel codec is faked
    (documents.text bytes stand in for image bytes). Null payload /
    null struct handling is unit-tested with planted nulls in
    tests/test_multimodal.py."""
    media = attach_payload(table(spark, sf_dir, "documents"), "doc_id", "text")
    return decode_media(media, keep_meta=True)
