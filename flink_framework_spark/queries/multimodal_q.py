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
       CAST(64 + (octet_length(CAST(text AS BLOB)) * 7) % 256 AS BIGINT) AS height
FROM documents
""",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> mapInPandas decode -> feature columns.

    The payload really is a binary column crossing the Arrow boundary;
    only the pixel codec is faked (documents.text bytes stand in for
    image bytes)."""
    media = attach_payload(table(spark, sf_dir, "documents"), "doc_id", "text")
    return decode_media(media)
