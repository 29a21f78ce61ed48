"""Multimodal plumbing (K5): binary payloads and typed meta structs
through the Arrow mapInPandas boundary, including every null shape a
real media lake produces (null payload, null struct, null fields)."""

from __future__ import annotations

from pyspark.sql import Row

from flink_framework_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
)


def _media(spark, rows):
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def test_null_payload_and_null_meta_round_trip(spark):
    rows = [
        Row(media_id=1, payload=b"abcd",
            meta=Row(mime="image/png", source_uri="s3://a/1.png")),
        Row(media_id=2, payload=None,  # undecodable: features null
            meta=Row(mime="image/png", source_uri=None)),  # null field
        Row(media_id=3, payload=b"", meta=None),  # empty bytes + null struct
    ]
    got = {r["media_id"]: r for r in
           decode_media(_media(spark, rows), keep_meta=True).collect()}

    assert got[1]["payload_bytes"] == 4
    assert got[1]["width"] == 64 + 4 % 256 and got[1]["height"] == 64 + 28 % 256
    assert got[1]["mime"] == "image/png"
    assert got[1]["source_uri"] == "s3://a/1.png"

    # null payload: row preserved, features null, meta intact
    assert got[2]["payload_bytes"] is None
    assert got[2]["width"] is None and got[2]["height"] is None
    assert got[2]["mime"] == "image/png" and got[2]["source_uri"] is None

    # empty payload decodes (0 bytes); null struct -> null fields
    assert got[3]["payload_bytes"] == 0
    assert got[3]["width"] == 64 and got[3]["height"] == 64
    assert got[3]["mime"] is None and got[3]["source_uri"] is None


def test_decode_without_meta_keeps_legacy_schema(spark):
    rows = [Row(media_id=7, payload=b"xyz", meta=None)]
    out = decode_media(_media(spark, rows))
    assert out.columns == ["media_id", "payload_bytes", "width", "height"]
    assert out.collect()[0]["payload_bytes"] == 3
