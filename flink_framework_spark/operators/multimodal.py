"""Multimodal (binary payload) columns (SURVEY.md §2 K5).

Media rows are opaque ``binary`` payloads plus typed metadata — the
Spark-side plumbing (schema, Arrow batching through mapInPandas,
partition sizing) is real and tested; only the *codec* is stubbed,
because image/audio libraries are not in this container.

At 100 TB: payloads dominate row size, so decode stages run
``mapInPandas`` (Arrow transfers the binary column zero-copy into
pandas), keep ``spark.sql.files.maxPartitionBytes`` small enough that
a batch of payloads fits executor memory, and write back columnar
features, never re-shuffling raw bytes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical media-table schema: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), True),
                    StructField("source_uri", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = "media_id long, payload_bytes long, width long, height long"


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media table from any table with an id + content column
    (test fixture path: UTF-8 bytes stand in for image bytes)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.concat(F.lit("mem://"), F.col(id_col).cast("string")).alias(
                "source_uri"
            ),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes | None) -> tuple[int | None, ...]:
    """Deterministic stand-in for an image decoder: derives fake
    dimensions from the payload length; a NULL payload decodes to NULL
    features (undecodable rows must flow through, not crash the
    stage). Replace with a real codec via ``decode_image_real``."""
    if payload is None:
        return None, None, None
    n = len(payload)
    return n, 64 + n % 256, 64 + (n * 7) % 256


def decode_image_real(payload: bytes):  # pragma: no cover - stub
    """Real decode path — requires an imaging library (not installed
    in this container). The Spark-side plumbing is identical: swap
    this in for ``_fake_decode`` inside ``decode_media``."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "production deployments plug PIL/turbojpeg in here"
    )


def decode_media(media: DataFrame, keep_meta: bool = False) -> DataFrame:
    """Arrow-batched decode stage: binary payloads -> feature columns.

    mapInPandas streams record batches, so executor memory is bounded
    by the Arrow batch size regardless of table size. NULL payloads
    yield NULL features (the row is preserved for lineage, not
    dropped). ``keep_meta=True`` round-trips the typed ``meta`` struct
    through the Arrow boundary as flattened columns — structs arrive
    in pandas as per-row dicts (or None for a NULL struct); both the
    NULL struct and NULL fields inside it survive the crossing.
    """
    schema = DECODED_SCHEMA + (", mime string, source_uri string" if keep_meta else "")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            out = {
                "media_id": pdf["media_id"],
                "payload_bytes": [d[0] for d in decoded],
                "width": [d[1] for d in decoded],
                "height": [d[2] for d in decoded],
            }
            if keep_meta:
                metas = [m if isinstance(m, dict) else {} for m in pdf["meta"]]
                out["mime"] = [m.get("mime") for m in metas]
                out["source_uri"] = [m.get("source_uri") for m in metas]
            yield pd.DataFrame(out)

    return media.mapInPandas(_decode, schema=schema)
