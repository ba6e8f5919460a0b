"""Multimodal-column plumbing (north-star op).

Contract: image/audio/video payloads are opaque ``binary`` columns with
typed metadata travelling beside them. The Spark-side machinery —
schema, partition-preserving ``mapInPandas``, Arrow batch shape — is
real and tested; the actual codec step is STUBBED (decode libraries are
not in this container): ``decode_image_meta`` raises
``NotImplementedError`` unless ``fake=True``, in which case it derives
deterministic pseudo-metadata from the bytes so the pipeline shape is
testable end-to-end.

The oracle-checked query (``multimodal_meta``) covers the pure-SQL part
of the path: byte length, content hash, and chunk accounting — what a
100 TB media pipeline computes before ever touching a codec.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHUNK_BYTES = 256

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
    ]
)

DECODED_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Reinterpret documents as opaque media blobs (test fixture path)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def decode_image_meta(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode stage: Arrow-batched ``mapInPandas`` over binary payloads.

    With ``fake=True`` the decode derives deterministic width/height/
    frame-count from the payload bytes (no codec); otherwise raises
    NotImplementedError — the real implementation would call into
    PIL/ffmpeg here with the identical batch shape.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image/audio decode libraries not available in this "
                    "environment; pass fake=True for the deterministic stub"
                )
            payloads = pdf["payload"]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": (n_bytes % 640 + 1).astype("int32"),
                    "height": (n_bytes % 480 + 1).astype("int32"),
                    "n_frames": ((n_bytes // CHUNK_BYTES) + 1).astype("int32"),
                }
            )

    return media.mapInPandas(decode, schema=DECODED_META_SCHEMA)


def multimodal_meta(t: dict[str, DataFrame]) -> DataFrame:
    """Pure-SQL media accounting over binary payloads (oracle-checked):
    size, content hash, storage chunks."""
    media = documents_as_media(t["documents"])
    return media.select(
        "media_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_hash"),
        ((F.octet_length("payload") + CHUNK_BYTES - 1) / CHUNK_BYTES)
        .cast("long")
        .alias("n_chunks"),
    )


MULTIMODAL_META_ORACLE = f"""
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_hash,
       CAST((octet_length(encode(text)) + {CHUNK_BYTES} - 1) // {CHUNK_BYTES}
            AS BIGINT) AS n_chunks
FROM documents
"""
