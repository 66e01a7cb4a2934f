"""Multimodal columns (SURVEY §2.C D5): binary payload + typed metadata.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode/feature-extract run as Arrow-batched ``mapInPandas``.
Real codecs aren't in this container, so the decode step is a
clearly-marked deterministic stub — the Spark-side plumbing (schema,
batch iteration, partitioning) is real and tested.

Scale: binary payloads ride in parquet alongside metadata; decode is a
narrow map stage (no shuffle), and metadata-only queries never touch
the payload bytes thanks to parquet column pruning.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load


@query(
    "d5_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           'text/plain' AS mime,
           sha256(text) AS content_hash
    FROM documents
    """,
)
def d5_binary_meta(spark: SparkSession, sf: str) -> DataFrame:
    """D5: binary payload column + typed metadata projection.

    The payload is the UTF-8 encoding of ``text`` (a stand-in for image
    bytes); metadata (size, mime, content hash) is computed without any
    Python round-trip.
    """
    d = load(spark, sf, "documents").withColumn("payload", F.encode("text", "UTF-8"))
    return d.select(
        "doc_id",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.lit("text/plain").alias("mime"),
        F.sha2("text", 256).alias("content_hash"),
    )


def decode_image_stub(payload: bytes) -> dict:
    """STUB: real image decode requires PIL/opencv (not in container).

    Deterministic fake: 'decodes' payload bytes into a pseudo
    width/height/channels derived from the content. Replace with a real
    codec in production; the surrounding Spark plumbing is unchanged.
    """
    n = len(payload)
    return {
        "width": 16 + n % 64,
        "height": 16 + (n // 64) % 64,
        "channels": 3,
    }


@query("d5_decode_features", oracle=None)  # stubbed decode → rows-only check
def d5_decode_features(spark: SparkSession, sf: str) -> DataFrame:
    """D5: decode + feature-extract via mapInPandas (Arrow batches).

    Batch shape is the real thing: an iterator of pandas DataFrames in,
    an iterator out, schema declared up front. The decode itself is
    :func:`decode_image_stub` (deterministic fake — see its docstring).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            meta = [decode_image_stub(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.str.len().astype("int64"),
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "channels": [m["channels"] for m in meta],
                }
            )

    d = (
        load(spark, sf, "documents")
        .withColumn("payload", F.encode("text", "UTF-8"))
        .select("doc_id", "payload")
    )
    return d.mapInPandas(
        extract,
        "doc_id long, n_bytes long, width int, height int, channels int",
    )
