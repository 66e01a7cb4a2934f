"""Multimodal columns (SURVEY §2.C D5): binary payload + typed metadata.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode/feature-extract run as Arrow-batched ``mapInPandas``.

The decode step is REAL for the formats the stdlib can parse —
PNG / GIF / BMP / JPEG header decode (``struct`` + byte scanning) and
WAV via the ``wave`` module; :func:`decode_media` sniffs the magic
bytes and dispatches. Pixel-level decode of compressed formats (and all
video) still needs PIL/opencv/ffmpeg, which aren't in this container —
those payloads come back ``format='unknown'`` with null dims, and a
production deployment swaps :func:`decode_media` for a codec-backed
version without touching the Spark plumbing.

Scale: binary payloads ride in parquet alongside metadata; decode is a
narrow map stage (no shuffle), and metadata-only queries never touch
the payload bytes thanks to parquet column pruning.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator, Optional

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


# -- real stdlib decoders ---------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # PNG color type → bands


def make_png(width: int, height: int, gray: int = 127) -> bytes:
    """Minimal valid 8-bit RGB PNG (stdlib only) — fixture/payload maker."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes((gray, gray, gray)) * width for _ in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_wav(n_frames: int, sample_rate: int = 8000) -> bytes:
    """Minimal mono 16-bit PCM WAV (stdlib ``wave``) — fixture maker."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(b"\x00\x00" * n_frames)
    return buf.getvalue()


def decode_media(payload: Optional[bytes]) -> dict:
    """Sniff + header-decode a media payload (REAL parse, stdlib only).

    PNG (IHDR), GIF (logical screen), BMP (BITMAPINFOHEADER), JPEG
    (SOF0/1/2 scan) → width/height/channels; RIFF-WAVE (``wave``) →
    channels/sample_rate/n_frames. Anything else → ``format='unknown'``
    with null fields (full pixel decode needs codecs not in this
    container; swap this function in production).
    """
    out = {
        "format": "unknown",
        "width": None,
        "height": None,
        "channels": None,
        "sample_rate": None,
        "n_frames": None,
    }
    if not payload:
        return out
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            out.update(
                format="png",
                width=w,
                height=h,
                channels=_PNG_CHANNELS.get(payload[25]),
            )
        elif payload[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", payload[6:10])
            out.update(format="gif", width=w, height=h, channels=3)
        elif payload[:2] == b"BM" and len(payload) >= 26:
            w, h = struct.unpack("<ii", payload[18:26])
            out.update(format="bmp", width=w, height=abs(h), channels=3)
        elif payload[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(payload):  # scan segments for a SOF marker
                if payload[i] != 0xFF:
                    break
                marker, seglen = payload[i + 1], struct.unpack(
                    ">H", payload[i + 2 : i + 4]
                )[0]
                if marker in (0xC0, 0xC1, 0xC2):
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    out.update(
                        format="jpeg",
                        width=w,
                        height=h,
                        channels=payload[i + 9],
                    )
                    break
                i += 2 + seglen
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            import io
            import wave

            with wave.open(io.BytesIO(payload), "rb") as wv:
                out.update(
                    format="wav",
                    channels=wv.getnchannels(),
                    sample_rate=wv.getframerate(),
                    n_frames=wv.getnframes(),
                )
    except Exception:  # noqa: BLE001 — corrupt header → unknown
        return {
            "format": "unknown",
            "width": None,
            "height": None,
            "channels": None,
            "sample_rate": None,
            "n_frames": None,
        }
    return out


@query(
    "d5_decode_features",
    oracle="""
    SELECT doc_id,
           'png' AS fmt,
           CAST(1 + n_chars % 64 AS INT) AS width,
           CAST(1 + doc_id % 48 AS INT) AS height,
           CAST(3 AS INT) AS channels
    FROM documents
    """,
)
def d5_decode_features(spark: SparkSession, sf: str) -> DataFrame:
    """D5: REAL image decode via mapInPandas (Arrow batches).

    Each document's payload is a valid PNG (built with the stdlib
    :func:`make_png`, dims derived from doc fields) and the features
    come from actually parsing those bytes with :func:`decode_media` —
    the DuckDB oracle recomputes the expected dims from the doc fields,
    so a decode bug breaks the hash. Narrow map stage, no shuffle.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                make_png(1 + int(nc) % 64, 1 + int(did) % 48)
                for did, nc in zip(pdf["doc_id"], pdf["n_chars"])
            ]
            meta = [decode_media(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": [m["format"] for m in meta],
                    "width": [m["width"] for m in meta],
                    "height": [m["height"] for m in meta],
                    "channels": [m["channels"] for m in meta],
                }
            )

    d = load(spark, sf, "documents").select("doc_id", "n_chars")
    return d.mapInPandas(
        extract, "doc_id long, fmt string, width int, height int, channels int"
    )


@query(
    "d5_audio_features",
    oracle="""
    SELECT doc_id,
           'wav' AS fmt,
           CAST(1 AS INT) AS channels,
           CAST(8000 AS INT) AS sample_rate,
           CAST(1 + n_chars % 1000 AS BIGINT) AS n_frames,
           CAST(ROUND((1 + n_chars % 1000) * 1000.0 / 8000, 3) AS DOUBLE)
             AS duration_ms
    FROM documents
    """,
)
def d5_audio_features(spark: SparkSession, sf: str) -> DataFrame:
    """D5: REAL audio decode — per-doc WAV payloads parsed with the
    stdlib ``wave`` module inside mapInPandas; the oracle recomputes
    channel/rate/frame counts from the doc fields."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                make_wav(1 + int(nc) % 1000) for nc in pdf["n_chars"]
            ]
            meta = [decode_media(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": [m["format"] for m in meta],
                    "channels": [m["channels"] for m in meta],
                    "sample_rate": [m["sample_rate"] for m in meta],
                    "n_frames": [m["n_frames"] for m in meta],
                    "duration_ms": [
                        round(m["n_frames"] * 1000.0 / m["sample_rate"], 3)
                        for m in meta
                    ],
                }
            )

    d = load(spark, sf, "documents").select("doc_id", "n_chars")
    return d.mapInPandas(
        extract,
        "doc_id long, fmt string, channels int, sample_rate int,"
        " n_frames long, duration_ms double",
    )
