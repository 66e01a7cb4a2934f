"""Multimodal columns (SURVEY §2.C D5): binary payload + typed metadata.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode/feature-extract run as Arrow-batched ``mapInPandas``.

The decode step is REAL for the formats the stdlib can parse —
PNG / GIF / BMP / JPEG header decode (``struct`` + byte scanning) and
WAV via the ``wave`` module; :func:`decode_media` sniffs the magic
bytes and dispatches. Pixel-level decode of compressed formats (and all
video) still needs PIL/opencv/ffmpeg, which aren't in this container —
those payloads come back ``format='unknown'`` with null dims. A
production deployment injects codec-backed decoders via the pluggable
codec hooks (``codecs=[...]`` argument or :func:`register_media_codec`
/ :func:`register_pixel_codec`) without touching the Spark plumbing.

Scale: binary payloads ride in parquet alongside metadata; decode is a
narrow map stage (no shuffle), and metadata-only queries never touch
the payload bytes thanks to parquet column pruning.
"""

from __future__ import annotations

import struct
import zlib
from typing import Callable, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

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


# -- pluggable codecs --------------------------------------------------
#
# A MediaCodec maps raw bytes → the decode_media metadata dict (or None
# to decline the payload); a PixelCodec maps raw bytes → (width, height,
# RGB scanlines) (or None to decline). Injected codecs are tried FIRST,
# in registration/argument order, so a PIL/ffmpeg-backed deployment
# extends coverage to JPEG/Opus/video without touching the Spark
# plumbing; the stdlib PNG/GIF/BMP/JPEG-header/WAV paths stay as the
# fallback. Cluster note: pass ``codecs=[...]`` explicitly at the call
# site inside your mapInPandas closure so the callable pickles to
# executors; the module-level registry mutated via
# :func:`register_media_codec` lives in the driver process and only
# reaches workers that import a module performing the registration
# (ship it with --py-files) or in local mode.

MediaCodec = Callable[[bytes], Optional[dict]]
PixelCodec = Callable[[bytes], "Optional[tuple[int, int, list[list[int]]]]"]

_MEDIA_CODECS: list[MediaCodec] = []
_PIXEL_CODECS: list[PixelCodec] = []


def register_media_codec(codec: MediaCodec) -> None:
    """Register a metadata codec tried before the stdlib sniffers."""
    _MEDIA_CODECS.append(codec)


def register_pixel_codec(codec: PixelCodec) -> None:
    """Register a pixel codec tried before the stdlib PNG inflater."""
    _PIXEL_CODECS.append(codec)


def clear_registered_codecs() -> None:
    """Remove all registered codecs (test/teardown helper)."""
    _MEDIA_CODECS.clear()
    _PIXEL_CODECS.clear()


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


def make_wav(
    n_frames: int, sample_rate: int = 8000, pattern: bool = False
) -> bytes:
    """Minimal mono 16-bit PCM WAV (stdlib ``wave``) — fixture maker.

    ``pattern=True`` writes frame j = ``(j*31) % 4096`` instead of
    silence, so sample-level reads are verifiable."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        if pattern:
            w.writeframes(
                b"".join(
                    struct.pack("<h", (j * 31) % 4096) for j in range(n_frames)
                )
            )
        else:
            w.writeframes(b"\x00\x00" * n_frames)
    return buf.getvalue()


def decode_media(
    payload: Optional[bytes], codecs: Optional[list[MediaCodec]] = None
) -> dict:
    """Sniff + header-decode a media payload (REAL stdlib parse, plus
    injectable codecs).

    Injected ``codecs`` (argument, else the module registry) are tried
    first — the first one returning a non-None dict wins, with its keys
    merged over the null template — so JPEG-pixel/Opus/video decoders
    plug in where the libraries exist. Stdlib fallback: PNG (IHDR), GIF
    (logical screen), BMP (BITMAPINFOHEADER), JPEG (SOF0/1/2 scan) →
    width/height/channels; RIFF-WAVE (``wave``) →
    channels/sample_rate/n_frames. Anything else → ``format='unknown'``
    with null fields.
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
    for codec in _MEDIA_CODECS if codecs is None else codecs:
        try:
            decoded = codec(payload)
        except Exception:  # noqa: BLE001 — a codec declining ≠ corrupt
            decoded = None
        if decoded is not None:
            out.update(decoded)
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
            from event_streamer_spark.operators.multimodal_gif import (
                count_gif_frames,
            )

            w, h = struct.unpack("<HH", payload[6:10])
            try:
                nf = count_gif_frames(payload)
            except Exception:  # noqa: BLE001 — truncated block structure
                nf = None
            out.update(
                format="gif", width=w, height=h, channels=3, n_frames=nf
            )
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
    FROM documents WHERE n_chars >= 0
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

    d = (
        load(spark, sf, "documents")
        # NULL n_chars has no synthesizable payload (round-9 dirty
        # corpus), and NEGATIVE n_chars is outside the synthesizer's
        # domain too (round-10 hostile_media_fields: Python % is pmod,
        # SQL % keeps the dividend sign — dims would diverge); the
        # oracle carries the same n_chars >= 0 WHERE
        .filter(F.col("n_chars") >= 0)
        .select("doc_id", "n_chars")
    )
    return d.mapInPandas(
        extract, "doc_id long, fmt string, width int, height int, channels int"
    )


def decode_png_pixels(
    payload: bytes, codecs: Optional[list[PixelCodec]] = None
) -> tuple[int, int, list[list[int]]]:
    """REAL pixel decode for filter-0 8-bit RGB PNGs (the class
    :func:`make_png` emits): zlib-inflate IDAT, strip the per-scanline
    filter byte, return (width, height, rows of RGB bytes).

    Injected ``codecs`` (argument, else the module registry) are tried
    first; the first non-None (width, height, rows) wins — this is how
    JPEG/filtered-PNG pixel paths work where PIL/opencv exist. With no
    codec claiming the payload, raises ``NotImplementedError`` for
    non-PNG input or PNGs using other filters/bit depths."""
    for codec in _PIXEL_CODECS if codecs is None else codecs:
        try:
            decoded = codec(payload)
        except Exception:  # noqa: BLE001 — a codec declining ≠ corrupt
            decoded = None
        if decoded is not None:
            return decoded
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise NotImplementedError("not a PNG")
    # Same error contract as decode_bmp/decode_gif (round-10 hostile
    # payload fuzz): structurally corrupt input raises
    # ``ValueError('truncated/corrupt PNG')``, UNSUPPORTED-but-valid
    # variants raise ``NotImplementedError`` — never a raw
    # struct.error / zlib.error / IndexError out of a byte slice.
    pos, idat = 8, b""
    width = height = None
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        if pos + 8 + length > len(payload):
            raise ValueError("truncated PNG chunk body")
        data = payload[pos + 8 : pos + 8 + length]
        if typ == b"IHDR":
            if len(data) < 10:
                raise ValueError("truncated IHDR")
            width, height, depth, color = struct.unpack(">IIBB", data[:10])
            if (depth, color) != (8, 2):
                raise NotImplementedError("only 8-bit RGB supported")
        elif typ == b"IDAT":
            idat += data
        pos += 12 + length
    if width is None:
        raise ValueError("PNG without IHDR")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT: {exc}") from exc
    stride = 1 + width * 3
    if len(raw) < stride * height:
        raise ValueError("PNG pixel data shorter than dimensions")
    rows = []
    for y in range(height):
        line = raw[y * stride : (y + 1) * stride]
        if line[0] != 0:
            raise NotImplementedError("only filter 0 supported")
        rows.append(list(line[1:]))
    return width, height, rows


def resize_nearest(rows: list[list[int]], w: int, h: int, ow: int, oh: int):
    """Nearest-neighbor RGB resize on decoded scanlines (pure python)."""
    out = []
    for oy in range(oh):
        sy = min(h - 1, (oy * h) // oh)
        line = []
        for ox in range(ow):
            sx = min(w - 1, (ox * w) // ow)
            line.extend(rows[sy][sx * 3 : sx * 3 + 3])
        out.append(line)
    return out


@query(
    "d5_image_resize",
    oracle="""
    SELECT doc_id,
           CAST((1 + n_chars % 64 + 1) // 2 AS INT) AS out_width,
           CAST((1 + doc_id % 48 + 1) // 2 AS INT) AS out_height,
           CAST(10 + doc_id % 200 AS BIGINT) AS mean_pixel
    FROM documents WHERE n_chars >= 0
    """,
)
def d5_image_resize(spark: SparkSession, sf: str) -> DataFrame:
    """D5: REAL image resize via mapInPandas — decode the PNG payload's
    PIXELS (zlib inflate + filter strip), nearest-neighbor downsample to
    half dimensions, re-encode as PNG, then re-decode the result to
    report its dims and mean pixel value. The fixture is a uniform-gray
    image, so a correct resize preserves the mean exactly (gray =
    10 + doc_id % 200, recomputed by the oracle); any pixel-path bug
    breaks the hash. Compressed-format payloads raise
    ``NotImplementedError`` in :func:`decode_png_pixels` — the plumbing
    (schema, Arrow batching, partitioning) is identical either way.
    Narrow map stage, no shuffle — resize at 100 TB is scan-bound.
    """

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_w_l, out_h_l, mean_l, ids = [], [], [], []
        for pdf in batches:
            for did, nc in zip(pdf["doc_id"], pdf["n_chars"]):
                w, h = 1 + int(nc) % 64, 1 + int(did) % 48
                gray = 10 + int(did) % 200
                payload = make_png(w, h, gray)
                dw, dh, rows = decode_png_pixels(payload)
                ow, oh = (dw + 1) // 2, (dh + 1) // 2
                resized = resize_nearest(rows, dw, dh, ow, oh)
                # re-encode and re-decode: proves the round trip
                reenc = (
                    b"\x89PNG\r\n\x1a\n"
                    + _png_chunk(
                        b"IHDR", struct.pack(">IIBBBBB", ow, oh, 8, 2, 0, 0, 0)
                    )
                    + _png_chunk(
                        b"IDAT",
                        zlib.compress(
                            b"".join(b"\x00" + bytes(r) for r in resized)
                        ),
                    )
                    + _png_chunk(b"IEND", b"")
                )
                rw, rh, rrows = decode_png_pixels(reenc)
                flat = [v for r in rrows for v in r]
                ids.append(int(did))
                out_w_l.append(rw)
                out_h_l.append(rh)
                mean_l.append(sum(flat) // len(flat))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "out_width": out_w_l,
                    "out_height": out_h_l,
                    "mean_pixel": mean_l,
                }
            )
            out_w_l, out_h_l, mean_l, ids = [], [], [], []

    d = (
        load(spark, sf, "documents")
        # NULL n_chars has no synthesizable payload (round-9 dirty
        # corpus), and NEGATIVE n_chars is outside the synthesizer's
        # domain too (round-10 hostile_media_fields: Python % is pmod,
        # SQL % keeps the dividend sign — dims would diverge); the
        # oracle carries the same n_chars >= 0 WHERE
        .filter(F.col("n_chars") >= 0)
        .select("doc_id", "n_chars")
    )
    return d.mapInPandas(
        do_resize,
        "doc_id long, out_width int, out_height int, mean_pixel long",
    )


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


@query(
    "d5_frame_sample",
    oracle="""
    WITH t AS (
      SELECT doc_id, 1 + n_chars % 1000 AS n FROM documents
      WHERE n_chars >= 0)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_frames,
           list_transform(range(0, LEAST(n, 8)),
                          i -> CAST(i * n // 8 AS BIGINT)) AS offsets,
           list_transform(range(0, LEAST(n, 8)),
                          i -> CAST((i * n // 8 * 31) % 4096 AS BIGINT))
             AS samples
    FROM t
    """,
)
def d5_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """D5: REAL frame sampling — the video-keyframe pattern on the
    format the stdlib can actually decode (PCM WAV): seek to 8 evenly
    spaced frame offsets and read each frame's sample value with
    ``wave``. The fixture writes frame j = (j·31) % 4096, so the oracle
    recomputes every sampled value from first principles — a seek or
    endianness bug breaks the hash. For codec-bound media (video), the
    same mapInPandas plumbing applies with a codec-backed reader.
    """
    import io
    import wave

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nfr, offs, vals = [], [], [], []
            for did, nc in zip(pdf["doc_id"], pdf["n_chars"]):
                n = 1 + int(nc) % 1000
                payload = make_wav(n, pattern=True)
                with wave.open(io.BytesIO(payload), "rb") as w:
                    k = min(n, 8)
                    o = [i * n // 8 for i in range(k)]
                    v = []
                    for off in o:
                        w.setpos(off)
                        (s,) = struct.unpack("<h", w.readframes(1))
                        v.append(s)
                ids.append(int(did))
                nfr.append(n)
                offs.append(o)
                vals.append(v)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_frames": nfr,
                    "offsets": offs,
                    "samples": vals,
                }
            )

    d = (
        load(spark, sf, "documents")
        # NULL n_chars has no synthesizable payload (round-9 dirty
        # corpus), and NEGATIVE n_chars is outside the synthesizer's
        # domain too (round-10 hostile_media_fields: Python % is pmod,
        # SQL % keeps the dividend sign — dims would diverge); the
        # oracle carries the same n_chars >= 0 WHERE
        .filter(F.col("n_chars") >= 0)
        .select("doc_id", "n_chars")
    )
    return d.mapInPandas(
        sample,
        "doc_id long, n_frames long, offsets array<long>, samples array<long>",
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
    FROM documents WHERE n_chars >= 0
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

    d = (
        load(spark, sf, "documents")
        # NULL n_chars has no synthesizable payload (round-9 dirty
        # corpus), and NEGATIVE n_chars is outside the synthesizer's
        # domain too (round-10 hostile_media_fields: Python % is pmod,
        # SQL % keeps the dividend sign — dims would diverge); the
        # oracle carries the same n_chars >= 0 WHERE
        .filter(F.col("n_chars") >= 0)
        .select("doc_id", "n_chars")
    )
    return d.mapInPandas(
        extract,
        "doc_id long, fmt string, channels int, sample_rate int,"
        " n_frames long, duration_ms double",
    )


def ahash_64(payload: bytes, codecs: Optional[list[PixelCodec]] = None) -> str:
    """64-bit average-hash (aHash) perceptual fingerprint of an image
    payload: decode pixels, grayscale, 2×2 mean-pool to an 8×8 grid,
    threshold at the global mean — the standard cheap perceptual hash
    (pHash family). Small uniform brightness shifts don't move any bit
    (every cell and the mean shift together), which is exactly the
    near-duplicate invariance the dedup below relies on."""
    import numpy as np

    w, h, rows = decode_png_pixels(payload, codecs)
    px = np.asarray(rows, dtype=np.int64).reshape(h, w, 3)
    gray = px.sum(axis=2) // 3
    sx, sy = max(1, w // 8), max(1, h // 8)
    # clamp-pad so partial edge cells reuse the last row/col (identical
    # to the scalar min(h-1, ...) indexing this replaces)
    yy = np.minimum(np.arange(8 * sy), h - 1)
    xx = np.minimum(np.arange(8 * sx), w - 1)
    g = gray[np.ix_(yy, xx)]
    cells = g.reshape(8, sy, 8, sx).sum(axis=(1, 3)) // (sx * sy)
    if cells.max() == cells.min():
        # a uniform image has no pattern bits — every solid color would
        # otherwise collapse to hash 0 and dedup unrelated solids
        # against each other. Quantize the level coarsely (//16) so the
        # small-brightness-shift invariance still holds for solids.
        return f"uniform-{int(cells[0, 0]) // 16:02x}"
    m = cells.mean()
    bits = int(
        ((cells > m).reshape(-1) << np.arange(64, dtype=np.uint64)).sum()
    )
    return f"{bits:016x}"


def make_patterned_png(
    doc_id: int, pattern: Optional[int] = None, offset: Optional[int] = None
) -> bytes:
    """The phash-dedup fixture image: a 16×16 PNG whose 8×8 cell
    pattern is a fixed pseudo-random function of ``doc_id % 10`` with a
    per-doc brightness offset (``doc_id % 3``) — ten groups of
    perceptual near-duplicates that are NOT byte-identical. Explicit
    ``pattern``/``offset`` override the doc_id derivation so tests pin
    the invariances on THIS generator, not a private copy."""
    p = doc_id % 10 if pattern is None else pattern
    noise = doc_id % 3 if offset is None else offset
    rows = []
    for y in range(16):
        line = []
        for x in range(16):
            bit = ((x // 2 + 2 * (y // 2) + p) * 2654435761 >> 4) & 1
            g = (200 if bit else 40) + noise
            line += [g, g, g]
        rows.append(bytes(line))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 16, 16, 8, 2, 0, 0, 0))
        + _png_chunk(
            b"IDAT", zlib.compress(b"".join(b"\x00" + r for r in rows))
        )
        + _png_chunk(b"IEND", b"")
    )


def ahash_udf():
    """``pandas_udf`` computing :func:`ahash_64` over a BINARY image
    column — the hash expression the durable streaming dedup index
    (`streaming.dedup.exact_dedup_batch(hash_expr=...)`) plugs in for
    perceptual image dedup."""

    @pandas_udf("string")
    def _ahash(payloads: pd.Series) -> pd.Series:
        return pd.Series([ahash_64(bytes(b)) for b in payloads])

    return _ahash


@query(
    "d5_image_phash_dedup",
    oracle="""
    SELECT doc_id,
           MIN(doc_id) OVER (PARTITION BY doc_id % 10) AS keeper,
           doc_id <> MIN(doc_id) OVER (PARTITION BY doc_id % 10) AS is_dup
    FROM documents
    """,
)
def d5_image_phash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """D5×D2: perceptual-hash image deduplication — the cross-modal
    near-dup pass a multimodal corpus needs (byte-level D1 dedup misses
    re-encoded/brightness-shifted copies; aHash buckets them).

    Fixture: each doc renders a 16×16 patterned PNG whose 8×8 cell
    pattern is a fixed pseudo-random function of ``doc_id % 10`` plus a
    per-doc brightness offset (``doc_id % 3``) — ten groups of
    perceptual near-duplicates that are NOT byte-identical. The real
    pipeline runs end-to-end: PNG encode → REAL pixel decode →
    grayscale → mean-pool → threshold; the oracle recomputes the
    designed grouping from first principles (keeper = min doc_id per
    pattern), so any bug in the decode/hash path scrambles groups and
    breaks the hash match.

    Scale: hashing is a narrow Arrow-batched map; grouping shuffles
    64-bit fingerprints (uniform key), keeper is min-per-group — the
    same shape as d1_exact_dedup, at 8 bytes per image instead of the
    image.
    """

    def hash_images(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phash": [
                        ahash_64(make_patterned_png(int(d)))
                        for d in pdf["doc_id"]
                    ],
                }
            )

    from event_streamer_spark.caching import bounded_persist

    hashed = bounded_persist(
        load(spark, sf, "documents")
        .select("doc_id")
        .mapInPandas(hash_images, "doc_id long, phash string"),
        "d5_phash_hashed",
    )  # the render+decode+hash pass is the whole cost — run it once,
    # not once per join side
    keepers = hashed.groupBy("phash").agg(F.min("doc_id").alias("keeper"))
    return (
        hashed.join(keepers, "phash")
        .select(
            "doc_id",
            "keeper",
            (F.col("doc_id") != F.col("keeper")).alias("is_dup"),
        )
    )


def make_patterned_wav(doc_id: int) -> bytes:
    """The audio-dedup fixture: mono 16-bit WAV whose waveform is the
    standard pattern for ``n = 200 + (doc_id % 8) * 50`` frames plus a
    per-doc DC offset (``doc_id % 5``) — eight groups of perceptual
    near-duplicates (same signal, shifted "recording level") that are
    NOT byte-identical."""
    import io
    import wave

    n = 200 + (doc_id % 8) * 50
    dc = doc_id % 5
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(
            b"".join(
                struct.pack("<h", (j * 31) % 4096 + dc) for j in range(n)
            )
        )
    return buf.getvalue()


def audio_fingerprint(payload: bytes) -> str:
    """DC-offset-invariant audio fingerprint: decode PCM via the stdlib
    ``wave`` module, subtract the mean (removes any constant level
    shift EXACTLY), and hash the integer-quantized per-window energy
    profile (8 windows) plus the frame count. Same role as the image
    aHash: recordings differing only by a constant level collide; a
    different waveform or length does not."""
    import hashlib
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        n = w.getnframes()
        pcm = np.frombuffer(w.readframes(n), dtype="<i2").astype(np.float64)
    pcm = pcm - pcm.mean()
    bounds = np.linspace(0, len(pcm), 9).astype(int)
    profile = [
        int(round((pcm[bounds[i] : bounds[i + 1]] ** 2).mean()))
        for i in range(8)
    ]
    key = f"{n}|" + ",".join(map(str, profile))
    return hashlib.md5(key.encode()).hexdigest()[:16]


@query(
    "d5_audio_fingerprint_dedup",
    oracle="""
    SELECT doc_id,
           MIN(doc_id) OVER (PARTITION BY doc_id % 8) AS keeper,
           doc_id <> MIN(doc_id) OVER (PARTITION BY doc_id % 8) AS is_dup
    FROM documents
    """,
)
def d5_audio_fingerprint_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """D5×D2: audio near-duplicate detection — the audio counterpart of
    `d5_image_phash_dedup`: recordings that differ only by a constant
    level shift (re-digitized/re-normalized copies) group together via
    a mean-subtracted energy-profile fingerprint over REAL ``wave``
    decode; byte-level dedup sees them as distinct.

    Fixture: eight groups (waveform length keyed by ``doc_id % 8``)
    with a per-doc DC offset; the oracle recomputes the designed
    grouping, so any decode/fingerprint bug scrambles groups and fails
    the hash gate. Scale shape identical to the image path: narrow
    Arrow-batched hashing, 16-byte fingerprints through the shuffle,
    min-per-group keeper.
    """
    from event_streamer_spark.caching import bounded_persist

    def hash_audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "afp": [
                        audio_fingerprint(make_patterned_wav(int(d)))
                        for d in pdf["doc_id"]
                    ],
                }
            )

    hashed = bounded_persist(
        load(spark, sf, "documents")
        .select("doc_id")
        .mapInPandas(hash_audio, "doc_id long, afp string"),
        "d5_afp_hashed",
    )
    keepers = hashed.groupBy("afp").agg(F.min("doc_id").alias("keeper"))
    return hashed.join(keepers, "afp").select(
        "doc_id",
        "keeper",
        (F.col("doc_id") != F.col("keeper")).alias("is_dup"),
    )


# -- BMP: the third REAL pixel codec (PNG, GIF, now BMP) ---------------
#
# 24-bit uncompressed BITMAPINFOHEADER BMPs: rows stored BOTTOM-UP and
# padded to 4-byte boundaries — the two quirks a fake decoder would
# skip and a real corpus would punish.


def make_patterned_bmp(doc_id: int) -> bytes:
    """Fixture BMP: 24-bit, ``(8 + doc_id % 5) × (6 + doc_id % 4)`` so
    the row stride's 4-byte padding varies per doc; pixel gray is the
    arithmetic pattern ``(x·7 + y·11 + doc_id) % 256`` on all three
    channels (the DuckDB oracle recomputes sums from this formula)."""
    w, h = 8 + doc_id % 5, 6 + doc_id % 4
    stride = (3 * w + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up storage order
        line = bytearray()
        for x in range(w):
            g = (x * 7 + y * 11 + doc_id) % 256
            line += bytes((g, g, g))  # BGR, equal channels
        line += b"\x00" * (stride - 3 * w)
        rows.append(bytes(line))
    pixel_data = b"".join(rows)
    header_size = 14 + 40
    file_header = struct.pack(
        "<2sIHHI", b"BM", header_size + len(pixel_data), 0, 0, header_size
    )
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    return file_header + info_header + pixel_data


def decode_bmp(payload: bytes) -> dict:
    """REAL 24-bit BMP decode: ``{width, height, pixel_sum}`` where
    ``pixel_sum`` is the sum of all channel bytes in TOP-DOWN pixel
    order with the row padding stripped. Raises
    ``ValueError('truncated BMP')`` on any out-of-bounds read and
    ``ValueError`` on unsupported variants (compression, bpp≠24) —
    the same error contract as the GIF decoder."""
    if len(payload) < 54:
        raise ValueError("truncated BMP")
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    bi_size = struct.unpack_from("<I", payload, 14)[0]
    if bi_size < 40:
        raise ValueError(f"unsupported BMP header size {bi_size}")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant bpp={bpp} comp={comp}")
    if w <= 0 or h == 0:
        raise ValueError("unsupported BMP dimensions")
    top_down = h < 0
    h = abs(h)
    stride = (3 * w + 3) & ~3
    if data_off + stride * h > len(payload):
        raise ValueError("truncated BMP")
    total = 0
    for row in range(h):
        stored = row if top_down else h - 1 - row
        base = data_off + stored * stride
        total += sum(payload[base:base + 3 * w])
    return {"width": w, "height": h, "pixel_sum": total}


@query(
    "d5_bmp_pixels",
    oracle="""
    SELECT doc_id,
           CAST(8 + doc_id % 5 AS BIGINT) AS width,
           CAST(6 + doc_id % 4 AS BIGINT) AS height,
           CAST(3 * list_sum(list_transform(
                  range(0, (8 + doc_id % 5) * (6 + doc_id % 4)),
                  p -> ((p % (8 + doc_id % 5)) * 7
                        + (p // (8 + doc_id % 5)) * 11 + doc_id) % 256))
             AS BIGINT) AS pixel_sum
    FROM documents
    """,
)
def d5_bmp_pixels(spark: SparkSession, sf: str) -> DataFrame:
    """D5: real BMP pixel statistics with payload bytes flowing
    through the decoder — encode stage writes a BINARY column, decode
    stage parses THOSE bytes (bottom-up row order, 4-byte stride
    padding), so a payload-side corruption breaks the oracle rather
    than a fixture shortcut hiding it (the round-7 GIF lesson). The
    oracle recomputes each doc's channel sum from the pattern formula
    from first principles.

    Scale: two narrow Arrow-batched map stages, no shuffle at all —
    the decode-heavy pipeline shape where Spark's job is pure
    partition parallelism.
    """

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        make_patterned_bmp(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_bmp(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "pixel_sum": [d["pixel_sum"] for d in decoded],
                }
            )

    return (
        load(spark, sf, "documents")
        .select("doc_id")
        .mapInPandas(encode, "doc_id long, payload binary")
        .mapInPandas(
            decode, "doc_id long, width long, height long, pixel_sum long"
        )
    )
