"""Streaming stateful operators (SURVEY §2.C C1-C7, C9).

Each helper is a declarative transformation valid on BOTH streaming and
batch DataFrames — the batch path is what the DuckDB oracle checks
(``operators.windows``), the streaming path is exercised by
``tests/test_streaming.py`` with file sources + ``availableNow``.

Watermarks bound state: without them a windowed agg or dedup grows
state forever at 100 TB/day. Every stateful helper takes the watermark
delay explicitly.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """C4: late-data bound; enables state eviction + append-mode output."""
    return df.withWatermark(ts_col, delay)


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    watermark: Optional[str] = None,
) -> DataFrame:
    """C1: tumbling window aggregation (epoch-aligned windows)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(F.window(ts_col, duration).alias("window"), *keys).agg(*aggs)


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    watermark: Optional[str] = None,
) -> DataFrame:
    """C2: sliding window aggregation (duration/slide overlap)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.window(ts_col, duration, slide).alias("window"), *keys
    ).agg(*aggs)


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    watermark: Optional[str] = None,
) -> DataFrame:
    """C3: session window aggregation (dynamic gap-merged windows)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.groupBy(
        F.session_window(ts_col, gap).alias("session"), *keys
    ).agg(*aggs)


def stream_dedup(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: Optional[str] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """C5: streaming dedup; with a watermark the key-state is bounded
    (``dropDuplicatesWithinWatermark`` when available)."""
    if watermark and ts_col:
        df = df.withWatermark(ts_col, watermark)
        if hasattr(df, "dropDuplicatesWithinWatermark"):
            return df.dropDuplicatesWithinWatermark(list(keys))
        return df.dropDuplicates([*keys, ts_col])
    return df.dropDuplicates(list(keys))


def stream_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: Optional[str] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """D1 streaming leg: exact content dedup on a document stream.

    Same semantics as the batch ``d1_exact_dedup`` keeper-selection:
    hash the content (`sha2`, uniform 256-bit key) and keep the first
    row seen per hash. With a watermark the per-key state is evicted
    once the key is older than the delay (the at-scale configuration —
    an unbounded-state dedup is a memory leak at 100 TB/day); without
    one, state is global exact dedup over the whole stream.
    """
    hashed = docs.withColumn("content_hash", F.sha2(F.col(text_col), 256))
    return stream_dedup(hashed, ["content_hash"], ts_col, watermark)


def stream_decontaminate(
    docs: DataFrame,
    eval_grams: DataFrame,
    gram: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """D8 streaming leg: flag arriving training docs that share any
    overlapping ``gram``-token n-gram with a STATIC holdout set.

    ``eval_grams`` is the benchmark gram table (column ``g``) computed
    batch-side — benchmark-sized, so it broadcast-joins into every
    micro-batch with zero stream shuffle. The per-doc distinct +
    leak count mirror the batch ``d8_decontaminate`` exactly; the
    aggregation keys on the arriving ``doc_id`` (run the sink in
    update/complete mode).
    """
    from event_streamer_spark.operators.pipeline import explode_grams

    grams = explode_grams(docs, gram, text_col, id_col).dropDuplicates(
        [id_col, "g"]
    )
    return (
        grams.join(F.broadcast(eval_grams.select("g")), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def stream_decontaminate_bloom(
    docs: DataFrame,
    eval_grams: DataFrame,
    gram: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """D8 streaming leg, Bloom-pruned (the 100 TB configuration): same
    answer as :func:`stream_decontaminate` (Bloom filters have no false
    negatives; the broadcast gram join removes false positives), but
    arriving grams are rejected by the broadcast 32 KiB bitmap BEFORE
    the per-doc ``dropDuplicates`` — so the dedup STATE STORE holds only
    colliding grams plus the ~α sliver, instead of every (doc, gram)
    the stream has ever seen. On an unbounded stream that is the
    difference between sketch-sized and corpus-sized state.
    """
    from event_streamer_spark.bloom import bloom_bitmap, bloom_might_contain
    from event_streamer_spark.operators.pipeline import explode_grams

    grams = explode_grams(docs, gram, text_col, id_col)
    bitmap = bloom_bitmap(eval_grams.select("g"))
    pruned = (
        grams.crossJoin(F.broadcast(bitmap))
        .filter(bloom_might_contain())
        .drop("bloom")
        .dropDuplicates([id_col, "g"])
    )
    return (
        pruned.join(F.broadcast(eval_grams.select("g")), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


def stream_static_join(
    stream: DataFrame, static: DataFrame, on, how: str = "inner", broadcast: bool = True
) -> DataFrame:
    """C6: stream ⋈ static dim — broadcast by default so each micro-batch
    joins map-side with zero shuffle of the stream."""
    if broadcast:
        static = F.broadcast(static)
    return stream.join(static, on, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on,
    left_ts: str,
    right_ts: str,
    watermark: str,
    how: str = "inner",
) -> DataFrame:
    """C7: stream ⋈ stream — both sides watermarked so join state is
    evictable; ``on`` should include an event-time range condition."""
    return left.withWatermark(left_ts, watermark).join(
        right.withWatermark(right_ts, watermark), on, how
    )
