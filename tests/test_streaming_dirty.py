"""Streaming incremental indexes replayed over the HOSTILE corpus.

The replay-equals-batch grid (test_streaming.py) runs on the clean
fixture; the batch legs are dirty-green since round 9, so any
divergence here isolates NULL/extreme handling in the STREAMING legs —
the shard writers, the retry-partition plumbing, and the merged reads.

The split key is NULL-safe (COALESCE before the boundary hash): the
dirty corpus carries NULL event_ids, and a split that hashes the raw
key would silently drop those rows from every micro-batch while the
batch leg sees them — a harness bug masquerading as a pass.
"""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from dirty_corpus import make_dirty  # noqa: E402

from event_streamer_spark.operators import REGISTRY  # noqa: E402
from event_streamer_spark.tables import load  # noqa: E402

DIRTY_SEED = 20260815


@pytest.fixture(scope="module")
def dirty_sf(tmp_path_factory):
    dst = tmp_path_factory.mktemp("dirty_stream") / "sf"
    make_dirty("/root/testdata/sf0.001", str(dst), DIRTY_SEED)
    return str(dst)


def _write_splits_nullsafe(df, src: str, key: str, n_splits: int) -> None:
    b = F.pmod(
        F.crc32(
            F.concat(
                F.coalesce(F.col(key).cast("string"), F.lit("<null>")),
                F.lit("dirty"),
            )
        ),
        F.lit(n_splits),
    )
    for i in range(n_splits):
        df.filter(b == i).coalesce(1).write.parquet(src, mode="append")


def test_kmv_replay_equals_batch_on_dirty(spark, dirty_sf, tmp_path):
    from event_streamer_spark.streaming import kmv_batch, read_kmv_distinct

    batch_rows = {
        r["event_type"]: (r["sketch_size"], r["kth_min"], r["est_distinct"])
        for r in REGISTRY["d11_kmv_distinct"].fn(spark, dirty_sf).collect()
    }
    assert batch_rows

    ev = load(spark, dirty_sf, "events").select(
        "event_id", "event_type", "user_id"
    )
    src = str(tmp_path / "src")
    _write_splits_nullsafe(ev, src, "event_id", 3)
    # the NULL-keyed rows actually reached the stream input
    n_stream = spark.read.parquet(src).count()
    assert n_stream == ev.count()

    stream = (
        spark.readStream.schema(
            "event_id bigint, event_type string, user_id bigint"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    state = str(tmp_path / "state")
    q = (
        stream.writeStream.foreachBatch(kmv_batch(state))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(300)

    got = {
        r["event_type"]: (r["sketch_size"], r["kth_min"], r["est_distinct"])
        for r in read_kmv_distinct(spark, state).collect()
    }
    assert got == batch_rows


def test_heavy_hitters_replay_equals_batch_on_dirty(
    spark, dirty_sf, tmp_path
):
    """Exact heavy hitters over the dirty documents' tokens: NULL text
    must contribute nothing on either leg, duplicates must double-count
    identically."""
    from event_streamer_spark.streaming import (
        heavy_hitters_batch,
        read_heavy_hitters,
    )

    docs = load(spark, dirty_sf, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    batch_top = (
        docs.filter(F.length("tok") > 0)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(20)
        .collect()
    )

    src = str(tmp_path / "src")
    _write_splits_nullsafe(
        load(spark, dirty_sf, "documents").select("doc_id", "text"),
        src,
        "doc_id",
        3,
    )
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .select(F.explode(F.split("text", " ")).alias("tok"))
    )
    state = str(tmp_path / "state")
    q = (
        stream.writeStream.foreachBatch(heavy_hitters_batch(state))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(300)

    got = read_heavy_hitters(spark, state, k=20).collect()
    assert [(r["tok"], r["cnt"]) for r in got] == [
        (r["tok"], r["cnt"]) for r in batch_top
    ]
