"""Streaming state-store scale probe (VERDICT r8 #7).

The incremental indexes append one ``batch_id=<n>`` parquet partition
per micro-batch, and their READ path unions every shard — correct at
any shard count (replay-equals-batch is tested), but each partition is
another directory listing + footer read, the state-table version of the
small-files problem. This probe MEASURES the read-path cost as shards
accumulate (KMV distinct + count-min merge), then runs
``compact_state`` and re-measures, so the compaction threshold in the
docs is a number, not a guess.

Usage::

    python scripts/state_scale_probe.py [n_batches] [rows_per_batch]

Prints one JSON line: read-path seconds at shard-count checkpoints,
compaction time, and post-compaction read seconds.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _mk_batch(spark, batch_id: int, rows: int):
    """An events-shaped micro-batch: (event_type, user_id) for the KMV
    shard, plus a token column for count-min."""
    from pyspark.sql import functions as F

    return spark.range(rows).select(
        F.concat(F.lit("type_"), (F.col("id") % 7).cast("string")).alias(
            "event_type"
        ),
        ((F.col("id") * 37 + batch_id * 101) % 5000).alias("user_id"),
        F.concat(
            F.lit("tok"),
            ((F.col("id") * 13 + batch_id) % 500).cast("string"),
        ).alias("tok"),
    )


def run_probe(spark, n_batches: int = 100, rows: int = 200) -> dict:
    from event_streamer_spark.streaming.dedup import (
        compact_state,
        count_min_batch,
        kmv_batch,
        read_count_min,
        read_kmv_distinct,
    )

    root = tempfile.mkdtemp(prefix="state_probe_")
    kmv_dir = os.path.join(root, "kmv")
    cm_dir = os.path.join(root, "cm")
    kmv_fn = kmv_batch(kmv_dir)
    cm_fn = count_min_batch(cm_dir)

    def _read_secs() -> dict:
        t0 = time.time()
        read_kmv_distinct(spark, kmv_dir).collect()
        kmv_s = time.time() - t0
        t0 = time.time()
        read_count_min(spark, cm_dir).collect()
        cm_s = time.time() - t0
        return {"kmv_sec": round(kmv_s, 3), "cm_sec": round(cm_s, 3)}

    checkpoints = sorted(
        {10, 25, 50, n_batches} & set(range(1, n_batches + 1))
    )
    curve = {}
    for b in range(n_batches):
        df = _mk_batch(spark, b, rows)
        kmv_fn(df, b)
        cm_fn(df, b)
        if (b + 1) in checkpoints:
            curve[b + 1] = _read_secs()

    t0 = time.time()
    folded_kmv = compact_state(spark, kmv_dir)
    folded_cm = compact_state(spark, cm_dir)
    compact_s = time.time() - t0
    after = _read_secs()
    out = {
        "n_batches": n_batches,
        "rows_per_batch": rows,
        "read_curve": curve,
        "compact_sec": round(compact_s, 3),
        "folded": {"kmv": folded_kmv, "cm": folded_cm},
        "read_after_compact": after,
    }
    shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> int:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from event_streamer_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark("state-probe", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run_probe(spark, n, rows)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
