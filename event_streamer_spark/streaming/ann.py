"""Incremental (streaming-ingest) IVF index — D3 streaming leg.

The batch ``d3_ivf_topk`` answers "nearest neighbors within this
corpus"; an ingest pipeline needs the ONLINE form: vectors arrive on a
stream, get assigned to their IVF cell, and become immediately
searchable. This module implements that over a parquet-backed index:

* **state** is one append-only parquet table under ``state_dir``,
  hive-partitioned by ``cell`` (and ``batch_id`` for idempotence). A
  query probing ``nprobe`` cells reads ONLY those partitions — the
  on-disk layout IS the inverted index, and partition pruning is the
  posting-list lookup. No driver memory, no single-machine index;
  compactable offline like any other table.
* **cell assignment** uses the same centroids as the batch operator
  (``operators.similarity.train_ivf_centroids`` or the seeded random
  baseline) broadcast into an Arrow UDF, so a corpus replayed through
  the stream lands in bit-identical cells.
* **retry-idempotent**: writes are partitioned by ``(cell, batch_id)``
  with dynamic partition overwrite — a re-executed micro-batch
  (standard at-least-once ``foreachBatch`` redelivery) replaces its own
  prior partitions instead of double-inserting vectors.

Query cost at any scale: rank K centroids driver-side (model state,
K×dim), then one partition-pruned scan of the probed cells + a JVM-side
cosine + ``TakeOrderedAndProject`` top-k — never a full-index scan.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streamer_spark.operators.similarity import (
    _cell_assigner,
    _cosine,
)


def ivf_ingest_batch(
    state_dir: str, centroids: np.ndarray
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: assign each arriving vector to its IVF
    cell and append it to the cell-partitioned index.

    Expects batches with ``(vec_id long, v array<double>)``.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        assigned = batch_df.withColumn(
            "cell", _cell_assigner(spark, centroids)(F.col("v"))
        ).withColumn("batch_id", F.lit(int(batch_id)))
        (
            # repartition on the partition column first: without it
            # EVERY writer task opens a file in EVERY cell directory,
            # so one micro-batch creates tasks×cells files (measured:
            # a 223-cell index ingested 10 batches in 64 s, nearly all
            # of it file-open overhead). Aligned, a cell is exactly
            # one file per batch — the index stays posting-list-shaped.
            assigned.repartition("cell")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cell", "batch_id")
            .parquet(state_dir)
        )

    return process


def ivf_probe_cells(
    centroids: np.ndarray, query_vec: Sequence[float], nprobe: int
) -> list[int]:
    """The ``nprobe`` cells whose centroids are most cosine-similar to
    the query — a K×dim driver-side computation (model state, never
    data-sized), deterministic (ties break toward the lower cell id)."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / np.linalg.norm(q)
    sims = np.round(centroids @ q, 6)
    order = np.lexsort((np.arange(len(sims)), -sims))
    return [int(c) for c in order[:nprobe]]


def ivf_query(
    spark: SparkSession,
    state_dir: str,
    centroids: np.ndarray,
    query_vec: Sequence[float],
    k: int = 3,
    nprobe: int = 2,
) -> DataFrame:
    """Top-``k`` cosine neighbors of ``query_vec`` from the ingested
    index, probing ``nprobe`` cells.

    The ``cell IN (...)`` filter is on the partition column, so the scan
    prunes to the probed cells at planning time (asserted in the tests);
    scoring is a JVM-side array expression and the top-k is a
    ``TakeOrderedAndProject`` — no full-index pass anywhere.
    """
    from event_streamer_spark.helpers import hadoop_path_exists

    if not hadoop_path_exists(spark, state_dir):
        # nothing ingested yet: a query against an empty index is a
        # valid (empty) answer, not an error
        return spark.createDataFrame(
            [], "vec_id long, cell int, sim double"
        )
    cells = ivf_probe_cells(centroids, query_vec, nprobe)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    idx = spark.read.parquet(state_dir).filter(F.col("cell").isin(cells))
    return (
        idx.withColumn("q", qlit)
        .select(
            "vec_id",
            "cell",
            F.round(_cosine("v", "q"), 6).alias("sim"),
        )
        .orderBy(F.desc("sim"), "vec_id")
        .limit(k)
    )
