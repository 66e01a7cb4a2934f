"""Incremental (streaming-ingest) entity resolution — D18 streaming leg.

The batch ``d18_er_blocked_match`` answers "which record pairs in this
corpus link"; an ingest pipeline needs the ONLINE form: records from
either source arrive over time, each arrival must link against
everything already ingested (and against its own micro-batch), and the
blocked index grows as arrivals fold in. Same durable-index shape as
``streaming.dedup.exact_dedup_batch`` / ``streaming.integrity``:

* **state** is one append-only parquet table under ``state_dir``: the
  multi-pass blocked key rows (rec_id, src, f1, f2, f3, pass, bkey) —
  a plain distributed table, no driver memory, compactable offline
  (``streaming.dedup.compact_state``).
* each micro-batch: key the arrivals with THE SAME blocking rule as
  batch (``operators.er.blocking_keys``), score candidates with THE
  SAME match rule (``operators.er.score_pairs``), then fold the
  arrivals' keyed rows into the index.
* **once-per-pair**: every emitted pair involves at least one arriving
  record, and the two join terms are disjoint by construction —
  (arriving-A x (prior ∪ arriving)-B) covers every pair whose A side
  is new, (prior-A x arriving-B) covers pairs whose A side is old —
  so no pair can be emitted twice across batches; replaying the corpus
  through ANY batch split yields exactly the batch operator's pairs
  (asserted under the boundary grid by
  ``tests/test_streaming.py::test_incremental_er_matches_batch``).
* **retry-idempotent**: writes partition by ``batch_id`` with dynamic
  partition overwrite and reads exclude the current batch's partition
  (redelivered micro-batches replace their own prior output), same as
  every durable index in this package.

Shuffle volume per batch: O(batch x passes) keyed rows joined against
the index pruned by block-key hash — never O(corpus x corpus), and the
index join key (8 hex chars x pass) is uniform, so no hot reducer.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_streamer_spark.helpers import hadoop_path_exists
from event_streamer_spark.operators.er import (
    _THRESHOLD,
    blocking_keys,
    score_pairs,
)
from event_streamer_spark.streaming.dedup import (
    _migrate_legacy_state,
    _write_batch_partition,
)

_KEY_COLS = ["rec_id", "src", "f1", "f2", "f3", "pass", "bkey"]


def er_link_batch(
    state_dir: str, emit_dir: str
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: link arriving records (rec_id, src, f1,
    f2, f3) against the durable blocked index, emit scored matches at
    or above the batch threshold to ``emit_dir``, fold arrivals into
    ``state_dir``."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        for sub in (state_dir, emit_dir):
            _migrate_legacy_state(spark, sub)
        # both join terms and the fold read the arrivals' keyed rows,
        # and both terms read the GROWING index — persist each once
        # (the multiply-referenced-frame rule; unpersisted, the write
        # job scans the whole state parquet twice per micro-batch)
        keyed_new = blocking_keys(batch_df).persist()
        prior = None
        try:
            if hadoop_path_exists(spark, state_dir):
                prior = (
                    spark.read.parquet(state_dir)
                    .filter(F.col("batch_id") != int(batch_id))
                    .select(*_KEY_COLS)
                    .persist()
                )
                b_all = prior.unionByName(keyed_new)
                matches = score_pairs(keyed_new, b_all).unionByName(
                    score_pairs(prior, keyed_new)
                )
            else:
                matches = score_pairs(keyed_new, keyed_new)
            matches = matches.filter(F.col("score") >= _THRESHOLD)
            _write_batch_partition(matches, batch_id, emit_dir)
            _write_batch_partition(keyed_new, batch_id, state_dir)
        finally:
            keyed_new.unpersist()
            if prior is not None:
                prior.unpersist()

    return process


_MATCH_SCHEMA = (
    "rec_a bigint, rec_b bigint, f1_dist bigint, score bigint,"
    " batch_id int"
)


def read_er_matches(spark, emit_dir: str) -> DataFrame:
    """The accumulated match table (rec_a, rec_b, f1_dist, score) —
    the streaming counterpart of ``d18_er_blocked_match``'s output.
    Explicit schema + existence guard (the ``read_fk_orphans``
    convention): a not-yet-started monitor, or a stream whose batches
    have emitted no matches yet (e.g. only source-A records so far —
    footerless empty partitions), reads as ZERO rows, not an
    UNABLE_TO_INFER_SCHEMA crash."""
    cols = ["rec_a", "rec_b", "f1_dist", "score"]
    if not hadoop_path_exists(spark, emit_dir):
        return spark.createDataFrame([], _MATCH_SCHEMA).select(*cols)
    return (
        spark.read.schema(_MATCH_SCHEMA).parquet(emit_dir).select(*cols)
    )
