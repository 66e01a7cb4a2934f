"""D7 streaming leg: incremental DSIR importance scoring.

The batch ``d7_dsir_resample`` (``operators/corpus.py``) is
``dsir_doc_token_counts`` → ``dsir_score_from_counts``; the per-doc
token counts are the natural incremental state (counts never change
once a document is ingested — only the CORPUS-level vocabulary tables
they feed do, and those are SUMs over the shards). Each micro-batch
appends its arriving documents' (doc_id, source, is_target, tok, k)
rows; the read side re-derives the vocabulary tables by summation and
runs the batch operator's own scoring tail, so the live scores equal
the batch query over the union of all ingested batches EXACTLY —
including the rank column, because scoring is a pure function of the
merged counts.

This is the online form a training-data pipeline needs: DSIR scores
drift as the corpus grows (every arrival shifts P_corpus), so scores
are computed AT READ against the current index — the per-batch work is
one tokenize+count over the arriving shard (no rescan of history), and
the read-side cost is vocabulary-sized, not corpus-scan-sized.

Contracts (the incremental-index family's):

* **idempotent retries** — every write is partitioned by ``batch_id``
  with dynamic partition overwrite (``_write_batch_partition``), so an
  at-least-once ``foreachBatch`` redelivery replaces its own prior
  partial output.
* **cross-batch duplicate doc_ids** are resolved FIRST-WRITER-WINS at
  read (min batch_id per doc_id): an identical re-sent document counts
  once — equal to the batch canonicalization, which also keeps one
  copy — while CONFLICTING texts under one id across batches are out
  of the declared domain (the ingest precondition is post-exact-dedup
  documents, the d1-span / CDC precedent; batch resolves those
  min-text, a rule the index cannot replay without storing full text).
* **same-batch duplicate doc_ids** (an at-least-once source that
  redelivers WITHIN one trigger) are canonicalized before counting
  with the batch operator's own rule (``canonicalize_docs`` — min
  (text, lang, source) per id), so k is never double-counted and
  replay-equals-batch holds without relying on the cross-batch
  first-writer-wins read.
* **state size** is distinct (doc, token) pairs — the corpus's token
  index, parquet-append, compactable offline like the LSH ``sigs/``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_streamer_spark.streaming.dedup import (
    _migrate_legacy_state,
    _write_batch_partition,
)

_SCHEMA = (
    "doc_id bigint, source string, is_target boolean, tok string, "
    "k bigint, batch_id int"
)


def dsir_tokens_batch(state_dir: str) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: append this micro-batch's per-document
    token counts (``dsir_doc_token_counts`` — THE batch operator's own
    counting, so the index can never drift from the batch
    definition). ``batch_df`` carries document rows
    (doc_id, text, lang, source)."""
    from event_streamer_spark.operators.corpus import dsir_doc_token_counts

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from event_streamer_spark.operators.corpus import canonicalize_docs

        _migrate_legacy_state(batch_df.sparkSession, state_dir)
        # ADVICE r10: first-writer-wins at read resolves duplicates
        # ACROSS batches only; an at-least-once source can also
        # duplicate a doc WITHIN one trigger, and counting both copies
        # doubles k. Canonicalize intra-batch exactly like the batch
        # operator's unique_full_docs (min (text,lang,source) per id)
        # so replay-equals-batch holds under same-batch duplicates too.
        _write_batch_partition(
            dsir_doc_token_counts(canonicalize_docs(batch_df)),
            batch_id,
            state_dir,
        )

    return process


def read_dsir(spark, state_dir: str) -> DataFrame:
    """The live DSIR score/rank table: first-writer-wins doc selection
    (min batch_id per doc_id), then the batch operator's own
    ``dsir_score_from_counts`` over the selected shards — equal to
    ``d7_dsir_resample`` over the union of all ingested batches.
    Empty/absent state reads as zero rows (explicit schema, the
    read_fk_orphans convention)."""
    from event_streamer_spark.helpers import hadoop_path_exists
    from event_streamer_spark.operators.corpus import dsir_score_from_counts

    if not hadoop_path_exists(spark, state_dir):
        return dsir_score_from_counts(
            spark.createDataFrame([], _SCHEMA).drop("batch_id")
        )
    shards = spark.read.schema(_SCHEMA).parquet(state_dir)
    first = shards.groupBy("doc_id").agg(
        F.min("batch_id").alias("batch_id")
    )
    toks = shards.join(first, ["doc_id", "batch_id"]).drop("batch_id")
    return dsir_score_from_counts(toks)
