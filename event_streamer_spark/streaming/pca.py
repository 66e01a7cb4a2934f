"""D3 streaming leg: incremental PCA over ingested embeddings.

The batch ``pca_model`` (``operators/corpus.py``) is
``pca_gram_terms`` → ``pca_model_from_terms``; Gram terms are ADDITIVE
(ΣXᵀX, Σx, n all merge by SUM), so the incremental index appends each
micro-batch's reduced term frame — ≤ dim(dim+1)/2 + dim + 1 rows per
batch, the SMALLEST state in the index family — and the read side sums
shards and runs the batch model math. This is how an ingest pipeline
keeps a live whitening/compression model without ever rescanning
history: per-batch cost is one Arrow pass over the arriving shard,
read cost is O(dim²) + a 64×64 eigendecomposition.

Merge-is-addition holds EXACTLY in integer land but Gram terms are
doubles: summing per-batch partials associates differently than the
batch pass's partition order, so streamed terms differ from batch
terms at the ulp (~1e-10 relative on the fixture). The replay-equality
test therefore pins the MODEL to 1e-9 (eigvals/components/mean) and
the count n EXACTLY — same contract as the batch model's own
documented jitter window; every downstream consumer is jitter-immune
by design (see ``d3_pca_variance``).

Retry-idempotence via the family's ``batch_id`` partition overwrite;
empty/absent state reads as the n = 0 model.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_streamer_spark.streaming.dedup import (
    _migrate_legacy_state,
    _write_batch_partition,
)

_SCHEMA = "i int, j int, s double, batch_id int"


def pca_gram_batch(state_dir: str) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: append this micro-batch's reduced Gram
    terms (``pca_gram_terms`` over ``pca_domain`` — THE batch
    operator's own pass, so the incremental model can never drift from
    the batch definition). ``batch_df`` carries embedding rows
    (vec_id, embedding, ...)."""
    from event_streamer_spark.operators.corpus import (
        pca_domain,
        pca_gram_terms,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _migrate_legacy_state(batch_df.sparkSession, state_dir)
        _write_batch_partition(
            pca_gram_terms(pca_domain(batch_df)), batch_id, state_dir
        )

    return process


def read_pca_model(spark, state_dir: str, k: int = 8):
    """The live PCA model: SUM the term shards per (i, j) and run the
    batch operator's own ``pca_model_from_terms`` — equal to
    ``pca_model`` over the union of all ingested batches (exactly for
    n, to float-merge jitter for the spectrum). Empty/absent state
    reads as the n = 0 model."""
    from event_streamer_spark.helpers import hadoop_path_exists
    from event_streamer_spark.operators.corpus import pca_model_from_terms

    if not hadoop_path_exists(spark, state_dir):
        return pca_model_from_terms([], k)
    rows = (
        spark.read.schema(_SCHEMA)
        .parquet(state_dir)
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    return pca_model_from_terms(rows, k)
