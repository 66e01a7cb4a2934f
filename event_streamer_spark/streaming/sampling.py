"""Incremental weighted sampling — D7 streaming leg.

Efraimidis–Spirakis priorities are pure row functions here (md5-derived
uniform — see ``operators.curation.weighted_sample_key``), which makes
the weighted sample EXACTLY incremental: the global top-k by priority
over a union of batches equals the top-k over each batch's own top-k
candidates. So the streaming form is:

* each micro-batch computes its rows' priorities and writes only its
  OWN top-k candidate rows (≤ k rows per batch) into a parquet state
  table partitioned by ``batch_id`` — dynamic partition overwrite makes
  a retried batch replace its own candidates (at-least-once safe);
* the current sample is read back as the global top-k over all candidate
  partitions (k × batches rows — bounded, compactable).

Replaying a corpus through this in any number of batches yields the
bit-identical sample to the batch ``d7_weighted_sample`` operator
(asserted in ``tests/test_streaming.py``): no approximation anywhere.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streamer_spark.operators.curation import weighted_sample_key


def weighted_sample_batch(
    state_dir: str,
    k: int = 100,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: keep each batch's top-``k`` weighted-sample
    candidates in the parquet state table."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        key = weighted_sample_key(id_col, weight_col)
        cands = (
            # same w > 0 A-ES weight domain as the batch operator
            # (round 10) so the streaming sample stays bit-identical
            # on corpora containing out-of-domain weights
            batch_df.filter(F.col(weight_col) > 0)
            .select(
                F.col(id_col).alias("doc_id"),
                F.col(weight_col).alias("weight"),
                key.alias("sample_key"),
            )
            .orderBy(F.desc("sample_key"), "doc_id")
            .limit(k)
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        (
            cands.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(state_dir)
        )

    return process


def read_weighted_sample(
    spark: SparkSession, state_dir: str, k: int = 100
) -> DataFrame:
    """The current weighted sample: global top-``k`` over every batch's
    candidates (each id appears in exactly one batch, so no dedup is
    needed; the merge is a TakeOrderedAndProject over k×batches rows)."""
    return (
        spark.read.parquet(state_dir)
        .select("doc_id", "weight", "sample_key")
        .orderBy(F.desc("sample_key"), "doc_id")
        .limit(k)
    )


def stream_rate_sample(
    docs: DataFrame,
    thresholds: DataFrame,
    key_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "#T",
    keep_rate: bool = False,
) -> DataFrame:
    """D7 streaming leg: deterministic hash sampling of an arriving
    document stream against STATIC per-key rates — the temperature /
    mixture samplers' filter applied micro-batch by micro-batch.

    ``thresholds`` is the ``(key, rate, h)`` table the batch sampler
    builds (``operators.pipeline.md5_threshold``) — corpus statistics
    are computed batch-side (or refreshed periodically) and broadcast,
    exactly like the static holdout in ``stream_decontaminate``. The
    keep decision is a pure row function of (id, key, h), so the
    streamed sample is BIT-IDENTICAL to the batch sample under any
    batch split — no state, no RNG, zero stream shuffle.

    Keys ABSENT from the thresholds table (a language first seen after
    the snapshot was built) default to 'g' — keep everything — via the
    LEFT join: rare new keys are exactly what alpha-sampling upweights,
    so sampling them at rate 0 (the inner-join behavior) would invert
    the intent. Refresh the snapshot to assign them a real rate.
    """
    key = F.substring(
        F.md5(
            F.concat(
                F.col(id_col).cast("string"), F.lit(salt), F.col(key_col)
            )
        ),
        1,
        8,
    )
    # drop the snapshot columns by default: leaking "rate" (null for
    # keys absent from the snapshot) would silently widen the stream
    # schema for callers that don't re-select. keep_rate=True keeps it
    # for callers that want the per-key rate in the output WITHOUT a
    # second thresholds aggregation (a re-join of `thresholds` builds a
    # different broadcast subtree, so ReuseExchange cannot dedupe it
    # and the whole corpus-stats aggregation runs twice).
    drop_cols = ["h"] if keep_rate else ["h", "rate"]
    return (
        docs.join(F.broadcast(thresholds), key_col, "left")
        .filter(key < F.coalesce(F.col("h"), F.lit("g")))
        .drop(*drop_cols)
    )
