"""Incremental (streaming-ingest) market-basket mining — D19 streaming
leg.

The batch ``d19_frequent_pairs`` answers "which item pairs co-occur in
at least N baskets of this corpus"; an ingest pipeline needs the ONLINE
form: basket lines arrive over time, an order's items can STRADDLE
micro-batches, and each new co-occurrence must be counted exactly once.
Same durable-index idiom as ``streaming.er``:

* **state** is one append-only parquet items index (ok, pk, batch_id):
  the distinct basket membership seen so far — a plain distributed
  table, no driver memory, compactable offline
  (``streaming.dedup.compact_state``).
* each micro-batch: dedupe arrivals within the batch, anti-join the
  prior index (a redelivered line or an intra-order repeat must not
  re-count), then emit pair INSTANCES (ok, part_x, part_y) from the
  two disjoint join terms — (new × new) within the batch covers pairs
  whose both sides are new, (prior × new) on the same order key covers
  pairs completed by this batch — so every (order, {x, y})
  co-occurrence is emitted in exactly ONE batch: the one where the
  later of the two items lands.
* **the basket cap is applied at READ, not emit**: the batch operator
  drops baskets over ``_MAX_BASKET`` items entirely, but a streaming
  order only reveals its size cumulatively — so the emit table keeps
  the order key and ``read_frequent_pairs`` anti-joins instances whose
  order has since grown past the cap (a per-order count over the items
  index, map-side combinable). Emitted-then-capped instances are
  thereby retracted without rewriting history, and the read is
  row-identical to the batch operator after a full replay (asserted
  under the seeded boundary grid).
* **retry-idempotent**: writes partition by ``batch_id`` with dynamic
  partition overwrite, and prior-state reads exclude the current
  batch's partition — a redelivered micro-batch replaces its own
  output instead of double-counting.

Shuffle volume per batch: O(batch lines) deduped rows joined against
the index on the ORDER key only — the per-order quadratic is bounded
by live basket sizes, never O(corpus²); an order past the cap keeps
appending items but its pair emission is wasted-then-retracted work
bounded by C(cap+batch, 2) per order, acceptable because real
over-cap baskets are noise by declaration (operators/basket.py).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_streamer_spark.helpers import hadoop_path_exists
from event_streamer_spark.operators.basket import _MAX_BASKET, _MIN_SUPPORT
from event_streamer_spark.streaming.dedup import (
    _migrate_legacy_state,
    _write_batch_partition,
)

_ITEM_SCHEMA = "ok bigint, pk bigint, batch_id int"
_EMIT_SCHEMA = "ok bigint, part_x bigint, part_y bigint, batch_id int"


def pair_mine_batch(
    state_dir: str, emit_dir: str
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` body: fold arriving basket lines (ok, pk) into
    the durable items index and emit each completed co-occurrence
    instance exactly once."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        for sub in (state_dir, emit_dir):
            _migrate_legacy_state(spark, sub)
        # same NULL rule as the batch operator's _BASKET_SQL: a NULL
        # key is not a basket item on either engine
        arrivals = (
            batch_df.select("ok", "pk")
            .filter(F.col("ok").isNotNull() & F.col("pk").isNotNull())
            .distinct()
        )
        prior = None
        try:
            if hadoop_path_exists(spark, state_dir):
                prior = (
                    spark.read.schema(_ITEM_SCHEMA)
                    .parquet(state_dir)
                    .filter(F.col("batch_id") != int(batch_id))
                    .select("ok", "pk")
                    .persist()  # read twice: the anti-join + the pair term
                )
                arrivals = arrivals.join(prior, ["ok", "pk"], "left_anti")
            # both pair terms and the state fold read the deduped
            # arrivals — persist once (the multiply-referenced rule)
            new = arrivals.persist()
            nx = new.select("ok", F.col("pk").alias("part_x"))
            ny = new.select("ok", F.col("pk").alias("part_y"))
            pairs = nx.join(ny, "ok").filter(
                F.col("part_x") < F.col("part_y")
            )
            if prior is not None:
                po = prior.select("ok", F.col("pk").alias("p_old"))
                pn = new.select("ok", F.col("pk").alias("p_new"))
                cross = po.join(pn, "ok").select(
                    "ok",
                    F.least("p_old", "p_new").alias("part_x"),
                    F.greatest("p_old", "p_new").alias("part_y"),
                )
                pairs = pairs.unionByName(cross)
            _write_batch_partition(
                pairs.select("ok", "part_x", "part_y"), batch_id, emit_dir
            )
            _write_batch_partition(new, batch_id, state_dir)
            new.unpersist()
        finally:
            if prior is not None:
                prior.unpersist()

    return process


def read_frequent_pairs(
    spark, state_dir: str, emit_dir: str, min_support: int = _MIN_SUPPORT
) -> DataFrame:
    """The live frequent-pair table from the emitted instances, with
    the basket cap applied retroactively — row-identical to the batch
    ``d19_frequent_pairs`` after a full replay. Empty/absent state
    reads as zero rows (explicit schema, the read_fk_orphans
    convention)."""
    if not hadoop_path_exists(spark, emit_dir):
        return spark.createDataFrame([], _EMIT_SCHEMA).select(
            "part_x", "part_y", F.lit(0).cast("bigint").alias("support")
        ).limit(0)
    inst = spark.read.schema(_EMIT_SCHEMA).parquet(emit_dir)
    over_cap = None
    if hadoop_path_exists(spark, state_dir):
        over_cap = (
            spark.read.schema(_ITEM_SCHEMA)
            .parquet(state_dir)
            .select("ok", "pk")
            .distinct()
            .groupBy("ok")
            .agg(F.count("*").alias("bsz"))
            .filter(F.col("bsz") > _MAX_BASKET)
            .select("ok")
        )
    if over_cap is not None:
        inst = inst.join(over_cap, "ok", "left_anti")
    return (
        inst.groupBy("part_x", "part_y")
        .agg(F.count("*").cast("bigint").alias("support"))
        .filter(F.col("support") >= min_support)
    )
