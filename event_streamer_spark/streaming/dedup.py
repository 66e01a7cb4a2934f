"""Incremental (streaming-ingest) MinHash-LSH near-dedup — D2 streaming leg.

The batch ``d2_minhash_lsh`` answers "which docs in this corpus are
near-dups"; an ingest pipeline needs the ONLINE form: as documents
arrive, find near-dup candidates against everything already ingested,
then fold the arrivals into the index. This module implements that as a
``foreachBatch`` body over a parquet-backed LSH index:

* **state** is two append-only parquet tables under ``state_dir``:
  ``bands/`` (doc_id, band, bh) — the LSH index — and ``sigs/``
  (doc_id, sig) for candidate verification. Parquet-append keeps the
  state a plain distributed table: no driver memory, no single-machine
  index, compactable offline like any other table.
* each micro-batch: one Arrow pass for signatures (the SAME fixed
  permutations as batch — ``operators.dedup._minhash_signatures`` — so
  estimates are bit-identical), a band-bucket join against the prior
  index (cross-batch candidates) plus a within-batch self-join, then
  signature verification at the same 0.25 threshold.
* every pair involves at least one arriving doc, so no pair is emitted
  twice across batches; within a batch, ``doc_a < doc_b`` dedups.
* **retry-idempotent**: every write is partitioned by ``batch_id`` with
  dynamic partition overwrite, so a re-executed micro-batch (standard
  at-least-once ``foreachBatch`` redelivery) REPLACES its own prior
  partial output instead of appending a duplicate; reads exclude the
  current batch's partition, so a retry sees exactly the pre-batch
  index. Missing state paths mean "first batch"; real read errors
  propagate so the streaming query retries instead of silently losing
  cross-batch pairs.

Shuffle volume per batch: O(batch × bands) for the self-join plus a
join against the index pruned to the batch's band hashes — never
O(corpus²). Replaying a corpus through this in one batch reproduces the
batch operator exactly (asserted in ``tests/test_streaming.py``).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_streamer_spark.helpers import hadoop_path_exists
from event_streamer_spark.operators.dedup import _N_PERM, _minhash_signatures


def _migrate_legacy_state(spark, path: str) -> None:
    """One-time layout upgrade for state written by the pre-``batch_id``
    release (flat ``part-*.parquet`` at the state root). The partitioned
    layout cannot coexist with those files — parquet partition discovery
    rejects mixed structures, and the ``batch_id`` filter column would
    not resolve — so without this an upgraded deployment crash-loops
    until its state (the index) is wiped. Legacy files move into a
    ``batch_id=-1`` partition (-1 never collides with a real micro-batch
    id, so retry-exclusion reads keep every legacy row). No-op when the
    path is absent or already partitioned. Hadoop FS API throughout —
    works on HDFS/S3A, not just the local filesystem."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return
    legacy = [
        s.getPath()
        for s in fs.listStatus(jpath)
        if s.isFile() and not s.getPath().getName().startswith(("_", "."))
    ]
    if not legacy:
        return
    dest = jvm.org.apache.hadoop.fs.Path(f"{path}/batch_id=-1")
    fs.mkdirs(dest)
    for p in legacy:
        fs.rename(p, jvm.org.apache.hadoop.fs.Path(dest, p.getName()))


def _fs_for(spark, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath.getFileSystem(spark._jsc.hadoopConfiguration())


def _marker_path(path: str) -> str:
    # leading underscore: invisible to parquet partition discovery, but
    # checked explicitly by the state writers (fail-loud, see
    # _write_batch_partition)
    return f"{path}/_COMPACT_PENDING"


def _resume_compact(spark, path: str) -> None:
    """Finish an interrupted :func:`compact_state` run: the marker lists
    the folded batch ids; the staged data (``<path>__compact_tmp``)
    supersedes them, so completing is always rename-then-delete."""
    import json as _json

    jvm, fs = _fs_for(spark, path)
    marker = jvm.org.apache.hadoop.fs.Path(_marker_path(path))
    if not fs.exists(marker):
        return
    stream = fs.open(marker)
    try:
        folded = _json.loads(bytes(stream.readAllBytes()).decode())
    finally:
        stream.close()
    tmp = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__compact_tmp")
    dest = jvm.org.apache.hadoop.fs.Path(f"{path}/batch_id=-1")
    if fs.exists(tmp):  # staged data not yet promoted
        fs.delete(dest, True)
        fs.rename(tmp, dest)
    for b in folded:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/batch_id={b}"), True)
    fs.delete(marker, False)


class _InjectedCrash(RuntimeError):
    """Raised by the chaos-test hook to simulate a crash mid-compaction."""


def _crashpoint(name: str, _interrupt) -> None:
    if _interrupt == name:
        raise _InjectedCrash(name)


def compact_state(spark, path: str, _interrupt: str | None = None) -> int:
    """Collapse a ``batch_id``-partitioned state table's history into
    the single ``batch_id=-1`` partition (the same slot legacy
    migration uses) and drop the per-batch partitions. Run it with the
    STREAM STOPPED and its last batch COMMITTED; the NEWEST batch
    partition is always left un-compacted so that even a batch whose
    checkpoint commit didn't land keeps its retry-idempotence token (a
    redelivery must find its own partition to replace — folding it away
    would turn the retry into silent row loss for the dedup index).

    Crash-safe by protocol, not by atomic rename: the staged rewrite
    lands in ``<path>__compact_tmp`` and a ``_COMPACT_PENDING`` marker
    (listing the folded batch ids) is written BEFORE anything is
    deleted; promotion is rename-then-delete, and both
    :func:`compact_state` and every state write auto-resume /
    fail-loud on a leftover marker. At no point is a row only in a
    deleted location.

    Rows are preserved verbatim (state merges are aggregation-at-read:
    SUM/MAX/top-k — all multiset-safe), so reads before and after
    compact are identical. Returns the number of batch partitions
    folded. Partition count stays O(1) over the stream's lifetime
    instead of O(batches) — the state-table version of the small-files
    problem.
    """
    import json as _json

    from event_streamer_spark.helpers import hadoop_path_exists

    if not hadoop_path_exists(spark, path):
        return 0
    _resume_compact(spark, path)
    df = spark.read.parquet(path)
    ids = sorted(
        r["batch_id"]
        for r in df.select("batch_id").distinct().collect()
        if r["batch_id"] != -1
    )
    folded = ids[:-1]  # newest batch keeps its partition (retry token)
    if not folded:
        return 0
    tmp = path.rstrip("/") + "__compact_tmp"
    (
        df.filter(F.col("batch_id").isin([-1, *folded]))
        .drop("batch_id")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    _crashpoint("staged", _interrupt)

    jvm, fs = _fs_for(spark, path)
    marker = jvm.org.apache.hadoop.fs.Path(_marker_path(path))
    out = fs.create(marker, True)
    try:
        out.write(bytearray(_json.dumps([int(b) for b in folded]).encode()))
    finally:
        out.close()
    _crashpoint("marked", _interrupt)
    dest = jvm.org.apache.hadoop.fs.Path(f"{path}/batch_id=-1")
    fs.delete(dest, True)  # its rows are in tmp; promote then clean up
    _crashpoint("dest_deleted", _interrupt)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), dest)
    _crashpoint("promoted", _interrupt)
    for i, b in enumerate(folded):
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/batch_id={b}"), True)
        if i == 0:
            _crashpoint("partial_delete", _interrupt)
    fs.delete(marker, False)
    return len(folded)


# Auto-compaction threshold (measured, scripts/state_scale_probe.py at
# 100 batches × 200 rows, local[32]): the merged-read path roughly
# DOUBLES between 25 and 100 shard partitions (KMV 0.45 → 0.71 s,
# count-min 0.37 → 0.68 s — directory listing + per-file footer reads,
# the small-files tax) and one compaction restores it (0.41 / 0.34 s)
# for ~1.6 s per table. 64 partitions sits where the read tax is ~+60%
# and the rewrite amortizes over ≥63 folded batches.
_COMPACT_MAX_PARTITIONS = 64


def maybe_compact(
    spark, path: str, max_batch_partitions: int = _COMPACT_MAX_PARTITIONS
) -> int:
    """Run :func:`compact_state` iff the state table has accumulated
    more than ``max_batch_partitions`` batch partitions (counted with
    one filesystem listing — no Spark job when below threshold).

    Safe to call from a ``foreachBatch`` body AFTER the batch's own
    state write: compaction always leaves the NEWEST partition in
    place, so the current batch keeps its retry-idempotence token (a
    redelivered batch still finds its own partition to overwrite), and
    within ``foreachBatch`` there is no concurrent writer to race.
    Returns the number of partitions folded (0 = below threshold)."""
    if not hadoop_path_exists(spark, path):
        return 0
    jvm, fs = _fs_for(spark, path)
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    n = sum(
        1
        for s in fs.listStatus(jpath)
        if s.isDirectory() and s.getPath().getName().startswith("batch_id=")
    )
    if n <= max_batch_partitions:
        return 0
    return compact_state(spark, path)


def _write_batch_partition(df: DataFrame, batch_id: int, path: str) -> None:
    """Idempotent per-batch write: the rows land in partition
    ``batch_id=<n>``; dynamic partition overwrite replaces ONLY that
    partition on a foreachBatch retry (other batches' output is
    untouched), so at-least-once re-execution cannot double-insert."""
    from event_streamer_spark.helpers import hadoop_path_exists

    if hadoop_path_exists(df.sparkSession, _marker_path(path)):
        # an interrupted compact left staged-but-unpromoted data; writing
        # through it could read a partially-deleted index — fail loud,
        # compact_state() on this path resumes and clears the marker
        raise RuntimeError(
            f"state table {path} has an unfinished compaction "
            "(_COMPACT_PENDING): run compact_state() to resume it "
            "before restarting the stream"
        )
    (
        df.withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def _est_jaccard() -> F.Column:
    """Signature-agreement estimate over (sig_a, sig_b) columns —
    identical expression to the batch d2_minhash_lsh verifier."""
    return (
        F.expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))")
        .cast("double")
        / F.lit(float(_N_PERM))
    )


def count_min_batch(state_dir: str) -> Callable[[DataFrame, int], None]:
    """Incremental count-min sketch over a token stream (D10 streaming
    leg): each micro-batch aggregates its own (row, bucket, cnt) cells
    and appends them to the parquet sketch table; the merged sketch is
    just ``SUM(cnt) GROUP BY row, bucket`` at read time — count-min
    merge IS addition, so replaying in any batch split yields exactly
    the batch sketch. State is d·w rows per batch, compactable offline.
    """
    from event_streamer_spark.operators.sketches import count_min_sketch

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _migrate_legacy_state(batch_df.sparkSession, state_dir)
        _write_batch_partition(count_min_sketch(batch_df), batch_id, state_dir)

    return process


def heavy_hitters_batch(
    state_dir: str, tok_col: str = "tok"
) -> Callable[[DataFrame, int], None]:
    """Incremental exact heavy hitters (D10 streaming leg): each
    micro-batch appends its OWN per-token counts (distinct-token-sized,
    map-side combined); the running top-k merges shards with
    ``SUM(cnt) GROUP BY tok`` at read — counts add, so any batch split
    reproduces the batch counts exactly. Unlike the sketches, state
    here grows with the distinct-token count — at web scale prefer
    :func:`count_min_batch` (fixed d·w cells) and use this where exact
    token counts are the requirement."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _migrate_legacy_state(batch_df.sparkSession, state_dir)
        counts = (
            batch_df.filter(F.length(tok_col) > 0)
            .groupBy(tok_col)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        _write_batch_partition(counts, batch_id, state_dir)

    return process


def windowed_heavy_hitters_batch(
    state_dir: str, ts_col: str = "ts", key_col: str = "user_id"
) -> Callable[[DataFrame, int], None]:
    """Incremental windowed heavy hitters (C1×D10 streaming leg): each
    micro-batch appends its own (window_start, key) counts — map-side
    combined, so shard size is bounded by active keys per window, not
    events. Merge = SUM at read; counts add, so any batch split
    reproduces the batch counts exactly."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _migrate_legacy_state(batch_df.sparkSession, state_dir)
        counts = (
            batch_df.groupBy(
                F.window(ts_col, "1 hour").alias("w"), key_col
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                F.col("w.start").alias("window_start"), key_col, "cnt"
            )
        )
        _write_batch_partition(counts, batch_id, state_dir)

    return process


def read_windowed_heavy_hitters(
    spark, state_dir: str, k: int = 3, key_col: str = "user_id"
) -> DataFrame:
    """Current per-window top-``k``: merge count shards (SUM per
    (window, key)) then rank within each window with the deterministic
    (count desc, key) tiebreak — the rank runs over the aggregated
    table, one row per active key per window."""
    from pyspark.sql import Window as W

    merged = (
        spark.read.parquet(state_dir)
        .groupBy("window_start", key_col)
        .agg(F.sum("cnt").alias("cnt"))
    )
    rn = F.row_number().over(
        W.partitionBy("window_start").orderBy(F.desc("cnt"), key_col)
    )
    return merged.withColumn("rn", rn.cast("int")).filter(F.col("rn") <= k)


def read_heavy_hitters(spark, state_dir: str, k: int = 20) -> DataFrame:
    """The current exact top-``k``: merge shards (SUM per token) and
    TakeOrdered with the deterministic (count desc, token) tiebreak."""
    return (
        spark.read.parquet(state_dir)
        .groupBy("tok")
        .agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(k)
    )


def read_count_min(spark, state_dir: str) -> DataFrame:
    """Merge the appended per-batch sketch shards into THE sketch."""
    return (
        spark.read.parquet(state_dir)
        .groupBy("row", "bucket")
        .agg(F.sum("cell_cnt").alias("cell_cnt"))
    )


def ddsketch_batch(
    state_dir: str, val_col: str = "value"
) -> Callable[[DataFrame, int], None]:
    """Incremental DDSketch over a value stream (D11 streaming leg):
    append each micro-batch's (bucket, cnt) shard; the merged sketch is
    ``SUM(cnt) GROUP BY bucket`` at read — DDSketch merge IS addition,
    so any batch split reproduces the batch bucket table exactly, and
    the 1% relative-error quantile guarantee carries over unchanged."""
    from event_streamer_spark.operators.sketches import dd_bucket_table

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _migrate_legacy_state(batch_df.sparkSession, state_dir)
        _write_batch_partition(
            dd_bucket_table(batch_df, val_col), batch_id, state_dir
        )

    return process


def read_ddsketch(spark, state_dir: str) -> DataFrame:
    """Merge appended DDSketch shards into THE bucket table; feed the
    result to ``operators.sketches.dd_quantiles`` for estimates."""
    return (
        spark.read.parquet(state_dir)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def hll_batch(state_dir: str) -> Callable[[DataFrame, int], None]:
    """Incremental HyperLogLog over a token stream (D11 streaming leg):
    append each micro-batch's register shard; the merged sketch is
    ``MAX(max_rho) GROUP BY bucket`` at read — HLL merge is max, so any
    batch split reproduces the batch registers exactly."""
    from event_streamer_spark.operators.sketches import hll_registers

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _migrate_legacy_state(batch_df.sparkSession, state_dir)
        _write_batch_partition(hll_registers(batch_df), batch_id, state_dir)

    return process


def read_hll(spark, state_dir: str) -> DataFrame:
    """Merge appended HLL register shards into THE register table."""
    return (
        spark.read.parquet(state_dir)
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )


def exact_dedup_batch(
    state_dir: str,
    emit_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_expr=None,
) -> Callable[[DataFrame, int], None]:
    """D1 streaming leg #2: UNBOUNDED-retention exact dedup over a
    parquet-backed hash index (the durable complement of
    ``ops.stream_exact_dedup``, whose state-store retention is
    watermark-bounded by design).

    Each micro-batch: sha2 the content, keep the min-id row per hash
    WITHIN the batch, anti-join against the prior hash index
    (cross-batch first-seen), emit survivors to ``emit_dir`` and fold
    their hashes into ``state_dir``. The index is a plain distributed
    table — one uniform 256-bit join key, no driver state, compactable
    with :func:`compact_state`. Writes partition by ``batch_id`` with
    dynamic overwrite, so redelivered batches replace their own output.

    Keeper semantics vs the batch ``d1_exact_dedup``: the emitted HASH
    set is identical under any batch split (one keeper per distinct
    content, asserted in tests), and within a batch the keeper is the
    min id — but ACROSS batches the keeper is the first-arriving
    batch's row, so a duplicate whose globally-minimal id arrives later
    keeps the earlier id instead. That is the inherent streaming
    contract (an index can't retract an already-emitted keeper); batch
    and stream agree exactly when ids arrive in order.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        for sub in (state_dir, emit_dir):
            _migrate_legacy_state(spark, sub)
        hashed = batch_df.withColumn(
            "content_hash",
            # hash_expr plugs in non-byte identities — e.g. the
            # perceptual aHash of an image column
            # (operators.multimodal.ahash_udf) — keeping the index/
            # keeper/anti-join machinery identical
            hash_expr
            if hash_expr is not None
            else F.sha2(F.col(text_col), 256),
        )
        # within-batch keeper: min id per hash (matches d1's keeper rule)
        w_min = hashed.groupBy("content_hash").agg(
            F.min(id_col).alias("__keep_id")
        )
        firsts = hashed.join(
            w_min,
            (hashed["content_hash"] == w_min["content_hash"])
            & (hashed[id_col] == F.col("__keep_id")),
        ).select(hashed["*"])
        if hadoop_path_exists(spark, state_dir):
            prior = spark.read.parquet(state_dir).filter(
                F.col("batch_id") != int(batch_id)
            )
            firsts = firsts.join(
                prior.select("content_hash"), "content_hash", "left_anti"
            )
        # both writes share one evaluation — without the persist, the
        # hash + self-join + anti-join against the O(corpus) index would
        # run twice per batch
        firsts = firsts.persist()
        try:
            _write_batch_partition(firsts, batch_id, emit_dir)
            _write_batch_partition(
                firsts.select("content_hash"), batch_id, state_dir
            )
        finally:
            firsts.unpersist()

    return process


def minhash_neardup_batch(
    state_dir: str,
    pairs_dir: str,
    threshold: float = 0.25,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` body for incremental near-dedup.

    Usage::

        docs_stream.writeStream.foreachBatch(
            minhash_neardup_batch(state, pairs)
        ).trigger(availableNow=True).start()

    Each batch appends its candidate pairs (doc_a, doc_b, est_jaccard)
    to ``pairs_dir`` and its band/signature rows to ``state_dir``.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        for sub in (f"{state_dir}/bands", f"{state_dir}/sigs", pairs_dir):
            _migrate_legacy_state(spark, sub)
        sigs = _minhash_signatures(
            batch_df.select("doc_id", "text").repartition(
                spark.sparkContext.defaultParallelism
            )
        ).persist()
        bands = sigs.select(
            "doc_id", F.posexplode("bands").alias("band", "bh")
        )

        def _read(sub: str) -> Optional[DataFrame]:
            # ONLY a missing path means "first batch, no state yet" —
            # a real read failure (corrupt file, IO error) must raise so
            # the streaming query retries instead of silently treating
            # the whole index as empty and losing cross-batch pairs
            path = f"{state_dir}/{sub}"
            if not hadoop_path_exists(spark, path):
                return None
            # a retried batch already wrote its own partition: exclude
            # it so the retry sees exactly the pre-batch index
            return spark.read.parquet(path).filter(
                F.col("batch_id") != int(batch_id)
            )

        prior_bands = _read("bands")
        prior_sigs = _read("sigs")

        a = bands.alias("a")
        within = (
            a.join(
                bands.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
        )
        cands = within
        if prior_bands is not None:
            cross = (
                a.join(
                    prior_bands.alias("p"),
                    (F.col("a.band") == F.col("p.band"))
                    & (F.col("a.bh") == F.col("p.bh")),
                )
                .select(
                    F.least(F.col("a.doc_id"), F.col("p.doc_id")).alias("doc_a"),
                    F.greatest(F.col("a.doc_id"), F.col("p.doc_id")).alias(
                        "doc_b"
                    ),
                )
                .filter(F.col("doc_a") != F.col("doc_b"))
            )
            cands = cands.unionAll(cross)
        cands = cands.distinct()

        all_sigs = sigs.select("doc_id", "sig")
        if prior_sigs is not None:
            all_sigs = all_sigs.unionAll(
                prior_sigs.select("doc_id", "sig")
            ).dropDuplicates(["doc_id"])
        sa = all_sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
        sb = all_sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
        pairs = (
            cands.join(sa, "doc_a")
            .join(sb, "doc_b")
            .select(
                "doc_a", "doc_b", F.round(_est_jaccard(), 6).alias("est_jaccard")
            )
            .filter(F.col("est_jaccard") >= threshold)
        )
        _write_batch_partition(pairs, batch_id, pairs_dir)

        # fold the arrivals into the index AFTER candidate generation;
        # batch-partitioned overwrite keeps a retry from double-inserting
        _write_batch_partition(bands, batch_id, f"{state_dir}/bands")
        _write_batch_partition(
            sigs.select("doc_id", "sig"), batch_id, f"{state_dir}/sigs"
        )
        sigs.unpersist()

    return process


def kmv_batch(state_dir: str) -> Callable[[DataFrame, int], None]:
    """Incremental KMV distinct sketch over an event stream (the D11
    set-operation sketch's streaming leg, same idiom as ``hll_batch``):
    append each micro-batch's per-type k-min shard; the live sketch is
    the k-min of the deduped shard union at read. K-min merge is
    associative/commutative/idempotent, so any batch split — and any
    redelivery, thanks to the batch_id partition overwrite — reproduces
    the batch sketch exactly. State grows <= K rows per (type, batch);
    ``compact_state`` folds history when it matters."""
    from event_streamer_spark.operators.sketches import kmv_shard

    def process(batch_df: DataFrame, batch_id: int) -> None:
        _migrate_legacy_state(batch_df.sparkSession, state_dir)
        _write_batch_partition(kmv_shard(batch_df), batch_id, state_dir)

    return process


def read_kmv_distinct(spark, state_dir: str) -> DataFrame:
    """The live per-type distinct estimate from the shard union —
    row-identical to the batch ``d11_kmv_distinct`` after a full
    replay. Empty/absent state reads as zero rows (explicit schema,
    the read_fk_orphans convention)."""
    from event_streamer_spark.operators.sketches import kmv_estimate

    if not hadoop_path_exists(spark, state_dir):
        return kmv_estimate(
            spark.createDataFrame([], "event_type string, h bigint")
        )
    return kmv_estimate(
        spark.read.schema("event_type string, h bigint, batch_id int")
        .parquet(state_dir)
    )


def read_kmv_overlap(spark, state_dir: str) -> DataFrame:
    """Pairwise audience-overlap estimates from the live KMV shard
    state — row-identical to the batch ``d11_kmv_overlap`` after a
    full replay (same shared estimator, ``kmv_overlap_from``). The
    re-ranked sketch union feeds three plan references: persisted for
    the read."""
    from event_streamer_spark.operators.sketches import (
        _KMV_K,
        kmv_overlap_from,
    )

    if not hadoop_path_exists(spark, state_dir):
        empty = spark.createDataFrame([], "event_type string, h bigint")
        return kmv_overlap_from(empty)
    from pyspark.sql import Window as W

    shards = (
        spark.read.schema("event_type string, h bigint, batch_id int")
        .parquet(state_dir)
        .select("event_type", "h")
        .distinct()
    )
    rk = F.row_number().over(W.partitionBy("event_type").orderBy("h"))
    sk = (
        shards.withColumn("rn", rk)
        .filter(F.col("rn") <= _KMV_K)
        .select("event_type", "h")
        .persist()
    )
    try:
        out = kmv_overlap_from(sk)
        # materialize before unpersisting so callers get cached reads
        out = out.localCheckpoint(eager=True)
    finally:
        sk.unpersist()
    return out
