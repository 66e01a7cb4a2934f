"""Distributed ranking windows — two-level decomposition (SURVEY §2.B B15).

A plain ``Window.partitionBy(p).orderBy(o)`` ranking sorts EVERY row of a
partition key on ONE task. With low-cardinality partition keys (e.g.
``l_returnflag``: 3 values) that is a straggler at 100 TB — each of 3
tasks sorts n/3 rows. The fix is the classic two-level (TeraSort-style)
decomposition, same shape as ``pipeline.d9_sequence_pack``:

1. **Range-bucket** rows by the leading sort value using per-partition
   approximate quantile boundaries (a tiny aggregate, broadcast back).
   Bucketing is order-aligned (every row of bucket i sorts before
   bucket i+1) and tie-consistent (equal leading values share a bucket:
   strict ``>`` against each boundary).
2. **Local rank** within ``(partition, bucket)`` — parallel across
   ``|p| × n_buckets`` tasks instead of ``|p|``.
3. **Bucket offsets**: per-(partition, bucket) counts form a tiny table;
   its in-partition cumulative sum is each bucket's global base offset,
   broadcast-joined back. ``global row_number = base + local``.

Every heavy stage shuffles on the composite ``(partition, bucket)`` key;
the only ordered windows over a whole partition run on the counts table
(``n_buckets`` rows per key — model-state-sized).

With a UNIQUE total ordering, ``row_number == rank`` and the classic
rank family is arithmetic on it: ``percent_rank = (rn-1)/(n-1)``,
``cume_dist = rn/n``, and ``ntile`` follows the standard first-``r``-
buckets-get-one-extra rule. Tied rankings (``rank``/``dense_rank`` over
a low-cardinality value) go through :func:`tied_ranks` instead: a
per-(partition, value) count aggregate (map-side combinable) whose tiny
result carries the window, broadcast-joined back.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Measured at sf0.1 (600k rows, local[32]): 32 buckets with
# size(filter()) assignment beat 64 buckets / aggregate() 3×. Sketch
# accuracy only affects bucket BALANCE (never correctness): accuracy=100
# bounds each bucket within ±1% of n rows of its n/32 target and costs
# 0.46 s vs 1.43 s at accuracy=1000 — the bounds aggregate was the
# single largest cold-pass cost. More buckets only helps once per-bucket
# rows >> task overhead.
_DEFAULT_BUCKETS = 32
_PERCENTILE_ACCURACY = 100

# The bucketed frame is persist()-ed so pass-1 counts and the pass-2
# sort share one build; ``caching.bounded_persist`` keeps at most ONE
# live cached frame for this operator across calls (identical repeat
# calls share the entry; a different input evicts the old one).
#
# Round-8 measurement of the ALTERNATIVE (persist only the tiny bounds
# table, re-scan parquet per consumer — the design that wins at 100 TB
# where caching the fact table would spill ≈ the input size to disk):
# on local[32] at sf0.1 it LOST on both cold (3.4 s vs 2.6 s) and warm
# (1.2-2.1 s vs 0.7 s), because the testdata parquet has only 3 row
# groups — scan parallelism is capped at 3 tasks regardless of
# minPartitionNum, so each consumer's re-scan + bucket-assign pass
# costs ~1.3 s serial while a cache reread is 0.2-0.4 s. The full-frame
# persist stays; ``cache=False`` remains the extreme-scale escape
# hatch where the re-scan shape is the right one.
_CACHE_SLOT = "distrank.bucketed"


def clear_cache() -> None:
    """Release every two-level bucketed frame (the shared default slot
    and any per-call-site ``distrank.bucketed.*`` slots)."""
    from event_streamer_spark.caching import clear_slots_with_prefix

    clear_slots_with_prefix(_CACHE_SLOT)


def _bucket_assign(value: Column, bounds: Column, n_bounds: int) -> Column:
    """Order-aligned bucket id: #boundaries strictly below ``value``.

    Strict ``>`` keeps ties together — rows with equal leading sort
    values always land in the same bucket, so in-bucket ordering by the
    full sort key reproduces the global order exactly.

    Implemented as an UNROLLED sum of ``n_bounds`` comparisons rather
    than a higher-order ``size(filter())`` / ``aggregate()`` fold:
    Spark's higher-order array functions are CodegenFallback
    (interpreted per row, per lambda call) while the unrolled
    comparison chain stays inside whole-stage codegen — measured ~15%
    faster on the full-row evaluation that feeds the cache build, the
    single largest cold-path cost (round 8; earlier rounds measured
    ``size(filter())`` 25% over ``aggregate()``, both interpreted).

    Each term's WHEN/OTHERWISE absorbs a NULL ``bounds`` array (missing
    bounds row → condition NULL → 0), so the sum — and therefore the
    bucket id — is always non-NULL; callers may rely on that.

    ``n_bounds == 0`` (``n_buckets=1``) degenerates to a single global
    bucket."""
    if n_bounds == 0:
        return F.lit(0)
    terms = [
        F.when(value > bounds[i], 1).otherwise(0) for i in range(n_bounds)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _nullsafe_equi_join(
    left: DataFrame, right: DataFrame, keys: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Equi-join that treats NULL keys as matching NULL (``<=>``),
    dropping the right side's key columns like a USING join. A plain
    name-list join silently drops NULL-keyed rows — at a window
    operator's partition keys that means a whole NULL partition
    vanishes while SQL windows rank it as an ordinary group (round-9
    seeded dirty corpus: b15's NULL-returnflag partition, 60 oracle
    rows, dropped entirely by the bases join)."""
    # rename the right side's keys before the join: post-join
    # drop(right[k]) resolves unreliably through broadcast/alias
    # lineage, leaving an AMBIGUOUS_REFERENCE for downstream selects
    renamed = right
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"__rk_{k}")
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(renamed[f"__rk_{k}"])
        cond = c if cond is None else cond & c
    out = left.join(renamed, cond, how)
    return out.drop(*[f"__rk_{k}" for k in keys])


def _plan_size_bytes(df: DataFrame) -> Optional[int]:
    """Catalyst's size estimate for ``df`` (file-size based for parquet
    scans). Plan-statistics only — triggers NO job. ``None`` when the
    internal API is unavailable (never fail a query over a heuristic)."""
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # pragma: no cover - JVM internals
        return None
    # LogicalRDD (createDataFrame) and other stat-less nodes report
    # spark.sql.defaultSizeInBytes = Long.MaxValue: that means UNKNOWN,
    # not huge — return None so 'auto' stays on the scale-safe path
    return None if est >= (1 << 62) else est


# Crossover (measured at sf0.1, local[32]): the two-level pipeline costs
# ~2 fact scans + 2 broadcast joins vs the naive window's 1 scan + 1
# straggler sort. Below ~1 GiB of input even a worst-case single-key
# sort is one comfortable task and the naive window wins; above it the
# per-key straggler dominates and two-level wins. ``mode='auto'`` picks
# by the Catalyst size estimate against this threshold.
#
# The threshold is ENGINE CONF (VERDICT r7 #6): the 1 GiB default is the
# CLUSTER crossover, where the straggler costs wall-clock AND an
# executor's memory headroom. On a local[*] master there is no cluster
# to protect and the sf10 proof (scripts/prove_sf10.py) measured naive
# 4× faster than two-level at 1.3 GiB — so local mode auto-raises the
# default 8× rather than paying the two-level tax for safety it can't
# use. Set ``spark.event_streamer.distrank.naiveMaxBytes`` to override
# either default (e.g. force the cluster crossover locally to rehearse
# a production plan).
_NAIVE_MAX_BYTES = 1 << 30
_LOCAL_NAIVE_MAX_BYTES = 8 << 30
_NAIVE_MAX_BYTES_CONF = "spark.event_streamer.distrank.naiveMaxBytes"


def _is_local_master(master: str) -> bool:
    """'local' / 'local[N]' / 'local[*]' only — NOT 'local-cluster[...]',
    which runs real separate executor JVMs and needs the cluster
    threshold's memory-headroom protection."""
    return master == "local" or master.startswith("local[")


def resolve_naive_max_bytes(spark) -> int:
    """The effective auto-mode crossover: explicit engine conf if set,
    else 8 GiB on a ``local[*]`` master / 1 GiB on a cluster (see the
    threshold comment above for the measured rationale)."""
    v = spark.conf.get(_NAIVE_MAX_BYTES_CONF, None)
    if v is not None:
        return int(v)
    try:
        master = spark.sparkContext.master
    except Exception:  # pragma: no cover - connect-mode sessions
        master = ""
    return (
        _LOCAL_NAIVE_MAX_BYTES
        if _is_local_master(master)
        else _NAIVE_MAX_BYTES
    )


def _naive_row_number(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[Union[str, Column]],
    out_col: str,
    count_col: Optional[str],
    rn_limit: Optional[int],
) -> DataFrame:
    """The textbook single-level window — correct at any size, but sorts
    each whole partition key on one task (the small-input fast path)."""
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    out = df.withColumn(out_col, F.row_number().over(w).cast("int"))
    if count_col is not None:
        out = out.withColumn(
            count_col, F.count(F.lit(1)).over(Window.partitionBy(*part_cols))
        )
    if rn_limit is not None:
        out = out.filter(F.col(out_col) <= rn_limit)
    return out


def two_level_row_number(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[Union[str, Column]],
    bucket_value: Union[str, Column],
    n_buckets: int = _DEFAULT_BUCKETS,
    out_col: str = "rn",
    count_col: Optional[str] = None,
    rn_limit: Optional[int] = None,
    mode: str = "two_level",
    naive_max_bytes: Optional[int] = None,
    cache: bool = True,
    cached_out: Optional[dict] = None,
    slot: Optional[str] = None,
) -> DataFrame:
    """Global per-partition ``row_number`` without a per-partition sort.

    ``order_cols`` must be a UNIQUE total ordering within each partition
    key; ``bucket_value`` is a numeric column ASCENDING-aligned with the
    leading sort order (negate it for a DESC leading key). Adds
    ``out_col`` (the 1-based global row number) and, when ``count_col``
    is given, the partition's total row count (for percent_rank /
    cume_dist / ntile arithmetic). Helper columns are dropped.

    ``rn_limit`` is the distributed top-k fast path: rows with global
    row number > limit can only live in buckets whose base offset is
    already ≥ limit, so those buckets are dropped BEFORE the sort — a
    top-100 over 32 buckets sorts ~1/32nd of the data. (Equivalent to
    filtering ``out_col <= rn_limit`` afterwards, just cheaper.)

    ``mode``: ``'two_level'`` (default — the scale-safe plan, pinned by
    the plan-regression tests), ``'naive'`` (single-level window), or
    ``'auto'`` (naive below the crossover threshold of
    Catalyst-estimated input, two-level above; the estimate costs no
    job). The threshold is ``naive_max_bytes`` when given, else
    :func:`resolve_naive_max_bytes` — the
    ``spark.event_streamer.distrank.naiveMaxBytes`` engine conf, else
    8 GiB on a local master / 1 GiB on a cluster (measured crossover
    rationale at ``_NAIVE_MAX_BYTES``). Auto resolves the conf at plan
    BUILD time: registry-memoized frames keep the mode they were built
    with, so after flipping the conf mid-session call
    ``registry.clear_plan_cache()`` (and ``clear_cache()`` here) to
    re-resolve — the conf-flip plan tests model this.

    Multi-consumer caveat (measured round 8 on b15_window_rank): a
    query that reuses the ranked frame across SEVERAL window consumers
    amortizes the two-level path's cached bucketed frame; auto's naive
    pick re-sorts per consumer with nothing to share and can LOSE
    below the threshold. Pass an explicit ``mode='two_level'`` there.

    Two passes over the input: the bounds aggregate, then ONE build of
    the bucketed frame which is ``persist()``-ed (``cache=True``) so the
    per-bucket counts aggregate and the pass-2 sort share it instead of
    re-scanning the fact table. Both passes are scan+broadcast-join+
    partial-agg shaped — no stage ever sorts or holds a whole partition
    key on one task. At extreme input sizes where caching the full
    bucketed frame is unwanted (persisting it spills ≈ the input size
    to executor disk), ``cache=False`` trades it back for a third scan
    — measured tradeoff at ``_CACHE_SLOT``.

    ``cached_out`` (r13, guide §5.3): when given a dict and the
    two-level path persists its bucketed frame, the persisted frame is
    exposed as ``cached_out["bucketed"]`` (the caller's input rows plus
    a ``__bucket`` column, one entry per input row). A caller that needs
    a SECOND aggregate over the same input (b15's tied-rank counts) can
    feed it this frame instead of re-scanning the fact table — one fact
    pass instead of two. Left unset on the naive path and when
    ``cache=False``; callers must fall back to their own input then.

    ``slot`` (r13): the bounded-cache slot name, default
    ``distrank.bucketed``. A query that places SEVERAL two-level calls
    in ONE plan (b72's three quintiles, d15_anomaly_mad's med+MAD pair)
    MUST pass a distinct per-call-site slot (prefix
    ``distrank.bucketed.``): with the shared default, each call's
    ``bounded_persist`` evicts the previous call's frame at plan-BUILD
    time, so on the two-level path every earlier level runs UNCACHED
    and its two consumers recompute the whole upstream subtree —
    invisible locally (auto resolves naive there), a silent
    2^levels-scans regression at cluster scale. Per-call-site names
    keep the cache bounded: one live frame per site.
    """
    part_cols = list(part_cols)
    if mode == "auto":
        limit = (
            naive_max_bytes
            if naive_max_bytes is not None
            else resolve_naive_max_bytes(df.sparkSession)
        )
        est = _plan_size_bytes(df)
        mode = "naive" if est is not None and est <= limit else "two_level"
    if mode == "naive":
        return _naive_row_number(
            df, part_cols, order_cols, out_col, count_col, rn_limit
        )
    b = df.withColumn("__bv", F.col(bucket_value) if isinstance(bucket_value, str) else bucket_value)

    fracs = [i / n_buckets for i in range(1, n_buckets)]
    # bounds come from a 25% SAMPLE: they steer bucket BALANCE only
    # (never correctness — any boundary set yields the right ranks), and
    # the percentile sketch's per-row update cost was the bulk of the
    # bounds pass. seed fixed → deterministic plan. Sampling edge: a
    # tiny partition key can draw zero sample rows, so the LEFT join
    # leaves its __bounds NULL and _bucket_assign's WHEN/OTHERWISE
    # null-absorption puts ALL its rows in bucket 0 — still correct,
    # just unbalanced for that key. The COALESCE below is a backstop
    # for that contract only (it never fires today); keep it if
    # _bucket_assign is ever rewritten as a NULL-propagating fold.
    bounds = (
        b.sample(fraction=0.25, seed=42)
        .groupBy(*part_cols)
        .agg(
            F.percentile_approx("__bv", fracs, _PERCENTILE_ACCURACY).alias(
                "__bounds"
            )
        )
    )
    b = (
        _nullsafe_equi_join(b, F.broadcast(bounds), part_cols, "left")
        .withColumn(
            "__bucket",
            # NULL order values get a DEDICATED bucket BEYOND the real
            # ones, mirroring the NULLS LAST placement of the callers'
            # orderings (Spark DESC and DuckDB ASC/DESC defaults) —
            # bucket 0 would rank NULLs among the FIRST bucket's rows
            # (round-9 dirty corpus: NULL l_extendedprice displaced 2-3
            # top-100 rows per flag). Callers whose ordering puts NULLS
            # FIRST must normalize the bucket value instead.
            F.when(F.col("__bv").isNull(), F.lit(n_buckets)).otherwise(
                F.coalesce(
                    _bucket_assign(
                        F.col("__bv"), F.col("__bounds"), n_buckets - 1
                    ),
                    F.lit(0),
                )
            ),
        )
        # __bv/__bounds exist only to compute __bucket; dropping them HERE
        # keeps the (n_buckets-1)-double boundary array off every cached
        # row — at 32 buckets that is ~250 B/row of dead weight otherwise
        .drop("__bv", "__bounds")
    )
    # NOT pre-partitioned on (part, bucket) before the persist: it looks
    # like the classic reuse-one-shuffle move (pass-1 groupBy and the
    # pass-2 window both hash on exactly that key), but under AQE a
    # cached plan's outputPartitioning is reported UNKNOWN, so both
    # consumers re-exchange anyway — measured round 8: the explicit
    # repartition ADDED an exchange (9 vs 7) at identical wall-clock.
    if cache:
        # one fact scan feeds BOTH consumers below (pass-1 counts and
        # the pass-2 sort); without this the bucketed frame is rebuilt
        # from parquet twice (the r4 3-scan regression)
        from event_streamer_spark.caching import bounded_persist

        # narrow numeric frame on the cold critical path: skip columnar
        # compression (2× faster first build, identical reread) and
        # write 100k-row cache batches (another 1.8×: 2.37 s → 1.29 s
        # measured round 8) — see bounded_persist for both tradeoffs
        b = bounded_persist(
            b, slot or _CACHE_SLOT, columnar_compressed=False,
            columnar_batch_size=100_000,
        )
        if cached_out is not None:
            cached_out["bucketed"] = b

    # pass 1: per-bucket counts → cumulative base offsets (tiny table)
    counts = b.groupBy(*part_cols, "__bucket").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    over_buckets = (
        Window.partitionBy(*part_cols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bases = counts.withColumn(
        "__base", F.sum("__cnt").over(over_buckets) - F.col("__cnt")
    )
    if count_col is not None:
        total_w = Window.partitionBy(*part_cols)
        bases = bases.withColumn(count_col, F.sum("__cnt").over(total_w))
    base_cols = part_cols + ["__bucket", "__base"] + (
        [count_col] if count_col else []
    )

    # pass 2: bucket-local sort — only over buckets that can matter
    # (NULL-safe: a NULL partition key is an ordinary window group)
    j = _nullsafe_equi_join(
        b, F.broadcast(bases.select(*base_cols)), part_cols + ["__bucket"]
    )
    if rn_limit is not None:
        j = j.filter(F.col("__base") < rn_limit)
    local_w = Window.partitionBy(*part_cols, "__bucket").orderBy(*order_cols)
    out = j.withColumn(
        out_col,
        (F.col("__base") + F.row_number().over(local_w)).cast("int"),
    )
    if rn_limit is not None:
        out = out.filter(F.col(out_col) <= rn_limit)
    return out.drop("__bv", "__bounds", "__bucket", "__base")


def tied_rank_table(
    df: DataFrame,
    part_cols: Sequence[str],
    value_col: str,
    descending: bool = False,
    rank_col: str = "rnk",
    dense_rank_col: str = "drnk",
) -> DataFrame:
    """The tiny ``(part, value) → (rank, dense_rank)`` lookup table.

    For a low-cardinality ranking value the whole rank structure lives
    in the per-(partition, value) count table: ``dense_rank`` is the
    value's position among distinct values, ``rank`` is 1 + the count of
    rows ordered strictly before it. ONE map-side-combinable aggregate
    plus windows over the tiny result. Compute this from the CHEAPEST
    frame that has the columns (e.g. the raw table) and broadcast-join
    it onto whatever expensive pipeline needs the ranks — joining the
    expensive pipeline into this aggregate would recompute it.
    """
    part_cols = list(part_cols)
    order = F.col(value_col).desc() if descending else F.col(value_col).asc()
    counts = df.groupBy(*part_cols, value_col).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_rows = (
        Window.partitionBy(*part_cols)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_seq = Window.partitionBy(*part_cols).orderBy(order)
    return counts.select(
        *part_cols,
        value_col,
        (F.sum("__cnt").over(w_rows) - F.col("__cnt") + 1)
        .cast("int")
        .alias(rank_col),
        F.row_number().over(w_seq).alias(dense_rank_col),
    )


def tied_ranks(
    df: DataFrame,
    part_cols: Sequence[str],
    value_col: str,
    descending: bool = False,
    rank_col: str = "rnk",
    dense_rank_col: str = "drnk",
) -> DataFrame:
    """``rank``/``dense_rank`` over a tied ordering, shuffle-light:
    broadcast-join :func:`tied_rank_table` back onto ``df`` — the fact
    table is never sorted."""
    table = tied_rank_table(
        df, part_cols, value_col, descending, rank_col, dense_rank_col
    )
    return _nullsafe_equi_join(
        df, F.broadcast(table), list(part_cols) + [value_col]
    )


def middle_ranks(rn: Column, n: Column) -> Column:
    """Filter predicate selecting the middle rank(s) of an ``n``-row
    group — rank ``(n+1)/2`` rounded both ways, so an odd group keeps
    one row and an even group keeps the two whose average is the exact
    median (DuckDB's ``MEDIAN`` interpolation rule). THE one copy of
    the even-n rule, shared by ``b48_exact_median`` and
    ``d15_anomaly_mad`` so the two median definitions cannot drift."""
    lo = F.floor((n + 1) / 2)
    hi = F.ceil((n + 1) / 2)
    return (rn == lo) | (rn == hi)


def percent_rank_expr(rn: Column, n: Column, decimals: int = 6) -> Column:
    """SQL ``percent_rank()`` from a global row number and partition row
    count: ``(rn-1)/(n-1)``, with the single-row-partition case pinned
    to 0.0 (the SQL definition) instead of a divide-by-zero NULL."""
    return F.when(n == 1, F.lit(0.0)).otherwise(
        F.round((rn - 1).cast("double") / (n - 1), decimals)
    )


def ntile_expr(rn: Column, n: Column, k: int) -> Column:
    """Standard SQL ``NTILE(k)`` from a global row number and row count:
    the first ``n % k`` tiles get ``n // k + 1`` rows, the rest
    ``n // k`` (Spark and DuckDB agree on this rule)."""
    q = F.floor(n / k).cast("long")
    r = (n % k).cast("long")
    big = q + 1  # size of the first r tiles
    cutoff = r * big
    return (
        F.when(rn <= cutoff, F.ceil(rn / big))
        .otherwise(r + F.ceil((rn - cutoff) / F.greatest(q, F.lit(1))))
        .cast("int")
    )
