"""Frequency sketches (D-surface extension): heavy hitters + count-min.

The pipeline question "which tokens/URLs/users dominate this corpus"
has an exact answer (groupBy + top-k) and a sketch answer (count-min:
fixed O(d·w) memory regardless of cardinality). Here the count-min
sketch is expressed RELATIONALLY — a sketch cell is just a count per
(hash_row, bucket), so building it is one map-side-combinable groupBy
and merging shards is ordinary partial aggregation. No UDFs, no driver
state; at 100 TB the sketch table is d·w rows total.

Estimate(token) = min over rows i of cell(i, h_i(token)) — always an
overestimate, within ε·N with probability 1−δ (ε≈e/w, δ≈e^−d).
Accuracy is asserted in ``tests/test_dedup_quality.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streamer_spark.caching import bounded_persist
from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load

_CMS_DEPTH = 4
_CMS_WIDTH = 512
_TOP_K = 20


def _tokens(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.length("tok") > 0)
    )


def _bucket(row: int, tok_col: str = "tok") -> F.Column:
    """Hash row ``row``'s bucket for a token: crc32 over a row-salted
    key — deterministic across runs and engines."""
    return F.crc32(F.concat(F.lit(f"{row}|"), F.col(tok_col))) % _CMS_WIDTH


@query(
    "d10_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents),
    c AS (
      SELECT tok, COUNT(*) AS cnt FROM tok WHERE length(tok) > 0
      GROUP BY tok)
    SELECT tok, cnt FROM c
    ORDER BY cnt DESC, tok
    LIMIT {_TOP_K}
    """,
)
def d10_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """D10: exact corpus heavy hitters — top-{20} tokens by frequency.

    Scale: explode + groupBy on the token (map-side partial combine
    collapses each task to its distinct tokens before the exchange);
    the top-k is TakeOrderedAndProject over the aggregated table with a
    deterministic (count, token) tiebreak.
    """
    counts = _tokens(spark, sf).groupBy("tok").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return counts.orderBy(F.col("cnt").desc(), "tok").limit(_TOP_K)


def count_min_sketch(tokens: DataFrame, tok_col: str = "tok") -> DataFrame:
    """Build the count-min table ``(row, bucket, cnt)`` — d·w cells.

    One explode by the d hash rows and one groupBy: both map-side
    combinable, output d·w = {4·512} rows regardless of input size.
    Shards built per source partition merge by summing cells (ordinary
    aggregation semantics), which is what AQE/partial-agg already do.
    """
    rows = tokens.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _bucket(i, tok_col).alias("bucket")
                    )
                    for i in range(_CMS_DEPTH)
                ]
            )
        ).alias("cell")
    )
    return rows.groupBy(
        F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cell_cnt"))


_HLL_P = 10  # 2^10 = 1024 registers → σ ≈ 1.04/√1024 ≈ 3.3%
_HLL_M = 1 << _HLL_P


def hll_registers(tokens: DataFrame, tok_col: str = "tok") -> DataFrame:
    """HyperLogLog register table ``(bucket, max_rho)`` — m rows.

    Like the count-min table, HLL is relational: bucket = low p bits of
    the hash, rho = leading-zero rank of the remaining bits, and the
    register is ``max(rho)`` per bucket — one map-side-combinable
    groupBy. Merging shards = max per bucket, ordinary aggregation.
    """
    return hll_registers_by(
        tokens.withColumn("__grp", F.lit(0)), "__grp", tok_col
    ).drop("grp")


@query("d11_hll_distinct", oracle=None)  # estimator → rows-only check
def d11_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """D11: HyperLogLog distinct-token estimate built FROM SCRATCH as a
    relational plan (register table + harmonic-mean fold), alongside
    Spark's built-in ``approx_count_distinct`` (B13) for comparison.

    The raw estimate applies the standard small-range correction
    (linear counting when E ≤ 2.5m and empty registers exist). The
    whole sketch is m = {1024} rows; accuracy vs the exact distinct
    count is asserted in tests (±5%). At 100 TB: one narrow map + a
    1024-row aggregation — cardinality estimation at scan throughput.
    """
    regs = hll_registers(_tokens(spark, sf)).withColumn("grp", F.lit(0))
    return hll_fold(regs).select(
        "raw_estimate", "estimate", "empty_registers"
    )


@query("d10_count_min", oracle=None)  # sketch estimates → rows-only check
def d10_count_min(spark: SparkSession, sf: str) -> DataFrame:
    """D10: count-min frequency estimates for the exact heavy hitters.

    Joins each top-{20} token's d hash cells against the sketch table
    and takes the min cell count — the CMS estimate. The sketch is d·w
    rows (broadcast-sized); the join fans each probe token out to its
    d cells only. Estimates are deterministic (crc32 hashing) and
    always ≥ the true count; the error bound is asserted in tests.
    """
    sketch = count_min_sketch(_tokens(spark, sf))
    top = d10_heavy_hitters(spark, sf).withColumnRenamed("cnt", "exact_cnt")
    probes = top.select(
        "tok",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("row"), _bucket(i).alias("bucket"))
                    for i in range(_CMS_DEPTH)
                ]
            )
        ).alias("cell"),
    ).select(
        "tok",
        "exact_cnt",
        F.col("cell.row").alias("row"),
        F.col("cell.bucket").alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("tok")
        .agg(
            F.first("exact_cnt").alias("exact_cnt"),
            F.min("cell_cnt").alias("est_cnt"),
        )
    )


# -- DDSketch: mergeable relative-error quantile sketch ----------------
#
# Pipeline question: "what is the p99 of doc length / event value /
# tokens-per-doc over 100 TB" without a global sort. percentile_approx
# answers it with rank error; DDSketch (Masson et al., VLDB 2019)
# answers with RELATIVE VALUE error — est within alpha of the true
# quantile value — and its state is a tiny bucket table whose merge is
# ordinary addition, so it composes with partial aggregation and the
# streaming shard pattern exactly like count-min/HLL above.
#
# bucket(x) = ceil(log_gamma(x)) for x > 0, gamma = (1+a)/(1-a); every
# x in bucket i lies within a of the bucket midpoint 2*gamma^i/(gamma+1).

import math

_DD_ALPHA = 0.01
_DD_GAMMA = (1 + _DD_ALPHA) / (1 - _DD_ALPHA)
_DD_QS = (0.5, 0.9, 0.99, 0.999)


def dd_bucket_table(values: DataFrame, val_col: str = "value") -> DataFrame:
    """DDSketch bucket table ``(bucket, cnt)`` over strictly positive
    ``values[val_col]`` — one map-side-combinable groupBy; ~log_gamma
    (max/min) rows total (≈540 for this fixture's 0.01..490 range at
    alpha = 1%). Merge of shards = SUM per bucket."""
    return dd_bucket_table_by(
        values.withColumn("__grp", F.lit(0)), "__grp", val_col
    ).drop("grp")


def _dd_midpoint(bucket) -> F.Column:
    """Bucket-midpoint estimate 2*gamma^i/(gamma+1) — the one copy of
    the DDSketch value-reconstruction formula."""
    return (
        F.lit(2.0) * F.pow(F.lit(_DD_GAMMA), bucket) / F.lit(_DD_GAMMA + 1)
    )


def dd_quantiles(buckets: DataFrame, qs=_DD_QS) -> DataFrame:
    """Quantile estimates from a (possibly merged) bucket table: for
    each q, the midpoint of the first bucket whose cumulative count
    reaches rank ``floor(q*(n-1)) + 1``.

    The cumulative sum runs over the SKETCH table — bounded at
    ~log_gamma(max/min) rows by construction, so the unpartitioned
    window is over sketch-state, never data (same bounded-table
    argument as the RRF fusion in hybrid.py)."""
    spark = buckets.sparkSession
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = buckets.agg(F.sum("cnt").alias("n"))  # 1-row scalar subquery
    cum = buckets.select(
        "bucket", F.sum("cnt").over(w).alias("cum")
    ).crossJoin(F.broadcast(total))
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    hit = cum.join(
        F.broadcast(qdf),
        F.col("cum") >= F.floor(F.col("q") * (F.col("n") - 1)) + 1,
    )
    return (
        hit.groupBy("q")
        .agg(F.min("bucket").alias("bucket"), F.max("n").alias("n"))
        .select(
            "q",
            F.round(_dd_midpoint(F.col("bucket")), 6).alias("est"),
            F.col("n").cast("bigint").alias("n"),
        )
    )


@query("d11_dd_quantiles", oracle=None)  # estimator → rows-only check
def d11_dd_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """D11: DDSketch quantiles of ``events.value`` — p50/p90/p99/p999
    with a 1% RELATIVE value-error guarantee, from a ~540-row mergeable
    bucket table instead of a global sort.

    Scale: bucket assignment is a narrow JVM expression; the groupBy
    output is bounded by the value RANGE (log_gamma(max/min) buckets),
    not the row count, so at 100 TB the sketch is still sketch-sized
    and the quantile fold runs on the driver-adjacent tiny table.
    Accuracy vs the exact quantiles is asserted in
    tests/test_dedup_quality.py (|est - exact| <= alpha * exact).
    """
    buckets = dd_bucket_table(load(spark, sf, "events"), "value")
    return dd_quantiles(buckets).orderBy("q")


# -- sketch algebra: HLL set operations, grouped DDSketch --------------


def hll_registers_by(
    tokens: DataFrame, group_col: str, tok_col: str = "tok"
) -> DataFrame:
    """Per-group HLL register table ``(group, bucket, max_rho)`` in ONE
    pass — m rows per group. Union of groups = ``MAX per bucket`` over
    their registers (HLL union is lossless: the union sketch equals the
    sketch of the unioned stream)."""
    h = F.crc32(F.col(tok_col).cast("string"))
    bucket = (h % _HLL_M).alias("bucket")
    w = (h / _HLL_M).cast("long")
    nbits = 32 - _HLL_P
    rho = (
        F.when(w == 0, F.lit(nbits + 1))
        .otherwise(F.lit(nbits) - F.floor(F.log2(w)))
        .cast("int")
        .alias("rho")
    )
    return (
        tokens.select(F.col(group_col).alias("grp"), bucket, rho)
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_fold(regs: DataFrame) -> DataFrame:
    """Fold per-group register tables ``(grp, bucket, max_rho)`` into
    per-group estimates — THE one copy of the harmonic-mean +
    small-range linear-counting math (d11_hll_distinct and
    d11_hll_union both delegate here). Returns ``(grp, raw_estimate,
    estimate, empty_registers)``; empty registers contribute 2^0 = 1
    each to the harmonic sum."""
    alpha = 0.7213 / (1 + 1.079 / _HLL_M)
    agg = regs.groupBy("grp").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("present_sum"),
        F.count(F.lit(1)).alias("n_present"),
    ).select(
        "grp",
        (F.col("present_sum") + (_HLL_M - F.col("n_present"))).alias("hsum"),
        (F.lit(_HLL_M) - F.col("n_present")).alias("zeros"),
    )
    raw = F.lit(alpha * _HLL_M * _HLL_M) / F.col("hsum")
    corrected = F.when(
        (raw <= 2.5 * _HLL_M) & (F.col("zeros") > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / F.col("zeros")),
    ).otherwise(raw)
    return agg.select(
        "grp",
        F.round(raw, 2).alias("raw_estimate"),
        F.round(corrected, 2).alias("estimate"),
        F.col("zeros").cast("bigint").alias("empty_registers"),
    )


@query("d11_hll_union", oracle=None)  # estimator → rows-only check
def d11_hll_union(spark: SparkSession, sf: str) -> DataFrame:
    """D11: HLL set algebra — distinct 3-token-shingle estimates for two
    corpus slices (even/odd doc_id), their UNION (register MAX-merge,
    lossless) and their INTERSECTION (inclusion–exclusion). The corpus
    question this answers at 100 TB: "how much NEW content does shard
    B add over shard A" without ever co-shuffling the two shards.

    The scale story: per-slice registers are built in one pass
    (groupBy(slice, bucket)); merging slices never revisits the data —
    union over any subset of 10^6 shards is a ~m-row MAX aggregation.
    Inclusion–exclusion inherits the union/|A|/|B| errors, so its
    absolute error is bounded by a few σ of the LARGEST operand
    (asserted in tests); HLL has no direct intersection estimator.
    """
    toks = (
        load(spark, sf, "documents")
        .withColumn("toks", F.split("text", " "))
        .filter(F.size("toks") >= 3)
        .select(
            F.when(F.col("doc_id") % 2 == 0, F.lit("a"))
            .otherwise(F.lit("b"))
            .alias("slice"),
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 2),"
                    " i -> concat_ws(' ', slice(toks, i, 3)))"
                )
            ).alias("tok"),
        )
    )
    regs = bounded_persist(
        hll_registers_by(toks, "slice"), "d11_hll_union_regs"
    )
    union_regs = regs.groupBy("bucket").agg(
        F.max("max_rho").alias("max_rho")
    ).select(F.lit("union").alias("grp"), "bucket", "max_rho")
    est = hll_fold(regs.unionByName(union_regs)).select("grp", "estimate")
    wide = est.groupBy().pivot("grp", ["a", "b", "union"]).agg(
        F.first("estimate")
    )
    return wide.select(
        F.col("a").alias("est_a"),
        F.col("b").alias("est_b"),
        F.col("union").alias("est_union"),
        F.round(F.col("a") + F.col("b") - F.col("union"), 2).alias(
            "est_intersection"
        ),
    )


def dd_bucket_table_by(
    values: DataFrame, group_col: str, val_col: str = "value"
) -> DataFrame:
    """Per-group DDSketch bucket table ``(grp, bucket, cnt)`` — one
    map-side-combinable groupBy; merge of shards = SUM per (grp, bucket)."""
    b = F.ceil(F.log(F.col(val_col)) / math.log(_DD_GAMMA)).cast("long")
    return (
        values.filter(F.col(val_col) > 0)
        .select(F.col(group_col).alias("grp"), b.alias("bucket"))
        .groupBy("grp", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query("d11_dd_quantiles_by_group", oracle=None)  # estimator → rows-only
def d11_dd_quantiles_by_group(spark: SparkSession, sf: str) -> DataFrame:
    """D11: per-group DDSketch quantiles — p50/p99 of ``events.value``
    per event_type, each within 1% relative value error.

    The cumulative window is PARTITIONED by group and ordered by bucket
    — per-partition work is bounded by the ~540-bucket sketch width, so
    a million groups parallelize across the cluster with no global
    sort and no skew (every group's state is sketch-sized).
    """
    buckets = dd_bucket_table_by(
        load(spark, sf, "events"), "event_type", "value"
    )
    totals = buckets.groupBy("grp").agg(F.sum("cnt").alias("n"))
    w = (
        Window.partitionBy("grp")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = buckets.select(
        "grp", "bucket", F.sum("cnt").over(w).alias("cum")
    ).join(F.broadcast(totals), "grp")
    qdf = spark.createDataFrame([(0.5,), (0.99,)], "q double")
    hit = cum.join(
        F.broadcast(qdf),
        F.col("cum") >= F.floor(F.col("q") * (F.col("n") - 1)) + 1,
    )
    return (
        hit.groupBy("grp", "q")
        .agg(F.min("bucket").alias("bucket"), F.max("n").alias("n"))
        .select(
            F.col("grp").alias("event_type"),
            "q",
            F.round(_dd_midpoint(F.col("bucket")), 6).alias("est"),
            F.col("n").cast("bigint").alias("n"),
        )
        .orderBy("event_type", "q")
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct/overlap sketches — D11 set operations
# ---------------------------------------------------------------------------

# Sketch size. Estimates are (K-1)/kth-normalized-min with ~1/sqrt(K-2)
# relative error (Beyer et al., "On synopses for distinct-value
# estimation under multiset operations", SIGMOD'07 — public literature).
_KMV_K = 64
# Hash domain: first 13 hex chars of md5 = 52 bits, exact in BIGINT on
# both engines (Spark CONV <-> DuckDB char-fold, probed identical).
_KMV_SCALE = 16**13

# hex13(md5(user_id)) -> BIGINT, per dialect (same value, probed)
_H13_SPARK = (
    "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 13), 16, 10)"
    " AS BIGINT)"
)
_H13_DUCK = (
    "list_reduce(list_transform("
    "string_split(substr(md5(CAST(user_id AS STRING)), 1, 13), ''),"
    " c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),"
    " (a, b) -> a * 16 + b)"
)


def _kmv_distinct_sql(h13: str) -> str:
    return f"""
    WITH hv AS (
      SELECT DISTINCT event_type, {h13} AS h
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    rk AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM hv),
    sk AS (SELECT event_type, h, rn FROM rk WHERE rn <= {_KMV_K})
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS sketch_size,
           CAST(MAX(h) AS BIGINT) AS kth_min,
           CAST(CASE WHEN COUNT(*) < {_KMV_K} THEN COUNT(*)
                ELSE (({_KMV_K} - 1) * {_KMV_SCALE}) // MAX(h) END
             AS BIGINT) AS est_distinct
    FROM sk GROUP BY event_type
    """


def _kmv_overlap_sql(h13: str) -> str:
    return f"""
    WITH hv AS (
      SELECT DISTINCT event_type, {h13} AS h
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
    rk AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM hv),
    sk AS (SELECT event_type, h FROM rk WHERE rn <= {_KMV_K}),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM (SELECT DISTINCT event_type FROM sk) a
      JOIN (SELECT DISTINCT event_type FROM sk) b
        ON a.event_type < b.event_type),
    uni AS (
      SELECT p.type_a, p.type_b, s.h,
             MAX(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END)
               AS in_a,
             MAX(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END)
               AS in_b
      FROM pairs p
      JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
      GROUP BY p.type_a, p.type_b, s.h),
    mrk AS (
      SELECT type_a, type_b, h, in_a, in_b,
             ROW_NUMBER() OVER (PARTITION BY type_a, type_b
                                ORDER BY h) AS rn
      FROM uni),
    msk AS (SELECT * FROM mrk WHERE rn <= {_KMV_K}),
    agg AS (
      SELECT type_a, type_b,
             COUNT(*) AS n_u,
             MAX(h) AS kth_u,
             SUM(in_a * in_b) AS k_inter
      FROM msk GROUP BY type_a, type_b),
    est AS (
      SELECT type_a, type_b, k_inter, n_u,
             CASE WHEN n_u < {_KMV_K} THEN n_u
                  ELSE (({_KMV_K} - 1) * {_KMV_SCALE}) // kth_u END
               AS est_union
      FROM agg)
    SELECT type_a, type_b,
           CAST(est_union AS BIGINT) AS est_union,
           CAST(k_inter AS BIGINT) AS k_inter,
           CAST(CASE WHEN n_u < {_KMV_K} THEN k_inter
                ELSE (k_inter * est_union) // {_KMV_K} END AS BIGINT)
             AS est_intersection
    FROM est
    """


@query(
    "d11_kmv_distinct",
    oracle=_kmv_distinct_sql(_H13_DUCK).replace(" // ", " // "),
)
def d11_kmv_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """D11: KMV (k-minimum-values) distinct-count sketch per event
    type — the THIRD cardinality sketch next to HLL (d11_hll_*) and
    exact COUNT(DISTINCT) (b12), kept because KMV is the one that
    supports SET OPERATIONS (d11_kmv_overlap) and is bit-reproducible:
    given the fixed md5-derived 52-bit hash, the k smallest values and
    the (K-1)*2^52 DIV kth estimator are pure integer arithmetic, so
    the DuckDB oracle hash-matches EXACTLY — no rows-only exemption
    needed, unlike typical randomized sketches. Accuracy (~1/sqrt(K-2)
    relative error) is pinned separately by a test against the exact
    counts.

    Scale: the sketch build is one window rank per group over the
    deduped (group, hash) projection — the same distrank-able shape as
    every top-k in this repo — and everything after operates on K-row
    summaries, never the corpus. Spark leg spells hex13->BIGINT as
    ``CONV(...,16,10)``; the oracle folds chars (DuckDB has no CONV) —
    probed identical.
    """
    from event_streamer_spark.tables import register_views

    register_views(spark, sf)
    return spark.sql(
        _kmv_distinct_sql(_H13_SPARK).replace(" // ", " DIV ")
    )


@query("d11_kmv_overlap", oracle=_kmv_overlap_sql(_H13_DUCK))
def d11_kmv_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """D11: audience-overlap estimation from KMV sketches — for every
    event-type pair, estimate |A∪B| from the MERGED k-sketch (k
    smallest of the union of the two k-sketches) and |A∩B| by the
    Beyer et al. ratio estimator ``K∩ · est_union / K`` where ``K∩``
    counts merged-sketch members present in BOTH input sketches (when
    the union FITS inside the sketch, the sketch is the union itself
    and ``k_inter`` is returned exactly — the ratio would wrongly
    divide by the unfilled capacity K). This
    is the query family exact COUNT(DISTINCT) cannot serve at scale:
    pairwise overlap over N groups needs only the N k-sized sketches
    (built once, one corpus pass), not N² corpus joins — the
    theta-sketch workflow, in deterministic integer arithmetic the
    oracle reproduces bit-for-bit.
    """
    from event_streamer_spark.tables import register_views

    register_views(spark, sf)
    return spark.sql(
        _kmv_overlap_sql(_H13_SPARK).replace(" // ", " DIV ")
    )


def kmv_shard(events_df: DataFrame) -> DataFrame:
    """Per-type K-minimum-values sketch SHARD of an events frame
    (event_type, h BIGINT) — the mergeable unit: k-min sketches merge
    as k-min of the deduped union (associative, commutative,
    idempotent), which is what makes the incremental leg
    (``streaming.dedup.kmv_batch``) replay-equal to batch under ANY
    micro-batch boundary. Spark-leg hash spelling (CONV), identical to
    the oracle's char-fold by probe."""
    from pyspark.sql import Window as W

    hv = (
        events_df.filter(
            F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
        )
        .selectExpr("event_type", f"{_H13_SPARK} AS h")
        .distinct()
    )
    rk = F.row_number().over(
        W.partitionBy("event_type").orderBy("h")
    )
    return (
        hv.withColumn("rn", rk)
        .filter(F.col("rn") <= _KMV_K)
        .select("event_type", "h")
    )


def kmv_estimate(shards: DataFrame) -> DataFrame:
    """(event_type, sketch_size, kth_min, est_distinct) from any union
    of sketch shards — THE one copy of the estimator, shared by the
    streaming read path; the batch query's SQL text computes the same
    arithmetic (pinned by the replay-equality test)."""
    from pyspark.sql import Window as W

    rk = F.row_number().over(W.partitionBy("event_type").orderBy("h"))
    sk = (
        shards.select("event_type", "h")
        .distinct()
        .withColumn("rn", rk)
        .filter(F.col("rn") <= _KMV_K)
    )
    n = F.count(F.lit(1))
    return sk.groupBy("event_type").agg(
        n.cast("bigint").alias("sketch_size"),
        F.max("h").cast("bigint").alias("kth_min"),
        F.when(n < _KMV_K, n)
        .otherwise(
            F.expr(f"(({_KMV_K} - 1) * {_KMV_SCALE}) DIV MAX(h)")
        )
        .cast("bigint")
        .alias("est_distinct"),
    )


def kmv_overlap_from(sk: DataFrame) -> DataFrame:
    """Pairwise audience-overlap estimates from a per-type k-sketch
    frame (event_type, h) — the DataFrame twin of the
    ``d11_kmv_overlap`` SQL, shared with the streaming read path
    (``streaming.dedup.read_kmv_overlap``); the replay-equality test
    pins the two spellings together. ``sk`` is referenced three times
    (type list + the pair-member join): persist before calling."""
    types = sk.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
    )
    members = pairs.select(
        "type_a",
        "type_b",
        F.explode(F.array("type_a", "type_b")).alias("event_type"),
    )
    uni = (
        members.join(sk, "event_type")
        .groupBy("type_a", "type_b", "h")
        .agg(
            F.max(
                F.when(F.col("event_type") == F.col("type_a"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == F.col("type_b"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    from pyspark.sql import Window as W

    rk = F.row_number().over(
        W.partitionBy("type_a", "type_b").orderBy("h")
    )
    msk = uni.withColumn("rn", rk).filter(F.col("rn") <= _KMV_K)
    agg = msk.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_u"),
        F.max("h").alias("kth_u"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("k_inter"),
    )
    est_union = F.when(F.col("n_u") < _KMV_K, F.col("n_u")).otherwise(
        F.expr(f"(({_KMV_K} - 1) * {_KMV_SCALE}) DIV kth_u")
    )
    out = agg.withColumn("est_union", est_union)
    return out.select(
        "type_a",
        "type_b",
        F.col("est_union").cast("bigint").alias("est_union"),
        F.col("k_inter").cast("bigint").alias("k_inter"),
        F.when(F.col("n_u") < _KMV_K, F.col("k_inter"))
        .otherwise(
            F.expr(f"(k_inter * est_union) DIV {_KMV_K}")
        )
        .cast("bigint")
        .alias("est_intersection"),
    )
