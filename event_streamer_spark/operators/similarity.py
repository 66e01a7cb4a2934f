"""Similarity search over embeddings (SURVEY §2.C D3).

* ``d3_topk_cosine`` — brute-force top-k for one query vector: a single
  narrow map over the table + TakeOrdered merge. The correctness
  baseline.
* ``d3_knn_join`` — blocked k-NN join (label blocks): exact within
  blocks, SQL-checkable.
* ``d3_ann_lsh`` — random-hyperplane LSH: the scale path. Bucket by
  sign-pattern, search only within buckets. Deterministic (seeded
  planes baked in as literals).

All cosine math is double-precision and rounded to 6 decimals — the
grain (5e-7) is ~8 orders above double summation noise, so any
summation order on either engine hashes identically.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load

_QUERY_VEC_ID = 0  # fixed query vector for the top-k baseline


@functools.lru_cache(maxsize=32)
def _seeded_planes(seed: int, n_planes: int, dim: int) -> np.ndarray:
    """Seeded random hyperplanes, generated lazily PER DIMENSION
    (round 11): the first draft drew a fixed (n, 64) matrix driver-side
    and broadcast it, welding the LSH family to the fixture's 64-dim
    vectors. Workers regenerate instead (16k draws — microseconds,
    lru-cached per process), so the same operator serves any corpus
    dimension; for dim=64 the C-order draw sequence reproduces the old
    matrices bit-for-bit, keeping every pinned determinism test green.
    """
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))

_PLANE_SEED = 7

# Degenerate-embedding domain guard (round 9, seeded dirty corpus): a
# NULL vector, an empty vector, or an all-zero vector has no position
# on the unit sphere — cosine against it is 0/0 — and a NULL/ragged
# row segfaults nothing but crashes np.array/GEMM batches. EVERY
# similarity-family operator excludes them at the scan (the filter is
# a narrow predicate, pushdown-friendly) and every oracle mirrors the
# same predicate, so both engines agree on the domain instead of each
# choosing an error behavior (Spark: PythonException in the Arrow
# batch or ANSI DIVIDE_BY_ZERO; DuckDB: NaN-valued similarities).
_VALID_EMB_SPARK = (
    "embedding IS NOT NULL AND size(embedding) > 0 AND "
    "aggregate(CAST(embedding AS ARRAY<DOUBLE>), 0D,"
    " (s, y) -> s + y * y) > 0"
)
_VALID_EMB_DUCK = (
    "embedding IS NOT NULL AND len(embedding) > 0 AND "
    "list_sum(list_transform(CAST(embedding AS DOUBLE[]),"
    " y -> y * y)) > 0"
)


def load_embeddings(spark: SparkSession, sf: str) -> DataFrame:
    """The embeddings table restricted to the similarity domain (see
    ``_VALID_EMB_SPARK``), with EXACT duplicate rows collapsed —
    re-delivered ingest rows (same id, same vector) would otherwise
    make the per-row top-k legs emit one candidate list per copy while
    the per-key SQL oracles rank once (round-9 dirty corpus, rowcount
    1503 vs 1482 on d3_knn_join). Conflicting identities (same vec_id,
    different vectors) stay the caller's bug — both engines then see
    the same two identities and agree. Oracles over embeddings must
    mirror with ``SELECT DISTINCT … WHERE _VALID_EMB_DUCK``. The
    distinct is one shuffle at ingest grain; callers that can prove
    unique ids upstream can read ``tables.load`` directly."""
    return (
        load(spark, sf, "embeddings")
        .filter(F.expr(_VALID_EMB_SPARK))
        .distinct()
    )


def _cosine(a: str, b: str) -> F.Column:
    """cos(a, b) as a JVM-side expression over array<double> columns."""
    dot = F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (s, v) -> s + v)")
    na = F.expr(f"aggregate({a}, 0D, (s, v) -> s + v * v)")
    nb = F.expr(f"aggregate({b}, 0D, (s, v) -> s + v * v)")
    return dot / (F.sqrt(na) * F.sqrt(nb))


@query(
    "d3_topk_cosine",
    oracle=f"""
    WITH q AS (SELECT MIN(CAST(embedding AS DOUBLE[])) AS qv
               FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}),
    s AS (SELECT DISTINCT vec_id,
                 ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv), 6) AS sim
          FROM embeddings, q
          WHERE vec_id <> {_QUERY_VEC_ID} AND {_VALID_EMB_DUCK})
    SELECT vec_id, sim FROM s ORDER BY sim DESC, vec_id LIMIT 10
    """,
)
def d3_topk_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """D3 baseline: brute-force cosine top-10 for a fixed query vector.

    Scale: one narrow map computing the score + TakeOrderedAndProject
    (per-partition top-k, driver merges k·P rows) — no shuffle of the
    table. Ties broken by (rounded sim, vec_id) so the row set is stable.
    The query vector is the MIN array among the id's copies (elementwise
    lexicographic, both engines) — ``head()`` on an unordered filter was
    engine-arbitrary under the conflicting-duplicate corruption class
    (the d3_knn_join seed-20260820 find applied to the query side).
    """
    emb = load_embeddings(spark, sf).withColumn(
        "vec", F.col("embedding").cast("array<double>")
    )
    qrow = (
        emb.filter(F.col("vec_id") == _QUERY_VEC_ID)
        .agg(F.min("vec").alias("vec"))
        .head()
    )
    qlit = F.array(*[F.lit(float(x)) for x in qrow["vec"]])
    scored = (
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .withColumn("q", qlit)
        .select("vec_id", F.round(_cosine("vec", "q"), 6).alias("sim"))
    )
    return scored.orderBy(F.desc("sim"), "vec_id").limit(10)



def _block_topk(blocks: DataFrame, block_col: str, k: int = 3) -> DataFrame:
    """Exact top-k cosine neighbors within each block via one numpy GEMM
    per block (applyInPandas). Blocks shuffle once on the block key;
    memory per task is O(block²) scores, bounded by the blocking scheme.
    ~50× faster than a self-join with per-pair array expressions."""

    def topk(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.array(pdf["v"].tolist(), dtype=np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        S = X @ X.T
        np.fill_diagonal(S, -2.0)
        ids = pdf["vec_id"].to_numpy()
        out = {"src": [], "nbr": [], "sim": []}
        kk = min(k, len(ids) - 1)
        for i in range(len(ids)):
            sims = np.round(S[i], 6)
            order = np.lexsort((ids, -sims))[:kk]
            for j in order:
                out["src"].append(ids[i])
                out["nbr"].append(ids[j])
                out["sim"].append(float(sims[j]))
        return pd.DataFrame(out)

    return blocks.groupBy(block_col).applyInPandas(
        topk, "src long, nbr long, sim double"
    )


_EXACT_TOPK_BLOCKS = 8


def exact_top3_blocked(emb: DataFrame) -> DataFrame:
    """Exact GLOBAL top-3 cosine neighbors per vector, distributed — the
    verification leg for the approximate d3 paths' bounded-check
    oracles (round-10).

    Residents hash into NB fixed blocks (pmod so negative ids still
    land in probed blocks); every query vector replicates to ALL NB
    blocks — shuffle volume n·(NB+1) rows, linear in n, never the n²
    pair space. One numpy GEMM per block scores queries against that
    block's residents; per-block top-3s merge globally per source with
    one partitioned window over 3·NB rows per src (provably equal to
    top-3 over the union). No driver state, no broadcast of the table.
    """
    from pyspark.sql import Window

    nb = _EXACT_TOPK_BLOCKS
    res = emb.select(
        "vec_id", "v",
        F.pmod(F.col("vec_id"), F.lit(nb)).cast("int").alias("blk"),
        F.lit("R").alias("role"),
    )
    qry = emb.select(
        "vec_id", "v",
        F.explode(F.sequence(F.lit(0), F.lit(nb - 1))).alias("blk"),
        F.lit("Q").alias("role"),
    )

    def topk(pdf: pd.DataFrame) -> pd.DataFrame:
        res_p = pdf[pdf["role"] == "R"]
        qry_p = pdf[pdf["role"] == "Q"]
        if res_p.empty or qry_p.empty:
            return pd.DataFrame({"src": [], "nbr": [], "sim": []})
        R = np.array(res_p["v"].tolist(), dtype=np.float64)
        Q = np.array(qry_p["v"].tolist(), dtype=np.float64)
        R = R / np.linalg.norm(R, axis=1, keepdims=True)
        Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        S = np.round(Q @ R.T, 6)
        rid = res_p["vec_id"].to_numpy()
        qid = qry_p["vec_id"].to_numpy()
        out = {"src": [], "nbr": [], "sim": []}
        kk = min(3, len(rid))
        for i in range(len(qid)):
            sims = S[i].copy()
            sims[rid == qid[i]] = -2.0  # never self-match
            order = np.lexsort((rid, -sims))[:kk]
            for j in order:
                if sims[j] <= -2.0:
                    continue
                out["src"].append(qid[i])
                out["nbr"].append(rid[j])
                out["sim"].append(float(sims[j]))
        return pd.DataFrame(out)

    per_block = res.unionByName(qry).groupBy("blk").applyInPandas(
        topk, "src long, nbr long, sim double"
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), "nbr")
    return (
        per_block.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .drop("__rn")
    )


def _recall_check(
    approx: DataFrame, exact: DataFrame, bound: float, out_col: str
) -> DataFrame:
    """One-row ``(out_col boolean)``: |approx ∩ exact| ≥ bound·|exact|
    over (src, nbr) pair sets — the shared shape of the d3
    bounded-check wrappers. Empty exact set ⇒ vacuously true (and the
    oracle side still pins the single TRUE row)."""
    hits = (
        approx.select("src", "nbr")
        .join(exact.select("src", "nbr"), ["src", "nbr"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    tot = exact.agg(F.count(F.lit(1)).alias("n_tot"))
    return hits.crossJoin(F.broadcast(tot)).select(
        (F.col("n_hit") >= F.lit(bound) * F.col("n_tot")).alias(out_col)
    )


@query(
    "d3_knn_join",
    oracle=f"""
    WITH e0 AS (SELECT DISTINCT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings
                WHERE {_VALID_EMB_DUCK} AND label IS NOT NULL),
    e AS (SELECT vec_id, label, v FROM (
            SELECT vec_id, label, v,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY label, v) AS rn
            FROM e0) WHERE rn = 1),
    pairs AS (
      SELECT a.vec_id AS src, b.vec_id AS nbr,
             ROUND(list_cosine_similarity(a.v, b.v), 6) AS sim
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
    ranked AS (
      SELECT src, nbr, sim,
             ROW_NUMBER() OVER (PARTITION BY src ORDER BY sim DESC, nbr) AS rn
      FROM pairs)
    SELECT src, nbr, sim FROM ranked WHERE rn <= 3
    """,
)
def d3_knn_join(spark: SparkSession, sf: str) -> DataFrame:
    """D3: blocked exact k-NN join — 3 nearest label-mates per vector.

    Blocking on ``label`` keeps the pair space O(Σ block²) instead of
    O(n²); the same shape as an IVF coarse quantizer (block = centroid
    assignment). Each block is scored with one numpy GEMM
    (:func:`_block_topk`) — a single shuffle on label, no pair
    materialization.

    NULL block keys are EXCLUDED on both engines (round-9 dirty
    corpus): Spark's groupBy collects NULL labels into one spurious
    block and scores them against each other, while SQL equi-join
    blocking never matches NULL = NULL — unblockable rows are out of
    the operator's domain, not silently co-blocked.

    CONFLICTING identities (one vec_id, different payloads — the
    CDC/rekey corruption class) are canonicalized to ONE row per
    vec_id first (min (label, v), a total order: labels are ints and
    array<double> compares elementwise): k-NN ranks PER IDENTITY, so
    a two-copy id would otherwise emit a top-3 per copy on the
    blocked-GEMM side while the SQL oracle ranks one window per src —
    caught by hostile seed 20260820 (vec_id 304, +3 rows), the same
    one-row-per-key rule as d1 spans / b65 CDC. The min is a
    map-combinable groupBy (no window shuffle) and a no-op on clean
    unique-id data.
    """
    e = (
        load_embeddings(spark, sf)
        .filter(F.col("label").isNotNull())
        .select(
            "vec_id",
            F.struct(
                F.col("label").alias("label"),
                F.col("embedding").cast("array<double>").alias("v"),
            ).alias("lv"),
        )
        .groupBy("vec_id")
        .agg(F.min("lv").alias("lv"))
        .select(
            "vec_id",
            F.col("lv.label").alias("block"),
            F.col("lv.v").alias("v"),
        )
    )
    return _block_topk(e, "block", 3)


_ANN_TABLES = 8  # L independent hash tables
_ANN_PLANES = 6  # planes (bits) per table


def ann_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """D3 scale path: multi-table, multi-probe hyperplane LSH top-3.
    (Raw pair frame — the registered ``d3_ann_lsh`` wraps it in the
    round-10 bounded recall check; tests call this directly.)

    L=8 independent tables of 6 hyperplanes each; every vector RESIDES
    in its sign-pattern bucket per table and PROBES that bucket plus the
    6 one-bit-flip neighbors (multi-probe). Per (table, bucket): one
    numpy GEMM scores queriers against residents; per-bucket top-3s are
    re-ranked globally per source (provably equal to top-3 over the
    candidate union). Recall@3 ≈ 0.9 on the fixture — measured against
    brute force in tests/test_dedup_quality.py; the fixture's neighbors
    sit at cos 0.3-0.45 (near-random), the hardest regime for sign LSH,
    which is what forces L·(planes+1) probes. Shuffle volume
    O(n·L·(planes+2)) — linear in n, no O(n²) stage, no driver state.
    Deterministic: seeded planes, 6-decimal rounding, (sim, nbr) ties.
    """
    n_buckets = 1 << _ANN_PLANES

    @pandas_udf("homes array<int>, probes array<int>")
    def bucket_keys(vs: pd.Series) -> pd.DataFrame:
        if vs.empty:
            return pd.DataFrame({"homes": [], "probes": []})
        X = np.array(vs.tolist(), dtype=np.float64)
        planes = _seeded_planes(
            _PLANE_SEED, _ANN_TABLES * _ANN_PLANES, X.shape[1]
        ).reshape(_ANN_TABLES, _ANN_PLANES, -1)
        weights = (1 << np.arange(_ANN_PLANES)).astype(np.int64)
        homes = np.empty((len(X), _ANN_TABLES), dtype=np.int64)
        for t in range(_ANN_TABLES):
            signs = (X @ planes[t].T) > 0
            homes[:, t] = t * n_buckets + signs @ weights
        flips = np.stack(
            [homes ^ (1 << j) for j in range(_ANN_PLANES)], axis=2
        )  # flipping low bits never crosses the per-table offset
        probes = np.concatenate([homes[:, :, None], flips], axis=2)
        return pd.DataFrame(
            {
                "homes": homes.astype("int32").tolist(),
                "probes": probes.reshape(len(X), -1).astype("int32").tolist(),
            }
        )

    e = (
        load_embeddings(spark, sf)
        # single-file parquet → one split; spread the UDF work
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("k", bucket_keys("v"))
        .persist()
    )
    residents = e.select(
        "vec_id", "v", F.explode("k.homes").alias("bucket"), F.lit("R").alias("role")
    )
    queriers = e.select(
        "vec_id", "v", F.explode("k.probes").alias("bucket"), F.lit("Q").alias("role")
    )

    def bucket_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        res = pdf[pdf["role"] == "R"]
        qry = pdf[pdf["role"] == "Q"].drop_duplicates("vec_id")
        if res.empty or qry.empty:
            return pd.DataFrame({"src": [], "nbr": [], "sim": []})
        R = np.array(res["v"].tolist(), dtype=np.float64)
        Q = np.array(qry["v"].tolist(), dtype=np.float64)
        R = R / np.linalg.norm(R, axis=1, keepdims=True)
        Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        S = np.round(Q @ R.T, 6)
        rid = res["vec_id"].to_numpy()
        qid = qry["vec_id"].to_numpy()
        out = {"src": [], "nbr": [], "sim": []}
        kk = min(3, len(rid))
        for i in range(len(qid)):
            sims = S[i].copy()
            sims[rid == qid[i]] = -2.0  # never self
            order = np.lexsort((rid, -sims))[:kk]
            for j in order:
                if sims[j] <= -2.0:
                    continue
                out["src"].append(qid[i])
                out["nbr"].append(rid[j])
                out["sim"].append(float(sims[j]))
        return pd.DataFrame(out)

    per_bucket = (
        residents.unionByName(queriers)
        .groupBy("bucket")
        .applyInPandas(bucket_topk, "src long, nbr long, sim double")
    )
    # same (src, nbr) may surface from several tables: dedup, then global
    # top-3 re-rank (bucket-local top-3 ⊇ global top-3 of the union)
    dedup = per_bucket.groupBy("src", "nbr").agg(F.max("sim").alias("sim"))
    w = Window.partitionBy("src").orderBy(F.desc("sim"), "nbr")
    return (
        dedup.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("src", "nbr", "sim")
    )


@query("d3_ann_lsh", oracle="SELECT TRUE AS recall_ok")
def d3_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """D3: multi-probe LSH ANN, registered as a BOUNDED-CHECK oracle
    query (round-10, b13-style): the LSH top-3 pairs
    (:func:`ann_lsh_topk`) are scored against the exact global top-3
    (:func:`exact_top3_blocked` — distributed, linear shuffle) and the
    single output row pins recall@3 ≥ 0.75. Measured ≈ 0.90 on the
    fixture (clean-fixture pytest keeps the tighter 0.85 assertion);
    the oracle bound leaves ~3× the observed slack so the fresh-seed
    hostile replay — where the embedding geometry shifts every round —
    trips only on a real recall regression, not on seed noise.
    """
    emb = load_embeddings(spark, sf).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return _recall_check(
        ann_lsh_topk(spark, sf), exact_top3_blocked(emb), 0.75, "recall_ok"
    )


_TILE_BLOCKS = 8  # block grid size; pick ≈ n·dim·8B / task-mem at scale


def _tile_pairs(emb: DataFrame, n_blocks: int, threshold: float) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via a tiled block-pair GEMM.

    Distributed matrix-tiling: each vector lands in block
    ``pmod(vec_id, NB)``; a vector in block b is shipped to every tile
    (b, j≥b) as the Left role and every tile (i≤b, b) as the Right role,
    so every unordered pair meets in exactly one of the NB(NB+1)/2
    tiles. One shuffle of n·(NB+1) rows, one numpy GEMM per tile,
    per-task memory bounded by 2·(n/NB)·dim doubles — no driver
    collect, no broadcast of the table, no O(n²) row materialization.
    """
    blk = emb.withColumn(
        "blk", F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int")
    )
    left = blk.select(
        "vec_id",
        "v",
        F.lit("L").alias("role"),
        F.col("blk").alias("bi"),
        F.explode(F.expr(f"sequence(blk, {n_blocks - 1})")).alias("bj"),
    )
    right = blk.select(
        "vec_id",
        "v",
        F.lit("R").alias("role"),
        F.explode(F.expr("sequence(0, blk)")).alias("bi"),
        F.col("blk").alias("bj"),
    )

    def score_tile(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = key
        lhs = pdf[pdf["role"] == "L"]
        rhs = pdf[pdf["role"] == "R"]
        if lhs.empty or rhs.empty:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "sim": []})
        A = np.array(lhs["v"].tolist(), dtype=np.float64)
        B = np.array(rhs["v"].tolist(), dtype=np.float64)
        A = A / np.linalg.norm(A, axis=1, keepdims=True)
        B = B / np.linalg.norm(B, axis=1, keepdims=True)
        S = A @ B.T  # one GEMM per tile
        ida = lhs["vec_id"].to_numpy()
        idb = rhs["vec_id"].to_numpy()
        mask = S >= threshold
        if bi == bj:
            # diagonal tile holds each vector in both roles: keep the
            # upper triangle so each unordered pair is emitted once
            mask &= ida[:, None] < idb[None, :]
        ii, jj = np.nonzero(mask)
        va, vb = ida[ii], idb[jj]
        if bi != bj:
            # off-diagonal roles are disjoint blocks; order the pair ids
            va, vb = np.minimum(va, vb), np.maximum(va, vb)
        return pd.DataFrame(
            {"vec_a": va, "vec_b": vb, "sim": np.round(S[ii, jj], 6)}
        )

    return (
        left.unionByName(right)
        .groupBy("bi", "bj")
        .applyInPandas(score_tile, "vec_a long, vec_b long, sim double")
    )


@query(
    "d2_embedding_neardup",
    oracle=f"""
    WITH e AS (SELECT DISTINCT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE {_VALID_EMB_DUCK})
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_cosine_similarity(a.v, b.v), 6) AS sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.45
    """,
)
def d2_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """D2: embedding-cosine near-duplicate pairs (exact, cos ≥ 0.45).

    Physical design: tiled block-pair GEMM (:func:`_tile_pairs`) — fully
    distributed, no driver collect, no broadcast of the table. Per-task
    memory is bounded by two blocks (2·(n/NB)·dim doubles) regardless of
    n; shuffle volume is n·(NB+1) rows. Exact all-pairs is inherently
    O(n²) compute, so at 100 TB this operator is the exact verifier that
    runs AFTER candidate pruning (see :func:`d2_neardup_lsh_pruned` for
    the pruned path); standalone it defines the semantics the oracle
    checks, and its dataflow — unlike a driver-side compare — spreads
    that compute across the cluster.
    """
    emb = load_embeddings(spark, sf).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return _tile_pairs(emb, _TILE_BLOCKS, 0.45)


_PRUNE_BANDS = 16
_PRUNE_ROWS = 4  # planes per band
_PRUNE_SEED = 13


def neardup_lsh_pruned_pairs(
    spark: SparkSession,
    sf: str,
    bands: int = _PRUNE_BANDS,
    rows: int = _PRUNE_ROWS,
    threshold: float = 0.45,
) -> DataFrame:
    """D2 scale path: near-dup pairs from banded hyperplane-LSH candidates.
    (Raw pair frame — the registered ``d2_neardup_lsh_pruned`` wraps it
    in the round-10 bounded recall check with the fixture defaults;
    tests call this directly.)

    A vector's band bucket is its ``rows``-bit sign pattern; any shared
    (band, bucket) makes a candidate pair, exact-rescored at
    ``threshold``. For plane-agreement p = 1 − θ/π, recall is
    1 − (1 − p^rows)^bands; RANDOM pairs collide per band with
    probability ~2^-rows, so expected candidate volume is
    ~bands · n² / 2^(rows+1) + the true-pair mass.

    **The band geometry is a function of corpus size and threshold
    regime, not a constant** (round 11, found by the 2M-vector probe):
    the fixture default (16×4 — only 16 buckets per band) is forced by
    the fixture's adversarially-hard cos≈0.45 regime (θ≈63°, p≈0.65,
    so deep bands destroy recall) and is fine at fixture counts, but
    at 50k vectors it already generates ~10⁹ candidates — banded LSH
    is only subquadratic when ``rows ≳ log2(n)``. At the production
    near-dup regime (cos ≥ 0.9, θ≤26°, p ≥ 0.86) deep bands are
    cheap: 16×24 holds planted-dup recall ≈ 1 at 2M×256 with ~n-sized
    candidate volume (measured, `scripts/embed_scale_probe.py`).
    Callers own the choice; the registered fixture query keeps 16×4.
    Approximate — recall vs the exact op is asserted in
    tests/test_dedup_quality.py.
    """
    if rows > 30:
        raise ValueError("rows > 30 overflows the int32 bucket encoding")

    @pandas_udf("array<int>")
    def band_buckets(vs: pd.Series) -> pd.Series:
        if vs.empty:
            return pd.Series([], dtype=object)
        X = np.array(vs.tolist(), dtype=np.float64)
        planes = _seeded_planes(_PRUNE_SEED, bands * rows, X.shape[1])
        signs = ((X @ planes.T) > 0).astype(np.int64)
        signs = signs.reshape(len(X), bands, rows)
        weights = (1 << np.arange(rows)).astype(np.int64)
        return pd.Series((signs @ weights).astype("int32").tolist())

    emb = (
        load_embeddings(spark, sf)
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    ).persist()
    bands = emb.select(
        "vec_id", F.posexplode(band_buckets("v")).alias("band", "bucket")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    pairs = cand.join(
        emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va")), "vec_a"
    ).join(
        emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb")), "vec_b"
    )

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(pdf["va"].tolist(), dtype=np.float64)
            Y = np.array(pdf["vb"].tolist(), dtype=np.float64)
            X = X / np.linalg.norm(X, axis=1, keepdims=True)
            Y = Y / np.linalg.norm(Y, axis=1, keepdims=True)
            sims = np.einsum("ij,ij->i", X, Y)  # row-wise dot, one pass
            keep = sims >= threshold
            yield pd.DataFrame(
                {
                    "vec_a": pdf["vec_a"].to_numpy()[keep],
                    "vec_b": pdf["vec_b"].to_numpy()[keep],
                    "sim": np.round(sims[keep], 6),
                }
            )

    return pairs.mapInPandas(score, "vec_a long, vec_b long, sim double")


@query(
    "d2_neardup_lsh_pruned",
    oracle=f"""
    WITH e AS (SELECT DISTINCT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings WHERE {_VALID_EMB_DUCK})
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, TRUE AS recall_ok
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.45
    """,
)
def d2_neardup_lsh_pruned(spark: SparkSession, sf: str) -> DataFrame:
    """D2 scale path registered as a BOUNDED-CHECK oracle query
    (round-10, b13-style): the LSH-pruned pair set
    (:func:`neardup_lsh_pruned_pairs`) is scored against the EXACT
    cos ≥ 0.45 pair set (the ``d2_embedding_neardup`` plan — itself
    hash-checked against DuckDB's all-pairs oracle), emitting the
    exact pair count as a hash-checked column plus a recall ≥ 0.7
    boolean. Precision needs no check — every emitted pair is exactly
    re-scored before the threshold, so false positives are impossible
    by construction (pinned in tests). Analytic recall at the
    fixture's hardest regime (cos ≈ 0.46) is ≈ 0.956; pytest keeps the
    tighter 0.8 assertion, the looser oracle bound survives fresh-seed
    hostile geometry.
    """
    found = neardup_lsh_pruned_pairs(spark, sf).select("vec_a", "vec_b")
    exact = d2_embedding_neardup(spark, sf).select("vec_a", "vec_b")
    hits = found.join(exact, ["vec_a", "vec_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    tot = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    return tot.crossJoin(F.broadcast(hits)).select(
        F.col("n_exact").cast("bigint").alias("n_exact"),
        (F.col("n_hit") >= F.lit(0.7) * F.col("n_exact")).alias("recall_ok"),
    )


_IVF_CELLS = 8
_IVF_SEED = 11
_IVF_KMEANS_ITERS = 3


def random_ivf_centroids(dim: int = 64, k: int = _IVF_CELLS) -> np.ndarray:
    """Seeded random unit centroids — the untrained baseline.

    ``k``/``dim`` are parameters (round 11): the registered queries
    keep the fixture-sized defaults for cross-round comparability, but
    IVF sizing is corpus-dependent — the classic rule is K ≈ √n so the
    within-cell quadratic work stays ~n·√n total — and the
    embedding-scale probe (``scripts/embed_scale_probe.py``) trains
    √n-cell quantizers over 256-dim corpora.
    """
    rng = np.random.RandomState(_IVF_SEED)
    cents = rng.standard_normal((k, dim))
    return cents / np.linalg.norm(cents, axis=1, keepdims=True)


def _cell_assigner(spark: SparkSession, cents: np.ndarray):
    """argmax-cosine cell assignment as an Arrow-batched UDF."""
    b_cents = spark.sparkContext.broadcast(cents)

    @pandas_udf("int")
    def cell_of(vs: pd.Series) -> pd.Series:
        X = np.array(vs.tolist(), dtype=np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        return pd.Series(np.argmax(X @ b_cents.value.T, axis=1).astype("int32"))

    return cell_of


def _multi_cell_assigner(spark: SparkSession, cents: np.ndarray, p: int):
    """Top-``p``-cosine cell assignment (deterministic: sim desc, cell
    asc on ties), ordered nearest-first — ``cells[0]`` is the argmax
    home cell, identical to :func:`_cell_assigner`'s choice."""
    b_cents = spark.sparkContext.broadcast(cents)

    @pandas_udf("array<int>")
    def cells_of(vs: pd.Series) -> pd.Series:
        C = b_cents.value
        X = np.array(vs.tolist(), dtype=np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        S = X @ C.T
        take = min(p, C.shape[0])
        out = []
        for i in range(len(X)):
            order = np.lexsort((np.arange(C.shape[0]), -S[i]))[:take]
            out.append(order.astype("int32").tolist())
        return pd.Series(out)

    return cells_of


def train_ivf_centroids(
    spark: SparkSession,
    emb: DataFrame,
    iters: int = _IVF_KMEANS_ITERS,
    k: int = _IVF_CELLS,
) -> np.ndarray:
    """Spherical k-means coarse quantizer, trained DataFrame-side.

    Each iteration is ONE fused Arrow pass: assign cells (numpy GEMM
    against the broadcast centroids) and reduce to per-cell partial
    sum vectors INSIDE the same batch iterator — each partition emits
    at most K (cell, Σv, n) rows, a second K-group merge collapses the
    partials, and only the K×dim result (model state, independent of
    n) ever reaches the driver. Round 11: this replaces the first
    draft's posexplode + groupBy, which pushed n·dim exploded rows per
    iteration through a hash aggregate — correct, but at 2M×256 that
    is 512M rows per iteration for an aggregate whose true input is
    partitions×K partial rows. Deterministic: seeded init and
    centroids rounded to 6 decimals each round, so summation-order
    noise (~1e-13) cannot flip assignments. Empty cells keep their
    previous centroid.

    ``k`` and the vector dimension are no longer fixture constants
    (round 11): dim comes from the data (one LIMIT-1 probe — planning
    cost, not a scan) and ``k`` from the caller, so the same trainer
    serves the 2000×64 fixture (K=8 default) and the √n-cell sizing
    the embedding-scale probe uses at 2M×256.
    """
    row = emb.select(F.size("v")).head()
    if row is None:
        # empty / fully-domain-filtered corpus: nothing to train on —
        # return the seeded init at the fixture dim so downstream
        # assignment plans still build and produce zero rows (r12,
        # ADVICE: head()[0] raised TypeError here)
        return np.round(random_ivf_centroids(k=k), 6)
    dim = row[0]
    cents = np.round(random_ivf_centroids(dim=dim, k=k), 6)
    # Bounded training sample (r13, VERDICT #3): each Lloyd's iteration
    # is a full-corpus GEMM against K centroids, and the probe sizes K
    # as sqrt(n) — per-pass work n^1.5·dim, which read 15.5/31.5/208 s
    # at 50k/500k/2M (EMBED_SCALE_r12, superlinear on the top point).
    # The published IVF recipe (FAISS) trains the coarse quantizer on a
    # SAMPLE — tens to ~256 points per centroid suffice — so when the
    # corpus exceeds max(131072, 64·k) the trainer keeps every
    # ``vec_id % step == 0`` row (the PQ codebook sampling pattern:
    # deterministic across runs and partitionings, no RNG). The 131,072
    # floor exceeds every registered-grain corpus (sf0.1: 2,000; the
    # sf1 grain: 20,200) AND the 100k pytest-tier 256-dim corpus —
    # measured there: full-corpus training reads recall@3 = 1.0 where
    # a half-corpus sample reads 0.875 (the boundary-loss regime is
    # exactly where centroid jitter costs recall), so the floor keeps
    # every test gate at full strength; only the 500k/2M probe corpora
    # train sampled (125k rows → ≥88 points/centroid at 2M, above
    # FAISS's 39-point warning threshold). Assignment (the index
    # build) still covers the FULL corpus.
    train = emb
    cap = max(131072, 64 * k)
    n = None
    if "vec_id" in emb.columns:
        n = emb.count()
        if n > cap:
            step = -(-n // cap)  # ceil
            train = emb.filter(F.col("vec_id") % step == 0)
    # r13 (the BPE-trainer pattern): the train set is BOUNDED by `cap`
    # whenever vec_id sampling applies, so when rows×dim provably fits
    # the driver budget (spark.event_streamer.ivf.localTrainMaxCells,
    # default 2^25 doubles ≈ 256 MB) the Lloyd's loop runs driver-local
    # on the collected sample — one Arrow collect replaces one
    # mapInArrow + applyInPandas + collect JOB PER ITERATION. The local
    # loop is op-identical (same seeded init, same argmax assignment,
    # same mean/normalize/round(6) — the 6-decimal round already
    # declares summation-order noise irrelevant, which is what makes
    # partial-sum merge order interchangeable); centroid equality vs
    # the distributed loop is pinned by a forced-mode test. Oversized
    # train sets (huge k via 64·k, or no vec_id column) keep the
    # distributed loop.
    try:
        local_max = int(
            spark.conf.get(
                "spark.event_streamer.ivf.localTrainMaxCells",
                str(1 << 25),
            )
        )
    except Exception:  # pragma: no cover — connect-mode sessions
        local_max = 1 << 25
    bound = min(n, cap) if n is not None else None
    if bound is not None and bound * dim <= local_max:
        pdf = train.select("v").toPandas()
        X = np.array(pdf["v"].tolist(), dtype=np.float64)
        if len(X):
            X = X / np.linalg.norm(X, axis=1, keepdims=True)
            for _ in range(iters):
                cells = np.argmax(X @ cents.T, axis=1)
                order = np.argsort(cells, kind="stable")
                uniq, starts = np.unique(cells[order], return_index=True)
                sums = np.add.reduceat(X[order], starts, axis=0)
                counts = np.bincount(cells, minlength=cents.shape[0])
                new = cents.copy()
                for ci, s in zip(uniq, sums):
                    cn = counts[ci]
                    if cn > 0:
                        mean = s / cn
                        new[ci] = mean / np.linalg.norm(mean)
                cents = np.round(new, 6)
        return cents
    # persist the RAW vectors and normalize inside the Arrow pass:
    # Catalyst evaluates higher-order lambdas (transform/aggregate)
    # per ELEMENT interpreted — at 500k×256 the SQL normalize was the
    # single largest trainer cost (measured round 11); one vectorized
    # numpy divide per batch is ~free next to the assignment GEMM
    norm = train.select(F.col("v").alias("nv")).persist()

    def merge_cell(key, pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "cell": [key[0]],
                "s": [np.array(pdf["s"].tolist()).sum(axis=0).tolist()],
                "n": [int(pdf["n"].sum())],
            }
        )

    for _ in range(iters):
        b_cents = spark.sparkContext.broadcast(cents)

        def partial(batches):
            # mapInArrow, not mapInPandas: the pandas path materializes
            # one ndarray OBJECT per row (500k objects/iteration at the
            # 500k probe — conversion dominated the GEMM ~3:1); the
            # Arrow list buffer reshapes to the (n, dim) matrix
            # zero-copy since the domain filter guarantees rectangular,
            # null-free vectors
            import pyarrow as pa

            C = b_cents.value
            sums = np.zeros((C.shape[0], C.shape[1]))
            counts = np.zeros(C.shape[0], dtype=np.int64)
            seen = False
            for rb in batches:
                if rb.num_rows == 0:
                    continue
                seen = True
                col = rb.column(rb.schema.get_field_index("nv"))
                X = (
                    col.flatten()
                    .to_numpy(zero_copy_only=False)
                    .reshape(rb.num_rows, -1)
                )
                X = X / np.linalg.norm(X, axis=1, keepdims=True)
                cells = np.argmax(X @ C.T, axis=1)
                order = np.argsort(cells, kind="stable")
                uniq, starts = np.unique(cells[order], return_index=True)
                sums[uniq] += np.add.reduceat(X[order], starts, axis=0)
                counts += np.bincount(cells, minlength=C.shape[0])
            if not seen:
                return
            nz = np.nonzero(counts)[0]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(nz.astype("int32"), type=pa.int32()),
                    pa.array(list(sums[nz]), type=pa.list_(pa.float64())),
                    pa.array(counts[nz], type=pa.int64()),
                ],
                names=["cell", "s", "n"],
            )

        agg = (
            norm.select("nv")
            .mapInArrow(partial, "cell int, s array<double>, n long")
            .groupBy("cell")
            .applyInPandas(merge_cell, "cell int, s array<double>, n long")
            .collect()  # K rows of model state — bounded by K, not n
        )
        new = cents.copy()
        for r in agg:
            if r["n"] > 0:
                mean = np.array(r["s"], dtype=np.float64) / r["n"]
                new[r["cell"]] = mean / np.linalg.norm(mean)
        cents = np.round(new, 6)
    norm.unpersist()
    return cents


def _ivf_topk_impl(
    spark: SparkSession, sf: str, cents: np.ndarray, nprobe: int = 1
) -> DataFrame:
    """IVF-flat top-3 given a coarse quantizer: assign cells, then an
    exact numpy GEMM per cell (single shuffle on cell_id).

    The within-cell similarity matrix is computed in ROW TILES
    (round 11): the first draft built the full n_cell×n_cell matrix in
    one shot, which is fine at fixture cell sizes (~250 rows) but is
    500 GB for a 250k-row cell — per-task memory must be bounded by
    tile×cell (the GEMM working set), never cell². FLOP count is
    identical; numpy runs each tile as one BLAS call so throughput is
    unchanged at fixture sizes (measured: d3_ivf_topk warm flat).

    ``nprobe`` (round 12): with 1 (every registered plan — byte-
    identical to r11) each vector's neighbors come from its home cell
    only. Single-probe recall@3 is GEOMETRY-DEPENDENT: the 256-dim
    probe corpus reads 0.34 at 50k but 1.0 at 2M under sqrt-n cells —
    sparse clusters put a vector's nearest neighbors at cosines
    comparable to the cell-boundary distance, so small corpora lose
    them across the boundary; dense corpora (order statistics of 2000
    cluster-mates) keep them well inside. nprobe>1 is the standard IVF
    cure: each vector QUERIES its nprobe nearest cells (membership
    stays single-cell, so the index itself doesn't grow), the per-cell
    GEMM scores query-rows × member-rows, and a final per-src top-3
    merge (one groupBy) combines the probed cells. Work scales
    linearly with nprobe, the task memory bound (tile × cell) is
    unchanged, and the merge shuffle carries ≤ 3·nprobe rows per
    vector — model-sized. Probe-measured recall/wall per nprobe is
    pinned in ``EMBED_SCALE_r12.json``.
    """
    emb = load_embeddings(spark, sf).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    if nprobe > 1:
        return _ivf_topk_multiprobe(spark, emb, cents, nprobe)
    cells = emb.withColumn("cell", _cell_assigner(spark, cents)(F.col("v")))

    tile = 4096

    def topk_in_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.array(pdf["v"].tolist(), dtype=np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        ids = pdf["vec_id"].to_numpy()
        out = {"src": [], "nbr": [], "sim": []}
        # candidate pool per row: argpartition (O(cell)) instead of a
        # full per-row sort (O(cell log cell)); exact tie semantics are
        # preserved by the boundary check — if the selected 3rd-best
        # sim ties the pool's floor value, an id-smaller tied element
        # could sit outside the pool, so that row falls back to the
        # full lexsort (rare: needs ≥P-way sim ties at the cut).
        pool = 64
        for t0 in range(0, len(ids), tile):
            S = X[t0 : t0 + tile] @ X.T  # tile×cell, bounded
            for ti in range(S.shape[0]):
                i = t0 + ti
                sims = np.round(S[ti], 6)
                sims[i] = -2.0  # self
                if len(ids) > pool:
                    cand = np.argpartition(-sims, pool - 1)[:pool]
                    # top-3 by (sim desc, nbr asc) — stable under ties
                    order = cand[np.lexsort((ids[cand], -sims[cand]))][:3]
                    floor = sims[cand].min()
                    if len(order) == 3 and sims[order[-1]] <= floor:
                        order = np.lexsort((ids, -sims))[:3]
                else:
                    order = np.lexsort((ids, -sims))[:3]
                for j in order:
                    out["src"].append(ids[i])
                    out["nbr"].append(ids[j])
                    out["sim"].append(float(sims[j]))
        return pd.DataFrame(out)

    return cells.groupBy("cell").applyInPandas(
        topk_in_cell, "src long, nbr long, sim double"
    )


def _ivf_topk_multiprobe(
    spark: SparkSession, emb: DataFrame, cents: np.ndarray, nprobe: int
) -> DataFrame:
    """Multi-probe leg of :func:`_ivf_topk_impl` (see its docstring).

    Shape: posexplode the top-``nprobe`` cell list (pos 0 = home cell
    = membership; pos > 0 = probe-only copies), one shuffle on cell,
    per-cell GEMM of ALL rows (queries) × member rows, local top-3 per
    (query, cell), then a per-src global top-3 merge. Deterministic:
    sims rounded to 6, ties by nbr asc at both the local cut and the
    merge window; duplicate (src, nbr) rows from overlapping probes
    carry identical sims and collapse in the pre-merge groupBy.
    """
    tile = 4096
    probed = emb.select(
        "vec_id",
        "v",
        F.posexplode(
            _multi_cell_assigner(spark, cents, nprobe)(F.col("v"))
        ).alias("pos", "cell"),
    ).select(
        "vec_id", "v", "cell", (F.col("pos") == 0).alias("is_member")
    )

    def topk_in_cell_mp(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.array(pdf["v"].tolist(), dtype=np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        ids = pdf["vec_id"].to_numpy()
        mem = pdf["is_member"].to_numpy().astype(bool)
        M = X[mem]
        mids = ids[mem]
        out = {"src": [], "nbr": [], "sim": []}
        if len(mids) == 0:
            return pd.DataFrame(out)
        pool = 64
        for t0 in range(0, len(ids), tile):
            S = X[t0 : t0 + tile] @ M.T  # tile×members, bounded
            for ti in range(S.shape[0]):
                i = t0 + ti
                sims = np.round(S[ti], 6)
                sims[mids == ids[i]] = -2.0  # self
                if len(mids) > pool:
                    cand = np.argpartition(-sims, pool - 1)[:pool]
                    order = cand[np.lexsort((mids[cand], -sims[cand]))][:3]
                    floor = sims[cand].min()
                    if len(order) == 3 and sims[order[-1]] <= floor:
                        order = np.lexsort((mids, -sims))[:3]
                else:
                    order = np.lexsort((mids, -sims))[:3]
                for j in order:
                    out["src"].append(ids[i])
                    out["nbr"].append(mids[j])
                    out["sim"].append(float(sims[j]))
        return pd.DataFrame(out)

    local = probed.groupBy("cell").applyInPandas(
        topk_in_cell_mp, "src long, nbr long, sim double"
    )
    merged = local.groupBy("src", "nbr").agg(F.max("sim").alias("sim"))
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("nbr"))
    return (
        merged.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .drop("rk")
    )


def ivf_topk_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """D3 scale path #2 raw frame: IVF-flat top-3 with a TRAINED coarse
    quantizer (3 rounds of DataFrame-side spherical k-means), exact
    GEMM within each cell. The registered ``d3_ivf_topk`` wraps it in
    the round-10 bounded recall check; tests call this directly."""
    emb = load_embeddings(spark, sf).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = train_ivf_centroids(spark, emb)
    return _ivf_topk_impl(spark, sf, cents)


@query("d3_ivf_topk", oracle="SELECT TRUE AS recall_ok")
def d3_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """D3 scale path #2: IVF-flat with a TRAINED coarse quantizer,
    registered as a BOUNDED-CHECK oracle query (round-10): cell-local
    top-3 vs the exact global top-3, single row pinning recall@3
    ≥ 0.15. IVF recall is LOW by design on this fixture (neighbors sit
    at cos 0.3–0.45, near-random — the clean-fixture pytest pins
    trained ≥ 0.25 and trained > random); the oracle bound is the
    floor under which the quantizer has genuinely broken.

    Training cost is iters × (one narrow UDF pass + one K×dim
    aggregate — only model state reaches the driver); search is one
    shuffle on cell_id + per-cell GEMM. Deterministic end-to-end:
    seeded init, rounded centroids, (sim, nbr) tie-breaks.
    """
    emb = load_embeddings(spark, sf).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return _recall_check(
        ivf_topk_pairs(spark, sf), exact_top3_blocked(emb), 0.15, "recall_ok"
    )


def quantized_topk_scores(spark: SparkSession, sf: str) -> DataFrame:
    """D3 scale path #3 raw frame: int8 scalar-quantized brute-force
    top-10 for the fixed query vector. The registered
    ``d3_quantized_topk`` wraps it in the round-10 bounded overlap
    check; tests call this directly.

    Per-dimension affine int8 quantization (global min/max per dim from
    one 64×2 aggregate, broadcast back) shrinks the vector column 4-8×
    — at 100 TB the brute-force scan is memory-bandwidth-bound, so the
    quantized scan is the cheap first pass and the float re-rank runs
    only on its survivors. Here the full quantize → dequantize → score
    loop runs so the quantization error is what the accuracy test
    measures (top-10 overlap vs the exact d3_topk_cosine ≥ 8/10).
    Deterministic: min/max are exact, rounding is fixed.
    """
    emb = load_embeddings(spark, sf).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # per-dimension calibration range: one aggregate of dim-sized model
    # state. PERCENTILE-CLIPPED (p0.5/p99.5), not min/max — the
    # round-10 hostile corpus showed a single huge-magnitude vector
    # stretches a min/max range until every normal component quantizes
    # into one bucket (top-10 overlap collapsed to 0/10); clipping at
    # the 0.5% tails is the standard int8 calibration (faiss/TensorRT
    # style) and bounds the range by the data's bulk, not its extremes.
    # Exact percentile keeps the plan deterministic (sketch-based
    # percentile_approx is merge-order-sensitive); at 100 TB the
    # calibration pass would sample or sketch instead — the aggregate
    # is still dim-sized model state either way.
    stats = (
        emb.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.expr("percentile(x, 0.005)").alias("lo"),
            F.expr("percentile(x, 0.995)").alias("hi"),
        )
        .collect()
    )
    dim = len(stats)
    lo = np.empty(dim)
    hi = np.empty(dim)
    for r in stats:
        lo[r["pos"]], hi[r["pos"]] = r["lo"], r["hi"]
    scale = np.where(hi > lo, (hi - lo) / 255.0, 1.0)
    b_q = spark.sparkContext.broadcast((lo, scale))

    qrow = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).head()
    qv = np.array(qrow["v"], dtype=np.float64)

    def score(batches):
        lo_b, scale_b = b_q.value
        # quantize the query identically, then score dequantized int8
        qq = np.clip(np.round((qv - lo_b) / scale_b), 0, 255)
        qd = lo_b + qq * scale_b
        qd = qd / np.linalg.norm(qd)
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            Q = np.clip(np.round((X - lo_b) / scale_b), 0, 255)  # int8 domain
            D = lo_b + Q * scale_b
            D = D / np.linalg.norm(D, axis=1, keepdims=True)
            sims = np.round(D @ qd, 6)
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "sim": sims})

    scored = (
        emb.filter(F.col("vec_id") != _QUERY_VEC_ID)
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(score, "vec_id long, sim double")
    )
    return scored.orderBy(F.desc("sim"), "vec_id").limit(10)


@query("d3_quantized_topk", oracle="SELECT TRUE AS overlap_ok")
def d3_quantized_topk(spark: SparkSession, sf: str) -> DataFrame:
    """D3 scale path #3: int8 scalar-quantized top-10, registered as a
    BOUNDED-CHECK oracle query (round-10): the quantized top-10 id set
    is intersected with the exact float top-10 (the ``d3_topk_cosine``
    plan, itself hash-checked against DuckDB) and the single output
    row pins overlap ≥ 6/10. Measured 8–10/10 on the fixture
    (clean-fixture pytest keeps the tighter ≥ 8 assertion); the wider
    oracle bound survives the fresh-seed hostile replay, where
    magnitude outliers legitimately stretch the global min/max
    calibration — a drop below 6 means the quantizer itself broke, not
    the seed.
    """
    approx_ids = quantized_topk_scores(spark, sf).select("vec_id")
    exact_ids = d3_topk_cosine(spark, sf).select("vec_id")
    return approx_ids.intersect(exact_ids).agg(
        (F.count(F.lit(1)) >= F.lit(6)).alias("overlap_ok")
    )


# Matches the fixture's near-dup regime (see d2_embedding_neardup:
# max pairwise cosine in the synthetic embeddings is ~0.48, so the
# production-typical 0.9+ threshold would be vacuous here).
_SEMDEDUP_THRESHOLD = 0.45


@query("d2_semantic_dedup", oracle=None)  # clustering → rows-only + tests
def d2_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """D2: SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 — public): cluster embeddings with the trained
    spherical k-means coarse quantizer, then within each cluster
    greedily keep a representative set whose pairwise cosine stays
    below the threshold; everything else is a semantic duplicate of an
    earlier (lower vec_id) keeper.

    Scale: clustering reuses :func:`train_ivf_centroids` (only K×dim
    model state on the driver); dedup is ONE shuffle on cell id plus a
    per-cell GEMM — per-task memory is bounded by the largest cluster,
    the SemDeDup paper's own working set. Deterministic end-to-end:
    seeded centroid init, 6-decimal rounding, ascending-id greedy scan.
    Output: every vector with its cell, kept flag, and (for drops) the
    keeper it duplicates.
    """
    emb = load_embeddings(spark, sf).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = train_ivf_centroids(spark, emb)
    cells = emb.withColumn("cell", _cell_assigner(spark, cents)(F.col("v")))

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        X = np.array(pdf["v"].tolist(), dtype=np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        S = np.round(X @ X.T, 6)
        ids = pdf["vec_id"].to_numpy()
        kept_idx: list[int] = []
        kept_flag = np.zeros(len(ids), dtype=bool)
        dup_of = np.full(len(ids), -1, dtype=np.int64)
        for i in range(len(ids)):
            dup = next(
                (j for j in kept_idx if S[i, j] >= _SEMDEDUP_THRESHOLD), None
            )
            if dup is None:
                kept_idx.append(i)
                kept_flag[i] = True
            else:
                dup_of[i] = ids[dup]
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": pdf["cell"],
                "kept": kept_flag,
                "dup_of": [None if d < 0 else int(d) for d in dup_of],
            }
        )

    return cells.groupBy("cell").applyInPandas(
        dedup_cell, "vec_id long, cell int, kept boolean, dup_of long"
    )


# -- Product Quantization (Jégou et al., TPAMI 2011) -------------------

# Subspace WIDTH is the PQ invariant, not subspace COUNT (round 11):
# quantization error grows with the dims each 1-byte code must cover,
# so m must scale with dim (FAISS convention: m = dim/8). The 2M×256
# probe measured the cost of freezing m=8: recall@10 collapsed 0.8 →
# 0.2 because each code covered 32 dims. dim=64 → m=8, identical to
# the old constant, so every fixture artifact is unchanged.
_PQ_SUB_DIM = 8  # dims per subspace → m = dim // 8
_PQ_M = 8  # fixture-dim (64) subspace count; kept for the fixed LUTs
_PQ_K = 32  # centroids per subspace → codes are m bytes/vector
_PQ_SEED = 17
_PQ_ITERS = 8
_PQ_TRAIN_CAP = 2048  # codebook training-sample bound (model-sized)


def train_pq_codebooks(
    emb: DataFrame, n: int | None = None
) -> tuple[np.ndarray, int]:
    """Train per-subspace k-means codebooks on a BOUNDED deterministic
    sample — the published PQ recipe (codebooks come from a training
    sample, never the full corpus), so the only driver-side data is
    model-state: ≤{2048}×64 doubles in, {8}×{32}×8 centroids out.

    Sample selection is ``vec_id % step == 0`` with step derived from
    the corpus count — deterministic across runs/partitionings. Each
    subspace trains an independent seeded Lloyd's loop in numpy;
    centroids round to 6 decimals so downstream assignment is stable.
    Returns ``(books, n)`` with books shaped ``(m, k, d_sub)`` — n is
    returned so callers that also need the corpus count (the ADC
    shortlist sizing) don't pay a second full-distinct count shuffle
    (round 12, ADVICE).
    """
    if n is None:
        n = emb.count()
    step = max(1, n // _PQ_TRAIN_CAP)
    sample = (
        emb.filter(F.col("vec_id") % step == 0)
        .select("vec_id", "v")
        .collect()
    )
    # collect() order follows partition layout; sort by vec_id so the
    # seeded init indexes the SAME rows under any partitioning
    sample.sort(key=lambda r: r["vec_id"])
    X = np.array([r["v"] for r in sample], dtype=np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    dim = X.shape[1]
    m = max(1, dim // _PQ_SUB_DIM)  # subspace width stays ~8 dims
    d_sub = dim // m
    books = np.empty((m, _PQ_K, d_sub))
    for j in range(m):
        S = X[:, j * d_sub : (j + 1) * d_sub]
        rng = np.random.RandomState(_PQ_SEED + j)
        cents = S[rng.choice(len(S), size=_PQ_K, replace=len(S) < _PQ_K)]
        for _ in range(_PQ_ITERS):
            d2 = ((S[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for k in range(_PQ_K):
                members = S[assign == k]
                if len(members):
                    cents[k] = members.mean(axis=0)
        books[j] = np.round(cents, 6)
    return books, n


_PQ_SHORTLIST = 64  # ADC candidates that get the exact re-rank


@query(
    "d3_pq_topk",
    oracle=None,  # quantized ordering not SQL-expressible; recall pinned by twin
    covered_by="d3_pq_topk_check",
)
def d3_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """D3 scale path #4: product-quantized search via asymmetric
    distance computation (ADC) + exact re-rank — the FAISS-default
    memory/bandwidth regime: {8}-byte codes instead of 256-byte float
    vectors (32×), so at 100 TB the scanned index fits where the raw
    vectors never could.

    Plan: codebooks train on a bounded sample (driver holds model
    state only); encoding is one narrow Arrow-batched pass (argmin
    against the broadcast {8}×{32}×8 codebook); the query builds an
    m×k lookup table of exact subspace dot products, and the SCAN is
    LUT-gather + sum per code — no float vector is touched at scan
    time. The ADC shortlist (TakeOrdered, max(64, min(4096, n/5))
    candidates — see the sizing note at the limit) then gets an exact
    cosine re-rank — the published two-stage recipe (Jégou et al. §V;
    quantized scan for bandwidth, float math only on the shortlist).
    Shortlist recall of the true top-10 is asserted in
    tests/test_dedup_quality.py and at 500k/2M×256 in
    EMBED_SCALE_r11.json.
    """
    emb = load_embeddings(spark, sf).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # ONE aggregate fetches the corpus count AND the query vector
    # (r13, guide §1.2: the old count()/head() pair was two full
    # distinct-exchanged passes over the vector payload for two scalars
    # of model state). The query vector canonicalizes as the MIN array
    # among the id's copies — the same rule d3_topk_cosine and every
    # embeddings oracle adopted in r10 (head() on an unordered filter
    # is engine-arbitrary under conflicting-duplicate corruption).
    stats = emb.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(
            F.when(F.col("vec_id") == _QUERY_VEC_ID, F.col("v"))
        ).alias("qv"),
    ).head()
    n_corpus = stats["n"]
    qv_raw = list(stats["qv"])
    books, _ = train_pq_codebooks(emb, n=n_corpus)
    b_books = spark.sparkContext.broadcast(books)
    d_sub = books.shape[2]

    qv = np.array(qv_raw, dtype=np.float64)
    qv = qv / np.linalg.norm(qv)
    # ADC lookup table: exact dot of each query subvector with every
    # centroid — m×k floats, computed once
    m = books.shape[0]
    lut = np.einsum(
        "jd,jkd->jk",
        qv.reshape(m, d_sub),
        books,
    )
    b_lut = spark.sparkContext.broadcast(np.round(lut, 9))

    def encode_and_score(batches):
        bk = b_books.value
        tbl = b_lut.value
        # r13 (guide §4.2): the nearest-centroid argmin runs as a GEMM —
        # argmin_k ||s−c_k||² == argmin_k (||c_k||² − 2 s·c_k) — instead
        # of materializing the (batch × k × d_sub) broadcast difference
        # tensor per subspace (allocation-bound at wide batches; output
        # proven row-identical at 4 grains incl. the hostile corpus).
        # Centroid norms are precomputed once per task.
        cn = (bk ** 2).sum(axis=2)  # (m, k) centroid squared norms
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            X = X / np.linalg.norm(X, axis=1, keepdims=True)
            sims = np.zeros(len(X))
            for j in range(bk.shape[0]):
                S = X[:, j * d_sub : (j + 1) * d_sub]
                codes = (cn[j][None, :] - 2.0 * (S @ bk[j].T)).argmin(axis=1)
                sims += tbl[j, codes]
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "sim": np.round(sims, 6)}
            )

    # No repartition before the encode pass: load_embeddings ends in a
    # distinct(), whose exchange already spread the rows across tasks —
    # the old keyless repartition re-shuffled the full vector payload
    # (plus sortBeforeRepartition) a second time for nothing (r13,
    # guide §2.4 "a repartition someone added for parallelism").
    scored = emb.filter(F.col("vec_id") != _QUERY_VEC_ID).mapInPandas(
        encode_and_score, "vec_id long, sim double"
    )
    # ADC rank noise is absolute (quantization error), so the number
    # of true-top-10 competitors that can leapfrog grows with n — a
    # FIXED shortlist starves at corpus scale (round-11 probe: fixed
    # 64 read recall@10 0.7 at 500k / 0.3 at 2M×256), and at the
    # fixture's ADVERSARIAL near-random regime (neighbor sims bunched
    # within the quantization error) it starves even at 2k vectors
    # (measured ADC ranks of the exact top-10 at sf0.1: recall 0.3 at
    # 64, 1.0 at 400). Sizing rule, measured at both regimes:
    # n/5 covers the bunched-sim small-corpus case; the 4096 cap keeps
    # the TakeOrdered + broadcast model-sized at any corpus (recall@10
    # 1.0 at 2M with 4096; production FAISS practice sizes the rerank
    # list to the recall target the same way). At the sf0.001/sf0.01
    # fixtures (~500 valid vectors) this reads 100 — a LARGER exact
    # re-rank set than the 64 floor, so small-SF recall can only be
    # >= the floor's; the check twin pins it. n comes from the single
    # stats aggregate shared with the query vector — no second
    # distinct shuffle (r12/r13).
    shortlist_size = max(_PQ_SHORTLIST, min(4096, n_corpus // 5))
    shortlist = scored.orderBy(F.desc("sim"), "vec_id").limit(shortlist_size)
    # exact re-rank: float vectors are fetched for the shortlist ONLY
    # (a broadcast join of ≤{64} ids against the table). The query
    # vector is already driver-held model state — inlining it as a
    # literal array (the d3_topk_cosine idiom) deletes the old qdf
    # subtree: one full scan+distinct of the corpus and a broadcast,
    # spent re-fetching a vector we had (r13, guide §1.2/§5).
    qlit = F.array(*[F.lit(float(x)) for x in qv_raw])
    return (
        emb.join(F.broadcast(shortlist.select("vec_id")), "vec_id")
        .withColumn("qv", qlit)
        .select("vec_id", F.round(_cosine("v", "qv"), 6).alias("sim"))
        .orderBy(F.desc("sim"), "vec_id")
        .limit(10)
    )


@query(
    "d3_pq_topk_check",
    oracle=f"""
    WITH q AS (SELECT MIN(CAST(embedding AS DOUBLE[])) AS qv
               FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}),
    s AS (SELECT DISTINCT vec_id,
                 ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv), 6) AS sim
          FROM embeddings, q
          WHERE vec_id <> {_QUERY_VEC_ID} AND {_VALID_EMB_DUCK}),
    topk AS (SELECT vec_id FROM s ORDER BY sim DESC, vec_id LIMIT 10)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, TRUE AS pq_recall_ok
    FROM topk
    """,
)
def d3_pq_topk_check(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded-check wrapper for the BENCH-HEADLINER ``d3_pq_topk``
    (VERDICT r10 #2 — quantized ordering can never hash-match an exact
    engine, but its recall@10 against the exact brute-force top-10
    can): the headliner's own output — the PLAN IS :func:`d3_pq_topk`
    verbatim, so the benched query stays byte-identical and this
    non-headliner wrapper only adds the comparison tail — is joined
    against :func:`d3_topk_cosine`'s exact top-10, emitting the exact
    candidate count (hash-checked vs DuckDB's own exact top-k) plus a
    recall@10 ≥ 0.7 boolean (measured 8/10 at sf0.001 — tightly
    bunched sims, the hardest regime for quantized ordering; the same
    floor ``tests/test_dedup_quality.py`` pins). A codebook/LUT/ADC
    regression flips the boolean; rows-only checking could never see
    it."""
    found = d3_pq_topk(spark, sf).select("vec_id")
    exact = d3_topk_cosine(spark, sf).select("vec_id")
    hits = exact.join(found, "vec_id", "left_semi").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    tot = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    return tot.crossJoin(F.broadcast(hits)).select(
        F.col("n_exact").cast("bigint").alias("n_exact"),
        (F.col("n_hit") >= F.lit(0.7) * F.col("n_exact")).alias(
            "pq_recall_ok"
        ),
    )


# -- feature hashing (Weinberger et al., ICML 2009) --------------------

_FH_DIM = 64  # hashed feature dimension
_FH_QUERY_DOC = 0  # query document for the top-k


@query(
    "d3_feature_hash_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
    hashed AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS hv
      FROM tok WHERE length(tok) > 0),
    comp AS (
      SELECT doc_id, hv % {_FH_DIM} AS bucket,
             SUM(CASE WHEN (hv // {_FH_DIM}) % 2 = 0 THEN 1 ELSE -1 END)
               AS w
      FROM hashed GROUP BY 1, 2),
    norms AS (
      SELECT doc_id, SUM(w * w) AS n2 FROM comp GROUP BY 1),
    q AS (SELECT bucket, w AS qw FROM comp WHERE doc_id = {_FH_QUERY_DOC}),
    qn AS (SELECT n2 AS qn2 FROM norms WHERE doc_id = {_FH_QUERY_DOC}),
    dots AS (
      SELECT c.doc_id, SUM(c.w * q.qw) AS dot
      FROM comp c JOIN q USING (bucket)
      WHERE c.doc_id <> {_FH_QUERY_DOC}
      GROUP BY 1)
    SELECT d.doc_id,
           ROUND(d.dot / (sqrt(n.n2) * sqrt(qn.qn2)), 6) AS sim
    FROM dots d JOIN norms n USING (doc_id) CROSS JOIN qn
    ORDER BY sim DESC, doc_id LIMIT 10
    """,
)
def d3_feature_hash_topk(spark: SparkSession, sf: str) -> DataFrame:
    """D3: text similarity WITHOUT embeddings — the hashing trick
    (Weinberger et al. 2009): every token hashes to one of {64}
    signed buckets, so a document becomes a fixed-dim sparse vector in
    ONE streaming pass with zero vocabulary state (the property that
    matters at 100 TB: no dictionary to build, broadcast, or version).

    Plan: token→(bucket, ±1) is a narrow md5 expression; per-doc
    components are a map-side-combinable groupBy; the query doc's {64}
    components broadcast into a hash join; cosine arithmetic stays
    INTEGER until the final division, so both engines round
    identically. Top-10 via TakeOrdered on (sim desc, doc_id).
    """
    from event_streamer_spark.caching import bounded_persist

    toks = (
        load(spark, sf, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.length("tok") > 0)
    )
    hv = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    comp = (
        toks.select(
            "doc_id",
            (hv % _FH_DIM).alias("bucket"),
            F.when((hv / _FH_DIM).cast("long") % 2 == 0, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("s"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("s").alias("w"))
    )
    comp = bounded_persist(comp, "d3_fh_comp")
    norms = comp.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    q = comp.filter(F.col("doc_id") == _FH_QUERY_DOC).select(
        "bucket", F.col("w").alias("qw")
    )
    qn = norms.filter(F.col("doc_id") == _FH_QUERY_DOC).select(
        F.col("n2").alias("qn2")
    )
    dots = (
        comp.filter(F.col("doc_id") != _FH_QUERY_DOC)
        .join(F.broadcast(q), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dot"))
    )
    return (
        dots.join(norms, "doc_id")
        .crossJoin(F.broadcast(qn))
        .select(
            "doc_id",
            F.round(
                F.col("dot") / (F.sqrt("n2") * F.sqrt("qn2")), 6
            ).alias("sim"),
        )
        .orderBy(F.desc("sim"), "doc_id")
        .limit(10)
    )
