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

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load

_QUERY_VEC_ID = 0  # fixed query vector for the top-k baseline

_N_PLANES = 12
_PLANE_SEED = 7


def _cosine(a: str, b: str) -> F.Column:
    """cos(a, b) as a JVM-side expression over array<double> columns."""
    dot = F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (s, v) -> s + v)")
    na = F.expr(f"aggregate({a}, 0D, (s, v) -> s + v * v)")
    nb = F.expr(f"aggregate({b}, 0D, (s, v) -> s + v * v)")
    return dot / (F.sqrt(na) * F.sqrt(nb))


@query(
    "d3_topk_cosine",
    oracle=f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
               WHERE vec_id = {_QUERY_VEC_ID}),
    s AS (SELECT vec_id,
                 ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), q.qv), 6) AS sim
          FROM embeddings, q
          WHERE vec_id <> {_QUERY_VEC_ID})
    SELECT vec_id, sim FROM s ORDER BY sim DESC, vec_id LIMIT 10
    """,
)
def d3_topk_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """D3 baseline: brute-force cosine top-10 for a fixed query vector.

    Scale: one narrow map computing the score + TakeOrderedAndProject
    (per-partition top-k, driver merges k·P rows) — no shuffle of the
    table. Ties broken by (rounded sim, vec_id) so the row set is stable.
    """
    emb = load(spark, sf, "embeddings").withColumn(
        "vec", F.col("embedding").cast("array<double>")
    )
    qrow = (
        emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select("vec").head()
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


@query(
    "d3_knn_join",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
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
    """
    e = load(spark, sf, "embeddings").select(
        "vec_id",
        F.col("label").alias("block"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    return _block_topk(e, "block", 3)


@query("d3_ann_lsh", oracle=None)  # approximate → rows-only check
def d3_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """D3 scale path: random-hyperplane LSH bucketing + within-bucket top-k.

    Sign pattern over fixed seeded hyperplanes → bucket id; candidate
    search touches only same-bucket vectors. Shuffle volume O(n), bucket
    sizes ~n/2^planes — skew-safe for random planes. Deterministic:
    planes are seeded constants.
    """
    rng = np.random.RandomState(_PLANE_SEED)
    planes = rng.standard_normal((_N_PLANES, 64))
    b_planes = spark.sparkContext.broadcast(planes)

    @pandas_udf("int")
    def bucket_of(vs: pd.Series) -> pd.Series:
        X = np.array(vs.tolist(), dtype=np.float64)
        signs = (X @ b_planes.value.T) > 0  # one GEMM per Arrow batch
        weights = (1 << np.arange(_N_PLANES)).astype(np.int64)
        return pd.Series((signs @ weights).astype("int32"))

    e = (
        load(spark, sf, "embeddings")
        # single-file parquet → one split; spread the UDF work
        .repartition(spark.sparkContext.defaultParallelism)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("block", bucket_of("v"))
    )
    return _block_topk(e, "block", 3)


@query(
    "d2_embedding_neardup",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_cosine_similarity(a.v, b.v), 6) AS sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.45
    """,
)
def d2_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """D2: embedding-cosine near-duplicate pairs (exact, cos ≥ 0.45).

    Physical design: the comparison side is tiny relative to the scan
    (n_vectors × dim doubles), so it is broadcast once as a dense numpy
    matrix and each partition runs one GEMM against it — the classic
    "broadcast the small side of an O(n²) compare" pattern. At 100 TB
    n² is never viable; this operator is the exact verifier that runs
    AFTER LSH/IVF candidate pruning (d3_ann_lsh / d3_ivf_topk), and
    standalone it defines the semantics the oracle checks.
    """
    from typing import Iterator

    emb = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    rows = emb.collect()  # comparison matrix: tiny (n×64 doubles)
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def score(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            X = X / np.linalg.norm(X, axis=1, keepdims=True)
            S = X @ all_mat.T  # one GEMM per Arrow batch
            src = pdf["vec_id"].to_numpy()
            out_a, out_b, out_s = [], [], []
            for i in range(S.shape[0]):
                mask = (S[i] >= 0.45) & (all_ids > src[i])
                for j in np.nonzero(mask)[0]:
                    out_a.append(src[i])
                    out_b.append(all_ids[j])
                    out_s.append(round(float(S[i, j]), 6))
            yield pd.DataFrame({"vec_a": out_a, "vec_b": out_b, "sim": out_s})

    return emb.mapInPandas(score, "vec_a long, vec_b long, sim double")


_IVF_CELLS = 8
_IVF_SEED = 11


@query("d3_ivf_topk", oracle=None)  # approximate (cell-local) → rows-only
def d3_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """D3 scale path #2: IVF-flat — coarse quantize to the nearest of K
    seeded random centroids, then exact top-3 within each cell.

    The per-cell search is an applyInPandas numpy GEMM — cells shuffle
    once on cell_id and never exceed ~n/K vectors, so memory per task is
    bounded. A trained k-means coarse quantizer drops in by replacing
    the centroid constants; the dataflow is identical.
    """
    rng = np.random.RandomState(_IVF_SEED)
    cents = rng.standard_normal((_IVF_CELLS, 64))
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    b_cents = spark.sparkContext.broadcast(cents)

    @pandas_udf("int")
    def cell_of(vs: pd.Series) -> pd.Series:
        X = np.array(vs.tolist(), dtype=np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        return pd.Series(np.argmax(X @ b_cents.value.T, axis=1).astype("int32"))

    emb = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cells = emb.withColumn("cell", cell_of("v"))

    def topk_in_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.array(pdf["v"].tolist(), dtype=np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        S = X @ X.T
        np.fill_diagonal(S, -2.0)
        ids = pdf["vec_id"].to_numpy()
        out = {"src": [], "nbr": [], "sim": []}
        for i in range(len(ids)):
            sims = np.round(S[i], 6)
            # top-3 by (sim desc, nbr asc) — stable under ties
            order = np.lexsort((ids, -sims))[:3]
            for j in order:
                out["src"].append(ids[i])
                out["nbr"].append(ids[j])
                out["sim"].append(float(sims[j]))
        return pd.DataFrame(out)

    return cells.groupBy("cell").applyInPandas(
        topk_in_cell, "src long, nbr long, sim double"
    )
