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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

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
    assignment). Within-block compare is a shuffle-on-label join.
    """
    e = load(spark, sf, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a = e.alias("a")
    b = e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("src"),
        F.col("b.vec_id").alias("nbr"),
        F.round(_cosine("a.v", "b.v"), 6).alias("sim"),
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), "nbr")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("src", "nbr", "sim")
    )


@query("d3_ann_lsh", oracle=None)  # approximate → rows-only check
def d3_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """D3 scale path: random-hyperplane LSH bucketing + within-bucket top-k.

    Sign pattern over fixed seeded hyperplanes → bucket id; candidate
    search touches only same-bucket vectors. Shuffle volume O(n), bucket
    sizes ~n/2^planes — skew-safe for random planes. Deterministic:
    planes are seeded constants.
    """
    rng = np.random.RandomState(_PLANE_SEED)
    dim = 64
    planes = rng.standard_normal((_N_PLANES, dim))

    e = load(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bucket = F.lit(0)
    for i in range(_N_PLANES):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        dot = F.expr(
            "aggregate(zip_with(v, __p, (x, y) -> x * y), 0D, (s, v2) -> s + v2)"
        )
        e = e.withColumn("__p", plane).withColumn(
            f"__b{i}", F.when(dot > 0, 1).otherwise(0)
        ).drop("__p")
        bucket = bucket + F.col(f"__b{i}") * (2 ** i)
    e = e.withColumn("bucket", bucket).drop(*[f"__b{i}" for i in range(_N_PLANES)])

    a = e.alias("a")
    b = e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("src"),
        F.col("b.vec_id").alias("nbr"),
        F.round(_cosine("a.v", "b.v"), 6).alias("sim"),
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), "nbr")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("src", "nbr", "sim")
    )
