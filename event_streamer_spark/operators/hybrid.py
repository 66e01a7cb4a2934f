"""Hybrid retrieval (D3+D4 composition): lexical + vector rank fusion.

The standard RAG retrieval architecture: run a lexical retriever (BM25)
and a vector retriever (cosine) independently, take each one's top-k,
and fuse the CANDIDATE SETS with Reciprocal Rank Fusion
(``score = Σ 1/(60 + rank)`` — Cormack et al.'s k=60). Both legs reuse
the registered operators verbatim — the oracle embeds their oracle SQL
as CTEs, so the fusion stays correct by construction whenever the legs
are.

Scale posture: each retriever ends in a TakeOrderedAndProject top-k, so
the only unpartitioned windows here rank ≤k-row candidate sets —
model-state-sized by design; fusing never touches the corpus again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import REGISTRY, query

_RRF_K = 60

_BM25 = REGISTRY["d4_bm25_search"]
_COS = REGISTRY["d3_topk_cosine"]


@query(
    "d3_hybrid_rrf",
    oracle=f"""
    WITH bm AS ({_BM25.oracle}),
    cos AS ({_COS.oracle}),
    bm_r AS (SELECT doc_id,
                    ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
             FROM bm),
    cos_r AS (SELECT vec_id AS doc_id,
                     ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS r
              FROM cos)
    SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
           ROUND(COALESCE(1.0 / ({_RRF_K} + b.r), 0)
                 + COALESCE(1.0 / ({_RRF_K} + c.r), 0), 6) AS rrf
    FROM bm_r b FULL OUTER JOIN cos_r c ON b.doc_id = c.doc_id
    ORDER BY rrf DESC, doc_id
    """,
)
def d3_hybrid_rrf(spark: SparkSession, sf: str) -> DataFrame:
    """D3: hybrid lexical+vector retrieval via Reciprocal Rank Fusion
    over the BM25 top-20 and cosine top-10 candidate sets (both reused
    from their registered operators, so this is the composed RAG
    retrieval path end-to-end). ``1/(60+rank)`` sums are exact IEEE on
    both engines; ranks tie-break on the id.
    """
    bm = _BM25.fn(spark, sf)  # (doc_id, bm25) — top-20
    cos = _COS.fn(spark, sf)  # (vec_id, sim) — top-10
    # candidate sets are ≤k rows (TakeOrdered outputs): the global
    # windows below rank model-state-sized frames, never the corpus
    bm_r = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), "doc_id"))
        .alias("r_bm"),
    )
    cos_r = cos.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("sim"), "vec_id"))
        .alias("r_cos"),
    )
    rrf = F.round(
        F.coalesce(1.0 / (_RRF_K + F.col("r_bm")), F.lit(0.0))
        + F.coalesce(1.0 / (_RRF_K + F.col("r_cos")), F.lit(0.0)),
        6,
    )
    return (
        bm_r.join(cos_r, "doc_id", "full")
        .select("doc_id", rrf.alias("rrf"))
        .orderBy(F.desc("rrf"), "doc_id")
    )
