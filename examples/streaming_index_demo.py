"""Demo: the incremental (streaming-ingest) index family end-to-end.

Documents and embeddings arrive as a file stream in micro-batches;
three parquet-backed indexes fold them in as they land and stay
queryable throughout:

* MinHash-LSH near-dup index — cross-batch candidate pairs
* IVF vector index — partition-pruned approximate nearest neighbors
* weighted-sample state — the running Efraimidis–Spirakis top-k

Every leg is exactly-incremental (replaying the corpus through any
batch split reproduces the batch operator — see tests), and all state
is plain distributed parquet: no driver memory, compactable offline.

    python examples/streaming_index_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from event_streamer_spark.operators.similarity import train_ivf_centroids
from event_streamer_spark.session import get_spark
from event_streamer_spark.streaming import (
    ivf_ingest_batch,
    ivf_query,
    minhash_neardup_batch,
    read_weighted_sample,
    weighted_sample_batch,
)
from event_streamer_spark.tables import load


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-index-demo", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="es_index_demo_")

    # --- replay the corpus as two micro-batches -----------------------
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    doc_src = f"{work}/docs"
    docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(doc_src, mode="append")
    docs.filter("doc_id % 2 = 1").coalesce(1).write.parquet(doc_src, mode="append")

    doc_stream = (
        spark.readStream.schema("doc_id bigint, text string, n_chars bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(doc_src)
    )

    lsh_state, pairs_dir = f"{work}/lsh", f"{work}/pairs"
    ws_state = f"{work}/wsample"

    def fold(batch_df, batch_id):
        minhash_neardup_batch(lsh_state, pairs_dir)(batch_df, batch_id)
        weighted_sample_batch(ws_state, k=20)(
            batch_df.select("doc_id", "n_chars"), batch_id
        )

    q = (
        doc_stream.writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{work}/ckpt_docs")
        .start()
    )
    q.awaitTermination(300)

    n_pairs = spark.read.parquet(pairs_dir).count()
    sample = read_weighted_sample(spark, ws_state, k=5).collect()
    print(f"near-dup candidate pairs across batches: {n_pairs}")
    print("weighted sample top-5:",
          [(r["doc_id"], r["sample_key"]) for r in sample])

    # --- embeddings: train centroids, stream-ingest, query ------------
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = train_ivf_centroids(spark, emb)
    vec_src, index_dir = f"{work}/vecs", f"{work}/ivf"
    emb.filter("vec_id < 250").coalesce(1).write.parquet(vec_src, mode="append")
    emb.filter("vec_id >= 250").coalesce(1).write.parquet(vec_src, mode="append")
    vq = (
        spark.readStream.schema("vec_id bigint, v array<double>")
        .option("maxFilesPerTrigger", "1")
        .parquet(vec_src)
        .writeStream.foreachBatch(ivf_ingest_batch(index_dir, cents))
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{work}/ckpt_vecs")
        .start()
    )
    vq.awaitTermination(300)

    query_vec = emb.filter("vec_id = 0").head()["v"]
    hits = ivf_query(spark, index_dir, cents, query_vec, k=3, nprobe=2).collect()
    print("ANN top-3 for vec 0:",
          [(r["vec_id"], r["sim"]) for r in hits])
    spark.stop()


if __name__ == "__main__":
    main()
