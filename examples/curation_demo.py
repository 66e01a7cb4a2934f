"""End-to-end LLM-data curation demo over the documents table.

The full pretraining data path, each stage a registered operator:

  exact dedup → near-dup clusters → leakage-safe split → quality filter
  → decontamination flags → token budget → sequence packing → shuffle

    python examples/curation_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from event_streamer_spark.operators import REGISTRY
from event_streamer_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("curation-demo")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str):
        return REGISTRY[name].fn(spark, SF)

    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    print(f"corpus: {total} documents")

    exact = run("d1_exact_dedup")
    print(f"exact dedup: {exact.count()} distinct contents")

    corpus = run("d2_dedup_corpus")
    print(f"near-dedup corpus: {corpus.count()} representatives kept")

    split = run("d13_leakage_safe_split")
    split.groupBy("split").count().show()

    flagged = run("d8_decontaminate")
    print(f"decontamination: {flagged.count()} training docs share eval grams")

    budget = run("d4_bpe_token_count").agg(
        F.sum("n_bpe_tokens").alias("bpe_tokens")
    )
    print(f"token budget: {budget.collect()[0]['bpe_tokens']} BPE-ish tokens")

    packed = run("d9_sequence_pack")
    n_bins = packed.agg(F.max("bin_id")).collect()[0][0] + 1
    print(f"sequence packing: {n_bins} x 512-token training sequences")

    order = run("d12_corpus_shuffle").orderBy("shuffle_pos").limit(5)
    print("first 5 docs in epoch order:")
    order.show()

    spark.stop()


if __name__ == "__main__":
    main()
