"""Master-data consolidation walkthrough — the D18 entity-resolution
family end to end, batch then streaming:

  two dirty sources → multi-pass blocked candidates → scored linkage
  → survivorship golden records → the same corpus replayed through the
  DURABLE streaming index in micro-batches (link-on-arrival)

    python examples/er_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from event_streamer_spark.operators import REGISTRY
from event_streamer_spark.operators.er import synth_records
from event_streamer_spark.session import get_spark
from event_streamer_spark.streaming import er_link_batch, read_er_matches

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("er-demo")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"== D18 entity resolution @ {SF} ==")
    recs = synth_records(spark, SF)
    n = recs.count()
    print(f"records: {n} ({n // 2} entities x 2 sources)")

    matches = REGISTRY["d18_er_blocked_match"].fn(spark, SF)
    m = matches.count()
    print(f"\nbatch linkage: {m} matched pairs")
    matches.orderBy("rec_a").show(5, truncate=False)

    golden = REGISTRY["d18_er_golden"].fn(spark, SF)
    g = golden.count()
    missing_f2 = golden.filter(F.col("golden_f2").isNull()).count()
    print(f"golden records: {g} (f2 recovered everywhere: "
          f"{missing_f2 == 0} — source A always carries it)")
    golden.orderBy("entity_id").show(5, truncate=False)

    # streaming replay: source A arrives first, then source B — the
    # adversarial boundary (no within-batch pairs at all; every link
    # must come from the durable index)
    base = tempfile.mkdtemp(prefix="er_demo_")
    try:
        src = os.path.join(base, "src")
        for s in ("A", "B"):
            recs.filter(F.col("src") == s).coalesce(1).write.parquet(
                src, mode="append"
            )
        stream = (
            spark.readStream.schema(
                "rec_id bigint, src string, f1 string, f2 string, f3 int"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                er_link_batch(
                    os.path.join(base, "state"), os.path.join(base, "emit")
                )
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .start()
        )
        q.awaitTermination(300)
        streamed = read_er_matches(spark, os.path.join(base, "emit"))
        sm = streamed.count()
        batch_keys = {(r["rec_a"], r["rec_b"]) for r in matches.collect()}
        stream_keys = {(r["rec_a"], r["rec_b"]) for r in streamed.collect()}
        print(f"\nstreaming replay (A-batch then B-batch): {sm} pairs; "
              f"equals batch linkage: {stream_keys == batch_keys}")
    finally:
        shutil.rmtree(base, ignore_errors=True)

    print("\ndone.")


if __name__ == "__main__":
    main()
