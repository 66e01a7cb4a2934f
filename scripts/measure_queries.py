"""Targeted isolated per-query timing (bench methodology, noop sink).

Usage::

    python scripts/measure_queries.py [--sf DIR] [--repeats N] name ...

For each query: clear all caches, build+run once (rebuild its own
working set), then time `repeats` steady-state runs with the noop sink
(guide §1.4 — forces every column, avoids count()'s column pruning) and
report min/median. Jobs are labelled (guide §1.5).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_streamer_spark.operators import REGISTRY  # noqa: E402
from event_streamer_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = 3
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--repeats":
            repeats = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    spark = get_spark("measure")
    spark.sparkContext.setLogLevel("ERROR")
    # session warm-up: parquet footers + python worker pool
    REGISTRY["b01_parquet_scan"].fn(spark, sf_dir).count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).select(_warm("id")).count()

    from event_streamer_spark.caching import clear_slot

    prior = os.environ.get("EVENT_STREAMER_PLAN_CACHE")
    os.environ["EVENT_STREAMER_PLAN_CACHE"] = "0"
    try:
        for name in names:
            clear_slot()
            spark.catalog.clearCache()
            fn = REGISTRY[name].fn
            spark.sparkContext.setJobDescription(f"{name}: cache rebuild")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            build = time.time() - t0
            samples = []
            for r in range(repeats):
                spark.sparkContext.setJobDescription(f"{name}: steady {r}")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
            print(
                f"{name}: build+first {build:.3f}s  "
                f"steady min {min(samples):.3f}s  "
                f"median {statistics.median(samples):.3f}s  "
                f"samples {[round(s, 3) for s in samples]}",
                flush=True,
            )
    finally:
        if prior is None:
            os.environ.pop("EVENT_STREAMER_PLAN_CACHE", None)
        else:
            os.environ["EVENT_STREAMER_PLAN_CACHE"] = prior


if __name__ == "__main__":
    main()
