"""sf10 b62_session_paths floor A/B (VERDICT r11 #5).

r11's one unexplained headliner: b62 isolated read 9.05 s at sf10 vs a
box-factor-adjusted r10 value of ~8.1 s with journey.py untouched. The
q21 treatment: isolated re-measure on an idle box, plus an A/B of the
path-build aggregate:

* ``baseline`` — the registered plan: three user_id windows + one
  groupBy with ``array_sort(collect_list(struct(rn, event_type)))``.
* ``pivot8``   — same windows, but the path aggregate is 8 conditional
  MAXes (``max(when(rn=i, event_type))`` for i in 1..8) concat_ws'd —
  plain hash-aggregate columns instead of ObjectHashAggregate array
  state; ``concat_ws`` skips NULLs so short sessions need no special
  case. Deterministic by construction (rn is unique per group).
* ``sortagg``  — baseline plan with ObjectHashAggregateExec disabled,
  so collect_list runs in a SortAggregate (state spills instead of
  growing an in-memory array buffer).

Every variant's FULL top-20 output is asserted row-identical to the
baseline, not just row-counted.

Usage::

    python scripts/gen_sf1.py /tmp/sf10 --reps 100 \
        --tables lineitem,orders,customer,supplier,part,events,documents
    python scripts/ab_sf10_r12.py /tmp/sf10 [--out AB_SF10_r12.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")
# monkeypatched variants must rebuild plans every call — the prepared-
# plan cache would hand the baseline plan back to the variant run
os.environ["EVENT_STREAMER_PLAN_CACHE"] = "0"

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def timed(spark, build, label, results):
    """cold + warm wall for a DataFrame builder; returns sorted rows."""
    from event_streamer_spark.caching import clear_slot

    clear_slot()
    spark.catalog.clearCache()
    t0 = time.time()
    rows = build().collect()
    cold = round(time.time() - t0, 2)
    t0 = time.time()
    rows2 = build().collect()
    warm = round(time.time() - t0, 2)
    assert rows == rows2, f"{label}: unstable output"
    results[label] = {"cold_sec": cold, "warm_sec": warm, "rows": len(rows)}
    print(f"# {label}: cold {cold}s warm {warm}s ({len(rows)} rows)",
          flush=True)
    return rows


def b62_pivot8(spark, sf):
    """b62 with the pivot-8 path aggregate (see module docstring)."""
    from event_streamer_spark.operators.journey import (
        _PATH_GAP_US,
        _PATH_MAX_EVENTS,
        _PATH_TOP_K,
    )
    from event_streamer_spark.tables import load

    e = load(spark, sf, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last()
    )
    us = F.unix_micros(F.col("ts"))
    prev_us = F.unix_micros(F.lag("ts").over(w))
    ordered = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.when(
            prev_us.isNull() | ((us - prev_us) > _PATH_GAP_US), 1
        ).otherwise(0).alias("is_new"),
    )
    sess = ordered.withColumn(
        "session_seq",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    w_s = Window.partitionBy("user_id", "session_seq").orderBy(
        F.col("ts").asc_nulls_last(), F.col("event_id").asc_nulls_last()
    )
    numbered = sess.withColumn("rn", F.row_number().over(w_s)).filter(
        F.col("rn") <= _PATH_MAX_EVENTS
    )
    slots = [
        F.max(
            F.when(F.col("rn") == i, F.col("event_type"))
        ).alias(f"e{i}")
        for i in range(1, _PATH_MAX_EVENTS + 1)
    ]
    paths = numbered.groupBy("user_id", "session_seq").agg(*slots).select(
        F.concat_ws(
            ">", *[F.col(f"e{i}") for i in range(1, _PATH_MAX_EVENTS + 1)]
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(_PATH_TOP_K)
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/tmp/sf10")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    sf = args.sf_dir

    from event_streamer_spark.operators import journey
    from event_streamer_spark.session import get_spark
    from event_streamer_spark.tables import load

    spark = get_spark("ab-sf10-r12", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {"sf_dir": sf}

    # session warm-up: JVM/codegen/Arrow-worker bootstrap must not be
    # billed to whichever variant happens to run first
    load(spark, sf, "events").groupBy("event_type").count().collect()

    base = timed(
        spark, lambda: journey.b62_session_paths(spark, sf),
        "b62_baseline", results,
    )

    got = timed(spark, lambda: b62_pivot8(spark, sf), "b62_pivot8", results)
    assert got == base, "pivot8 output diverges from baseline"

    spark.conf.set("spark.sql.execution.useObjectHashAggregateExec", "false")
    try:
        got = timed(
            spark, lambda: journey.b62_session_paths(spark, sf),
            "b62_sortagg", results,
        )
        assert got == base, "sortagg output diverges from baseline"
    finally:
        spark.conf.set(
            "spark.sql.execution.useObjectHashAggregateExec", "true"
        )

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
