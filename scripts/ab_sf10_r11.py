"""sf10 cold-standout A/B harness (VERDICT r10 #3): d19_assoc_rules
(74 s cold benched / 54 s isolated at r10) and d17_triangles (27.6 s).

Each variant runs the FULL query to the same output (row counts are
asserted equal to baseline) — cold = all cache slots + Spark cache
cleared, warm = immediate second run. Variants:

d19 (basket-mining):
* ``baseline``      — the registered plan (ONE combo shuffle).
* ``sortagg``       — basket collect_set via SortAggregate instead of
                      ObjectHashAggregate (the "sorted-groupBy" A/B).
* ``split``         — the pre-r10 TWO-shuffle shape: pair counts and
                      item frequencies each shuffled separately (the
                      map-side singleton pre-aggregation A/B: item
                      freq combines on ~catalog-sized keys instead of
                      riding the pair shuffle).
* ``bucketed``      — lineitem pre-bucketed by l_orderkey (64
                      buckets, saveAsTable): the basket build's
                      shuffle disappears at read time; the one-off
                      bucketed-write cost is reported separately
                      (it's a storage decision, amortized over every
                      basket-family query).

d17 (triangles):
* ``baseline``      — the registered plan.
* ``ck_repart``     — capped-edge slot persisted pre-partitioned on
                      ck so the weighted self-join starts from a
                      co-partitioned cache (no per-side exchange).

Usage::

    python scripts/gen_sf1.py /tmp/sf10 --reps 100 \
        --tables lineitem,orders,customer,supplier,part,events,documents
    python scripts/ab_sf10_r11.py /tmp/sf10 [--out AB_SF10_r11.json]
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

from pyspark.sql import functions as F  # noqa: E402


def timed(spark, build, label, results):
    """cold + warm wall for a DataFrame builder; returns rowcount."""
    from event_streamer_spark.caching import clear_slot

    clear_slot()
    spark.catalog.clearCache()
    t0 = time.time()
    n = build().count()
    cold = round(time.time() - t0, 2)
    t0 = time.time()
    n2 = build().count()
    warm = round(time.time() - t0, 2)
    assert n == n2, f"{label}: unstable rowcount {n} vs {n2}"
    results[label] = {"cold_sec": cold, "warm_sec": warm, "rows": n}
    print(f"# {label}: cold {cold}s warm {warm}s ({n} rows)", flush=True)
    return n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/tmp/sf10")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    sf = args.sf_dir

    from event_streamer_spark.operators import basket, graph
    from event_streamer_spark.caching import bounded_persist
    from event_streamer_spark.session import get_spark
    from event_streamer_spark.tables import load

    spark = get_spark("ab-sf10", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {"sf_dir": sf}

    # session warm-up: JVM/codegen/Arrow-worker bootstrap must not be
    # billed to whichever variant happens to run first
    load(spark, sf, "lineitem").groupBy("l_returnflag").count().collect()
    load(spark, sf, "orders").select("o_orderkey").count()

    # ---------------- d19_assoc_rules ---------------------------------
    base_rows = timed(
        spark, lambda: basket.d19_assoc_rules(spark, sf), "d19_baseline",
        results,
    )

    # the flag is read at physical planning (action time), so it wraps
    # the whole timed run, not just the plan build
    spark.conf.set("spark.sql.execution.useObjectHashAggregateExec", "false")
    try:
        assert (
            timed(
                spark,
                lambda: basket.assoc_rules_from_arrays(
                    basket.basket_arrays(spark, sf), slot="d19_combo_sortagg"
                ),
                "d19_sortagg",
                results,
            )
            == base_rows
        )
    finally:
        spark.conf.set(
            "spark.sql.execution.useObjectHashAggregateExec", "true"
        )

    def d19_split():
        arrs = basket.basket_arrays(spark, sf)
        pairs = basket.pairs_from_arrays(arrs)
        freq = (
            arrs.select(F.explode("arr").alias("pk"))
            .groupBy("pk")
            .agg(F.count("*").cast("bigint").alias("c"))
        )
        n_baskets = arrs.agg(
            F.count("*").cast("bigint").alias("n_baskets")
        )
        rules = pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("part_x").alias("antecedent"),
                        F.col("part_y").alias("consequent"),
                        F.col("support"),
                    ),
                    F.struct(
                        F.col("part_y").alias("antecedent"),
                        F.col("part_x").alias("consequent"),
                        F.col("support"),
                    ),
                )
            ).alias("r")
        ).select("r.antecedent", "r.consequent", "r.support")
        fa = F.broadcast(
            freq.select(F.col("pk").alias("antecedent"), F.col("c").alias("ca"))
        )
        fc = F.broadcast(
            freq.select(F.col("pk").alias("consequent"), F.col("c").alias("cc"))
        )
        return (
            rules.join(fa, "antecedent")
            .join(fc, "consequent")
            .crossJoin(F.broadcast(n_baskets))
            .select(
                "antecedent",
                "consequent",
                "support",
                F.expr("(1000000 * support) DIV ca").alias("confidence_ppm"),
                F.expr(
                    "(1000000 * support * n_baskets) DIV (ca * cc)"
                ).alias("lift_ppm"),
            )
        )

    assert timed(spark, d19_split, "d19_split", results) == base_rows

    # bucketed-storage variant: one-off write, then the same plan over
    # the bucketed table (basket groupBy needs no exchange)
    t0 = time.time()
    (
        load(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .write.mode("overwrite")
        .bucketBy(64, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", "/tmp/ab_sf10_lineitem_bucketed")
        .saveAsTable("ab_lineitem_bucketed")
    )
    results["d19_bucketed_write_sec"] = round(time.time() - t0, 2)
    print(f"# bucketed write: {results['d19_bucketed_write_sec']}s", flush=True)

    def d19_bucketed():
        li = spark.table("ab_lineitem_bucketed")
        arrs = bounded_persist(
            li.select(
                F.col("l_orderkey").alias("ok"),
                F.col("l_partkey").alias("pk"),
            )
            .filter(F.col("ok").isNotNull() & F.col("pk").isNotNull())
            .groupBy("ok")
            .agg(F.sort_array(F.collect_set("pk")).alias("arr"))
            .filter(F.size("arr") <= basket._MAX_BASKET),
            "basket.arrays.bucketed",
        )
        return basket.assoc_rules_from_arrays(arrs, slot="d19_combo_bkt")

    assert timed(spark, d19_bucketed, "d19_bucketed", results) == base_rows

    # ---------------- d17_triangles -----------------------------------
    tri_rows = timed(
        spark, lambda: graph.d17_triangles(spark, sf), "d17_baseline",
        results,
    )

    orig_capped = graph._capped_edges

    def capped_ck_repart(spark_, sf_):
        pairs = graph._copurchase_pairs(spark_, sf_)
        ok = (
            pairs.groupBy("ck")
            .agg(F.count(F.lit(1)).alias("cd"))
            .filter(F.col("cd") <= graph._CN_MAX_DEGREE)
            .select("ck")
        )
        return bounded_persist(
            pairs.join(ok, "ck").repartition("ck"), "graph.capped_edges_ck"
        )

    graph._capped_edges = capped_ck_repart
    try:
        assert (
            timed(
                spark,
                lambda: graph.d17_triangles(spark, sf),
                "d17_ck_repart",
                results,
            )
            == tri_rows
        )
    finally:
        graph._capped_edges = orig_capped

    # re-run both baselines at the end: if the recheck beats the first
    # run materially, the inter-variant deltas are order noise, not plan
    timed(
        spark, lambda: basket.d19_assoc_rules(spark, sf),
        "d19_baseline_recheck", results,
    )
    timed(
        spark, lambda: graph.d17_triangles(spark, sf),
        "d17_baseline_recheck", results,
    )

    print(json.dumps(results), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
