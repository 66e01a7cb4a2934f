"""Metamorphic physical-plan invariance: results must not depend on HOW
Spark executes the plan.

Every registry query already hash-matches a DuckDB oracle under the
DEFAULT session confs; this suite re-runs a cross-family sample under
deliberately different PHYSICAL regimes — AQE disabled, whole-stage
codegen disabled (forces the interpreted expression paths, the ones
CodegenFallback silently uses), and a co-prime shuffle-partition count
(different partition boundaries → different aggregation merge orders) —
and requires the canonical value hash to be bit-identical to the
default-conf run.

What this catches that the oracle sweep cannot: interpreted-vs-codegen
expression divergence (the regimes execute different expression code
paths outright) and any hidden dependence on AQE's runtime re-planning.
Honest sensitivity note (measured round 8): the float-merge-order leg
has limited teeth at this SF — even a RAW double sum is stable across
shuffle-partition counts because map-side partials merge in scan-
partition order and the 6-decimal canonicalizer absorbs the residue;
the integer-cents/rounding-grain protocol is what guarantees it at
cluster partition counts, and this suite pins the protocol's output,
not the counterfactual.

Operator caches (plan cache + bounded_persist slots) are cleared
between regimes so each run re-executes the physical pipeline instead
of re-reading a cache built under the default confs.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from check_oracles import canon_hash  # noqa: E402

from event_streamer_spark.operators import REGISTRY  # noqa: E402

SF = "/root/testdata/sf0.001"

# one representative per family: float-heavy agg, grouped stats, joins
# (broadcast + shuffle-heavy self-join), two-level window rank, frame
# window, set-op, JSON, exact + near dedup, similarity, text quality,
# equi-depth histogram (distrank global rank), TPC-H money arithmetic
SAMPLE = [
    "b11_tpch_q1",
    "b11_stats_agg",
    "b05_join_inner",
    "b50_tpch_q21",
    "b15_window_rank",
    "b17_window_frame",
    "b20_except",
    "b26_json_fns",
    "d1_exact_dedup",
    "d2_minhash_lsh",
    "d3_topk_cosine",
    "d4_quality_score",
    "b34_equidepth_histogram",
    # round-8 parity pins: timestamp + map expressions run through
    # genuinely different code paths when whole-stage codegen is off
    "b22_timestamp_parity",
    "b25_map_extract_parity",
    # round-8 validation family: the double-distrank MAD scan exercises
    # mode='auto' + broadcast med/MAD dims across regimes (AQE off
    # changes the join planning; shuffle7 moves the rank boundaries)
    "d15_anomaly_mad",
    # late round 8: iterative integer PageRank (cached graph frames
    # rebuilt per regime; DIV chains through interpreted expressions
    # when codegen is off), the chained-join FK audit, and the
    # session-paths triple window (collect_list merge order moves with
    # the partition boundaries; array_sort must absorb it)
    "d17_pagerank",
    "d16_fk_orphans",
    "b62_session_paths",
    # float AVG-of-logs across merge orders (6-dec grain must absorb),
    # the prefix-sum-backed integer sampler, and the hash-reduced CDC
    # full outer join
    "d4_bigram_logprob",
    "d7_systematic_sample",
    "b65_snapshot_diff",
    # round-8 session 3: islands anchor arithmetic rides row_number
    # partition boundaries; the gap-fill's IGNORE NULLS carries + DIV
    # interpolation run interpreted under codegen_off; the ER pipeline
    # and oriented triangle enumeration rebuild their cached frames
    # per regime (AQE off replans the blocked/wedge joins)
    "b69_gaps_islands",
    "b70_gap_fill_interp",
    "d18_er_golden",
    "d17_triangles",
    # the KMV merged-sketch ratio estimator (window rank + DIV chains)
    # and the winnowing struct-min window both run through genuinely
    # different code paths per regime
    "d11_kmv_overlap",
    "d2_winnowing",
    # round-8 session 4: the basket pair self-join + ppm DIV rules
    # (AQE off replans the broadcast probability joins), the skyline's
    # domain-bounded suffix-min window, the triple-distrank RFM cube,
    # and the DECIMAL(38,0) OLS moments (interpreted decimal
    # arithmetic under codegen_off is a genuinely different path)
    "d19_assoc_rules",
    "b71_skyline",
    "b72_rfm_segments",
    "d15_trend_ols",
    # HITS: iterative integer normalization through DECIMAL DIV and
    # the unpartitioned-window L1 totals — AQE off replans the
    # edges⨝scores joins, codegen off interprets the decimal chain
    "d17_hits",
    # sequential baskets: per-customer sequence window + double array
    # explode (partition boundaries move the window input; codegen off
    # interprets the generators)
    "d19_next_order",
]

REGIMES = {
    "aqe_off": {"spark.sql.adaptive.enabled": "false"},
    "codegen_off": {"spark.sql.codegen.wholeStage": "false"},
    "shuffle7": {"spark.sql.shuffle.partitions": "7"},
}


def _clear_operator_caches() -> None:
    # both layers, same reason as tests/test_plans.py: the plan cache
    # memoizes frames whose persisted data was built under the PREVIOUS
    # regime — stale either way
    from event_streamer_spark.caching import clear_slot
    from event_streamer_spark.operators.registry import clear_plan_cache

    clear_slot()
    clear_plan_cache()


def _run_hash(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    rows = [tuple(r) for r in df.collect()]
    return canon_hash(list(df.columns), rows)


@pytest.fixture(scope="module")
def baseline_hashes(spark):
    _clear_operator_caches()
    return {name: _run_hash(spark, name) for name in SAMPLE}


@pytest.mark.parametrize("regime", sorted(REGIMES))
def test_physical_regime_invariance(spark, baseline_hashes, regime):
    overrides = REGIMES[regime]
    olds = {k: spark.conf.get(k) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        _clear_operator_caches()
        mismatches = [
            name
            for name in SAMPLE
            if _run_hash(spark, name) != baseline_hashes[name]
        ]
        assert not mismatches, (
            f"regime {regime} changed results for: {mismatches}"
        )
    finally:
        for k, v in olds.items():
            spark.conf.set(k, v)
        _clear_operator_caches()
