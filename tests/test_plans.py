"""Physical-plan assertions — the 100 TB posture, enforced.

These tests pin the *plan shape*, not timing: filters reach the parquet
scan, projections prune columns, small dims broadcast, global top-k
avoids a full sort, aggregations are partial (map-side) before the
exchange. A regression here is a scale regression even if sf0.001 timing
looks fine.
"""

import io
from contextlib import redirect_stdout

import pytest

from event_streamer_spark.operators import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "b04_filter")
    assert "PushedFilters: [Or(And(" in plan.replace("\n", "")


def test_q1_pushdown_and_partial_agg(spark):
    plan = plan_of(spark, "b11_tpch_q1")
    assert "LessThanOrEqual(l_shipdate" in plan
    # partial aggregation before the exchange: HashAggregate appears
    # below AND above Exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_column_pruning(spark):
    plan = plan_of(spark, "b01_parquet_scan")
    # only the 5 projected columns in ReadSchema — not all 11
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" not in read_schema
    assert "l_quantity" in read_schema


def test_dims_broadcast(spark):
    plan = plan_of(spark, "b10_broadcast_join")
    # formatted explain shows each node twice (tree + detail): 2 joins → 4
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_stream_static_join_broadcasts(spark):
    plan = plan_of(spark, "b05_join_inner")
    # AQE or static planning must pick broadcast for the small customer dim
    assert "BroadcastHashJoin" in plan or "broadcast" in plan.lower()


def test_topk_no_global_sort(spark):
    plan = plan_of(spark, "b18_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_semi_anti_join_shapes(spark):
    assert "LeftSemi" in plan_of(spark, "b07_join_semi")
    assert "LeftAnti" in plan_of(spark, "b07_join_anti")


def test_range_join_is_equi_with_residual(spark):
    """b09 must remain an equi join on l_orderkey with the date range as
    a residual condition — not a cartesian/BNLJ explosion."""
    plan = plan_of(spark, "b09_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_neardup_no_driver_materialization(spark):
    """d2_embedding_neardup must build lazily — no job (the old
    driver-side collect() ran one during query construction) and no
    CollectLimit in the plan; the compare runs as a grouped-pandas tile."""
    from event_streamer_spark.tables import load

    tracker = spark.sparkContext.statusTracker()
    # baseline: a bare parquet load triggers a footer-read job; the
    # query construction must not add jobs beyond that per-table cost
    b0 = len(tracker.getJobIdsForGroup(None) or [])
    load(spark, SF, "embeddings")
    per_load = len(tracker.getJobIdsForGroup(None) or []) - b0
    before = len(tracker.getJobIdsForGroup(None) or [])
    plan = plan_of(spark, "d2_embedding_neardup")
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after - before <= per_load, "query construction triggered extra jobs"
    assert "CollectLimit" not in plan
    assert "FlatMapGroupsInPandas" in plan


def test_asof_join_no_range_explosion(spark):
    """b31 must stay union + window (one hash exchange on user_id) —
    never a BroadcastNestedLoopJoin/cartesian range self-join."""
    plan = plan_of(spark, "b31_asof_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_tfidf_partial_aggregation(spark):
    """Term counts must partial-aggregate map-side before the exchange."""
    plan = plan_of(spark, "d4_tfidf_topk")
    assert plan.count("HashAggregate") >= 2


def test_sequence_pack_distributed_prefix_sum(spark):
    """d9's prefix sum is three-level: every window in the plan must be
    PARTITIONED — docs by rng, range totals by rng2, and the top scan by
    an explicit single-partition key — so no stage silently moves the
    corpus (or even the ranges table) to one unpartitioned sort."""
    import re

    plan = plan_of(spark, "d9_sequence_pack")
    # an unpartitioned spec's first windowspecdefinition arg is the
    # ORDER expr (col ASC/DESC); a partitioned spec's is the plain
    # partition column
    unpartitioned = re.findall(
        r"windowspecdefinition\([^,()]+ (?:ASC|DESC)", plan
    )
    assert not unpartitioned, unpartitioned
    # corpus-side window partitions on rng and orders by doc_id
    corpus_window = [
        l for l in plan.splitlines()
        if "windowspecdefinition" in l and "doc_id" in l
    ]
    assert corpus_window and all(", doc_id#" in l for l in corpus_window)


def test_funnel_no_cartesian(spark):
    plan = plan_of(spark, "b32_funnel")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2  # partial aggs


def test_decontaminate_partial_aggregation(spark):
    plan = plan_of(spark, "d8_decontaminate")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_tpch_q4_semi_join_no_widening(spark):
    """Q4's correlated EXISTS must compile to a semi join (no row
    widening, no distinct) with the quarter filter pushed to the scan."""
    plan = plan_of(spark, "b38_tpch_q4")
    assert "LeftSemi" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_tpch_q16_anti_join_and_pruned_part(spark):
    """Q16: NOT IN compiles to an anti join; part's brand/size filters
    reach its scan."""
    plan = plan_of(spark, "b39_tpch_q16")
    assert "LeftAnti" in plan
    assert "Not(EqualTo(p_brand" in plan


def test_tpch_q5_broadcasts_dimensions(spark):
    """Q5's 6-table chain: region/nation prune early and the dimension
    joins broadcast — no sort-merge anywhere in the chain at this SF."""
    plan = plan_of(spark, "b40_tpch_q5")
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(r_name,ASIA)" in plan.replace(" ", "")


def test_tpch_q10_pushes_both_fact_filters(spark):
    plan = plan_of(spark, "b41_tpch_q10")
    assert "EqualTo(l_returnflag,R)" in plan.replace(" ", "")
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_window_rank_bucket_pruned_topk(spark):
    """The distributed top-100 must not sort whole partition keys: its
    row_number window partitions on the composite bucket key. b15 pins
    mode='two_level' deliberately — auto/naive halved cold but DOUBLED
    warm at sf0.1 because this query's three window consumers share
    the cached bucketed frame (measured round 8; rationale at the call
    site). The auto policy itself is pinned for the single-consumer
    call sites by test_equidepth_auto_stays_naive_locally below and
    the threshold tests in test_scale_patterns."""
    import re

    from event_streamer_spark.plans import explain_str

    df = REGISTRY["b15_window_rank"].fn(spark, SF)
    plan = explain_str(df, "simple")
    rn_windows = [
        line for line in plan.splitlines()
        if "windowspecdefinition" in line and "row_number" in line
        and "__bucket" not in line
    ]
    # the ONLY windows without a bucket key run over the tiny tied-rank
    # count table (their spec orders by l_quantity), never the fact sort
    for w in rn_windows:
        assert "l_quantity" in w, w


def test_equidepth_auto_stays_naive_locally(spark):
    """b34_equidepth_histogram (single-consumer distrank call) runs
    mode='auto' since round 8: below the local threshold its plan must
    be the plain window (no bucket machinery, no cache build on the
    cold path); forcing the threshold conf to 0 flips the SAME
    registry query to the bucketed two-level plan."""
    from event_streamer_spark.caching import clear_slot
    from event_streamer_spark.operators.distrank import (
        _NAIVE_MAX_BYTES_CONF,
    )
    from event_streamer_spark.operators.registry import clear_plan_cache
    from event_streamer_spark.plans import explain_str

    clear_plan_cache()
    clear_slot()
    local_plan = explain_str(
        REGISTRY["b34_equidepth_histogram"].fn(spark, SF), "simple"
    )
    assert "__bucket" not in local_plan, "local auto should stay naive"

    spark.conf.set(_NAIVE_MAX_BYTES_CONF, "0")
    try:
        clear_plan_cache()
        clear_slot()
        flipped = explain_str(
            REGISTRY["b34_equidepth_histogram"].fn(spark, SF), "simple"
        )
        assert "__bucket" in flipped, flipped
    finally:
        spark.conf.unset(_NAIVE_MAX_BYTES_CONF)
        clear_plan_cache()
        clear_slot()


def test_tpch_q14_pushes_month_filter_and_broadcasts_part(spark):
    plan = plan_of(spark, "b42_tpch_q14")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "BroadcastHashJoin" in plan


def test_tpch_q19_derives_single_table_disjunctions(spark):
    """The OR-of-ANDs must reach BOTH scans as derived single-table
    disjunctions (brand/size on part, quantity on lineitem)."""
    plan = plan_of(spark, "b43_tpch_q19").replace(" ", "")
    assert "Or(And(EqualTo(p_brand,Brand#12)" in plan
    assert "l_quantity" in plan.split("PushedFilters")[1].split("\n")[0] or (
        "GreaterThanOrEqual(l_quantity" in plan
    )


def test_tpch_q7_no_fact_fact_broadcast_misuse(spark):
    """Q7's chain: pruned nations broadcast; the lineitem-orders join is
    the only big-big join (hash/SMJ, not a cartesian)."""
    plan = plan_of(spark, "b44_tpch_q7")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q17_decorrelates_without_cartesian(spark):
    """Q17's correlated scalar-avg must become an aggregate + broadcast
    join — never a per-row subquery or a cartesian product."""
    plan = plan_of(spark, "b49_tpch_q17")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the per-part average is a real partial aggregate
    assert plan.count("HashAggregate") >= 2


def test_tpch_q21_quantifiers_compile_to_order_grain_stats(spark):
    """Q21's EXISTS / NOT-EXISTS pair must compile to per-order min/max
    supplier statistics folded into ONE map-side-combinable aggregate
    over the lineitem×orders join (r14) — NOT the lineitem-grain
    semi/anti self-joins (pre-r13), and NOT the r13 window + second
    lineitem scan + order-grain SMJ. Partial aggregation must be
    visible (partial_min/partial_max), there must be no Window pass,
    and lineitem must be scanned exactly once."""
    plan = plan_of(spark, "b50_tpch_q21")
    assert "LeftSemi" not in plan
    assert "LeftAnti" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "partial_min" in plan and "partial_max" in plan
    assert plan.count("lineitem.parquet") == 1


def test_tpch_q2_min_cost_broadcasts_keeper_set(spark):
    """Q2's per-part MIN keeper set and the filtered part dimension must
    broadcast — the offers aggregate is the only fact-sized shuffle."""
    plan = plan_of(spark, "b51_tpch_q2")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q8_single_fact_fact_shuffle(spark):
    """Q8's 8-table chain: every dimension leg broadcasts; the only
    big-big join is lineitem⨝orders, and the order-date range reaches
    the orders scan."""
    plan = plan_of(spark, "b52_tpch_q8")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_tpch_q9_like_filter_prunes_part_before_broadcast(spark):
    """Q9: the p_name LIKE filter must reach part's scan (as a contains
    pushdown) so the broadcast ships only red parts."""
    plan = plan_of(spark, "b53_tpch_q9")
    assert "StringContains(p_name,red)" in plan.replace(" ", "")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q11_threshold_joins_reduced_frame(spark):
    """Q11's 0.1% threshold is a 1-row broadcast over the per-part
    aggregate — the nation filter reaches the scans, and both
    aggregates are map-side partial."""
    plan = plan_of(spark, "b54_tpch_q11")
    assert "EqualTo(n_name,NATION_3)" in plan.replace(" ", "")
    assert plan.count("HashAggregate") >= 4  # per-part + total, partial each


def test_tpch_q12_ship_range_pushed_lateness_residual(spark):
    """Q12: the ship-year range pushes to lineitem's scan; the lateness
    predicate (needs both sides) stays a join-level condition without
    degrading the join to a cartesian."""
    plan = plan_of(spark, "b55_tpch_q12")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q13_left_join_keeps_zero_order_customers(spark):
    """Q13: the priority filter prunes orders BEFORE the left join (it
    lives in the join condition, semantically), and both aggregation
    levels are partial."""
    plan = plan_of(spark, "b56_tpch_q13")
    assert "LeftOuter" in plan or "BuildRight" in plan
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in plan.replace(" ", "")
    assert plan.count("HashAggregate") >= 4


def test_tpch_q15_quarter_filter_pushed(spark):
    """Q15: the quarter range reaches lineitem's scan; the scalar MAX is
    a 1-row broadcast over the already-reduced revenue frame."""
    plan = plan_of(spark, "b57_tpch_q15")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert plan.count("HashAggregate") >= 4


def test_tpch_q20_semi_join_with_pushed_prefix(spark):
    """Q20: IN-subquery compiles to LEFT SEMI; the p_name prefix pushes
    as StringStartsWith; the ship-year range reaches lineitem."""
    plan = plan_of(spark, "b58_tpch_q20")
    assert "LeftSemi" in plan
    assert "StringStartsWith(p_name,red)" in plan.replace(" ", "")
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_tpch_q22_anti_join_for_lapsed_customers(spark):
    """Q22: NOT EXISTS compiles to LEFT ANTI on custkey; the order-date
    window reaches the orders scan; no cartesian beyond the 1-row
    threshold broadcast."""
    plan = plan_of(spark, "b59_tpch_q22")
    assert "LeftAnti" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_tpch_q3_pushed_filters_and_topk(spark):
    """Q3: segment/date filters reach their scans; the top-10 on
    (revenue DESC, orderkey) is TakeOrderedAndProject, not a global
    sort; no cartesian anywhere in the 3-way chain."""
    plan = plan_of(spark, "b35_tpch_q3")
    assert "EqualTo(c_mktsegment,BUILDING)" in plan.replace(" ", "")
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q6_scan_bound_single_aggregate(spark):
    """Q6 is scan-bound by construction: every predicate pushes to the
    lineitem scan, there is NO join, and the single global aggregate is
    map-side partial."""
    plan = plan_of(spark, "b36_tpch_q6")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount" in plan
    assert "LessThan(l_quantity" in plan
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2


def test_tpch_q18_semi_join_from_aggregate(spark):
    """Q18: the large-volume keeper set is an aggregate-derived LEFT
    SEMI join (no row widening before the final group)."""
    plan = plan_of(spark, "b37_tpch_q18")
    assert "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_interval_join_stays_equi_binned(spark):
    """B9 interval-overlap join: the bin explode must compile to an
    EQUI hash join on (user_id, bin) with the overlap predicate as a
    residual — never a BroadcastNestedLoopJoin/cartesian."""
    plan = plan_of(spark, "b09_interval_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_max_dup_span_single_sort_for_all_levels(spark):
    """D1 hash doubling: the four span levels must share ONE lineage —
    a single per-doc sort feeds the whole lead/window chain (stack
    unpivot), not one chain per level branch. Round 10 adds the
    unique-doc canonicalization window upstream (conflicting-duplicate
    fix), which Catalyst compiles to a two-phase WindowGroupLimit
    (partial + final rn=1 pushdown, one sort each side of its
    exchange) — so the canonical plan is exactly 3 sorts: 2 for the
    canonicalization, 1 shared by all five lead windows."""
    import re

    from event_streamer_spark.caching import clear_slot
    from event_streamer_spark.operators.registry import clear_plan_cache

    # reset BOTH caches: clearing only the persist slot while the plan
    # cache still returns the memoized frame leaves an unpersisted lv
    # whose joins re-plan as SortMergeJoin (extra sorts); a fresh build
    # re-registers the persist and restores the canonical shape
    clear_slot("d1_max_dup_span_lv")
    clear_plan_cache()
    plan = plan_of(spark, "d1_max_dup_span")
    n_sorts = len(re.findall(r"\(\d+\) Sort", plan))
    assert n_sorts == 3, n_sorts
    # the rn=1 canonicalization must compile to the pushed-down
    # WindowGroupLimit, not a full window + filter
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_frequent_pairs_two_shuffles_no_join(spark):
    """D19's declared shape: ONE exchange into per-basket collect_set
    arrays, ONE map-side-combinable pair-count exchange, pair
    expansion via generators — no join anywhere in the plan."""
    plan = plan_of(spark, "d19_frequent_pairs")
    body = plan.split("===== Subqueries =====")[0]
    # formatted explain lists each physical node once in the tree
    tree = body.split("\n\n")[0]
    assert tree.count("Exchange") == 2, tree
    assert "Join" not in tree, tree
    assert "Generate" in tree  # the explode-based expansion
    # the pair count is partial before its exchange
    assert body.count("HashAggregate") >= 2


def test_skyline_broadcasts_frontier(spark):
    """B71's dimensional reduction: the recovery join must broadcast
    the domain-bounded frontier (never SMJ the base table against
    itself), and no cartesian/BNLJ dominance scan may appear."""
    plan = plan_of(spark, "b71_skyline")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan


def test_vwap_single_fact_aggregate(spark):
    """B73: one fact-dim join then ONE aggregate on (brand, month) —
    partial before the exchange; the part dimension side is pruned to
    two columns."""
    plan = plan_of(spark, "b73_vwap")
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    part_schema = [l for l in read_schemas if "p_brand" in l]
    assert part_schema and "p_type" not in part_schema[0]
    assert plan.count("HashAggregate") >= 2


def _distinct_exchanges(plan: str) -> int:
    """Count DISTINCT shuffle Exchange operator nodes from explain-
    formatted detail lines ('(n) Exchange'), excluding broadcasts —
    the tree section repeats nodes, so a raw substring count
    double-counts."""
    import re

    return len(re.findall(r"^\(\d+\) Exchange\s*$", plan, re.M))


def test_ivf_multiprobe_bounded_shuffles(spark):
    """d3_ivf_topk's multi-probe leg (r13, VERDICT #7): the probed
    index must keep exactly the declared shuffles — probe-list
    explode, one hash exchange on cell into the per-cell GEMM
    (FlatMapGroupsInPandas), the (src, nbr) dedup aggregate, and the
    per-src top-3 merge — with the rank filter compiled to a
    WindowGroupLimit (group-local top-k), never a global sort, never a
    join. A refactor that adds an exchange or degrades the merge to a
    full window sort fails here before it ships. (r14: a two-phase
    triangle-inequality probe-pruning rewrite was measured and
    REJECTED — the bound fires on 0/300k probes at 100k×256/K=316 and
    the 500k nprobe4 wall regressed 38.5 → 64.2 s; see
    OPTIMIZATION_r14.md.)"""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from event_streamer_spark.operators.similarity import (
        _ivf_topk_impl,
        load_embeddings,
        train_ivf_centroids,
    )

    emb = load_embeddings(spark, SF).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = train_ivf_centroids(spark, emb)
    df = _ivf_topk_impl(spark, SF, cents, nprobe=4)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("FlatMapGroupsInPandas") >= 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "WindowGroupLimit" in plan  # top-3 merge is group-local
    assert "Exchange rangepartitioning" not in plan  # no global sort
    assert _distinct_exchanges(plan) <= 4, plan


def test_pq_topk_shortlist_no_global_sort(spark):
    """d3_pq_topk (r13, VERDICT #7): the ADC shortlist must compile to
    TakeOrderedAndProject (per-partition top-k + merge — never an
    Exchange rangepartitioning full sort), the only nested-loop joins
    are the broadcast of the 1-row query vector / LUT, and the scan →
    shortlist → re-rank chain keeps its bounded exchange budget."""
    plan = plan_of(spark, "d3_pq_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan
    # the 1-row query-vector broadcasts are the ONLY nested-loop joins
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert _distinct_exchanges(plan) <= 4, plan
