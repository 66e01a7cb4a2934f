"""Scale-pattern tests: salting equivalence, bucketed co-located joins.

These verify the 100 TB toolkit produces *identical results* to the
naive plans (salting) and *removes shuffles* (bucketing)."""

import os

import pytest
from pyspark.sql import functions as F

from event_streamer_spark.plans import explain_str
from event_streamer_spark.skew import salted_count, salted_join
from event_streamer_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_salted_join_matches_plain_join(spark):
    li = load(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    orders = load(spark, SF, "orders").select(
        F.col("o_orderkey").alias("k"), "o_totalprice"
    )
    plain = li.join(orders, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).collect()[0]
    salted = salted_join(li, orders, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).collect()[0]
    assert (plain["n"], plain["q"]) == (salted["n"], salted["q"])


def test_salted_count_matches_plain_count(spark):
    ev = load(spark, SF, "events")
    plain = {
        r["event_type"]: r["cnt"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    salted = {
        r["event_type"]: r["cnt"] for r in salted_count(ev, "event_type").collect()
    }
    assert plain == salted


def test_salted_join_splits_deliberate_hot_key(spark):
    """A power-law fixture: one user owns 80% of the rows. The salted
    join must (a) return exactly the plain join's rows and (b) actually
    split the hot key across multiple salt buckets."""
    hot = [(0, i) for i in range(4000)]
    cold = [(u, i) for u in range(1, 101) for i in range(10)]
    left = spark.createDataFrame(hot + cold, "k bigint, v bigint").repartition(8)
    right = spark.createDataFrame(
        [(u, f"dim{u}") for u in range(0, 101)], "k bigint, name string"
    )

    plain = left.join(right, "k")
    salted = salted_join(left, right, "k", salt_factor=8)
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )

    # evidence the hot key splits: the same salt expression spreads the
    # hot key's 4000 rows over (nearly) all 8 buckets
    n_salts = (
        left.filter(F.col("k") == 0)
        .withColumn("__salt", (F.rand(seed=42) * 8).cast("int"))
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_salts >= 6, n_salts


def test_salted_retention_cohorts_matches_plain(spark):
    from event_streamer_spark.operators import REGISTRY

    plain = REGISTRY["b33_retention_cohorts"].fn(spark, SF)
    salted = REGISTRY["b33_retention_cohorts_salted"].fn(spark, SF)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_two_level_row_number_matches_naive(spark):
    """The distributed two-level rank must reproduce the global
    row_number exactly, while its fact-table sort is bucketed (no
    single-task sort of a whole 3-value partition key)."""
    import re

    from pyspark.sql import Window

    from event_streamer_spark.operators.distrank import two_level_row_number

    li = load(spark, SF, "lineitem")
    order = ["l_extendedprice", "l_orderkey", "l_linenumber"]
    ranked = two_level_row_number(
        li, ["l_returnflag"], order, bucket_value="l_extendedprice",
        out_col="rn", count_col="n", n_buckets=8,
    )
    naive = li.select(
        "l_orderkey",
        "l_linenumber",
        F.row_number()
        .over(Window.partitionBy("l_returnflag").orderBy(*order))
        .alias("rn"),
    )
    got = {
        (r["l_orderkey"], r["l_linenumber"]): r["rn"]
        for r in ranked.select("l_orderkey", "l_linenumber", "rn").collect()
    }
    exp = {
        (r["l_orderkey"], r["l_linenumber"]): r["rn"] for r in naive.collect()
    }
    assert got == exp

    # plan: every row_number window over the fact table is partitioned by
    # the composite (flag, bucket) key — never the 3-value flag alone
    plan = explain_str(ranked, "simple")
    rn_windows = [
        line for line in plan.splitlines()
        if "windowspecdefinition" in line and "row_number" in line
    ]
    assert rn_windows, plan
    assert all("__bucket" in w for w in rn_windows), "\n".join(rn_windows)


def test_two_level_row_number_randomized_equivalence(spark):
    """Randomized adversarial shapes: heavy ties on the bucket value
    (ties must never straddle buckets), skewed part keys, a singleton
    key, and rn_limit pruning — all must equal the naive row_number."""
    import numpy as np

    from pyspark.sql import Window

    from event_streamer_spark.operators.distrank import two_level_row_number

    rng = np.random.RandomState(7)
    n = 5000
    rows = [
        (
            ["p", "q", "q", "r"][int(rng.randint(4))],  # skewed part keys
            int(rng.randint(50)),  # heavily tied bucket value
            int(i),  # unique tiebreaker
        )
        for i in range(n)
    ] + [("solo", 1, n + 1)]  # singleton partition key
    df = spark.createDataFrame(rows, "pk string, v bigint, uid bigint")

    naive_w = Window.partitionBy("pk").orderBy("v", "uid")
    exp = {
        r["uid"]: r["rn"]
        for r in df.select(
            "uid", F.row_number().over(naive_w).alias("rn")
        ).collect()
    }
    for limit in (None, 37):
        got_df = two_level_row_number(
            df, ["pk"], ["v", "uid"], bucket_value="v",
            n_buckets=8, out_col="rn", count_col="cnt", rn_limit=limit,
        )
        got = {r["uid"]: r["rn"] for r in got_df.select("uid", "rn").collect()}
        if limit is None:
            assert got == exp
            # count_col equals the true partition sizes everywhere
            sizes = {
                r["pk"]: r["cnt"]
                for r in got_df.select("pk", "cnt").distinct().collect()
            }
            true_sizes = {
                r["pk"]: r["n"]
                for r in df.groupBy("pk").agg(F.count(F.lit(1)).alias("n")).collect()
            }
            assert sizes == true_sizes
        else:
            assert got == {u: r for u, r in exp.items() if r <= limit}


def test_two_level_auto_mode_picks_by_size(spark):
    """``mode='auto'``: below the byte threshold the plan is the plain
    single-level window (no ``__bucket``); forcing the threshold to 0
    re-enables the two-level plan. Results identical either way."""
    from pyspark.sql import Window

    from event_streamer_spark.operators.distrank import two_level_row_number

    # parquet-backed frame: Catalyst's size estimate is real there
    # (createDataFrame yields a LogicalRDD whose stats are "unknown",
    # which auto treats as large — the conservative scale-safe choice)
    df = load(spark, SF, "lineitem").select(
        F.col("l_returnflag").alias("pk"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("uid"),
        F.col("l_extendedprice").alias("v"),
    )
    naive_w = Window.partitionBy("pk").orderBy("v", "uid")
    exp = {
        r["uid"]: r["rn"]
        for r in df.select("uid", F.row_number().over(naive_w).alias("rn")).collect()
    }

    small = two_level_row_number(
        df, ["pk"], ["v", "uid"], bucket_value="v", out_col="rn", mode="auto"
    )
    assert "__bucket" not in explain_str(small, "simple")
    assert {r["uid"]: r["rn"] for r in small.select("uid", "rn").collect()} == exp

    big = two_level_row_number(
        df, ["pk"], ["v", "uid"], bucket_value="v", out_col="rn",
        mode="auto", naive_max_bytes=0, n_buckets=8,
    )
    assert "__bucket" in explain_str(big, "simple")
    assert {r["uid"]: r["rn"] for r in big.select("uid", "rn").collect()} == exp


def test_auto_mode_crossover_with_real_estimates(spark):
    """The sf1-shaped size decision, non-degenerate on both sides: with
    the threshold set BETWEEN the sf0.001 and sf0.01 lineitem Catalyst
    estimates, auto must pick naive for the small table and two-level
    for the large one — the real statistic drives the choice, not a
    forced 0 threshold. Also pins that the estimate scales ~linearly
    with SF (10x data => 5-20x estimate), which is what places the
    1 GiB production crossover between sf1 (~0.14 GiB) and sf10: the
    measured decision here extrapolates to those sizes."""
    from event_streamer_spark.operators.distrank import (
        _plan_size_bytes,
        two_level_row_number,
    )

    def lineitem(sf_dir):
        return load(spark, sf_dir, "lineitem").select(
            F.col("l_returnflag").alias("pk"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("uid"),
            F.col("l_extendedprice").alias("v"),
        )

    small_df = lineitem("/root/testdata/sf0.001")
    big_df = lineitem("/root/testdata/sf0.01")
    est_small = _plan_size_bytes(small_df)
    est_big = _plan_size_bytes(big_df)
    assert est_small and est_big
    ratio = est_big / est_small
    assert 5 <= ratio <= 20, f"estimate not ~linear in SF: {ratio}"

    threshold = (est_small + est_big) // 2
    naive_pick = two_level_row_number(
        small_df, ["pk"], ["v", "uid"], bucket_value="v", out_col="rn",
        mode="auto", naive_max_bytes=threshold,
    )
    assert "__bucket" not in explain_str(naive_pick, "simple")
    two_level_pick = two_level_row_number(
        big_df, ["pk"], ["v", "uid"], bucket_value="v", out_col="rn",
        mode="auto", naive_max_bytes=threshold, n_buckets=8,
    )
    assert "__bucket" in explain_str(two_level_pick, "simple")


def test_two_level_naive_mode_count_and_limit(spark):
    """The naive fallback honors count_col and rn_limit exactly like
    the two-level path."""
    from event_streamer_spark.operators.distrank import two_level_row_number

    df = spark.createDataFrame(
        [(k % 2, k) for k in range(40)], "pk bigint, uid bigint"
    )
    out = two_level_row_number(
        df, ["pk"], ["uid"], bucket_value="uid", out_col="rn",
        count_col="n", rn_limit=5, mode="naive",
    )
    rows = out.collect()
    assert len(rows) == 10  # 5 per partition key
    assert all(r["n"] == 20 for r in rows)
    assert all(1 <= r["rn"] <= 5 for r in rows)


def test_two_level_cached_out_exposes_input_rows(spark):
    """``cached_out`` (r13) must expose the persisted bucketed frame —
    the caller's rows exactly once each (plus ``__bucket``) — so a
    second aggregate (b15's tied-rank counts) can read the cache
    instead of re-scanning the fact table, with identical counts."""
    from event_streamer_spark.operators.distrank import (
        tied_rank_table,
        two_level_row_number,
    )

    df = spark.createDataFrame(
        [(k % 3, k, k % 7) for k in range(60)], "pk bigint, uid bigint, v bigint"
    )
    shared: dict = {}
    two_level_row_number(
        df, ["pk"], ["uid"], bucket_value="uid", out_col="rn",
        mode="two_level", cached_out=shared,
    ).collect()
    assert "bucketed" in shared
    cached = shared["bucketed"]
    # same rows, exactly once each, with the __bucket helper appended
    assert "__bucket" in cached.columns
    assert sorted(
        (r["pk"], r["uid"], r["v"]) for r in cached.collect()
    ) == sorted((k % 3, k, k % 7) for k in range(60))
    # a tied-rank table computed from the cache matches one from the raw
    from_cache = {
        (r["pk"], r["v"]): (r["rnk"], r["drnk"])
        for r in tied_rank_table(cached, ["pk"], "v").collect()
    }
    from_raw = {
        (r["pk"], r["v"]): (r["rnk"], r["drnk"])
        for r in tied_rank_table(df, ["pk"], "v").collect()
    }
    assert from_cache == from_raw
    # naive mode must leave the hook unset (callers fall back)
    missing: dict = {}
    two_level_row_number(
        df, ["pk"], ["uid"], bucket_value="uid", out_col="rn",
        mode="naive", cached_out=missing,
    ).collect()
    assert "bucketed" not in missing


def test_two_level_per_site_slots_keep_both_frames_cached(spark):
    """Two forced-two-level calls in ONE plan (the d15/b72 shape) must
    keep BOTH bucketed frames persisted when given distinct slots; with
    the shared default slot the second call's persist evicts the first
    at build time (the r13 at-scale hazard this guards against)."""
    from event_streamer_spark.operators.distrank import (
        clear_cache,
        two_level_row_number,
    )

    df = spark.createDataFrame(
        [(k % 3, k) for k in range(60)], "pk bigint, uid bigint"
    )

    def chain(slots):
        c1: dict = {}
        r1 = two_level_row_number(
            df, ["pk"], ["uid"], bucket_value="uid", out_col="rn1",
            mode="two_level", cached_out=c1, slot=slots[0],
        )
        c2: dict = {}
        r2 = two_level_row_number(
            r1, ["pk"], [F.col("rn1").desc(), "uid"],
            bucket_value=-F.col("rn1"), out_col="rn2",
            mode="two_level", cached_out=c2, slot=slots[1],
        )
        return r2, c1["bucketed"], c2["bucketed"]

    clear_cache()
    # shared default slot: the second persist evicts the first frame
    out, b1, b2 = chain([None, None])
    assert not b1.storageLevel.useMemory, "expected eviction (shared slot)"
    # distinct per-site slots: both frames stay persisted
    clear_cache()
    out, b1, b2 = chain(["distrank.bucketed.t1", "distrank.bucketed.t2"])
    assert b1.storageLevel.useMemory and b2.storageLevel.useMemory
    rows = {(r["pk"], r["uid"]): (r["rn1"], r["rn2"]) for r in out.collect()}
    # rn2 is the reverse ranking of rn1 within each 20-row key
    assert all(rn2 == 21 - rn1 for rn1, rn2 in rows.values())
    clear_cache()


def test_percent_rank_expr_single_row_partition(spark):
    """percent_rank() of a 1-row partition is 0.0 by SQL definition —
    the (rn-1)/(n-1) arithmetic must not NULL out (ADVICE r4)."""
    from pyspark.sql import Window

    from event_streamer_spark.operators.distrank import percent_rank_expr

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("solo", 9)], "pk string, v bigint"
    )
    w = Window.partitionBy("pk").orderBy("v")
    wp = Window.partitionBy("pk")
    got = {
        (r["pk"], r["v"]): r["pr"]
        for r in df.select(
            "pk",
            "v",
            percent_rank_expr(
                F.row_number().over(w), F.count(F.lit(1)).over(wp)
            ).alias("pr"),
        ).collect()
    }
    native = {
        (r["pk"], r["v"]): r["pr"]
        for r in df.select(
            "pk", "v", F.round(F.percent_rank().over(w), 6).alias("pr")
        ).collect()
    }
    assert got == native
    assert got[("solo", 9)] == 0.0


def test_tied_ranks_matches_naive(spark):
    from pyspark.sql import Window

    from event_streamer_spark.operators.distrank import tied_ranks

    li = load(spark, SF, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("l_quantity"))
    naive = li.select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )
    got_df = tied_ranks(
        li, ["l_returnflag"], "l_quantity", descending=True
    ).select("l_orderkey", "l_linenumber", "rnk", "drnk")
    # (l_orderkey, l_linenumber) is not unique in the synthetic data —
    # compare as multisets of full tuples
    got = sorted(map(tuple, got_df.collect()))
    exp = sorted(map(tuple, naive.collect()))
    assert got == exp


def test_ntile_expr_matches_native(spark):
    from pyspark.sql import Window

    from event_streamer_spark.operators.distrank import ntile_expr

    # sizes that exercise n % k == 0, != 0, and n < k
    for n, k in [(97, 4), (100, 4), (3, 7)]:
        df = spark.range(1, n + 1).select(F.col("id"))
        w = Window.orderBy("id")
        native = df.select(
            "id", F.ntile(k).over(w).alias("t")
        )
        arith = df.select(
            "id",
            F.row_number().over(w).alias("rn"),
        ).select("id", ntile_expr(F.col("rn"), F.lit(n), k).alias("t"))
        exp = {r["id"]: r["t"] for r in native.collect()}
        got = {r["id"]: r["t"] for r in arith.collect()}
        assert got == exp, (n, k)


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key co-locates matching rows:
    the join plan must contain no Exchange (the 100 TB repeated-join
    pattern — pay the shuffle once at write time)."""
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    # force the sort-merge path: broadcast would hide the bucketing
    # (and at real scale neither side fits in a broadcast anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    orders = load(spark, SF, "orders")
    customer = load(spark, SF, "customer")
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        orders.write.bucketBy(4, "o_custkey")
        .sortBy("o_custkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        customer.write.bucketBy(4, "c_custkey")
        .sortBy("c_custkey")
        .mode("overwrite")
        .saveAsTable("b_customer")
    )
    try:
        bo = spark.table("b_orders")
        bc = spark.table("b_customer")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
        plan = explain_str(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and it still returns the right rows
        assert joined.count() == orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_exclusive_prefix_sum_adversarial_keys(spark):
    """The three-level prefix sum must equal a single global scan on
    every key shape that stresses its decomposition: sparse keys,
    range-boundary keys (fanout and fanout² straddles), a single row,
    all rows in one range, and negative-free zero keys."""
    import pandas as pd

    from event_streamer_spark.operators.pipeline import exclusive_prefix_sum

    fanout = 10  # small fanout so the test crosses ALL three levels
    cases = {
        "boundary_straddle": [0, 9, 10, 11, 99, 100, 101, 999, 1000],
        "sparse": [3, 47, 1001, 5000, 99999],
        "single": [42],
        "one_range": [1, 2, 3, 4, 5],
        "dense_multi_super": list(range(0, 250, 7)),
    }
    for name, keys in cases.items():
        vals = [(k * 7) % 13 + 1 for k in keys]
        pdf = pd.DataFrame({"k": keys, "v": vals}).sort_values("k")
        expected = dict(
            zip(pdf["k"], pdf["v"].cumsum() - pdf["v"])
        )
        df = spark.createDataFrame(
            list(zip(keys, vals)), "k bigint, v bigint"
        )
        out = exclusive_prefix_sum(df, "k", "v", fanout=fanout)
        got = {r["k"]: r["prefix"] for r in out.collect()}
        assert got == expected, name


class TestBloomPruneJoin:
    """bloom_prune_join must equal the plain join exactly (Bloom has no
    false negatives; the real join removes false positives) while
    rejecting most non-matching rows before the shuffle."""

    def test_semi_join_equivalence(self, spark):
        from event_streamer_spark.skew import bloom_prune_join

        orders = load(spark, SF, "orders")
        # a selective small side: customers in one nation segment
        cust = load(spark, SF, "customer").filter(
            F.col("c_nationkey") < 3
        ).select(F.col("c_custkey").alias("o_custkey"))
        plain = orders.join(cust, "o_custkey", "left_semi")
        pruned = bloom_prune_join(orders, cust, "o_custkey", "left_semi")
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, pruned.collect())
        )
        assert plain.count() > 0

    def test_inner_join_equivalence(self, spark):
        from event_streamer_spark.skew import bloom_prune_join

        li = load(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
        small = (
            load(spark, SF, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate")
        )
        plain = li.join(small, "l_orderkey", "inner")
        pruned = bloom_prune_join(li, small, "l_orderkey", "inner")
        assert plain.count() == pruned.count() > 0
        assert plain.exceptAll(pruned).count() == 0

    def test_outer_join_rejected(self, spark):
        from event_streamer_spark.skew import bloom_prune_join

        df = load(spark, SF, "orders")
        with pytest.raises(ValueError, match="left_semi/inner"):
            bloom_prune_join(df, df, "o_orderkey", "left_outer")

    def test_prunes_nonmatching_rows_map_side(self, spark):
        from event_streamer_spark.operators.pipeline import (
            bloom_bitmap,
            bloom_might_contain,
        )

        orders = load(spark, SF, "orders")
        cust = (
            load(spark, SF, "customer")
            .filter(F.col("c_nationkey") == 0)
            .select(F.col("c_custkey").cast("string").alias("__bk"))
            .distinct()
        )
        bitmap = bloom_bitmap(cust, "__bk")
        survivors = (
            orders.withColumn("__bk", F.col("o_custkey").cast("string"))
            .crossJoin(F.broadcast(bitmap))
            .filter(bloom_might_contain("__bk"))
            .count()
        )
        matches = orders.join(
            cust.select(F.col("__bk").cast("bigint").alias("o_custkey")),
            "o_custkey",
            "left_semi",
        ).count()
        total = orders.count()
        # survivors = true matches + alpha sliver; must be far below total
        assert matches <= survivors <= matches + 0.05 * total, (
            matches,
            survivors,
            total,
        )
        assert survivors < 0.5 * total


def test_bloom_prune_join_rejects_mismatched_key_types(spark):
    from event_streamer_spark.skew import bloom_prune_join

    big = spark.createDataFrame([(1,), (2,)], "k bigint")
    small = spark.createDataFrame([(1.0,)], "k double")
    with pytest.raises(ValueError, match="matching key types"):
        bloom_prune_join(big, small, "k", "left_semi")


SF10_DIR = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/sf10")


@pytest.mark.skipif(
    not os.path.exists(f"{SF10_DIR}/lineitem.parquet"),
    reason="sf10 data absent — generate with "
    "`python scripts/gen_sf1.py /tmp/sf10 --reps 100 "
    "--tables lineitem,events,documents` (scripts/prove_sf10.py runs the "
    "full proof)",
)
def test_sf10_auto_flips_at_default_threshold(spark):
    """The sf10 crossover proof, at REAL sizes (not extrapolation): the
    Catalyst estimate for the FULL-WIDTH sf10 lineitem scan exceeds the
    CLUSTER 1 GiB threshold, so with the engine conf pinned to the
    cluster default ``mode='auto'`` emits the two-level plan — while
    the LOCAL default (8 GiB on a local[*] master; the sf10 proof
    measured naive 4× faster locally, where no cluster straggler
    exists) keeps the very same sf10 call naive. sf0.001 stays naive
    under both. (Catalyst prunes the estimate by projected width, so
    b15's 5-column frame crosses around sf20 — the decision input is
    whatever frame the caller hands in.) Plan checks only — no job
    runs; timing lives in scripts/prove_sf10.py."""
    from event_streamer_spark.operators.distrank import (
        _NAIVE_MAX_BYTES,
        _NAIVE_MAX_BYTES_CONF,
        _plan_size_bytes,
        resolve_naive_max_bytes,
        two_level_row_number,
    )

    assert _plan_size_bytes(load(spark, SF10_DIR, "lineitem")) > _NAIVE_MAX_BYTES
    assert _plan_size_bytes(load(spark, SF, "lineitem")) < _NAIVE_MAX_BYTES
    # this suite runs on a local master → the resolved default is the
    # raised local threshold, above the sf10 estimate
    assert resolve_naive_max_bytes(spark) > _NAIVE_MAX_BYTES

    def auto_plan(df):
        return explain_str(
            two_level_row_number(
                df,
                ["l_returnflag"],
                [F.desc("l_extendedprice"), "l_orderkey", "l_linenumber"],
                bucket_value=-F.col("l_extendedprice"),
                out_col="rn",
                mode="auto",
                cache=False,
            ),
            "simple",
        )

    # local default: sf10 stays naive (no __bucket) — the 4×-faster plan
    assert "__bucket" not in auto_plan(load(spark, SF10_DIR, "lineitem"))
    try:
        # cluster rehearsal: pin the conf to the cluster crossover and
        # the SAME sf10 call flips two-level
        spark.conf.set(_NAIVE_MAX_BYTES_CONF, str(_NAIVE_MAX_BYTES))
        assert "__bucket" in auto_plan(load(spark, SF10_DIR, "lineitem"))
        assert "__bucket" not in auto_plan(load(spark, SF, "lineitem"))
    finally:
        spark.conf.unset(_NAIVE_MAX_BYTES_CONF)


def test_distrank_threshold_conf_resolution(spark):
    """VERDICT r7 #6: the auto-mode crossover is engine conf.
    Resolution order: explicit ``naive_max_bytes`` argument > the
    ``spark.event_streamer.distrank.naiveMaxBytes`` conf > the
    master-dependent default (8 GiB local / 1 GiB cluster)."""
    from event_streamer_spark.operators.distrank import (
        _LOCAL_NAIVE_MAX_BYTES,
        _NAIVE_MAX_BYTES_CONF,
        resolve_naive_max_bytes,
        two_level_row_number,
    )

    # this suite's master is local[*] → raised local default
    assert resolve_naive_max_bytes(spark) == _LOCAL_NAIVE_MAX_BYTES
    try:
        spark.conf.set(_NAIVE_MAX_BYTES_CONF, "12345")
        assert resolve_naive_max_bytes(spark) == 12345
        # conf drives the auto decision: tiny threshold → two-level
        # even for the tiny sf0.001 frame
        df = load(spark, SF, "lineitem").select(
            F.col("l_returnflag").alias("pk"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("uid"),
            F.col("l_extendedprice").alias("v"),
        )
        spark.conf.set(_NAIVE_MAX_BYTES_CONF, "0")
        via_conf = two_level_row_number(
            df, ["pk"], ["v", "uid"], bucket_value="v", out_col="rn",
            mode="auto", n_buckets=8, cache=False,
        )
        assert "__bucket" in explain_str(via_conf, "simple")
        # explicit argument outranks the conf
        via_arg = two_level_row_number(
            df, ["pk"], ["v", "uid"], bucket_value="v", out_col="rn",
            mode="auto", naive_max_bytes=1 << 40, cache=False,
        )
        assert "__bucket" not in explain_str(via_arg, "simple")
    finally:
        spark.conf.unset(_NAIVE_MAX_BYTES_CONF)


SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")


@pytest.mark.skipif(
    not os.path.exists(f"{SF1_DIR}/lineitem.parquet"),
    reason="sf1 data absent — generate with "
    "`python scripts/gen_sf1.py /tmp/sf1` (the per-round BENCH_sf1 "
    "artifact protocol lives in COVERAGE.md)",
)
def test_sf1_growth_sublinear(spark):
    """VERDICT r7 #4 (gated leg): wall-clock growth from sf0.1 to sf1
    (10× the data) must stay at-or-below linear, with generous slack
    for ambient sandbox load — a representative subset re-measured
    in-session so the check is self-contained (the full 18-query
    evidence is the per-round BENCH_sf1_r{N}.json artifact). Also pins
    that row counts actually scale (the sf1 dir is a real 10× corpus,
    not a copy)."""
    import time

    from event_streamer_spark.operators import REGISTRY

    SUBSET = ["b11_tpch_q1", "b05_join_inner", "d1_exact_dedup",
              "d4_quality_score"]
    SF01 = "/root/testdata/sf0.1"

    def warm_time(name, sf_dir):
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).count()  # warm pass (codegen, caches)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        return best

    rows01 = load(spark, SF01, "lineitem").count()
    rows1 = load(spark, SF1_DIR, "lineitem").count()
    scale = rows1 / rows01
    assert 8 <= scale <= 12, f"sf1 corpus is not ~10× sf0.1: {scale}"

    for name in SUBSET:
        t01 = warm_time(name, SF01)
        t1 = warm_time(name, SF1_DIR)
        # ≤ linear (scale×) with 2.5× ambient-load slack and a 0.3 s
        # floor so sub-100 ms queries can't flake on scheduler jitter
        bound = scale * 2.5 * max(t01, 0.12)
        assert t1 <= bound, (
            f"{name}: sf1 {t1:.2f}s vs sf0.1 {t01:.2f}s exceeds "
            f"~linear bound {bound:.2f}s"
        )


def test_is_local_master_excludes_local_cluster():
    """Review r8: 'local-cluster[...]' runs real separate executor JVMs
    — it must resolve the 1 GiB CLUSTER threshold, not the raised local
    one a bare startswith('local') would have granted it."""
    from event_streamer_spark.operators.distrank import _is_local_master

    assert _is_local_master("local")
    assert _is_local_master("local[8]")
    assert _is_local_master("local[*]")
    assert not _is_local_master("local-cluster[2,1,1024]")
    assert not _is_local_master("spark://host:7077")
    assert not _is_local_master("yarn")
    assert not _is_local_master("")


def test_two_level_single_bucket_degenerates(spark):
    """Review r8: n_buckets=1 (zero boundaries) must degenerate to one
    global bucket per key — the unrolled bucket assignment used to
    IndexError on the empty term list at plan-build time."""
    from pyspark.sql import Window

    from event_streamer_spark.operators.distrank import (
        clear_cache,
        two_level_row_number,
    )

    li = load(spark, SF, "lineitem")
    order = ["l_extendedprice", "l_orderkey", "l_linenumber"]
    try:
        ranked = two_level_row_number(
            li, ["l_returnflag"], order, bucket_value="l_extendedprice",
            out_col="rn", n_buckets=1, mode="two_level",
        )
        got = {
            (r["l_orderkey"], r["l_linenumber"]): r["rn"]
            for r in ranked.select(
                "l_orderkey", "l_linenumber", "rn"
            ).collect()
        }
    finally:
        clear_cache()
    naive = li.select(
        "l_orderkey",
        "l_linenumber",
        F.row_number()
        .over(Window.partitionBy("l_returnflag").orderBy(*order))
        .alias("rn"),
    )
    exp = {
        (r["l_orderkey"], r["l_linenumber"]): r["rn"] for r in naive.collect()
    }
    assert got == exp
