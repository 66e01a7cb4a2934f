"""D19 market-basket: first-principles soundness + rule invariants."""

import os
import shutil
import sys
from itertools import combinations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from event_streamer_spark.operators import REGISTRY
from event_streamer_spark.operators.basket import (
    _MAX_BASKET,
    _MIN_SUPPORT,
    frequent_pairs,
)
from event_streamer_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_frequent_pairs_first_principles(spark):
    """Every (pair, support) row must equal a naive per-basket
    recount of distinct co-occurrences — computed driver-side from the
    raw table, independent of the join/aggregate pipeline."""
    rows = REGISTRY["d19_frequent_pairs"].fn(spark, SF).collect()
    raw = (
        load(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets: dict[int, set[int]] = {}
    for r in raw:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    expected: dict[tuple[int, int], int] = {}
    for items in baskets.values():
        assert len(items) <= _MAX_BASKET  # TPC-H baskets never hit the cap
        for x, y in combinations(sorted(items), 2):
            expected[(x, y)] = expected.get((x, y), 0) + 1
    expected = {k: v for k, v in expected.items() if v >= _MIN_SUPPORT}
    got = {(r["part_x"], r["part_y"]): r["support"] for r in rows}
    assert got == expected
    assert all(x < y for x, y in got)  # canonical orientation


def test_assoc_rules_invariants(spark):
    pairs = {
        (r["part_x"], r["part_y"]): r["support"]
        for r in REGISTRY["d19_frequent_pairs"].fn(spark, SF).collect()
    }
    rules = REGISTRY["d19_assoc_rules"].fn(spark, SF).collect()
    # both directions of every frequent pair, nothing else
    assert len(rules) == 2 * len(pairs)
    by_dir = {(r["antecedent"], r["consequent"]): r for r in rules}
    for (x, y), support in pairs.items():
        fwd, rev = by_dir[(x, y)], by_dir[(y, x)]
        assert fwd["support"] == rev["support"] == support
        # lift is symmetric by definition (exact integers, same DIV)
        assert fwd["lift_ppm"] == rev["lift_ppm"]
    # confidence = P(cons|ant) ≤ 1, in ppm with truncating division
    assert all(0 < r["confidence_ppm"] <= 1_000_000 for r in rules)
    assert all(r["lift_ppm"] > 0 for r in rules)
    # confidence recomputed from raw antecedent frequencies
    freq = {
        r["pk"]: r["c"]
        for r in load(spark, SF, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .distinct()
        .groupBy("pk")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    for r in rules:
        assert (
            r["confidence_ppm"]
            == (1_000_000 * r["support"]) // freq[r["antecedent"]]
        )


def test_basket_cap_drops_oversized_basket(spark):
    """A basket above _MAX_BASKET must contribute NO pairs (the
    heavy-tail guard), while normal baskets still count."""
    rows = [("big", i) for i in range(_MAX_BASKET + 1)]
    rows += [("a", 1), ("a", 2), ("b", 1), ("b", 2)]
    items = spark.createDataFrame(rows, "ok string, pk int")
    kept = (
        items.groupBy("ok")
        .agg(F.count("*").alias("bsz"))
        .filter(F.col("bsz") <= _MAX_BASKET)
        .select("ok")
    )
    out = frequent_pairs(items.join(kept, "ok"), min_support=2).collect()
    assert [(r["part_x"], r["part_y"], r["support"]) for r in out] == [
        (1, 2, 2)
    ]


def test_basket_parity_on_dirty_fixture(spark, tmp_path):
    """The clean fixture's baskets are ≤ 7 items, so the _MAX_BASKET
    cap and the duplicate-line dedup are barely exercised. Perturb
    lineitem with (a) one 70-item mega-basket that BOTH engines must
    drop before pair generation and (b) two orders that repeat the
    same part on multiple lines — a basket is a set, so the repeats
    must collapse to one item each — then re-run the oracle compare."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    from check_oracles import run_sweep

    from event_streamer_spark.operators.basket import _MAX_BASKET
    from event_streamer_spark.tables import TABLES

    dirty = tmp_path / "dirty_sf"
    dirty.mkdir()
    for t in TABLES:
        shutil.copy(f"{SF}/{t}.parquet", dirty / f"{t}.parquet")

    li = pq.read_table(dirty / "lineitem.parquet")
    n_mega = _MAX_BASKET + 6
    # mega-basket: 70 distinct parts in one order → C(70,2) pairs IF the
    # cap fails to fire on either engine → oracle hash mismatch
    ok = [10**9] * n_mega
    pk = [3000 + i for i in range(n_mega)]
    # duplicate-line orders: part 3000/3001 twice each in two orders —
    # collapses to ONE basket item per order, so (3000, 3001) lands at
    # support exactly 2 (the threshold) only if dedup runs on both sides
    for o in (10**9 + 1, 10**9 + 2):
        ok += [o] * 4
        pk += [3000, 3000, 3001, 3001]
    # cap-boundary basket: EXACTLY _MAX_BASKET real items (sharing the
    # planted pair so its support is observable) plus one NULL line —
    # without the explicit NULL filter, DuckDB's DISTINCT counts 65
    # items (basket dropped, support stays 2) while collect_set counts
    # 64 (kept, support 3): the exact cap-shift divergence the module
    # ledger warns about, now with regression teeth
    boundary_ok = 10**9 + 4
    ok += [boundary_ok] * _MAX_BASKET
    pk += [3000, 3001] + [3100 + i for i in range(_MAX_BASKET - 2)]
    n = len(ok)
    # NULL part lines: one on the cap-boundary basket (the divergence
    # above), one forming an all-NULL basket (shifts n_baskets in
    # d19_assoc_rules if either engine kept it)
    null_pk_orders = [boundary_ok, 10**9 + 3]
    extra = pa.table(
        {
            "l_orderkey": ok + null_pk_orders,
            "l_partkey": pk + [None] * len(null_pk_orders),
            "l_suppkey": [1] * (n + 2),
            "l_linenumber": list(range(1, n + 3)),
            "l_quantity": pa.array([1.0] * (n + 2), type=pa.float64()),
            "l_extendedprice": pa.array(
                [10.0] * (n + 2), type=pa.float64()
            ),
            "l_discount": pa.array([0.0] * (n + 2), type=pa.float64()),
            "l_tax": pa.array([0.0] * (n + 2), type=pa.float64()),
            "l_returnflag": ["N"] * (n + 2),
            "l_linestatus": ["O"] * (n + 2),
            "l_shipdate": pa.array(
                [None] * (n + 2), type=li.schema.field("l_shipdate").type
            ),
        },
        schema=li.schema,
    )
    pq.write_table(pa.concat_tables([li, extra]), dirty / "lineitem.parquet")

    # next_order NULL-date leg: two customers each place four orders,
    # one with a NULL o_orderdate and a cap-boundary (_MAX_BASKET-item)
    # basket. Spark's ASC window default is NULLS FIRST, DuckDB's is
    # NULLS LAST — unless the query pins placement, the NULL-dated
    # order takes sequence slot 1 on one engine and slot 4 on the
    # other, flipping which directed pairs exist (support 2 ≥ the
    # threshold, so the flip is hash-visible)
    od = pq.read_table(dirty / "orders.parquet")
    import datetime as _dt

    def _ts(d):
        return _dt.datetime(1995, d, 1)

    null_basket = [7001] + [7100 + i for i in range(_MAX_BASKET - 1)]
    seq_ok, seq_pk, o_ok, o_ck, o_dt = [], [], [], [], []
    for cust in (2 * 10**9, 2 * 10**9 + 1):
        base = cust * 10
        for i, (date, basket) in enumerate(
            [
                (_ts(1), [7000]),
                (None, null_basket),
                (_ts(2), [7002]),
                (_ts(3), [7000]),
            ]
        ):
            o_ok.append(base + i)
            o_ck.append(cust)
            o_dt.append(date)
            seq_ok += [base + i] * len(basket)
            seq_pk += basket
    extra_orders = pa.table(
        {
            "o_orderkey": o_ok,
            "o_custkey": o_ck,
            "o_orderstatus": ["F"] * len(o_ok),
            "o_totalprice": pa.array([1.0] * len(o_ok), type=pa.float64()),
            "o_orderdate": pa.array(
                o_dt, type=od.schema.field("o_orderdate").type
            ),
            "o_orderpriority": ["1-URGENT"] * len(o_ok),
        },
        schema=od.schema,
    )
    pq.write_table(
        pa.concat_tables([od, extra_orders]), dirty / "orders.parquet"
    )
    m = len(seq_ok)
    extra_li = pa.table(
        {
            "l_orderkey": seq_ok,
            "l_partkey": seq_pk,
            "l_suppkey": [1] * m,
            "l_linenumber": list(range(1, m + 1)),
            "l_quantity": pa.array([1.0] * m, type=pa.float64()),
            "l_extendedprice": pa.array([10.0] * m, type=pa.float64()),
            "l_discount": pa.array([0.0] * m, type=pa.float64()),
            "l_tax": pa.array([0.0] * m, type=pa.float64()),
            "l_returnflag": ["N"] * m,
            "l_linestatus": ["O"] * m,
            "l_shipdate": pa.array(
                [None] * m, type=li.schema.field("l_shipdate").type
            ),
        },
        schema=li.schema,
    )
    pq.write_table(
        pa.concat_tables(
            [pq.read_table(dirty / "lineitem.parquet"), extra_li]
        ),
        dirty / "lineitem.parquet",
    )

    total, failures = run_sweep(spark, str(dirty), ["d19_"], quiet=True)
    # frequent_pairs + assoc_rules + next_order (the original planted
    # lineitem orders have no orders-table row; the NULL-date orders
    # above are the next_order leg)
    assert total == 3 and failures == [], failures

    # NULLS-LAST pin observable in the output: the NULL-dated order is
    # the customer's LAST order, so 7000 → null-basket pairs exist and
    # null-basket → 7000 pairs do not
    next_rows = {
        (r["part_first"], r["part_next"]): r["support"]
        for r in REGISTRY["d19_next_order"].fn(spark, str(dirty)).collect()
    }
    assert next_rows[(7000, 7001)] == 2
    assert (7001, 7000) not in next_rows

    # and the planted pair is present at threshold support while the
    # mega-basket contributes nothing
    rows = REGISTRY["d19_frequent_pairs"].fn(spark, str(dirty)).collect()
    got = {(r["part_x"], r["part_y"]): r["support"] for r in rows}
    # 2 duplicate-line orders + the kept cap-boundary basket: if the
    # NULL line wrongly counted toward the cap this reads 2, not 3
    assert got[(3000, 3001)] == 3
    # every other planted 3xxx pair has support 1 (mega-basket dropped,
    # boundary-basket pairs unique), so none may reach the output (the
    # 7xxx parts belong to the next_order leg and repeat across two
    # customers by design)
    assert not any(
        3002 <= x < 7000 or 3002 <= y < 7000 for (x, y) in got
    ), sorted(
        k for k in got if 3002 <= k[0] < 7000 or 3002 <= k[1] < 7000
    )


def test_rfm_invariants(spark):
    """B72 (lives here with the other round-8 session-4 additions):
    NTILE's balanced-bucket rule must hold for each score's marginal
    distribution, the segment cube must partition the ordering
    customers exactly, and monetary mass must be conserved."""
    rows = REGISTRY["b72_rfm_segments"].fn(spark, SF).collect()
    orders = load(spark, SF, "orders")
    n_cust = orders.select("o_custkey").distinct().count()
    total_c = orders.select(
        F.sum(F.expr("CAST(ROUND(o_totalprice*100) AS BIGINT)")).alias("t")
    ).collect()[0]["t"]
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert sum(r["monetary_c_total"] for r in rows) == total_c
    for axis in ("r_score", "f_score", "m_score"):
        marginal: dict[int, int] = {}
        for r in rows:
            marginal[r[axis]] = marginal.get(r[axis], 0) + r["n_customers"]
        assert set(marginal) == {1, 2, 3, 4, 5}
        # balanced buckets: sizes differ by at most 1, larger ones first
        sizes = [marginal[k] for k in sorted(marginal)]
        assert max(sizes) - min(sizes) <= 1
        assert sizes == sorted(sizes, reverse=True)


def test_funnel_latency_first_principles(spark):
    """B74 (session-4 additions file): latencies and all four exact
    rank percentiles recomputed driver-side; percentile values must be
    actual observed latencies in nondecreasing order."""
    rows = REGISTRY["b74_funnel_latency"].fn(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    per_user: dict[int, list] = {}
    from event_streamer_spark.tables import load as _load

    for e in _load(spark, SF, "events").collect():
        if e["user_id"] is None or e["ts"] is None:
            continue
        u = per_user.setdefault(e["user_id"], [None, None])
        us = int(e["ts"].timestamp() * 1_000_000)
        if e["event_type"] == "signup" and (u[0] is None or us < u[0]):
            u[0] = us
        if e["event_type"] == "purchase" and (u[1] is None or us < u[1]):
            u[1] = us
    lat = sorted(
        ((p - s) // 1_000_000, uid)
        for uid, (s, p) in per_user.items()
        if s is not None and p is not None and p > s
    )
    n = len(lat)
    assert r["n_converted"] == n and n > 0
    vals = [v for v, _ in lat]
    for p in (25, 50, 75, 90):
        exp = vals[max(1, (p * n + 99) // 100) - 1]
        assert r[f"p{p}_s"] == exp
    assert r["p25_s"] <= r["p50_s"] <= r["p75_s"] <= r["p90_s"]


def test_next_order_first_principles(spark):
    """Directed next-order pairs recounted driver-side from the raw
    tables: order sequence per customer by (date, orderkey), capped
    deduped baskets, full cross of consecutive baskets (repurchase
    x == y included)."""
    from collections import defaultdict

    rows = REGISTRY["d19_next_order"].fn(spark, SF).collect()
    baskets: dict[int, set[int]] = defaultdict(set)
    for r in load(spark, SF, "lineitem").collect():
        if r["l_orderkey"] is not None and r["l_partkey"] is not None:
            baskets[r["l_orderkey"]].add(r["l_partkey"])
    baskets = {k: v for k, v in baskets.items() if len(v) <= _MAX_BASKET}
    by_cust: dict[int, list] = defaultdict(list)
    for o in load(spark, SF, "orders").collect():
        if o["o_orderkey"] in baskets:
            by_cust[o["o_custkey"]].append(
                (o["o_orderdate"], o["o_orderkey"])
            )
    expected: dict[tuple[int, int], int] = defaultdict(int)
    for seq in by_cust.values():
        seq.sort()
        for (_, a), (_, b) in zip(seq, seq[1:]):
            for x in baskets[a]:
                for y in baskets[b]:
                    expected[(x, y)] += 1
    expected = {
        k: v for k, v in expected.items() if v >= _MIN_SUPPORT
    }
    got = {
        (r["part_first"], r["part_next"]): r["support"] for r in rows
    }
    assert got == expected and got
    # directionality: the relation is genuinely asymmetric somewhere
    assert any(
        (y, x) not in got or got[(y, x)] != c
        for (x, y), c in got.items()
    )


def test_pairs_from_arrays_property(spark):
    """Property: for ANY multiset of baskets, the generator-side
    expansion equals itertools.combinations over the deduped sorted
    items (min_support=1 so nothing hides below the threshold) —
    the hypothesis harness that caught the GIF width bug, aimed at
    the posexplode + suffix-slice arithmetic."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.lists(st.integers(0, 12), min_size=0, max_size=6),
            min_size=1,
            max_size=6,
        )
    )
    def check(baskets):
        rows = [
            (ok, pk) for ok, items in enumerate(baskets) for pk in items
        ]
        if not rows:
            return
        items = spark.createDataFrame(rows, "ok int, pk int")
        got = {
            (r["part_x"], r["part_y"]): r["support"]
            for r in frequent_pairs(items, min_support=1).collect()
        }
        expected: dict[tuple[int, int], int] = {}
        for basket in baskets:
            for x, y in combinations(sorted(set(basket)), 2):
                expected[(x, y)] = expected.get((x, y), 0) + 1
        assert got == expected

    check()


def test_assoc_rules_split_equals_combo(spark):
    """The size-adaptive aggregate shapes (round 11: fused NULL-marker
    combo below the splitMinBytes crossover, two-shuffle split above —
    the sf10 A/B's −42% cold win) must be value-identical: same rule
    set, same exact-ppm arithmetic, at a SF where both run in
    seconds."""
    from event_streamer_spark.operators.basket import (
        assoc_rules_from_arrays,
        basket_arrays,
    )

    arrs = basket_arrays(spark, "/root/testdata/sf0.001")
    combo = {
        (r["antecedent"], r["consequent"]): (
            r["support"], r["confidence_ppm"], r["lift_ppm"]
        )
        for r in assoc_rules_from_arrays(arrs, mode="combo").collect()
    }
    split = {
        (r["antecedent"], r["consequent"]): (
            r["support"], r["confidence_ppm"], r["lift_ppm"]
        )
        for r in assoc_rules_from_arrays(arrs, mode="split").collect()
    }
    assert combo == split and len(combo) > 100
