"""D17 graph analytics: PageRank fixed-point invariants."""

from pyspark.sql import functions as F

from event_streamer_spark.operators import REGISTRY
from event_streamer_spark.operators.graph import _PR_SCALE
from event_streamer_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_pagerank_mass_and_shape(spark):
    rows = REGISTRY["d17_pagerank"].fn(spark, SF).collect()
    # node set: every customer and supplier that appears in a trade pair
    pairs = (
        load(spark, SF, "orders")
        .join(
            load(spark, SF, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    n_cust = pairs.select("o_custkey").distinct().count()
    n_supp = pairs.select("l_suppkey").distinct().count()
    assert len(rows) == n_cust + n_supp
    assert all(r["pr_scaled"] > 0 for r in rows)
    assert all(r["degree"] >= 1 for r in rows)
    # rank mass is conserved up to integer-floor leakage: each of the
    # three iterations floors one division per node plus the two /100
    # terms, so the total stays within a few N units of the scale
    total = sum(r["pr_scaled"] for r in rows)
    assert 0.95 * _PR_SCALE <= total <= _PR_SCALE
    # undirected bipartite graph: the two sides carry equal edge mass,
    # so each side's total degree matches the pair count
    n_pairs = pairs.count()
    assert (
        sum(r["degree"] for r in rows if r["node"].startswith("c:"))
        == n_pairs
    )
    assert (
        sum(r["degree"] for r in rows if r["node"].startswith("s:"))
        == n_pairs
    )


def test_pagerank_favors_connected_suppliers(spark):
    """With ~10 suppliers serving ~150 customers, supplier ranks must
    dominate: every supplier outranks every customer, and the
    top-degree supplier holds the top rank."""
    rows = REGISTRY["d17_pagerank"].fn(spark, SF).collect()
    supp = [r for r in rows if r["node"].startswith("s:")]
    cust = [r for r in rows if r["node"].startswith("c:")]
    assert min(r["pr_scaled"] for r in supp) > max(
        r["pr_scaled"] for r in cust
    )
    top_by_pr = max(supp, key=lambda r: r["pr_scaled"])
    top_by_deg = max(supp, key=lambda r: r["degree"])
    assert top_by_pr["degree"] == top_by_deg["degree"]


def test_common_neighbors_shape(spark):
    rows = REGISTRY["d17_common_neighbors"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["supp_a"] < r["supp_b"]
        assert r["shared_customers"] >= 1
        assert 0.0 < r["jaccard"] <= 1.0


def test_pagerank_iterations_read_cached_graph(spark):
    """Plan pin for the scan budget: every iteration must read the
    persisted edge list and degree table, not re-derive the fact join
    (review r8: 88 parquet scans → cached; round 9 persists degrees
    instead of the node×count crossJoin and shares the pairs slot)."""
    from event_streamer_spark.caching import clear_slot

    for slot in ("graph.pairs", "graph.pr_edges", "graph.pr_deg"):
        clear_slot(slot)
    df = REGISTRY["d17_pagerank"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # 3 iterations x (edges + nodes-from-deg) + final projection read
    # the caches; the derived node table costs 2 cached deg scans per
    # reference, so the floor is higher than the old 6
    assert plan.count("InMemoryTableScan") >= 6, plan
    for slot in ("graph.pairs", "graph.pr_edges", "graph.pr_deg"):
        clear_slot(slot)


def test_triangles_match_naive_enumeration(spark):
    """The degree-oriented forward algorithm must count EXACTLY the
    triangles the naive a<b<c triple self-join finds — orientation is
    a plan optimization, never a semantics change. Also pins that
    every triangle contributes once to each of its three corners
    (sum of per-node counts = 3 x triangle count)."""
    from event_streamer_spark.tables import register_views

    rows = REGISTRY["d17_triangles"].fn(spark, SF).collect()
    per_node = {r["suppkey"]: r["n_triangles"] for r in rows}
    register_views(spark, SF)
    naive = spark.sql(
        """
        WITH pairs AS (
          SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
          FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        cust_deg AS (
          SELECT ck FROM pairs GROUP BY ck HAVING COUNT(*) <= 32),
        e AS (SELECT p.ck, p.sk FROM pairs p JOIN cust_deg d ON p.ck = d.ck),
        weighted AS (
          SELECT a.sk AS s_lo, b.sk AS s_hi, COUNT(*) AS c
          FROM e a JOIN e b ON a.ck = b.ck AND a.sk < b.sk
          GROUP BY a.sk, b.sk HAVING COUNT(*) >= 2),
        directed AS (
          SELECT s_lo AS node, s_hi AS nbr, c FROM weighted
          UNION ALL SELECT s_hi, s_lo, c FROM weighted),
        ranked AS (
          SELECT node, nbr, ROW_NUMBER() OVER (PARTITION BY node
                 ORDER BY c DESC, nbr) AS rk
          FROM directed),
        kept AS (SELECT node, nbr FROM ranked WHERE rk <= 8),
        shared AS (
          SELECT k1.node AS s_lo, k1.nbr AS s_hi
          FROM kept k1 JOIN kept k2
            ON k2.node = k1.nbr AND k2.nbr = k1.node
          WHERE k1.node < k1.nbr)
        SELECT e1.s_lo AS a, e1.s_hi AS b, e2.s_hi AS c
        FROM shared e1
        JOIN shared e2 ON e2.s_lo = e1.s_hi
        JOIN shared e3 ON e3.s_lo = e1.s_lo AND e3.s_hi = e2.s_hi
        """
    ).collect()
    assert sum(per_node.values()) == 3 * len(naive)
    from collections import Counter

    naive_per_node = Counter()
    for t in naive:
        naive_per_node[t["a"]] += 1
        naive_per_node[t["b"]] += 1
        naive_per_node[t["c"]] += 1
    assert per_node == dict(naive_per_node)


def test_hits_invariants(spark):
    """HITS fixed-point invariants: both sides L1-normalize to the
    scale (up to per-node floor leakage), every score is positive,
    hub/authority sides partition the node set exactly as the degree
    tables do, and the top authority must be a supplier with
    above-median in-degree (mutual reinforcement concentrates mass on
    high-degree authorities in a near-regular bipartite graph)."""
    from event_streamer_spark.operators.graph import _HITS_SCALE

    rows = REGISTRY["d17_hits"].fn(spark, SF).collect()
    hubs = [r for r in rows if r["side"] == "hub"]
    auths = [r for r in rows if r["side"] == "authority"]
    assert hubs and auths
    assert all(r["node"].startswith("c:") for r in hubs)
    assert all(r["node"].startswith("s:") for r in auths)
    for side in (hubs, auths):
        total = sum(r["score_scaled"] for r in side)
        # each node's normalization floors once: leak < |side| units
        assert _HITS_SCALE - len(side) <= total <= _HITS_SCALE
        assert all(r["score_scaled"] > 0 for r in side)
    # degree mass: both sides see every distinct trade pair once
    assert sum(r["degree"] for r in hubs) == sum(
        r["degree"] for r in auths
    )
    top_auth = max(auths, key=lambda r: r["score_scaled"])
    med = sorted(r["degree"] for r in auths)[len(auths) // 2]
    assert top_auth["degree"] >= med


def test_label_prop_first_principles(spark):
    """Two synchronous LPA rounds recomputed driver-side from the raw
    edge list (modal neighbor label, lexicographic-min tie-break) must
    match node-for-node, and labels must be genuine node ids."""
    from collections import Counter, defaultdict

    rows = REGISTRY["d17_label_prop"].fn(spark, SF).collect()
    pairs = (
        load(spark, SF, "orders")
        .join(
            load(spark, SF, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select("o_custkey", "l_suppkey")
        .distinct()
        .collect()
    )
    nbrs = defaultdict(set)
    for r in pairs:
        c, s = f"c:{r['o_custkey']}", f"s:{r['l_suppkey']}"
        nbrs[c].add(s)
        nbrs[s].add(c)
    lab = {v: v for v in nbrs}
    for _ in range(2):
        new = {}
        for v, ns in nbrs.items():
            counts = Counter(lab[u] for u in ns)
            mc = max(counts.values())
            new[v] = min(l for l, c in counts.items() if c == mc)
        lab = new
    got = {r["node"]: r["label"] for r in rows}
    assert got == lab
    assert set(got.values()) <= set(nbrs)


def test_wedge_counts_equal_self_join_and_use_generators(spark):
    """r13 pin: the wedge machinery expands pairs from the capped
    sorted arrays with JVM generators — on a constructed frame its
    counts must equal the self-join spelling it replaced (including
    the hub cap: the degree-33 customer contributes nothing), and the
    executed plan must open wedges via Generate nodes, not a join."""
    from event_streamer_spark.caching import clear_slot
    from event_streamer_spark.operators.graph import (
        _CN_MAX_DEGREE,
        _wedge_counts,
    )

    # customers 1..3 normal; customer 99 is a hub one over the cap
    rows = [(1, s) for s in (10, 20, 30)] + [(2, s) for s in (10, 20)]
    rows += [(3, 10)] + [(99, s) for s in range(_CN_MAX_DEGREE + 1)]
    pairs = spark.createDataFrame(rows, "ck long, sk long")
    arrs = (
        pairs.groupBy("ck")
        .agg(F.sort_array(F.collect_set("sk")).alias("arr"))
        .filter(F.size("arr") <= _CN_MAX_DEGREE)
        .select("arr")
    )
    got = {
        (r["s_lo"], r["s_hi"]): r["c"] for r in _wedge_counts(arrs).collect()
    }
    capped = pairs.filter(F.col("ck") != 99)
    a, b = capped.alias("a"), capped.alias("b")
    want = {
        (r["s_lo"], r["s_hi"]): r["c"]
        for r in a.join(
            b,
            (F.col("a.ck") == F.col("b.ck")) & (F.col("a.sk") < F.col("b.sk")),
        )
        .groupBy(F.col("a.sk").alias("s_lo"), F.col("b.sk").alias("s_hi"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert got == want == {(10, 20): 2, (10, 30): 1, (20, 30): 1}
    plan = (
        _wedge_counts(arrs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Generate" in plan, plan
    assert "Join" not in plan, plan
    clear_slot()
