"""Graph / link analysis (D17): PageRank over the trade graph.

Centrality over the customer↔supplier graph induced by orders: which
suppliers sit at the heart of the network, which customers spread
their business widest. The graph is built relationally (one distinct
pair projection off the fact join), and PageRank runs a FIXED number
of power iterations in EXACT fixed-point integer arithmetic — every
division is an integer `DIV`/`//` (truncating; all values positive, so
truncation == floor on both engines, probed), which makes the result
bit-reproducible and therefore a full hash oracle, unlike float
PageRank whose partial-sum order perturbs low bits.

Scale posture: per-node state only (the rank vector is N rows, never
corpus-sized), each iteration is one edges⨝ranks shuffle join on the
source key plus a map-combinable SUM by destination, and iteration
count is a constant — the same bounded-rounds contract as the
connected-components operator (``clustering.py``). The damping base
needs the node count: a 1-row aggregate broadcast into the plan, no
driver-side collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load

# Fixed-point scale, damping = 85/100, and the unrolled iteration count.
_PR_SCALE = 1_000_000_000_000
_PR_ITERS = 3


def _pagerank_oracle() -> str:
    ctes = [
        """
    pairs AS (
      SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_custkey IS NOT NULL AND l.l_suppkey IS NOT NULL),
    e AS (
      SELECT 'c:' || CAST(ck AS VARCHAR) AS src,
             's:' || CAST(sk AS VARCHAR) AS dst FROM pairs
      UNION ALL
      SELECT 's:' || CAST(sk AS VARCHAR) AS src,
             'c:' || CAST(ck AS VARCHAR) AS dst FROM pairs),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    pr0 AS (
      SELECT node, deg, {S} // (SELECT n FROM nn) AS pr FROM deg)
        """.format(S=_PR_SCALE)
    ]
    for i in range(1, _PR_ITERS + 1):
        ctes.append(
            """
    s{i} AS (
      SELECT e.dst AS node, SUM(p.pr // p.deg) AS s
      FROM e JOIN pr{prev} p ON e.src = p.node GROUP BY e.dst),
    pr{i} AS (
      SELECT d.node, d.deg,
             (15 * ({S} // (SELECT n FROM nn))) // 100
               + (85 * COALESCE(s{i}.s, 0)) // 100 AS pr
      FROM deg d LEFT JOIN s{i} ON s{i}.node = d.node)
            """.format(i=i, prev=i - 1, S=_PR_SCALE)
        )
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
    SELECT node, CAST(deg AS BIGINT) AS degree,
           CAST(pr AS BIGINT) AS pr_scaled
    FROM pr{_PR_ITERS}
    """
    )


def _copurchase_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """The distinct (customer, supplier) co-purchase projection — the
    base graph every operator in this module walks. ONE
    ``bounded_persist`` slot serves pagerank, triangles,
    common-neighbors, HITS, and label-propagation: a session running
    several graph queries (the bench does, back to back) materializes
    the fact join + distinct ONCE instead of once per query — measured
    round 9 at sf0.1, that fact join + distinct is 3.8 s of each
    query's cold pass, the single largest shared cold cost."""
    from event_streamer_spark.caching import bounded_persist

    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    # an edge needs two endpoints: NULL keys are excluded on both
    # engines (round-9 dirty corpus — a NULL customer key became a
    # phantom graph node on the Spark side of label propagation)
    return bounded_persist(
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(
            F.col("o_custkey").isNotNull() & F.col("l_suppkey").isNotNull()
        )
        .select(
            F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk")
        )
        .distinct(),
        "graph.pairs",
    )


def _mirrored_edges(spark: SparkSession, sf: str) -> DataFrame:
    """The undirected (src, dst) edge list — customers as ``2k``,
    suppliers as ``2k+1`` — shared by PageRank and label propagation.

    r13 (guide §2.1): ONE slot instead of the former per-query twins
    (``graph.pr_edges`` / ``graph.lpa_edges`` held byte-identical
    frames), and the frame is hash-partitioned on ``src`` BEFORE the
    persist: every iteration of both loops joins ``edges`` on ``src``,
    so the cached partitioning satisfies the join's distribution and
    only the node-sized rank/label vector shuffles per round — the
    edge table (the big side at scale) never re-exchanges."""
    from event_streamer_spark.caching import bounded_persist

    pairs = _copurchase_pairs(spark, sf)
    ck = (F.col("ck") * 2).alias
    sk = (F.col("sk") * 2 + 1).alias
    return bounded_persist(
        pairs.select(ck("src"), sk("dst"))
        .unionAll(pairs.select(sk("src"), ck("dst")))
        .repartition("src"),
        "graph.edges",
    )


def _capped_neighbor_arrays(spark: SparkSession, sf: str) -> DataFrame:
    """Each non-hub customer's distinct suppliers as ONE sorted-array
    row — the wedge source shared by common-neighbors and triangles.

    r13 (guide §2.1/§2.4, the basket.py lesson): the former
    ``_capped_edges`` kept (ck, sk) ROWS, which cost a degree-count
    aggregate plus a semi-join to apply the hub cap and then a full
    self-join on ``ck`` inside every consumer to open wedges. One
    map-side-partial ``collect_set`` shuffle replaces all of that: the
    cap is a free ``size(arr)`` filter on the built array (count of
    distinct (ck, sk) pairs ≡ set size), and wedge pairs expand with
    JVM-side generators — no self-join at all, with the quadratic burst
    still bounded at C(_CN_MAX_DEGREE, 2) per row. The persisted frame
    is also smaller: one row per kept customer, suppliers sorted so
    pair expansion emits each unordered pair exactly once in canonical
    lo < hi order (the same contract the a.sk < b.sk join enforced)."""
    from event_streamer_spark.caching import bounded_persist

    pairs = _copurchase_pairs(spark, sf)
    return bounded_persist(
        pairs.groupBy("ck")
        .agg(F.sort_array(F.collect_set("sk")).alias("arr"))
        .filter(F.size("arr") <= _CN_MAX_DEGREE)
        .select("arr"),
        "graph.capped_edges",
    )


def _wedge_counts(arrs: DataFrame) -> DataFrame:
    """(s_lo, s_hi, c): how many kept customers connect each supplier
    pair — generator-expanded from the capped neighbor arrays (strict
    suffix slice; ``slice`` is 1-based, so 0-based position ``i`` pairs
    with elements from 1-based ``i + 2``), then ONE map-side-combinable
    pair count. Replaces the wedge self-join both d17 consumers ran."""
    return (
        arrs.select(F.posexplode("arr").alias("i", "s_lo"), "arr")
        .select(
            "s_lo",
            F.explode(F.expr("slice(arr, i + 2, size(arr))")).alias("s_hi"),
        )
        .groupBy("s_lo", "s_hi")
        .agg(F.count(F.lit(1)).alias("c"))
    )


@query("d17_pagerank", oracle=_pagerank_oracle())
def d17_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """D17: fixed-iteration PageRank (damping 0.85) over the undirected
    customer↔supplier graph, in exact fixed-point integers.

    Graph: one distinct (custkey, suppkey) projection off the
    orders⨝lineitem fact join, mirrored into two directed edges so no
    node dangles. Rank updates follow
    ``pr' = (1−d)·S/N + d·Σ pr(u)/deg(u)`` with every division an
    integer ``DIV`` — floor-leaked mass costs ≤1 unit in 10¹² per
    term and buys bit-exact reproducibility across engines, partition
    counts, and aggregation orders. Each iteration: one shuffle join
    of the edge list against the N-row rank vector on src, one
    map-combinable SUM by dst, one left join back to the node table
    (nodes keep the damping base even if an iteration leaves them
    contribution-less). Iterations are a constant: the plan is a
    fixed-depth DAG, safe for Catalyst at any corpus size.

    The edge list and degree table are ``bounded_persist``-ed: every
    iteration references both, and without the cache Catalyst inlines
    the whole fact-join subtree at each reference (plan-audited: 88
    parquet scans for 3 iterations → 4 with the caches; at 100 TB
    that is the difference between one fact join and a dozen).

    Cold-path design (round 9, VERDICT r8 #2 — narrower persisted
    frames): node ids travel as LONGS (customer → 2k, supplier → 2k+1)
    and decode to the public ``c:``/``s:`` strings only in the final
    N-row projection — the persisted edge table is two long columns
    instead of two strings (measured at sf0.1: 7.6 s → 5.2 s first
    materialization, and every iteration join hashes longs, not
    strings). The base pairs frame comes from the module-shared
    ``graph.pairs`` slot, and the DEGREE table (node-sized) is what's
    persisted rather than the node×count crossJoin — the 1-row count
    broadcast is re-derived per reference from the cached degrees,
    which is two tiny cached scans instead of a third materialized
    frame.
    """
    from event_streamer_spark.caching import bounded_persist

    edges = _mirrored_edges(spark, sf)
    deg = bounded_persist(
        edges.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("deg")
        ),
        "graph.pr_deg",
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    # node table with the broadcast 1-row count: persisted, but built
    # FROM the cached degree table (a node-sized scan + a 1-row
    # broadcast), so its materialization is trivial — the round-8
    # version aggregated the edge cache twice here (deg inlined into
    # both the count and the crossJoin side)
    nodes = bounded_persist(
        deg.crossJoin(F.broadcast(nn)), "graph.pr_nodes"
    )
    pr = nodes.withColumn("pr", F.expr(f"{_PR_SCALE} DIV n"))
    for _ in range(_PR_ITERS):
        contrib = pr.select(
            F.col("node").alias("src"), F.expr("pr DIV deg").alias("c")
        )
        sums = (
            edges.join(contrib, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            nodes.join(sums, "node", "left")
            .withColumn(
                "pr",
                F.expr(
                    f"(15 * ({_PR_SCALE} DIV n)) DIV 100"
                    " + (85 * COALESCE(s, 0)) DIV 100"
                ),
            )
            .drop("s")
        )
    return pr.select(
        # decode the long node id back to the public string form
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("c:"), F.expr("node DIV 2").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("s:"), F.expr("(node - 1) DIV 2").cast("string"))
        )
        .alias("node"),
        F.col("deg").cast("long").alias("degree"),
        F.col("pr").cast("long").alias("pr_scaled"),
    )



# Degree cap for the common-neighbor self-join: a customer connected to
# more than this many suppliers is excluded from pair generation (the
# same hot-key treatment as the shingle DF cap in dedup.py) — at scale
# one promiscuous hub otherwise contributes O(degree²) pairs.
_CN_MAX_DEGREE = 32


@query(
    "d17_common_neighbors",
    oracle=f"""
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_custkey IS NOT NULL AND l.l_suppkey IS NOT NULL),
    cust_deg AS (
      SELECT ck FROM pairs GROUP BY ck
      HAVING COUNT(*) <= {_CN_MAX_DEGREE}),
    e AS MATERIALIZED (
      SELECT p.ck, p.sk FROM pairs p JOIN cust_deg d ON p.ck = d.ck),
    deg AS (SELECT sk, COUNT(*) AS deg FROM e GROUP BY sk),
    shared AS (
      SELECT a.sk AS supp_a, b.sk AS supp_b, COUNT(*) AS shared_customers
      FROM e a JOIN e b ON a.ck = b.ck AND a.sk < b.sk
      GROUP BY a.sk, b.sk)
    SELECT s.supp_a, s.supp_b,
           CAST(s.shared_customers AS BIGINT) AS shared_customers,
           ROUND(CAST(s.shared_customers AS DOUBLE)
                 / (da.deg + db.deg - s.shared_customers), 6) AS jaccard
    FROM shared s
    JOIN deg da ON da.sk = s.supp_a
    JOIN deg db ON db.sk = s.supp_b
    """,
)
def d17_common_neighbors(spark: SparkSession, sf: str) -> DataFrame:
    """D17: related-supplier discovery — supplier pairs ranked by
    shared customers, with neighbor-set Jaccard.

    The classic common-neighbor link prediction, shaped for scale the
    same way the shingle join is: customers above the degree cap are
    excluded BEFORE pair generation, so no hub customer can contribute
    a quadratic pair burst. r13: wedges come from the shared
    ``_capped_neighbor_arrays`` generator expansion instead of a
    self-join on customer (guide §2.4 — the degree-count + semi-join +
    both self-join exchanges collapse into the one collect_set
    shuffle); per-row emission stays bounded at C(_CN_MAX_DEGREE, 2).
    Degrees for the Jaccard denominator come from the SAME capped
    arrays (one explode + map-combinable count), keeping the metric
    internally consistent. The array frame is ``bounded_persist``-ed —
    without the cache each reference inlines the fact-join subtree
    (plan-audited: 32 parquet scans → 4). The slot is shared with
    d17_triangles (identical frame), so a session running both
    materializes it once.
    """
    arrs = _capped_neighbor_arrays(spark, sf)
    deg = (
        arrs.select(F.explode("arr").alias("sk"))
        .groupBy("sk")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    shared = _wedge_counts(arrs).select(
        F.col("s_lo").alias("supp_a"),
        F.col("s_hi").alias("supp_b"),
        F.col("c").alias("shared_customers"),
    )
    da = deg.select(F.col("sk").alias("supp_a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("sk").alias("supp_b"), F.col("deg").alias("deg_b"))
    return (
        shared.join(da, "supp_a")
        .join(db, "supp_b")
        .select(
            "supp_a",
            "supp_b",
            "shared_customers",
            F.round(
                F.col("shared_customers").cast("double")
                / (
                    F.col("deg_a")
                    + F.col("deg_b")
                    - F.col("shared_customers")
                ),
                6,
            ).alias("jaccard"),
        )
    )


# Co-purchase edge threshold for the triangle graph: supplier pairs
# sharing fewer customers than this are noise edges; the threshold
# sparsifies the graph BEFORE enumeration (both engines apply it
# identically, so it is a semantics knob, not an approximation).
_TRI_MIN_SHARED = 2

# Mutual k-NN sparsification: an edge survives only when EACH endpoint
# ranks the other among its K strongest neighbors (shared-customer
# count DESC, neighbor key ASC — a deterministic total order). This is
# the standard similarity-graph construction and the piece that makes
# triangle counting scale-meaningful here: the raw >= MIN_SHARED
# co-purchase graph DENSIFIES with sf (measured: 401k of 499k possible
# edges at sf0.1 — near-complete, with O(n^3)-ish triangle mass), while
# mutual k-NN bounds every degree by K, so edges <= K*N/2 and per-node
# triangles <= C(K,2) at ANY corpus size.
_TRI_KNN_K = 8

# One SQL text for the DuckDB oracle; the Spark leg builds the same
# algorithm as DataFrames (CTE references here would be inlined by
# Catalyst — see the query docstring). rnk packs (degree, suppkey)
# into one BIGINT so edge orientation and the wedge ordering are
# single integer comparisons; suppkey < 10^7 at any TPC-H sf this
# repo targets, so the packing is collision-free.
#
# AS MATERIALIZED (r13, VERDICT r12 #2): DuckDB 1.0 INLINES a CTE at
# every reference — the same plan-explosion gotcha the Spark leg pins
# with bounded_persist. ``e`` feeds both self-join sides, ``kept``
# both mutuality sides, ``shared`` three triangle legs, so the
# unhinted oracle re-ran the pair self-join ~6x and needed >75 GB of
# spill at the sf1-dirty grain (the one non-green r12 hostile row).
# Materializing the multi-referenced CTEs is plan-shape only — same
# 90 rows/hash at sf0.1, 16x faster there, and the sf1-dirty grain
# closes in ~5 s instead of exhausting the disk.
_TRIANGLES_SQL = f"""
    WITH pairs AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_custkey IS NOT NULL AND l.l_suppkey IS NOT NULL),
    cust_deg AS (
      SELECT ck FROM pairs GROUP BY ck
      HAVING COUNT(*) <= {_CN_MAX_DEGREE}),
    e AS MATERIALIZED (
      SELECT p.ck, p.sk FROM pairs p JOIN cust_deg d ON p.ck = d.ck),
    weighted AS MATERIALIZED (
      SELECT a.sk AS s_lo, b.sk AS s_hi, COUNT(*) AS c
      FROM e a JOIN e b ON a.ck = b.ck AND a.sk < b.sk
      GROUP BY a.sk, b.sk
      HAVING COUNT(*) >= {_TRI_MIN_SHARED}),
    directed AS (
      SELECT s_lo AS node, s_hi AS nbr, c FROM weighted
      UNION ALL
      SELECT s_hi AS node, s_lo AS nbr, c FROM weighted),
    ranked AS (
      SELECT node, nbr,
             ROW_NUMBER() OVER (PARTITION BY node
                                ORDER BY c DESC, nbr) AS rk
      FROM directed),
    kept AS MATERIALIZED (
      SELECT node, nbr FROM ranked WHERE rk <= {_TRI_KNN_K}),
    shared AS MATERIALIZED (
      SELECT k1.node AS s_lo, k1.nbr AS s_hi
      FROM kept k1 JOIN kept k2
        ON k2.node = k1.nbr AND k2.nbr = k1.node
      WHERE k1.node < k1.nbr),
    tri AS (
      SELECT w.a, w.b, w.c
      FROM (SELECT e1.s_lo AS a, e1.s_hi AS b, e2.s_hi AS c
            FROM shared e1 JOIN shared e2
              ON e1.s_lo = e2.s_lo AND e1.s_hi < e2.s_hi) w
      JOIN shared e3 ON e3.s_lo = w.b AND e3.s_hi = w.c),
    members AS (
      SELECT a AS suppkey FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
    SELECT suppkey, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM members GROUP BY suppkey
"""


@query("d17_triangles", oracle=_TRIANGLES_SQL)
def d17_triangles(spark: SparkSession, sf: str) -> DataFrame:
    """D17: per-node triangle counts on the mutual k-NN co-purchase
    similarity graph — suppliers keep edges only to their
    ``_TRI_KNN_K`` strongest neighbors (shared-customer weight), and
    an edge survives only when BOTH endpoints keep it. Mutual k-NN is
    what makes this scale-meaningful: the raw co-purchase graph
    densifies toward complete as the corpus grows (measured 80% dense
    at sf0.1), while the k-NN graph has degree <= K everywhere, so
    edge count is <= K*N/2 and per-node triangle mass <= C(K,2) at any
    corpus size.

    Forward enumeration over ID-oriented edges: every edge is kept in
    canonical (lo < hi) form, wedges open at their lowest-id vertex,
    and one closing-edge probe completes each triangle EXACTLY once —
    the standard forward algorithm. The textbook refinement orients by
    DEGREE rank to bound out-degree by O(sqrt(E)) on skewed graphs,
    but the mutual k-NN sparsification has ALREADY bounded every
    node's total degree by K (= ``_TRI_KNN_K``): id-orientation's
    worst-case wedge fan-out is the same C(K,2), so the degree-rank
    pass (a union-aggregate plus two joins and a third persisted
    frame, 2.9 s of the round-8 cold pass at sf0.1) bought nothing —
    removed in round 9. On an UNBOUNDED-degree graph the degree
    orientation is load-bearing; behind mutual k-NN it is not. Three
    shuffles beyond the array build: the wedge pair count on
    (s_lo, s_hi) (r13: generator-expanded from the capped arrays, no
    self-join — see ``_capped_neighbor_arrays``), the closing-edge
    hash join on (b, c), the member aggregate.

    The Spark leg is DataFrame-built rather than the oracle's SQL text
    because ``shared`` is referenced three times — Catalyst INLINES an
    unpersisted CTE subtree at every reference (the plan-explosion
    gotcha this repo pins with InMemoryTableScan tests), re-running
    the fact join ~9x; ``bounded_persist`` caps it at one
    materialization. The capped neighbor arrays come from the
    module-shared ``graph.capped_edges`` slot (same frame as
    d17_common_neighbors).
    """
    from event_streamer_spark.caching import bounded_persist

    # wedge weights from the persisted capped arrays (r13): generator
    # expansion + one pair count instead of the former self-join on ck
    # (see _capped_neighbor_arrays; the d17_common_neighbors
    # 32→4-scan lesson still applies — the array frame is the cache)
    weighted = _wedge_counts(_capped_neighbor_arrays(spark, sf)).filter(
        F.col("c") >= _TRI_MIN_SHARED
    )
    # ONE reference to the expensive weighted subtree (explode, not a
    # two-branch union — Catalyst would inline the subtree per branch)
    directed = weighted.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("s_lo").alias("node"),
                    F.col("s_hi").alias("nbr"),
                    F.col("c"),
                ),
                F.struct(
                    F.col("s_hi").alias("node"),
                    F.col("s_lo").alias("nbr"),
                    F.col("c"),
                ),
            )
        ).alias("d")
    ).select("d.node", "d.nbr", "d.c")
    from pyspark.sql import Window

    wk = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("nbr").asc()
    )
    # kept feeds BOTH sides of the mutuality self-join: persist, or the
    # wedge-weight window and fact join run twice
    kept = bounded_persist(
        directed.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= _TRI_KNN_K)
        .select("node", "nbr"),
        "graph.tri_kept",
    )
    k1, k2 = kept.alias("k1"), kept.alias("k2")
    shared = bounded_persist(
        k1.join(
            k2,
            (F.col("k2.node") == F.col("k1.nbr"))
            & (F.col("k2.nbr") == F.col("k1.node")),
        )
        .filter(F.col("k1.node") < F.col("k1.nbr"))
        .select(
            F.col("k1.node").alias("s_lo"), F.col("k1.nbr").alias("s_hi")
        ),
        "graph.tri_shared",
    )
    e1, e2, e3 = shared.alias("e1"), shared.alias("e2"), shared.alias("e3")
    wedges = e1.join(
        e2,
        (F.col("e1.s_lo") == F.col("e2.s_lo"))
        & (F.col("e1.s_hi") < F.col("e2.s_hi")),
    ).select(
        F.col("e1.s_lo").alias("a"),
        F.col("e1.s_hi").alias("b"),
        F.col("e2.s_hi").alias("c"),
    )
    tri = wedges.join(
        e3,
        (F.col("b") == F.col("e3.s_lo")) & (F.col("c") == F.col("e3.s_hi")),
    ).select("a", "b", "c")
    # ONE reference to tri (explode, not a 3-way union) — a third
    # triple-reference inline of the wedge join would cost more than
    # the two persisted frames just saved
    members = tri.select(
        F.explode(F.array("a", "b", "c")).alias("suppkey")
    )
    return members.groupBy("suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


# HITS fixed-point scale (1e9: leaves headroom for the DECIMAL/HUGEINT
# normalization multiply raw·SCALE ≤ ~1e21) and unrolled rounds.
_HITS_SCALE = 1_000_000_000
_HITS_ITERS = 2


def _hits_oracle() -> str:
    S = _HITS_SCALE
    ctes = [
        f"""
    pairs AS (
      SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_custkey IS NOT NULL AND l.l_suppkey IS NOT NULL),
    hubs AS (SELECT ck, COUNT(*) AS odeg FROM pairs GROUP BY ck),
    auths AS (SELECT sk, COUNT(*) AS ideg FROM pairs GROUP BY sk),
    nh AS (SELECT COUNT(*) AS n FROM hubs),
    h0 AS (SELECT ck, odeg, {S} // (SELECT n FROM nh) AS h FROM hubs)
        """
    ]
    for i in range(1, _HITS_ITERS + 1):
        ctes.append(
            f"""
    ar{i} AS (
      SELECT p.sk, SUM(h.h) AS raw
      FROM pairs p JOIN h{i - 1} h ON h.ck = p.ck GROUP BY p.sk),
    at{i} AS (SELECT SUM(raw) AS t FROM ar{i}),
    a{i} AS (
      SELECT a.sk, aa.ideg,
             CAST((CAST(raw AS HUGEINT) * {S})
                  // (SELECT t FROM at{i}) AS BIGINT) AS a
      FROM ar{i} a JOIN auths aa ON aa.sk = a.sk),
    hr{i} AS (
      SELECT p.ck, SUM(a.a) AS raw
      FROM pairs p JOIN a{i} a ON a.sk = p.sk GROUP BY p.ck),
    ht{i} AS (SELECT SUM(raw) AS t FROM hr{i}),
    h{i} AS (
      SELECT h.ck, hh.odeg,
             CAST((CAST(raw AS HUGEINT) * {S})
                  // (SELECT t FROM ht{i}) AS BIGINT) AS h
      FROM hr{i} h JOIN hubs hh ON hh.ck = h.ck)
            """
        )
    n = _HITS_ITERS
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
    SELECT 'c:' || CAST(ck AS VARCHAR) AS node,
           CAST(odeg AS BIGINT) AS degree,
           CAST(h AS BIGINT) AS score_scaled,
           'hub' AS side
    FROM h{n}
    UNION ALL
    SELECT 's:' || CAST(sk AS VARCHAR), CAST(ideg AS BIGINT),
           CAST(a AS BIGINT), 'authority'
    FROM a{n}
    """
    )


@query("d17_hits", oracle=_hits_oracle())
def d17_hits(spark: SparkSession, sf: str) -> DataFrame:
    """D17: HITS hubs & authorities (Kleinberg, 1999) over the DIRECTED
    customer→supplier purchase graph — hub customers spread business
    across central suppliers; authority suppliers attract central
    customers. Mutual-reinforcement updates ``auth(s) = Σ hub(c)``,
    ``hub(c) = Σ auth(s)`` with L1 re-normalization to ``_HITS_SCALE``
    each half-step, all in exact fixed-point integers: the
    normalization multiply raw·SCALE widens through DECIMAL(38,0)
    (Spark) / HUGEINT (DuckDB) — the same split ``d15_seasonal_dow``
    pinned, since DuckDB's DECIMAL ``//`` routes through DOUBLE — so
    the score vectors hash bit-identically, unlike float HITS whose
    L2 norm is both sqrt-valued and merge-order-sensitive.

    Scale: per-node state only; each half-step is one edges⨝scores
    shuffle join + a map-combinable SUM + a 1-row L1 total broadcast
    back into the normalization (no collect). Iterations are the
    bounded-rounds constant; edges and the two degree tables are
    ``bounded_persist``-ed (every round references them — the
    PageRank 88-scan lesson).
    """
    from event_streamer_spark.caching import bounded_persist

    S = _HITS_SCALE
    pairs = _copurchase_pairs(spark, sf)
    hubs = bounded_persist(
        pairs.groupBy("ck").agg(F.count(F.lit(1)).alias("odeg")),
        "graph.hits_hubs",
    )
    auths = bounded_persist(
        pairs.groupBy("sk").agg(F.count(F.lit(1)).alias("ideg")),
        "graph.hits_auths",
    )
    nh = hubs.agg(F.count(F.lit(1)).alias("n"))
    h = hubs.crossJoin(F.broadcast(nh)).select(
        "ck", "odeg", F.expr(f"{S} DIV n").alias("h")
    )
    norm = (
        f"CAST((CAST(raw AS DECIMAL(38,0)) * {S}) DIV t AS BIGINT)"
    )
    # L1 totals via an unpartitioned window, NOT a crossJoin against a
    # separate aggregate of the same frame: the aggregate spelling
    # references each round's un-truncated lineage TWICE, and with two
    # doublings per round Catalyst's logical tree grows 4× per
    # iteration (measured: 18 s of pure planning at sf0.001). The
    # window keeps every round single-reference → linear plan depth.
    # The window's single task holds the NODE-sized score vector (the
    # same per-node-state bound as the rank vector itself), not corpus
    # data; billion-node graphs would swap in a two-pass broadcast
    # total over a checkpointed round boundary.
    from pyspark.sql import Window

    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    a = None
    for it in range(_HITS_ITERS):
        araw = (
            pairs.join(h.select("ck", "h"), "ck")
            .groupBy("sk")
            .agg(F.sum("h").alias("raw"))
            .withColumn("t", F.sum("raw").over(wall))
        )
        a = araw.join(auths, "sk").select(
            "sk", "ideg", F.expr(norm).alias("a")
        )
        if it == _HITS_ITERS - 1:
            # r13: the FINAL auth vector is the one double-referenced
            # frame (the last hub half-step consumes it AND it is the
            # authority output leg) — unpersisted, Catalyst re-ran the
            # entire unrolled iteration chain once per reference
            # (measured: steady wall halves at sf0.1). Node-sized.
            a = bounded_persist(a, "graph.hits_a")
        hraw = (
            pairs.join(a.select("sk", "a"), "sk")
            .groupBy("ck")
            .agg(F.sum("a").alias("raw"))
            .withColumn("t", F.sum("raw").over(wall))
        )
        h = hraw.join(hubs, "ck").select(
            "ck", "odeg", F.expr(norm).alias("h")
        )
    hub_rows = h.select(
        F.concat(F.lit("c:"), F.col("ck").cast("string")).alias("node"),
        F.col("odeg").cast("bigint").alias("degree"),
        F.col("h").cast("bigint").alias("score_scaled"),
        F.lit("hub").alias("side"),
    )
    auth_rows = a.select(
        F.concat(F.lit("s:"), F.col("sk").cast("string")).alias("node"),
        F.col("ideg").cast("bigint").alias("degree"),
        F.col("a").cast("bigint").alias("score_scaled"),
        F.lit("authority").alias("side"),
    )
    return hub_rows.unionByName(auth_rows)


_LPA_ITERS = 2


def _label_prop_oracle() -> str:
    ctes = [
        """
    pairs AS (
      SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE o.o_custkey IS NOT NULL AND l.l_suppkey IS NOT NULL),
    e AS (
      SELECT ck * 2 AS src, sk * 2 + 1 AS dst FROM pairs
      UNION ALL
      SELECT sk * 2 + 1 AS src, ck * 2 AS dst FROM pairs),
    lab0 AS (SELECT DISTINCT src AS node, src AS lab FROM e)
        """
    ]
    for i in range(1, _LPA_ITERS + 1):
        ctes.append(
            """
    cnt{i} AS (
      SELECT e.dst AS node, l.lab, COUNT(*) AS c
      FROM e JOIN lab{prev} l ON l.node = e.src
      GROUP BY e.dst, l.lab),
    best{i} AS (SELECT node, MAX(c) AS mc FROM cnt{i} GROUP BY node),
    lab{i} AS (
      SELECT c.node, MIN(c.lab) AS lab
      FROM cnt{i} c JOIN best{i} b ON b.node = c.node AND c.c = b.mc
      GROUP BY c.node)
            """.format(i=i, prev=i - 1)
        )
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
    SELECT CASE WHEN node % 2 = 0
                THEN 'c:' || CAST(node // 2 AS VARCHAR)
                ELSE 's:' || CAST((node - 1) // 2 AS VARCHAR) END AS node,
           CASE WHEN lab % 2 = 0
                THEN 'c:' || CAST(lab // 2 AS VARCHAR)
                ELSE 's:' || CAST((lab - 1) // 2 AS VARCHAR) END AS label
    FROM lab{_LPA_ITERS}
    """
    )


@query("d17_label_prop", oracle=_label_prop_oracle())
def d17_label_prop(spark: SparkSession, sf: str) -> DataFrame:
    """D17: synchronous label propagation (Raghavan et al., 2007) over
    the undirected trade graph — the standard lightweight community
    detector. Every node starts as its own label; each round it
    adopts the MODAL label among its neighbors with ties broken by
    the lexicographic minimum, which makes the fixed-round result
    fully deterministic (and therefore hash-oracled via unrolled
    CTEs) — asynchronous/random-order LPA is not reproducible and has
    no place in a correctness-gated registry.

    Scale: per-round cost is one edges⨝labels shuffle join + a
    map-combinable (node, label) count; the modal pick is a max-count
    window PARTITIONED BY NODE (bounded per-key by the node's
    neighbor-label diversity — no global sort, no whole-partition
    key) followed by a min aggregate. Rounds are the bounded constant;
    edges are ``bounded_persist``-ed (every round references them —
    the PageRank 88-scan lesson). Round 9: labels travel as LONGS
    (customer 2k / supplier 2k+1 — the pagerank encoding) through
    every round's join + count and decode to the public ``c:``/``s:``
    strings only in the final N-row projection; the min-label
    tie-break is numeric on the SAME encoding on both engines (the
    string spelling also min'd consistently, but lexicographic 'c:10'
    < 'c:9' made the fixture's communities depend on digit counts —
    and label strings rode every shuffle).
    """
    from pyspark.sql import Window

    from event_streamer_spark.caching import bounded_persist

    # shared src-partitioned slot with PageRank — see _mirrored_edges
    edges = _mirrored_edges(spark, sf)
    lab = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    w = Window.partitionBy("node")
    for _ in range(_LPA_ITERS):
        cnt = (
            edges.join(
                lab.select(F.col("node").alias("src"), "lab"), "src"
            )
            .groupBy(F.col("dst").alias("node"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # modal label, min tie-break: max-count via a node-partitioned
        # window (single reference — the HITS plan-blowup lesson),
        # then MIN over the tied labels
        lab = (
            cnt.withColumn("mc", F.max("c").over(w))
            .filter(F.col("c") == F.col("mc"))
            .groupBy("node")
            .agg(F.min("lab").alias("lab"))
        )
    def _decode(col: str) -> F.Column:
        c = F.col(col)
        return F.when(
            c % 2 == 0, F.concat(F.lit("c:"), F.expr(f"{col} DIV 2").cast("string"))
        ).otherwise(
            F.concat(F.lit("s:"), F.expr(f"({col} - 1) DIV 2").cast("string"))
        )

    return lab.select(
        _decode("node").alias("node"), _decode("lab").alias("label")
    )
