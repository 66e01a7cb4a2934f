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
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
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

    The edge list and node table are ``bounded_persist``-ed: every
    iteration references both, and without the cache Catalyst inlines
    the whole fact-join subtree at each reference (plan-audited: 88
    parquet scans for 3 iterations → 4 with the caches; at 100 TB
    that is the difference between one fact join and a dozen).
    """
    from event_streamer_spark.caching import bounded_persist

    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    ck = F.concat(F.lit("c:"), F.col("o_custkey").cast("string"))
    sk = F.concat(F.lit("s:"), F.col("l_suppkey").cast("string"))
    edges = bounded_persist(
        pairs.select(ck.alias("src"), sk.alias("dst")).unionAll(
            pairs.select(sk.alias("src"), ck.alias("dst"))
        ),
        "graph.pr_edges",
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    # node table with the broadcast 1-row count: every iteration's base
    # term and the final projection read it co-located, no collect
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
        "node",
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
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    cust_deg AS (
      SELECT ck FROM pairs GROUP BY ck
      HAVING COUNT(*) <= {_CN_MAX_DEGREE}),
    e AS (SELECT p.ck, p.sk FROM pairs p JOIN cust_deg d ON p.ck = d.ck),
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
    excluded BEFORE the self-join (one map-combinable degree count +
    a broadcast-friendly semi join), so no hub customer can contribute
    a quadratic pair burst; after the cap, every join key carries at
    most ``_CN_MAX_DEGREE`` rows. Degrees for the Jaccard denominator
    come from the SAME capped edge set, keeping the metric internally
    consistent. Two shuffles: the pair self-join on customer, the
    shared-count aggregate on the supplier pair. The capped edge set
    feeds three consumers (degrees + both self-join sides), so it is
    ``bounded_persist``-ed — without the cache each reference inlines
    the fact-join subtree (plan-audited: 32 parquet scans → 4).
    """
    from event_streamer_spark.caching import bounded_persist

    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    ok = (
        pairs.groupBy("ck")
        .agg(F.count(F.lit(1)).alias("cd"))
        .filter(F.col("cd") <= _CN_MAX_DEGREE)
        .select("ck")
    )
    e = bounded_persist(pairs.join(ok, "ck"), "graph.cn_edges")
    deg = e.groupBy("sk").agg(F.count(F.lit(1)).alias("deg"))
    a = e.alias("a")
    b = e.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.ck") == F.col("b.ck"))
            & (F.col("a.sk") < F.col("b.sk")),
        )
        .groupBy(
            F.col("a.sk").alias("supp_a"), F.col("b.sk").alias("supp_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_customers"))
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
