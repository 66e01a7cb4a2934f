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
    """
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    ck = F.concat(F.lit("c:"), F.col("o_custkey").cast("string"))
    sk = F.concat(F.lit("s:"), F.col("l_suppkey").cast("string"))
    edges = pairs.select(ck.alias("src"), sk.alias("dst")).unionAll(
        pairs.select(sk.alias("src"), ck.alias("dst"))
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    # node table with the broadcast 1-row count: every iteration's base
    # term and the final projection read it co-located, no collect
    nodes = deg.crossJoin(F.broadcast(nn))
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

