"""Market-basket analysis (D19): frequent item pairs and association
rules over order baskets — the classic distributed co-occurrence
mining workload (Agrawal & Srikant's Apriori restricted to 2-itemsets,
the level that dominates retail/co-view pipelines at scale).

Reference parity note: the reference (comparaonline/event-streamer,
``src/`` — a KafkaJS routing wrapper) has no analytics surface; this
module extends the SURVEY §2.D training-data/analytics mandate the
same way D17 (graph) and D18 (ER) do.

A basket is the DISTINCT set of parts in one order (lineitem can carry
the same part on two lines of one order; a basket is a set, so the
pair universe deduplicates first). The pair-generation self-join is
equi-keyed on the order key, so Spark co-locates both sides in one
shuffle and the quadratic blow-up is bounded per-basket, not global:
pairs-per-order = C(b, 2) where b is the basket size. That makes
basket SIZE (not item popularity) the scale hazard — a single
million-item "basket" (a crawler session, a bot cart) would emit
~5·10^11 pairs from one key. ``_MAX_BASKET`` caps it: baskets larger
than 64 items are dropped BEFORE pair generation, in both the Spark
leg and the oracle SQL, so the cap is part of the declared semantics
(TPC-H baskets are ≤ 7 lines, so the cap never fires at test SFs; on
real data it is the same heavy-tail guard as dedup's shingle-DF cap).

Engine-difference ledger (same contract as ``scripts/fuzz_oracles.py``):

- Integer division: Spark ``DIV`` ↔ DuckDB ``//`` BOTH truncate toward
  zero (probed by the ``q_intdiv`` fuzz shape) — confidence/lift ppm
  values are exact integers on both engines.
- ``COUNT(*)`` is BIGINT on Spark but may fold to HUGEINT in DuckDB
  arithmetic; every count is cast to BIGINT before multiplication so
  the ppm products stay in BIGINT range on both sides (bounds below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load

# Basket-size cap: part of the operator's declared semantics (applied
# in BOTH engines). C(64, 2) = 2016 pairs is the worst single-basket
# emission; beyond that a basket is treated as noise (bot carts,
# session-collapsed crawls), exactly like dedup's shingle-DF cap.
_MAX_BASKET = 64

# Minimum pair support. 2 is the lowest non-trivial level and is
# non-vacuous at every test SF (probed: 2324 / 3445 / 3573 frequent
# pairs at sf0.001 / 0.01 / 0.1).
_MIN_SUPPORT = 2

_BASKET_SQL = f"""
    items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    kept AS (
      SELECT ok FROM items GROUP BY ok HAVING COUNT(*) <= {_MAX_BASKET}),
    it AS (SELECT i.ok, i.pk FROM items i JOIN kept USING (ok))
"""


def _baskets(spark: SparkSession, sf: str) -> DataFrame:
    """Deduped (order, part) basket items with the size cap applied.

    One shuffle on ``ok`` covers the dedupe, the size count, and the
    pair self-join downstream (same key), so AQE reuses the exchange.
    """
    items = (
        load(spark, sf, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_partkey").alias("pk"),
        )
        .distinct()
    )
    kept = (
        items.groupBy("ok")
        .agg(F.count("*").alias("bsz"))
        .filter(F.col("bsz") <= _MAX_BASKET)
        .select("ok")
    )
    return items.join(kept, "ok")


def frequent_pairs(items: DataFrame, min_support: int = _MIN_SUPPORT) -> DataFrame:
    """Co-occurring item pairs with support ≥ ``min_support`` from a
    deduped ``(ok, pk)`` basket-items frame.

    The self-join is equi-keyed on ``ok`` — one co-located shuffle,
    per-basket quadratic only (bounded by the caller's basket cap).
    The ``a.pk < b.pk`` canonical ordering generates each unordered
    pair exactly once (the same trick as d17_triangles' oriented
    edges). The pair aggregate shuffles on (part_x, part_y), which is
    map-side combinable: partial counts collapse before the exchange.
    """
    a = items.select(F.col("ok"), F.col("pk").alias("part_x"))
    b = items.select(F.col("ok"), F.col("pk").alias("part_y"))
    return (
        a.join(b, "ok")
        .filter(F.col("part_x") < F.col("part_y"))
        .groupBy("part_x", "part_y")
        .agg(F.count("*").cast("bigint").alias("support"))
        .filter(F.col("support") >= min_support)
    )


@query(
    "d19_frequent_pairs",
    oracle=f"""
    WITH {_BASKET_SQL}
    SELECT a.pk AS part_x, b.pk AS part_y,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk
    GROUP BY 1, 2
    HAVING COUNT(*) >= {_MIN_SUPPORT}
    """,
)
def d19_frequent_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """D19: frequent 2-itemsets over order baskets — which parts are
    bought together in at least ``_MIN_SUPPORT`` distinct orders.

    Plan shape at 100 TB: dedupe + basket-size count + pair self-join
    all shuffle on the SAME order key (one exchange, AQE-reused); the
    only other shuffle is the map-side-combinable pair count. No
    driver state, no collect; the basket cap bounds the worst per-task
    pair emission at C(64,2) rows per basket regardless of corpus
    size.
    """
    return frequent_pairs(_baskets(spark, sf))


@query(
    "d19_assoc_rules",
    oracle=f"""
    WITH {_BASKET_SQL},
    pairs AS (
      SELECT a.pk AS part_x, b.pk AS part_y,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_MIN_SUPPORT}),
    freq AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS c FROM it GROUP BY pk),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_baskets FROM kept),
    rules AS (
      SELECT part_x AS antecedent, part_y AS consequent, support FROM pairs
      UNION ALL
      SELECT part_y, part_x, support FROM pairs)
    SELECT r.antecedent, r.consequent, r.support,
           (1000000 * r.support) // fa.c AS confidence_ppm,
           (1000000 * r.support * n.n_baskets) // (fa.c * fc.c) AS lift_ppm
    FROM rules r
    JOIN freq fa ON fa.pk = r.antecedent
    JOIN freq fc ON fc.pk = r.consequent
    CROSS JOIN n
    """,
)
def d19_assoc_rules(spark: SparkSession, sf: str) -> DataFrame:
    """D19: association rules from the frequent pairs — both rule
    directions x→y and y→x with exact integer-ppm confidence
    (support/count(antecedent)) and lift
    (support·n_baskets/(count(x)·count(y))), the Apriori rule stage.

    All arithmetic is BIGINT with truncating integer division on both
    engines (module ledger). Bounds: 10^6 · support · n_baskets needs
    support·n_baskets < 9.2·10^12 — at TPC-H co-occurrence rates
    (support ≤ 5 at sf0.1) that holds through sf10^4; corpora beyond
    that move the ppm scale into DECIMAL(38,0), noted here rather than
    silently overflowed.

    Plan: the pair frame and the item-frequency frame derive from the
    SAME basket scan; ``freq`` is ≤ |item universe| rows, so both rule
    probability joins broadcast at any corpus size (item universes are
    catalog-sized, not corpus-sized). The basket count is a 1-row
    cross join.
    """
    from event_streamer_spark.caching import bounded_persist

    # three consumers (pairs, freq, n_baskets) — unpersisted, Catalyst
    # would inline the dedupe+cap subtree into each (the PageRank
    # review lesson)
    items = bounded_persist(_baskets(spark, sf), "d19_baskets")
    pairs = frequent_pairs(items)
    freq = items.groupBy("pk").agg(F.count("*").cast("bigint").alias("c"))
    n_baskets = items.select("ok").distinct().agg(
        F.count("*").cast("bigint").alias("n_baskets")
    )  # 1-row frame, broadcast below — stays lazy, no driver action

    rules = pairs.select(
        F.col("part_x").alias("antecedent"),
        F.col("part_y").alias("consequent"),
        "support",
    ).unionAll(
        pairs.select(
            F.col("part_y").alias("antecedent"),
            F.col("part_x").alias("consequent"),
            "support",
        )
    )
    fa = F.broadcast(freq.select(F.col("pk").alias("antecedent"), F.col("c").alias("ca")))
    fc = F.broadcast(freq.select(F.col("pk").alias("consequent"), F.col("c").alias("cc")))
    return (
        rules.join(fa, "antecedent")
        .join(fc, "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "support",
            F.expr("(1000000 * support) DIV ca").alias("confidence_ppm"),
            F.expr("(1000000 * support * n_baskets) DIV (ca * cc)").alias(
                "lift_ppm"
            ),
        )
    )
