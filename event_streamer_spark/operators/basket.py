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
pair universe deduplicates first). Pair generation collapses each
basket to ONE sorted-array row (a single map-side-partial
``collect_set`` shuffle) and expands pairs with JVM-side generators —
no self-join at all — so the quadratic blow-up is bounded per-basket,
not global: pairs-per-order = C(b, 2) where b is the basket size.
That makes basket SIZE (not item popularity) the scale hazard — a
single million-item "basket" (a crawler session, a bot cart) would
emit ~5·10^11 pairs from one row. ``_MAX_BASKET`` caps it: baskets
larger than 64 items are dropped BEFORE pair expansion, in both the
Spark leg and the oracle SQL, so the cap is part of the declared
semantics (TPC-H baskets are ≤ 7 lines, so the cap never fires at
test SFs; on real data it is the same heavy-tail guard as dedup's
shingle-DF cap).

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

# NULL keys are excluded EXPLICITLY on both engines: DuckDB's DISTINCT
# keeps a NULL part as a basket item (so it would count toward the
# size cap) while Spark's collect_set silently drops it — a basket at
# exactly _MAX_BASKET real items plus one NULL line would be capped on
# one engine and kept on the other.
_BASKET_SQL = f"""
    items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
    kept AS (
      SELECT ok FROM items GROUP BY ok HAVING COUNT(*) <= {_MAX_BASKET}),
    it AS (SELECT i.ok, i.pk FROM items i JOIN kept USING (ok))
"""


def basket_arrays(spark: SparkSession, sf: str) -> DataFrame:
    """Each kept basket as ONE row: (ok, sorted distinct part array).

    A single shuffle of the raw lines with a map-side-partial
    ``collect_set`` replaces the first draft's distinct + size-count +
    self-join chain (three exchanges of the same table plus a repeated
    subtree — measured 2.5 s warm at sf0.1 vs 0.4 s for this shape).
    Per-reducer-key state is the basket's distinct-item set, which the
    cap declares bounded; the cap filter itself is free (``size`` on
    the built array). A physically unbounded key (an order with
    millions of DISTINCT items) would pressure one task's aggregation
    buffer before the filter drops it — that is the collect_set
    tradeoff, acceptable because order keys, unlike user or session
    keys, carry a schema-level line-count bound in every real order
    system.

    Round 9: the kept-basket frame lives in ONE module-shared
    ``bounded_persist`` slot (the ``graph.pairs`` pattern) — all three
    d19 queries consume it, assoc_rules references it through several
    subtrees (pair support, item frequencies, the basket count), and
    the bench runs the family back to back, so a session materializes
    the collect_set shuffle once instead of once per reference.
    """
    from event_streamer_spark.caching import bounded_persist

    return bounded_persist(
        load(spark, sf, "lineitem")
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_partkey").alias("pk"),
        )
        # explicit, though collect_set also drops NULLs: the ORACLE's
        # DISTINCT would keep a NULL item and shift the size cap (see
        # _BASKET_SQL) — the filter keeps both engines on one rule
        .filter(F.col("ok").isNotNull() & F.col("pk").isNotNull())
        .groupBy("ok")
        .agg(F.sort_array(F.collect_set("pk")).alias("arr"))
        .filter(F.size("arr") <= _MAX_BASKET),
        "basket.arrays",
    )


def pairs_from_arrays(
    arrs: DataFrame, min_support: int = _MIN_SUPPORT
) -> DataFrame:
    """Co-occurring pairs with support ≥ ``min_support`` from
    (ok, sorted-array) baskets.

    Pair expansion is two JVM-side generators — ``posexplode`` the
    array, then explode each element's strict suffix (``slice`` is
    1-based, so the 0-based position ``i`` pairs with elements from
    1-based ``i + 2``) — emitting each unordered pair exactly once in
    canonical x < y order (the array is sorted) with NO join and no
    shuffle until the final map-side-combinable pair count.
    """
    return (
        arrs.select(F.posexplode("arr").alias("i", "part_x"), "arr")
        .select(
            "part_x",
            F.explode(F.expr("slice(arr, i + 2, size(arr))")).alias(
                "part_y"
            ),
        )
        .groupBy("part_x", "part_y")
        .agg(F.count("*").cast("bigint").alias("support"))
        .filter(F.col("support") >= min_support)
    )


def frequent_pairs(
    items: DataFrame, min_support: int = _MIN_SUPPORT
) -> DataFrame:
    """Co-occurring item pairs with support ≥ ``min_support`` from an
    ``(ok, pk)`` basket-items frame (rows may repeat — the basket is a
    set, so repeats collapse in the ``collect_set``). The caller owns
    the basket-size cap; see :func:`basket_arrays` for the plan
    rationale."""
    arrs = items.groupBy("ok").agg(
        F.sort_array(F.collect_set("pk")).alias("arr")
    )
    return pairs_from_arrays(arrs, min_support)


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

    Plan shape at 100 TB: exactly TWO shuffles — the raw lines into
    per-order sets (map-side-partial collect_set), and the pair count
    (map-side combinable). Pair expansion itself is generator-side
    with no join; the basket cap bounds the worst per-row emission at
    C(64,2) regardless of corpus size. No driver state, no collect.
    """
    return pairs_from_arrays(basket_arrays(spark, sf))


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

    Shape is SIZE-ADAPTIVE (round 11, the distrank-auto pattern): the
    fused single-shuffle combo below wins when the observed-pair
    universe fits one hash aggregate comfortably (sf0.1 warm 1.45 →
    0.71 s, the r10 win), but the sf10 A/B (`AB_SF10_r11.json`)
    measured the crossover: at 60M lines the combo's single aggregate
    carries ~10⁸ mostly-support-1 pair keys plus the marker rows and
    reads cold 59.4 s, while the pre-r10 TWO-shuffle split — item
    frequencies combining map-side onto catalog-sized keys, pairs
    shuffling alone — reads 34.6 s (−42%; sortagg −15% and bucketed
    storage −34%+14s-write were both measured and rejected). Cold is
    the metric that matters at scale (a 100 TB job runs once; the
    combo's warm advantage exists only while its all-observed-pairs
    slot — NOT catalog-sized, the r10 docstring overclaimed — stays
    cached). Auto rule: Catalyst's size estimate for the 2-column
    lineitem projection vs ``spark.event_streamer.basket.splitMinBytes``
    (default 256 MiB: sf0.1 ≈ 11 MB stays combo — benched plan
    unchanged; sf10 ≈ 1.1 GB goes split). Both shapes are
    value-identical (pinned by a forced-mode equality test).
    """
    from event_streamer_spark.operators.distrank import _plan_size_bytes

    est = _plan_size_bytes(
        load(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    )
    threshold = int(
        spark.conf.get(
            "spark.event_streamer.basket.splitMinBytes",
            str(_SPLIT_MIN_BYTES),
        )
    )
    mode = "split" if est is not None and est > threshold else "combo"
    return assoc_rules_from_arrays(basket_arrays(spark, sf), mode=mode)


# the combo-vs-split crossover (see d19_assoc_rules): below this input
# size the fused single-shuffle shape wins, above it the two-shuffle
# split does (measured at sf0.1 / sf10; conf-overridable)
_SPLIT_MIN_BYTES = 256 << 20


def _rules_tail(
    pairs: DataFrame, freq: DataFrame, n_baskets: DataFrame
) -> DataFrame:
    """Rule directions + broadcast probability joins — shared by both
    aggregate shapes; inputs are (part_x, part_y, support),
    (pk, c) and the 1-row basket count."""
    # both rule directions in ONE pass over the pair subtree: a
    # two-select union would reference `pairs` twice, and Catalyst
    # executes the self-join + aggregate once per reference (the
    # d18_er_golden review lesson) — explode duplicates rows instead
    rules = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("part_x").alias("antecedent"),
                    F.col("part_y").alias("consequent"),
                    F.col("support"),
                ),
                F.struct(
                    F.col("part_y").alias("antecedent"),
                    F.col("part_x").alias("consequent"),
                    F.col("support"),
                ),
            )
        ).alias("r")
    ).select("r.antecedent", "r.consequent", "r.support")
    fa = F.broadcast(
        freq.select(F.col("pk").alias("antecedent"), F.col("c").alias("ca"))
    )
    fc = F.broadcast(
        freq.select(F.col("pk").alias("consequent"), F.col("c").alias("cc"))
    )
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


def assoc_rules_from_arrays(
    arrs: DataFrame, slot: str = "d19_combo", mode: str = "combo"
) -> DataFrame:
    """The d19 rule stage over any (ok, sorted-array) basket frame —
    split out (round 11) so the sf10 A/B harness can feed variant
    basket sources and force either aggregate shape.

    ``mode="combo"``: ONE NULL-marker shuffle (below). ``mode="split"``:
    the pair count and the item-frequency count each shuffle separately
    — at large corpora the freq aggregate combines map-side onto
    catalog-sized keys instead of riding a ~n²-key pair aggregate
    (sf10 cold 59.4 → 34.6 s), and only the post-support-filter pairs
    (frequent-pair-sized) and freq (catalog-sized) persist, never the
    all-observed-pairs frame.
    """
    from event_streamer_spark.caching import bounded_persist

    if mode == "split":
        pairs = bounded_persist(
            pairs_from_arrays(arrs), "d19_pairs_split"
        )
        freq = bounded_persist(
            arrs.select(F.explode("arr").alias("pk"))
            .groupBy("pk")
            .agg(F.count("*").cast("bigint").alias("c")),
            "d19_freq_split",
        )
        n_baskets = arrs.agg(
            F.count("*").cast("bigint").alias("n_baskets")
        )
        return _rules_tail(pairs, freq, n_baskets)

    # Round-10 stage split (the r9 bench's slowest warm headliner,
    # 1.85 s flat two rounds running — measured stages: pair shuffle
    # 0.88, item-freq shuffle 0.48, joins 0.22, and repartitioning/
    # generator variants moved nothing). The fix is structural: pair
    # support, per-item frequencies AND the basket count all come out
    # of ONE generator pass + ONE shuffle, using NULL-marker rows —
    # each basket emits its C(b,2) pairs (x, y), its b singletons
    # (x, NULL) and one sentinel (NULL, NULL); a single (x, y) groupBy
    # then holds all three aggregates, disambiguated by NULL pattern.
    # Measured warm at sf0.1: 1.45 s → 0.71 s, identical rule set.
    # Scale: shuffle volume grows ~1.5× vs pairs alone but REPLACES a
    # second full shuffle of the same data; the aggregated frame is
    # bounded by pairs + item universe + 1, so the persisted slot is
    # catalog-sized, never corpus-sized.
    combo = bounded_persist(
        arrs
        .select(
            F.explode(
                F.expr(
                    """
                    concat(
                      flatten(transform(arr, (x, i) ->
                        transform(slice(arr, i + 2, size(arr)),
                                  y -> struct(x AS x, y AS y)))),
                      transform(arr,
                                x -> struct(x AS x, CAST(NULL AS BIGINT) AS y)),
                      array(struct(CAST(NULL AS BIGINT) AS x,
                                   CAST(NULL AS BIGINT) AS y))
                    )"""
                )
            ).alias("p")
        )
        .select("p.x", "p.y")
        .groupBy("x", "y")
        .agg(F.count("*").cast("bigint").alias("cnt")),
        slot,
    )
    pairs = combo.filter(
        F.col("y").isNotNull() & (F.col("cnt") >= _MIN_SUPPORT)
    ).select(
        F.col("x").alias("part_x"),
        F.col("y").alias("part_y"),
        F.col("cnt").alias("support"),
    )
    freq = combo.filter(
        F.col("x").isNotNull() & F.col("y").isNull()
    ).select(F.col("x").alias("pk"), F.col("cnt").alias("c"))
    n_baskets = combo.filter(F.col("x").isNull()).select(
        F.col("cnt").alias("n_baskets")
    )  # 1-row frame, broadcast in the tail — stays lazy, no driver action
    return _rules_tail(pairs, freq, n_baskets)


@query(
    "d19_next_order",
    oracle=f"""
    WITH {_BASKET_SQL},
    arrs AS (
      SELECT ok, COUNT(*) AS bsz FROM it GROUP BY ok),
    seq AS (
      -- identity required (the b60 rule): a NULL customer key is not
      -- a sequence; the old self-join dropped it implicitly, the
      -- lead() spelling must exclude it explicitly on both engines
      SELECT o.o_orderkey AS ok, o.o_custkey AS ck,
             ROW_NUMBER() OVER (PARTITION BY o.o_custkey
                                ORDER BY o.o_orderdate NULLS LAST,
                                         o.o_orderkey)
               AS s
      FROM orders o JOIN arrs ON arrs.ok = o.o_orderkey
      WHERE o.o_custkey IS NOT NULL),
    steps AS (
      SELECT a.ok AS ok_a, b.ok AS ok_b
      FROM seq a JOIN seq b ON b.ck = a.ck AND b.s = a.s + 1)
    SELECT ia.pk AS part_first, ib.pk AS part_next,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM steps st
    JOIN it ia ON ia.ok = st.ok_a
    JOIN it ib ON ib.ok = st.ok_b
    GROUP BY ia.pk, ib.pk
    HAVING COUNT(*) >= {_MIN_SUPPORT}
    """,
)
def d19_next_order(spark: SparkSession, sf: str) -> DataFrame:
    """D19: sequential basket affinity — DIRECTED (bought X, then
    bought Y in the customer's NEXT order) co-occurrence counts, the
    temporal companion to ``d19_frequent_pairs``: symmetric pair
    support says "go together", this says "lead to". x = y rows are
    repurchase signals and stay in. The order sequence is the
    per-customer (order date, order key) ordering — the deterministic
    tiebreak — and only capped baskets participate (same
    ``_MAX_BASKET``/NULL rules as the module's other queries, so a bot
    cart cannot emit a 64×64 cross per step).

    Scale: ONE per-customer window pass — ``lead(arr)`` hands each
    order its successor's basket directly (round 9; the row_number +
    (customer, seq) self-join it replaced computed the sequence
    subtree twice and paid an extra shuffle to rejoin it); the window
    is bounded by orders-per-customer; pair expansion is the cross of
    two ≤``_MAX_BASKET`` arrays per step — two JVM-side explodes, no
    row blow-up beyond the declared cap; the final count is map-side
    combinable on (first, next).
    """
    from pyspark.sql import Window

    # both step sides read the (order → array) frame — served by the
    # module-shared basket.arrays slot (persisted inside basket_arrays)
    arrs = basket_arrays(spark, sf)
    # NULL order dates sort LAST on both engines, pinned explicitly:
    # Spark's ASC default is NULLS FIRST, DuckDB's is NULLS LAST —
    # left implicit, a NULL-dated order takes a different sequence
    # slot per engine and the consecutive pairs diverge (the
    # journey.py/validation.py divergence class, round-9 advice).
    # The NEXT basket comes from lead() over the same ordering — ONE
    # window pass instead of the round-8 row_number + (ck, s)
    # self-join, which computed the whole seq subtree twice and
    # shuffled it back together (round 9).
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_last(), "o_orderkey"
    )
    steps = (
        load(spark, sf, "orders")
        # identity required (the b60 rule; round-9 dirty corpus): the
        # lead() window would otherwise chain successors inside the
        # NULL-customer partition that the oracle's equi-join drops
        .filter(F.col("o_custkey").isNotNull())
        .join(arrs, F.col("o_orderkey") == F.col("ok"))
        .select(
            F.col("arr").alias("arr_a"),
            F.lead("arr").over(w).alias("arr_b"),
        )
        .filter(F.col("arr_b").isNotNull())
    )
    return (
        steps.select(
            F.explode("arr_a").alias("part_first"), "arr_b"
        )
        .select(
            "part_first", F.explode("arr_b").alias("part_next")
        )
        .groupBy("part_first", "part_next")
        .agg(F.count("*").cast("bigint").alias("support"))
        .filter(F.col("support") >= _MIN_SUPPORT)
    )
