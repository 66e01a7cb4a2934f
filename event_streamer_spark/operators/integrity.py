"""Referential-integrity and reconciliation audits (D16).

The checks a warehouse team runs before trusting a 100 TB drop: foreign
keys that dangle (a child row whose parent was lost upstream), primary
keys that collide (a replayed partition double-writing rows), and money
columns that no longer reconcile with their line-level source of truth.
All three are pure relational compositions — keyed joins and two-level
aggregates, no UDFs, no driver state — and each returns a small audit
report, never the offending rows themselves (at 100 TB the report is
what pages a human; the row dump is a follow-up query).

Scale posture: every check shuffles once on the audited key and
pre-aggregates map-side before the exchange. The FK probe joins the
child against the parent's *distinct key projection* (column-pruned to
one column at scan time), so the parent side of the exchange is its key
cardinality, not its row width; tiny dims (nation) broadcast under AQE.
Money reconciliation runs in exact integer micro-dollars so partial-
aggregation order can never perturb the verdict.

No counterpart in the reference (comparaonline/event-streamer has no
relational surface); the A13 validation hooks (``src/index.ts`` reject
rules) are the closest analog — these are their dataset-level siblings.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load

# (edge label, child table, child FK column, parent table, parent PK).
# Every declared FK edge of the fixture schema (FIXTURES.md), including
# both nation references and the nation->region closure.
_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey"),
]


def _fk_edge_sql(edge: str, child: str, fk: str, parent: str,
                 pk: str) -> str:
    return f"""
    SELECT '{edge}' AS edge,
           CAST(COUNT(*) AS BIGINT) AS n_child,
           CAST(COALESCE(SUM(CASE WHEN c.{fk} IS NOT NULL
                                       AND p.{pk} IS NULL
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_orphans,
           CAST(COALESCE(SUM(CASE WHEN c.{fk} IS NULL
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_null_fk
    FROM {child} c
    LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p ON c.{fk} = p.{pk}
    """


@query(
    "d16_fk_orphans",
    oracle="""
    SELECT edge, n_child, n_orphans, n_null_fk,
           ROUND(CAST(n_orphans AS DOUBLE) / n_child, 6) AS orphan_rate
    FROM (
    """ + "\nUNION ALL\n".join(
        _fk_edge_sql(*e) for e in _FK_EDGES
    ) + """
    )
    """,
)
def d16_fk_orphans(spark: SparkSession, sf: str) -> DataFrame:
    """D16: dangling-foreign-key audit over every declared FK edge.

    Per edge: child rows, children whose non-NULL key has no parent
    (orphans), and children with a NULL key (reported separately — a
    NULL FK is a modelling decision, an orphan is corruption). Each
    join runs against the parent's distinct key projection so a
    duplicated parent PK can never inflate ``n_child``; the distinct is
    a map-combinable pre-aggregate on the parent's own key.

    Scan budget (review r8): a child table is scanned ONCE no matter
    how many edges leave it — lineitem's three edges chain their
    parent-key left joins over a single fact scan and come out of one
    aggregate, unpivoted by ``stack`` (the same N-scans→1 treatment
    d15_anomaly_mad documents). Distinct parent keys can never
    multiply the chained rows, so the shared ``COUNT(*)`` stays the
    child row count. At 100 TB each edge's key shuffle is inherent;
    the redundant fact scans were not.
    """
    by_child: dict[str, list] = {}
    for e in _FK_EDGES:
        by_child.setdefault(e[1], []).append(e)
    frames = []
    for child, edges in by_child.items():
        c = load(spark, sf, child).select(
            *sorted({e[2] for e in edges})
        )
        for i, (_, _, fk, parent, pk) in enumerate(edges):
            p = (
                load(spark, sf, parent)
                .select(F.col(pk).alias(f"pk_{i}"))
                .distinct()
            )
            c = c.join(p, F.col(fk) == F.col(f"pk_{i}"), "left")
        aggs = [F.count(F.lit(1)).alias("n_child")]
        for i, (_, _, fk, _, _) in enumerate(edges):
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col(fk).isNotNull()
                            & F.col(f"pk_{i}").isNull(),
                            1,
                        ).otherwise(0)
                    ),
                    F.lit(0),
                ).alias(f"orph_{i}")
            )
            aggs.append(
                F.coalesce(
                    F.sum(F.when(F.col(fk).isNull(), 1).otherwise(0)),
                    F.lit(0),
                ).alias(f"nullfk_{i}")
            )
        one_row = c.agg(*aggs)
        stack_args = ", ".join(
            f"'{edge}', n_child, orph_{i}, nullfk_{i}"
            for i, (edge, _, _, _, _) in enumerate(edges)
        )
        frames.append(
            one_row.selectExpr(
                f"stack({len(edges)}, {stack_args})"
                " AS (edge, n_child, n_orphans, n_null_fk)"
            )
        )
    out = reduce(DataFrame.unionByName, frames)
    return out.withColumn(
        "orphan_rate",
        F.round(F.col("n_orphans").cast("double") / F.col("n_child"), 6),
    )


# (table, PK column list) audited for duplicate keys — every declared
# key including the single-column dims and lineitem's COMPOSITE PK
# (l_orderkey, l_linenumber). NULL key components group like any value
# on both engines, so no string-concat encoding (whose NULL semantics
# diverge engine-wise) is needed.
_PK_TABLES = [
    ("orders", ["o_orderkey"]),
    ("customer", ["c_custkey"]),
    ("part", ["p_partkey"]),
    ("supplier", ["s_suppkey"]),
    ("nation", ["n_nationkey"]),
    ("region", ["r_regionkey"]),
    ("documents", ["doc_id"]),
    ("events", ["event_id"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
]


def _pk_key_name(table: str, cols: list) -> str:
    if len(cols) == 1:
        return f"{table}.{cols[0]}"
    return f"{table}.({','.join(cols)})"


def _dup_key_sql(table: str, cols: list) -> str:
    key_list = ", ".join(cols)
    return f"""
    SELECT '{_pk_key_name(table, cols)}' AS key_name,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(COALESCE(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_dup_keys,
           CAST(COALESCE(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END), 0)
                AS BIGINT) AS n_rows_in_dups,
           CAST(MAX(cnt) AS BIGINT) AS max_multiplicity
    FROM (SELECT COUNT(*) AS cnt FROM {table} GROUP BY {key_list})
    """


def dup_key_histogram(per_key: DataFrame, key_name: str) -> DataFrame:
    """Roll a ``(k, cnt)`` per-key count table up to the one-row
    collision report. Shared by the batch audit and the streaming
    index's read side (``streaming/integrity.py``) so the incremental
    verdict can never drift from the batch definition — per-key counts
    ADD across micro-batches, and this roll-up is what both run last.
    """
    return per_key.agg(
        F.lit(key_name).alias("key_name"),
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)), F.lit(0)
        ).alias("n_dup_keys"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)),
            F.lit(0),
        ).alias("n_rows_in_dups"),
        F.max("cnt").alias("max_multiplicity"),
    )


@query(
    "d16_dup_keys",
    oracle="\nUNION ALL\n".join(_dup_key_sql(*t) for t in _PK_TABLES),
)
def d16_dup_keys(spark: SparkSession, sf: str) -> DataFrame:
    """D16: primary-key-collision audit across every declared PK.

    Two-level aggregate per table: count per key (map-side combinable,
    one shuffle on the PK — the natural partitioning), then one global
    roll-up of the key histogram. Reports duplicate keys, rows trapped
    in duplicates, and the worst multiplicity — the number that tells
    you whether a replay double-wrote one partition (max=2 across many
    keys) or a hot key exploded (max large, few keys). NULL PKs group
    into one key like any other value on both engines. On this
    synthetic fixture the lineitem COMPOSITE key genuinely collides
    (the generator does not enforce it) — the audit reports that
    truth; see ``test_dup_keys_clean_fixture``.
    """
    frames = []
    for table, cols in _PK_TABLES:
        per_key = (
            load(spark, sf, table)
            .groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        frames.append(dup_key_histogram(per_key, _pk_key_name(table, cols)))
    return reduce(DataFrame.unionByName, frames)


@query(
    "d16_order_reconcile",
    oracle="""
    WITH line AS (
      SELECT l_orderkey,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                 * (100 + CAST(ROUND(l_tax * 100) AS BIGINT)))
               AS recomputed_e6,
             COUNT(*) AS n_lines
      FROM lineitem GROUP BY l_orderkey),
    per_order AS (
      SELECT o.o_orderstatus,
             l.n_lines,
             l.recomputed_e6
               - CAST(ROUND(o.o_totalprice * 100) AS BIGINT) * 10000
               AS diff_e6
      FROM orders o LEFT JOIN line l ON o.o_orderkey = l.l_orderkey)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(CASE WHEN n_lines IS NULL
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_no_lines,
           CAST(COALESCE(SUM(CASE WHEN diff_e6 = 0
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_exact,
           CAST(COALESCE(MAX(ABS(diff_e6)), 0) AS BIGINT)
             AS max_abs_diff_e6,
           CAST(SUM(CAST(ABS(diff_e6) AS HUGEINT))
                // COUNT(diff_e6) AS BIGINT) AS mean_abs_diff_e6
    FROM per_order
    GROUP BY o_orderstatus
    """,
)
def d16_order_reconcile(spark: SparkSession, sf: str) -> DataFrame:
    """D16: money reconciliation — does ``o_totalprice`` equal the
    lineitem-level ``sum(extendedprice * (1-discount) * (1+tax))``?

    All arithmetic is exact integers in micro-dollars (price in cents ×
    discount in hundredths × tax in hundredths = 1e-6 USD units), so
    the verdict is independent of aggregation order on both engines;
    the only doubles are the final report columns, produced from an
    exact DECIMAL(38,0) sum (BIGINT would overflow the corpus-level
    |diff| sum near petabyte scale — per-order values stay < 2^63).
    Shape: one map-combinable aggregate per order on lineitem, one
    co-partitioned join to orders on the same key, one tiny roll-up by
    status. Orders with no lineitems are counted, not scored.
    """
    li = load(spark, sf, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_h = F.round(F.col("l_discount") * 100).cast("long")
    tax_h = F.round(F.col("l_tax") * 100).cast("long")
    line = li.groupBy("l_orderkey").agg(
        F.sum(cents * (F.lit(100) - disc_h) * (F.lit(100) + tax_h)).alias(
            "recomputed_e6"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )
    orders = load(spark, sf, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        (F.round(F.col("o_totalprice") * 100).cast("long") * 10000).alias(
            "expected_e6"
        ),
    )
    per_order = orders.join(
        line, orders.o_orderkey == line.l_orderkey, "left"
    ).select(
        "o_orderstatus",
        "n_lines",
        (F.col("recomputed_e6") - F.col("expected_e6")).alias("diff_e6"),
    )
    return per_order.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.coalesce(
            F.sum(F.when(F.col("n_lines").isNull(), 1).otherwise(0)),
            F.lit(0),
        ).alias("n_no_lines"),
        F.coalesce(
            F.sum(F.when(F.col("diff_e6") == 0, 1).otherwise(0)), F.lit(0)
        ).alias("n_exact"),
        F.coalesce(F.max(F.abs(F.col("diff_e6"))), F.lit(0)).alias(
            "max_abs_diff_e6"
        ),
        # exact integer micro-USD mean (round 9: the old double
        # spelling ROUND(sum/1e6/count, 6) sat at double's precision
        # edge for billion-dollar diffs — the engines' last bits
        # diverged by 1 ulp); DECIMAL DIV / HUGEINT // is the d17_hits
        # parity recipe
        F.expr(
            "CAST(SUM(CAST(ABS(diff_e6) AS DECIMAL(38,0)))"
            " DIV COUNT(diff_e6) AS BIGINT)"
        ).alias("mean_abs_diff_e6"),
    )


@query(
    "d16_consistency_audit",
    oracle="""
    SELECT 'documents.n_chars==length(text)' AS rule,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(COALESCE(SUM(CASE WHEN n_chars IS NULL OR text IS NULL
                                       OR n_chars <> LENGTH(text)
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_violations
    FROM documents
    UNION ALL
    SELECT 'lineitem.discount_in_[0,1]',
           CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(CASE WHEN l_discount IS NULL
                                       OR l_discount < 0
                                       OR l_discount > 1
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.tax_in_[0,1]',
           CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(CASE WHEN l_tax IS NULL OR l_tax < 0
                                       OR l_tax > 1
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.shipdate>=orderdate',
           CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(CASE WHEN l.l_shipdate IS NULL
                                       OR o.o_orderdate IS NULL
                                       OR l.l_shipdate < o.o_orderdate
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def d16_consistency_audit(spark: SparkSession, sf: str) -> DataFrame:
    """D16: cross-column and cross-table consistency rules — derived
    columns that must agree (``n_chars`` vs the text it summarizes),
    domain ranges (discount/tax rates inside [0,1]), and temporal
    ordering across the FK edge (a line cannot ship before its order
    was placed). NULLs in a checked column count as violations — a
    rule that cannot be evaluated is not satisfied — including a NULL
    date on either side of the temporal rule (review r8 #4); lines
    whose order key is NULL or dangling are the FK audit's finding and
    are by design outside this rule's checked set. On this synthetic
    fixture the temporal rule genuinely fails for ~47% of lines (the
    generator draws dates independently) — the audit reports that
    truth; see the test.

    Shape: the three single-table rules come from one scan per table
    (documents once, lineitem once via ``stack``); the temporal rule
    is one co-partitioned join on the order key — identical physical
    shape to the FK-orphan audit's edges.
    """
    docs = load(spark, sf, "documents").agg(
        F.lit("documents.n_chars==length(text)").alias("rule"),
        F.count(F.lit(1)).alias("n_checked"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("n_chars").isNull()
                    | F.col("text").isNull()
                    | (F.col("n_chars") != F.length("text")),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("n_violations"),
    )
    li = load(spark, sf, "lineitem").agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("l_discount").isNull()
                    | (F.col("l_discount") < 0)
                    | (F.col("l_discount") > 1),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("disc_bad"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("l_tax").isNull()
                    | (F.col("l_tax") < 0)
                    | (F.col("l_tax") > 1),
                    1,
                ).otherwise(0)
            ),
            F.lit(0),
        ).alias("tax_bad"),
    ).selectExpr(
        """stack(2,
             'lineitem.discount_in_[0,1]', n, disc_bad,
             'lineitem.tax_in_[0,1]', n, tax_bad
           ) AS (rule, n_checked, n_violations)"""
    )
    joined = (
        load(spark, sf, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .join(
            load(spark, sf, "orders").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .agg(
            F.lit("lineitem.shipdate>=orderdate").alias("rule"),
            F.count(F.lit(1)).alias("n_checked"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("l_shipdate").isNull()
                        | F.col("o_orderdate").isNull()
                        | (F.col("l_shipdate") < F.col("o_orderdate")),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("n_violations"),
        )
    )
    return docs.unionByName(li).unionByName(joined)
