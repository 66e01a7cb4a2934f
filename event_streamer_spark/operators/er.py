"""Entity resolution / record linkage (D18): multi-pass blocking →
per-field scored matching → survivorship golden records.

The classic large-scale data-integration workload the reference's users
run NEXT once events land in a warehouse: two sources describe the same
real-world entities with typos and missing fields; link them WITHOUT an
all-pairs comparison, score candidate pairs field-by-field
(Fellegi–Sunter-shaped additive agreement weights, integer arithmetic so
the result is hash-exact), and merge matched records into one golden
record per entity (survivorship).

Deterministic dirty-record fixture, derivable identically in Spark and
DuckDB SQL (same recipe style as the d14/d16 audit families):

- entity key = ``c_custkey``; two records per entity, one per source.
- ``f1`` (the "name"): source A holds ``md5(custkey)`` (32 hex chars,
  high entropy — adjacent custkeys differ in ~29 edit ops, probed, so
  cross-entity false matches are impossible at edit-distance 1);
  source B drops ONE character at position ``custkey % 32`` (a typo).
- ``f2`` (a secondary identifier): ``md5(custkey || 'x')``; source B
  loses it entirely when ``custkey % 5 = 0`` (missing field).
- ``f3``: the entity's nation key (always agrees — a low-weight field).

Multi-pass blocking (the recall trick real ER systems use): a record
enters TWO blocks — first-8 and last-8 chars of ``f1``. A single-char
deletion at position p preserves the prefix block iff p ≥ 8 and the
suffix block iff p ≤ 23, so the UNION of passes covers every p in
0..31 — single-pass blocking would silently lose ~25% of true matches.
Candidates found by both passes are deduplicated before scoring.

Scale posture: no all-pairs stage anywhere — candidates come from
equi-joins on block keys (md5 prefixes are uniform, so blocks stay
O(corpus/16^8) — no hot key); scoring is a projection; dedup and the
golden-record merge are one shuffle each on bounded keys. This is the
petabyte ER shape: blocking bounds the candidate set, verification
touches candidates only (same contract as d2_lsh_verified).

Reference parity note: the reference (comparaonline/event-streamer,
``src/``) has no relational/ER surface; this extends SURVEY §2.D's
training-data-pipeline mandate (dedup/linkage family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load

# Fellegi–Sunter-shaped additive agreement weights (integers: exact on
# both engines). f1 exact > f1 fuzzy >> f2 exact > f3; threshold set so
# (f1 fuzzy) alone matches but (f2 + f3) without f1 agreement does not.
_W_F1_EXACT = 60
_W_F1_FUZZY = 45  # levenshtein <= 1
_W_F2_EXACT = 30
_W_F3_EXACT = 10
_THRESHOLD = 45  # strictly above W_F2 + W_F3: f1 agreement is REQUIRED

# The shared fixture + blocking + scoring pipeline, written once in
# portable SQL: every construct below is pinned by the fuzz grammar's
# portability ledger (md5, substr, length, levenshtein, CASE, ||).
_RECORDS_SQL = """
    recs AS (
      SELECT c_custkey * 2 AS rec_id, 'A' AS src,
             md5(CAST(c_custkey AS STRING)) AS f1,
             md5(CAST(c_custkey AS STRING) || 'x') AS f2,
             c_nationkey AS f3
      FROM customer
      UNION ALL
      SELECT c_custkey * 2 + 1 AS rec_id, 'B' AS src,
             substr(md5(CAST(c_custkey AS STRING)), 1,
                    CAST(c_custkey % 32 AS INTEGER))
               || substr(md5(CAST(c_custkey AS STRING)),
                         CAST(c_custkey % 32 AS INTEGER) + 2) AS f1,
             CASE WHEN c_custkey % 5 = 0 THEN NULL
                  ELSE md5(CAST(c_custkey AS STRING) || 'x') END AS f2,
             c_nationkey AS f3
      FROM customer),
    keyed AS (
      SELECT rec_id, src, f1, f2, f3, 'p' AS pass,
             substr(f1, 1, 8) AS bkey FROM recs
      UNION ALL
      SELECT rec_id, src, f1, f2, f3, 's' AS pass,
             substr(f1, length(f1) - 7) AS bkey FROM recs),
    cand AS (
      SELECT DISTINCT a.rec_id AS rec_a, b.rec_id AS rec_b,
             a.f1 AS f1_a, b.f1 AS f1_b, a.f2 AS f2_a, b.f2 AS f2_b,
             a.f3 AS f3_a, b.f3 AS f3_b
      FROM keyed a JOIN keyed b
        ON a.bkey = b.bkey AND a.pass = b.pass
       AND a.src = 'A' AND b.src = 'B'),
    scored AS (
      SELECT rec_a, rec_b,
             CAST(levenshtein(f1_a, f1_b) AS BIGINT) AS f1_dist,
             CAST(CASE WHEN f1_a = f1_b THEN {w1e}
                       WHEN levenshtein(f1_a, f1_b) <= 1 THEN {w1f}
                       ELSE 0 END
                + CASE WHEN f2_a IS NOT NULL AND f2_a = f2_b
                       THEN {w2} ELSE 0 END
                + CASE WHEN f3_a = f3_b THEN {w3} ELSE 0 END
               AS BIGINT) AS score
      FROM cand)
""".format(w1e=_W_F1_EXACT, w1f=_W_F1_FUZZY, w2=_W_F2_EXACT, w3=_W_F3_EXACT)

_MATCH_SQL = f"""
    WITH {_RECORDS_SQL}
    SELECT rec_a, rec_b, f1_dist, score
    FROM scored WHERE score >= {_THRESHOLD}
"""

_GOLDEN_SQL = f"""
    WITH {_RECORDS_SQL},
    matches AS (
      SELECT rec_a, rec_b FROM scored WHERE score >= {_THRESHOLD}),
    members AS (
      SELECT m.rec_a AS entity_id, r.rec_id, r.f1, r.f2, r.f3
      FROM matches m JOIN recs r ON r.rec_id = m.rec_a
      UNION ALL
      SELECT m.rec_a AS entity_id, r.rec_id, r.f1, r.f2, r.f3
      FROM matches m JOIN recs r ON r.rec_id = m.rec_b)
    SELECT entity_id,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           MAX(CASE WHEN length(f1) = 32 THEN f1 END) AS golden_f1,
           MAX(f2) AS golden_f2,
           MIN(f3) AS golden_f3
    FROM members
    GROUP BY entity_id
"""


def synth_records(spark: SparkSession, sf: str) -> DataFrame:
    """The deterministic two-source dirty-record table (module
    docstring), UNPERSISTED — the raw input both the batch queries and
    the streaming linkage leg consume (the streaming tests replay this
    exact table through micro-batches)."""
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    a = c.selectExpr(
        "c_custkey * 2 AS rec_id",
        "'A' AS src",
        "md5(CAST(c_custkey AS STRING)) AS f1",
        "md5(CAST(c_custkey AS STRING) || 'x') AS f2",
        "c_nationkey AS f3",
    )
    b = c.selectExpr(
        "c_custkey * 2 + 1 AS rec_id",
        "'B' AS src",
        "substr(md5(CAST(c_custkey AS STRING)), 1,"
        " CAST(c_custkey % 32 AS INTEGER))"
        " || substr(md5(CAST(c_custkey AS STRING)),"
        " CAST(c_custkey % 32 AS INTEGER) + 2) AS f1",
        "CASE WHEN c_custkey % 5 = 0 THEN NULL"
        " ELSE md5(CAST(c_custkey AS STRING) || 'x') END AS f2",
        "c_nationkey AS f3",
    )
    return a.unionByName(b)


def blocking_keys(recs: DataFrame) -> DataFrame:
    """Multi-pass block keys for a records frame (rec_id, src, f1, f2,
    f3): each record enters the prefix-8 AND suffix-8 blocks — THE one
    copy of the blocking rule, shared by the batch queries and the
    streaming index so the two legs cannot drift."""
    return recs.selectExpr(
        "rec_id", "src", "f1", "f2", "f3",
        "'p' AS pass", "substr(f1, 1, 8) AS bkey",
    ).unionByName(
        recs.selectExpr(
            "rec_id", "src", "f1", "f2", "f3",
            "'s' AS pass", "substr(f1, length(f1) - 7) AS bkey",
        )
    )


def _records(spark: SparkSession, sf: str):
    """(recs, keyed) DataFrames, both ``bounded_persist``-ed: ``keyed``
    feeds BOTH sides of the candidate self-join and ``recs`` is read
    again by survivorship — unpersisted, Catalyst would inline the
    source scan at every reference (the plan-explosion gotcha; the SQL
    spelling of this module re-ran the scoring pipeline twice and
    scanned customer 12x, caught by plan audit)."""
    from event_streamer_spark.caching import bounded_persist

    recs = bounded_persist(synth_records(spark, sf), "er.recs")
    keyed = bounded_persist(blocking_keys(recs), "er.keyed")
    return recs, keyed


def score_pairs(a_keyed: DataFrame, b_keyed: DataFrame) -> DataFrame:
    """Blocked candidates (source-A keyed rows x source-B keyed rows on
    (block key, pass), deduplicated across passes) with per-field
    agreement scores — THE one copy of the match rule, shared by the
    batch queries and the streaming linkage (``streaming.er``)."""
    a = a_keyed.filter(F.col("src") == "A").alias("a")
    b = b_keyed.filter(F.col("src") == "B").alias("b")
    # Score BEFORE the cross-pass dedup (r13, guide §2.3 — shuffle fewer
    # bytes): the per-field scores are deterministic functions of the
    # joined fields, and a pair found by both passes carries IDENTICAL
    # fields, so distinct-on-scored-rows equals score-after-distinct —
    # but the distinct's exchange now moves (2 ids + 2 ints) instead of
    # six md5-width strings (~4× narrower rows). The duplicate pair's
    # levenshtein is computed twice pre-dedup; the 32-char compare is
    # codegen-cheap next to the saved shuffle bytes.
    cand = a.join(
        b,
        (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col("a.pass") == F.col("b.pass")),
    ).select(
        F.col("a.rec_id").alias("rec_a"),
        F.col("b.rec_id").alias("rec_b"),
        F.col("a.f1").alias("f1_a"),
        F.col("b.f1").alias("f1_b"),
        F.col("a.f2").alias("f2_a"),
        F.col("b.f2").alias("f2_b"),
        F.col("a.f3").alias("f3_a"),
        F.col("b.f3").alias("f3_b"),
    )
    return cand.selectExpr(
        "rec_a",
        "rec_b",
        "CAST(levenshtein(f1_a, f1_b) AS BIGINT) AS f1_dist",
        f"""CAST(CASE WHEN f1_a = f1_b THEN {_W_F1_EXACT}
                 WHEN levenshtein(f1_a, f1_b) <= 1 THEN {_W_F1_FUZZY}
                 ELSE 0 END
           + CASE WHEN f2_a IS NOT NULL AND f2_a = f2_b
                  THEN {_W_F2_EXACT} ELSE 0 END
           + CASE WHEN f3_a = f3_b THEN {_W_F3_EXACT} ELSE 0 END
          AS BIGINT) AS score""",
    ).distinct()


@query("d18_er_blocked_match", oracle=_MATCH_SQL)
def d18_er_blocked_match(spark: SparkSession, sf: str) -> DataFrame:
    """D18: record linkage — multi-pass blocked candidate generation
    (first-8/last-8 ``f1`` blocks, union, dedup) scored with additive
    per-field agreement weights; emit pairs at or above threshold.

    Catalyst plan: one equi-join on (block key, pass) over the
    persisted keyed table, a distinct on the pair, and a scoring
    projection — no cross join, no all-pairs stage. Blocking recall
    is structural: a deletion at position p survives the prefix pass
    iff p ≥ 8 and the suffix pass iff p ≤ 23, so the union covers all
    32 positions (module docstring).
    """
    _, keyed = _records(spark, sf)
    return score_pairs(keyed, keyed).filter(F.col("score") >= _THRESHOLD)


@query("d18_er_golden", oracle=_GOLDEN_SQL)
def d18_er_golden(spark: SparkSession, sf: str) -> DataFrame:
    """D18: survivorship — merge each matched pair's records into one
    golden record: ``f1`` from the untruncated source (length-32
    wins), ``f2`` from whichever record still has it (MAX over NULL),
    ``f3`` by MIN (all agree; MIN makes the rule total).

    The match list is referenced ONCE (explode of the pair, not a
    two-branch union — a second reference would re-run the whole
    blocked-scoring pipeline, plan-audited), then one hash join back
    to the persisted records table and one map-side-combinable
    groupBy on the entity id.
    """
    recs, keyed = _records(spark, sf)
    matches = score_pairs(keyed, keyed).filter(F.col("score") >= _THRESHOLD)
    members = matches.select(
        F.col("rec_a").alias("entity_id"),
        F.explode(F.array("rec_a", "rec_b")).alias("rec_id"),
    )
    return (
        members.join(recs, "rec_id")
        .groupBy("entity_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_records"),
            F.max(F.when(F.length("f1") == 32, F.col("f1"))).alias(
                "golden_f1"
            ),
            F.max("f2").alias("golden_f2"),
            F.min("f3").alias("golden_f3"),
        )
    )
