"""Deduplication operators (SURVEY §2.C D1/D2) — designed for 100 TB.

* **Exact** (D1): content hash (`sha2`) + groupBy — one shuffle on the
  hash, map-side partial aggregation, no driver state.
* **N-gram Jaccard** (D2, exact verification path): shingle → explode →
  self-join on shingle → pair counts. Exact but the shingle join can
  explode on hot shingles — at scale this runs AFTER LSH candidate
  pruning; here it doubles as the SQL-checkable oracle for near-dup
  semantics.
* **MinHash + LSH banding** (D2, scale path): signatures via an
  Arrow-batched pandas UDF, candidate pairs via groupBy(band, hash) —
  shuffle volume is O(docs × bands), never O(docs²). All hash
  parameters are fixed constants → fully deterministic.
* **SimHash** (D2): 64-bit fingerprints; near-dup = small Hamming
  distance, bucketed by 16-bit chunks (same banding idea).

CRC32 is the token hash everywhere: stable across Python/JVM runs,
cheap, and vectorizable in numpy.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load

# -- fixed MinHash parameters (deterministic across runs) --------------
# 31-bit Mersenne prime keeps (a·x + b) inside int64 → pure vectorized
# numpy, no object math. Collision probability 2^-31 per slot is far
# below MinHash's own estimation error.
_MERSENNE = (1 << 31) - 1
_N_PERM = 64
_LSH_BANDS = 16
_LSH_ROWS = _N_PERM // _LSH_BANDS
_rng = np.random.RandomState(42)
_PERM_A = _rng.randint(1, _MERSENNE, size=_N_PERM, dtype=np.int64)
_PERM_B = _rng.randint(0, _MERSENNE, size=_N_PERM, dtype=np.int64)


@query(
    "d1_exact_dedup",
    oracle="""
    SELECT sha256(text) AS content_hash,
           COUNT(*) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_id
    FROM documents
    GROUP BY sha256(text)
    """,
)
def d1_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """D1: exact dedup via SHA-256 content hash.

    Scale: the only shuffle is on the 256-bit hash (uniform, no skew);
    `min(doc_id)` picks the canonical survivor deterministically.
    """
    d = load(spark, sf, "documents")
    return (
        d.withColumn("content_hash", F.sha2("text", 256))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper_id"),
        )
    )


# Shingle document-frequency cap (standard MinHash practice): a shingle
# appearing in more than this many documents is boilerplate, carries no
# dedup signal, and — crucially — is a quadratic hot key in the shingle
# self-join (one shingle in K docs → K² candidate pairs on ONE join
# key). Dropping it from the representation (sizes AND intersection, so
# Jaccard stays internally consistent) bounds every join key to
# ≤ _MAX_SHINGLE_DF rows. Applied identically in the DuckDB oracles.
_MAX_SHINGLE_DF = 256


# Documents with fewer than 3 tokens have no 3-gram: both engines must
# drop them BEFORE shingling. (Spark's sequence(1, size-2) turns
# DESCENDING for size<3 and indexes past the array — an ANSI crash —
# while DuckDB's range() just returns empty: a silent oracle divergence
# without the shared guard.)
_SHINGLE_SQL_CTES = """
    tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
            WHERE len(string_split(text, ' ')) >= 3),
    sh_all AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM tok, UNNEST(range(1, len(t) - 1)) AS u(i))"""


def raw_shingles(docs: DataFrame) -> DataFrame:
    """Uncapped distinct 3-gram shingles per document —
    ``docs(doc_id, text)`` → ``(doc_id, s)``; sub-3-token docs dropped
    (see :data:`_SHINGLE_SQL_CTES`, the matching oracle CTE chain)."""
    return (
        docs.withColumn("t", F.split("text", " "))
        .filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 2),"
                    " i -> concat_ws(' ', t[i-1], t[i], t[i+1]))"
                )
            ).alias("s"),
        )
        .distinct()
    )


def shingle_ctes(max_df: int = _MAX_SHINGLE_DF) -> str:
    """DuckDB CTE chain producing the capped shingle set ``sh(doc_id, s)``
    plus per-doc sizes — shared by the Jaccard and clustering oracles so
    both engines cut hot shingles at the identical threshold."""
    return f"""{_SHINGLE_SQL_CTES},
    hot AS (SELECT s FROM sh_all GROUP BY s HAVING COUNT(*) > {max_df}),
    sh AS (
      SELECT a.doc_id, a.s FROM sh_all a
      WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.s = a.s)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)"""


def shingle_sets(docs: DataFrame, max_df: int = _MAX_SHINGLE_DF) -> DataFrame:
    """Distinct 3-gram shingles per document with the DF cap applied.

    ``docs(doc_id, text)`` → ``(doc_id, s)``. The hot-shingle list is
    tiny (only shingles with df > max_df) so the anti-join broadcasts;
    after it, no shingle key carries more than ``max_df`` rows into any
    downstream self-join.
    """
    shingles = raw_shingles(docs)
    hot = (
        shingles.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("s")
    )
    return shingles.join(F.broadcast(hot), "s", "left_anti")


def capped_shingles(spark: SparkSession, sf: str) -> DataFrame:
    """THE shared DF-capped shingle frame ``(doc_id, s)`` for ``sf``,
    ``bounded_persist``-ed under one slot.

    r13 (guide §5.3): d2_ngram_jaccard referenced its unpersisted
    shingle frame 4× (sizes + both self-join sides), d2_editdist_verify
    2×, and lsh_verified_pairs / the d8 fuzzy decontaminator each built
    a private copy under separate slots — every reference re-ran the
    explode + distinct + DF-cap anti-join. One canonical plan (docs
    spread across cores first — the single-file parquet arrives as one
    split) persisted once now serves every consumer; all consumers are
    aggregates/joins over the set, so partitioning never changes
    results."""
    from event_streamer_spark.caching import bounded_persist

    docs = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return bounded_persist(
        shingle_sets(docs.select("doc_id", "text")), "dedup.shingle_sets"
    )


@query(
    "d2_ngram_jaccard",
    oracle=f"""
    WITH {shingle_ctes()},
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS both
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT i.doc_a, i.doc_b,
           ROUND(CAST(i.both AS DOUBLE) / (sa.n + sb.n - i.both), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.both AS DOUBLE) / (sa.n + sb.n - i.both) >= 0.1
    """,
)
def d2_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """D2 (exact path): 3-gram shingle Jaccard similarity ≥ 0.1, over the
    DF-capped shingle representation (see :data:`_MAX_SHINGLE_DF`).

    Pure DataFrame composition: shingle (sequence+transform), explode,
    DF cap (broadcast anti-join), self-join on shingle, pair-count
    aggregation. The cap bounds every self-join key to ≤ 256 rows, so
    no boilerplate trigram can go quadratic; at 100 TB this exact join
    additionally runs only on LSH candidate pairs (see d2_minhash_lsh).
    """
    shingles = capped_shingles(spark, sf)
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("both"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jacc = F.col("both").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("both")
    )
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jacc >= 0.1)
        .select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))
    )


_EDITDIST_MIN_SHINGLES = 5
_EDITDIST_MIN_SIM = 0.9


@query(
    "d2_editdist_verify",
    oracle=f"""
    WITH {shingle_ctes()},
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS cnt
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    cand AS (SELECT doc_a, doc_b FROM inter
             WHERE cnt >= {_EDITDIST_MIN_SHINGLES}),
    scored AS (
      SELECT c.doc_a, c.doc_b,
             CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
             GREATEST(LENGTH(da.text), LENGTH(db.text)) AS max_len
      FROM cand c
      JOIN documents da ON da.doc_id = c.doc_a
      JOIN documents db ON db.doc_id = c.doc_b)
    SELECT doc_a, doc_b, edit_dist,
           ROUND(1.0 - CAST(edit_dist AS DOUBLE) / max_len, 6) AS sim
    FROM scored
    WHERE 1.0 - CAST(edit_dist AS DOUBLE) / max_len
          >= {_EDITDIST_MIN_SIM}
    """,
)
def d2_editdist_verify(spark: SparkSession, sf: str) -> DataFrame:
    """D2 (exact verify path): edit-distance near-dup confirmation —
    shingle-overlap candidate pruning, then Levenshtein ONLY on the
    surviving pairs.

    The O(len²) distance never touches the corpus cross product: the
    DF-capped shingle self-join (same machinery as d2_ngram_jaccard —
    no key carries more than 256 rows) nominates pairs sharing ≥5
    shingles, and the quadratic work runs per-candidate. Both engines'
    ``levenshtein`` agree exactly (probed: unit insert/delete/replace
    and empty-string edges), so the similarity
    ``1 − dist / max(len)`` is an exact oracle, unlike the estimate
    legs. At 100 TB the candidate count is bounded by the banding /
    DF-cap geometry, not the corpus size squared.
    """
    docs = load(spark, sf, "documents")
    shingles = capped_shingles(spark, sf)
    a = shingles.alias("a")
    b = shingles.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= _EDITDIST_MIN_SHINGLES)
        .select("doc_a", "doc_b")
    )
    ta = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a")
    )
    tb = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b")
    )
    scored = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("text_a", "text_b").cast("long").alias(
                "edit_dist"
            ),
            F.greatest(
                F.length("text_a"), F.length("text_b")
            ).alias("max_len"),
        )
    )
    sim = F.lit(1.0) - F.col("edit_dist").cast("double") / F.col("max_len")
    return scored.filter(sim >= _EDITDIST_MIN_SIM).select(
        "doc_a", "doc_b", "edit_dist", F.round(sim, 6).alias("sim")
    )


def _minhash_signatures(df: DataFrame) -> DataFrame:
    """doc_id → (sig array<long>, bands array<long>) in ONE Arrow pass.

    CRC32 shingle hashes, then min((a·x + b) mod p) per permutation —
    vectorized in numpy over the whole batch. The 16 per-band bucket
    hashes are folded from the signature inside the same UDF (a
    polynomial combine over each band's rows), saving the separate
    explode + hash(slice(...)) stage a two-pass design needs.
    """

    @pandas_udf("sig array<long>, bands array<long>")
    def minhash(texts: pd.Series) -> pd.DataFrame:
        sigs, bands = [], []
        with np.errstate(over="ignore"):
            for text in texts:
                toks = text.split(" ")
                shingle_hashes = np.unique(
                    np.fromiter(
                        (
                            zlib.crc32(" ".join(toks[i : i + 3]).encode()) % _MERSENNE
                            for i in range(max(len(toks) - 2, 1))
                        ),
                        dtype=np.int64,
                    )
                )
                # (n_perm, n_shingles) broadcast — stays < 2^62, pure int64
                sig = (
                    (shingle_hashes[None, :] * _PERM_A[:, None] + _PERM_B[:, None])
                    % _MERSENNE
                ).min(axis=1)
                # band bucket hash: polynomial fold of each band's rows
                # (int64 wraparound is deterministic)
                chunk = sig.reshape(_LSH_BANDS, _LSH_ROWS)
                bh = chunk[:, 0].copy()
                for r in range(1, _LSH_ROWS):
                    bh = bh * np.int64(1_000_003) + chunk[:, r]
                sigs.append(sig.tolist())
                bands.append(bh.tolist())
        return pd.DataFrame({"sig": sigs, "bands": bands})

    # NULL text has no shingles and no defined signature: exclude the
    # row rather than crash the Arrow batch (round-9 dirty corpus).
    # Matches the SQL legs, whose string_split(NULL) emits no shingle
    # rows. Empty text keeps its single degenerate shingle (max(len-2,
    # 1) below) — a deterministic signature, harmless in banding.
    return (
        df.filter(F.col("text").isNotNull())
        .select("doc_id", minhash("text").alias("m"))
        .select("doc_id", "m.sig", "m.bands")
    )


@query(
    "d2_minhash_lsh",
    oracle=None,  # estimates not SQL-expressible; recall pinned by the twin
    covered_by="d2_minhash_lsh_check",
)
def d2_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """D2 (scale path): MinHash + LSH banding near-dup candidates.

    16 bands × 4 rows: P(candidate) ≈ 1-(1-j⁴)¹⁶ — steep around j≈0.5.
    Shuffles: one on (band, band_hash) to form buckets, one self-join on
    bucket, one groupBy pair. All O(docs × bands); no O(n²) stage, no
    driver-side state. Deterministic: fixed permutations + CRC32.
    """
    # single-file parquet arrives as ONE partition — spread the UDF work
    # across cores (at real scale the source has many splits already)
    docs = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # signatures feed three consumers (banding + both join sides): persist
    # so the pandas UDF runs once per row, not three times; bounded to
    # one live frame across calls (see caching.bounded_persist)
    from event_streamer_spark.caching import bounded_persist

    # uncompressed: the signature arrays are uniform hashes (no codec
    # wins) and the first build sits on the cold path (see bounded_persist)
    sigs = bounded_persist(
        _minhash_signatures(docs),
        "dedup.minhash_sigs",
        columnar_compressed=False,
    )

    bands = sigs.select(
        "doc_id", F.posexplode("bands").alias("band", "bh")
    )

    # r14 (guide §2.1/§2.4 — the graph-wedge pattern): bucket members
    # collect into ONE sorted array per (band, bh) and pairs expand with
    # JVM-side generators in canonical doc_a < doc_b order — the former
    # band self-join exploded + exchanged the bands frame TWICE and
    # paid a join to emit the identical pair set (collect_set dedups a
    # re-keyed doc_id inside a bucket exactly as the a.doc_id < b.doc_id
    # predicate did; pair fan-out per bucket is C(|bucket|, 2) either
    # way). Interleaved sf1 A/B: steady 2.45 → 1.71 s, build
    # 9.0 → 7.9 s; byte-identical outputs at 3 SFs + hostile corpus.
    cand = (
        bands.groupBy("band", "bh")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.posexplode("ids").alias("i", "doc_a"), "ids")
        .select(
            "doc_a",
            F.explode(F.expr("slice(ids, i + 2, size(ids))")).alias(
                "doc_b"
            ),
        )
        .distinct()
    )

    # NOTE: measured A/B — an explicit broadcast of the UDF-derived
    # signature table is SLOWER and high-variance here (driver-side
    # collect races the cache); the shuffled joins on the persisted
    # signatures are stable. AQE still picks broadcast when warranted.
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = F.expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v))"
    ).cast("double") / F.lit(float(_N_PERM))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(est, 6).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= 0.25)
    )


def lsh_verified_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """D2 (the composed 100 TB pipeline): EXACT n-gram Jaccard computed
    ONLY on MinHash-LSH candidate pairs. (Raw pair frame — the
    registered ``d2_lsh_verified`` wraps it in the round-10 bounded
    recall check; tests call this directly.)

    This is the shape a petabyte dedup actually runs: LSH banding
    prunes the O(n²) pair space to O(docs × bands) candidates, then the
    exact shingle-intersection verification — the same semantics as
    ``d2_ngram_jaccard`` — runs per candidate pair instead of through
    an all-pairs self-join. Joins: candidates ⨝ doc_a's shingles keyed
    on doc id, then keyed on (doc_b, shingle) to count the
    intersection; every key is either a doc id (uniform) or a
    (doc, shingle) pair (DF-capped) — no hot keys, no quadratic stage.
    Exactness on the surviving pairs is asserted against
    ``d2_ngram_jaccard`` in ``tests/test_dedup_quality.py``.
    """
    from event_streamer_spark.caching import bounded_persist

    docs = load(spark, sf, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    sigs = bounded_persist(
        _minhash_signatures(docs), "dedup.lsh_verified_sigs"
    )
    bands = sigs.select("doc_id", F.posexplode("bands").alias("band", "bh"))
    a = bands.alias("a")
    b = bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    shingles = capped_shingles(spark, sf)
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sh_a = shingles.select(F.col("doc_id").alias("doc_a"), "s")
    sh_b = shingles.select(F.col("doc_id").alias("doc_b"), "s")
    inter = (
        cands.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("both"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jacc = F.col("both").cast("double") / (
        F.col("na") + F.col("nb") - F.col("both")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jacc >= 0.1)
        .select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))
    )


def _exact_strong_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact all-pairs Jaccard ≥ 0.5 pair set (doc_a, doc_b) — the
    recall denominator shared by both bounded-check wrappers; persisted
    (tiny: strong pairs only) so each wrapper's two references and the
    twin query share ONE materialization of the all-pairs subtree."""
    from event_streamer_spark.caching import bounded_persist

    return bounded_persist(
        d2_ngram_jaccard(spark, sf)
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b"),
        "dedup.exact_strong_pairs",
    )


@query(
    "d2_lsh_verified",
    oracle=f"""
    WITH {shingle_ctes()},
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS both
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_strong, TRUE AS recall_ok
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.both AS DOUBLE) / (sa.n + sb.n - i.both) >= 0.5
    """,
)
def d2_lsh_verified(spark: SparkSession, sf: str) -> DataFrame:
    """D2 composed pipeline registered as a BOUNDED-CHECK oracle query
    (round-10, b13-style): the LSH-pruned-then-exactly-verified pair
    set (:func:`lsh_verified_pairs`) is scored against the exact
    all-pairs Jaccard set in the HIGH-similarity regime (j ≥ 0.5 —
    where 16×4-band MinHash recall is analytically ≈ 0.97 and a real
    dedup cares about every pair), emitting the exact strong-pair
    count as a hash-checked column plus a recall ≥ 0.9 boolean.
    Exactness of the emitted Jaccard VALUES (precision leg) is pinned
    separately in ``tests/test_dedup_quality.py`` — every emitted pair
    re-computes the exact shingle intersection, so false positives
    are impossible by construction. Low-similarity pairs (0.1 ≤ j <
    0.5) are deliberately outside the bound: banded LSH misses them BY
    DESIGN (the S-curve), so a hard floor there would pin seed noise,
    not a regression.
    """
    found = lsh_verified_pairs(spark, sf).filter(
        F.col("jaccard") >= 0.5
    ).select("doc_a", "doc_b")
    # the exact strong-pair set feeds two consumers here AND the
    # d2_minhash_lsh_check twin (identical plan → shared slot): persist
    # the tiny pair frame instead of re-running the all-pairs subtree
    # per reference (r13, guide §5.3)
    exact = _exact_strong_pairs(spark, sf)
    hits = found.join(exact, ["doc_a", "doc_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    tot = exact.agg(F.count(F.lit(1)).alias("n_exact_strong"))
    return tot.crossJoin(F.broadcast(hits)).select(
        F.col("n_exact_strong").cast("bigint").alias("n_exact_strong"),
        (
            F.col("n_hit")
            >= F.lit(0.9) * F.col("n_exact_strong")
        ).alias("recall_ok"),
    )


@query(
    "d2_minhash_lsh_check",
    oracle=f"""
    WITH {shingle_ctes()},
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS both
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_strong, TRUE AS recall_ok
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.both AS DOUBLE) / (sa.n + sb.n - i.both) >= 0.5
    """,
)
def d2_minhash_lsh_check(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded-check wrapper for the BENCH-HEADLINER ``d2_minhash_lsh``
    (VERDICT r10 #2 — the raw estimated-Jaccard pair set can never
    hash-match an exact engine, but its RECALL against the exact
    strong-pair set can): the headliner's own output — the PLAN IS
    :func:`d2_minhash_lsh` verbatim, so the benched query stays
    byte-identical and this non-headliner wrapper only adds the
    comparison tail — is scored against exact all-pairs Jaccard in the
    j ≥ 0.5 regime (16×4-band analytic recall ≈ 0.97), emitting the
    exact strong-pair count (hash-checked vs DuckDB) plus a
    recall ≥ 0.9 boolean. A drop in MinHash quality (permutation bug,
    banding bug, estimator bias past the 0.25 est-filter) flips the
    boolean; rows-only checking could never see it."""
    found = d2_minhash_lsh(spark, sf).select("doc_a", "doc_b")
    exact = _exact_strong_pairs(spark, sf)  # shared slot, see d2_lsh_verified
    hits = found.join(exact, ["doc_a", "doc_b"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    tot = exact.agg(F.count(F.lit(1)).alias("n_exact_strong"))
    return tot.crossJoin(F.broadcast(hits)).select(
        F.col("n_exact_strong").cast("bigint").alias("n_exact_strong"),
        (
            F.col("n_hit")
            >= F.lit(0.9) * F.col("n_exact_strong")
        ).alias("recall_ok"),
    )


@query("d2_simhash", oracle=None)  # bit manipulation → rows-only check
def d2_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """D2: 64-bit SimHash fingerprints + 16-bit chunk buckets.

    Near-dup docs differ in few bits; bucketing each 16-bit chunk gives
    LSH-style candidate recall for Hamming distance ≤ 3 (pigeonhole).
    Output: per-doc fingerprint + chunk values (deterministic).
    """

    @pandas_udf("long")
    def simhash(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            toks = text.split(" ")
            hashes = np.fromiter(
                (zlib.crc32((t + " " + u).encode()) for t, u in zip(toks, toks[1:])),
                dtype=np.uint64,
                count=max(len(toks) - 1, 0),
            )
            if len(hashes) == 0:
                out[i] = 0
                continue
            # widen to 64 bits deterministically: h64 = h32 * PRIME ^ h32
            h64 = (hashes * np.uint64(0x9E3779B97F4A7C15)) ^ hashes
            bits = ((h64[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            )
            votes = (2 * bits - 1).sum(axis=0)
            fp = np.uint64(0)
            for bit in np.nonzero(votes > 0)[0]:
                fp |= np.uint64(1) << np.uint64(bit)
            out[i] = np.int64(fp.astype(np.int64))
        return pd.Series(out)

    # NULL text has no fingerprint: exclude rather than crash the Arrow
    # batch (round-9 dirty corpus), matching _minhash_signatures
    d = load(spark, sf, "documents").filter(F.col("text").isNotNull())
    fp = d.select("doc_id", simhash("text").alias("fingerprint"))
    chunks = F.expr(
        "transform(sequence(0, 3), i -> (fingerprint >> (i*16)) & 65535)"
    )
    return fp.select(
        "doc_id",
        "fingerprint",
        chunks.getItem(0).alias("chunk0"),
        chunks.getItem(1).alias("chunk1"),
        chunks.getItem(2).alias("chunk2"),
        chunks.getItem(3).alias("chunk3"),
    )


@query(
    "d4_ngram_novelty",
    oracle=f"""
    WITH {_SHINGLE_SQL_CTES},
    df AS (SELECT s, COUNT(*) AS df FROM sh_all GROUP BY s)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           ROUND(CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS novelty
    FROM sh_all JOIN df USING (s)
    GROUP BY doc_id
    """,
)
def d4_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """D4: n-gram novelty — the fraction of a document's distinct
    3-gram shingles that appear in NO other document. Low novelty flags
    near-boilerplate / heavily-duplicated text (the complement of the
    D2 dedup signals, usable as a quality filter on its own).

    Scale: the shingle document-frequency table is shingle-vocab-sized;
    the join strategy is left to AQE (broadcast when small, shuffle on
    the shingle otherwise — the same heavy-tail argument as
    d4_unigram_logprob). Both aggregates are map-side partial; the
    per-doc fraction is an exact integer ratio rounded once.
    """
    sh_all = raw_shingles(load(spark, sf, "documents"))
    df_tbl = sh_all.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh_all.join(df_tbl, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.round(
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("novelty"),
        )
    )


# -- longest duplicated token span (suffix-dedup shape) ----------------

_SPAN_LEVELS = (4, 8, 16, 32)

# The span operators reconstruct token SEQUENCES via (doc_id, pos)
# windows, so they REQUIRE a unique document identity — their real
# pipelines run after exact dedup. A conflicting duplicate doc_id (two
# texts under one id — the round-10 seed-20260817 CDC corruption class)
# otherwise interleaves both copies' equal positions in an
# engine-arbitrary tie order and the span hashes diverge. Both engines
# canonicalize identically: keep the MIN(text) copy per doc_id
# (NULLS LAST), pinned here as a shared CTE + helper.
_UNIQ_DOCS_CTE = """uniq AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY text NULLS LAST) AS __rn
        FROM documents) WHERE __rn = 1)"""


def unique_docs(spark: SparkSession, sf: str) -> DataFrame:
    """One canonical ``(doc_id, text)`` row per doc_id — the Spark side
    of :data:`_UNIQ_DOCS_CTE` (see the comment above)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("text").asc_nulls_last()
    )
    return (
        load(spark, sf, "documents")
        .select("doc_id", "text")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


@query(
    "d1_max_dup_span",
    oracle=f"""
    WITH {_UNIQ_DOCS_CTE},
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM uniq),
    tok AS (
      SELECT doc_id, i AS pos, toks[i] AS h
      FROM t, UNNEST(range(1, len(toks) + 1)) u(i)),
    h2 AS (SELECT doc_id, pos, md5(h || '|' || lead(h, 1) OVER w) AS h
           FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    h4 AS (SELECT doc_id, pos, md5(h || '|' || lead(h, 2) OVER w) AS h
           FROM h2 WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    h8 AS (SELECT doc_id, pos, md5(h || '|' || lead(h, 4) OVER w) AS h
           FROM h4 WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    h16 AS (SELECT doc_id, pos, md5(h || '|' || lead(h, 8) OVER w) AS h
            FROM h8 WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    h32 AS (SELECT doc_id, pos, md5(h || '|' || lead(h, 16) OVER w) AS h
            FROM h16 WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    lv AS (
      SELECT 4 AS span_len, doc_id, h FROM h4 WHERE h IS NOT NULL
      UNION ALL SELECT 8, doc_id, h FROM h8 WHERE h IS NOT NULL
      UNION ALL SELECT 16, doc_id, h FROM h16 WHERE h IS NOT NULL
      UNION ALL SELECT 32, doc_id, h FROM h32 WHERE h IS NOT NULL),
    dup AS (
      SELECT span_len, h FROM lv GROUP BY span_len, h HAVING COUNT(*) >= 2)
    SELECT lv.doc_id, CAST(MAX(lv.span_len) AS BIGINT) AS max_dup_span
    FROM lv JOIN dup ON lv.span_len = dup.span_len AND lv.h = dup.h
    GROUP BY lv.doc_id
    """,
)
def d1_max_dup_span(spark: SparkSession, sf: str) -> DataFrame:
    """D1: longest duplicated token span per document — the signal the
    suffix-array dedup pipelines (Lee et al. 2022, "Deduplicating
    Training Data Makes LMs Better") remove: text whose 32-token spans
    appear verbatim elsewhere is memorization fuel.

    Exact suffix arrays don't distribute; the published-scale rewrite
    is HASH DOUBLING: the hash of a 2L-span is md5(h_L(pos),
    h_L(pos+L)), so levels 4→8→16→32 each cost ONE per-doc window
    (partitioned by doc_id — bounded, skew-free, and Catalyst reuses
    a single sort for the whole lead chain) instead of re-tokenizing.
    A span is duplicated iff its hash occurs ≥2 times corpus-wide (any
    doc, any position — self-repeats ARE duplication, as in the
    paper); per-level occurrence counting shuffles on the uniform
    hash. Reported value: the largest checked level with a duplicated
    span (levels {4,8,16,32} — monotone, since an L-dup contains
    L/2-dups).
    """
    from pyspark.sql import Window

    toks = (
        unique_docs(spark, sf)
        .select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "h")
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "h")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    # ONE lineage for every level: each doubling step rewrites h and
    # snapshots the levels we report as named columns, so the four
    # Window operators share a single per-doc sort (identical
    # partition/order spec) instead of one chain per level branch —
    # plan-pinned in tests/test_plans.py
    cur = toks
    for step in (1, 2, 4, 8, 16):
        cur = cur.withColumn(
            "h", F.md5(F.concat(F.col("h"), F.lit("|"), F.lead("h", step).over(w)))
        )
        if 2 * step in _SPAN_LEVELS:
            cur = cur.withColumn(f"h{2 * step}", F.col("h"))
    stack = ", ".join(f"{n}L, h{n}" for n in _SPAN_LEVELS)
    lv = (
        cur.select(
            "doc_id",
            F.expr(
                f"stack({len(_SPAN_LEVELS)}, {stack}) AS (span_len, h)"
            ),
        )
        .filter(F.col("h").isNotNull())
    )
    from event_streamer_spark.caching import bounded_persist

    lv = bounded_persist(lv, "d1_max_dup_span_lv")
    dup = (
        lv.groupBy("span_len", "h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("span_len", "h")
    )
    return (
        lv.join(dup, ["span_len", "h"])
        .groupBy("doc_id")
        .agg(F.max("span_len").cast("bigint").alias("max_dup_span"))
    )


_SCRUB_SPAN = 16  # tokens per scrubbed duplicated span


@query(
    "d1_span_scrub",
    oracle=f"""
    WITH {_UNIQ_DOCS_CTE},
    t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM uniq),
    tok AS (
      SELECT doc_id, i AS pos, toks[i] AS tok
      FROM t, UNNEST(range(1, len(toks) + 1)) u(i)),
    h2 AS (SELECT doc_id, pos, tok, md5(tok || '|' || lead(tok, 1) OVER w) AS h
           FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    h4 AS (SELECT doc_id, pos, tok, md5(h || '|' || lead(h, 2) OVER w) AS h
           FROM h2 WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    h8 AS (SELECT doc_id, pos, tok, md5(h || '|' || lead(h, 4) OVER w) AS h
           FROM h4 WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    h16 AS (SELECT doc_id, pos, tok, md5(h || '|' || lead(h, 8) OVER w) AS h
            FROM h8 WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    occ AS (SELECT doc_id, pos, h FROM h16 WHERE h IS NOT NULL),
    dup AS (SELECT h FROM occ GROUP BY h HAVING COUNT(*) >= 2),
    docc AS (SELECT occ.* FROM occ JOIN dup USING (h)),
    scrub AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
        FROM docc) WHERE rn > 1),
    covered AS (
      SELECT DISTINCT doc_id, pos + o AS pos
      FROM scrub, UNNEST(range(0, {_SCRUB_SPAN})) u(o)),
    kept AS (
      SELECT tok.doc_id, tok.pos, tok.tok
      FROM tok LEFT JOIN covered
        ON tok.doc_id = covered.doc_id AND tok.pos = covered.pos
      WHERE covered.doc_id IS NULL)
    SELECT d.doc_id,
           COALESCE(k.cleaned, '') AS cleaned,
           COALESCE(k.n_kept, 0) AS n_kept
    FROM uniq d
    LEFT JOIN (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS cleaned,
             CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM kept GROUP BY doc_id) k USING (doc_id)
    """,
)
def d1_span_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """D1: duplicated-span REMOVAL (the second half of the Lee et al.
    suffix dedup): every {16}-token span occurring ≥2 times corpus-wide
    keeps its FIRST occurrence (lexicographic (doc_id, pos)) and is
    scrubbed everywhere else; cleaned text is reassembled from the
    surviving tokens.

    Scale notes: hash doubling (one reused per-doc window sort, as in
    ``d1_max_dup_span``) builds the span hashes; the keeper per
    duplicated hash is a ``min(struct(doc_id, pos))`` aggregate —
    map-side combinable, so a pathological corpus where ONE span
    repeats 10^9 times still has no hot reducer (the oracle's
    ROW_NUMBER formulation is the same math, which DuckDB can afford
    at oracle scale). Coverage explode is ≤{16} rows per scrubbed
    occurrence; reassembly is a per-doc sort_array over bounded doc
    length. Fully-scrubbed docs survive as empty strings via the
    LEFT join from ``documents``.
    """
    from pyspark.sql import Window

    from event_streamer_spark.caching import bounded_persist

    # toks feeds BOTH the hash-doubling chain and the final anti-join;
    # persist it so the unique-docs window + posexplode run once per
    # invocation instead of twice (r13, guide §5.3)
    toks = bounded_persist(
        unique_docs(spark, sf)
        .select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok"),
        "d1_span_scrub_toks",
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    cur = toks.withColumn("h", F.col("tok"))
    for step in (1, 2, 4, 8):
        cur = cur.withColumn(
            "h",
            F.md5(F.concat(F.col("h"), F.lit("|"), F.lead("h", step).over(w))),
        )
    occ = cur.filter(F.col("h").isNotNull()).select("doc_id", "pos", "h")
    occ = bounded_persist(occ, "d1_span_scrub_occ")
    dup = (
        occ.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("h")
    )
    docc = occ.join(dup, "h")
    keepers = docc.groupBy("h").agg(
        F.min(F.struct("doc_id", "pos")).alias("k")
    ).select("h", F.col("k.doc_id").alias("doc_id"), F.col("k.pos").alias("pos"))
    scrub = docc.join(keepers, ["h", "doc_id", "pos"], "left_anti")
    covered = (
        scrub.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (_SCRUB_SPAN - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.expr(
                "transform(array_sort(collect_list(struct(pos, tok))),"
                " x -> x.tok)"
            ),
        ).alias("cleaned"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
    )
    # unique_docs keeps exactly one row per doc_id, so its doc_id set
    # IS the distinct doc_id set — the plain distinct prunes the scan
    # to one column and skips the per-doc window sort (r13, guide §2.3;
    # NULL-text docs must still emit ('', 0), so this cannot come from
    # toks, which drops them at the posexplode)
    return (
        load(spark, sf, "documents")
        .select("doc_id")
        .distinct()
        .join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cleaned", F.lit("")).alias("cleaned"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        )
    )


# -- Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS
# fingerprinting scheme) ------------------------------------------------

_WIN_K = 4   # word k-gram size
_WIN_W = 8   # winnowing window (positions); density ~= 2/(w+1)
# fingerprints seen in more than this many docs are stop-gram noise:
# excluded BEFORE the pair self-join (the shingle-DF-cap treatment)
_WIN_MAX_DF = 32

# hex13(md5(gram)) -> BIGINT, per engine (probed identical; same recipe
# as the KMV sketch hash)
_WIN_H_SPARK = (
    "CAST(conv(substr(md5(concat_ws(' ', slice(toks, j, {k}))), 1, 13),"
    " 16, 10) AS BIGINT)"
).format(k=_WIN_K)
_WIN_H_DUCK = (
    "list_reduce(list_transform(string_split(substr("
    "md5(array_to_string(list_slice(toks, j, j + {k} - 1), ' ')),"
    " 1, 13), ''),"
    " c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),"
    " (a, b) -> a * 16 + b)"
).format(k=_WIN_K)

_WINNOW_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
      SELECT doc_id, CAST(j AS BIGINT) AS pos, {_WIN_H_DUCK} AS h
      FROM t, UNNEST(range(1, len(toks) - {_WIN_K} + 2)) u(j)
      WHERE len(toks) >= {_WIN_K}),
    w AS (
      SELECT doc_id, pos,
             MIN({{'h': h, 'p': -pos}}) OVER (PARTITION BY doc_id
               ORDER BY pos ROWS BETWEEN {_WIN_W - 1} PRECEDING
               AND CURRENT ROW) AS sel
      FROM g),
    fp AS (
      SELECT DISTINCT doc_id, sel.h AS h
      FROM w WHERE pos >= {_WIN_W}),
    ok AS (
      SELECT h FROM fp GROUP BY h
      HAVING COUNT(*) <= {_WIN_MAX_DF}),
    fpc AS (SELECT fp.doc_id, fp.h FROM fp JOIN ok ON fp.h = ok.h)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fingerprints
    FROM fpc a JOIN fpc b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
"""


@query("d2_winnowing", oracle=_WINNOW_ORACLE)
def d2_winnowing(spark: SparkSession, sf: str) -> DataFrame:
    """D2: winnowing fingerprints (the MOSS scheme, Schleimer et al.
    SIGMOD'03) — doc pairs ranked by shared SELECTED k-gram hashes.
    Each document keeps only its windows' minimum hashes (rightmost on
    ties, the ``MIN(struct(h, -pos))`` spelling — probed identical on
    both engines), guaranteeing ~2/(w+1) density AND that any shared
    run of >= w+k-1 tokens shares a fingerprint — local fingerprinting
    with a detection guarantee, unlike fixed-stride span sampling
    (``d1_span_dedup``) which can stride past a match.

    Scale: grams explode per position but winnowing SHRINKS the stream
    ~4.5x before anything shuffles (the window min is computed within
    the per-doc sort, one shuffle on doc_id); the pair join runs on
    selected fingerprints only, with stop-gram fingerprints (doc
    frequency > {_WIN_MAX_DF}) excluded before the self-join — the
    same hot-key cap as the MinHash shingle join. The fingerprint set
    feeds the cap count and both join sides: persisted once.
    """
    from event_streamer_spark.caching import bounded_persist

    t = (
        load(spark, sf, "documents")
        .withColumn("toks", F.split("text", " "))
        .filter(F.size("toks") >= _WIN_K)
    )
    g = t.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {_WIN_K} + 1),"
                f" j -> named_struct('pos', CAST(j AS BIGINT),"
                f" 'h', {_WIN_H_SPARK}))"
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    from pyspark.sql import Window as W

    win = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(_WIN_W - 1), 0)
    )
    sel = F.min(
        F.struct(F.col("h").alias("h"), (-F.col("pos")).alias("p"))
    ).over(win)
    fp = bounded_persist(
        g.withColumn("sel", sel)
        .filter(F.col("pos") >= _WIN_W)
        .select("doc_id", F.col("sel.h").alias("h"))
        .distinct(),
        "dedup.winnow_fp",
    )
    ok = (
        fp.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _WIN_MAX_DF)
        .select("h")
    )
    fpc = fp.join(ok, "h")
    a, b = fpc.alias("a"), fpc.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fingerprints"))
    )
