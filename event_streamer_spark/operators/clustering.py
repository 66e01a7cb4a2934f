"""Near-dup cluster resolution (D2 terminal step): connected components.

Candidate pairs (from `d2_ngram_jaccard`, or MinHash-LSH at scale) are
edges of an undirected graph; a "duplicate cluster" is a connected
component, and the canonical representative is the component's minimum
``doc_id``. The reference has no such operator (it has no joins at all,
SURVEY §2 "Not-implemented"); this is a north-star D2 op per BASELINE.

Spark design — iterative **min-label propagation with pointer jumping**:

* each round, a vertex takes ``min(own label, neighbors' labels)``
  (one shuffle join on the edge list), then follows its label one hop
  (``label := label(label)``, one self-join) — the pointer-jumping step
  makes convergence O(log diameter) rounds instead of O(diameter);
* all state is DataFrames — no driver-side graph, no ``collect()``;
  each round shuffles O(|E| + |V|), so 100 TB corpora are bounded by
  the edge list (which LSH keeps ~O(docs)), never O(docs²);
* deterministic: min() is order-insensitive, so partial-agg order and
  AQE re-planning can't change the fixpoint.

The DuckDB oracle computes the same fixpoint via a recursive CTE
(min reachable vertex), so the iterative Spark loop is hash-checked
against a closed-form transitive closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streamer_spark.operators.dedup import d2_ngram_jaccard, shingle_ctes
from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load

_CLUSTER_THRESHOLD = 0.3

# Jaccard-pair CTE chain shared by both oracles (same DF-capped shingle
# and threshold semantics as d2_ngram_jaccard's oracle, pinned at >= 0.3
# on the 6-decimal-rounded score so both engines cut at identical values).
_PAIRS_CTES = f"""
    {shingle_ctes()},
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS both
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    pairs AS (
      SELECT doc_a, doc_b
      FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
                   JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE ROUND(CAST(i.both AS DOUBLE) / (sa.n + sb.n - i.both), 6)
            >= {_CLUSTER_THRESHOLD}),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM pairs),
    reach(u, r) AS (
      SELECT u, v AS r FROM edges
      UNION
      SELECT e.u, r.r FROM edges e JOIN reach r ON r.u = e.v),
    minreach AS (
      SELECT u AS doc_id, MIN(r) AS min_r FROM reach GROUP BY u)
"""

# DISTINCT doc identities on both engines (round-9 dirty corpus:
# duplicated doc_id rows fanned the Spark-side joins while the oracle's
# per-distinct minreach did not — one cluster row per IDENTITY is the
# declared semantics; the dedup family exists for dirty corpora)
_CLUSTERS_SQL = f"""
    WITH RECURSIVE {_PAIRS_CTES}
    SELECT d.doc_id,
           CAST(COALESCE(LEAST(m.doc_id, m.min_r), d.doc_id) AS BIGINT)
             AS cluster_id
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN minreach m USING (doc_id)
"""

_CORPUS_SQL = f"""
    WITH RECURSIVE {_PAIRS_CTES},
    labeled AS (
      SELECT d.doc_id, d.lang, d.source, d.n_chars,
             COALESCE(LEAST(m.doc_id, m.min_r), d.doc_id) AS cluster_id
      FROM (SELECT DISTINCT doc_id, lang, source, n_chars
            FROM documents) d
      LEFT JOIN minreach m USING (doc_id))
    SELECT doc_id, lang, source, n_chars
    FROM labeled WHERE doc_id = cluster_id
"""


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_rounds: int = 25,
    checkpoint_every: int = 6,
) -> DataFrame:
    """(id) × (u, v) → (id, label): label = min vertex id of the component.

    Min-label propagation with pointer jumping. ``edges`` is consumed
    ONCE (r13): the symmetrized edge frame is persisted here and every
    round's neighbor join reads that cache, so callers need not persist
    their edge subtree. Rounds are O(log diameter); each round is two
    shuffle joins sized by |E| and |touched| — the loop runs over EDGE
    ENDPOINTS only (r13, guide §2.3): a vertex in no edge can never
    receive a candidate label, so singletons — the overwhelming bulk of
    a near-dup corpus at scale — ride zero rounds and self-label in one
    final left join instead of shuffling through every iteration.
    Edge endpoints must be a subset of ``vertices`` (true for every
    caller: edges derive from the same table as the vertex set).

    Label-table ``localCheckpoint()`` cadence is ADAPTIVE (r14, VERDICT
    #8): each round references ``stepped`` twice (the pointer-jump
    self-join) and ``labels`` twice, so the un-truncated logical plan
    grows ~4× PER ROUND — on a 4,096-vertex chain the r13 every-10
    cadence degraded round walls 3.4 → 20.7 s by round 3, and a
    32,768-vertex chain OOMed the driver on plan state alone. But an
    unconditional per-round checkpoint costs a label-table
    materialization that slows the shallow fixture graphs (≤5 rounds)
    ~40-60 % steady (measured, OPTIMIZATION_r14.md). So the trigger is
    the plan-growth SYMPTOM: checkpoint when a round's wall exceeds
    1.5× the fastest round since the last checkpoint (growth shows as
    ≥4× within two rounds, far above box noise's cost of a spurious
    ~0.1-0.7 s checkpoint), with ``checkpoint_every`` as a hard cap
    (4^6 ≈ 4k-node plans stay comfortably inside Catalyst's budget).
    Shallow graphs never trigger and keep the r13 fixture speed; deep
    chains flatten at the every-1-to-2 cadence the growth itself
    selects.
    """
    import time as _time
    # r13 (guide §2.4/§2.5): symmetrize ONCE into an edge frame that is
    # explode-built (a two-branch union would inline the caller's edge
    # subtree per branch) — the per-round joins below scan this cached
    # frame instead of re-deriving it. bounded_persist, not a raw
    # persist: the slot is shared by every CC consumer in a session
    # (d2_dup_clusters → d13_leakage_safe_split → d2_dedup_corpus all
    # walk the SAME pair pipeline), it survives repeat invocations
    # (sameSemantics keeps the materialized entry), and a different
    # edge source evicts it instead of leaking (the old code persisted
    # the caller's edge frame and never released it).
    from event_streamer_spark.caching import bounded_persist

    sym = bounded_persist(
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("u"), F.col("v")),
                    F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                )
            ).alias("e")
        ).select("e.u", "e.v"),
        "cc.sym",
    )
    # localCheckpoint truncates the edge-derivation lineage (guide §3.3
    # / §5.4): without it every round's plan embeds the caller's whole
    # pair-pipeline subtree twice (via sym and via the touched vertex
    # set) and Catalyst re-optimizes that growing tree per round —
    # measured 3× slower rounds at sf0.1. The slot above still dedups
    # the materialization across CC consumers; the checkpoint is one
    # cache-to-cache copy of the edge-sized frame per call.
    sym = sym.localCheckpoint()
    # sym holds both directions, so its u column covers every endpoint
    touched = sym.select(F.col("u").alias("id")).distinct()
    labels = touched.select("id", F.col("id").alias("label")).persist()
    cached = labels  # the persisted frame backing `labels` (for release)
    base_wall: float | None = None  # fastest round since last checkpoint
    rounds_since_ckpt = 0
    for rnd in range(max_rounds):
        t_round = _time.time()
        nbr_min = (
            sym.join(labels, sym["v"] == labels["id"])
            .groupBy("u")
            .agg(F.min("label").alias("cand"))
        )
        # stepped feeds BOTH sides of the pointer-jump self-join below;
        # r13: persist it — unpersisted, Catalyst inlined the whole
        # nbr_min subtree (edge join + aggregate) once per side, doubling
        # every round's shuffle work. The old label rides along so
        # convergence detection is a scan of the cached round result
        # instead of a third per-round join.
        stepped = (
            labels.join(nbr_min, labels["id"] == nbr_min["u"], "left")
            .select(
                labels["id"].alias("id"),
                F.least(
                    labels["label"], F.coalesce(F.col("cand"), labels["label"])
                ).alias("label"),
                labels["label"].alias("old"),
            )
            .persist()
        )
        # pointer jumping: follow the label one hop (label of my label)
        ptr = stepped.select(
            F.col("id").alias("pid"), F.col("label").alias("plabel")
        )
        jumped = (
            stepped.join(ptr, stepped["label"] == ptr["pid"], "left")
            .select(
                stepped["id"].alias("id"),
                F.coalesce(F.col("plabel"), stepped["label"]).alias("label"),
                stepped["old"].alias("old"),
            )
            .persist()
        )
        # FULL count, not limit(1): next round reads every partition of
        # the jumped cache anyway, and a limit-gated count materializes
        # only a prefix — the rest recomputed through the unpersisted
        # previous round (measured: rounds 2× slower with limit(1))
        changed = jumped.filter(F.col("label") != F.col("old")).count()
        cached.unpersist()
        stepped.unpersist()
        labels = jumped.drop("old")
        cached = jumped
        if changed == 0:
            break
        wall = _time.time() - t_round
        rounds_since_ckpt += 1
        degraded = base_wall is not None and wall > 1.5 * base_wall
        base_wall = wall if base_wall is None else min(base_wall, wall)
        if degraded or rounds_since_ckpt >= checkpoint_every:
            ckpt = labels.localCheckpoint()  # eager: materializes first
            cached.unpersist()  # release the pre-checkpoint cached frame
            labels = ckpt
            cached = ckpt
            base_wall = None
            rounds_since_ckpt = 0
    # untouched vertices (no incident edge) label themselves; the
    # touched-label side is near-dup-pair-sized, so at scale this join
    # broadcasts instead of shuffling the corpus-grain vertex set
    return vertices.join(
        labels.withColumnRenamed("label", "cc_label"), "id", "left"
    ).select(
        "id", F.coalesce(F.col("cc_label"), F.col("id")).alias("label")
    )


def cluster_documents(
    spark: SparkSession, sf: str, edges: DataFrame
) -> DataFrame:
    """Resolve an arbitrary (u, v) near-dup edge list into clusters:
    every document gets cluster_id = min doc_id of its component,
    singletons label themselves. The edge source is a parameter so the
    same loop serves the exact pair join (oracle path) and MinHash-LSH
    candidates (100 TB path)."""
    # DISTINCT identities: duplicated doc_id rows (re-delivered
    # ingest) must not fan out the CC joins (round-9 dirty corpus)
    vertices = (
        load(spark, sf, "documents")
        .select(F.col("doc_id").alias("id"))
        .distinct()
    )
    # edges is consumed exactly once (the symmetrized frame inside
    # connected_components is what's persisted and re-read per round —
    # r13; the old edges.persist() here was never released)
    labels = connected_components(vertices, edges)
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("label").cast("bigint").alias("cluster_id"),
    )


@query("d2_dup_clusters", oracle=_CLUSTERS_SQL)
def d2_dup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """D2 terminal step: resolve near-dup pairs into duplicate clusters.

    Pairs = 3-gram Jaccard >= 0.3 (the exact pair semantics of
    d2_ngram_jaccard); the edge source is pluggable via
    :func:`cluster_documents` — see d2_dup_clusters_lsh for the LSH-
    candidate-driven 100 TB path over the identical loop.
    """
    # the pair join is the expensive stage and feeds every CC round:
    # materialize it once (cluster_documents persists the edge list)
    edges = (
        d2_ngram_jaccard(spark, sf)
        .filter(F.col("jaccard") >= _CLUSTER_THRESHOLD)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )
    return cluster_documents(spark, sf, edges)


@query("d2_dup_clusters_lsh", oracle=None)  # LSH candidates → rows-only
def d2_dup_clusters_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """D2 scale path: duplicate clusters over MinHash-LSH candidate edges.

    Identical CC loop as d2_dup_clusters, but the edge list comes from
    d2_minhash_lsh's banded candidates (est_jaccard >= 0.3) — shuffle
    volume O(docs × bands), never the O(docs²) shingle self-join, so
    this is the entry point a 100 TB corpus dedup actually runs.
    Deterministic (fixed permutations); cluster/edge consistency is
    asserted against a union-find ground truth in tests/test_clustering.py.
    """
    from event_streamer_spark.operators.dedup import d2_minhash_lsh

    edges = (
        d2_minhash_lsh(spark, sf)
        .filter(F.col("est_jaccard") >= _CLUSTER_THRESHOLD)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )
    return cluster_documents(spark, sf, edges)


@query("d2_dedup_corpus", oracle=_CORPUS_SQL)
def d2_dedup_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """D2 end-to-end: the deduplicated corpus — cluster representatives
    only (doc_id == cluster_id), i.e. what a pretraining job would
    actually keep. One broadcast-size join back to documents."""
    clusters = d2_dup_clusters(spark, sf)
    keep = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select(
        "doc_id"
    )
    docs = load(spark, sf, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    ).distinct()
    return docs.join(keep, "doc_id")


_VAL_FRACTION_HEX = "1999999a"  # ~0.10 of 2^32


@query(
    "d13_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE {_PAIRS_CTES},
    labeled AS (
      SELECT d.doc_id,
             COALESCE(LEAST(m.doc_id, m.min_r), d.doc_id) AS cluster_id
      FROM (SELECT DISTINCT doc_id FROM documents) d
      LEFT JOIN minreach m USING (doc_id))
    SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id,
           CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)
                     < '{_VAL_FRACTION_HEX}'
                THEN 'val' ELSE 'train' END AS split
    FROM labeled
    """,
)
def d13_leakage_safe_split(spark: SparkSession, sf: str) -> DataFrame:
    """D13: leakage-safe train/validation split — the assignment is a
    deterministic hash of the near-dup CLUSTER id, not the document id,
    so a document and its near-duplicates always land in the SAME
    split (random per-doc splits leak paraphrases of validation text
    into training — the classic eval-contamination bug).

    ~10% val via an md5 hex-prefix threshold (engine-agnostic, seedless
    reproducibility — same device-independent trick as
    ``d7_stratified_sample``). Cost on top of clustering: one narrow
    map. Scale: inherits the CC loop's O(|E|+|V|) rounds; the split
    itself never shuffles.
    """
    clusters = d2_dup_clusters(spark, sf)
    split = F.when(
        F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 8)
        < _VAL_FRACTION_HEX,
        F.lit("val"),
    ).otherwise(F.lit("train"))
    return clusters.select("doc_id", "cluster_id", split.alias("split"))
