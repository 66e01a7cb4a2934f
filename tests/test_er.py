"""D18 entity resolution: linkage recall/precision on the deterministic
dirty-record fixture, multi-pass blocking necessity, and survivorship
field rules."""

from event_streamer_spark.operators import REGISTRY
from event_streamer_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_er_match_recall_and_precision(spark):
    """Every entity's (A, B) record pair must link (recall 1.0 — the
    multi-pass blocking covers every deletion position), and no
    cross-entity pair can link (precision 1.0 — md5 strings of
    different keys are ~29 edits apart and f2 is entity-unique)."""
    rows = REGISTRY["d18_er_blocked_match"].fn(spark, SF).collect()
    n_cust = load(spark, SF, "customer").count()
    assert len(rows) == n_cust
    for r in rows:
        # rec ids: A = custkey*2 (even), B = custkey*2+1 — a true link
        # pairs the SAME entity's two records
        assert r["rec_a"] % 2 == 0
        assert r["rec_b"] == r["rec_a"] + 1
        assert r["f1_dist"] == 1  # one deleted character
        assert r["score"] >= 45


def test_er_multipass_blocking_is_necessary(spark):
    """Single-pass prefix blocking loses every entity whose typo falls
    in the first 8 chars: both passes must contribute pairs, otherwise
    the union is dead code and recall silently rests on one pass."""
    rows = REGISTRY["d18_er_blocked_match"].fn(spark, SF).collect()
    prefix_broken = [r for r in rows if (r["rec_a"] // 2) % 32 < 8]
    suffix_broken = [r for r in rows if (r["rec_a"] // 2) % 32 >= 24]
    # the fixture's custkeys cover positions 0..31, so both sets are
    # non-empty; each is recoverable ONLY by the other pass
    assert prefix_broken, "no typo in chars 0-7 — fixture degenerate"
    assert suffix_broken, "no typo in chars 24-31 — fixture degenerate"


def test_er_golden_survivorship_rules(spark):
    """Golden records: exactly one per entity, f1 from the untruncated
    source (32 chars), f2 present unless BOTH sources lost it
    (custkey % 5 == 0 drops only source B's), f3 carried through."""
    rows = REGISTRY["d18_er_golden"].fn(spark, SF).collect()
    n_cust = load(spark, SF, "customer").count()
    assert len(rows) == n_cust
    for r in rows:
        assert r["n_records"] == 2
        assert len(r["golden_f1"]) == 32
        assert r["golden_f2"] is not None  # source A always has f2
        assert r["golden_f3"] is not None


def test_er_golden_scores_once_and_reads_caches(spark):
    """Plan pin for the review-found double execution: survivorship
    must reference the match list ONCE (explode, not a two-branch
    union) so the blocked-scoring pipeline appears a single time in
    the optimized plan, reading the persisted records/keyed tables."""
    from event_streamer_spark.caching import clear_slot

    clear_slot("er.recs")
    clear_slot("er.keyed")
    df = REGISTRY["d18_er_golden"].fn(spark, SF)
    op = df._jdf.queryExecution().optimizedPlan().toString()
    ep = df._jdf.queryExecution().executedPlan().toString()
    # one scoring projection (the SQL spelling had two), caches read.
    # Budget 3, not 2 (r13): scoring now runs BEFORE the cross-pass
    # distinct so the dedup exchange carries ids+ints instead of six
    # md5 strings, and Catalyst pushes the threshold filter below the
    # distinct — one extra levenshtein in the pushed predicate. A
    # doubled pipeline would read >= 6.
    assert op.count("levenshtein") <= 3, op
    assert ep.count("InMemoryTableScan") >= 2, ep
    clear_slot("er.recs")
    clear_slot("er.keyed")
