"""D4 text-analysis behavioral tests (signals without a SQL oracle)."""

from event_streamer_spark.operators import REGISTRY

SF = "/root/testdata/sf0.001"


class TestCompressionRatio:
    """D4 compression-ratio signal: repetition compresses, novelty
    doesn't; the ratio is deterministic for a fixed zlib level."""

    def test_repetitive_vs_novel_text(self):
        """The signal itself (independent of Spark): pure repetition
        lands far below the 0.3 flag threshold, novel text far above."""
        import zlib

        def ratio(s: str) -> float:
            b = s.encode()
            return len(zlib.compress(b, 6)) / len(b)

        repetitive = ratio("spam " * 200)
        novel = ratio(" ".join(f"w{i}x{i * 7 % 97}" for i in range(200)))
        assert repetitive < 0.05
        assert novel > 0.3

    def test_query_runs_and_is_deterministic(self, spark):
        a = REGISTRY["d4_compression_ratio"].fn(spark, SF).collect()
        b = REGISTRY["d4_compression_ratio"].fn(spark, SF).collect()
        assert len(a) > 0
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        for r in a:
            assert 0 < r["compression_ratio"] <= 1.5  # deflate overhead cap
            assert r["too_compressible"] == (r["compression_ratio"] < 0.3)


def test_bigram_logprob_invariants(spark):
    """Interpolated bigram LM: every score is a log of a probability
    (<= 0), each doc contributes exactly len(toks)-1 bigrams, and a
    doc's bigram score is at least its unigram score intuition-wise on
    a self-trained corpus — checked exactly via first principles on a
    sample of docs."""
    import math
    from collections import Counter

    from event_streamer_spark.operators import REGISTRY
    from event_streamer_spark.tables import load

    rows = {r["doc_id"]: r for r in
            REGISTRY["d4_bigram_logprob"].fn(spark, SF).collect()}
    docs = {r["doc_id"]: r["text"].split(" ")
            for r in load(spark, SF, "documents").collect()}
    assert set(rows) == {d for d, t in docs.items() if len(t) >= 2}
    for d, r in rows.items():
        assert r["n_bigrams"] == len(docs[d]) - 1, d
        assert r["avg_logprob"] <= 0, d

    # first-principles recomputation for 5 docs
    uni = Counter(t for toks in docs.values() for t in toks)
    n = sum(uni.values())
    bi = Counter()
    ctx = Counter()
    for toks in docs.values():
        for p, t in zip(toks, toks[1:]):
            bi[(p, t)] += 1
            ctx[p] += 1
    for d in sorted(docs)[:5]:
        toks = docs[d]
        scores = [
            math.log(0.7 * bi[(p, t)] / ctx[p] + 0.3 * uni[t] / n)
            for p, t in zip(toks, toks[1:])
        ]
        assert abs(rows[d]["avg_logprob"]
                   - round(sum(scores) / len(scores), 6)) <= 1e-6, d


def test_lexical_diversity_invariants(spark):
    """TTR and segment TTR are in (0, 1]; a repetitive doc scores
    below a diverse one; recompute two docs from first principles."""
    from event_streamer_spark.operators import REGISTRY
    from event_streamer_spark.tables import load

    rows = {r["doc_id"]: r for r in
            REGISTRY["d4_lexical_diversity"].fn(spark, SF).collect()}
    texts = {r["doc_id"]: r["text"].split(" ")
             for r in load(spark, SF, "documents").collect()}
    assert set(rows) == set(texts)
    for d, r in rows.items():
        assert 0 < r["ttr"] <= 1 and 0 < r["seg_ttr"] <= 1, d
        assert r["n_toks"] == len(texts[d]), d
    for d in sorted(texts)[:3]:
        toks = texts[d]
        ttr = round(len(set(toks)) / len(toks), 6)
        segs = [toks[i:i + 50] for i in range(0, len(toks), 50)]
        seg_ttr = round(
            sum(len(set(s)) / len(s) for s in segs) / len(segs), 6
        )
        assert abs(rows[d]["ttr"] - ttr) <= 1e-6, d
        assert abs(rows[d]["seg_ttr"] - seg_ttr) <= 1e-6, d


def test_pmi_collocations_first_principles(spark):
    """PMI ratios recomputed from raw whitespace tokenization in
    Python ints must match exactly (truncating division), every
    reported pair must clear the count floor, and the ratio must
    rank genuinely associated pairs above independent ones."""
    from collections import Counter

    from event_streamer_spark.operators.text2 import _PMI_MIN_COUNT
    from event_streamer_spark.tables import load

    docs = load(spark, SF, "documents").select("text").collect()
    uni: Counter = Counter()
    bi: Counter = Counter()
    n = 0
    for r in docs:
        toks = r["text"].split(" ")
        n += len(toks)
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    rows = REGISTRY["d4_pmi_collocations"].fn(spark, SF).collect()
    expected = {
        (x, y): (1_000_000 * c * n) // (uni[x] * uni[y])
        for (x, y), c in bi.items()
        if c >= _PMI_MIN_COUNT
    }
    got = {(r["prev"], r["tok"]): r["pmi_ratio_ppm"] for r in rows}
    assert got == expected
    counts = {(r["prev"], r["tok"]): r["c_xy"] for r in rows}
    assert all(c >= _PMI_MIN_COUNT for c in counts.values())
    assert counts == {k: bi[k] for k in counts}
    # independence baseline: a ratio of 1_000_000 ppm means the pair
    # co-occurs exactly as often as chance — the corpus must contain
    # pairs materially above it for PMI to rank anything
    assert max(got.values()) > 2_000_000
