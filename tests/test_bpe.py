"""Distributed BPE training vs an independent single-process reference."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from event_streamer_spark.operators import REGISTRY
from event_streamer_spark.operators.bpe import (
    _END,
    apply_bpe,
    train_bpe_merges,
)
from event_streamer_spark.tables import load

SF = "/root/testdata/sf0.001"


def reference_bpe(word_counts: dict, n_merges: int) -> list:
    """Textbook BPE (Sennrich et al. 2016, Algorithm 1) on a word-count
    dict — deliberately written independently of the Spark path."""
    vocab = {tuple(list(w) + [_END]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # deterministic argmax: count desc, pair asc
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((a, b))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_trainer_matches_reference_merge_for_merge(spark):
    corpus = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame(
        [(1, " ".join(corpus))], "doc_id bigint, text string"
    )
    got = train_bpe_merges(docs, n_merges=10)
    want = reference_bpe(Counter(corpus), 10)
    assert got == want
    assert len(got) == 10


def test_trainer_on_fixture_matches_reference_and_partitioning(spark):
    docs = load(spark, SF, "documents")
    words = Counter()
    for r in docs.select("text").collect():
        for w in r["text"].split(" "):
            if w:
                words[w] += 1
    want = reference_bpe(words, 12)
    got = train_bpe_merges(docs, n_merges=12)
    assert got == want
    got2 = train_bpe_merges(docs.repartition(9), n_merges=12)
    assert got2 == want


def test_tokenize_compresses_and_registered_query_runs(spark):
    from event_streamer_spark.operators.bpe import bpe_tokenize_frame

    rows = bpe_tokenize_frame(spark, SF).collect()
    assert len(rows) == 500
    # the registered bounded-check wrapper: invariant flag true per doc
    for r in REGISTRY["d4_bpe_train_tokenize"].fn(spark, SF).collect():
        assert r["bpe_bounds_ok"], r
    chars = {
        r["doc_id"]: sum(len(w) for w in r["text"].split(" ") if w)
        for r in load(spark, SF, "documents").collect()
    }
    words = {
        r["doc_id"]: sum(1 for w in r["text"].split(" ") if w)
        for r in load(spark, SF, "documents").collect()
    }
    compressed_somewhere = False
    for r in rows:
        assert 0 < r["n_bpe_tokens"]
        assert r["n_ws_tokens"] == words[r["doc_id"]]
        assert r["n_ws_tokens"] <= r["n_bpe_tokens"]  # >= one token/word
        # unmerged tokenization would be chars + one end marker per word;
        # learned merges must stay at or below that, and strictly below
        # somewhere in the corpus
        ceiling = chars[r["doc_id"]] + words[r["doc_id"]]
        assert r["n_bpe_tokens"] <= ceiling
        if r["n_bpe_tokens"] < ceiling:
            compressed_somewhere = True
    assert compressed_somewhere


def test_local_and_distributed_trainers_agree(spark):
    """r13 size-adaptive trainer: the driver-local merge loop (taken
    below the vocab-row threshold) must be merge-for-merge identical to
    the distributed per-round aggregate loop on the same corpus."""
    from event_streamer_spark.caching import clear_slot
    from event_streamer_spark.operators.bpe import (
        _LOCAL_VOCAB_MAX_CONF,
        train_bpe_merges,
    )

    docs = load(spark, SF, "documents").filter(
        __import__("pyspark").sql.functions.col("text").isNotNull()
    )
    prior = spark.conf.get(_LOCAL_VOCAB_MAX_CONF, None)
    try:
        spark.conf.set(_LOCAL_VOCAB_MAX_CONF, "65536")
        local = train_bpe_merges(docs)
        clear_slot()
        spark.conf.set(_LOCAL_VOCAB_MAX_CONF, "0")  # force distributed
        dist = train_bpe_merges(docs)
    finally:
        if prior is None:
            spark.conf.unset(_LOCAL_VOCAB_MAX_CONF)
        else:
            spark.conf.set(_LOCAL_VOCAB_MAX_CONF, prior)
    assert local and local == dist
