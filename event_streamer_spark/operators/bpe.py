"""Distributed BPE tokenizer training + application (D4 extension).

Tokenizer training is part of the 100 TB data pipeline, not an
afterthought: the merge table is learned FROM the corpus (Sennrich et
al. 2016, the GPT-2 recipe). The classic algorithm is inherently
iterative — count adjacent symbol pairs, merge the most frequent,
repeat — and maps cleanly onto Spark:

* the corpus collapses to a WORD-FREQUENCY table once (`groupBy(word)`
  — BPE statistics only depend on word counts, so a 10^12-token corpus
  becomes a vocabulary-sized frame);
* each merge round is ONE map-side-combinable pair-count aggregate over
  that frame (the candidate table is symbol-pair-sized) plus one
  Arrow-batched merge pass;
* the only driver state is the merge table itself — model-sized, like
  the IVF centroids (`similarity.py:train_ivf_centroids`).

Equivalence with the textbook single-process algorithm is pinned in
``tests/test_bpe.py`` against an independent pure-Python reference.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from event_streamer_spark.operators.registry import query
from event_streamer_spark.tables import load

_N_MERGES = 12  # fixture-sized merge budget (real runs use 10k-100k);
# each merge round costs one aggregate+collect pass, so the registered
# query keeps the budget small — train_bpe_merges takes any n_merges
_END = "</w>"  # end-of-word marker (Sennrich et al. §3.2)


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, cnt)`` — the sufficient statistic for BPE training."""
    return (
        docs.select(F.explode(F.split(text_col, " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_pair_udf(a: str, b: str):
    """Arrow-batched application of ONE merge (a, b) → ab to symbol
    arrays — the per-round rewrite. A plain Python scan per word, but
    over the word-frequency table (vocabulary-sized), not the corpus."""

    @pandas_udf("array<string>")
    def merge(syms: pd.Series) -> pd.Series:
        out = []
        for s in syms:
            s = list(s)
            i, acc = 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    acc.append(a + b)
                    i += 2
                else:
                    acc.append(s[i])
                    i += 1
            out.append(acc)
        return pd.Series(out)

    return merge


def train_bpe_merges(
    docs: DataFrame, n_merges: int = _N_MERGES, text_col: str = "text"
) -> list:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the merge
    list ``[(a, b), ...]`` in application order (driver-side model
    state, bounded by ``n_merges``).

    Each round: pair-count aggregate (map-side combinable; output is
    pair-vocabulary-sized) → deterministic argmax (count desc, pair
    asc) → one narrow merge pass over the word table. The word table is
    re-persisted per round so lineage stays flat across iterations.
    """
    from event_streamer_spark.caching import bounded_persist, clear_slot

    words = word_frequencies(docs, text_col).withColumn(
        "syms",
        F.expr(f"array_append(split(word, ''), '{_END}')"),
    ).select("syms", "cnt")
    merges: list = []
    # two alternating persist slots: round k's table must be MATERIALIZED
    # (by its own pair-count job, reading round k-1 from cache) BEFORE
    # round k-1 is released — a single slot would evict the previous
    # round first and recompute the whole merge chain from the raw
    # corpus every iteration
    slots = ("bpe.words.0", "bpe.words.1")
    for it in range(n_merges):
        words = bounded_persist(words, slots[it % 2])
        pairs = (
            words.select(
                F.explode(
                    # guard: sequence(1, 0) is DESCENDING [1, 0], not
                    # empty — fully-merged single-symbol words need the
                    # explicit empty-array branch
                    F.expr(
                        "CASE WHEN size(syms) < 2 THEN"
                        " array() ELSE"
                        " transform(sequence(1, size(syms) - 1),"
                        " i -> struct(syms[i - 1] AS a, syms[i] AS b)) END"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
        )
        # this collect also materializes the round's persisted table
        # (computed incrementally from the previous round's cache)
        top = pairs.orderBy(F.desc("n"), "a", "b").limit(1).collect()
        clear_slot(slots[(it + 1) % 2])  # previous round, now superseded
        if not top or top[0]["n"] < 2:
            break  # no pair occurs twice → nothing left to merge
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words = words.withColumn("syms", _merge_pair_udf(a, b)(F.col("syms")))
    for slot in slots:  # the merge list is the only output; release all
        clear_slot(slot)
    return merges


def bpe_token_count_udf(merges: Sequence):
    """Arrow-batched tokenizer for a trained merge list: per word,
    repeatedly apply the lowest-rank applicable merge (the standard BPE
    apply loop) and count the resulting tokens."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @pandas_udf("int")
    def count_tokens(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            total = 0
            for word in text.split(" "):
                if not word:
                    continue
                s = list(word) + [_END]
                while len(s) > 1:
                    best, best_rank = None, None
                    for i in range(len(s) - 1):
                        r = ranks.get((s[i], s[i + 1]))
                        if r is not None and (best_rank is None or r < best_rank):
                            best, best_rank = i, r
                    if best is None:
                        break
                    s[best : best + 2] = [s[best] + s[best + 1]]
                total += len(s)
            out.append(total)
        return pd.Series(out, dtype="int32")

    return count_tokens


def apply_bpe(
    docs: DataFrame,
    merges: Sequence,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, n_bpe_tokens)`` for a trained merge list."""
    return docs.select(
        id_col,
        bpe_token_count_udf(merges)(F.col(text_col)).alias("n_bpe_tokens"),
    )


def bpe_tokenize_frame(spark: SparkSession, sf: str) -> DataFrame:
    """D4: train a {12}-merge BPE vocabulary ON the corpus, then
    tokenize every document with it — the end-to-end tokenizer leg of
    the pipeline. Per-doc output: BPE token count next to the
    whitespace count (the compression the learned merges buy).

    Raw frame — the registered ``d4_bpe_train_tokenize`` wraps it in
    the round-10 bounded check; ``tests/test_bpe.py`` pins the
    training itself (distributed trainer merge-for-merge identical to
    an independent single-process reference, invariant under
    repartitioning, tokenization strictly compresses).
    """
    # NULL text: no words to train on, no tokens to count — excluded
    # rather than crashing the Arrow tokenize batch (round-9 dirty
    # corpus); the trainer's explode(split(NULL)) already emits nothing
    docs = load(spark, sf, "documents").filter(F.col("text").isNotNull())
    merges = train_bpe_merges(docs)
    # ONE narrow pass: both counts are per-row projections of the same
    # input row — no second corpus scan, no self-join on doc_id.
    # Empty strings from consecutive spaces are not words (same filter
    # as the trainer), so count non-empty splits.
    ws = F.size(
        F.filter(F.split("text", " "), lambda x: x != "")
    ).cast("int")
    return docs.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        bpe_token_count_udf(merges)(F.col("text")).alias("n_bpe_tokens"),
        F.length(F.regexp_replace("text", " ", ""))
        .cast("int")
        .alias("n_chars"),
    )


@query(
    "d4_bpe_train_tokenize",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
                AS BIGINT) AS n_ws_tokens,
           TRUE AS bpe_bounds_ok
    FROM documents WHERE text IS NOT NULL
    """,
)
def d4_bpe_train_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """D4: corpus-trained BPE tokenization, registered as a
    BOUNDED-CHECK oracle query (round-10 upgrade from rows-only): the
    whitespace token count is hash-checked per doc against DuckDB and
    the learned-merge token count collapses into its structural
    invariant — ``n_ws ≤ n_bpe ≤ n_chars + n_ws`` (every word is at
    least one token; unmerged tokenization is chars + one end marker
    per word and merges only ever shrink it). The invariant is
    deterministic for ANY trained merge list on ANY corpus, so it is
    safe under the fresh-seed hostile replay; the training itself
    (not SQL-expressible — iterative) stays pinned merge-for-merge in
    ``tests/test_bpe.py``.
    """
    t = bpe_tokenize_frame(spark, sf)
    return t.select(
        "doc_id",
        F.col("n_ws_tokens").cast("bigint").alias("n_ws_tokens"),
        (
            (F.col("n_bpe_tokens") >= F.col("n_ws_tokens"))
            & (
                F.col("n_bpe_tokens")
                <= F.col("n_chars") + F.col("n_ws_tokens")
            )
        ).alias("bpe_bounds_ok"),
    )
