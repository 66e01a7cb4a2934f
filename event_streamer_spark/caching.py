"""Bounded operator caching.

``DataFrame.persist()`` registers the frame in Spark's CacheManager,
which holds it until an explicit unpersist — so an operator that
persists an intermediate on every call leaks one cached frame per
DISTINCT input over a long-lived session. This module keeps at most one
live cached frame per named slot.

The subtlety (measured, not theoretical): CacheManager keys entries by
CANONICAL PLAN, not by Python object. A repeated identical call maps to
the SAME cache entry, so naively unpersisting the previous object
deletes the cache out from under the new persist and every "warm" call
rebuilds from scratch (3× slower in the distrank benchmark). Hence the
``sameSemantics`` check: identical plans share the materialized entry;
only a genuinely different plan evicts the old one.

Eviction is non-blocking and safe under concurrency: a caller whose
frame is evicted mid-job recomputes from lineage — slower, never wrong.
"""

from __future__ import annotations

import threading
from typing import Optional

from pyspark.sql import DataFrame

_SLOTS: dict[str, DataFrame] = {}
# check-then-act on _SLOTS must be atomic: two threads racing the same
# slot would otherwise both read the same prev, and the loser's frame
# would stay persisted with no reference left to ever release it —
# exactly the unbounded leak this module exists to prevent
_LOCK = threading.Lock()


def _safe_unpersist(df: DataFrame) -> None:
    try:
        df.unpersist(False)
    except Exception:  # pragma: no cover — stale frame from a stopped
        pass  # session counts as already evicted


def bounded_persist(
    df: DataFrame, slot: str, columnar_compressed: bool = True,
    columnar_batch_size: Optional[int] = None,
) -> DataFrame:
    """``persist()`` with at most one live cached frame per ``slot``.

    ``columnar_compressed=False`` turns off the in-memory columnar
    codecs for THIS frame (the conf is captured when the InMemoryRelation
    is created, so the flip-and-restore below scopes it to this persist):
    measured at sf0.1, the compressed cache build costs 2× the
    uncompressed one (3.75 s vs 1.86 s for distrank's 600k×6 bucketed
    frame) while reread time is identical. Use it for narrow numeric
    frames whose first materialization sits on the critical path;
    leave compression on for wide/string frames where memory footprint
    dominates (e.g. BPE's word tables).

    ``columnar_batch_size`` overrides
    ``spark.sql.inMemoryColumnarStorage.batchSize`` (default 10000
    rows) for this persist, same scoping: measured round 8, 100k-row
    batches cut the same frame's uncompressed build 2.37 s → 1.29 s
    (fewer per-batch allocations and stat rows). The cost is coarser
    cache-block granularity — only worth it for frames that are read
    back whole (as distrank's counts/sort consumers do), and more
    per-batch peak memory, so keep batches well under
    rows-per-partition.
    """
    with _LOCK:
        prev = _SLOTS.get(slot)
        if prev is not None:
            try:
                same = prev.sameSemantics(df)
            except Exception:  # pragma: no cover - defensive
                same = False
            if not same:
                _safe_unpersist(prev)
        spark = df.sparkSession
        # the confs are SESSION-global: a persist() on another thread
        # during the flip window (foreachBatch sinks persist directly,
        # outside _LOCK) would capture the flipped values too — a cache-
        # size/speed effect, never a correctness one, so skip the
        # optimizations entirely while streaming queries are live. A
        # stream STARTED between this check and the finally-restore
        # still captures the flipped conf for its per-batch persists —
        # accepted (same size-only blast radius; closing it would mean
        # locking stream starts, which this module has no authority over)
        flips: list[tuple[str, str]] = []
        if not spark.streams.active:
            if not columnar_compressed:
                flips.append(
                    ("spark.sql.inMemoryColumnarStorage.compressed", "false")
                )
            if columnar_batch_size is not None:
                flips.append(
                    (
                        "spark.sql.inMemoryColumnarStorage.batchSize",
                        str(columnar_batch_size),
                    )
                )
        if flips:
            # both are built-in SQL confs — get() always returns the
            # effective (set-or-default) value, which restore re-sets
            olds = [(k, spark.conf.get(k)) for k, _ in flips]
            for k, v in flips:
                spark.conf.set(k, v)
            try:
                df = df.persist()
            finally:
                for k, old in olds:
                    spark.conf.set(k, old)
        else:
            df = df.persist()
        _SLOTS[slot] = df
    return df


def clear_slot(slot: Optional[str] = None) -> None:
    """Eagerly release one slot's cached frame (or all slots)."""
    with _LOCK:
        names = [slot] if slot is not None else list(_SLOTS)
        for name in names:
            df = _SLOTS.pop(name, None)
            if df is not None:
                _safe_unpersist(df)


def clear_slots_with_prefix(prefix: str) -> None:
    """Eagerly release every slot whose name starts with ``prefix`` —
    for operator families that fan one logical cache out over several
    per-call-site slots (distrank, r13)."""
    with _LOCK:
        for name in [n for n in _SLOTS if n.startswith(prefix)]:
            df = _SLOTS.pop(name, None)
            if df is not None:
                _safe_unpersist(df)
