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

from typing import Optional

from pyspark.sql import DataFrame

_SLOTS: dict[str, DataFrame] = {}


def bounded_persist(df: DataFrame, slot: str) -> DataFrame:
    """``persist()`` with at most one live cached frame per ``slot``."""
    prev = _SLOTS.get(slot)
    if prev is not None:
        try:
            same = prev.sameSemantics(df)
        except Exception:  # pragma: no cover - defensive
            same = False
        if not same:
            prev.unpersist(False)
    df = df.persist()
    _SLOTS[slot] = df
    return df


def clear_slot(slot: Optional[str] = None) -> None:
    """Eagerly release one slot's cached frame (or all slots)."""
    names = [slot] if slot is not None else list(_SLOTS)
    for name in names:
        df = _SLOTS.pop(name, None)
        if df is not None:
            df.unpersist(False)
