"""Arbitrary stateful streaming (SURVEY §2.C C8): applyInPandasWithState.

``sessionize_with_state`` is the canonical custom stateful operator the
reference's handler-callback model can't express declaratively: per-key
session tracking with explicit timeout-driven state eviction. State is
per-key and partitioned by Spark's state store — no driver-side state,
so it scales horizontally (the 100 TB requirement).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
STATE_SCHEMA = "start_s double, last_s double, n bigint"

SESSION_GAP_S = 300.0


def _us_ts(seconds: float) -> pd.Timestamp:
    """Microsecond-precision timestamp (Arrow rejects lossy ns→us casts)."""
    return pd.Timestamp(int(round(seconds * 1e6)), unit="us")


def _sessionize(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit closed sessions; keep the open session in GroupState."""
    (user_id,) = key

    if state.hasTimedOut:
        (start_s, last_s, n) = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [_us_ts(start_s)],
                "session_end": [_us_ts(last_s)],
                "n_events": [n],
            }
        )
        return

    rows = pd.concat(list(pdfs)).sort_values("ts")
    secs = rows["ts"].astype("int64") / 1e9

    if state.exists:
        start_s, last_s, n = state.get
    else:
        start_s, last_s, n = float(secs.iloc[0]), float(secs.iloc[0]), 0

    closed = []
    for s in secs:
        if s - last_s > SESSION_GAP_S:
            closed.append((start_s, last_s, n))
            start_s, n = float(s), 0
        last_s = float(s)
        n += 1

    state.update((float(start_s), float(last_s), int(n)))
    state.setTimeoutDuration(int(SESSION_GAP_S * 1000))

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [_us_ts(c[0]) for c in closed],
                "session_end": [_us_ts(c[1]) for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )


STATS_OUTPUT_SCHEMA = (
    "user_id bigint, n bigint, total double, vmin double, vmax double,"
    " mean double"
)
STATS_STATE_SCHEMA = "n bigint, total double, vmin double, vmax double"


def _running_stats(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold the batch into (n, total, min, max) state; emit the updated
    running aggregate once per batch."""
    (user_id,) = key
    vals = pd.concat(list(pdfs))["value"].astype(float)
    if state.exists:
        n, total, vmin, vmax = state.get
    else:
        n, total, vmin, vmax = 0, 0.0, float("inf"), float("-inf")
    n += int(len(vals))
    total += float(vals.sum())
    vmin = min(vmin, float(vals.min()))
    vmax = max(vmax, float(vals.max()))
    state.update((int(n), float(total), float(vmin), float(vmax)))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n": [n],
            "total": [total],
            "vmin": [vmin],
            "vmax": [vmax],
            "mean": [total / n],
        }
    )


def running_stats_with_state(
    events: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """C8 (second shape): per-key RUNNING aggregate with a custom state
    tuple — the online-metrics pattern (count/sum/min/max/mean updated
    per micro-batch, emitted in update mode). Plain streaming
    aggregations can express sum/count, but not a custom state layout
    shared with richer logic (quantile sketches, CUSUM detectors slot
    into the same fold); this pins the plumbing. State is per-key in
    Spark's state store — horizontally partitioned, no driver state.
    """
    return events.select(
        F.col(key_col).alias("user_id"), F.col(value_col).alias("value")
    ).groupBy("user_id").applyInPandasWithState(
        _running_stats,
        outputStructType=STATS_OUTPUT_SCHEMA,
        stateStructType=STATS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_stats_tws(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    require_v2: bool = False,
) -> DataFrame:
    """C8 (third shape): the SAME running-aggregate semantics as
    :func:`running_stats_with_state`, on Spark 4's arbitrary-state v2
    API (``transformWithStateInPandas`` + ``ValueState``). v2 is the
    forward path at scale: RocksDB-backed state with changelog
    checkpointing, typed state variables (value/list/map) with per-state
    TTL, and timers decoupled from the output iterator. The test suite
    pins v2 output == v1 output == the batch aggregate on the same
    input.

    Requires the RocksDB state store provider::

        spark.sql.streaming.stateStore.providerClass =
          org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider

    and the ``protobuf`` package (the v2 Python worker protocol). The
    runtime is resolved via :mod:`event_streamer_spark.protobuf_compat`
    (pip package first, then the container's gcloud-bundled pure-Python
    runtime). When no runtime can be found the operator DOWNGRADES to
    the v1 :func:`running_stats_with_state` — identical output schema
    and semantics (the suite pins v1 == v2 == batch), logging one
    warning — so the API works in every environment; pass
    ``require_v2=True`` to get an ImportError instead of the fallback.
    """
    from event_streamer_spark.protobuf_compat import ensure_protobuf

    if not ensure_protobuf():
        if require_v2:
            raise ImportError(
                "transformWithStateInPandas requires the protobuf package"
                " (pip install protobuf); install it or call with"
                " require_v2=False for the applyInPandasWithState fallback"
            )
        import warnings

        warnings.warn(
            "protobuf not installed: running_stats_tws falling back to the"
            " applyInPandasWithState (v1) operator — same semantics, no"
            " RocksDB typed-state features",
            RuntimeWarning,
            stacklevel=2,
        )
        return running_stats_with_state(events, key_col, value_col)

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningStats(StatefulProcessor):
        def __getstate__(self):  # noqa: ANN204
            # Non-empty state forces pickle to emit a BUILD op, so
            # __setstate__ below is guaranteed to run at unpickle.
            return dict(self.__dict__, _es_pickle_guard=True)

        def __setstate__(self, state) -> None:  # noqa: ANN001
            # Runs at UNPICKLE time in every worker process — including
            # the driver-side pre-init worker, whose first protocol call
            # (set_handle_state(PRE_INIT)) imports StateMessage_pb2
            # BEFORE the processor's init() is reached. Resolving the
            # (possibly vendored) protobuf runtime here guarantees it is
            # on sys.path before any pb2 import anywhere.
            ensure_protobuf()
            self.__dict__.update(state)

        def init(self, handle: StatefulProcessorHandle) -> None:
            ensure_protobuf()
            self._stats = handle.getValueState("stats", STATS_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):  # noqa: ANN001
            (user_id,) = key
            if self._stats.exists():
                n, total, vmin, vmax = self._stats.get()
            else:
                n, total, vmin, vmax = 0, 0.0, float("inf"), float("-inf")
            for pdf in rows:
                vals = pdf["value"].astype(float)
                if len(vals):
                    n += int(len(vals))
                    total += float(vals.sum())
                    vmin = min(vmin, float(vals.min()))
                    vmax = max(vmax, float(vals.max()))
            self._stats.update((int(n), float(total), float(vmin), float(vmax)))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n": [n],
                    "total": [total],
                    "vmin": [vmin],
                    "vmax": [vmax],
                    "mean": [total / n],
                }
            )

        def close(self) -> None:
            pass

    return events.select(
        F.col(key_col).alias("user_id"), F.col(value_col).alias("value")
    ).groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningStats(),
        outputStructType=STATS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def sessionize_with_state(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """C8: custom per-user sessionization via applyInPandasWithState.

    Input: streaming DataFrame with (user_id, ts, ...). Output: one row
    per *closed* session. Sessions close via processing-time timeout —
    the part plain ``session_window`` cannot express (emit-on-close with
    custom state shape).
    """
    return (
        events.withWatermark(ts_col, "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


_FUNNEL_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7 days in microseconds
_NONE = -1  # state sentinel (timestamps are non-negative epoch micros)


def _funnel_fold(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user funnel state: (first_signup_us, first_qualifying_
    purchase_us, earliest_purchase_us). The third slot lets a signup
    that arrives in the same batch as earlier-batch purchases still
    qualify the earliest purchase when it is at-or-after the signup."""
    (user_id,) = key
    if state.exists:
        signup, qual, earliest = state.get
    else:
        signup, qual, earliest = _NONE, _NONE, _NONE
    # applyInPandasWithState gives NO intra-group row order after the
    # shuffle; fold in EVENT-TIME order or a purchase scanned before
    # its same-batch signup would be dropped from the qualifying slot
    batch = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
    for pdf in (batch,):
        us = pdf["ts"].astype("datetime64[us]").astype("int64")
        for t, kind in zip(us, pdf["event_type"]):
            t = int(t)
            if kind == "signup":
                if signup == _NONE or t < signup:
                    signup = t
                    # ONLY the earliest already-seen purchase can be
                    # requalified under the (earlier) signup — per-key
                    # state keeps one purchase timestamp, so a later
                    # already-seen purchase that would qualify while the
                    # earliest does not is outside the exactness
                    # contract (see docstring)
                    if earliest != _NONE and earliest >= signup:
                        qual = earliest if qual == _NONE else min(qual, earliest)
            else:  # purchase
                if earliest == _NONE or t < earliest:
                    earliest = t
                if signup != _NONE and t >= signup and (
                    qual == _NONE or t < qual
                ):
                    qual = t
    state.update((int(signup), int(qual), int(earliest)))
    if signup == _NONE:
        return  # no signup yet → user not in the funnel output
    converted = qual != _NONE and qual <= signup + _FUNNEL_WINDOW_US
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "signup_ts": [pd.Timestamp(signup, unit="us")],
            "first_purchase_ts": [
                pd.Timestamp(qual, unit="us") if qual != _NONE else pd.NaT
            ],
            "converted": [bool(converted)],
        }
    )


def funnel_with_state(events: DataFrame) -> DataFrame:
    """C8 (third shape): the B32 two-step conversion funnel as an
    arbitrary-stateful streaming operator — per-user state is three
    timestamps, emitted in update mode as signups/purchases arrive.

    Exactness contract: equals the batch ``b32_funnel`` whenever each
    user's FIRST signup is seen no later than the purchases that should
    qualify against it (event-time-ordered replay, or any watermark
    discipline that delivers a user's signup before the window closes).
    A signup arriving after watermark-expired purchases would need
    unbounded purchase buffering — the standard bounded-state trade
    every streaming funnel makes. State is per-key in Spark's state
    store: horizontally partitioned, no driver state, O(3 longs) per
    user.
    """
    ev = events.filter(
        F.col("event_type").isin("signup", "purchase")
    ).select("user_id", "event_type", "ts")
    return ev.groupBy("user_id").applyInPandasWithState(
        _funnel_fold,
        outputStructType=(
            "user_id bigint, signup_ts timestamp, "
            "first_purchase_ts timestamp, converted boolean"
        ),
        stateStructType="signup long, qual long, earliest long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MARKOV_OUTPUT_SCHEMA = (
    "user_id long, prev_type string, next_type string, n long"
)
MARKOV_STATE_SCHEMA = "ts_us long, event_id long, event_type string"


def _markov_fold(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user last-event state; emit this batch's transition-count
    DELTAS (the read side SUMs them). Sorting by (ts, event_id) inside
    the batch is mandatory — applyInPandasWithState gives no
    intra-group row order — and the stored last event stitches the
    batch boundary so a transition spanning two micro-batches is
    counted exactly once."""
    (user_id,) = key
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch[batch["ts"].notna()]
    if len(batch) == 0:
        yield from ()
        return
    batch = batch.assign(
        ts_us=batch["ts"].astype("datetime64[us]").astype("int64")
    ).sort_values(["ts_us", "event_id"])
    types = list(batch["event_type"])
    if state.exists:
        _, _, last_type = state.get
        prevs = [last_type] + types[:-1]
    else:
        prevs = [None] + types[:-1]
    from collections import Counter

    counts = Counter(
        (p, t) for p, t in zip(prevs, types) if p is not None
    )
    tail = batch.iloc[-1]
    state.update((int(tail["ts_us"]), int(tail["event_id"]), tail["event_type"]))
    if not counts:
        yield from ()
        return
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(counts),
            "prev_type": [p for p, _ in counts],
            "next_type": [t for _, t in counts],
            "n": list(counts.values()),
        }
    )


def markov_with_state(events: DataFrame) -> DataFrame:
    """C8 (fourth shape): the B61 Markov transition matrix as an
    arbitrary-stateful streaming operator — per-user state is ONE
    (ts, event_id, event_type) triple, and each micro-batch emits
    transition-count deltas in append mode (the consumer SUMs deltas
    by (prev, next); counts add, so the merge is an aggregation like
    every index in the family).

    Exactness contract: equals the batch ``b61_markov_transitions``
    whenever each user's events arrive in event-time order across
    micro-batches (the append-only log-shipping model); within a batch
    any order is fine — the fold sorts. An out-of-order event that
    arrives after a later event was folded would need the full history
    to re-link transitions — the standard bounded-state trade. NULL
    timestamps are excluded, matching the batch operator's ordering
    frame. State: O(1) per user, horizontally partitioned.
    """
    ev = events.select("user_id", "ts", "event_id", "event_type")
    return ev.groupBy("user_id").applyInPandasWithState(
        _markov_fold,
        outputStructType=MARKOV_OUTPUT_SCHEMA,
        stateStructType=MARKOV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
