"""Table-loader robustness: the events ``ts`` parquet encoding variants
(TESTDATA.md; generator emits TIMESTAMP(NANOS) or TIMESTAMP_NTZ)."""

import shutil

import pytest
from pyspark.sql import functions as F

from event_streamer_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_events_ts_is_timestamp(spark):
    df = load(spark, SF, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_ntz_variant_is_session_tz_independent(spark, tmp_path):
    """A generator variant writing TIMESTAMP_NTZ must load to identical
    INSTANTS no matter the session timezone active when the plan is
    EXECUTED (the cast is lazy — a bare ntz→timestamp cast shifts with
    the executing session's TZ), and those instants must equal the
    nanos-variant load of the same wall clocks (both branches mean
    "stored wall clock = UTC event time")."""
    sf_dir = str(tmp_path / "sfntz")
    (tmp_path / "sfntz").mkdir()
    # build an NTZ events variant from the real table's wall-clock values
    src = load(spark, SF, "events")
    src.withColumn("ts", F.col("ts").cast("timestamp_ntz")).write.parquet(
        f"{sf_dir}/events.parquet"
    )

    df = load(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    instants = df.select(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    )
    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        base = instants.collect()[0]
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        other = instants.collect()[0]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)
    assert (base["lo"], base["hi"]) == (other["lo"], other["hi"])

    # and the instants match the nanos-variant load exactly
    orig = src.select(
        F.unix_micros(F.min("ts")).alias("lo"),
        F.unix_micros(F.max("ts")).alias("hi"),
    ).collect()[0]
    assert (base["lo"], base["hi"]) == (orig["lo"], orig["hi"])
    shutil.rmtree(sf_dir, ignore_errors=True)


def test_ntz_variant_load_time_tz_does_not_matter(spark, tmp_path):
    """ADVICE r4: the plan may be BUILT under one session TZ and
    EXECUTED under another — the instants must still be the stored wall
    clock interpreted as UTC (from_utc_timestamp(cast, current_timezone)
    evaluates both legs at execution, cancelling any TZ)."""
    sf_dir = str(tmp_path / "sfntz2")
    (tmp_path / "sfntz2").mkdir()
    src = load(spark, SF, "events")
    src.withColumn("ts", F.col("ts").cast("timestamp_ntz")).write.parquet(
        f"{sf_dir}/events.parquet"
    )
    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        want = load(spark, sf_dir, "events").select(
            F.unix_micros(F.min("ts")).alias("u")
        ).collect()[0]["u"]
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df_ny = load(spark, sf_dir, "events")  # plan built under NY...
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        got = df_ny.select(  # ...executed under Tokyo
            F.unix_micros(F.min("ts")).alias("u")
        ).collect()[0]["u"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)
    assert got == want
    shutil.rmtree(sf_dir, ignore_errors=True)
