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
    instants no matter the session timezone active when the plan is
    EXECUTED (the cast is lazy — a bare ntz→timestamp cast shifts with
    the executing session's TZ)."""
    sf_dir = str(tmp_path / "sfntz")
    (tmp_path / "sfntz").mkdir()
    # build an NTZ events variant from the real table's wall-clock values
    src = load(spark, SF, "events")
    src.withColumn("ts", F.col("ts").cast("timestamp_ntz")).write.parquet(
        f"{sf_dir}/events.parquet"
    )

    df = load(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        base = df.select(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        other = df.select(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)
    assert (base["lo"], base["hi"]) == (other["lo"], other["hi"])

    # and the values match the nanos-variant load exactly
    orig = src.select(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    assert (base["lo"], base["hi"]) == (orig["lo"], orig["hi"])
    shutil.rmtree(sf_dir, ignore_errors=True)
