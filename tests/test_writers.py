"""Writer-side scale patterns: partition pruning, compaction, warnings."""

import glob
import warnings

import pytest
from pyspark.sql import functions as F

from event_streamer_spark.config import Config, ConsumerConfig, set_config
from event_streamer_spark.plans import explain_str
from event_streamer_spark.tables import load
from event_streamer_spark.writers import compact, write_partitioned

SF = "/root/testdata/sf0.001"


def test_write_partitioned_prunes(spark, tmp_path):
    out = str(tmp_path / "by_type")
    ev = load(spark, SF, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    write_partitioned(ev, out, ["event_type"])
    # hive layout on disk
    assert glob.glob(out + "/event_type=purchase/*.parquet")
    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    # partition filter must prune at the source, not post-scan
    plan = explain_str(back)
    assert "PartitionFilters: [isnotnull(event_type" in plan.replace("#", "").replace(
        "\n", " "
    ) or "event_type)" in plan
    assert back.count() == ev.filter(F.col("event_type") == "purchase").count()


def test_compact_reduces_files(spark, tmp_path):
    out = str(tmp_path / "frag")
    load(spark, SF, "events").repartition(24).write.parquet(out)
    before = len(glob.glob(out + "/*.parquet"))
    assert before >= 24
    n_after = compact(spark, out, target_file_mb=128)
    after = len(glob.glob(out + "/*.parquet"))
    assert after == n_after == 1  # tiny data → one target-size file
    assert spark.read.parquet(out).count() == 1000


def test_deprecation_warnings_toggle():
    from event_streamer_spark.consumer import ConsumerRouter
    from event_streamer_spark.producer import emit

    set_config(
        Config(host="h", app_name="a", only_testing=True,
               consumer=ConsumerConfig(group_id="g"))
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        ConsumerRouter()
        emit("t", {"x": 1})
    msgs = [str(w.message) for w in caught if w.category is DeprecationWarning]
    assert any("ConsumerRouter is deprecated" in m for m in msgs)
    assert any("emit() is deprecated" in m for m in msgs)

    cfg = Config(host="h", app_name="a", only_testing=True,
                 consumer=ConsumerConfig(group_id="g"))
    cfg.show_deprecation_warnings = False
    set_config(cfg)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        ConsumerRouter()
        emit("t", {"x": 1})
    assert not [w for w in caught if w.category is DeprecationWarning]
