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


class TestMergeUpsert:
    """Keyed MERGE into a hive-partitioned directory: updates win,
    inserts land, untouched partitions keep their files byte-for-byte."""

    def _seed(self, spark, path):
        from event_streamer_spark.writers import write_partitioned

        base = spark.createDataFrame(
            [(1, "a", "p1", 10), (2, "b", "p1", 20),
             (3, "c", "p2", 30), (4, "d", "p3", 40)],
            "id int, name string, part string, v int",
        )
        write_partitioned(base, path, ["part"])

    def test_upsert_touches_only_affected_partitions(self, spark, tmp_path):
        import os

        from event_streamer_spark.writers import merge_upsert

        out = str(tmp_path / "target")
        self._seed(spark, out)
        p3_files = {
            f: os.path.getmtime(os.path.join(out, "part=p3", f))
            for f in os.listdir(out + "/part=p3")
            if f.endswith(".parquet")
        }
        updates = spark.createDataFrame(
            [(2, "B2", "p1", 21),   # update existing key in p1
             (5, "e", "p2", 50)],   # insert new key into p2
            "id int, name string, part string, v int",
        )
        stats = merge_upsert(spark, out, updates, ["id"], ["part"])
        assert stats == {"touched_partitions": 2}

        rows = {
            r["id"]: (r["name"], r["part"], r["v"])
            for r in spark.read.parquet(out).collect()
        }
        assert rows == {
            1: ("a", "p1", 10), 2: ("B2", "p1", 21), 3: ("c", "p2", 30),
            4: ("d", "p3", 40), 5: ("e", "p2", 50),
        }
        # p3 untouched: identical file names AND mtimes
        p3_after = {
            f: os.path.getmtime(os.path.join(out, "part=p3", f))
            for f in os.listdir(out + "/part=p3")
            if f.endswith(".parquet")
        }
        assert p3_after == p3_files

    def test_latest_wins_within_update_batch(self, spark, tmp_path):
        from event_streamer_spark.writers import merge_upsert, write_partitioned

        out = str(tmp_path / "target2")
        base = spark.createDataFrame(
            [(1, "a", "p1", 10, 0), (2, "b", "p1", 20, 0)],
            "id int, name string, part string, v int, seq int",
        )
        write_partitioned(base, out, ["part"])
        updates = spark.createDataFrame(
            [(2, "old", "p1", 100, 1), (2, "new", "p1", 200, 2)],
            "id int, name string, part string, v int, seq int",
        )
        merge_upsert(spark, out, updates, ["id"], ["part"], order_col="seq")
        merged = spark.read.parquet(out).filter("id = 2").collect()
        assert len(merged) == 1
        assert (merged[0]["name"], merged[0]["v"]) == ("new", 200)
        assert spark.read.parquet(out).filter("id = 1").count() == 1

    def test_creates_target_when_missing(self, spark, tmp_path):
        from event_streamer_spark.writers import merge_upsert

        out = str(tmp_path / "fresh")
        updates = spark.createDataFrame(
            [(1, "a", "p1", 10)], "id int, name string, part string, v int"
        )
        stats = merge_upsert(spark, out, updates, ["id"], ["part"])
        assert stats == {"touched_partitions": 1}
        assert spark.read.parquet(out).count() == 1

    def test_partition_overwrite_mode_restored(self, spark, tmp_path):
        from event_streamer_spark.writers import merge_upsert

        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        out = str(tmp_path / "target3")
        self._seed(spark, out)
        updates = spark.createDataFrame(
            [(1, "z", "p1", 99)], "id int, name string, part string, v int"
        )
        merge_upsert(spark, out, updates, ["id"], ["part"])
        assert spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        ) == prev

    def test_requires_partition_columns(self, spark, tmp_path):
        from event_streamer_spark.writers import merge_upsert

        out = str(tmp_path / "target4")
        self._seed(spark, out)
        updates = spark.createDataFrame(
            [(1, "z", "p1", 99)], "id int, name string, part string, v int"
        )
        with pytest.raises(ValueError, match="partition column"):
            merge_upsert(spark, out, updates, ["id"], [])

    def test_randomized_upsert_sequence_matches_dict_model(self, spark, tmp_path):
        """Three rounds of seeded-random update batches must leave the
        table exactly equal to a plain dict model (key -> latest row),
        across multi-partition updates, repeated keys, and inserts."""
        import random

        from event_streamer_spark.writers import merge_upsert, write_partitioned

        rng = random.Random(17)
        parts = ["p0", "p1", "p2"]
        # every key is born in one fixed partition and stays there (the
        # documented stable-partition precondition)
        home = {k: parts[k % 3] for k in range(40)}

        model = {}
        base_rows = []
        for k in range(0, 20):
            v = rng.randrange(1000)
            model[k] = (home[k], v)
            base_rows.append((k, home[k], v))
        out = str(tmp_path / "rand_target")
        write_partitioned(
            spark.createDataFrame(base_rows, "id int, part string, v int"),
            out,
            ["part"],
        )

        for _ in range(3):
            batch = []
            for k in rng.sample(range(40), 12):
                v = rng.randrange(1000)
                model[k] = (home[k], v)
                batch.append((k, home[k], v))
            merge_upsert(
                spark,
                out,
                spark.createDataFrame(batch, "id int, part string, v int"),
                ["id"],
                ["part"],
            )

        got = {
            r["id"]: (r["part"], r["v"])
            for r in spark.read.parquet(out).collect()
        }
        assert got == model
