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


class TestZorderWrite:
    """Z-order clustering must give every file a narrow min/max range in
    BOTH dimensions (footer-stat skipping for 2-d box predicates), where
    a plain sort clusters only its leading column."""

    def _file_ranges(self, out, cols):
        import pyarrow.parquet as pq

        ranges = []
        for f in sorted(glob.glob(out + "/*.parquet")):
            md = pq.read_metadata(f)
            lo = {c: None for c in cols}
            hi = {c: None for c in cols}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name in cols and col.statistics is not None:
                        s = col.statistics
                        lo[name] = (
                            s.min if lo[name] is None else min(lo[name], s.min)
                        )
                        hi[name] = (
                            s.max if hi[name] is None else max(hi[name], s.max)
                        )
            ranges.append((lo, hi))
        return ranges

    @staticmethod
    def _files_overlapping_box(ranges, box):
        n = 0
        for lo, hi in ranges:
            if all(hi[c] >= b_lo and lo[c] <= b_hi for c, (b_lo, b_hi) in box.items()):
                n += 1
        return n

    def test_box_predicate_skips_files(self, spark, tmp_path):
        from event_streamer_spark.writers import zorder_write

        ev = load(spark, SF, "events").select("event_id", "user_id", "value")
        n_rows = ev.count()
        zout = str(tmp_path / "zorder")
        sout = str(tmp_path / "sorted")
        zorder_write(ev, zout, ["user_id", "value"], n_files=16)
        # baseline: single-dimension sort (clusters user_id only)
        (
            ev.repartitionByRange(16, "user_id")
            .sortWithinPartitions("user_id")
            .write.parquet(sout)
        )

        # rows preserved bit-for-bit (set equality on the key)
        assert spark.read.parquet(zout).count() == n_rows
        assert (
            spark.read.parquet(zout).select("event_id").exceptAll(
                ev.select("event_id")
            ).count()
            == 0
        )

        cols = ("user_id", "value")
        zr = self._file_ranges(zout, cols)
        sr = self._file_ranges(sout, cols)
        # repartitionByRange may emit fewer files when sampled range
        # bounds collide — both layouts just need enough files to skip
        assert len(zr) >= 8 and len(sr) >= 8, (len(zr), len(sr))

        # a box covering ~1/4 of each dimension
        stats = ev.agg(
            F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
        ).collect()[0]
        u_lo, u_hi, v_lo, v_hi = stats
        box = {
            "user_id": (u_lo, u_lo + (u_hi - u_lo) // 4),
            "value": (v_lo, v_lo + (v_hi - v_lo) / 4),
        }
        z_hit = self._files_overlapping_box(zr, box)
        s_hit = self._files_overlapping_box(sr, box)
        # z-order skips on BOTH dims: a 2-d box touching a quarter of
        # each dimension must prune at least half the files (a ~4x4
        # Morton tiling leaves ~1/4 + boundary files)
        assert z_hit <= len(zr) // 2, (z_hit, len(zr))

        # a predicate on the NON-leading dim alone: the 1-d sort reads
        # EVERYTHING (every file spans value's range); z-order skips
        vbox = {"value": (v_lo, v_lo + (v_hi - v_lo) / 8)}
        z_v = self._files_overlapping_box(
            [({"value": lo["value"]}, {"value": hi["value"]}) for lo, hi in zr],
            vbox,
        )
        s_v = self._files_overlapping_box(
            [({"value": lo["value"]}, {"value": hi["value"]}) for lo, hi in sr],
            vbox,
        )
        assert s_v == len(sr)  # 1-d sort: no skipping on value
        assert z_v < s_v, (z_v, s_v)

        # mixed 2-d workload (the z-order trade): slightly weaker
        # leading-dim pruning, massively better non-leading pruning —
        # fewer files read overall, normalized for file counts
        assert (z_hit + z_v) / len(zr) < (s_hit + s_v) / len(sr), (
            (z_hit, z_v, len(zr)),
            (s_hit, s_v, len(sr)),
        )


class TestReadPruned:
    """Manifest-style footer pruning: correct (superset of the true
    result) and effective on a z-ordered layout."""

    def test_pruned_read_is_exact_after_predicate(self, spark, tmp_path):
        from event_streamer_spark.writers import read_pruned, zorder_write

        ev = load(spark, SF, "events").select("event_id", "user_id", "value")
        out = str(tmp_path / "zo")
        zorder_write(ev, out, ["user_id", "value"], n_files=16)

        stats = ev.agg(
            F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
        ).collect()[0]
        u_lo, u_hi, v_lo, v_hi = stats
        box = {
            "user_id": (u_lo, u_lo + (u_hi - u_lo) // 4),
            "value": (v_lo, v_lo + (v_hi - v_lo) / 4),
        }
        pruned = read_pruned(spark, out, box).filter(
            F.col("user_id").between(*box["user_id"])
            & F.col("value").between(*box["value"])
        )
        expect = ev.filter(
            F.col("user_id").between(*box["user_id"])
            & F.col("value").between(*box["value"])
        )
        assert pruned.count() == expect.count() > 0
        assert (
            pruned.select("event_id").exceptAll(expect.select("event_id")).count()
            == 0
        )
        # effectiveness: the prune must drop files on the z-ordered layout
        from event_streamer_spark.writers import file_column_ranges

        n_total = len(glob.glob(out + "/*.parquet"))
        kept = 0
        for f, lo, hi in file_column_ranges(out, ["user_id", "value"]):
            if lo is None:
                kept += 1
                continue
            if (
                hi["user_id"] >= box["user_id"][0]
                and lo["user_id"] <= box["user_id"][1]
                and hi["value"] >= box["value"][0]
                and lo["value"] <= box["value"][1]
            ):
                kept += 1
        assert kept < n_total, (kept, n_total)

    def test_empty_prune_keeps_schema(self, spark, tmp_path):
        from event_streamer_spark.writers import read_pruned, zorder_write

        ev = load(spark, SF, "events").select("event_id", "user_id", "value")
        out = str(tmp_path / "zo2")
        zorder_write(ev, out, ["user_id"], n_files=4)
        empty = read_pruned(spark, out, {"user_id": (10**12, None)})
        assert empty.count() == 0
        assert set(empty.columns) == {"event_id", "user_id", "value"}


def test_zorder_write_handles_nulls(spark, tmp_path):
    from event_streamer_spark.writers import zorder_write

    df = spark.createDataFrame(
        [(i, None if i % 7 == 0 else i * 3, float(i % 50)) for i in range(200)],
        "id bigint, a bigint, b double",
    )
    out = str(tmp_path / "zo_null")
    zorder_write(df, out, ["a", "b"], n_files=4)
    back = spark.read.parquet(out)
    assert back.count() == 200
    assert back.filter(F.col("a").isNull()).count() == df.filter(
        F.col("a").isNull()
    ).count()


def test_read_pruned_keeps_statless_empty_file(spark, tmp_path):
    """A zero-row-group part file (Spark's empty-frame write) has no
    footer stats; read_pruned must keep it conservatively, not crash."""
    from event_streamer_spark.writers import read_pruned

    out = str(tmp_path / "mixed")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id bigint, v double"
    )
    df.coalesce(1).write.parquet(out)
    # add an empty part file alongside (what writing an empty frame does)
    df.limit(0).coalesce(1).write.mode("append").parquet(out)
    got = read_pruned(spark, out, {"v": (10.0, 20.0)}).filter(
        F.col("v").between(10.0, 20.0)
    )
    assert got.count() == 11


class TestSnapshotDiff:
    def test_insert_delete_update_and_null_sentinel(self, spark):
        from event_streamer_spark.writers import snapshot_diff

        old = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0),
             (4, "", 40.0), (5, "e", None)],
            "k int, s string, v double",
        )
        new = spark.createDataFrame(
            [(2, "b", 20.0),        # unchanged
             (3, "", 30.0),         # NULL -> '' must read as update
             (4, "", 41.0),         # value update
             (5, "e", None),        # unchanged with NULL value
             (6, "f", 60.0)],       # insert
            "k int, s string, v double",
        )
        got = {
            r["k"]: r["change_type"]
            for r in snapshot_diff(old, new, ["k"]).collect()
        }
        assert got == {
            1: "delete",
            3: "update",
            4: "update",
            6: "insert",
        }

    def test_compare_cols_scopes_the_diff(self, spark):
        from event_streamer_spark.writers import snapshot_diff

        old = spark.createDataFrame([(1, "a", 1)], "k int, s string, v int")
        new = spark.createDataFrame([(1, "a", 2)], "k int, s string, v int")
        assert snapshot_diff(old, new, ["k"], ["s"]).count() == 0
        assert (
            snapshot_diff(old, new, ["k"], ["v"]).collect()[0]["change_type"]
            == "update"
        )


class TestSnapshotDiffEdges:
    def test_existence_only_diff(self, spark):
        """Review r8: an empty compare set is the existence diff —
        inserts/deletes only, never a crash from a zero-arg hash."""
        from event_streamer_spark.writers import snapshot_diff

        old = spark.createDataFrame([(1,), (2,)], "k int")
        new = spark.createDataFrame([(2,), (3,)], "k int")
        got = {r["k"]: r["change_type"]
               for r in snapshot_diff(old, new, ["k"]).collect()}
        assert got == {1: "delete", 3: "insert"}

    def test_null_never_collides_with_sentinel_string(self, spark):
        from event_streamer_spark.writers import snapshot_diff

        old = spark.createDataFrame([(1, None)], "k int, s string")
        new = spark.createDataFrame([(1, "\x00null")], "k int, s string")
        rows = snapshot_diff(old, new, ["k"]).collect()
        assert [r["change_type"] for r in rows] == ["update"]
