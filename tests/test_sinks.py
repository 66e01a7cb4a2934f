"""DLQ routing (A16 upgrade) — split good/poison records declaratively."""

from pyspark.sql import functions as F

from event_streamer_spark.sinks import with_dlq


def test_with_dlq_splits_rows(spark):
    rows = [
        ("a", '{"k": 1}'),
        ("b", "{broken"),
        ("c", '{"k": 3}'),
        ("d", "also broken"),
    ]
    df = spark.createDataFrame(rows, "id string, payload string")
    ok, dlq = with_dlq(
        df,
        lambda c: F.get_json_object(c, "$.k"),  # NULL on malformed JSON
        "payload",
        "parsed",
    )
    assert sorted(r["id"] for r in ok.collect()) == ["a", "c"]
    bad = dlq.collect()
    assert sorted(r["id"] for r in bad) == ["b", "d"]
    # dead letters keep the raw payload for replay
    assert all(r["payload"] is not None for r in bad)


class TestJsonlEventsDataSource:
    """Spark 4 Python Data Source: JSONL event logs as a first-class
    format — per-file partitions, A3 corrupt-line drop, topic routing."""

    def _write_logs(self, tmp_path):
        import json

        a = tmp_path / "a.jsonl"
        a.write_text(
            "\n".join(
                [
                    json.dumps({"topic": "orders", "code": "T1", "v": 1}),
                    "{corrupt json",
                    json.dumps({"code": "NoTopic", "v": 2}),  # default topic
                    "",
                ]
            )
        )
        b = tmp_path / "b.jsonl"
        b.write_text(json.dumps({"topic": "billing", "v": 3}))
        (tmp_path / "ignored.txt").write_text("not a log")
        return str(tmp_path)

    def test_read_routes_and_drops_corrupt(self, spark, tmp_path):
        import json

        from event_streamer_spark.sources.jsonl_events import (
            JsonlEventsDataSource,
        )

        spark.dataSource.register(JsonlEventsDataSource)
        df = (
            spark.read.format("jsonl_events")
            .option("path", self._write_logs(tmp_path))
            .load()
        )
        assert df.columns == ["topic", "value"]
        rows = sorted(
            (r["topic"], json.loads(r["value"])["v"]) for r in df.collect()
        )
        assert rows == [("billing", 3), ("events", 2), ("orders", 1)]
        # per-file parallelism: two .jsonl files → two partitions
        assert df.rdd.getNumPartitions() == 2

    def test_feeds_router_dispatch(self, spark, tmp_path):
        import json

        from event_streamer_spark.config import (
            Config,
            ConsumerConfig,
            set_config,
        )
        from event_streamer_spark.consumer import ConsumerRouter
        from event_streamer_spark.helpers import get_parsed_json
        from event_streamer_spark.sources.jsonl_events import (
            JsonlEventsDataSource,
        )

        spark.dataSource.register(JsonlEventsDataSource)
        set_config(
            Config(host="h:9092",
                   consumer=ConsumerConfig(group_id="g"))
        )
        seen = []
        router = ConsumerRouter()
        router.add("orders", "T1", lambda c, e: seen.append(c["v"]))
        df = (
            spark.read.format("jsonl_events")
            .option("path", self._write_logs(tmp_path))
            .load()
        )
        for row in df.collect():
            router.dispatch_message(row["topic"], get_parsed_json(row["value"]))
        assert seen == [1]
