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
