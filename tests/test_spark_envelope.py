"""Spark-side envelope/dispatch parity with the pure-Python reference
semantics (SURVEY §2.A A3/A5/A11/A12)."""

import pytest
from pyspark.sql import functions as F

from event_streamer_spark.consumer import ConsumerRouter
from event_streamer_spark.envelope import (
    parse_stream,
    serialize,
    upper_camel_col,
    with_envelope,
)
from event_streamer_spark.helpers import to_upper_camel_case


CASES = [
    "event-code-c",
    "my_event_name",
    "my event",
    "myEventName",
    "EventName",
    "topic",
    "a--b__c  d",
    "foo-bar_baz qux",
]


def test_upper_camel_col_matches_python(spark):
    """A12: the column expression and the Python helper must agree."""
    df = spark.createDataFrame([(s,) for s in CASES], "s string")
    got = {
        r["s"]: r["camel"]
        for r in df.withColumn("camel", upper_camel_col("s")).collect()
    }
    for s in CASES:
        assert got[s] == to_upper_camel_case(s), s


def test_with_envelope_user_values_win(spark):
    df = spark.createDataFrame(
        [("x", "2020-01-01 00:00:00Z"), ("y", None)],
        "prop string, createdAt string",
    )
    out = with_envelope(df, code="my-event", app_name="svc").collect()
    byprop = {r["prop"]: r for r in out}
    assert byprop["x"]["createdAt"] == "2020-01-01 00:00:00Z"  # user wins
    assert byprop["y"]["createdAt"].endswith("Z")  # default format
    assert byprop["x"]["appName"] == "svc"
    assert byprop["x"]["code"] == "MyEvent"


def test_serialize_roundtrip(spark):
    df = spark.createDataFrame([(1, "a")], "id bigint, s string")
    [row] = serialize(df).collect()
    assert row["value"] == '{"id":1,"s":"a"}'


def test_parse_stream_drops_corrupt(spark):
    """A3: invalid JSON and non-object JSON are silently dropped."""
    rows = [
        ("t", '{"code": "Ok", "v": 1}'),
        ("t", "{nope"),
        ("t", None),
        ("t", "[1,2]"),
        ("t", '{"code": "Ok2", "v": 2}'),
    ]
    df = spark.createDataFrame(rows, "topic string, value string")
    out = parse_stream(df, "code string, v bigint").collect()
    assert sorted(r["v"] for r in out) == [1, 2]
    assert all(r["topic"] == "t" for r in out)


def test_drop_corrupt_structtype_with_colon_field(spark):
    """Regression: a StructType with ``:`` in a field name must survive —
    the old simpleString→DDL round-trip corrupted such names."""
    import json

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from event_streamer_spark.envelope import drop_corrupt

    schema = StructType(
        [
            StructField("ns:code", StringType()),
            StructField("v", LongType()),
        ]
    )
    rows = [
        ("t", json.dumps({"ns:code": "Ok", "v": 1})),
        ("t", "{nope"),
        ("t", json.dumps({"ns:code": "Ok2", "v": 2})),
    ]
    df = spark.createDataFrame(rows, "topic string, value string")
    out = drop_corrupt(df, schema).collect()
    # corrupt row dropped, original columns kept
    assert len(out) == 2
    assert sorted(json.loads(r["value"])["v"] for r in out) == [1, 2]


def test_parse_stream_structtype_with_colon_field(spark):
    import json

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("ns:code", StringType()),
            StructField("v", LongType()),
        ]
    )
    rows = [
        ("t", json.dumps({"ns:code": "Ok", "v": 1})),
        ("t", "[1,2]"),
    ]
    df = spark.createDataFrame(rows, "topic string, value string")
    out = parse_stream(df, schema).collect()
    assert len(out) == 1
    assert out[0]["ns:code"] == "Ok" and out[0]["v"] == 1


def test_compile_routes_batch_dispatch(spark):
    """A5 predicate as DataFrame branches over a batch frame."""
    router = ConsumerRouter()
    router.add("a", "ev-one", None)
    router.add("a", None)
    router.add("b", "ev-one", None)
    rows = [
        ("a", "EvOne", 1),
        ("a", "Other", 2),
        ("b", "EvOne", 3),
        ("c", "EvOne", 4),
    ]
    df = spark.createDataFrame(rows, "topic string, code string, v int")
    branches = router.compile(df)
    got = [sorted(r["v"] for r in branch.collect()) for _, branch in branches]
    assert got == [[1], [1, 2], [3]]


def test_transform_route(spark):
    """Declarative transform routes compose with the predicate filter."""
    router = ConsumerRouter()
    router.add(
        "a",
        transform=lambda df: df.withColumn("v2", F.col("v") * 2).select("v2"),
    )
    df = spark.createDataFrame(
        [("a", "X", 1), ("b", "X", 5)], "topic string, code string, v int"
    )
    [(route, branch)] = router.compile(df)
    assert [r["v2"] for r in branch.collect()] == [2]
