"""Producer testing-mode behavior (reference
``src/producer/__tests__/index.test.ts``; SURVEY §2.A A8/A11/A13/A18)."""

import json
import re

import pytest

from event_streamer_spark.config import Config, set_config
from event_streamer_spark.producer import (
    Output,
    clear_emitted_events,
    emit,
    get_emitted_events,
    get_parsed_emitted_events,
)


def _testing_config(**kw):
    cfg = Config(host="h:9092", app_name="event-streamer", only_testing=True, **kw)
    set_config(cfg)
    return cfg


CREATED_AT_RE = re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}Z$")


class TestEnvelope:
    def test_envelope_fields(self):
        _testing_config()
        emit("my-topic", {"prop": "a"})
        [payload] = get_emitted_events()
        assert payload.topic == "my-topic"
        [msg] = payload.messages
        data = json.loads(msg["value"])
        assert data["code"] == "MyTopic"  # UpperCamelCase(topic)
        assert data["appName"] == "event-streamer"
        assert CREATED_AT_RE.match(data["createdAt"])
        assert data["prop"] == "a"

    def test_event_name_overload(self):
        _testing_config()
        emit("my-topic", "some-event", {"prop": "a"})
        data = json.loads(get_emitted_events()[0].messages[0]["value"])
        assert data["code"] == "SomeEvent"

    def test_user_created_at_wins(self):
        _testing_config()
        emit("t", {"prop": "a", "createdAt": "2020-01-01 00:00:00Z"})
        data = json.loads(get_emitted_events()[0].messages[0]["value"])
        assert data["createdAt"] == "2020-01-01 00:00:00Z"

    def test_per_message_app_name_wins(self):
        _testing_config()
        emit("t", {"prop": "a", "appName": "custom"})
        data = json.loads(get_emitted_events()[0].messages[0]["value"])
        assert data["appName"] == "custom"

    def test_key_order_payload_first(self):
        # JSON.stringify insertion-order parity (SURVEY §7 hard part a)
        _testing_config()
        emit("t", {"z": 1, "a": 2})
        raw = get_emitted_events()[0].messages[0]["value"]
        assert list(json.loads(raw).keys()) == ["z", "a", "createdAt", "appName", "code"]


class TestFanOutAndOverloads:
    def test_array_fan_out(self):
        _testing_config()
        emit("t", [{"i": 1}, {"i": 2}, {"i": 3}])
        [payload] = get_emitted_events()
        assert len(payload.messages) == 3

    def test_multi_output(self):
        _testing_config()
        emit([
            {"topic": "a", "data": {"x": 1}},
            {"topic": "b", "event_name": "ev-b", "data": {"y": 2}},
        ])
        payloads = get_emitted_events()
        assert [p.topic for p in payloads] == ["a", "b"]
        data_b = json.loads(payloads[1].messages[0]["value"])
        assert data_b["code"] == "EvB"

    def test_output_dataclass(self):
        _testing_config()
        emit(Output(topic="t", event_name="my-ev", data={"x": 1}))
        data = json.loads(get_emitted_events()[0].messages[0]["value"])
        assert data["code"] == "MyEv"


class TestValidation:
    def test_non_object_data(self):
        _testing_config()
        with pytest.raises(ValueError, match="Data must be an object"):
            emit("t", "not-an-object")

    def test_empty_array(self):
        _testing_config()
        with pytest.raises(ValueError, match="can't be empty"):
            emit("t", [])

    def test_reserved_code_key(self):
        _testing_config()
        with pytest.raises(ValueError, match='Reserved object keyword "code"'):
            emit("t", {"code": "x"})

    def test_blank_event_name(self):
        _testing_config()
        with pytest.raises(ValueError, match="Invalid message code"):
            emit("t", "   ", {"x": 1})

    def test_uninitialized_raises(self):
        with pytest.raises(RuntimeError, match="not initialized"):
            emit("t", {"x": 1})


class TestTestingSink:
    def test_parsed_events_shape(self):
        _testing_config()
        emit("t", "my-event", {"x": 1})
        [ev] = get_parsed_emitted_events()
        assert ev["topic"] == "t"
        assert ev["event_name"] == "MyEvent"
        assert ev["data"]["x"] == 1

    def test_parsed_reverses_within_batch(self):
        # parity quirk: reference legacy-producer.ts:77 (.reverse() per batch)
        _testing_config()
        emit("t", [{"i": 1}, {"i": 2}])
        parsed = get_parsed_emitted_events()
        assert [e["data"]["i"] for e in parsed] == [2, 1]

    def test_batches_stay_ordered(self):
        _testing_config()
        emit("t", {"i": 1})
        emit("t", {"i": 2})
        parsed = get_parsed_emitted_events()
        assert [e["data"]["i"] for e in parsed] == [1, 2]

    def test_clear(self):
        _testing_config()
        emit("t", {"x": 1})
        clear_emitted_events()
        assert get_emitted_events() == []

    def test_sink_guard_without_testing_mode(self):
        set_config(Config(host="h", only_testing=False))
        with pytest.raises(RuntimeError, match="only_testing"):
            get_emitted_events()


class TestWriterOptions:
    """A2 parity: retryOptions → Java producer options; key column →
    partitioner analog (reference ``legacy-producer.ts:100,106``)."""

    def test_retry_options_mapping(self):
        from event_streamer_spark.config import ProducerConfig
        from event_streamer_spark.producer import kafka_writer_options

        cfg = Config(
            host="h:9092",
            producer=ProducerConfig(
                compression_type="gzip",
                idempotent=True,
                retry_options={
                    "retries": 5,
                    "initialRetryTime": 300,
                    "maxRetryTime": 30000,
                },
            ),
        )
        assert kafka_writer_options(cfg) == {
            "kafka.compression.type": "gzip",
            "kafka.enable.idempotence": "true",
            "kafka.retries": "5",
            "kafka.retry.backoff.ms": "300",
            "kafka.retry.backoff.max.ms": "30000",
        }

    def test_no_retry_options_no_kafka_keys(self):
        from event_streamer_spark.producer import kafka_writer_options

        assert kafka_writer_options(Config(host="h:9092")) == {}

    def test_partial_retry_options(self):
        from event_streamer_spark.config import ProducerConfig
        from event_streamer_spark.producer import kafka_writer_options

        cfg = Config(
            host="h", producer=ProducerConfig(retry_options={"retries": 2})
        )
        assert kafka_writer_options(cfg) == {"kafka.retries": "2"}

    def test_key_column_rows(self):
        import json

        from event_streamer_spark.producer import (
            Output,
            normalize_payloads,
            payload_rows,
        )

        payloads = normalize_payloads(
            [Output(topic="t", data=[{"id": 7, "x": 1}, {"x": 2}])], "app"
        )
        with_key = payload_rows(payloads, "id")
        assert [r[0] for r in with_key] == ["t", "t"]
        assert with_key[0][2] == "7"  # envelope field → Kafka message key
        assert with_key[1][2] is None  # absent key field → null key
        without = payload_rows(payloads, None)
        assert all(len(r) == 2 for r in without)
        assert json.loads(without[0][1])["x"] == 1


class TestNullishEnvelope:
    """Reference ?? semantics: present-but-falsy createdAt/appName are
    preserved verbatim (``legacy-producer.ts:36-48``)."""

    def test_empty_string_created_at_preserved(self):
        import json

        from event_streamer_spark.producer import Output, normalize_payloads

        p = normalize_payloads(
            [Output(topic="t", data={"createdAt": "", "appName": ""})], "app"
        )
        env = json.loads(p[0].messages[0]["value"])
        assert env["createdAt"] == "" and env["appName"] == ""

    def test_none_created_at_gets_default(self):
        import json

        from event_streamer_spark.producer import Output, normalize_payloads

        p = normalize_payloads(
            [Output(topic="t", data={"createdAt": None})], "app"
        )
        env = json.loads(p[0].messages[0]["value"])
        assert env["createdAt"] and env["appName"] == "app"
