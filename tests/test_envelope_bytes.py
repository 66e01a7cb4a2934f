"""Byte-exact envelope parity with the reference producer test
(VERDICT r11 #4 — the broker-free slice of the wire contract).

Every expected string below is transcribed LITERALLY from the
reference's own assertions (``src/producer/__tests__/index.test.ts``):
the value KafkaJS would put on the wire is ``JSON.stringify({...data,
createdAt, appName, code})`` — data keys in insertion order, then the
three envelope keys appended (a data-provided ``createdAt``/``appName``
keeps its value AND position per JS spread semantics), no whitespace,
``createdAt`` in ``YYYY-MM-DD HH:MM:SSZ``. The reference pins these
with MockDate at 2022-12-08T00:00:00Z; we freeze the producer clock the
same way — through the real strftime path, so a format regression
(separator, ordering, padding) fails here byte-for-byte, not just
structurally.
"""

from datetime import datetime, timezone

import pytest

import event_streamer_spark.producer as producer_mod
from event_streamer_spark.config import Config, set_config
from event_streamer_spark.producer import (
    clear_emitted_events,
    emit,
    get_emitted_events,
)

# the reference suite's constants (index.test.ts:9-16, :30)
DEFAULT_TOPIC = "topic-a"
APP_NAME = "event-streamer"
DEFAULT_DATE = "2022-12-08 00:00:00Z"
BODY = {"firstName": "John", "lastName": "Doe"}


class _FrozenDateTime(datetime):
    """datetime whose now() is pinned to the reference's MockDate."""

    @classmethod
    def now(cls, tz=None):  # noqa: D102
        return datetime(2022, 12, 8, 0, 0, 0, tzinfo=tz or timezone.utc)


@pytest.fixture(autouse=True)
def _testing_config(monkeypatch):
    set_config(Config(only_testing=True, app_name=APP_NAME))
    clear_emitted_events()
    monkeypatch.setattr(producer_mod, "datetime", _FrozenDateTime)
    yield
    clear_emitted_events()


def _values() -> list[tuple[str, str]]:
    """(topic, raw wire value) per message, in emit order."""
    return [
        (p.topic, m["value"])
        for p in get_emitted_events()
        for m in p.messages
    ]


def test_single_event_data_overrides_bytes():
    """index.test.ts:33-84: data-provided createdAt + appName keep their
    spread position (after the body keys, before code) and values."""
    emit(
        {
            "topic": DEFAULT_TOPIC,
            "data": {
                **BODY,
                "createdAt": "2022-12-09 00:00:00Z",
                "appName": "tests",
            },
            "eventName": "EventCode",
        }
    )
    assert _values() == [
        (
            "topic-a",
            '{"firstName":"John","lastName":"Doe",'
            '"createdAt":"2022-12-09 00:00:00Z",'
            '"appName":"tests","code":"EventCode"}',
        )
    ]


def test_topic_derived_code_and_default_envelope_bytes():
    """index.test.ts:86-120: no eventName → code = UpperCamel(topic);
    createdAt defaults to the frozen clock in YYYY-MM-DD HH:MM:SSZ,
    appName to config.app_name."""
    emit({"topic": DEFAULT_TOPIC, "data": BODY})
    assert _values() == [
        (
            "topic-a",
            '{"firstName":"John","lastName":"Doe",'
            f'"createdAt":"{DEFAULT_DATE}",'
            f'"appName":"{APP_NAME}","code":"TopicA"}}',
        )
    ]


def test_multi_payload_fanout_bytes():
    """index.test.ts:123-176: a data ARRAY fans out to one message per
    element, same envelope appended to each, array order preserved on
    the wire (the testing sink's parsed view reverses per batch — the
    raw bytes do not)."""
    emit(
        {
            "topic": DEFAULT_TOPIC,
            "eventName": "EventCode",
            "data": [{**BODY, "id": 1}, {**BODY, "id": 2}],
        }
    )
    expected = [
        (
            "topic-a",
            '{"firstName":"John","lastName":"Doe","id":%d,'
            f'"createdAt":"{DEFAULT_DATE}",'
            f'"appName":"{APP_NAME}","code":"EventCode"}}' % i,
        )
        for i in (1, 2)
    ]
    assert _values() == expected


def test_two_topics_two_codes_bytes():
    """index.test.ts:180-240: an output LIST produces one send per
    topic, each with its own kebab→UpperCamel code."""
    emit(
        [
            {
                "topic": "topic-a",
                "eventName": "event-name-a",
                "data": {"id": "topic-a-1"},
            },
            {
                "topic": "topic-b",
                "eventName": "event-name-b",
                "data": {"id": "topic-b-1"},
            },
        ]
    )
    assert _values() == [
        (
            "topic-a",
            '{"id":"topic-a-1",'
            f'"createdAt":"{DEFAULT_DATE}",'
            f'"appName":"{APP_NAME}","code":"EventNameA"}}',
        ),
        (
            "topic-b",
            '{"id":"topic-b-1",'
            f'"createdAt":"{DEFAULT_DATE}",'
            f'"appName":"{APP_NAME}","code":"EventNameB"}}',
        ),
    ]


def test_topic_data_overload_bytes():
    """index.test.ts:243-277: emit(topic, data) positional overload."""
    emit("topic-a", {"id": "topic-a-1"})
    assert _values() == [
        (
            "topic-a",
            '{"id":"topic-a-1",'
            f'"createdAt":"{DEFAULT_DATE}",'
            f'"appName":"{APP_NAME}","code":"TopicA"}}',
        )
    ]


def test_topic_eventname_data_array_overload_bytes():
    """index.test.ts:327-417: emit(topic, event_name, data[]) — the
    three-arg overload with a fan-out array."""
    emit("topic-a", "event-name-a", [{"id": "topic-a-1"}, {"id": "topic-a-2"}])
    assert _values() == [
        (
            "topic-a",
            '{"id":"topic-a-1",'
            f'"createdAt":"{DEFAULT_DATE}",'
            f'"appName":"{APP_NAME}","code":"EventNameA"}}',
        ),
        (
            "topic-a",
            '{"id":"topic-a-2",'
            f'"createdAt":"{DEFAULT_DATE}",'
            f'"appName":"{APP_NAME}","code":"EventNameA"}}',
        ),
    ]


def test_per_message_appname_override_in_fanout_bytes():
    """Per-message appName override inside a fan-out: only the message
    carrying appName keeps it; its siblings get the config default —
    the nullish (??) per-MESSAGE resolution the reference applies in
    its enrichment loop (legacy-producer.ts:36-48)."""
    emit(
        {
            "topic": DEFAULT_TOPIC,
            "eventName": "EventCode",
            "data": [{"id": 1, "appName": "svc-a"}, {"id": 2}],
        }
    )
    assert _values() == [
        (
            "topic-a",
            '{"id":1,"appName":"svc-a",'
            f'"createdAt":"{DEFAULT_DATE}","code":"EventCode"}}',
        ),
        (
            "topic-a",
            '{"id":2,'
            f'"createdAt":"{DEFAULT_DATE}",'
            f'"appName":"{APP_NAME}","code":"EventCode"}}',
        ),
    ]
