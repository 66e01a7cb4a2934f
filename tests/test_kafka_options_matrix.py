"""Exhaustive Kafka option-plumbing matrix (SURVEY §2.A A1/A2/A14).

No broker exists in the test environment, so the reference's live
integration suite (``src/producer/__tests__/index.test.ts``,
``src/consumer/__tests__/index.test.ts``) is mirrored here as an
exhaustive check that every producer/consumer config permutation maps
onto exactly the Spark Kafka connector options it should — the full
compression × idempotence × retry × key_column cross product on the
writer side, and strategy × default cap × specific caps × explicit
trigger limit on the reader side.
"""

import itertools

import pytest

from event_streamer_spark.config import (
    Config,
    ConsumerConfig,
    ProducerConfig,
    reset_config,
    set_config,
)
from event_streamer_spark.consumer import ConsumerRouter
from event_streamer_spark.producer import kafka_writer_options, payload_rows


@pytest.fixture(autouse=True)
def _clean_config():
    yield
    reset_config()


COMPRESSIONS = [None, "gzip", "snappy", "lz4"]
IDEMPOTENT = [False, True]
RETRIES = [
    None,
    {"retries": 3},
    {"retries": 5, "initialRetryTime": 100},
    {"retries": 8, "initialRetryTime": 300, "maxRetryTime": 30000},
    {"initialRetryTime": 50, "maxRetryTime": 1000},
]


class TestWriterOptionMatrix:
    """kafka_writer_options over the full producer-config cross product:
    every option appears iff configured, mapped to its Java client key,
    stringified, with nothing extra."""

    @pytest.mark.parametrize(
        "compression,idempotent,retry",
        list(itertools.product(COMPRESSIONS, IDEMPOTENT, RETRIES)),
    )
    def test_exact_option_set(self, compression, idempotent, retry):
        cfg = Config(
            host="h:9092",
            producer=ProducerConfig(
                compression_type=compression,
                idempotent=idempotent,
                retry_options=retry,
            ),
        )
        expected = {}
        if compression:
            expected["kafka.compression.type"] = compression
        if idempotent:
            expected["kafka.enable.idempotence"] = "true"
        if retry:
            if "retries" in retry:
                expected["kafka.retries"] = str(retry["retries"])
            if "initialRetryTime" in retry:
                expected["kafka.retry.backoff.ms"] = str(
                    retry["initialRetryTime"]
                )
            if "maxRetryTime" in retry:
                expected["kafka.retry.backoff.max.ms"] = str(
                    retry["maxRetryTime"]
                )
        assert kafka_writer_options(cfg) == expected


class TestKeyColumnMatrix:
    """key_column plumbing: the named envelope field becomes the Kafka
    message key in every payload row; absent field → NULL key; no
    key_column → 2-tuple rows (no key column written at all)."""

    def _payloads(self):
        from event_streamer_spark.producer import Output

        return [
            Output(topic="t1", data={"id": 7, "v": "a"}),
            Output(topic="t1", data={"v": "no-id"}),
            Output(topic="t2", event_name="ev-x", data={"id": 9}),
        ]

    def test_with_key_column(self):
        from event_streamer_spark.producer import normalize_payloads

        payloads = normalize_payloads(self._payloads(), "app", "id")
        rows = payload_rows(payloads, "id")
        assert [len(r) for r in rows] == [3, 3, 3]
        keys = [r[2] for r in rows]
        assert keys == ["7", None, "9"]
        topics = [r[0] for r in rows]
        assert topics == ["t1", "t1", "t2"]

    def test_without_key_column(self):
        from event_streamer_spark.producer import normalize_payloads

        payloads = normalize_payloads(self._payloads(), "app", None)
        rows = payload_rows(payloads, None)
        assert all(len(r) == 2 for r in rows)


DEFAULT_CAPS = [20, 5, "unlimited"]
SPECIFIC_CAPS = [
    {},
    {"hot": 5},
    {"hot": "unlimited"},
    {"hot": 5, "b": 50},
]
EXPLICIT = [None, 7]


class TestReaderOptionMatrix:
    """kafka_sources_spec over strategy × default cap × specific caps ×
    explicit trigger limit: per-source subscriptions partition the topic
    set, limits follow the reference queue semantics, group ids are
    distinct, and checkpoint suffixes are role-stable."""

    def _router(self):
        r = ConsumerRouter.__new__(ConsumerRouter)
        r.routes, r._queries = [], []
        r.add(["a", "hot", "b"], lambda c, e: None)
        return r

    @pytest.mark.parametrize(
        "default_cap,specific,explicit",
        list(itertools.product(DEFAULT_CAPS, SPECIFIC_CAPS, EXPLICIT)),
    )
    def test_topic_strategy_matrix(self, default_cap, specific, explicit):
        set_config(
            Config(
                host="h:9092",
                consumer=ConsumerConfig(
                    group_id="g",
                    strategy="topic",
                    max_messages_per_topic=default_cap,
                    max_messages_per_specific_topic=specific,
                ),
            )
        )
        specs = self._router().kafka_sources_spec(explicit)

        # subscriptions partition the routed topics exactly
        subscribed = [
            t for opts, _ in specs for t in opts["subscribe"].split(",")
        ]
        assert sorted(subscribed) == ["a", "b", "hot"]

        shared_topics = [t for t in ["a", "hot", "b"] if t not in specific]
        n_sources = (1 if shared_topics else 0) + len(
            [t for t in specific if t in ("a", "hot", "b")]
        )
        assert len(specs) == n_sources

        by_suffix = {s: o for o, s in specs}
        # group ids distinct; shared source keeps the configured group id
        group_ids = [o["kafka.group.id"] for o, _ in specs]
        assert len(group_ids) == len(set(group_ids))
        if shared_topics:
            assert by_suffix["shared"]["kafka.group.id"] == "g"
            assert by_suffix["shared"]["subscribe"] == ",".join(shared_topics)

        for opts, suffix in specs:
            assert opts["kafka.bootstrap.servers"] == "h:9092"
            assert opts["startingOffsets"] == "latest"
            topics = opts["subscribe"].split(",")
            if suffix == "shared":
                if explicit is not None:
                    expected = explicit
                elif default_cap == "unlimited":
                    expected = None
                else:
                    expected = default_cap * len(topics)
            else:
                topic = topics[0]
                assert suffix == f"topic-{topic}"
                assert opts["kafka.group.id"] == f"g-topic-{topic}"
                cap = specific[topic]
                cap = None if cap == "unlimited" else cap
                if explicit is not None:
                    expected = explicit if cap is None else min(cap, explicit)
                else:
                    expected = cap
            if expected is None:
                assert "maxOffsetsPerTrigger" not in opts, (suffix, opts)
            else:
                assert opts["maxOffsetsPerTrigger"] == str(expected), (
                    suffix,
                    opts,
                )

    @pytest.mark.parametrize(
        "default_cap,specific,explicit",
        list(itertools.product(DEFAULT_CAPS, SPECIFIC_CAPS, EXPLICIT)),
    )
    def test_one_by_one_matrix(self, default_cap, specific, explicit):
        # one-by-one always collapses to ONE shared-identity source with
        # a global limit; specific caps are ignored (reference parity)
        set_config(
            Config(
                host="h:9092",
                consumer=ConsumerConfig(
                    group_id="g",
                    strategy="one-by-one",
                    max_messages_per_topic=default_cap,
                    max_messages_per_specific_topic=specific,
                ),
            )
        )
        specs = self._router().kafka_sources_spec(explicit)
        assert len(specs) == 1
        opts, suffix = specs[0]
        assert suffix == "shared"
        assert opts["kafka.group.id"] == "g"
        assert sorted(opts["subscribe"].split(",")) == ["a", "b", "hot"]
        if explicit is not None:
            expected = explicit
        elif default_cap == "unlimited":
            expected = None
        else:
            expected = default_cap * 3
        if expected is None:
            assert "maxOffsetsPerTrigger" not in opts
        else:
            assert opts["maxOffsetsPerTrigger"] == str(expected)
