"""Config singleton + app_name chain (reference ``src/config/__tests__``,
producer test ``:551-565``; SURVEY §1.2/§1.4)."""

import pytest

from event_streamer_spark.config import (
    Config,
    ConsumerConfig,
    get_config,
    resolve_app_name,
    set_config,
)


def test_get_before_set_raises():
    with pytest.raises(RuntimeError, match="Event streamer not initialized"):
        get_config()


def test_set_then_get():
    cfg = Config(host="localhost:9092", only_testing=True)
    set_config(cfg)
    assert get_config() is cfg


def test_defaults():
    cfg = Config()
    assert cfg.producer.connection_ttl == 5000
    assert cfg.consumer.max_messages_per_topic == 20
    assert cfg.consumer.strategy == "topic"
    assert cfg.only_testing is False


class TestAppNameChain:
    def test_message_wins(self):
        cfg = Config(app_name="cfg-app")
        assert resolve_app_name("msg-app", cfg) == "msg-app"

    def test_config_app_name(self):
        cfg = Config(app_name="cfg-app", consumer=ConsumerConfig(group_id="grp"))
        assert resolve_app_name(None, cfg) == "cfg-app"

    def test_group_id_fallback(self):
        cfg = Config(consumer=ConsumerConfig(group_id="grp"))
        assert resolve_app_name(None, cfg) == "grp"

    def test_hostname_pod_strip(self, monkeypatch):
        monkeypatch.setenv("HOSTNAME", "my-service-name-abcd-1234")
        assert resolve_app_name(None, Config()) == "my-service-name"

    def test_hostname_short_kept(self, monkeypatch):
        monkeypatch.setenv("HOSTNAME", "my-host")
        assert resolve_app_name(None, Config()) == "my-host"

    def test_unknown(self, monkeypatch):
        monkeypatch.delenv("HOSTNAME", raising=False)
        assert resolve_app_name(None, Config()) == "unknown"


def test_hosts_with_additional():
    cfg = Config(host="a:9092")
    cfg.producer.additional_hosts = ["b:9092"]
    assert cfg.hosts() == ["a:9092", "b:9092"]


class TestDebugLevels:
    """A20: reference numeric values and gate direction
    (``interfaces/index.ts:3-11``, ``helpers/index.ts:24-43``) — raw
    integers from a reference config select the same verbosity."""

    def test_reference_numeric_values(self):
        from event_streamer_spark.debug import Debug

        assert [Debug.TRACE, Debug.DEBUG, Debug.INFO, Debug.WARN,
                Debug.ERROR, Debug.FATAL, Debug.NONE] == [0, 1, 2, 3, 4, 5, 6]

    def test_gate_direction(self, caplog):
        import logging

        from event_streamer_spark.config import Config, set_config
        from event_streamer_spark.debug import Debug, debug

        set_config(Config(host="h", debug=Debug.WARN))  # 3
        with caplog.at_level(logging.DEBUG, logger="event_streamer_spark"):
            debug(Debug.INFO, "hidden")   # 2 < 3 → silent
            debug(Debug.ERROR, "shown")   # 4 >= 3 → logged
        assert "hidden" not in caplog.text and "shown" in caplog.text

    def test_unset_false_and_none_level_silent(self, caplog):
        import logging

        from event_streamer_spark.config import Config, set_config
        from event_streamer_spark.debug import Debug, debug

        set_config(Config(host="h"))  # debug unset → silent
        with caplog.at_level(logging.DEBUG, logger="event_streamer_spark"):
            debug(Debug.FATAL, "a")
        set_config(Config(host="h", debug=False))
        with caplog.at_level(logging.DEBUG, logger="event_streamer_spark"):
            debug(Debug.FATAL, "b")
        set_config(Config(host="h", debug=Debug.TRACE))
        with caplog.at_level(logging.DEBUG, logger="event_streamer_spark"):
            debug(Debug.NONE, "c")
        assert caplog.text.strip() == "" or not any(
            m in caplog.text for m in ("a", "b", "c")
        )


class TestKafkaJSLogs:
    """Reference ``kafkaJSLogs`` parity (``interfaces/index.ts:42``,
    default logLevel.NOTHING ``constants/index.ts:20``; passed to the
    client at ``legacy-producer.ts:101`` / ``legacy-consumer.ts:145``)."""

    def test_default_is_nothing(self):
        from event_streamer_spark.config import Config

        assert Config(host="h").kafka_js_logs == 0

    def test_kafkajs_numeric_mapping(self):
        from event_streamer_spark.debug import kafka_log4j_level

        assert kafka_log4j_level(0) == "OFF"
        assert kafka_log4j_level(1) == "ERROR"
        assert kafka_log4j_level(2) == "WARN"
        assert kafka_log4j_level(4) == "INFO"
        assert kafka_log4j_level(5) == "DEBUG"

    def test_unknown_level_raises(self):
        import pytest

        from event_streamer_spark.debug import kafka_log4j_level

        with pytest.raises(ValueError):
            kafka_log4j_level(3)  # kafkajs has no level 3

    def test_apply_sets_jvm_logger(self, spark):
        from event_streamer_spark.debug import apply_kafka_log_level

        # Best-effort contract: True when the log4j2 Configurator is
        # reachable (it is in this container's Spark 4 JVM), and the
        # call never raises regardless.
        assert apply_kafka_log_level(spark, 1) is True
        assert apply_kafka_log_level(spark, 0) is True
