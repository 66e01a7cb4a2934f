from __future__ import annotations

import pytest

from event_streamer_spark.config import reset_config
from event_streamer_spark.producer import _emitted_events


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "kafka: real-broker Kafka integration tests — gated on "
        "EVENT_STREAMER_KAFKA_BROKER (skip cleanly without a broker)",
    )
    config.addinivalue_line(
        "markers",
        "oracle_sweep: full Spark-vs-DuckDB registry sweep at sf0.001 "
        "(runs in the default suite; deselect with -m 'not oracle_sweep')",
    )
    config.addinivalue_line(
        "markers",
        "fuzz: seeded differential fuzz vs DuckDB (runs in the default "
        "suite; deselect with -m 'not fuzz')",
    )


@pytest.fixture(scope="session")
def spark():
    from event_streamer_spark.session import get_spark

    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        # skip empty micro-batches: cuts stateful-streaming test time ~10×
        # (timeout-driven emission isn't what the tests assert)
        extra_conf={"spark.sql.streaming.noDataMicroBatches.enabled": "false"},
    )
    yield s
    s.stop()


@pytest.fixture(autouse=True)
def clean_state():
    reset_config()
    _emitted_events.clear()
    yield
    reset_config()
    _emitted_events.clear()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def sf_dir() -> str:
    return SF_DIR
