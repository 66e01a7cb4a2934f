"""Custom Python Data Source (Spark 4): JSONL event-log files.

The reference's testing source (A19) injects event dicts in-process;
this is the same concept as a FIRST-CLASS source —
``spark.read.format("jsonl_events")`` over newline-delimited JSON event
logs (one ``{"topic": ..., ...payload}`` object per line), yielding the
``(topic, value)`` rows every ConsumerRouter path consumes. Built on
Spark 4's Python Data Source API: one :class:`InputPartition` per file,
so a directory of N logs reads with N-way parallelism and the executor
never ships whole files to the driver.

Corrupt lines follow the engine-wide A3 contract: silently skipped at
the source (same semantics as ``get_parsed_json`` → drop).

Register once per session, then read::

    spark.dataSource.register(JsonlEventsDataSource)
    df = (spark.read.format("jsonl_events")
          .option("path", "/logs/events").load())
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

_SCHEMA = "topic string, value string"


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("jsonl_events: the 'path' option is required")
        self._root = path
        self._default_topic = options.get("default_topic", "events")

    def partitions(self):
        if os.path.isdir(self._root):
            files = sorted(
                os.path.join(self._root, f)
                for f in os.listdir(self._root)
                if f.endswith((".jsonl", ".json", ".ndjson"))
            )
        else:
            files = [self._root]
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    obj = json.loads(line)
                except ValueError:
                    continue  # A3: corrupt record → silently dropped
                if not isinstance(obj, dict):
                    continue
                topic = obj.pop("topic", self._default_topic)
                yield (str(topic), json.dumps(obj))


class JsonlEventsDataSource(DataSource):
    """``format("jsonl_events")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> JsonlEventsReader:
        return JsonlEventsReader(self.options)
