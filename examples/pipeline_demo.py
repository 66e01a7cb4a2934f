"""End-to-end demo: the reference's microservice loop, Spark-first.

Runs entirely offline (testing mode + file streams) — the same code
shape works against Kafka by swapping the source/sink builders.

    python examples/pipeline_demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from event_streamer_spark import (
    Config,
    ConsumerRouter,
    emit,
    get_parsed_emitted_events,
    set_config,
)
from event_streamer_spark.config import ConsumerConfig
from event_streamer_spark.session import get_spark
from event_streamer_spark.sources.files import read_file_stream
from event_streamer_spark.streaming import tumbling_agg
from event_streamer_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


def imperative_loop() -> None:
    """Reference-style handler composition (A19 testing mode)."""
    set_config(
        Config(
            host="broker:9092",
            app_name="demo-svc",
            only_testing=True,
            consumer=ConsumerConfig(group_id="demo-group"),
        )
    )
    router = ConsumerRouter()

    def on_order(event, emit_fn):
        if event["amount"] > 100:
            emit_fn("billing", "invoice-ready", {"order_id": event["order_id"]})

    router.add("orders", "order-created", on_order)
    router.input(
        {"topic": "orders", "event_name": "order-created",
         "data": {"order_id": 7, "amount": 250}}
    )
    print("emitted:", get_parsed_emitted_events())


def declarative_stream() -> None:
    """The scale path: file-stream replay through a windowed aggregation."""
    spark = get_spark("pipeline-demo", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    path = tempfile.mkdtemp(prefix="demo_events_")
    load(spark, SF_DIR, "events").write.mode("overwrite").parquet(path)

    stream = read_file_stream(spark, path)
    hourly = tumbling_agg(
        stream,
        "ts",
        "1 hour",
        [F.count(F.lit(1)).alias("events"),
         F.round(F.sum("value"), 2).alias("value_sum")],
        keys=["event_type"],
        watermark="30 minutes",
    )
    q = (
        hourly.writeStream.format("memory")
        .queryName("hourly_rollup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    print("closed windows:",
          spark.sql("SELECT count(*) AS n FROM hourly_rollup").collect()[0]["n"])
    spark.sql(
        "SELECT * FROM hourly_rollup ORDER BY window.start, event_type LIMIT 5"
    ).show(truncate=False)


if __name__ == "__main__":
    imperative_loop()
    declarative_stream()
