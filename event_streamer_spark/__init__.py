"""event_streamer_spark — a PySpark-native event-stream analytics engine.

A ground-up Spark implementation of the capabilities of
``@comparaonline/event-streamer`` (reference surveyed in ``SURVEY.md``):

* the event envelope + producer (``emit``) with testing sink
  (reference: ``src/producer/legacy-producer.ts``),
* the consumer router with ``(topic, code)`` predicate dispatch
  (reference: ``src/consumer/legacy-consumer.ts``),
* a full batch relational surface (SURVEY §2.B) expressed with the
  DataFrame/SQL API so Catalyst handles optimization,
* Structured Streaming equivalents of the queue/backpressure semantics
  (SURVEY §2.C), and
* large-scale training-data-pipeline operators: dedup (exact/MinHash-LSH/
  SimHash/n-gram), similarity search, text analysis, multimodal columns
  (SURVEY §2.D).

Everything here is built on public PySpark APIs only.
"""

from event_streamer_spark.config import (
    Config,
    ConsumerConfig,
    ProducerConfig,
    get_config,
    set_config,
    reset_config,
)
from event_streamer_spark.helpers import to_array, to_upper_camel_case
from event_streamer_spark.producer import (
    clear_emitted_events,
    emit,
    get_emitted_events,
    get_parsed_emitted_events,
)
from event_streamer_spark.consumer import ConsumerRouter, Route

__all__ = [
    "Config",
    "ConsumerConfig",
    "ProducerConfig",
    "ConsumerRouter",
    "Route",
    "clear_emitted_events",
    "emit",
    "get_config",
    "get_emitted_events",
    "get_parsed_emitted_events",
    "reset_config",
    "set_config",
    "to_array",
    "to_upper_camel_case",
]

__version__ = "0.1.0"
