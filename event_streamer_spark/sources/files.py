"""File-based streaming sources — deterministic replay for tests/benches.

``read_file_stream`` turns a parquet/json/csv directory into a stream;
with ``trigger(availableNow=True)`` it replays the full dataset through
the identical streaming plan used in production (the testing-mode
equivalent of a Kafka topic, SURVEY §2.A A19).
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_file_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: Optional[Union[StructType, str]] = None,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming read of a file directory (schema required by Spark)."""
    if schema is None:
        schema = spark.read.format(fmt).load(path).schema
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)
