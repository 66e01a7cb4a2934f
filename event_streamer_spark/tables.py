"""Test-data table loaders (TESTDATA.md).

``load(spark, sf_dir, name)`` reads one parquet table; ``register_views``
creates/replaces temp views for SQL-form queries (CTEs, subqueries).
Parquet scans get predicate pushdown + column pruning from Catalyst for
free — queries must keep projections/filters declarative so they reach
the scan (verify with ``.explain``: ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) — illegal for Spark's parquet reader.
        # Read nanos as long, then floor-truncate to microseconds (identical
        # to DuckDB's nanos→micros truncation).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)"))
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Create/replace a temp view per table for ``spark.sql`` queries."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
