"""Parquet catalog over the driver's synthetic tables.

Maps the reference's named stage + COPY INTO world
(/root/reference/etl_imdb_db.sql:56-82) onto Spark's native columnar
scan: `spark.read.parquet` gives predicate pushdown, column pruning and
vectorized decoding for free — the analog of Snowflake micro-partitions.

At cluster scale the same call fans out over all files under the prefix;
nothing here is local-mode-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DRIVER_TABLES = (
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


def _tune(spark: SparkSession) -> None:
    # The driver owns the session; timezone is runtime-mutable and must be
    # UTC so timestamp semantics agree with the UTC-naive DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _tune(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    _tune(spark)
    return tuple(table(spark, sf_dir, n) for n in names)
