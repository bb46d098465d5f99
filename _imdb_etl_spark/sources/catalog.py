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
from pyspark.sql import functions as F

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
    # events.parquet stores TIMESTAMP(NANOS), which Spark's parquet reader
    # rejects outright; read nanos as long and convert below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _tune(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # nanos -> micros with exact integer division (`div`, not `/`:
        # float division loses precision above 2^53 ns). Matches DuckDB's
        # truncating NANOS -> TIMESTAMP(us) read of the same file.
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    # table() owns the session tuning; no need to repeat it here
    return tuple(table(spark, sf_dir, n) for n in names)
