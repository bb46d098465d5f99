"""Pluggable streaming sources.

Production deployments swap the source line without touching the query
graph; this module is that seam. Kafka needs the external
spark-sql-kafka jar (not in this container), so it is config-gated
behind a clear error rather than stubbed silently.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class StreamSource:
    kind: str  # "parquet-dir" | "rate" | "kafka"
    options: dict[str, str] = field(default_factory=dict)


def read_stream(spark: SparkSession, source: StreamSource) -> DataFrame:
    if source.kind == "parquet-dir":
        from _imdb_etl_spark.streaming.events import read_events_stream

        return read_events_stream(spark, source.options["path"])
    if source.kind == "rate":
        # built-in synthetic source: monotonically increasing (timestamp,
        # value) rows — the standard smoke/perf driver for a streaming
        # topology with no external infrastructure
        reader = spark.readStream.format("rate")
        for k, v in source.options.items():
            reader = reader.option(k, v)
        return reader.load()
    if source.kind == "kafka":
        try:
            reader = spark.readStream.format("kafka")
            for k, v in source.options.items():
                reader = reader.option(k, v)
            return reader.load()
        except Exception as e:  # noqa: BLE001
            raise NotImplementedError(
                "kafka source requires the spark-sql-kafka package on the "
                "classpath (--packages org.apache.spark:spark-sql-kafka-0-10_2.13); "
                f"underlying error: {e}"
            ) from e
    raise ValueError(f"unknown stream source kind: {source.kind}")
