"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) —
the connector seam for systems Spark has no built-in reader for.

The reference ingests only CSV through a stage; a production engine
also needs to ingest from APIs, manifests, and bespoke formats. Spark 4
makes that a first-class Python surface: a `DataSource` plans
`InputPartition`s on the driver and each executor runs `read(part)`
independently — the same split-planning contract as a file source, so
parallelism scales with the partition count, not the driver.

The concrete source here is deterministic (rows derived from md5 of the
row id), which makes the whole path — option parsing, partition
planning, executor-side generation, schema — verifiable against a
DuckDB `range()` oracle with a value hash, not just a row count.
A real connector (e.g. a paginated HTTP API or a shard manifest) swaps
the body of `read()` and keeps the planning shape.

Scale posture: partition planning is O(#partitions) driver-side
metadata; generation is embarrassingly parallel; the registered query
aggregates executor-side before anything returns. The Arrow batch size
for Python-source rows is Spark-managed (spark.sql.execution.arrow
configs); rows are yielded as tuples, not pandas, to keep the per-row
overhead in the iterator protocol only.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from _imdb_etl_spark.plans.registry import register


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.nparts = int(options.get("partitions", 8))

    def partitions(self):
        step = max(1, -(-self.rows // self.nparts))  # ceil division
        return [
            _RangePartition(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            sig = hashlib.md5(str(i).encode()).hexdigest()
            yield (i, sig, int(sig[:2], 16))


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs")`` — options: rows, partitions."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, sig string, bucket int"

    def reader(self, schema):
        return SyntheticDocsReader(self.options)


def read_synthetic_docs(
    spark: SparkSession, rows: int = 2000, partitions: int = 8
) -> DataFrame:
    spark.dataSource.register(SyntheticDocsDataSource)
    return (
        spark.read.format("synthetic_docs")
        .option("rows", rows)
        .option("partitions", partitions)
        .load()
    )


# DuckDB twin: same md5-derived rows from range(); the bucket is the
# first two hex digits decoded via positional lookup (cross-engine, no
# hex-cast builtin needed).
_PYSRC_SQL = """
WITH src AS (
  SELECT i AS doc_id,
         md5(CAST(i AS VARCHAR)) AS sig,
         (strpos('0123456789abcdef', substr(md5(CAST(i AS VARCHAR)), 1, 1)) - 1) * 16
         + strpos('0123456789abcdef', substr(md5(CAST(i AS VARCHAR)), 2, 1)) - 1 AS bucket
  FROM range(0, 2000) t(i)
)
SELECT bucket,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc,
       MAX(sig) AS max_sig
FROM src
GROUP BY bucket
ORDER BY bucket
"""


@register(
    "pysource_synthetic_docs",
    _PYSRC_SQL,
    doc="Custom Python DataSource (Spark 4 datasource API): "
    "driver-side partition planning + executor-side generation, "
    "aggregated per bucket. The md5-derived payload makes the full "
    "connector path value-hash-verifiable against the DuckDB range() "
    "oracle. The template for API/manifest connectors Spark lacks.",
)
def pysource_synthetic_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = read_synthetic_docs(spark, rows=2000, partitions=8)
    return (
        df.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
            F.max("sig").alias("max_sig"),
        )
        .orderBy("bucket")
    )
