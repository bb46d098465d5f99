"""JSONL (newline-delimited JSON) source — the lingua franca of LLM
corpus interchange: crawls, filtered dumps, and annotation exports all
ship as JSONL before they are compacted to parquet.

The registered query proves the full round trip end to end: documents
-> distributed JSONL write -> schema'd JSONL read (FAILFAST: a single
malformed line fails the job rather than silently nulling fields) ->
per-language accounting, verified against DuckDB reading the very same
files Spark wrote. At scale both sides are embarrassingly parallel:
the write is one task per partition, the read splits on file
boundaries (gzip-less JSONL is splittable per file, and a production
layout keeps files at 64-256 MB for scan parallelism).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from _imdb_etl_spark.plans.registry import register
from _imdb_etl_spark.sources import load_tables

# Per-process output directory (pid-suffixed, substituted into the
# oracle SQL at registration time): concurrent harness runs — bench +
# check + planlint, or two sessions — must never race on one shared
# path, and an oracle run without a prior Spark build in the same
# process now fails loudly (missing dir) instead of silently reading
# another run's stale files. The build-before-oracle ordering within a
# process is the driver's documented contract.
_OUT_DIR = f"/root/repo/spark-warehouse/jsonl_docs_{os.getpid()}"

_DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)

_JSONL_SQL = f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM read_json('{_OUT_DIR}/*.json', format='newline_delimited',
               columns={{'doc_id': 'BIGINT', 'text': 'VARCHAR',
                         'lang': 'VARCHAR', 'source': 'VARCHAR',
                         'n_chars': 'BIGINT'}})
GROUP BY lang
ORDER BY lang
"""


@register(
    "jsonl_roundtrip_source",
    _JSONL_SQL,
    doc="JSONL interchange round trip: write the documents table as "
    "newline-delimited JSON (distributed, one file per partition), "
    "read it back with an explicit schema in FAILFAST mode, and "
    "aggregate per language. The oracle reads the exact files Spark "
    "wrote, so the check covers serialization fidelity (ids, text "
    "bytes, counts) — not just the aggregate math.",
)
def jsonl_roundtrip_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from _imdb_etl_spark.sources.catalog import reap_stale_pid_dirs

    (docs,) = load_tables(spark, sf_dir, "documents")
    os.makedirs(os.path.dirname(_OUT_DIR), exist_ok=True)
    reap_stale_pid_dirs(os.path.dirname(_OUT_DIR), "jsonl_docs")
    docs.write.mode("overwrite").json(_OUT_DIR)
    back = (
        spark.read.schema(_DOC_SCHEMA)
        .option("mode", "FAILFAST")
        .json(_OUT_DIR)
    )
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(F.length("text")).alias("sum_text_len"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang")
    )
