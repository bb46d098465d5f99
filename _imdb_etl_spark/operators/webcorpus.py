"""Web-corpus curation operators: domain-mix control, length
distribution profiling, and incremental-batch deduplication.

These are the source-level controls a web-scale pre-training pipeline
applies before tokenization: cap any one domain's share of the corpus
(a handful of boilerplate-heavy domains otherwise dominate a crawl),
profile the sequence-length distribution that drives packing/batching
decisions, and dedup a NEW crawl increment against the existing corpus
without re-deduping the corpus itself.

Absent from the reference (no string-typed corpus there); part of the
LLM-data-pipeline surface alongside operators/corpus.py.

Scale posture (100 TB):
- ``corpus_domain_cap`` windows on the domain key — parallel across
  domains, the natural unit; a skew-heavy domain bounds one task at
  cap-rank depth, not corpus size (row_number short-circuits via
  WindowGroupLimit under the rank filter).
- ``corpus_length_histogram`` reduces each doc to one integer bucket
  map-side; the aggregate is buckets x languages — tiny by
  construction.
- ``dedup_incremental_batch`` is the production ingest shape: hash the
  increment, LEFT ANTI join against the corpus hash set on the same
  key — one keyed shuffle proportional to the increment plus the
  corpus hash column, never documents x documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from _imdb_etl_spark.plans.registry import register
from _imdb_etl_spark.sources import load_tables

_DOMAIN_CAP = 10

_DOMAIN_CAP_SQL = f"""
WITH ranked AS (
  SELECT source, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rnk
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rnk <= {_DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rnk <= {_DOMAIN_CAP} THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
FROM ranked
GROUP BY source
ORDER BY source
"""


@register(
    "corpus_domain_cap",
    _DOMAIN_CAP_SQL,
    doc=f"Domain-mix rate limiting: keep at most {_DOMAIN_CAP} documents "
    "per source domain, deterministic by doc_id order (stable across "
    "re-runs, unlike sampling). The window partitions on the domain "
    "key, so work parallelizes across domains and a crawl-dominating "
    "domain costs one task, not the job.",
)
def corpus_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load_tables(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    kept = F.col("rnk") <= _DOMAIN_CAP
    return (
        docs.select("source", "lang", "n_chars", "doc_id")
        .withColumn("rnk", F.row_number().over(w))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("kept_chars"),
        )
        .orderBy("source")
    )


_BUCKET_W = 64

_LENGTH_HIST_SQL = f"""
SELECT lang,
       CAST(n_chars // {_BUCKET_W} AS BIGINT) AS bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars
FROM documents
GROUP BY lang, bucket
ORDER BY lang, bucket
"""


@register(
    "corpus_length_histogram",
    _LENGTH_HIST_SQL,
    doc=f"Sequence-length distribution in fixed {_BUCKET_W}-char buckets "
    "per language — the profile that sizes packing budgets and batch "
    "shapes. Integer bucketing (div, no float log) is bitwise-stable "
    "cross-engine; each document reduces to one bucket id map-side and "
    "the aggregate is |langs| x |buckets| rows.",
)
def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load_tables(spark, sf_dir, "documents")
    return (
        docs.select("lang", "n_chars")
        .withColumn("bucket", F.expr(f"n_chars div {_BUCKET_W}"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "bucket")
    )


# The "increment": a deterministic 20% slice standing in for a new crawl
# batch; the remaining 80% is the existing corpus. Membership from the
# key, not arrival order, so every engine and every re-run agrees.
_IS_BATCH = "doc_id % 5 = 4"

_INCR_SQL = f"""
WITH corpus AS (
  SELECT md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS h
  FROM documents WHERE NOT ({_IS_BATCH})
),
batch AS (
  SELECT doc_id, lang,
         md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS h
  FROM documents WHERE {_IS_BATCH}
)
SELECT b.lang,
       COUNT(*) AS n_incoming,
       CAST(SUM(CASE WHEN c.h IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
FROM batch b
LEFT JOIN (SELECT DISTINCT h FROM corpus) c ON b.h = c.h
GROUP BY b.lang
ORDER BY b.lang
"""


@register(
    "dedup_incremental_batch",
    _INCR_SQL,
    doc="Incremental ingest dedup: a new crawl increment (deterministic "
    "20% slice) is normalized-hashed and anti-joined against the "
    "existing corpus's hash set — the production shape where each "
    "day's batch dedups against the accumulated corpus without "
    "rescanning document bodies (the corpus side is its hash column "
    "only). One keyed shuffle on the hash.",
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load_tables(spark, sf_dir, "documents")
    h = F.md5(F.trim(F.regexp_replace(F.lower("text"), " +", " "))).alias("h")
    is_batch = F.expr(_IS_BATCH)
    corpus_h = docs.where(~is_batch).select(h).distinct()
    batch = docs.where(is_batch).select("doc_id", "lang", h)
    novel = batch.join(corpus_h, "h", "left_anti")
    return (
        batch.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_incoming"))
        .join(
            novel.groupBy("lang").agg(F.count(F.lit(1)).alias("n_novel")),
            "lang",
            "left",
        )
        .select(
            "lang",
            "n_incoming",
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
        )
        .orderBy("lang")
    )
