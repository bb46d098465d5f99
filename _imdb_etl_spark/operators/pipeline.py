"""End-to-end training-data preparation: the composition a pre-training
corpus pipeline actually runs — quality gate -> normalized exact dedup
-> per-language corpus accounting — as ONE declarative plan.

Each stage reuses the registered operator's exact semantics
(text_quality's gate, dedup_exact_normalized's canonical hash), so the
composition is oracle-checkable end-to-end. At 100 TB the plan is: one
scan with narrow quality predicates, one hash-aggregate shuffle for the
dedup group, one semi join back (both keyed on the same values), and a
tiny per-language aggregate — no driver materialization anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from _imdb_etl_spark.operators.text import _STOPWORDS, _toks
from _imdb_etl_spark.plans.registry import register
from _imdb_etl_spark.sources import load_tables

_SW_IN = ",".join(f"'{w}'" for w in _STOPWORDS)

_PREP_SQL = f"""
WITH survivors AS (
  SELECT doc_id, text, lang
  FROM documents
  WHERE length(text) >= 100
    AND len(list_filter(string_split(text, ' '), x -> x IN ({_SW_IN}))) > 0
),
keep AS (
  SELECT MIN(doc_id) AS doc_id
  FROM survivors
  GROUP BY md5(trim(regexp_replace(lower(text), ' +', ' ', 'g')))
),
corpus AS (
  SELECT s.doc_id, s.text, s.lang
  FROM survivors s JOIN keep k ON s.doc_id = k.doc_id
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST((SUM(length(text)) * 1000000) // COUNT(*) AS BIGINT) AS avg_chars_micro
FROM corpus
GROUP BY lang
ORDER BY lang
"""


@register(
    "pipeline_docs_prep",
    _PREP_SQL,
    doc="Training-corpus prep pipeline in one plan: text_quality's "
    "length+stopword gate filters, dedup_exact_normalized's canonical "
    "md5 keeps the lowest doc_id per duplicate group (left-semi back to "
    "the survivor set), and the kept corpus rolls up to per-language "
    "doc/token/char accounting.",
)
def pipeline_docs_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load_tables(spark, sf_dir, "documents")
    sw = F.array(*[F.lit(w) for w in _STOPWORDS])
    n_stop = F.size(F.filter(_toks(), lambda x: F.array_contains(sw, x)))
    survivors = docs.where((F.length("text") >= 100) & (n_stop > 0)).select(
        "doc_id", "text", "lang"
    )
    norm_hash = F.md5(F.trim(F.regexp_replace(F.lower("text"), " +", " ")))
    keep = survivors.groupBy(norm_hash.alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    corpus = survivors.join(keep.select("doc_id"), "doc_id", "left_semi")
    # avg chars in exact integer micro-units (`div`, never float division):
    # float averaging plus ROUND is representation-sensitive across
    # engines, integer arithmetic is bitwise-identical everywhere
    return (
        corpus.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(_toks())).alias("total_tokens"),
            F.sum(F.length("text")).alias("_sum_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            F.expr("(_sum_chars * 1000000L) div n_docs").alias("avg_chars_micro"),
        )
        .orderBy("lang")
    )


_PACK_BUDGET = 4096

_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
r AS (
  SELECT doc_id, lang, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, lang, n_tokens, cum_tokens,
       CAST(FLOOR((cum_tokens - n_tokens) / {_PACK_BUDGET}.0) AS BIGINT) AS shard_id
FROM r
ORDER BY lang, doc_id
"""


@register(
    "corpus_pack_shards",
    _PACK_SQL,
    doc="Sequence packing for LLM training: assign documents to "
    f"~{_PACK_BUDGET}-token training shards per language via a running "
    "token count (shard = tokens-before-this-doc div budget). One "
    "window partitioned by language — parallel across languages, the "
    "realistic unit of a packing stream; at 100 TB the partition key "
    "becomes (lang, date-bucket) to bound any one window's task.",
)
def corpus_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (docs,) = load_tables(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return r.select(
        "doc_id",
        "lang",
        "n_tokens",
        "cum_tokens",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / float(_PACK_BUDGET))
        .cast("long")
        .alias("shard_id"),
    ).orderBy("lang", "doc_id")
