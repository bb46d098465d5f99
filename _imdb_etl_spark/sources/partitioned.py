"""Partitioned-table maintenance: dynamic partition-overwrite backfill.

The reference stages flat CSVs (no partitioned tables), but any 100 TB
deployment of this engine lands fact data date-partitioned and lives or
dies by the ability to RE-RUN one day without touching its neighbors —
the daily-backfill idempotence contract. Spark expresses it with
``spark.sql.sources.partitionOverwriteMode=dynamic``: an overwrite
write replaces exactly the partitions present in the incoming frame.
The registered query proves the contract end-to-end: full load, then a
one-day backfill in dynamic mode, and the re-read must still equal the
batch oracle over ALL days — a static-mode clobber (every other day
deleted) or a duplicated backfill day flips row counts and the hash.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from _imdb_etl_spark.functions import dec, dsum
from _imdb_etl_spark.plans.registry import register
from _imdb_etl_spark.sources import load_tables

_BACKFILL_DAY = "2024-01-05"  # driver events all land in 2024-01

_BACKFILL_SQL = """
SELECT CAST(ts AS DATE) AS event_date,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
ORDER BY 1
"""


@register(
    "sink_dynamic_partition_backfill",
    _BACKFILL_SQL,
    doc="Dynamic partition-overwrite backfill (partitionOverwriteMode="
    f"dynamic): events land date-partitioned, then day {_BACKFILL_DAY} "
    "is recomputed and overwritten IN PLACE — dynamic mode replaces "
    "only the partitions present in the incoming frame, so the other "
    "29 days survive and the backfill is idempotent. The re-read "
    "aggregates per day against the batch oracle over all days: a "
    "static-mode clobber or a doubled backfill day flips the hash. "
    "Partition pruning on event_date comes free for downstream reads.",
)
def sink_dynamic_partition_backfill(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil

    from _imdb_etl_spark.sources.catalog import reap_stale_pid_dirs

    warehouse = "/root/repo/spark-warehouse"
    os.makedirs(warehouse, exist_ok=True)
    reap_stale_pid_dirs(warehouse, "part_backfill")
    tbl = os.path.join(warehouse, f"part_backfill_{os.getpid()}")
    shutil.rmtree(tbl, ignore_errors=True)

    (events,) = load_tables(spark, sf_dir, "events")
    ev = events.withColumn("event_date", F.to_date("ts"))

    mode_key = "spark.sql.sources.partitionOverwriteMode"
    old_mode = spark.conf.get(mode_key, "static")
    spark.conf.set(mode_key, "dynamic")
    try:
        ev.write.partitionBy("event_date").mode("overwrite").parquet(tbl)
        backfill = ev.where(
            F.col("event_date") == F.lit(_BACKFILL_DAY).cast("date")
        )
        # dynamic mode: only the 2024-01-05 directory is replaced
        backfill.write.partitionBy("event_date").mode("overwrite").parquet(
            tbl
        )
    finally:
        spark.conf.set(mode_key, old_mode)

    back = spark.read.parquet(tbl)
    return (
        back.groupBy("event_date")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(dec("value"), "total_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy("event_date")
    )
