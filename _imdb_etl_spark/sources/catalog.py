"""Parquet catalog over the driver's synthetic tables.

Maps the reference's named stage + COPY INTO world
(/root/reference/etl_imdb_db.sql:56-82) onto Spark's native columnar
scan: `spark.read.parquet` gives predicate pushdown, column pruning and
vectorized decoding for free — the analog of Snowflake micro-partitions.

At cluster scale the same call fans out over all files under the prefix;
nothing here is local-mode-specific.
"""

from __future__ import annotations

import contextlib as _contextlib
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
    # events.parquet has historically stored TIMESTAMP(NANOS), which
    # Spark's parquet reader rejects outright; with this conf such files
    # surface as bigint and normalize_event_ts converts below. Files that
    # store timestamp[us]/[ms] are unaffected by the conf.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Python data sources implementing pushFilters are rejected unless
    # this is on; runtime-mutable, so the driver-owned session gets it
    # here (the same home as the timezone pin)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events timestamp to TIMESTAMP regardless of the
    file's physical type.

    The testdata has shipped both TIMESTAMP(NANOS) (surfacing as bigint
    under nanosAsLong) and timestamp[us]; guard on the actual dtype so
    both work. nanos -> micros uses exact integer division (`div`, not
    `/`: float division loses precision above 2^53 ns), matching
    DuckDB's truncating NANOS -> TIMESTAMP(us) read of the same file.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    if dtype == "timestamp_ntz":
        # session tz is pinned to UTC, so NTZ -> LTZ is a no-op rebase;
        # keep one logical type everywhere downstream.
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _tune(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    # table() owns the session tuning; no need to repeat it here
    return tuple(table(spark, sf_dir, n) for n in names)


def reap_stale_pid_dirs(base: str, prefix: str) -> None:
    """Best-effort GC of pid-suffixed output dirs (``<prefix>_<pid>``)
    left by finished processes — a dir is stale when its embedded pid
    is no longer alive. Keeps per-process sink/staging outputs (used
    so concurrent harness runs never race on one path) from
    accumulating one directory per run."""
    import re
    import shutil

    if not os.path.isdir(base):
        return
    for entry in os.listdir(base):
        m = re.fullmatch(re.escape(prefix) + r"_(\d+)", entry)
        if not m or int(m.group(1)) == os.getpid():
            continue
        try:
            os.kill(int(m.group(1)), 0)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(base, entry), ignore_errors=True)
        except PermissionError:
            pass  # pid alive under another uid — leave it


_STAGE_RUN_SEQ = __import__("itertools").count()
_STAGE_RUN_DIRS: dict = {}
# Per-tag in-session retention depth (current + previous run by
# default). A caller that must hold a staged DataFrame across TWO OR
# MORE later invocations of the same face can widen this (module
# constant, not per-call: retention is a session lifecycle policy,
# and every widening costs disk for every tag).
_STAGE_RETAIN = 2
# Reaped run dirs are not deleted outright — each is replaced by a
# directory holding only this breadcrumb file (ADVICE r10). A held
# DataFrame that outlives retention fails FAILED_READ_FILE.FILE_NOT_
# EXIST naming ".../stage_<pid>/<tag>_runN/part-...": the path names
# this policy's dir, and inspecting it finds the tombstone with the
# full explanation (the scan replays remembered file names, so the
# message itself cannot be intercepted). A consumer that RE-LISTS the
# old path (fresh read.parquet) fails better still — "Could not read
# footer ... REAPED-....txt" puts the cause in the message.
_STAGE_TOMBSTONE = (
    "REAPED-dataframe-outlived-stage_to_parquet-retention-"
    "widen-_STAGE_RETAIN-in-sources-catalog.txt"
)


@_contextlib.contextmanager
def scoped_conf(spark: SparkSession, confs: dict[str, str]):
    """Session-conf mutate/restore for the conf-scoped eager-staging
    pattern (runtime_bloom_filter_join, aqe_skew_join_events,
    recursive_cte_amortization, the dynamic-partition-overwrite
    writers) — centralized per ADVICE r10/r11 so the single-builder
    contract lives in ONE place:

    SINGLE-BUILDER CONTRACT. Session confs are process-global, so a
    face that plans under mutated confs is safe only when query
    builds on the session are sequential — which the driver, check.py,
    bench.py, and the probes all are. Concurrent BUILDS on one
    SparkSession are not a supported mode of this registry; if that
    ever changes, add a lock around this manager first. (Concurrent
    EXECUTION of already-built DataFrames is unaffected: the pattern
    always executes its work eagerly inside the scope.)

    Restore is exception-safe and distinguishes unset-before from
    set-before: a key the session never set is returned to UNSET
    (falling back to the cluster/SQLConf default), not pinned to the
    default's current string value. Pinned by
    test_scoped_conf_restores_on_exception."""
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, old in prev.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def stage_to_parquet(df: DataFrame, tag: str) -> DataFrame:
    """Materialize a multi-consumer intermediate to parquet and read
    it back — the repo's lineage-truncation pattern, replacing
    localCheckpoint everywhere (round 10; the round-9 1000x probe
    measured localCheckpoint pinning its blocks in executor heap with
    no public release API, halving the heap for everything downstream
    in a long session). The write is EAGER (runs now, under whatever
    session confs are set) and the read-back is a plain columnar scan
    that re-plans from disk — exactly what a production pipeline's
    materialized intermediate table is at 100 TB.

    Namespacing and GC mirror the CC-frontier stager
    (operators/dedup.py:_iter_stage_dir): pid-suffixed root so
    concurrent harness runs never race (dead-pid roots reaped),
    run-counter leaf so a still-referenced DataFrame from a prior
    invocation never re-reads files a later one rewrote, and per-tag
    in-session retention of the newest _STAGE_RETAIN runs (reaped runs
    leave a descriptive tombstone — see _STAGE_TOMBSTONE).
    """
    import shutil

    base = f"/root/repo/spark-warehouse/stage_{os.getpid()}"
    reap_stale_pid_dirs(os.path.dirname(base), "stage")
    path = f"{base}/{tag}_run{next(_STAGE_RUN_SEQ)}"
    prior = _STAGE_RUN_DIRS.setdefault(tag, [])
    prior.append(path)
    for old in prior[: -_STAGE_RETAIN]:
        shutil.rmtree(old, ignore_errors=True)
        try:  # descriptive-failure tombstone (see _STAGE_TOMBSTONE)
            os.makedirs(old, exist_ok=True)
            with open(os.path.join(old, _STAGE_TOMBSTONE), "w") as f:
                f.write(
                    "This staged intermediate was retired by the per-tag "
                    f"retention policy (_STAGE_RETAIN={_STAGE_RETAIN}): a "
                    "DataFrame returned by stage_to_parquet was held across "
                    f"{_STAGE_RETAIN}+ later invocations of the same tag. "
                    "Re-stage the frame, or widen _STAGE_RETAIN in "
                    "_imdb_etl_spark/sources/catalog.py.\n"
                )
        except OSError:
            pass  # best-effort: GC must never fail the live query
    del prior[: -_STAGE_RETAIN]
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def stage_sorted(df: DataFrame, tag: str, *order_cols: str) -> DataFrame:
    """Stage, then globally sort — for presentation ORDER BYs over
    expensive map-only (or post-shuffle Python) lineage. A global sort
    executes its child TWICE: once for the range partitioner's
    boundary sampling, once for the sort, and only work behind a
    shuffle boundary is reused between the two jobs — a mapInPandas
    decode, a UDTF, or a per-char lambda ladder above the last
    exchange runs again in full. Staging the (narrow) result first
    means the sampler re-scans parquet instead. Found on
    text_winnowing_fingerprints (578 -> 315 s at 1000x, round 12) and
    applied to the heavy Python-boundary faces; cheap scan-lineage
    faces keep the plain orderBy — for them the extra write costs
    more than the second scan."""
    return stage_to_parquet(df, tag).orderBy(*order_cols)


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Widen pathologically under-partitioned input without taxing
    already-parallel input.

    The local test tables are single parquet files — one scan partition —
    so CPU-heavy per-row operators (shingling, hashing, projections)
    would otherwise run on one core. A 100 TB table arrives in thousands
    of splits, where an unconditional repartition() would be a full
    corpus shuffle for nothing; so shuffle ONLY when the scan yields
    fewer partitions than the target parallelism.
    """
    spark = df.sparkSession
    target = min_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Estimate scan parallelism from the input file listing instead of
    # df.rdd.getNumPartitions(): the estimate is Connect-safe (no
    # SparkContext / RDD access) and errs on the side of NOT shuffling —
    # a frame with no input files (in-memory source) or enough
    # files/bytes to split at or past the target is left untouched.
    files = df.inputFiles()
    est = len(files)
    if 0 < est < target:
        # each file yields >= 1 partition; large files split further at
        # ~128 MiB (spark.sql.files.maxPartitionBytes default), which the
        # local-path stat refines so a few huge files don't trigger a
        # pointless full-table shuffle
        try:
            sizes = [
                os.stat(f.removeprefix("file:")).st_size
                for f in files
                if f.startswith("file:")
            ]
            if len(sizes) == len(files):
                est = sum(max(1, -(-s // (128 << 20))) for s in sizes)
        except OSError:
            pass
    if 0 < est < target:
        return df.repartition(target)
    return df
