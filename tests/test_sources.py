"""CSV source semantics (SURVEY.md §2.1 S4/S5): literal-NULL handling,
quoted fields, malformed-row tolerance."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from _imdb_etl_spark.schemas import MOVIES_STAGING, NAME_STAGING
from _imdb_etl_spark.sources.csv_source import read_staging_csv


def test_null_literal_becomes_sql_null(spark, imdb_stage):
    df = read_staging_csv(spark, os.path.join(imdb_stage, "movie.csv"), MOVIES_STAGING)
    # fixture writes literal "NULL" strings into gross income
    assert df.where(F.col("worlwide_gross_income").isNull()).count() > 0
    assert df.where(F.col("worlwide_gross_income") == "NULL").count() == 0


def test_quoted_fields_with_commas_and_quotes(spark, imdb_stage):
    df = read_staging_csv(spark, os.path.join(imdb_stage, "movie.csv"), MOVIES_STAGING)
    # titles contain commas and embedded double quotes; the row must not split
    assert df.where(F.col("title").contains(',') & F.col("title").contains('"')).count() > 0
    # and no column bleed: year is always a plausible int
    assert df.where(~F.col("year").isin(2017, 2018, 2019)).count() == 0


def test_drop_malformed_mirrors_on_error_continue(spark, imdb_stage):
    path = os.path.join(imdb_stage, "names.csv")
    permissive = read_staging_csv(spark, path, NAME_STAGING, on_error="permissive")
    dropped = read_staging_csv(spark, path, NAME_STAGING, drop_malformed=True)
    # the injected bad-date rows survive permissive (nulled) but not continue
    assert permissive.count() == dropped.count() + 2


def test_on_error_abort_fails_loudly(spark, imdb_stage):
    # Snowflake COPY INTO default: a type error aborts the load
    import pytest

    from _imdb_etl_spark.sources.csv_source import MalformedRowsError

    path = os.path.join(imdb_stage, "names.csv")
    with pytest.raises(MalformedRowsError, match="fail typed or structural"):
        read_staging_csv(spark, path, NAME_STAGING, on_error="abort").count()


def test_structural_malformation_detected(spark, tmp_path):
    # Snowflake's ABORT_STATEMENT also rejects rows with the wrong field
    # count; the PERMISSIVE string-typed read would silently null-pad or
    # truncate them, so the corrupt-record channel must flag them even
    # when every column is a string (no type casts to fail).
    import pytest

    from _imdb_etl_spark.sources.csv_source import MalformedRowsError

    p = tmp_path / "struct.csv"
    p.write_text('a,b,c\n1,x,2\n2,y\n3,z,4,9\n4,"q,uoted",5\n')
    schema = StructType(
        [StructField(c, StringType()) for c in ("a", "b", "c")]
    )
    with pytest.raises(MalformedRowsError, match="fail typed or structural"):
        read_staging_csv(spark, str(p), schema, on_error="abort").count()

    kept = read_staging_csv(spark, str(p), schema, on_error="continue")
    assert {r["a"] for r in kept.collect()} == {"1", "4"}

    padded = read_staging_csv(spark, str(p), schema, on_error="permissive")
    assert padded.count() == 4


def test_explicit_schema_no_inference(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text('a,b\n"1","x"\nNULL,y\n')
    schema = StructType(
        [StructField("a", IntegerType()), StructField("b", StringType())]
    )
    df = read_staging_csv(spark, str(p), schema)
    rows = {tuple(r) for r in df.collect()}
    assert rows == {(1, "x"), (None, "y")}


def test_python_datasource_partition_planning(spark):
    from _imdb_etl_spark.sources.pysource import read_synthetic_docs

    df = read_synthetic_docs(spark, rows=100, partitions=5)
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 100
    # re-registration is idempotent (every query call registers)
    df2 = read_synthetic_docs(spark, rows=10, partitions=2)
    assert df2.count() == 10
    # deterministic payload: same row ids -> same md5 sigs across reads
    a = {r.doc_id: r.sig for r in df2.collect()}
    b = {r.doc_id: r.sig for r in read_synthetic_docs(spark, 10, 3).collect()}
    assert a == b


def test_python_stream_source_batches_and_replay(spark):
    from _imdb_etl_spark.plans import REGISTRY
    from _imdb_etl_spark.sources.pysource import SyntheticStreamReader, _payload

    # drained result is exactly the deterministic closed-form totals
    rows = REGISTRY["streaming_pysource_bucket_counts"].spark(spark, "").collect()
    assert sum(r.n_docs for r in rows) == 2000
    assert sum(r.sum_id for r in rows) == 2000 * 1999 // 2
    # replay contract: readBetweenOffsets reproduces read()'s rows exactly
    r = SyntheticStreamReader({"rows": 100, "batch": 37})
    it, nxt = r.read({"off": 37})
    assert nxt == {"off": 74}
    assert list(it) == list(r.readBetweenOffsets({"off": 37}, {"off": 74}))
    assert r.read({"off": 100})[1] == {"off": 100}  # finite: offsets stop
    assert _payload(5)[0] == 5


def test_events_ts_normalizes_for_both_physical_types(spark, tmp_path):
    """Round-3 regression armor: the testdata's events.parquet has
    shipped both TIMESTAMP(NANOS) (read as bigint under nanosAsLong)
    and timestamp[us]; the reader must yield identical TIMESTAMP values
    for either physical encoding of the same instants."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from _imdb_etl_spark.sources.catalog import _tune, normalize_event_ts

    _tune(spark)  # nanosAsLong + UTC, as every production read path sets

    instants_us = [1704067200_000_000, 1704070800_123_456]
    nanos_dir, micros_dir = str(tmp_path / "ns"), str(tmp_path / "us")
    pq.write_table(
        pa.table({"ts": pa.array([v * 1000 for v in instants_us],
                                 pa.timestamp("ns"))}),
        f"{nanos_dir}.parquet",
    )
    pq.write_table(
        pa.table({"ts": pa.array(instants_us, pa.timestamp("us"))}),
        f"{micros_dir}.parquet",
    )
    got = {}
    for name, path in (("ns", f"{nanos_dir}.parquet"), ("us", f"{micros_dir}.parquet")):
        df = normalize_event_ts(spark.read.parquet(path))
        assert dict(df.dtypes)["ts"] == "timestamp", (name, df.dtypes)
        got[name] = sorted(r.ts for r in df.collect())
    assert got["ns"] == got["us"]


def test_reap_stale_pid_dirs(tmp_path):
    import os
    import subprocess

    from _imdb_etl_spark.sources.catalog import reap_stale_pid_dirs

    base = str(tmp_path)
    # a pid that existed but is gone (child reaped by wait())
    dead = subprocess.Popen(["true"])
    dead.wait()
    os.makedirs(os.path.join(base, f"foo_{dead.pid}"))
    os.makedirs(os.path.join(base, f"foo_{os.getpid()}"))  # live: ours
    os.makedirs(os.path.join(base, "other_dir"))  # non-matching prefix
    reap_stale_pid_dirs(base, "foo")
    assert sorted(os.listdir(base)) == sorted(
        [f"foo_{os.getpid()}", "other_dir"]
    )


def test_iter_stage_dir_caps_in_session_retention():
    """Round-10 in-session GC for iterative-frontier staging (ADVICE):
    the pid GC only reaps dead processes, so within one long session
    _iter_stage_dir must itself cap retention — per tag, the current
    run dir plus its immediate predecessor survive, older runs are
    deleted; other tags are untouched."""
    import os

    import _imdb_etl_spark.plans  # noqa: F401  (break the operator-module import cycle)
    from _imdb_etl_spark.operators.dedup import (
        _ITER_RUN_DIRS,
        _iter_stage_dir,
    )

    dirs = []
    for _ in range(4):
        d = _iter_stage_dir("t_retention")
        os.makedirs(d, exist_ok=True)
        dirs.append(d)
    other = _iter_stage_dir("t_other")
    os.makedirs(other, exist_ok=True)
    assert not os.path.isdir(dirs[0]) and not os.path.isdir(dirs[1])
    assert os.path.isdir(dirs[2]) and os.path.isdir(dirs[3])
    assert os.path.isdir(other)
    assert _ITER_RUN_DIRS["t_retention"] == dirs[-2:]
    # cleanup the test's leaves
    import shutil

    for d in dirs[2:] + [other]:
        shutil.rmtree(d, ignore_errors=True)
    _ITER_RUN_DIRS.pop("t_retention", None)
    _ITER_RUN_DIRS.pop("t_other", None)


def test_python_source_filter_pushdown_prunes_partitions(spark):
    """pushFilters must prune partition planning to the accepted
    bounds (4 of 8 splits survive), and Spark must drop the pushed
    doc_id predicates from the post-scan Filter."""
    from pyspark.sql import functions as F

    from _imdb_etl_spark.sources.pysource import read_pushdown_range

    df = read_pushdown_range(spark, rows=2000, step=250).where(
        (F.col("doc_id") >= 500) & (F.col("doc_id") < 1500)
    )
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == 4  # pruned from 8 splits
    plan = df._jdf.queryExecution().executedPlan().toString()
    post_scan_filters = [
        ln for ln in plan.splitlines() if "Filter" in ln and "Scan" not in ln
    ]
    for ln in post_scan_filters:
        assert ">=" not in ln and "<" not in ln, ln
    mn, mx = df.agg(F.min("doc_id"), F.max("doc_id")).first()
    assert (mn, mx) == (500, 1499)


def test_schema_evolution_merge_semantics(spark, sf_dir):
    """The merged read must union the footers (quality_score present),
    materialize the batch partition column from the directory layout,
    and fill exactly the batch-1 rows with NULL scores."""
    from _imdb_etl_spark.plans import REGISTRY
    from _imdb_etl_spark.sources import load_tables

    REGISTRY["source_schema_evolution"].spark(spark, sf_dir).collect()
    import glob
    import os

    tbl = max(
        glob.glob(f"/root/repo/spark-warehouse/schema_evo_{os.getpid()}"),
        default=None,
    )
    assert tbl, "schema_evo table dir missing"
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", tbl)
        .parquet(tbl)
    )
    assert "quality_score" in merged.columns
    assert "batch" in merged.columns
    rows = merged.collect()
    (docs,) = load_tables(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert len(rows) == n_docs
    for r in rows:
        if r.doc_id % 2 == 0:
            assert r.batch == 1 and r.quality_score is None
        else:
            assert r.batch == 2 and r.quality_score == r.n_chars % 100


def test_stage_to_parquet_reaps_with_descriptive_tombstone(spark):
    """A DataFrame held past the per-tag retention depth must fail
    with the CAUSE IN THE ERROR (the tombstone file name), not a bare
    missing-path error far from stage_to_parquet (ADVICE r10)."""
    import pytest

    from _imdb_etl_spark.sources import catalog

    tag = "tombstone_pytest"
    held = catalog.stage_to_parquet(spark.range(5).toDF("x"), tag)
    held_path = catalog._STAGE_RUN_DIRS[tag][-1]
    assert held.count() == 5
    for _ in range(catalog._STAGE_RETAIN):
        catalog.stage_to_parquet(spark.range(5).toDF("x"), tag)
    # the first run dir is now retired: data gone, tombstone present
    import os

    assert os.path.isfile(os.path.join(held_path, catalog._STAGE_TOMBSTONE))
    # the held frame replays remembered file names, so its error names
    # the retired run dir (the policy's locus, where the tombstone sits)
    with pytest.raises(Exception, match=tag + "_run"):
        held.count()
    # a consumer that RE-LISTS the old path gets the cause in the
    # message: the footer read fails on the tombstone file itself
    with pytest.raises(Exception, match="REAPED"):
        spark.read.parquet(held_path).count()
    # the newest run is untouched
    assert catalog.stage_to_parquet(spark.range(3).toDF("x"), tag).count() == 3


def test_scoped_conf_restores_on_exception(spark):
    """scoped_conf (the centralized conf-scoped eager-staging helper,
    ADVICE r10/r11) must restore previously-set keys to their old
    value and previously-unset keys to UNSET, including when the body
    raises."""
    import pytest

    from _imdb_etl_spark.sources import scoped_conf

    set_key = "spark.sql.shuffle.partitions"
    unset_key = "spark.sql.cbo.joinReorder.dp.threshold"
    old = spark.conf.get(set_key)
    spark.conf.unset(unset_key)
    default = spark.conf.get(unset_key)  # SQLConf default, not a session pin

    with scoped_conf(spark, {set_key: "7", unset_key: "5"}):
        assert spark.conf.get(set_key) == "7"
        assert spark.conf.get(unset_key) == "5"
    assert spark.conf.get(set_key) == old
    assert spark.conf.get(unset_key) == default

    with pytest.raises(RuntimeError, match="boom"):
        with scoped_conf(spark, {set_key: "9", unset_key: "3"}):
            assert spark.conf.get(set_key) == "9"
            raise RuntimeError("boom")
    assert spark.conf.get(set_key) == old
    assert spark.conf.get(unset_key) == default
