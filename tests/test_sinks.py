"""Sink round-trips: partitioned parquet, reference-dialect CSV, and
catalog-managed (CTAS/DROP) tables incl. bucketing."""

from __future__ import annotations

from pyspark.sql import functions as F

from _imdb_etl_spark.sources import load_tables, sinks


def test_partitioned_parquet_roundtrip(spark, sf_dir, tmp_path):
    (orders,) = load_tables(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_part")
    sinks.write_parquet(
        orders.withColumn("order_year", F.year("o_orderdate")),
        out,
        partition_by=["order_year"],
    )
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    # partition pruning: a year filter must prune input files
    pruned = back.where(F.col("order_year") == 1996)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == orders.where(F.year("o_orderdate") == 1996).count()
    assert "PartitionFilters: [isnotnull(order_year" in plan


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """Joining a partitioned fact with a filtered dim must inject a
    dynamic pruning subquery on the partition column."""
    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    out = str(tmp_path / "orders_by_year")
    sinks.write_parquet(
        orders.withColumn("order_year", F.year("o_orderdate")),
        out,
        partition_by=["order_year"],
    )
    fact = spark.read.parquet(out)
    # DPP requires the join key to be the partition column
    dim = (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .select("order_year", "o_orderpriority")
        .distinct()
        .where(F.col("o_orderpriority") == "1-URGENT")
    )
    joined = fact.join(dim.hint("broadcast"), "order_year")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower()


def test_csv_reference_dialect_roundtrip(spark, sf_dir, tmp_path):
    (customer,) = load_tables(spark, sf_dir, "customer")
    out = str(tmp_path / "cust_csv")
    with_null = customer.withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 == 0, None).otherwise(F.col("c_mktsegment")),
    )
    sinks.write_csv(with_null, out)
    back = spark.read.csv(
        out, header=True, quote='"', escape='"', nullValue="NULL",
        schema=with_null.schema,
    )
    assert back.count() == customer.count()
    assert (
        back.where(F.col("c_mktsegment").isNull()).count()
        == with_null.where(F.col("c_mktsegment").isNull()).count()
    )


def test_json_roundtrip_with_schema(spark, sf_dir, tmp_path):
    (events,) = load_tables(spark, sf_dir, "events")
    out = str(tmp_path / "events_json")
    sinks.write_json(events, out)
    back = sinks.read_json(spark, out, events.schema)
    assert back.count() == events.count()
    assert back.schema == events.schema
    # values survive the round-trip (timestamps incl. microseconds)
    a = {r.event_id: (r.ts, r.value) for r in events.collect()}
    b = {r.event_id: (r.ts, r.value) for r in back.collect()}
    assert a == b


def test_ctas_bucketed_table_and_drop(spark, sf_dir):
    (orders,) = load_tables(spark, sf_dir, "orders")
    sinks.save_as_table(orders, "orders_bucketed", bucket_by=(4, ["o_custkey"]))
    t = spark.table("orders_bucketed")
    assert t.count() == orders.count()
    # a groupBy on the bucket key must not need a shuffle exchange
    agg = t.groupBy("o_custkey").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(o_custkey" not in plan
    sinks.drop_table(spark, "orders_bucketed")
    assert "orders_bucketed" not in [x.name for x in spark.catalog.listTables()]


def test_bucketed_fact_star_join_skips_both_exchanges(spark, sf_dir):
    """The named scale lever for fact_star_left_joins
    (plans/relational.py): pre-bucketing lineitem AND orders on the
    order key at matching bucket counts makes the fact-assembly join
    exchange-free on BOTH sides — the one-time write shuffle replaces
    the per-query shuffle, which is the trade that wins when the fact
    table is re-joined more than once at 100 TB."""
    lineitem, orders = load_tables(spark, sf_dir, "lineitem", "orders")
    sinks.save_as_table(
        lineitem, "lineitem_bkt", bucket_by=(4, ["l_orderkey"])
    )
    sinks.save_as_table(orders, "orders_bkt", bucket_by=(4, ["o_orderkey"]))
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path: at test scale AQE would broadcast
        # the small side, hiding exactly the exchange this test audits
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li, od = spark.table("lineitem_bkt"), spark.table("orders_bkt")
        joined = li.join(
            od, F.col("l_orderkey") == F.col("o_orderkey"), "left"
        ).select("l_orderkey", "l_linenumber", "o_custkey")
        assert joined.count() == lineitem.count()  # 1:N fan-out = left rows
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        sinks.drop_table(spark, "lineitem_bkt")
        sinks.drop_table(spark, "orders_bkt")


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    from _imdb_etl_spark.sources import load_tables

    (orders,) = load_tables(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_orc")
    sinks.write_orc(orders, out, partition_by=["o_orderpriority"])
    back = sinks.read_orc(spark, out)
    assert back.count() == orders.count()
    # partition pruning reaches the ORC scan
    pruned = back.where(F.col("o_orderpriority") == "1-URGENT")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "partitionFilters" in plan.lower().replace(" ", "") or \
        "PartitionFilters: [isnotnull(o_orderpriority" in plan
    assert pruned.count() == orders.where(
        F.col("o_orderpriority") == "1-URGENT"
    ).count()
    # predicate pushdown on a data column
    sel = back.where(F.col("o_totalprice") > 300000.0)
    plan2 = sel._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan2 and "o_totalprice" in plan2


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from _imdb_etl_spark.sources.sinks import compact_parquet

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    # simulate streaming debris: 64 tiny files
    spark.range(0, 6400).withColumn("v", F.col("id") * 2).repartition(
        64
    ).write.parquet(src)
    import glob

    assert len(glob.glob(f"{src}/part-*.parquet")) == 64
    parts = compact_parquet(spark, src, dst, target_rows_per_file=2000)
    files = glob.glob(f"{dst}/part-*.parquet")
    assert parts == 4 and 1 <= len(files) <= 4
    # lossless: same rows, and footer row counts respect the cap
    assert spark.read.parquet(dst).count() == 6400
    import pyarrow.parquet as pq

    for f in files:
        assert pq.ParquetFile(f).metadata.num_rows <= 2000


def test_compact_parquet_sorted_keeps_rowgroup_stats_tight(spark, tmp_path):
    from _imdb_etl_spark.sources.sinks import compact_parquet

    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "comp2")
    spark.range(0, 4000).repartition(16).write.parquet(src)
    compact_parquet(spark, src, dst, 1000, sort_cols=["id"])
    import glob

    import pyarrow.parquet as pq

    spans = []
    for f in glob.glob(f"{dst}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        st = md.row_group(0).column(0).statistics
        spans.append((st.min, st.max))
    spans.sort()
    # range partitioning makes file key-ranges disjoint -> min/max
    # footer stats can prune whole files on point/range predicates
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2


def test_partitioned_overwrite_is_dynamic(spark, tmp_path):
    """An overwrite carrying only one partition must not wipe siblings —
    the incremental-backfill safety property."""
    from _imdb_etl_spark.sources import sinks

    out = str(tmp_path / "dyn")
    full = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, part string"
    )
    sinks.write_parquet(full, out, partition_by=["part"])
    one = spark.createDataFrame([(9, "a")], "id long, part string")
    sinks.write_parquet(one, out, partition_by=["part"])
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    # partition a replaced, partition b intact
    assert got == [(2, "b"), (9, "a")]


def test_zorder_layout_tightens_file_stats(spark, sf_dir, tmp_path):
    """Z-ordered files must carry tighter per-file bounding boxes on
    BOTH clustering dimensions than a hash layout — the min/max
    footer-stat property that lets scans filtered on either dimension
    prune files (the point of OPTIMIZE ZORDER)."""
    import glob

    from pyspark.sql import functions as F

    from _imdb_etl_spark.plans.events import _z_terms
    from _imdb_etl_spark.sources import load_tables

    (events,) = load_tables(spark, sf_dir, "events")
    dims = events.select(
        (F.col("user_id") % 256).alias("ua"),
        (
            (F.dayofmonth("ts").cast("long") * 24 + F.hour("ts").cast("long"))
            % 256
        ).alias("hb"),
    ).withColumn("zval", F.expr(_z_terms("ua", "hb", "div")))

    def avg_box_area(path: str) -> float:
        areas = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            stats = (
                spark.read.parquet(f)
                .agg(
                    F.max("ua") - F.min("ua"), F.max("hb") - F.min("hb")
                )
                .collect()[0]
            )
            areas.append((stats[0] + 1) * (stats[1] + 1))
        assert len(areas) >= 4
        return sum(areas) / len(areas)

    zpath, hpath = str(tmp_path / "zorder"), str(tmp_path / "hash")
    dims.repartitionByRange(8, "zval").write.parquet(zpath)
    dims.repartition(8).write.parquet(hpath)
    z_area, h_area = avg_box_area(zpath), avg_box_area(hpath)
    # hash layout sees the full 256x256 space per file; z-order files
    # must cover a materially smaller rectangle on average
    assert z_area < h_area / 2, (z_area, h_area)


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    """The bucketing claim, pinned on the physical plan: with broadcast
    disabled, joining the two orderkey-bucketed tables produces ZERO
    Exchange nodes — bucket i joins bucket i directly (the ingest-time
    shuffle is the only shuffle, amortized over every later join)."""
    from _imdb_etl_spark.sources.partitioned import (
        _bucket_table,
        bucketed_orders_lineitem,
    )

    bucketed_orders_lineitem(spark, sf_dir)
    thresh_key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(thresh_key)
    spark.conf.set(thresh_key, "-1")
    try:
        o = spark.table(_bucket_table("o"))
        li = spark.table(_bucket_table("l"))
        joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # and the join actually returns the full fan-out
        assert joined.count() == li.count()
    finally:
        spark.conf.set(thresh_key, old)
