"""Data-audit / profiling surface: CUBE grouping sets, exact grouped
percentiles, referential-integrity (orphan FK) audit, and single-pass
column profiling.

The reference delegates all of this to its warehouse (its only
inspection is SELECT * spot checks, /root/reference/etl_imdb_db.sql);
an engine meant to replace it at 100 TB needs first-class audit
primitives: you cannot eyeball a 100 TB staging load, you profile it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from _imdb_etl_spark.functions import dec, dsum
from _imdb_etl_spark.plans.registry import register
from _imdb_etl_spark.sources import load_tables

_CUBE_SQL = """
SELECT o_orderstatus AS status,
       year(o_orderdate) AS order_year,
       GROUPING(o_orderstatus, year(o_orderdate)) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, year(o_orderdate))
ORDER BY gid, status NULLS FIRST, order_year NULLS FIRST
"""


@register(
    "cube_orders_status_year",
    _CUBE_SQL,
    doc="CUBE grouping sets (all four subtotal combinations) with "
    "GROUPING id — completes the grouping-set family next to ROLLUP "
    "(rollup_orders_status_priority) and GROUPING SETS "
    "(grouping_sets_mixed). Spark expands to a single Expand node "
    "feeding one two-phase hash aggregate: one scan, map-side partial "
    "aggs for all 4 grouping sets at once — the shape that holds at "
    "100 TB because the fact table is read exactly once.",
)
def cube_orders_status_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load_tables(spark, sf_dir, "orders")
    return (
        orders.cube(
            F.col("o_orderstatus").alias("status"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dec("o_totalprice"), "total_price"),
        )
        .orderBy(
            "gid",
            F.asc_nulls_first("status"),
            F.asc_nulls_first("order_year"),
        )
    )


_MEDIAN_SQL = """
SELECT p_brand,
       COUNT(*) AS n_items,
       quantile_cont(l_extendedprice, 0.25) AS p25_price,
       quantile_cont(l_extendedprice, 0.50) AS median_price,
       quantile_cont(l_extendedprice, 0.75) AS p75_price
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


@register(
    "median_exact_price_per_brand",
    _MEDIAN_SQL,
    doc="EXACT grouped percentiles (quartiles of l_extendedprice per "
    "brand) over a broadcast fact-dim join. Exact percentile holds "
    "per-group value counts in the aggregation state, so its memory is "
    "bounded by distinct values per group — the verification face; the "
    "registered scale face for percentile at 100 TB is "
    "approx_quantiles_price (GK sketch, constant state). Both engines "
    "linearly interpolate identically (Spark percentile == DuckDB "
    "quantile_cont, verified bitwise at sf0.001/sf0.01), so the raw "
    "doubles hash-match without rounding.",
)
def median_exact_price_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = load_tables(spark, sf_dir, "lineitem", "part")
    return (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.percentile("l_extendedprice", F.lit(0.25)).alias("p25_price"),
            F.percentile("l_extendedprice", F.lit(0.50)).alias("median_price"),
            F.percentile("l_extendedprice", F.lit(0.75)).alias("p75_price"),
        )
        .orderBy("p_brand")
    )


# FK edges of the driver star schema: (edge label, child table, fk col,
# parent table, pk col). Orphan = non-null FK with no parent row — the
# audit every warehouse load needs before trusting joins.
_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]

_RI_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{edge}' AS edge,
       COUNT(*) AS n_child,
       COUNT(*) FILTER (WHERE c.{fk} IS NULL) AS n_null_fk,
       COUNT(*) FILTER (WHERE c.{fk} IS NOT NULL AND p.{pk} IS NULL)
           AS n_orphans
FROM {child} c LEFT JOIN {parent} p ON c.{fk} = p.{pk}
""".strip()
    for edge, child, fk, parent, pk in _FK_EDGES
)
_RI_SQL = f"SELECT * FROM (\n{_RI_SQL}\n) ORDER BY edge"


@register(
    "audit_referential_integrity",
    _RI_SQL,
    doc="Referential-integrity audit over every FK edge of the star "
    "schema: child rows, NULL FKs, and orphans (non-null FK with no "
    "parent). Each edge is one left join + filtered counts; dimension "
    "parents (nation, region) broadcast, the fact-sized edges are "
    "key-key shuffle joins that AQE plans — at 100 TB each edge is one "
    "bounded-output pass, and the per-edge aggregates are 1-row, so "
    "the union is free. This is the load-acceptance gate the reference "
    "outsources to its warehouse's constraint checks.",
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for edge, child_t, fk, parent_t, pk in _FK_EDGES:
        child, parent = load_tables(spark, sf_dir, child_t, parent_t)
        pkeys = parent.select(pk).distinct()
        if parent_t in ("nation", "region"):
            pkeys = F.broadcast(pkeys)
        joined = child.select(fk).join(
            pkeys.withColumn("__present", F.lit(1)),
            F.col(fk) == F.col(pk),
            "left",
        )
        agg = joined.agg(
            F.lit(edge).alias("edge"),
            F.count(F.lit(1)).alias("n_child"),
            F.count_if(F.col(fk).isNull()).alias("n_null_fk"),
            F.count_if(
                F.col(fk).isNotNull() & F.col("__present").isNull()
            ).alias("n_orphans"),
        ).select("edge", "n_child", "n_null_fk", "n_orphans")
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("edge")


# Single-pass profile of the orders table: one aggregate computes every
# column's stats, then inline() explodes the 1-row result into one row
# per column. Numeric/timestamp min-max land in *_num (timestamps as
# epoch seconds), string min-max in *_str.
_PROFILE_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _profile_branch_sql(col: str, kind: str) -> str:
    if kind == "num":
        mn = f"CAST(MIN({col}) AS DOUBLE)"
        mx = f"CAST(MAX({col}) AS DOUBLE)"
    elif kind == "ts":
        mn = f"epoch_ms(MIN({col})) / 1000.0"
        mx = f"epoch_ms(MAX({col})) / 1000.0"
    else:
        mn = mx = "CAST(NULL AS DOUBLE)"
    ms = f"MIN({col})" if kind == "str" else "CAST(NULL AS VARCHAR)"
    xs = f"MAX({col})" if kind == "str" else "CAST(NULL AS VARCHAR)"
    return (
        f"SELECT '{col}' AS col_name, COUNT({col}) AS n_nonnull, "
        f"COUNT(DISTINCT {col}) AS n_distinct, {mn} AS min_num, "
        f"{mx} AS max_num, {ms} AS min_str, {xs} AS max_str FROM orders"
    )


_PROFILE_SQL = (
    "SELECT * FROM (\n"
    + "\nUNION ALL\n".join(_profile_branch_sql(c, k) for c, k in _PROFILE_COLS)
    + "\n) ORDER BY col_name"
)


@register(
    "profile_table_orders",
    _PROFILE_SQL,
    doc="Single-pass column profiler (ANALYZE-style): per column "
    "non-null count, exact distinct count, min/max (numeric + "
    "timestamp as epoch seconds, strings lexicographic). The Spark "
    "side is ONE aggregate over one scan — the multiple exact "
    "DISTINCTs expand (one Expand node), which is the exact-profiling "
    "face; at 100 TB swap count_distinct for approx_count_distinct "
    "and the same plan becomes a true single pass with constant "
    "state. inline() pivots the 1-row aggregate into one row per "
    "column, so nothing but the 6-cell result ever leaves the "
    "executors. The oracle's UNION ALL re-scans per column — "
    "DuckDB-side cost, irrelevant to the comparison.",
)
def profile_table_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load_tables(spark, sf_dir, "orders")
    aggs = []
    structs = []
    for col, kind in _PROFILE_COLS:
        aggs.append(F.count(col).alias(f"{col}__n"))
        aggs.append(F.count_distinct(col).alias(f"{col}__d"))
        if kind == "num":
            mn = F.min(col).cast("double")
            mx = F.max(col).cast("double")
        elif kind == "ts":
            mn = F.unix_millis(F.min(col).cast("timestamp")) / F.lit(1000.0)
            mx = F.unix_millis(F.max(col).cast("timestamp")) / F.lit(1000.0)
        else:
            mn = mx = F.lit(None).cast("double")
        aggs.append(mn.alias(f"{col}__mn"))
        aggs.append(mx.alias(f"{col}__mx"))
        if kind == "str":
            aggs.append(F.min(col).alias(f"{col}__ms"))
            aggs.append(F.max(col).alias(f"{col}__xs"))
        structs.append(
            F.struct(
                F.lit(col).alias("col_name"),
                F.col(f"{col}__n").alias("n_nonnull"),
                F.col(f"{col}__d").alias("n_distinct"),
                F.col(f"{col}__mn").alias("min_num"),
                F.col(f"{col}__mx").alias("max_num"),
                (
                    F.col(f"{col}__ms") if kind == "str" else F.lit(None).cast("string")
                ).alias("min_str"),
                (
                    F.col(f"{col}__xs") if kind == "str" else F.lit(None).cast("string")
                ).alias("max_str"),
            )
        )
    return (
        orders.agg(*aggs)
        .select(F.inline(F.array(*structs)))
        .orderBy("col_name")
    )
