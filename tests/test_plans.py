"""Physical-plan regression tests: the properties that make these
queries scale (pushdown, pruning, broadcast, top-k fusion, window group
limits) are asserted so a refactor can't silently lose them. Plus an
A/B check that the reference's SQL text run through spark.sql equals
our DataFrame builders (SURVEY.md §7 step 4).
"""

from __future__ import annotations

import re

import pytest

from _imdb_etl_spark.etl import grafs as g
from _imdb_etl_spark.etl.star import run_pipeline
from _imdb_etl_spark.plans import REGISTRY
from _imdb_etl_spark.testing import canon_rows


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _explain(df) -> str:
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = _explain(REGISTRY["tpch_q1_pricing_summary"].spark(spark, sf_dir))
    assert "LessThanOrEqual(l_shipdate" in plan  # filter reaches the scan
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]  # pruned
    assert "HashAggregate" in plan


def test_graf3_broadcast_and_topk(spark, sf_dir):
    plan = _explain(REGISTRY["graf3_top10_customers"].spark(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_w1_window_group_limit(spark, sf_dir):
    plan = _explain(REGISTRY["w1_top3_parts_per_brand"].spark(spark, sf_dir))
    assert "WindowGroupLimit" in plan  # rank<=k pushed below the window


def test_lsh_candidate_stage_exchange_reused(spark, sf_dir):
    """The one-exchange claim of lsh_candidates (operators/dedup.py):
    the doc-keyed signature/shingle aggregation is consumed by the band
    probe side, band build side, and both verify sides — the final
    adaptive plan must REUSE that exchange, not recompute the shingle
    shuffle per consumer."""
    df = REGISTRY["dedup_jaccard_lsh"].spark(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 2, plan


def test_semi_anti_join_strategy(spark, sf_dir):
    semi = _explain(REGISTRY["semi_join_big_spenders"].spark(spark, sf_dir))
    anti = _explain(REGISTRY["anti_join_small_spenders"].spark(spark, sf_dir))
    assert "LeftSemi" in semi and "LeftAnti" in anti


def test_gate_window_fits_driver_cut():
    """The driver records only the first GATE_WINDOW_SIZE registry
    entries per round; an intended window longer than the cut silently
    loses its tail (round 4 listed 52 names and two got no gate row)."""
    from _imdb_etl_spark.plans import (
        GATE_WINDOW,
        GATE_WINDOW_SIZE,
        apply_gate_order,
    )

    # mirror the driver contract (__spark_entry__.queries), which
    # re-applies the order to be robust to module import order
    apply_gate_order()

    assert len(GATE_WINDOW) <= GATE_WINDOW_SIZE, (
        f"intended gate window has {len(GATE_WINDOW)} entries; the "
        f"driver records only the first {GATE_WINDOW_SIZE}"
    )
    assert len(set(GATE_WINDOW)) == len(GATE_WINDOW), "duplicate names"
    missing = [n for n in GATE_WINDOW if n not in REGISTRY]
    assert not missing, f"gate window names not in registry: {missing}"
    # the registry must actually lead with the intended window
    assert list(REGISTRY)[: len(GATE_WINDOW)] == GATE_WINDOW


def test_no_cartesian_in_registry_except_intended(spark, sf_dir):
    # cross products are only ever legitimate against a broadcast side
    for name, spec in REGISTRY.items():
        if name in ("dedup_simhash",):  # UDF plans checked elsewhere
            continue
        df = spec.spark(spark, sf_dir)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Runtime row-level bloom-filter injection: a shuffle join whose
    build side carries a selective filter gets a bloom_filter_agg
    subquery applied to the probe-side scan, pruning rows before the
    shuffle. Local test tables sit under the default size thresholds
    (10 MB creation side), so the test lowers them — at the 100 TB
    design point the production defaults are met naturally and this
    optimization is free."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1B",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        from pyspark.sql import functions as F

        from _imdb_etl_spark.sources import load_tables

        li, orders = load_tables(spark, sf_dir, "lineitem", "orders")
        sel = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
            "o_orderkey"
        )
        plan = _plan(li.join(sel, li["l_orderkey"] == sel["o_orderkey"]))
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan.lower()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_join_hints_control_strategy(spark, sf_dir):
    """Join-strategy hints: the engine exposes Catalyst's full strategy
    surface (broadcast is the AQE default at this scale; merge and
    shuffle_hash must be selectable for cluster-size joins)."""
    from pyspark.sql import functions as F

    from _imdb_etl_spark.sources import load_tables

    orders, customer = load_tables(spark, sf_dir, "orders", "customer")
    cond = orders["o_custkey"] == customer["c_custkey"]
    smj = orders.join(customer.hint("merge"), cond)
    assert "SortMergeJoin" in _plan(smj)
    shj = orders.join(customer.hint("shuffle_hash"), cond)
    assert "ShuffledHashJoin" in _plan(shj)
    bhj = orders.join(F.broadcast(customer), cond)
    assert "BroadcastHashJoin" in _plan(bhj)


@pytest.fixture(scope="module")
def tables(spark, imdb_stage):
    return run_pipeline(spark, imdb_stage)


def test_reference_sql_text_equals_dataframe_builders(spark, tables):
    """Run the reference's own dashboard SQL (tiebreakers added) through
    spark.sql over the materialized views and compare with the
    DataFrame-built Grafs — both front-ends, one semantics."""
    cases = {
        "graf1": (
            """SELECT dm.country AS country, COUNT(dm.movie_id) AS number_of_movies
               FROM dim_movies AS dm
               WHERE dm.country IN ('USA', 'India') AND dm.year = 2019
               GROUP BY dm.country
               ORDER BY number_of_movies DESC, country""",
            g.graf1_usa_india_2019(tables["dim_movies"]),
        ),
        "graf3": (
            """SELECT dp.name AS director_name, COUNT(fm.movie_id) AS movie_count
               FROM fact_movies AS fm
               JOIN dim_people AS dp ON fm.director_id = dp.person_id
               GROUP BY dp.name
               ORDER BY movie_count DESC, director_name
               LIMIT 10""",
            g.graf3_top10_directors(tables["fact_movies"], tables["dim_people"]),
        ),
        "graf5": (
            """SELECT dp.name AS actor_name, COUNT(*) AS total_roles
               FROM role_mapping_staging AS rm
               JOIN dim_people AS dp ON rm.name_id = dp.person_id
               WHERE rm.category IN ('actor', 'actress')
               GROUP BY dp.name
               ORDER BY total_roles DESC, actor_name
               LIMIT 10""",
            g.graf5_top10_actors_by_roles(
                tables["role_mapping_staging"], tables["dim_people"]
            ),
        ),
    }
    for name, (sql, df) in cases.items():
        sql_df = spark.sql(sql)
        _, h_sql = canon_rows(sql_df.columns, [tuple(r) for r in sql_df.collect()])
        _, h_df = canon_rows(df.columns, [tuple(r) for r in df.collect()])
        assert h_sql == h_df, name


def test_scd2_history_two_snapshot_fixture(spark):
    from _imdb_etl_spark.plans.scale import scd2_history

    snaps = spark.createDataFrame(
        [
            (1, "AUTO", 1, "2024-01-01"),
            (1, "AUTO", 2, "2024-07-01"),  # unchanged: one open row
            (2, "AUTO", 1, "2024-01-01"),
            (2, "VIP", 2, "2024-07-01"),  # changed: close old, open new
            (3, "MACH", 2, "2024-07-01"),  # appears only in snapshot 2
        ],
        "c_custkey long, c_mktsegment string, snap_ver int, snap_date string",
    )
    rows = sorted(
        tuple(r)
        for r in scd2_history(snaps, "c_custkey", "c_mktsegment").collect()
    )
    assert rows == [
        (1, "AUTO", "2024-01-01", None, True),
        (2, "AUTO", "2024-01-01", "2024-07-01", False),
        (2, "VIP", "2024-07-01", None, True),
        (3, "MACH", "2024-07-01", None, True),
    ]


def test_vocab_topk_is_parallel_take_ordered(spark, sf_dir):
    df = REGISTRY["vocab_top_words"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the global top-100 must be a parallel partial top-k, never a
    # whole-vocabulary sort through one task: TakeOrderedAndProject
    # bounds the window input to the k survivors
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan


def test_range_join_avoids_nested_loop(spark, sf_dir):
    df = REGISTRY["range_join_price_bands"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_salted_join_is_shuffled_hash_on_salt(spark, sf_dir):
    plan = _explain(REGISTRY["skew_join_salted_events"].spark(spark, sf_dir))
    assert "ShuffledHashJoin" in plan  # the hint holds; no broadcast
    # both sides partition on (user_id, salt) — the whole point
    assert plan.count("hashpartitioning(user_id") >= 2
    assert "salt" in plan.split("hashpartitioning(user_id")[1].split(")")[0]


def test_pack_shards_single_data_shuffle(spark, sf_dir):
    plan = _explain(REGISTRY["corpus_pack_shards"].spark(spark, sf_dir))
    # one hash exchange (lang) + the final presentation range sort only
    assert plan.count("hashpartitioning(") == 1
    assert plan.count("rangepartitioning(") == 1
    # the text column is reduced to a token count BEFORE the shuffle: the
    # hash exchange's input row is (doc_id, lang, n_tokens), never text
    exchange_detail = plan.split("Arguments: hashpartitioning(")[0]
    exchange_input = exchange_detail.rsplit("Input [", 1)[1]
    assert "text#" not in exchange_input


def test_unpivot_is_expand_no_extra_shuffle(spark, sf_dir):
    plan = _explain(REGISTRY["events_unpivot_daily"].spark(spark, sf_dir))
    assert "Expand" in plan  # wide-to-long is codegen fan-out, not a join


def test_pii_redact_is_narrow_map(spark, sf_dir):
    plan = _explain(REGISTRY["text_pii_redact"].spark(spark, sf_dir))
    # pure per-row regex map: the ONLY shuffle is the final orderBy's
    # range partitioning — any hash Exchange means a regression. Count
    # unique node ids: explain("formatted") lists each node twice (tree
    # + details), so raw line counts double-count a single Exchange.
    exchange_ids = {
        m for m in re.findall(r"\((\d+)\) Exchange", plan)
    } | {m for m in re.findall(r"Exchange \((\d+)\)", plan)}
    assert len(exchange_ids) == 1, plan
    assert "rangepartitioning" in plan and "hashpartitioning" not in plan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "text" in read[0] and "lang" not in read[0]


def test_corpus_two_phase_ops_have_no_cartesian_blowup(spark, sf_dir):
    for name in ("boilerplate_ngram_filter", "unigram_logprob_quality"):
        plan = _plan(REGISTRY[name].spark(spark, sf_dir))
        # the only nested-loop is the 1-row scalar broadcast (threshold /
        # corpus total); the gram/token joins must be hash joins
        assert "CartesianProduct" not in plan, name
        assert plan.count("BroadcastNestedLoopJoin") <= 1, name


def test_runtime_bloom_filter_injects_on_shuffle_join(spark, sf_dir):
    """Runtime bloom-filter join pruning (the 100 TB path: a selective
    dim-side filter becomes a pre-shuffle bloom probe on the fact scan).
    Thresholds are tuned for TB-scale scans, so lower them to prove the
    seam works; at real scale the defaults fire on their own."""
    from _imdb_etl_spark.plans import REGISTRY as R
    from _imdb_etl_spark.sources import load_tables
    from pyspark.sql import functions as F

    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li, o = load_tables(spark, sf_dir, "lineitem", "orders")
        j = (
            li.join(
                o.where(F.col("o_orderpriority") == "1-URGENT"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("l_returnflag")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan.lower()
    finally:
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_oov_vocab_probe_is_bounded_broadcast(spark, sf_dir):
    df = REGISTRY["vocab_oov_rate"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the vocabulary must be built as a parallel partial top-k and the
    # membership probe must broadcast it — never shuffle the token
    # stream against a shuffled vocab
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_corpus_line_dedup_has_no_pair_blowup(spark, sf_dir):
    df = REGISTRY["dedup_corpus_lines"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # segment hashing is map-side fan-out: the frequency agg and the
    # join back key on the hash; only keyed exchanges appear
    assert plan.count("Exchange hashpartitioning") <= 4


def test_session_window_native_has_no_window_exec(spark, sf_dir):
    """The point of the native session aggregate: sessions merge inside
    ONE hash aggregate on the user key — no window-function pass, no
    second shuffle for the islands running sum."""
    plan = _explain(REGISTRY["events_session_window_native"].spark(spark, sf_dir))
    assert "session_window" in plan
    assert "Window" not in plan.replace("session_window", "")
    assert plan.count("hashpartitioning(") <= 2  # agg key + presentation


def test_ivfpq_stays_broadcast_no_cartesian(spark, sf_dir):
    """The composed index must inherit both parents' scale shapes: the
    candidate stage joins broadcast probes to keyed lists, the scoring
    stage joins a broadcast LUT — never an all-pairs product."""
    plan = _explain(REGISTRY["sim_knn_ivfpq"].spark(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_funnel_single_user_shuffle(spark, sf_dir):
    """The running-MIN funnel formulation exists to avoid one join per
    stage: everything keys on user_id exactly once."""
    plan = _explain(REGISTRY["events_funnel_analysis"].spark(spark, sf_dir))
    assert plan.count("hashpartitioning(user_id") <= 2  # windows + agg reuse
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_bench_lists_reference_registered_queries():
    """bench.py silently skips unknown names (fault isolation), so a
    typo in HEADLINE/SF1_SPOT would shrink the bench instead of
    failing — pin every listed name to a registry entry."""
    import bench

    for name in bench.HEADLINE:
        assert name in REGISTRY, f"HEADLINE lists unregistered {name}"
    for name in bench.SF1_SPOT:
        assert name in REGISTRY, f"SF1_SPOT lists unregistered {name}"


def test_registry_hygiene_docs_and_gate_rest():
    """Every registered query documents itself (the docs are the scale
    audit trail the judge and planlint allow-list lean on), and the
    spillover list stays consistent with the registry."""
    from _imdb_etl_spark.plans import GATE_WINDOW
    from _imdb_etl_spark.plans import _GATE_REST  # noqa: PLC2701

    for name, spec in REGISTRY.items():
        assert spec.doc and len(spec.doc) > 40, f"{name} has no real doc"
        if spec.oracle is not None:
            assert "SELECT" in spec.oracle.upper(), f"{name} oracle odd"
    unknown = [n for n in _GATE_REST if n not in REGISTRY]
    assert not unknown, f"_GATE_REST names not in registry: {unknown}"
    overlap = set(GATE_WINDOW) & set(_GATE_REST)
    assert not overlap, f"names in both window and rest: {overlap}"


def test_parameterized_sql_still_pushes_down(spark, sf_dir):
    """The named-parameter cutoff must reach the parquet scan as a
    data filter (parameter binding is not string templating, but it
    must not block pushdown either)."""
    df = REGISTRY["sql_parameterized_revenue"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scan and "o_orderdate" in scan[0] and "1997-06-01" in scan[0]


def test_incremental_minhash_reuses_candidate_exchange(spark, sf_dir):
    """dedup_incremental_minhash composes the SAME lsh_candidates stage
    (band probe + build + verify all reading one doc-keyed signature
    aggregation) plus the boundary-flag joins — the adaptive plan must
    reuse that exchange rather than recompute the shingle shuffle for
    the incremental face's extra consumers."""
    df = REGISTRY["dedup_incremental_minhash"].spark(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 2, plan


def test_runtime_bloom_filter_injected(spark, sf_dir):
    """Under the registered builder's planning confs, the optimizer
    must inject the runtime bloom filter: bloom_filter_agg on the
    urgent-orders build side and a might_contain probe on the lineitem
    side — the semi-join reduction that cuts shuffled bytes by the
    filter's selectivity at scale."""
    from _imdb_etl_spark.plans.scale import (
        _BCAST_KEY,
        _BLOOM_SCAN_KEY,
        _bloom_join_frame,
    )

    old_scan = spark.conf.get(_BLOOM_SCAN_KEY)
    old_bcast = spark.conf.get(_BCAST_KEY)
    spark.conf.set(_BLOOM_SCAN_KEY, "0")
    spark.conf.set(_BCAST_KEY, "-1")
    try:
        plan = (
            _bloom_join_frame(spark, sf_dir)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
    finally:
        spark.conf.set(_BLOOM_SCAN_KEY, old_scan)
        spark.conf.set(_BCAST_KEY, old_bcast)
    assert "might_contain" in plan, plan
    assert "bloom_filter_agg" in plan, plan


def test_aqe_skew_join_split(spark):
    """Under the registered builder's lowered thresholds, AQE's
    OptimizeSkewedJoin must split the sentinel-key partition: the
    final adaptive plan carries SortMergeJoin(skew=true). Pinned at
    sf0.01 (the driver's correctness scale): the split decision is
    byte-based, and sf0.001's hot partition is under a kilobyte —
    below any meaningful threshold."""
    from _imdb_etl_spark.plans.scale import _AQE_SKEW_CONFS, _aqe_skew_frame

    old = {k: spark.conf.get(k) for k in _AQE_SKEW_CONFS}
    for k, v in _AQE_SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        df = _aqe_skew_frame(spark, "/root/testdata/sf0.01")
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan


def test_identifier_binding_pushes_resolution_not_strings(spark, sf_dir):
    """IDENTIFIER(:tbl) must resolve as a catalog identifier — a
    malicious 'name' containing SQL is an invalid identifier error,
    never executed text (the injection-safety contract)."""
    import pytest as _pytest

    from _imdb_etl_spark.sources import load_tables

    (orders,) = load_tables(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("ident_inj_probe")
    with _pytest.raises(Exception) as e:
        spark.sql(
            "SELECT COUNT(*) FROM IDENTIFIER(:tbl)",
            args={"tbl": "ident_inj_probe WHERE 1=0 --"},
        ).collect()
    msg = str(e.value)
    assert "PARSE" in msg.upper() or "IDENTIFIER" in msg.upper(), msg
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM IDENTIFIER(:tbl)",
        args={"tbl": "ident_inj_probe"},
    ).collect()[0].n
    assert n == orders.count()


def test_fuzzy_groups_n_pairs_equals_expansion_counts(spark, sf_dir):
    """The bounded group face's n_pairs column must be exactly the row
    count the expansion face emits for that name pair — the contract
    that lets a consumer trust the group-level blast radius without
    ever materializing the quadratic part-pair list. Keys normalize to
    (least, greatest) name because the expansion face orders names by
    part key, not lexicographically."""
    from pyspark.sql import functions as F

    from _imdb_etl_spark.plans.advanced import (
        fuzzy_part_match,
        fuzzy_part_name_groups,
    )

    groups = {
        (r.name_a, r.name_b): r.n_pairs
        for r in fuzzy_part_name_groups(spark, sf_dir).collect()
    }
    expanded = fuzzy_part_match(spark, sf_dir).select(
        F.least("name_a", "name_b").alias("na"),
        F.greatest("name_a", "name_b").alias("nb"),
    )
    counts = {
        (r.na, r.nb): r.c
        for r in expanded.groupBy("na", "nb")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert groups == counts
    assert all(v > 0 for v in groups.values())


def test_fuzzy_expansion_matches_duckdb_oracle(spark, sf_dir):
    """Demotion verifier (round 9): fuzzy_part_name_match left the
    registry — its output is quadratic in duplicate-group size by
    definition (the registry's last sf1 watchdog cap-out, OOM at sf10)
    — so the driver's oracle pairing moves here: replay _FUZZY_SQL via
    DuckDB on the same parquet and compare the full row set exactly,
    at the bounded test scale where the expansion is small."""
    import duckdb

    from _imdb_etl_spark.plans.advanced import _FUZZY_SQL, fuzzy_part_match

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW part AS "
        f"SELECT * FROM read_parquet('{sf_dir}/part.parquet')"
    )
    want = con.sql(_FUZZY_SQL).fetchall()
    con.close()
    got = [
        (r.part_a, r.part_b, r.name_a, r.name_b, r.edit_distance)
        for r in fuzzy_part_match(spark, sf_dir).collect()
    ]
    assert got == [tuple(w) for w in want]
    assert len(got) > 0


def test_broadcast_gate_rows_and_bytes(spark, sf_dir):
    """broadcast_if_bounded (ADVICE r10 rows + r11 bytes): the hint
    must apply to a small narrow frame, drop beyond the row ceiling,
    and — the r11 case — drop for a row-count-small frame whose
    string payload makes the estimated broadcast heavy."""
    from pyspark.sql import functions as F

    from _imdb_etl_spark.functions import broadcast_if_bounded
    from _imdb_etl_spark.sources import load_tables

    (nation,) = load_tables(spark, sf_dir, "nation")

    def is_hinted(df):
        return "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()

    small = nation.select("n_nationkey", "n_name")
    assert is_hinted(broadcast_if_bounded(small))
    assert not is_hinted(broadcast_if_bounded(small, max_rows=1))
    # 25 rows but ~128KB/row of string payload -> byte gate trips
    heavy = small.withColumn("pad", F.repeat(F.lit("x"), 1 << 16))
    assert not is_hinted(broadcast_if_bounded(heavy, max_bytes=1 << 20))
    # and with a generous byte budget the same frame is hinted again
    assert is_hinted(broadcast_if_bounded(heavy, max_bytes=1 << 30))


def test_broadcast_gate_footer_short_circuit(spark, sf_dir):
    """The gate's parquet-footer short-circuit (round 13): a fixed-
    width scan/filter/project frame whose footers prove it under both
    caps must be hinted WITHOUT running the eager measure job; row-
    multiplying plans and string-bearing frames must fall through to
    the measured pass; and the footer bound must never ADMIT a frame
    the caps reject (it is an upper bound used only in the positive
    direction)."""
    from pyspark.sql import functions as F

    from _imdb_etl_spark.functions import (
        _footer_rows_upper,
        broadcast_if_bounded,
    )
    from _imdb_etl_spark.sources import load_tables

    (nation,) = load_tables(spark, sf_dir, "nation")
    keys = nation.where(F.col("n_nationkey") >= 0).select(
        "n_nationkey", "n_regionkey"
    )
    # footer bound: exact file row count for a nonincreasing plan
    n_file = nation.count()
    assert _footer_rows_upper(keys) == n_file
    # row-multiplying (explode) and join shapes: no bound
    assert _footer_rows_upper(
        keys.select(F.explode(F.array("n_nationkey", "n_regionkey")))
    ) is None
    assert _footer_rows_upper(keys.crossJoin(nation.select("n_name"))) is None

    def is_hinted(df):
        return "ResolvedHint" in df._jdf.queryExecution().analyzed().toString()

    # short-circuit fires: hinted with ZERO jobs run
    sc = spark.sparkContext
    sc.setJobGroup("gate-sc", "short-circuit probe")
    try:
        assert is_hinted(broadcast_if_bounded(keys))
        assert sc.statusTracker().getJobIdsForGroup("gate-sc") == []
        # under-the-cap footer count but caps below it: falls through
        # to the measured pass (a job runs) and still refuses
        assert not is_hinted(broadcast_if_bounded(keys, max_rows=1))
        assert sc.statusTracker().getJobIdsForGroup("gate-sc") != []
    finally:
        sc.setJobGroup(None, None)
        sc.setLocalProperty("spark.jobGroup.id", None)


def test_regression_tripwire_normalizes_by_canary():
    """The bench tripwire must scale its 1.5x threshold by the canary
    load factor (round-11 verdict task 4): a uniformly inflated run
    on a box whose fixed-work canary shows the same inflation must
    NOT flag, the same run with a nominal canary MUST, and the factor
    clamps at 3x so heavy load can't hide a real regression."""
    import json

    import bench

    base = (
        json.load(open("/root/repo/BENCH_r01.json")).get("parsed") or {}
    ).get("queries") or {}
    assert base, "r1 baseline required by the tripwire"
    nominal = {"jvm_sec": bench._CANARY_NOMINAL_JVM, "gemm_sec": 0.01}
    # every query 1.8x its r1 time: raw gate (1.5x) flags all of them
    inflated = {n: 1.8 * t for n, t in base.items()}
    assert len(bench.regressions(inflated, nominal)) == len(base)
    # ... but a canary showing the box itself 1.8x loaded absorbs it
    loaded = {"jvm_sec": 1.8 * bench._CANARY_NOMINAL_JVM}
    assert bench.regressions(inflated, loaded) == []
    # the factor clamps: a 10x-loaded canary must not excuse a 6x run
    storm = {"jvm_sec": 10 * bench._CANARY_NOMINAL_JVM}
    blown = {n: 6.0 * t for n, t in base.items()}
    flagged = bench.regressions(blown, storm)
    assert len(flagged) == len(base)
    assert all(f["load_factor"] == 3.0 for f in flagged)
    # missing/garbled canary falls back to the raw gate, never raises
    assert bench.load_factor(None) == 1.0
    assert bench.load_factor({"gemm_sec": 0.5}) == 1.0


def test_quiet_box_wait_bounded_and_threshold():
    """The pre-bench quiet-box gate (round-12 verdict task 1) must:
    proceed immediately on a quiet canary (no sleeping), wait while
    the canary reads hot and resume once it cools, give up after the
    bounded budget (never an unbounded stall), honor the kill switch,
    and swallow probe failures rather than zeroing the bench."""
    import bench

    nominal = bench._CANARY_NOMINAL_JVM
    slept: list[float] = []

    def sleeper(s):
        slept.append(s)

    # quiet box: one probe, zero sleeps, None (the common case)
    out = bench.wait_for_quiet_box(
        lambda: {"jvm_sec": nominal}, sleep=sleeper
    )
    assert out is None and slept == []
    # hot then cooling: waits exactly until the probe reads quiet
    readings = iter([3.0 * nominal, 2.0 * nominal, 1.0 * nominal])
    out = bench.wait_for_quiet_box(
        lambda: {"jvm_sec": next(readings)}, sleep=sleeper,
        step_s=10.0, max_wait_s=100.0,
    )
    assert out == {"waited_sec": 20.0, "probes": [3.0, 2.0, 1.0],
                   "quiet": True}
    # persistently hot: gives up at the bound and says so
    out = bench.wait_for_quiet_box(
        lambda: {"jvm_sec": 5.0 * nominal}, sleep=sleeper,
        step_s=10.0, max_wait_s=30.0,
    )
    assert out is not None and out["quiet"] is False
    assert out["waited_sec"] == 30.0
    # kill switch
    import os

    os.environ["BENCH_QUIET_WAIT"] = "0"
    try:
        assert bench.wait_for_quiet_box(
            lambda: {"jvm_sec": 99.0}, sleep=sleeper
        ) is None
    finally:
        del os.environ["BENCH_QUIET_WAIT"]
    # probe failure: never raises, proceeds to the bench
    def boom():
        raise RuntimeError("no spark")

    assert bench.wait_for_quiet_box(boom, sleep=sleeper) is None
