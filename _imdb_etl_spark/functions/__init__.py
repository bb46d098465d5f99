"""Shared column-expression helpers.

Exact-decimal arithmetic policy
-------------------------------
Driver correctness is judged by a value-hash against a DuckDB oracle, and
floating-point SUM/AVG are order-dependent — a shuffled Spark aggregation
and a single-threaded DuckDB scan will disagree in the low bits, and the
disagreement is nondeterministic run-to-run. The synthetic data's money
and quantity columns are 2-decimal values stored as double, so the policy
is:

1. cast inputs to narrow decimals at the scan (exact, and the nearest
   double to a 2-dp value always rounds back to it),
2. do the +,-,* arithmetic and SUM in decimal (exact, associative,
   order-independent — identical in both engines),
3. cast the final aggregate to double for a stable output schema.

Precisions are kept narrow enough that intermediate multiply results fit
in DECIMAL(38,_) in BOTH engines without precision-loss rewrites
(duckdb widens w1+w2; spark w1+w2+1 — keep w1+w2+1 <= 38).

AVG is expressed as CAST(SUM(dec) AS DOUBLE) / COUNT(_): both engines
then perform the same single double division on identical inputs.

This is also the right call at 100 TB: decimal aggregation keeps results
reproducible across retries and partition counts, which float sums do not.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"  # prices, balances, per-event values
FRAC = "decimal(8,2)"  # 1±discount/tax style factors


def dec(col: str | Column, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


# Ceilings for measure-gated broadcast hints on FILTERED key/dim
# projections: ~4M narrow rows is comfortably inside executor/driver
# broadcast budgets (a long-key set at that size is tens of MB;
# Spark's hard broadcast cap is 8 GB and the practical cliff is driver
# heap). Rows alone under-measure projections that carry string
# payload columns (ADVICE r11: tpch_q2's 'eur' frame has s_name /
# n_name — 4M of THOSE is hundreds of MB), so the same eager pass
# also estimates bytes (fixed type widths + measured string lengths)
# and the hint additionally requires <= BROADCAST_BYTES_MAX estimated
# in-memory size. Above either ceiling the hint is dropped and
# Catalyst/AQE picks the strategy — degrading to a shuffle join
# instead of OOMing the driver.
BROADCAST_ROWS_MAX = 4_000_000
BROADCAST_BYTES_MAX = 256 << 20

# estimated in-memory width per value for fixed-width Spark SQL types
# (UnsafeRow-ish: 8-byte word per field; decimals/timestamps a word,
# wide decimals two). Strings/binary/arrays are MEASURED in the gate's
# eager pass (lengths / element counts); anything else unlisted (map,
# struct) falls back to a deliberately heavy 64B/value so odd payloads
# fail toward NOT broadcasting.
_FIXED_WIDTH = {
    "boolean": 8,
    "tinyint": 8,
    "smallint": 8,
    "int": 8,
    "bigint": 8,
    "float": 8,
    "double": 8,
    "date": 8,
    "timestamp": 8,
    "timestamp_ntz": 8,
}


# Plan shapes whose every node preserves or reduces row count: for
# these, the sum of the leaf parquet footers' row counts is an exact
# UPPER BOUND on the frame's cardinality, so the broadcast gate can
# prove "small enough" without running its eager measure job.
# Generate (explode), Join, Union etc. can multiply rows and must
# fall through to the measured pass.
_CARD_NONINCREASING = {
    "Project",
    "Filter",
    "LogicalRelation",
    "Relation",
    "SubqueryAlias",
    "Aggregate",
    "Deduplicate",
    "GlobalLimit",
    "LocalLimit",
}


def _footer_rows_upper(df) -> int | None:
    """Exact row-count upper bound from the leaf parquet footers, or
    None when the bound cannot be proven cheaply: the plan must be
    cardinality-nonincreasing node by node (see _CARD_NONINCREASING)
    and every input must be a locally readable parquet file (footer
    metadata read on the driver — no Spark job). Any failure returns
    None and the caller falls back to the measured pass, so remote
    storage or exotic plans degrade to the old behavior."""
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            if node.nodeName() not in _CARD_NONINCREASING:
                return None
            for i in range(node.children().size()):
                stack.append(node.children().apply(i))
        files = df.inputFiles()
        if not files or len(files) > 64:
            return None
        import pyarrow.parquet as pq

        total = 0
        for f in files:
            if not f.startswith("file:"):
                return None
            path = f[len("file:"):]
            while path.startswith("//"):
                path = path[1:]
            total += pq.ParquetFile(path).metadata.num_rows
        return total
    except Exception:  # noqa: BLE001
        return None


def broadcast_if_bounded(
    df,
    max_rows: int = BROADCAST_ROWS_MAX,
    max_bytes: int = BROADCAST_BYTES_MAX,
):
    """Apply F.broadcast only when the frame is measured broadcast-
    sized (ADVICE r10: Q2/Q17 hinted filtered key sets that grow
    linearly with the corpus — ~1M part keys at 1000x — so a
    pathological shape would OOM the driver rather than degrade;
    ADVICE r11 added the byte gate for string-bearing projections).

    The gate is ONE eager aggregate over the filtered dimension
    projection (count + summed string lengths — same single pass the
    old COUNT was) — the adaptive-k / recursive-CTE eager-stage
    precedent: a narrow dimension scan whose cost is noise next to
    the fact-table work the hint accelerates, paid only at
    plan-build time. The pass also warms the scan for the real join.
    NOT for fact tables: measuring one of those would be a full
    extra pass."""
    from pyspark.sql.types import ArrayType

    aggs = [F.count(F.lit(1)).alias("__n")]
    fixed = 0
    measured = []  # (alias, per-unit bytes)
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t == "string":
            # 20B/str overhead (object header + offsets) + 2B/char data
            aggs.append(
                F.coalesce(F.sum(F.length(F.col(f.name))), F.lit(0)).alias(
                    f"__b_{f.name}"
                )
            )
            measured.append((f"__b_{f.name}", 2))
            fixed += 20
        elif t == "binary":
            aggs.append(
                F.coalesce(
                    F.sum(F.length(F.col(f.name))), F.lit(0)
                ).alias(f"__b_{f.name}")
            )
            measured.append((f"__b_{f.name}", 1))
            fixed += 20
        elif t.startswith("decimal"):
            fixed += 16
        elif t in _FIXED_WIDTH:
            fixed += _FIXED_WIDTH[t]
        elif isinstance(f.dataType, ArrayType):
            # measure element counts; weight by element width (16B for
            # anything non-fixed inside — deliberately heavy so an
            # embedding-bearing frame fails toward NOT broadcasting)
            ew = _FIXED_WIDTH.get(
                f.dataType.elementType.simpleString(), 16
            )
            aggs.append(
                F.coalesce(F.sum(F.size(F.col(f.name))), F.lit(0)).alias(
                    f"__b_{f.name}"
                )
            )
            measured.append((f"__b_{f.name}", ew))
            fixed += 20
        else:
            fixed += 64
    # Short-circuit (round 13, guide §3.1/§1): when every output column
    # is fixed-width and the parquet footers already prove the frame's
    # row count (hence bytes) under both caps, skip the eager measure
    # job entirely — at bench scale the measure pass was a visible
    # per-join constant (tpch_q19 +0.22 s) paid even for trivially tiny
    # dimensions. The footer count is an exact UPPER bound (only
    # cardinality-nonincreasing plans qualify), so this only ever
    # broadcasts frames the measured pass would also have broadcast;
    # above the caps (every at-scale refusal path) it falls through to
    # the measured pass unchanged.
    if not measured:
        upper = _footer_rows_upper(df)
        if (
            upper is not None
            and upper <= max_rows
            and upper * fixed <= max_bytes
        ):
            return F.broadcast(df)
    m = df.agg(*aggs).first()
    n = m["__n"]
    est = n * fixed + sum((m[a] or 0) * w for a, w in measured)
    return F.broadcast(df) if n <= max_rows and est <= max_bytes else df


def one_minus(col: str) -> Column:
    return (F.lit(1) - F.col(col)).cast(FRAC)


def one_plus(col: str) -> Column:
    return (F.lit(1) + F.col(col)).cast(FRAC)


def dsum(expr: Column, alias: str) -> Column:
    """Exact decimal sum surfaced as double."""
    return F.sum(expr).cast("double").alias(alias)


def davg(expr: Column, alias: str) -> Column:
    """Order-independent average: exact decimal sum, one double division."""
    return (F.sum(expr).cast("double") / F.count(expr)).alias(alias)


# lineitem revenue expressions (TPC-H Q1/Q3/Q5/Q6 family)
def disc_price() -> Column:
    return dec("l_extendedprice") * one_minus("l_discount")


def charge() -> Column:
    return dec("l_extendedprice") * one_minus("l_discount") * one_plus("l_tax")


# --- engine-neutral md5 hash integers ---------------------------------
#
# Neither engine shares a hex->int builtin, so the integer value of an
# md5 hex prefix is spelled as strpos arithmetic in the DuckDB oracle
# and conv() in Spark. This pair is the ONE definition both twins use
# (content-stable sampling buckets, LSH bit positions, shard splits,
# checksums all derive from it).


def md5_prefix_int_sql(expr: str, n: int = 4) -> str:
    """DuckDB SQL: integer value of the first ``n`` md5 hex chars of
    ``expr`` (0..16^n - 1). Spark twin: ``hex_prefix_int(F.md5(col), n)``."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (n - 1 - i)}"
        for i in range(n)
    )
    return f"({terms})"


def hex_prefix_int(col: Column, n: int = 4) -> Column:
    """Spark: integer value of the first ``n`` hex chars of an
    already-hex string column (pair with F.md5 for md5_prefix_int_sql)."""
    return F.conv(F.substring(col, 1, n), 16, 10).cast("long")


def doc_permille_bucket(col: str | Column = "doc_id") -> Column:
    """The content-stable md5 permille bucket (0..999) of an id column
    — the single Spark twin of the oracle-side ``md5 of the id, first
    4 hex chars, mod 1000`` expression that every deterministic split,
    sampling rate, domain cap, and upsampling decision derives from."""
    c = F.col(col) if isinstance(col, str) else col
    return hex_prefix_int(F.md5(c.cast("string"))) % 1000
