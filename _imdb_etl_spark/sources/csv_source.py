"""CSV ingestion with the reference's COPY INTO semantics.

Reference behavior being reproduced (cites into /root/reference):
- `COPY INTO ... FILE_FORMAT=(TYPE='CSV' FIELD_OPTIONALLY_ENCLOSED_BY='"'
  SKIP_HEADER=1)` x6 (etl_imdb_db.sql:59-82): header skipped, quoted
  fields, values loaded into explicitly typed staging columns. The
  Snowflake default on type errors is ON_ERROR='ABORT_STATEMENT' — a
  bad value fails the load loudly — and that is this reader's default
  (`on_error="abort"`).
- The CSVs encode missing values as the literal 4-char string ``NULL``
  (e.g. imdb_db/movie.csv:2); typed columns null them on parse.
  Spark equivalent: ``nullValue='NULL'``.
- `ON_ERROR = 'CONTINUE'` on the names load only (etl_imdb_db.sql:82):
  rows with type errors are skipped, not fatal (`on_error="continue"`).

Implementation note: Spark's own malformed-row modes are unsuitable
here — ``DROPMALFORMED`` drops rows depending on which columns a given
query parses (projection pruning). So typing is done explicitly: read
every field as string, validate with ``try_cast`` (null raw value is
fine; non-null raw value that fails its cast marks the row), then
either abort (one counting pass over the marked rows at load time),
filter the marked rows, or keep them nulled. Structural malformation
(wrong field count) cannot be seen through the all-string schema — the
PERMISSIVE parse silently null-pads short rows and truncates long ones
— so the read also requests ``columnNameOfCorruptRecord`` and treats a
populated corrupt column as a bad row. Spark refuses scans whose
pruned schema is only the corrupt column, and Catalyst's constraint
propagation elides naive extra references, so the predicate carries a
non-foldable probe over the data columns to keep them in the scan.
Everything stays in whole-stage codegen — streaming passes, no cache,
deterministic under any downstream projection, identical semantics at
any scale.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


class MalformedRowsError(ValueError):
    """Raised by on_error='abort' when typed parsing fails for any row."""


def _bad_row_predicate(schema: StructType) -> Column | None:
    bad = [
        F.col(f.name).isNotNull() & F.col(f.name).try_cast(f.dataType).isNull()
        for f in schema.fields
        if not isinstance(f.dataType, StringType)
    ]
    return functools.reduce(operator.or_, bad) if bad else None


def read_staging_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    drop_malformed: bool = False,
    on_error: str | None = None,
) -> DataFrame:
    """Read a staging CSV with COPY INTO semantics.

    on_error: 'abort' (default; type errors fail the load, like
    Snowflake's ABORT_STATEMENT), 'continue' (skip bad rows, like
    ON_ERROR='CONTINUE'), or 'permissive' (keep rows, null bad fields).
    ``drop_malformed=True`` is shorthand for 'continue'.
    """
    if on_error is None:
        on_error = "continue" if drop_malformed else "abort"
    if on_error not in ("abort", "continue", "permissive"):
        raise ValueError(f"on_error must be abort|continue|permissive: {on_error}")

    corrupt_col = "_corrupt_record"
    raw_schema = StructType(
        [StructField(f.name, StringType(), True) for f in schema.fields]
        + [StructField(corrupt_col, StringType(), True)]
    )
    raw = spark.read.csv(
        path,
        schema=raw_schema,
        header=True,
        quote='"',
        escape='"',
        nullValue="NULL",
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=corrupt_col,
    )
    # wrong-field-count rows populate the corrupt column; the length
    # probe is always true but forces the data columns into the pruned
    # scan schema (corrupt-only scans are rejected, and constraint
    # propagation would elide a plain extra isNotNull reference)
    probe = (
        F.length(F.concat_ws("\x01", *[f.name for f in schema.fields])) >= 0
    )
    structural = F.col(corrupt_col).isNotNull() & probe
    typed = _bad_row_predicate(schema)
    bad = structural if typed is None else structural | typed
    if on_error == "abort":
        n_bad = raw.where(bad).count()
        if n_bad:
            sample = [r.asDict() for r in raw.where(bad).head(3)]
            raise MalformedRowsError(
                f"{n_bad} row(s) in {path} fail typed or structural "
                f"parsing (on_error='abort'); sample: {sample}"
            )
    elif on_error == "continue":
        raw = raw.where(~bad)
    return raw.select(
        *[F.col(f.name).try_cast(f.dataType).alias(f.name) for f in schema.fields]
    )
