"""CSV ingestion with the reference's COPY INTO semantics.

Reference behavior being reproduced (cites into /root/reference):
- `COPY INTO ... FILE_FORMAT=(TYPE='CSV' FIELD_OPTIONALLY_ENCLOSED_BY='"'
  SKIP_HEADER=1)` x6 (etl_imdb_db.sql:59-82): header skipped, quoted
  fields, values loaded into explicitly typed staging columns.
- The CSVs encode missing values as the literal 4-char string ``NULL``
  (e.g. imdb_db/movie.csv:2); typed columns null them on parse.
  Spark equivalent: ``nullValue='NULL'``.
- `ON_ERROR = 'CONTINUE'` on the names load only (etl_imdb_db.sql:82):
  rows with type errors are skipped, not fatal.

Implementation note: Spark's own malformed-row modes are unsuitable
here — ``DROPMALFORMED`` drops rows depending on which columns a given
query parses (projection pruning), and the ``columnNameOfCorruptRecord``
route forbids queries that reference only the corrupt column (e.g. a
bare count after the filter). So typing is done explicitly: read every
field as string, validate with ``try_cast`` (null raw value is fine;
non-null raw value that fails its cast marks the row), optionally filter
the marked rows, then project the casts. Everything stays in whole-stage
codegen — one streaming pass, no cache, deterministic under any
downstream projection, and identical semantics at any scale.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def read_staging_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    drop_malformed: bool = False,
) -> DataFrame:
    raw_schema = StructType(
        [StructField(f.name, StringType(), True) for f in schema.fields]
    )
    raw = spark.read.csv(
        path,
        schema=raw_schema,
        header=True,
        quote='"',
        escape='"',
        nullValue="NULL",
        mode="PERMISSIVE",
    )
    if drop_malformed:
        ok = [
            F.col(f.name).isNull() | F.col(f.name).try_cast(f.dataType).isNotNull()
            for f in schema.fields
            if not isinstance(f.dataType, StringType)
        ]
        if ok:
            raw = raw.where(functools.reduce(operator.and_, ok))
    return raw.select(
        *[F.col(f.name).try_cast(f.dataType).alias(f.name) for f in schema.fields]
    )
