"""CSV ingestion with the reference's COPY INTO semantics.

Reference behavior being reproduced (cites into /root/reference):
- `COPY INTO ... FILE_FORMAT=(TYPE='CSV' FIELD_OPTIONALLY_ENCLOSED_BY='"'
  SKIP_HEADER=1)` x6 (etl_imdb_db.sql:59-82): header skipped, quoted
  fields, values loaded into explicitly typed staging columns.
- The CSVs encode missing values as the literal 4-char string ``NULL``
  (e.g. imdb_db/movie.csv:2); typed columns null them on parse.
  Spark equivalent: ``nullValue='NULL'``.
- `ON_ERROR = 'CONTINUE'` on the names load only (etl_imdb_db.sql:82):
  malformed rows are skipped, not fatal. Spark equivalent:
  ``mode='DROPMALFORMED'``.

Schemas are always explicit StructTypes — never inferSchema (a full extra
pass over 100 TB of text, and nondeterministic typing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_staging_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    drop_malformed: bool = False,
) -> DataFrame:
    return spark.read.csv(
        path,
        schema=schema,
        header=True,
        quote='"',
        escape='"',
        nullValue="NULL",
        mode="DROPMALFORMED" if drop_malformed else "PERMISSIVE",
    )
