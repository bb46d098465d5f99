"""Explicit schemas.

IMDB staging schemas mirror the reference DDL
(/root/reference/etl_imdb_db.sql:8-53). VARCHAR(n) maps to StringType
(length unenforced — Spark has no bounded strings; parity tests assert
domain invariants instead). PRIMARY KEY is informational in both engines'
analytic paths and is modeled as uniqueness assertions in tests.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DecimalType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def _s(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, nullable=True) for n, t in fields])


# etl_imdb_db.sql:8-18
MOVIES_STAGING = _s(
    ("id", StringType()),
    ("title", StringType()),
    ("year", IntegerType()),
    ("date_published", DateType()),
    ("duration", IntegerType()),
    ("country", StringType()),
    ("worlwide_gross_income", StringType()),  # [sic] reference column name
    ("languages", StringType()),
    ("production_company", StringType()),
)

# etl_imdb_db.sql:20-24
GENRES_STAGING = _s(
    ("movie_id", StringType()),
    ("genre", StringType()),
)

# etl_imdb_db.sql:26-32
NAME_STAGING = _s(
    ("id", StringType()),
    ("name", StringType()),
    ("height", IntegerType()),
    ("date_of_birth", DateType()),
    ("known_for_movies", StringType()),
)

# etl_imdb_db.sql:34-40
RATINGS_STAGING = _s(
    ("movie_id", StringType()),
    ("avg_rating", DecimalType(3, 1)),
    ("total_votes", IntegerType()),
    ("median_rating", IntegerType()),
)

# etl_imdb_db.sql:42-46
DIRECTOR_MAPPING_STAGING = _s(
    ("movie_id", StringType()),
    ("name_id", StringType()),
)

# etl_imdb_db.sql:48-53
ROLE_MAPPING_STAGING = _s(
    ("movie_id", StringType()),
    ("name_id", StringType()),
    ("category", StringType()),
)

# staging table name -> (csv file name in the reference stage, schema,
# drop_malformed) — file names per etl_imdb_db.sql:59-82
STAGING_LOADS = {
    "movies_staging": ("movie.csv", MOVIES_STAGING, False),
    "genres_staging": ("ganre.csv", GENRES_STAGING, False),  # [sic] file name
    "role_mapping_staging": ("role_mapping.csv", ROLE_MAPPING_STAGING, False),
    "director_mapping_staging": ("director_mapping.csv", DIRECTOR_MAPPING_STAGING, False),
    "ratings_staging": ("ratings.csv", RATINGS_STAGING, False),
    "name_staging": ("names.csv", NAME_STAGING, True),  # ON_ERROR='CONTINUE'
}
