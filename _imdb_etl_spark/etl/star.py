"""The reference's star-schema ETL, rebuilt as pure DataFrame -> DataFrame
transforms (reference: /root/reference/etl_imdb_db.sql).

Reference quirks deliberately preserved (SURVEY.md §2.10):

1. ``fact_movies.director_id`` joins ``dim_people.known_for_movies`` to
   the movie id (etl_imdb_db.sql:141) — NOT director_mapping. The
   "director" is whoever is *known for* the movie.
2. ``dim_people`` stacks two 1:N left joins (roles x directorships,
   etl_imdb_db.sql:112-113) producing a fan-out only partially collapsed
   by DISTINCT.
3. Graf 4/5 read staging tables the ETL later drops
   (etl_imdb_db.sql:153-158); ``run_pipeline`` therefore materializes
   dims/fact and *keeps* staging views until ``drop_staging`` is called
   explicitly — statement order is the reference's only dependency
   mechanism and we encode it as an explicit phase.

Scale posture: every transform is declarative (select/join/distinct), so
Catalyst plans broadcast joins for the dim-sized sides and two-phase
hash aggregates for the DISTINCTs; nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from _imdb_etl_spark.schemas import STAGING_LOADS
from _imdb_etl_spark.sources.csv_source import read_staging_csv


def load_staging(spark: SparkSession, stage_dir: str) -> dict[str, DataFrame]:
    """COPY INTO equivalents (etl_imdb_db.sql:59-82): one typed CSV scan
    per staging table from the stage directory."""
    out: dict[str, DataFrame] = {}
    for table_name, (file_name, schema, drop_malformed) in STAGING_LOADS.items():
        out[table_name] = read_staging_csv(
            spark, os.path.join(stage_dir, file_name), schema, drop_malformed
        )
    return out


def build_dim_movies(movies_staging: DataFrame) -> DataFrame:
    """etl_imdb_db.sql:90-100 — distinct 8-col projection (drops the
    never-used gross-income string)."""
    return movies_staging.select(
        F.col("id").alias("movie_id"),
        "title",
        "year",
        "date_published",
        "duration",
        "country",
        "languages",
        "production_company",
    ).dropDuplicates()


def build_dim_genres(genres_staging: DataFrame) -> DataFrame:
    """etl_imdb_db.sql:120-124 — degenerate dimension: the genre string
    is both surrogate id and name."""
    return genres_staging.select(
        F.col("genre").alias("genre_id"),
        F.col("genre").alias("genre_name"),
    ).dropDuplicates()


def build_dim_people(
    name_staging: DataFrame,
    role_mapping_staging: DataFrame,
    director_mapping_staging: DataFrame,
) -> DataFrame:
    """etl_imdb_db.sql:103-113 — names ⟕ roles ⟕ directorships, DISTINCT.

    Both mapping sides are person-keyed 1:N, so a person with r role rows
    and d directed movies fans out to up to r x d rows (quirk 2)."""
    n = name_staging.alias("n")
    r = role_mapping_staging.alias("r")
    dms = director_mapping_staging.alias("dms")
    return (
        n.join(r, F.col("n.id") == F.col("r.name_id"), "left")
        .join(dms, F.col("n.id") == F.col("dms.name_id"), "left")
        .select(
            F.col("n.id").alias("person_id"),
            F.col("n.name").alias("name"),
            F.col("r.category").alias("role"),
            F.col("n.known_for_movies").alias("known_for_movies"),
            F.col("n.date_of_birth").alias("date_of_birth"),
            F.col("dms.movie_id").alias("directed_movie_id"),
        )
        .dropDuplicates()
    )


def build_fact_movies(
    movies_staging: DataFrame,
    ratings_staging: DataFrame,
    genres_staging: DataFrame,
    dim_genres: DataFrame,
    dim_people: DataFrame,
) -> DataFrame:
    """etl_imdb_db.sql:129-141 — movies ⟕ ratings ⟕ genres ⟕ dim_genres
    ⟕ dim_people(known_for_movies = movie id), DISTINCT.

    The last join (quirk 1) links through ``known_for_movies`` — the
    value column, not a key — so ``director_id`` means "person known for
    this movie"."""
    m = movies_staging.alias("m")
    r = ratings_staging.alias("r")
    g = genres_staging.alias("g")
    dg = dim_genres.alias("dg")
    dp = dim_people.alias("dp")
    return (
        m.join(r, F.col("m.id") == F.col("r.movie_id"), "left")
        .join(g, F.col("m.id") == F.col("g.movie_id"), "left")
        .join(dg, F.col("g.genre") == F.col("dg.genre_name"), "left")
        .join(dp, F.col("dp.known_for_movies") == F.col("m.id"), "left")
        .select(
            F.col("m.id").alias("movie_id"),
            F.col("dg.genre_id").alias("genre_id"),
            F.col("dp.person_id").alias("director_id"),
            F.col("r.total_votes").alias("total_votes"),
            F.col("r.avg_rating").alias("avg_rating"),
            F.col("m.duration").alias("duration"),
        )
        .dropDuplicates()
    )


def run_pipeline(spark: SparkSession, stage_dir: str) -> dict[str, DataFrame]:
    """Topological order per etl_imdb_db.sql: staging -> {dim_movies,
    dim_genres, dim_people} -> fact_movies. Returns all tables, staging
    included (quirk 3: dashboard queries need staging until cleanup).

    Everything returned is LAZY — views over the stage CSVs, recomputed
    per query, valid only while the stage files exist. For the
    reference's physical CTAS semantics (tables that survive stage
    cleanup and are scanned, not re-derived), use
    ``materialize_pipeline``."""
    staging = load_staging(spark, stage_dir)
    dim_movies = build_dim_movies(staging["movies_staging"])
    dim_genres = build_dim_genres(staging["genres_staging"])
    dim_people = build_dim_people(
        staging["name_staging"],
        staging["role_mapping_staging"],
        staging["director_mapping_staging"],
    )
    fact_movies = build_fact_movies(
        staging["movies_staging"],
        staging["ratings_staging"],
        staging["genres_staging"],
        dim_genres,
        dim_people,
    )
    tables = dict(staging)
    tables.update(
        dim_movies=dim_movies,
        dim_genres=dim_genres,
        dim_people=dim_people,
        fact_movies=fact_movies,
    )
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables


def materialize_pipeline(spark: SparkSession, stage_dir: str) -> dict[str, DataFrame]:
    """The reference's actual CTAS semantics (etl_imdb_db.sql:90-141):
    dims/fact physically written as catalog parquet tables, so queries
    scan stored data instead of re-deriving it, and the tables survive
    staging cleanup (and stage-file deletion)."""
    from _imdb_etl_spark.sources.sinks import save_as_table

    tables = run_pipeline(spark, stage_dir)
    out = dict(tables)
    for name in ("dim_movies", "dim_genres", "dim_people", "fact_movies"):
        save_as_table(tables[name], name)
        # drop the lazy temp view so the name resolves to the catalog
        # table (temp views shadow catalog tables)
        spark.catalog.dropTempView(name)
        out[name] = spark.table(name)
    return out


def drop_staging(spark: SparkSession) -> None:
    """etl_imdb_db.sql:153-158 — the cleanup phase. Separate call so the
    dashboard queries can run first (quirk 3)."""
    for name in STAGING_LOADS:
        spark.catalog.dropTempView(name)
