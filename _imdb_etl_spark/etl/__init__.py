from _imdb_etl_spark.etl.star import (
    build_dim_genres,
    build_dim_movies,
    build_dim_people,
    build_fact_movies,
    load_staging,
    run_pipeline,
)

__all__ = [
    "build_dim_genres",
    "build_dim_movies",
    "build_dim_people",
    "build_fact_movies",
    "load_staging",
    "run_pipeline",
]
