"""DuckDB oracle for the IMDB ETL: loads the same fixture CSVs with the
reference's COPY INTO semantics and runs the reference's CTAS + Graf SQL
(near-verbatim; only deterministic tiebreakers added, mirrored in the
Spark builders — SURVEY.md §2.10 quirk 5).
"""

from __future__ import annotations

import duckdb

_LOADS = {
    "movies_staging": (
        "movie.csv",
        "{'id':'VARCHAR','title':'VARCHAR','year':'INTEGER',"
        "'date_published':'DATE','duration':'INTEGER','country':'VARCHAR',"
        "'worlwide_gross_income':'VARCHAR','languages':'VARCHAR',"
        "'production_company':'VARCHAR'}",
        False,
    ),
    "genres_staging": ("ganre.csv", "{'movie_id':'VARCHAR','genre':'VARCHAR'}", False),
    "name_staging": (
        "names.csv",
        "{'id':'VARCHAR','name':'VARCHAR','height':'INTEGER',"
        "'date_of_birth':'DATE','known_for_movies':'VARCHAR'}",
        True,  # ON_ERROR='CONTINUE' (etl_imdb_db.sql:82)
    ),
    "ratings_staging": (
        "ratings.csv",
        "{'movie_id':'VARCHAR','avg_rating':'DECIMAL(3,1)',"
        "'total_votes':'INTEGER','median_rating':'INTEGER'}",
        False,
    ),
    "director_mapping_staging": (
        "director_mapping.csv",
        "{'movie_id':'VARCHAR','name_id':'VARCHAR'}",
        False,
    ),
    "role_mapping_staging": (
        "role_mapping.csv",
        "{'movie_id':'VARCHAR','name_id':'VARCHAR','category':'VARCHAR'}",
        False,
    ),
}

# etl_imdb_db.sql:90-141, verbatim
_CTAS = """
CREATE OR REPLACE TABLE dim_movies AS
SELECT DISTINCT id AS movie_id, title, year, date_published, duration,
                country, languages, production_company
FROM movies_staging;

CREATE OR REPLACE TABLE dim_people AS
SELECT DISTINCT n.id AS person_id, n.name, r.category AS role,
                n.known_for_movies, n.date_of_birth,
                dms.movie_id AS directed_movie_id
FROM name_staging n
LEFT JOIN role_mapping_staging r ON n.id = r.name_id
LEFT JOIN director_mapping_staging dms ON n.id = dms.name_id;

CREATE OR REPLACE TABLE dim_genres AS
SELECT DISTINCT genre AS genre_id, genre AS genre_name
FROM genres_staging;

CREATE OR REPLACE TABLE fact_movies AS
SELECT DISTINCT m.id AS movie_id, dg.genre_id, dp.person_id AS director_id,
                r.total_votes, r.avg_rating, m.duration
FROM movies_staging m
LEFT JOIN ratings_staging r ON m.id = r.movie_id
LEFT JOIN genres_staging g ON m.id = g.movie_id
LEFT JOIN dim_genres dg ON g.genre = dg.genre_name
LEFT JOIN dim_people dp ON dp.known_for_movies = m.id;
"""

# dashboard_visualizations.sql with deterministic tiebreakers appended
GRAF_SQL = {
    "graf1": """
        SELECT dm.country AS country, COUNT(dm.movie_id) AS number_of_movies
        FROM dim_movies AS dm
        WHERE dm.country IN ('USA', 'India') AND dm.year = 2019
        GROUP BY dm.country
        ORDER BY number_of_movies DESC, country
    """,
    "graf2": """
        SELECT dg.genre_name AS genre, ROUND(AVG(fm.duration), 2) AS avg_duration
        FROM dim_genres AS dg
        INNER JOIN fact_movies AS fm ON dg.genre_id = fm.genre_id
        GROUP BY dg.genre_name
        ORDER BY avg_duration DESC, genre
    """,
    "graf3": """
        SELECT dp.name AS director_name, COUNT(fm.movie_id) AS movie_count
        FROM fact_movies AS fm
        JOIN dim_people AS dp ON fm.director_id = dp.person_id
        GROUP BY dp.name
        ORDER BY movie_count DESC, director_name
        LIMIT 10
    """,
    "graf4": """
        WITH top3_genre AS (
            SELECT dg.genre_name AS genre, COUNT(fm.movie_id) AS movie_count
            FROM fact_movies AS fm
            INNER JOIN dim_genres AS dg ON fm.genre_id = dg.genre_id
            INNER JOIN ratings_staging AS r ON fm.movie_id = r.movie_id
            WHERE r.avg_rating > 6
            GROUP BY dg.genre_name
            ORDER BY movie_count DESC, genre
            LIMIT 3
        ),
        top3_director AS (
            SELECT dp.name AS director_name, COUNT(fm.movie_id) AS movie_count,
                   ROW_NUMBER() OVER (
                     PARTITION BY dg.genre_name
                     ORDER BY COUNT(fm.movie_id) DESC, dp.name) AS director_rank
            FROM fact_movies AS fm
            INNER JOIN dim_people AS dp ON fm.director_id = dp.person_id
            INNER JOIN dim_genres AS dg ON fm.genre_id = dg.genre_id
            INNER JOIN ratings_staging AS r ON fm.movie_id = r.movie_id
            WHERE dg.genre_name IN (SELECT genre FROM top3_genre)
              AND r.avg_rating > 6
            GROUP BY dp.name, dg.genre_name
        )
        SELECT director_name, movie_count
        FROM top3_director
        WHERE director_rank <= 3
    """,
    "graf5": """
        SELECT dp.name AS actor_name, COUNT(*) AS total_roles
        FROM role_mapping_staging AS rm
        JOIN dim_people AS dp ON rm.name_id = dp.person_id
        WHERE rm.category IN ('actor', 'actress')
        GROUP BY dp.name
        ORDER BY total_roles DESC, actor_name
        LIMIT 10
    """,
    "graf6": """
        SELECT dm.country, COUNT(dm.movie_id) AS movie_count
        FROM dim_movies AS dm
        GROUP BY dm.country
        ORDER BY movie_count DESC, country NULLS FIRST
        LIMIT 10
    """,
}


def build(stage_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for table, (fname, columns, ignore_errors) in _LOADS.items():
        opts = "header=true, nullstr='NULL', quote='\"', escape='\"'"
        if ignore_errors:
            opts += ", ignore_errors=true"
        con.sql(
            f"CREATE TABLE {table} AS SELECT * FROM "
            f"read_csv('{stage_dir}/{fname}', {opts}, columns={columns})"
        )
    for stmt in _CTAS.split(";"):
        if stmt.strip():
            con.sql(stmt)
    return con
