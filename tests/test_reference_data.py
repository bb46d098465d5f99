"""The strongest parity evidence: run the full ETL + all six Graf
queries on the reference repo's OWN CSV data (/root/reference/imdb_db,
read-only) and hash-match DuckDB executing the reference SQL on the
same files."""

from __future__ import annotations

import os

import pytest

from _imdb_etl_spark.etl import grafs as g
from _imdb_etl_spark.etl.star import run_pipeline
from tests import oracle_imdb
from tests.test_etl_star import assert_matches

REF_DATA = "/root/reference/imdb_db"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference data not present"
)


@pytest.fixture(scope="module")
def ref_tables(spark):
    return run_pipeline(spark, REF_DATA)


@pytest.fixture(scope="module")
def ref_oracle():
    con = oracle_imdb.build(REF_DATA)
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    ["dim_movies", "dim_genres", "dim_people", "fact_movies"],
)
def test_reference_etl_tables(ref_tables, ref_oracle, name):
    assert_matches(ref_tables[name], ref_oracle.sql(f"SELECT * FROM {name}"), name)


def test_reference_grafs(ref_tables, ref_oracle):
    outs = {
        "graf1": g.graf1_usa_india_2019(ref_tables["dim_movies"]),
        "graf2": g.graf2_avg_duration_by_genre(
            ref_tables["dim_genres"], ref_tables["fact_movies"]
        ),
        "graf3": g.graf3_top10_directors(
            ref_tables["fact_movies"], ref_tables["dim_people"]
        ),
        "graf4": g.graf4_top3_directors_top3_genres(
            ref_tables["fact_movies"],
            ref_tables["dim_people"],
            ref_tables["dim_genres"],
            ref_tables["ratings_staging"],
        ),
        "graf5": g.graf5_top10_actors_by_roles(
            ref_tables["role_mapping_staging"], ref_tables["dim_people"]
        ),
        "graf6": g.graf6_movies_by_country(ref_tables["dim_movies"]),
    }
    nonempty = 0
    for name, df in outs.items():
        rows = df.count()
        nonempty += rows > 0
        assert_matches(df, ref_oracle.sql(oracle_imdb.GRAF_SQL[name]), name)
    assert nonempty >= 4  # the real data must actually exercise the queries
