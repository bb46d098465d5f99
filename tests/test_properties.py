"""Hypothesis property tests: CSV dialect parity with DuckDB under
adversarial field content, and exactness of the decimal-sum policy."""

from __future__ import annotations

import csv
import decimal
import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from _imdb_etl_spark.functions import dec, dsum
from _imdb_etl_spark.sources.csv_source import read_staging_csv

# unicode minus newlines/carriage returns (the engine reads CSV with
# multiLine=False — splittable files at scale; the reference data has no
# embedded newlines) and minus NUL: Spark's univocity parser drops
# \x00 inside quoted fields where DuckDB preserves it — a known
# cross-engine divergence for content no real CSV corpus contains.
_FIELD = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",), blacklist_characters="\n\r\x00"
    ),
    max_size=40,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.integers(-10**6, 10**6) | st.none(), _FIELD),
        min_size=1,
        max_size=30,
    )
)
def test_csv_dialect_parity_with_duckdb(spark, tmp_path_factory, rows):
    d = tmp_path_factory.mktemp("csvprop")
    path = os.path.join(str(d), "t.csv")
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f, quoting=csv.QUOTE_ALL, doublequote=True)
        w.writerow(["a", "b"])
        for a, b in rows:
            w.writerow(["NULL" if a is None else a, b])

    schema = StructType(
        [StructField("a", IntegerType()), StructField("b", StringType())]
    )
    got = sorted(
        ((r.a, r.b) for r in read_staging_csv(spark, path, schema).collect()),
        key=repr,
    )
    con = duckdb.connect()
    want = sorted(
        con.sql(
            f"SELECT * FROM read_csv('{path}', header=true, nullstr='NULL', "
            "quote='\"', escape='\"', "
            "columns={'a':'INTEGER','b':'VARCHAR'})"
        ).fetchall(),
        key=repr,
    )
    con.close()
    # quoted "NULL" is still the null sentinel in both engines; empty
    # strings survive as empty strings in both
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cents=st.lists(st.integers(-10**7, 10**7), min_size=1, max_size=200),
    n_parts=st.integers(1, 13),
)
def test_decimal_sum_policy_exact(spark, cents, n_parts):
    values = [c / 100 for c in cents]
    df = spark.createDataFrame([(v,) for v in values], ["v"]).repartition(n_parts)
    got = df.agg(dsum(dec("v"), "s")).collect()[0].s
    want = float(sum(decimal.Decimal(c) for c in cents) / 100)
    assert got == want
