from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _imdb_etl_spark.session import get_spark  # noqa: E402
from tests import fixtures  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def imdb_stage(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("imdb_stage")
    fixtures.generate(str(d), n=200, seed=42)
    return str(d)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
