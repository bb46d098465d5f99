"""Query library.

`registry` collects every declared query as a (spark builder, oracle SQL)
pair; importing the submodules populates it.
"""

from _imdb_etl_spark.plans.registry import REGISTRY, QuerySpec, register

# populate the registry
from _imdb_etl_spark.plans import tpch  # noqa: E402,F401
from _imdb_etl_spark.plans import tpch2  # noqa: E402,F401
from _imdb_etl_spark.plans import tpch3  # noqa: E402,F401
from _imdb_etl_spark.plans import grafs  # noqa: E402,F401
from _imdb_etl_spark.plans import relational  # noqa: E402,F401
from _imdb_etl_spark.plans import events  # noqa: E402,F401
from _imdb_etl_spark.plans import advanced  # noqa: E402,F401
from _imdb_etl_spark.plans import scale  # noqa: E402,F401
from _imdb_etl_spark.operators import text  # noqa: E402,F401
from _imdb_etl_spark.operators import dedup  # noqa: E402,F401
from _imdb_etl_spark.operators import similarity  # noqa: E402,F401
from _imdb_etl_spark.operators import multimodal  # noqa: E402,F401
from _imdb_etl_spark.operators import quality  # noqa: E402,F401
from _imdb_etl_spark import streaming  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec", "register"]
