"""Custom stateful streaming operator via applyInPandasWithState — the
escape hatch for semantics the built-in windowed aggregates can't
express (per-key running state with arbitrary Python transition logic).

The example operator keeps per-user running totals (event count + value
sum). Money accumulates as integer cents inside the state, so the state
transition is exact and order-independent — the same discipline as the
engine's decimal-sum policy, which is what lets the bounded run
hash-match a declarative DuckDB oracle.

Scale: state lives in the state store keyed by user_id (one shuffle on
the grouping key); watermark-driven timeouts would bound state for
abandoned keys in a production config (GroupStateTimeout.NoTimeout here
since the driver check replays a bounded input).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from _imdb_etl_spark.plans.registry import register

_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("cents", LongType())]
)


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # per-row integer-cents accumulation: exact, order-independent
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            _OUTPUT_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


_TOTALS_SQL = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@register(
    "streaming_stateful_user_totals",
    _TOTALS_SQL,
    doc="applyInPandasWithState custom stateful operator: per-user "
    "running totals with integer-cents state, run end-to-end "
    "(file source -> state store -> memory sink) and hash-matched "
    "against the declarative oracle on the bounded input.",
)
def streaming_stateful_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from _imdb_etl_spark.streaming.events import (
        _counter,
        _run_to_memory,
        read_events_stream,
    )

    events = read_events_stream(spark, sf_dir)
    totals = running_user_totals(events)
    name = f"stream_totals_{next(_counter)}"
    # update-mode memory sink appends one row per (batch, user); keep the
    # final state per user (max n_events is the latest)
    out = _run_to_memory(totals, name, output_mode="update")
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
        .orderBy("user_id")
    )
