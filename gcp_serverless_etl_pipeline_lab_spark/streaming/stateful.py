"""Custom stateful streaming via ``applyInPandasWithState`` — the escape
hatch for state machines that native operators (windowed aggs,
session_window, stream-stream joins) cannot express.

Demo operator: per-user running totals. Each micro-batch updates
(count, sum) state per user_id and emits the new running values — the
shape of a feature-store accumulator or an online quality monitor. State
lives in the executor-side state store keyed by group; Arrow batches move
rows, so the Python boundary is amortized.

Scale notes: state size is O(distinct keys); use watermark + timeouts
(``GroupStateTimeout.EventTimeTimeout``) to evict idle keys in production.
Prefer native operators when they fit — JVM state store with no Python
round-trip (see streaming/sessionize.py).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = "n BIGINT, s DOUBLE"


def running_user_totals(events: DataFrame) -> DataFrame:
    """events(user_id, value, ...) stream → one row per user per
    micro-batch with cumulative (n_events, sum_value)."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "sum_value": [round(s, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin of ``running_user_totals``: the per-user totals the
    stream's state converges to once every event has been consumed (state
    accumulates the raw double sum; only the emitted value is rounded —
    mirrored here by rounding the final aggregate).

    The parity contract — final-micro-batch streaming state ==
    this one native aggregation — is asserted in tests/test_streaming.py
    and oracle-gated via the ``a0_stream_user_totals`` harness entry; it
    is what lets the stateful Python operator be trusted at all, since
    ``applyInPandasWithState`` itself can't run on a batch DataFrame."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
