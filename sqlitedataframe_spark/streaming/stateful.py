"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for semantics Spark's built-in windowed aggregations can't
express (SURVEY §2 Tier B UDF/UDAF row; the reference has no equivalent).

Demonstrated operator: cross-batch sessionization with explicit per-user
state. ``session_window`` already covers plain gap-sessionization natively;
the stateful form is the template for the genuinely custom cases (per-entity
counters, fraud windows, CDC folding) where you need arbitrary state.

Scale notes: state lives in the state store partitioned by the grouping key
(one shuffle), Arrow-batched in and out of Python. Update-mode semantics:
a session spanning micro-batches is re-emitted each batch with its updated
aggregate; downstream consumers keep the latest row per (user_id,
session_start) — the standard pattern for incremental session rollups.

Arrival-order contract: events may arrive in any order *within* a
micro-batch (sorted here), but batches must arrive in event-time order per
key — the log-replay layout (hourly/daily file drops). For arbitrarily
late data use the native ``session_window`` + watermark instead, which
buffers events until the watermark closes the window.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
    ]
)

#: State per user: (session_start_us, last_ts_us, n_events).
SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", IntegerType()),
    ]
)

_US = 1_000_000


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        start_us, last_us, n = state.get if state.exists else (None, None, 0)
        out: list[tuple[int, int, int, int]] = []
        for pdf in pdfs:
            for ts in pdf["ts"].sort_values():
                ts_us = int(ts.value) // 1000  # pandas ns -> us
                if start_us is None:
                    start_us, last_us, n = ts_us, ts_us, 1
                elif ts_us - last_us > gap_us:
                    out.append((user_id, start_us, last_us, n))
                    start_us, last_us, n = ts_us, ts_us, 1
                else:
                    last_us, n = ts_us, n + 1
        if start_us is not None:
            # emit the open session too (update-mode re-emit contract)
            out.append((user_id, start_us, last_us, n))
            state.update((start_us, last_us, n))
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": pd.to_datetime([o[1] * 1000 for o in out]),
                    "session_end": pd.to_datetime([o[2] * 1000 for o in out]),
                    "n_events": [o[3] for o in out],
                }
            )

    return fn


def stateful_sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Sessionize a stream with explicit per-user state (30-min gap default).

    Works on both streaming and batch DataFrames (Spark runs the same
    function with transient state in batch mode, which is what makes the
    semantics directly testable against operators.relational.sessionize).
    """
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
