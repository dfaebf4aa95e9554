"""Custom stateful streaming operators via ``applyInPandasWithState``.

The escape hatch for streaming semantics the built-in operators can't
express: arbitrary per-key state evolved across micro-batches, with
timeout-driven eviction bounding state size on unbounded streams. State
lives in the state store (checkpointed); the pandas function sees one key's
accumulated rows per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

#: Output: one row per key per micro-batch with the running totals.
RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_count", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)

#: State: the running (count, sum) pair.
RUNNING_TOTALS_STATE = T.StructType(
    [
        T.StructField("event_count", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)


def running_totals_per_user(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming running (count, sum) per user across micro-batches.

    Each micro-batch updates the persisted per-key state and emits the new
    totals — the minimal template for custom stateful logic (fraud
    counters, per-client exposure accumulators, session carry-over).
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((count, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "event_count": [count], "value_sum": [total]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
