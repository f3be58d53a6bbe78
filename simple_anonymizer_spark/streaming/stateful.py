"""Custom stateful streaming via ``applyInPandasWithState``.

The escape hatch for operators Structured Streaming's built-ins can't
express: arbitrary per-key state machines with timeouts. State lives in
the state store (checkpointed, fault-tolerant); each micro-batch hands the
key's new rows to the function as Arrow batches.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, last_value double"
STATE_SCHEMA = "n bigint, last_value double"


def _update_user_counts(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (n, last_value) = state.get if state.exists else (0, None)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            last_value = float(pdf["value"].iloc[-1])
    state.update((n, last_value))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "last_value": [last_value]}
    )


def user_running_counts(events: DataFrame) -> DataFrame:
    """Per-user running event count + last seen value, updated every
    micro-batch. Works on a streaming DataFrame (update output mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
