"""Custom stateful streaming operator (SURVEY.md §2.9 T4 [extension]):
`applyInPandasWithState` — the streaming generalization of the batch span
scan / sessionization (operators/spans.py), SURVEY §7 hard-part 4.

`running_user_stats` maintains per-key running aggregates across
micro-batches with explicit GroupState — the primitive that covers the
reference's carry-state-forward scans (app.py:46-83) when the input is an
unbounded stream instead of an ordered batch: counts, sums, and the
last-seen event time survive between batches in the state store.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double, last_ts timestamp"
STATE_SCHEMA = "n bigint, s double, last_ts_us bigint"


def _update_user_stats(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch's rows for this key into persistent state and
    emit the updated running aggregate. Pure-Python state transition —
    Arrow-batched in/out, one state-store round-trip per key per batch."""
    (user_id,) = key
    n, s, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, s, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [s],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, last event time) maintained in the
    streaming state store; emits the updated row for each key touched by a
    micro-batch ("update" semantics)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
