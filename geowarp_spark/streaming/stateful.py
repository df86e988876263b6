"""Custom stateful streaming operator: applyInPandasWithState sessionizer.

SURVEY §2.10 maps the reference's (absent) streaming surface to Spark's
custom-stateful-operator API.  This is the canonical training-pipeline
shape: per-key state that survives across micro-batches, updated by an
Arrow-batched pandas function — gaps-and-islands sessionization over the
events stream, so its results are directly comparable to the BATCH
``sessionize`` oracle query (same 30-minute-gap semantics).

State per user: (last_ts_epoch, n_sessions, n_events).  Each micro-batch
delivers that user's new rows; rows are sorted by (ts, event_id) inside
the function (event-time order within the batch), a session increments
whenever the gap from the previous event exceeds ``gap``.  With an
ordered ingest (per-batch event times non-decreasing, the common log-tail
case) the final counts equal the batch query exactly — asserted by
tests/test_spark_ops.py::test_stateful_sessionize_matches_batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_sessions", LongType()),
    StructField("n_events", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("last_ts", DoubleType()),   # epoch seconds of last event
    StructField("n_sessions", LongType()),
    StructField("n_events", LongType()),
])


def sessionize_stateful(events: DataFrame, gap_minutes: int = 30,
                        user_col: str = "user_id") -> DataFrame:
    """Streaming DF (user_id, ts, event_id) -> running per-user
    (n_sessions, n_events), updated per micro-batch with persistent state.

    Emits the user's CURRENT totals every micro-batch in which the user
    appears (update semantics); the sink keeps the latest row per user.
    """
    gap_sec = float(gap_minutes * 60)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        # a group's micro-batch may arrive as SEVERAL Arrow chunks —
        # accumulate them all and sort ONCE, or the documented
        # within-batch event-time ordering breaks across chunk seams
        # (ADVICE r2: per-chunk sort diverged from the batch oracle)
        parts = [pdf for pdf in pdfs if len(pdf)]
        if parts:
            batch = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
            batch = batch.sort_values(["ts", "event_id"])
            ts = batch["ts"].astype("int64").to_numpy() / 1e9
            for t in ts:  # per EVENT within the user's batch (small); the
                # heavy lifting (grouping, shuffling, Arrow) is Spark-side
                if last_ts is None or t - last_ts > gap_sec:
                    n_sessions += 1
                n_events += 1
                last_ts = float(t)
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_sessions": [n_sessions],
            "n_events": [n_events],
        })

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
