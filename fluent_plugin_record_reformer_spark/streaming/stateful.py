"""Custom stateful streaming operator: conversation sessionization via
``applyInPandasWithState``.

The reference is stateless (each event transformed independently,
core.rb:98-112) — this operator is the engine's custom-state extension
point for transcript analytics: group turns by ``conv_id``, keep
per-conversation state (turn count, last event time, session start)
across micro-batches, and EMIT a session-summary row when the
conversation has been idle longer than ``gap`` (processing-time
timeout), or incrementally update state otherwise.

Scale notes: state lives in the state store partitioned by conv_id —
the same hash partitioning as the batch pipeline's aggregations, so a
hot conversation is one state key, never a shuffle skew. Arrow batches
flow per group; the UDF sees (key, iterator-of-batches, state).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "conv_id string, n_turns long, n_assistant long, "
    "session_start timestamp, session_end timestamp, closed boolean"
)
STATE_SCHEMA = "n_turns long, n_assistant long, start_ts timestamp, end_ts timestamp"


def make_sessionizer(gap_ms: int | None):
    """Build the stateful function with the idle-gap timeout bound in
    (``None`` = no timeout: sessions never auto-close)."""

    def fn(key: tuple, batches: Iterator[pd.DataFrame], state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            n_turns, n_assistant, start_ts, end_ts = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "n_turns": [n_turns],
                    "n_assistant": [n_assistant],
                    "session_start": [start_ts],
                    "session_end": [end_ts],
                    "closed": [True],
                }
            )
            return
        n_turns, n_assistant = 0, 0
        start_ts, end_ts = None, None
        if state.exists:
            n_turns, n_assistant, start_ts, end_ts = state.get
        for pdf in batches:
            n_turns += len(pdf)
            n_assistant += int((pdf["role"] == "assistant").sum())
            lo, hi = pdf["ts"].min(), pdf["ts"].max()
            start_ts = lo if start_ts is None or lo < start_ts else start_ts
            end_ts = hi if end_ts is None or hi > end_ts else end_ts
        state.update((n_turns, n_assistant, start_ts, end_ts))
        if gap_ms is not None:
            state.setTimeoutDuration(gap_ms)
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "n_turns": [n_turns],
                "n_assistant": [n_assistant],
                "session_start": [start_ts],
                "session_end": [end_ts],
                "closed": [False],
            }
        )

    return fn


def conversation_sessions(
    stream: DataFrame,
    *,
    gap_ms: int | None = 30 * 60 * 1000,
    output_mode: str = "update",
) -> DataFrame:
    """Per-conversation running session summaries; a conversation idle
    for ``gap_ms`` of processing time emits a final ``closed=True`` row
    and clears its state.

    Pass ``gap_ms=None`` for backfill/drain runs (``availableNow``):
    with a processing-time timeout registered, the streaming engine
    keeps scheduling empty micro-batches to service future timeouts and
    an availableNow query never terminates."""
    timeout = (
        GroupStateTimeout.NoTimeout
        if gap_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return stream.groupBy("conv_id").applyInPandasWithState(
        make_sessionizer(gap_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=timeout,
    )
