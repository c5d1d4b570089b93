"""Custom stateful streaming operator: cross-batch Markov
transitions.

The batch ``event_transitions`` (``operators/events.py``) is a lead
window; on a stream the "previous event of this user" must survive
micro-batch boundaries, so each user's (last_ts, last_type) lives in
the state store via ``applyInPandasWithState``. A transition row is
emitted the moment its successor event arrives — final on emit, so
the output mode is APPEND (unlike sessions, nothing is ever
re-emitted or revised), and any downstream aggregation of the
transition stream (the probability matrix) is an ordinary streaming
groupBy.

State is one fixed-width row per active user, evicted after
``idle_minutes`` of processing-time silence — bounded by the active
audience, not the stream length.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRANSITION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("from_type", T.StringType()),
        T.StructField("to_type", T.StringType()),
        T.StructField("gap_us", T.LongType()),
    ]
)

#: (last_us, last_id, last_type) — the event_id rides along so the
#: cross-batch tie-break matches the batch twin's (t_us, event_id)
#: window order
STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("last_id", T.LongType()),
        T.StructField("last_type", T.StringType()),
    ]
)


def _transitions_user(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    idle_ms: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame(columns=TRANSITION_SCHEMA.fieldNames())
        return

    last_us, last_id, last_type = (
        state.get if state.exists else (None, None, None)
    )
    events = pd.concat(list(pdfs)).sort_values(["t_us", "event_id"])
    out = []
    for t_us, eid, etype in zip(
        events["t_us"], events["event_id"], events["event_type"]
    ):
        t_us, eid = int(t_us), int(eid)
        if last_type is not None and (t_us, eid) < (last_us, last_id):
            # late cross-batch event: older than the stored clock in
            # the batch twin's (t_us, event_id) order — emitting
            # (last_type -> etype) would invert event order in the
            # transition matrix (a TIE on t_us with a smaller
            # event_id counts as older too); drop it (the batch
            # twin's global sort would have placed it earlier, a
            # position no stream can retroactively emit)
            continue
        if last_type is not None:
            out.append([user_id, last_type, etype, t_us - last_us])
        last_us, last_id, last_type = t_us, eid, etype
    state.update((last_us, last_id, last_type))
    state.setTimeoutDuration(idle_ms)
    yield pd.DataFrame(out, columns=TRANSITION_SCHEMA.fieldNames())


def transitions_stream(
    events: DataFrame, idle_minutes: int = 24 * 60
) -> DataFrame:
    """events (ts epoch-ns BIGINT) → one row per consecutive-event
    transition per user, emitted exactly once (append semantics)."""
    idle_ms = idle_minutes * 60_000
    prepared = events.select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("t_us"),
        "event_type",
    )

    def fn(key, pdfs, state):
        return _transitions_user(key, pdfs, state, idle_ms)

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
