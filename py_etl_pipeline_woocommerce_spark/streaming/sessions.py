"""Custom stateful streaming operator: cross-batch sessionization.

The batch sessionizer (``operators/sessionize.py``) is a window
function; in a stream the gap rule must hold ACROSS micro-batches, so
per-user session state (seq, start, last-seen, aggregates) lives in
Spark's state store via ``applyInPandasWithState`` — the engine's
custom-stateful-operator surface. A session closes when a later event
of the same user arrives more than ``gap`` after the last one; closed
sessions are emitted, the open one stays in state.

State is bounded: one fixed-width row per active user, evicted by the
state timeout (idle users close their session after the gap wall-time
elapses even with no further events).

Two documented divergences from the batch twin, both inherent to
single-pass streaming: (1) events later than one gap BEFORE the open
session's start are dropped — they belong to an already-emitted
session no stream can retroactively revise; (2) in the default
processing-time mode the idle eviction uses WALL-CLOCK silence, so a
source stall or backpressure pause longer than the gap closes
sessions the batch twin (which sees only event time) would keep open
— ``sessionize_stream(timeout="event")`` switches eviction to the
watermark clock and removes this divergence at the cost of idle
sessions closing only as other events advance the watermark.
Re-running the batch sessionizer over the full log reconciles
everything.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState

from .state_util import (
    prepare_event_time,
    set_idle_timeout,
    timeout_conf,
    validate_timeout,
)

GAP_MINUTES = 30

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

#: (session_seq, start_us, last_us, n_events, total_value)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_seq", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


COUNTER_RETENTION_MS = 30 * 86_400_000


def _sessionize_user(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
    event_time: bool = False,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        seq, start, last, n, tot = state.get
        if n == 0:
            # counter-only tombstone expired: the user stayed away
            # long past the retention horizon — forget the counter
            state.remove()
            return
        # close the open session but KEEP the session counter in a
        # counter-only state: a returning user continues at seq+1
        # instead of restarting at 0 and overwriting historical
        # (user, session_seq) rows in an upsert sink
        state.update((seq + 1, None, None, 0, 0.0))
        set_idle_timeout(state, event_time, last, COUNTER_RETENTION_MS)
        yield pd.DataFrame(
            [[user_id, seq, n, start, last, tot, True]],
            columns=SESSION_SCHEMA.fieldNames(),
        )
        return

    if state.exists:
        seq, start, last, n, tot = state.get
    else:
        seq, start, last, n, tot = 0, None, None, 0, 0.0

    out_rows = []
    events = pd.concat(list(pdfs))
    events = events.sort_values("t_us")
    for t_us, value in zip(events["t_us"], events["value"]):
        t_us = int(t_us)
        if start is not None and t_us < start - gap_us:
            # beyond the lateness horizon: more than a gap OLDER than
            # the open session's start, so the batch twin would place
            # it in an earlier, already-emitted session — absorbing
            # it would stretch the open session's bounds and merge
            # what batch semantics split. Dropped (the batch
            # sessionizer over the full log is the reconciliation
            # path for data that late).
            continue
        if last is not None and t_us - last > gap_us:
            out_rows.append([user_id, seq, n, start, last, tot, True])
            seq, start, n, tot = seq + 1, t_us, 0, 0.0
        # late (cross-batch out-of-order) events within the horizon
        # may still precede the stored bounds: clamp so the clock
        # never runs backwards (a regressed `last` would fake a gap
        # and split the session — the liveness monitor's max() guard)
        # and the session bounds stay the true [min, max] the batch
        # twin reports
        start = t_us if start is None else min(start, t_us)
        last = t_us if last is None else max(last, t_us)
        n += 1
        tot += float(value) if value == value else 0.0  # NaN-safe

    state.update((seq, start, last, n, tot))
    # idle eviction: close the open session when the gap elapses —
    # wall clock in processing-time mode, watermark in event-time mode
    set_idle_timeout(state, event_time, last, gap_us // 1000)
    if n > 0:
        out_rows.append([user_id, seq, n, start, last, tot, False])
    yield pd.DataFrame(out_rows, columns=SESSION_SCHEMA.fieldNames())


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = GAP_MINUTES,
    timeout: str = "processing",
    lateness_minutes: int | None = None,
) -> DataFrame:
    """events (ts epoch-ns BIGINT) → per-user session rows; ``closed``
    marks finished sessions, open sessions re-emit on every update.

    ``timeout`` picks the idle-eviction clock:

    - ``"processing"`` (default): a session closes after ``gap``
      minutes of WALL-CLOCK silence. Simple, but a source stall or
      backpressure pause longer than the gap closes sessions the
      batch twin would keep open.
    - ``"event"``: the input carries a watermark and a session closes
      when the WATERMARK passes last_event + gap — the same gap rule
      the batch sessionizer applies, immune to source stalls. Idle
      users' sessions only close as other events advance the
      watermark (the standard event-time trade).

    Event mode's watermark is ALSO Spark's late-row filter: an event
    arriving more than ``lateness_minutes`` (default: the gap) behind
    the stream's max event time is dropped BEFORE the sessionizer's
    own one-gap-before-session-start rule runs, so a late in-horizon
    event the batch twin would absorb can be missing from the session
    totals. Raise ``lateness_minutes`` to widen the tolerated
    disorder at the cost of proportionally later session closes (the
    watermark lags the stream by that much).
    """
    event_time = validate_timeout("sessionize_stream", timeout)
    gap_us = gap_minutes * 60_000_000
    prepared = events.select(
        "user_id", F.expr("ts div 1000").alias("t_us"), "value"
    )
    if event_time:
        prepared = prepare_event_time(
            prepared,
            "t_us",
            gap_minutes if lateness_minutes is None else lateness_minutes,
        )

    def fn(key, pdfs, state):
        return _sessionize_user(key, pdfs, state, gap_us, event_time)

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout_conf(event_time),
    )
