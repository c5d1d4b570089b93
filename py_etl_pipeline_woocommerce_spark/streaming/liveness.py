"""Custom stateful streaming operator: cross-batch stream-liveness
(heartbeat gap) monitoring.

The batch ``time_gaps`` (``operators/temporal.py``) is a lag window;
on a live stream the "previous event of this type" must survive
micro-batch boundaries — an outage usually IS a batch boundary — so
each type's last-seen timestamp lives in the state store via
``applyInPandasWithState``. A gap row is emitted the moment the
stream RESUMES (same observability semantics as the batch twin: a
silence is only measurable once the next event lands), final on emit
→ APPEND output mode.

State is one logical BIGINT per event type — bounded by the type
vocabulary, the smallest state of any stateful operator here —
stored physically as the shared versioned (version, payload) row
since r9, so future logical widenings are checkpoint-compatible
(see ``state_util``; pre-r9 typed-struct checkpoints REJECT restart
loudly and rebuild once, same as the other stateful ops). No idle
eviction: evicting a type's state would un-detect exactly the outage
this operator exists to catch.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutil import TS_US_FLOOR
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .state_util import (
    VERSIONED_STATE_SCHEMA,
    decode_state,
    encode_state,
)

GAP_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("gap_start_us", T.LongType()),
        T.StructField("gap_end_us", T.LongType()),
        T.StructField("gap_us", T.LongType()),
    ]
)

#: Logical state (last_us,) — physically the opaque VERSIONED
#: (version, payload) row since r9, so future widenings are
#: non-breaking (see state_util.decode_state).
STATE_VERSION = 1
STATE_DEFAULTS = {"last_us": None}
STATE_SCHEMA = VERSIONED_STATE_SCHEMA


def _gaps_type(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    min_gap_us: int,
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    last_us = decode_state(state, STATE_VERSION, STATE_DEFAULTS)["last_us"]
    # no per-frame sort: the walk below re-sorts the extracted points
    # (t_us alone decides a gap; row order never matters here)
    events = pd.concat(list(pdfs))
    # Walk the MERGED sorted sequence of (state clock ∪ batch events)
    # and emit every consecutive pair further apart than min_gap. The
    # old walk compared each event only against the monotone clock,
    # so a late batch landing ENTIRELY below the clock was silently
    # swallowed — an under-alert the docstring forbade: a real outage
    # visible inside the late file itself never alerted. Merging the
    # clock in as just another point keeps the cross-batch gap
    # emission identical for in-order streams while late batches now
    # surface their internal gaps (as refining sub-gaps of an
    # already-emitted super-gap — over-alerting, the allowed side).
    points = [int(t) for t in events["t_us"]]
    if last_us is not None:
        points.append(int(last_us))
    points.sort()
    out = []
    for prev, t_us in zip(points, points[1:]):
        if t_us - prev > min_gap_us:
            out.append([event_type, prev, t_us, t_us - prev])
    if points:
        # points already contains last_us when it was set, so the
        # sorted tail IS the new clock
        last_us = points[-1]
    state.update(encode_state(STATE_VERSION, {"last_us": last_us}))
    yield pd.DataFrame(out, columns=GAP_SCHEMA.fieldNames())


def gaps_stream(events: DataFrame, min_gap_us: int = 3_600_000_000) -> DataFrame:
    """events (ts epoch-ns BIGINT) → one row per detected silence
    longer than ``min_gap_us``, per event type, emitted exactly once
    when the stream resumes (append semantics; parity with the batch
    ``time_gaps`` asserted in tests for IN-ORDER streams).

    Documented divergence (inherent to append mode): batch/stream
    parity holds only while each type's events arrive in event-time
    order across micro-batches. A DELAYED file whose events land
    inside an already-emitted gap cannot retract the alert — the gap
    row was final on emit, so it stands as a FALSE POSITIVE relative
    to the batch twin over the full log (the reconciliation path);
    the late batch's OWN internal gaps are additionally emitted as
    refining sub-rows (overlapping the earlier super-gap — dedupe in
    the reconciliation). The invariant is one-sided by construction:
    every real silence in the full log is CONTAINED in some emitted
    row (never under-alerts), while late delivery can only add
    refinements or boundary super-gaps. State stays one monotone
    clock per type — bounded regardless of lateness."""
    # a NULL ts row would fail the micro-batch (NaN reaches int() in
    # the state fn) and wedge the stream on checkpoint replay —
    # dropped up front; a heartbeat with no timestamp carries no
    # liveness signal anyway
    # event_type + t_us are all the gap walk reads — shipping
    # event_id through the exchange fed only a dead sort (r12 review)
    prepared = events.filter(F.col("ts").isNotNull()).select(
        "event_type", F.expr(TS_US_FLOOR).alias("t_us")
    )

    def fn(key, pdfs, state):
        return _gaps_type(key, pdfs, state, min_gap_us)

    return prepared.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=GAP_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
