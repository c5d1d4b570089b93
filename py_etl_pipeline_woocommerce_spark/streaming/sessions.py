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

from ..functions.timeutil import TS_US_FLOOR
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState

from .state_util import (
    VERSIONED_STATE_SCHEMA,
    decode_state,
    encode_state,
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

#: Logical state (session_seq, start_us, last_us, n_events,
#: total_cents) — value accumulates as INTEGER CENTS (each event's
#: value quantized to 2 dp half-up, the same rule as dec_money) so
#: cross-batch summation is exact like the batch twin's DECIMAL sum;
#: a float state field accumulated 0.1+0.2 drift the batch twin never
#: shows. Physically the row is the opaque VERSIONED (version,
#: payload) pair since r9: the NEXT logical widening adds a key +
#: default here and bumps STATE_VERSION — prior-version rows read
#: through the decode shim without a checkpoint reset (pytest-pinned).
#: Pre-r9 checkpoints (typed-struct layout, incl. the r8 double→long
#: cents change) still REJECT loudly, by design; rebuild on a fresh
#: checkpoint.
STATE_VERSION = 1
STATE_DEFAULTS = {
    "session_seq": 0,
    "start_us": None,
    "last_us": None,
    "n_events": 0,
    "total_cents": 0,
}
STATE_SCHEMA = VERSIONED_STATE_SCHEMA


def _cents(value: float) -> int:
    """Quantize one event value to integer cents, HALF-UP on the
    shortest decimal representation — bit-for-bit the rule Spark's
    ``cast(double as decimal(18,2))`` (``dec_money``) applies, so the
    stream's per-event rounding matches the batch twin's."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        Decimal(repr(value)).quantize(Decimal("0.01"), ROUND_HALF_UP) * 100
    )


COUNTER_RETENTION_MS = 30 * 86_400_000


def _sessionize_user(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
    event_time: bool = False,
    version: int | None = None,
    defaults: dict | None = None,
) -> Iterator[pd.DataFrame]:
    version = STATE_VERSION if version is None else version
    defaults = STATE_DEFAULTS if defaults is None else defaults
    (user_id,) = key
    if state.hasTimedOut:
        st = decode_state(state, version, defaults)
        seq, start, last, n, cents = (
            st["session_seq"], st["start_us"], st["last_us"],
            st["n_events"], st["total_cents"],
        )
        if n == 0:
            # counter-only tombstone expired: the user stayed away
            # long past the retention horizon — forget the counter
            state.remove()
            return
        # close the open session but KEEP the session counter AND the
        # closed session's end time in a counter-only tombstone: a
        # returning user continues at seq+1 instead of restarting at
        # 0, and `last` anchors the lateness horizon — without it an
        # arbitrarily OLD late event after the timeout would be
        # accepted as a fresh session that precedes seq in event time
        state.update(
            encode_state(
                version,
                {
                    **defaults,
                    "session_seq": seq + 1,
                    "start_us": None,
                    "last_us": last,
                    "n_events": 0,
                    "total_cents": 0,
                },
            )
        )
        set_idle_timeout(state, event_time, last, COUNTER_RETENTION_MS)
        yield pd.DataFrame(
            [[user_id, seq, n, start, last, cents / 100.0, True]],
            columns=SESSION_SCHEMA.fieldNames(),
        )
        return

    st = decode_state(state, version, defaults)
    seq, start, last, n, cents = (
        st["session_seq"], st["start_us"], st["last_us"],
        st["n_events"], st["total_cents"],
    )

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
        if start is None and last is not None and t_us <= last:
            # tombstone horizon: the user's previous session closed at
            # `last` and was already emitted — an event at or before
            # that belongs to the closed (or an earlier) session; a
            # fresh session here would precede seq-1 in event time
            continue
        if last is not None and n > 0 and t_us - last > gap_us:
            out_rows.append(
                [user_id, seq, n, start, last, cents / 100.0, True]
            )
            seq, start, n, cents = seq + 1, t_us, 0, 0
        # late (cross-batch out-of-order) events within the horizon
        # may still precede the stored bounds: clamp so the clock
        # never runs backwards (a regressed `last` would fake a gap
        # and split the session — the liveness monitor's max() guard)
        # and the session bounds stay the true [min, max] the batch
        # twin reports
        start = t_us if start is None else min(start, t_us)
        last = t_us if last is None else max(last, t_us)
        n += 1
        cents += _cents(float(value)) if value == value else 0  # NaN-safe

    state.update(
        encode_state(
            version,
            {
                **defaults,
                "session_seq": seq,
                "start_us": start,
                "last_us": last,
                "n_events": n,
                "total_cents": cents,
            },
        )
    )
    # idle eviction: close the open session when the gap elapses —
    # wall clock in processing-time mode, watermark in event-time
    # mode; an all-dropped batch on a tombstone keeps the COUNTER
    # retention clock, not the gap clock
    set_idle_timeout(
        state,
        event_time,
        last,
        gap_us // 1000 if n > 0 else COUNTER_RETENTION_MS,
    )
    if n > 0:
        out_rows.append(
            [user_id, seq, n, start, last, cents / 100.0, False]
        )
    yield pd.DataFrame(out_rows, columns=SESSION_SCHEMA.fieldNames())


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = GAP_MINUTES,
    timeout: str = "processing",
    lateness_minutes: int | None = None,
    state_version: int | None = None,
    state_defaults: dict | None = None,
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

    ``state_version`` / ``state_defaults`` override the module's
    logical state layout — the WIDENING seam: a deployment rolling
    out a wider layout (new keys with defaults, a higher version)
    restarts on the SAME checkpoint, and prior-version state rows
    read through the ``decode_state`` shim with the new keys at their
    defaults (pytest-pinned; the physical schema is the fixed
    (version, payload) pair either way). Production widenings should
    land in ``STATE_VERSION``/``STATE_DEFAULTS`` themselves.
    """
    event_time = validate_timeout("sessionize_stream", timeout)
    gap_us = gap_minutes * 60_000_000
    # rows with a NULL event time or user have no place on a user's
    # timeline — and ONE such row would fail the micro-batch (NaN
    # reaches int() in the pandas state fn) and wedge the stream
    # forever: checkpoint replay retries the identical batch. Dropped
    # up front (a documented divergence — the batch twin's window
    # sorts NULLs instead).
    prepared = events.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    ).select("user_id", F.expr(TS_US_FLOOR).alias("t_us"), "value")
    if event_time:
        prepared = prepare_event_time(
            prepared,
            "t_us",
            gap_minutes if lateness_minutes is None else lateness_minutes,
        )

    def fn(key, pdfs, state):
        return _sessionize_user(
            key, pdfs, state, gap_us, event_time,
            version=state_version, defaults=state_defaults,
        )

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout_conf(event_time),
    )
