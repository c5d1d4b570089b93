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
``idle_minutes`` of silence — bounded by the active audience, not the
stream length. The eviction clock is wall time by default and the
watermark in ``timeout="event"`` mode (same trade as
``sessionize_stream``).

Checkpoint compatibility: the PHYSICAL state row is the opaque
versioned (version, payload) pair from ``state_util`` — fixed
forever, so Spark's state-store schema check accepts restarts across
LOGICAL widenings: add a key + default to ``STATE_DEFAULTS``, bump
``STATE_VERSION``, and prior-version rows read through the
``decode_state`` shim without a checkpoint reset (pytest-pinned).
Converting a PRE-versioned checkpoint (r8 and earlier, whose layout
was a typed struct) is the one remaining rebuild; the TESTED path is
``rebuild_state_from_batch``: seed a FRESH checkpoint from the
historical event log so each user's "previous event" survives the
change and the first post-upgrade event still chains across the
boundary — no open transition is lost, and no historic transition is
re-emitted.
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

TRANSITION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("from_type", T.StringType()),
        T.StructField("to_type", T.StringType()),
        T.StructField("gap_us", T.LongType()),
    ]
)

#: Logical state (last_us, last_id, last_type) — the event_id rides
#: along so the cross-batch tie-break matches the batch twin's
#: (t_us, event_id) window order. Physically the row is the opaque
#: VERSIONED (version, payload) pair since r9, so the NEXT logical
#: widening is non-breaking: add the key + default here, bump
#: STATE_VERSION, and old checkpoints read through the decode shim
#: without a reset (see state_util; converting pre-r9 checkpoints is
#: the one remaining rebuild, via ``rebuild_state_from_batch``).
STATE_VERSION = 1
STATE_DEFAULTS = {"last_us": None, "last_id": None, "last_type": None}
STATE_SCHEMA = VERSIONED_STATE_SCHEMA


def _transitions_user(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    idle_ms: int,
    event_time: bool = False,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        yield pd.DataFrame(columns=TRANSITION_SCHEMA.fieldNames())
        return

    st = decode_state(state, STATE_VERSION, STATE_DEFAULTS)
    last_us, last_id, last_type = (
        st["last_us"], st["last_id"], st["last_type"],
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
    state.update(
        encode_state(
            STATE_VERSION,
            {
                "last_us": last_us,
                "last_id": last_id,
                "last_type": last_type,
            },
        )
    )
    set_idle_timeout(state, event_time, last_us, idle_ms)
    yield pd.DataFrame(out, columns=TRANSITION_SCHEMA.fieldNames())


def transitions_stream(
    events: DataFrame,
    idle_minutes: int = 24 * 60,
    timeout: str = "processing",
    lateness_minutes: int | None = None,
) -> DataFrame:
    """events (ts epoch-ns BIGINT) → one row per consecutive-event
    transition per user, emitted exactly once (append semantics).

    ``timeout`` picks the idle-eviction clock (state hygiene only —
    eviction never emits a row, it just forgets an inactive user's
    last event, so the NEXT event after eviction starts a fresh chain
    instead of producing a transition):

    - ``"processing"`` (default): evict after ``idle_minutes`` of
      WALL-CLOCK silence. A source stall or backpressure pause longer
      than the idle horizon forgets users the batch twin (which sees
      only event time) would chain across — the stall-adjacent
      transitions are silently not emitted.
    - ``"event"``: the input carries a watermark and a user is
      evicted when the WATERMARK passes last_event + idle — the same
      clock the batch twin's gap semantics read, immune to source
      stalls. Idle users are only forgotten as other events advance
      the watermark (the standard event-time trade).

    Event mode's watermark is ALSO Spark's late-row filter: an event
    arriving more than ``lateness_minutes`` (default: the idle
    horizon) behind the stream's max event time is dropped BEFORE
    this operator's own drop rule runs — the transition it would
    have produced is missing, and the user's NEXT event chains
    across the hole, emitting a pair the batch twin (which has no
    lateness bound) never produces. Raise ``lateness_minutes`` to
    widen the tolerated disorder at the cost of proportionally later
    eviction (the watermark lags the stream by that much).
    """
    event_time = validate_timeout("transitions_stream", timeout)
    idle_ms = idle_minutes * 60_000
    # NULL ts/event_id/user_id rows are dropped up front: one would
    # fail the micro-batch (NaN reaches int() in the state fn) and
    # checkpoint replay would retry the same batch forever — the
    # poison-pill failure mode of every stateful pandas operator
    prepared = events.filter(
        F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
        & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        "event_id",
        F.expr(TS_US_FLOOR).alias("t_us"),
        "event_type",
    )
    if event_time:
        prepared = prepare_event_time(
            prepared,
            "t_us",
            idle_minutes if lateness_minutes is None else lateness_minutes,
        )

    def fn(key, pdfs, state):
        return _transitions_user(key, pdfs, state, idle_ms, event_time)

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf(event_time),
    )


def rebuild_state_from_batch(
    history: DataFrame, idle_minutes: int | None = None
) -> DataFrame:
    """State-schema upgrade path for ``transitions_stream``: distill
    the historical event log (bronze, SOURCE schema) down to each
    user's LAST event — one seed row per user, in the batch twin's
    (t_us, event_id) order — to be delivered as the FIRST micro-batch
    of a stream restarted on a FRESH checkpoint.

    Why this works: a user's first event through ``transitions_stream``
    sets state without emitting (no predecessor), so replaying only
    the last historic event per user rebuilds exactly the
    (last_us, last_id, last_type) state row under the NEW
    ``STATE_SCHEMA`` — zero historic transitions are re-emitted, and
    the first genuinely new event still pairs with the last
    pre-upgrade one. Procedure::

        seed = rebuild_state_from_batch(spark.read.parquet(bronze))
        seed.write.parquet(f"{source}/00-upgrade-seed.parquet")
        # restart transitions_stream with a NEW checkpoint dir

    REQUIREMENT: the restarted stream's source directory must contain
    NO other unprocessed files when it starts — archive or point past
    the already-consumed drops, so the seed parquet is the SOLE file
    the fresh checkpoint discovers (micro-batch 0). A fresh checkpoint
    rediscovers every file still in the directory (the file source
    orders by modification time, so the just-written seed would be the
    NEWEST file, historic drops would replay first, and historic
    transitions would be re-emitted). In practice: seed into a new
    drop directory and switch the stream's source path to it.

    ``idle_minutes`` mirrors the stream's eviction horizon: seed rows
    whose last event is more than that far behind the log's max event
    time are dropped — those users would have been evicted anyway,
    and seeding them would chain a transition the pre-upgrade stream
    would not have emitted. The per-user argmax is one map-side-
    combinable ``max_by`` aggregate over bronze (no window, no sort) —
    a single shuffle of one row per user at any log size.

    Contrast with the reference's stateless rebuild
    (``flow.py`` re-runs the whole pandas pipeline): here only the
    KB-per-user tail is replayed, not the log.
    """
    cols = history.columns
    # same poison-pill filter as transitions_stream's prepared input:
    # the pre-upgrade stream never held state from a NULL
    # ts/event_id/user_id row, and a seed row carrying one would be
    # silently dropped by the restarted stream's own filter — losing
    # that user's cross-upgrade chain (r12 review find)
    history = history.filter(
        F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
        & F.col("user_id").isNotNull()
    )
    order = F.struct(
        F.expr(TS_US_FLOOR).alias("t_us"), F.col("event_id")
    )
    picked = history.groupBy("user_id").agg(
        F.max_by(F.struct(*[F.col(c) for c in cols]), order).alias("_last"),
        F.max(F.expr(TS_US_FLOOR)).alias("_last_us"),
    )
    if idle_minutes is not None:
        # one-row global max, broadcast — same device as hot_keys' totals
        horizon = history.agg(
            F.max(F.expr(TS_US_FLOOR)).alias("_max_us")
        )
        picked = picked.join(F.broadcast(horizon)).filter(
            F.col("_last_us")
            >= F.col("_max_us") - F.lit(idle_minutes * 60_000_000)
        )
    return picked.select(*[F.col(f"_last.{c}").alias(c) for c in cols])
