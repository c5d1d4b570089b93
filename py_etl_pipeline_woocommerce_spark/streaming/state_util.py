"""Shared helpers for applyInPandasWithState operators.

One home for the idle-eviction arming logic so the sessionizer and
the transition tracker (and any future stateful twin) cannot drift
apart on the subtle parts: the event-time clamp above the current
watermark, and the no-events-yet fallback.
"""

from __future__ import annotations

from pyspark.sql.streaming.state import GroupState


def set_idle_timeout(
    state: GroupState, event_time: bool, last_us, idle_ms: int
) -> None:
    """Arm the idle eviction for a state row.

    Processing-time mode waits ``idle_ms`` of wall clock. Event-time
    mode arms an absolute watermark timestamp at ``last_us + idle_ms``
    (ms grain), clamped above the CURRENT watermark — Spark rejects
    stale timestamps, and a late batch can arm after the watermark
    already passed last+idle. With no stored clock yet
    (``last_us is None``) the relative ``idle_ms`` is used as the
    base, which the clamp immediately lifts to watermark+1 — i.e.
    "evict at the next watermark advance", the earliest legal slot.
    """
    if not event_time:
        state.setTimeoutDuration(idle_ms)
        return
    base = (last_us // 1000 + idle_ms) if last_us is not None else idle_ms
    state.setTimeoutTimestamp(max(base, state.getCurrentWatermarkMs() + 1))


def validate_timeout(op: str, timeout: str) -> bool:
    """Parse the shared ``timeout=`` argument; True means event time."""
    if timeout not in ("processing", "event"):
        raise ValueError(
            f"{op}: timeout must be 'processing' or 'event', got {timeout!r}"
        )
    return timeout == "event"


def prepare_event_time(df, t_us_col: str, lateness_minutes: int):
    """Attach ``evt_ts`` + the watermark event-time eviction reads.

    The watermark is ALSO Spark's late-row filter for stateful
    operators: any row more than ``lateness_minutes`` behind the
    stream's max event time is dropped BEFORE the operator's own
    drop rules ever see it. Callers must surface that horizon as an
    explicit parameter (and document it as a batch-twin divergence)
    rather than silently reusing the eviction horizon.
    """
    from pyspark.sql import functions as F

    return df.withColumn(
        "evt_ts", F.timestamp_micros(F.col(t_us_col))
    ).withWatermark("evt_ts", f"{lateness_minutes} minutes")


def timeout_conf(event_time: bool):
    """The applyInPandasWithState timeoutConf for the chosen clock."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        GroupStateTimeout.EventTimeTimeout
        if event_time
        else GroupStateTimeout.ProcessingTimeTimeout
    )


# ---------------------------------------------------------------------------
# Versioned state rows
#
# The physical state layout of an applyInPandasWithState operator is
# baked into its checkpoint; Spark's state-store schema check REJECTS a
# restart after ANY physical widening, and checkpoint files have no
# in-place migration. Storing the logical fields inside ONE opaque
# (version, payload-JSON) row fixes the physical schema forever: a
# future widening adds a key to the op's defaults dict and bumps its
# version — an old checkpoint's rows read through `decode_state`, the
# missing key takes its default, and the stream continues WITHOUT a
# checkpoint reset. (Converting TO this layout is itself the last
# physical change: pre-r9 checkpoints rebuild once via
# `rebuild_state_from_batch`, as every prior widening did.)
# ---------------------------------------------------------------------------

from pyspark.sql import types as _T

VERSIONED_STATE_SCHEMA = _T.StructType(
    [
        _T.StructField("version", _T.IntegerType()),
        _T.StructField("payload", _T.StringType()),
    ]
)


def encode_state(version: int, fields: dict) -> tuple:
    """Pack logical state fields into the fixed physical row."""
    import json

    return (version, json.dumps(fields, separators=(",", ":")))


def decode_state(state: GroupState, version: int, defaults: dict) -> dict:
    """Read-path shim: unpack a versioned state row into the CURRENT
    logical layout. Keys absent from an older version's payload get
    their registered default (the widening shim); keys the current
    layout no longer declares are dropped. A payload written by a
    NEWER version raises — silently reinterpreting fields written by
    a future layout is the corruption this scheme exists to prevent.
    Absent state returns a copy of the defaults."""
    import json

    if not state.exists:
        return dict(defaults)
    row_version, payload = state.get
    if row_version > version:
        raise ValueError(
            f"state row version {row_version} is newer than this "
            f"reader (version {version}) — upgrade the operator "
            "before restarting this checkpoint"
        )
    stored = json.loads(payload)
    return {k: stored.get(k, v) for k, v in defaults.items()}
