"""Gap-based sessionization of the ``events`` stream table.

Batch form: per-user window with lag(ts) → gap > threshold starts a
new session; session id is the running count of session starts.
(The streaming twin uses ``session_window`` — see
``streaming/events.py``.)

Scale: one hash shuffle on user_id, then partition-local sorts —
the canonical Spark sessionization; skewed power-users are split by
AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutil import TS_US_FLOOR

from ..functions.money import dec_money

GAP_MINUTES = 30


def _tag_sessions(events: DataFrame, gap_minutes: int) -> DataFrame:
    """THE gap-sessionization kernel, shared by ``sessionize``,
    ``session_paths`` and ``session_stats`` — one place owns the
    session definition (total order (ts_us, event_id); a session
    break is a gap STRICTLY greater than the threshold), so the three
    surfaces can never silently diverge.

    Integer-microsecond arithmetic: ``ts`` arrives as epoch-ns longs
    (see session.py nanosAsLong), FLOOR-divided to µs so gap
    comparison and session bounds are exact integer ops — ``div``
    alone truncates toward zero, which for a pre-1970 timestamp with
    sub-µs residue lands one µs above the true floor and can split a
    threshold-straddling session differently from an epoch_us oracle;
    ``(ts - pmod(ts, 1000)) div 1000`` floors for either sign.
    Returns the event-grain frame with ``ts_us`` and ``session_seq``
    stamped — one user-keyed sort, both windows sharing it."""
    e = events.withColumn("ts_us", F.expr(TS_US_FLOOR))
    order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag("ts_us").over(order)
    new_sess = (prev.isNull() | ((F.col("ts_us") - prev) > gap_us)).cast("int")
    sess_id = F.sum(new_sess).over(
        order.rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.withColumn("session_seq", sess_id)


def sessionize(events: DataFrame, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """One row per (user, session): ordinal, bounds, size, value sum.

    Ordering within user is (ts, event_id) — a total order, so session
    assignment is deterministic (the shared ``_tag_sessions`` kernel).
    """
    tagged = _tag_sessions(events, gap_minutes)
    return tagged.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        F.sum(dec_money("value")).cast("double").alias("total_value"),
    )


def session_paths(
    events: DataFrame,
    gap_minutes: int = GAP_MINUTES,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` most common event-type paths through a session —
    "view>view>click>purchase"-style journey analysis, the
    funnel-adjacent report product teams read next to conversion
    counts.

    Same deterministic gap sessionization as ``sessionize`` (the
    shared ``_tag_sessions`` kernel); each session's path is the
    time-ordered (ties: event_id) join of its event types — built by
    sorting the per-session collected (ts, event_id, type) structs,
    NOT by assuming collect order, so the string is identical at any
    parallelism. One user-keyed shuffle + one path-keyed count agg;
    the top-k is a distributed TakeOrdered over the aggregated path
    counts (rank window sees only the k survivors), tie-broken on
    the path string.
    """
    tagged = _tag_sessions(events, gap_minutes)
    per_session = tagged.groupBy("user_id", "session_seq").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("ts_us", "event_id", "event_type")
                    )
                ),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    counts = per_session.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    # distributed TakeOrdered for the global cut; the rank window only
    # ever sees the k survivors (distinct paths grow with the corpus,
    # so ranking the full aggregate would be a one-task sort)
    top = counts.orderBy(F.col("n_sessions").desc(), F.col("path")).limit(k)
    w = Window.orderBy(F.col("n_sessions").desc(), F.col("path"))
    return top.withColumn("path_rank", F.row_number().over(w))


def session_stats(
    events: DataFrame, gap_minutes: int = GAP_MINUTES
) -> DataFrame:
    """Session-quality report by ENTRY event type: how many sessions
    start with a view vs a click, what share bounce (single-event
    sessions), and the mean depth/duration — the engagement summary a
    product dashboard shows next to the raw session list
    (``sessionize``) and the top journeys (``session_paths``).

    Same single user-keyed sort as ``sessionize`` (the shared
    ``_tag_sessions`` kernel); the entry event is the struct-min over
    (ts, event_id, type), so ties are deterministic. Counts and
    durations are integers; the three means are single divisions
    rounded at the boundary — engine-exact.
    """
    tagged = _tag_sessions(events, gap_minutes)
    per_sess = tagged.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.struct("ts_us", "event_id", "event_type"))
        .getField("event_type")
        .alias("entry_type"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )
    return per_sess.groupBy("entry_type").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias(
            "n_bounces"
        ),
        F.round(
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("bounce_rate"),
        F.round(F.sum("n_events") / F.count(F.lit(1)), 6).alias(
            "mean_events"
        ),
        F.round(F.sum("duration_us") / F.count(F.lit(1)), 6).alias(
            "mean_duration_us"
        ),
    )
