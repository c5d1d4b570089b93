"""Stream-stream joins with watermark-bounded state.

The attribution join every event pipeline eventually needs: match
conversions (purchase/click) to the user's preceding impressions
(views) within a lag window — both sides unbounded streams. The
join is MANY-TO-MANY by design (test-pinned): a click preceded by
five in-window views emits five rows, each carrying the SAME
click_id/click_value, so summing click_value over the raw output
multi-counts conversions — aggregate per click_id (or reduce to
last-touch with a per-click max(view_time)) first; the fractional
split is ``operators.events.linear_attribution``'s job. Spark's
stream-stream inner join keeps only the state the time-bound allows:
the watermark + the join's time-range condition let the engine evict
buffered rows once no future match is possible, so state is bounded
by (watermark + lag) × arrival rate regardless of total stream
length. Without the time bound the join would be rejected (unbounded
state) — the range condition is the scale contract, not an option.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pipeline import with_event_time


def attribution_join(
    views: DataFrame,
    clicks: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join clicks to the views they follow: same user, click
    time in ``[view_time, view_time + max_lag]``.

    Both inputs are raw event streams (epoch-ns ``ts``); each gets its
    own event-time watermark. Output: one row per (view, click) match
    with the lag in microseconds — integer, engine-exact.
    """
    v = (
        with_event_time(views)
        .withWatermark("event_time", watermark)
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("event_time").alias("view_time"),
        )
    )
    c = (
        with_event_time(clicks)
        .withWatermark("event_time", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("event_time").alias("click_time"),
            F.col("value").alias("click_value"),
        )
    )
    joined = v.join(
        c,
        F.expr(
            f"""v_user = c_user
            AND click_time >= view_time
            AND click_time <= view_time + interval {max_lag}"""
        ),
    )
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        "click_value",
        (
            F.unix_micros("click_time") - F.unix_micros("view_time")
        ).alias("lag_us"),
    )
