"""Event-payload normalization + windowed aggregation (batch side).

``parse_event_props`` is the engine's JSON-payload normalizer — the
same job the reference's ``normalize_orders`` does for Woo order JSON
(``normalize_orders.py:13``), applied to the ``events.props`` JSON
column. ``event_window_agg`` is the batch twin of the streaming
windowed aggregation in ``streaming/events.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.money import dec_money


def parse_event_props(events: DataFrame) -> DataFrame:
    """Typed projection of raw events + extracted JSON prop.

    Extraction uses a regexp (identical semantics in the SQL oracle);
    ``from_json`` would be equivalent but regexp keeps the oracle
    twin byte-for-byte portable.
    """
    # ts arrives as epoch-ns BIGINT (session.py nanosAsLong); emit
    # epoch-µs (integer floor-div — engines that read this parquet
    # type as µs-truncated timestamps agree exactly).
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
        F.col("value"),
        F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("bigint").alias("prop_k"),
    )


def event_window_agg(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows per event_type: count + exact value sum.

    Batch parity of the streaming watermark aggregation; hour
    truncation + groupBy is a single map-side-combined shuffle.
    """
    hour_us = 3_600_000_000
    ts_us = F.expr("ts div 1000")
    return (
        events.groupBy(
            (ts_us - (ts_us % hour_us)).alias("window_start_us"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec_money("value")).cast("double").alias("total_value"),
        )
    )


def hopping_window_agg(
    events: DataFrame,
    window_us: int = 3_600_000_000,
    hop_us: int = 1_800_000_000,
) -> DataFrame:
    """Hopping (sliding) windows: 1-hour windows advancing every 30
    minutes — each event lands in ``window/hop`` overlapping windows.

    The window membership explode is a ``sequence`` of the k window
    starts covering the event (pure integer arithmetic — identical in
    any engine), then the same map-side-combined agg as the tumbling
    case. Fan-out is the fixed window/hop ratio (2 here), so the
    shuffled volume is 2× the input regardless of scale — the
    standard streaming-SQL hopping-window plan.
    """
    n = window_us // hop_us
    ts_us = F.expr("ts div 1000")
    anchor = ts_us - (ts_us % hop_us)
    starts = F.sequence(
        F.lit(0).cast("bigint"), F.lit(int(n - 1)).cast("bigint")
    )
    exploded = events.select(
        "event_type",
        F.col("value"),
        F.explode(
            F.transform(starts, lambda k: anchor - k * F.lit(int(hop_us)))
        ).alias("window_start_us"),
        ts_us.alias("_ts_us"),
    ).filter(F.col("_ts_us") < F.col("window_start_us") + F.lit(int(window_us)))
    return exploded.groupBy("window_start_us", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec_money("value")).cast("double").alias("total_value"),
    )


def funnel_steps(
    events: DataFrame, max_gap_us: int | None = None
) -> DataFrame:
    """Ordered funnel view → click → purchase: per stage, the number
    of users who completed it in sequence (a later stage only counts
    events at/after the user's earliest qualifying previous stage).
    With ``max_gap_us``, each step must additionally land within that
    window of the previous step's time — the conversion-window funnel
    every product-analytics tool defaults to (an unconstrained funnel
    credits a purchase months after the click).

    Three per-user aggregations chained by join — each stage frame is
    one row per surviving user, strictly shrinking, so the joins get
    cheaper down the funnel and AQE broadcasts the later stages. No
    window over the whole event stream: the per-user min is a
    map-side-combinable agg, robust to power-user skew. The gap
    constraint is a filter on the already-joined frame — plan shape
    unchanged.
    """
    e = events.select("user_id", "event_type", F.expr("ts div 1000").alias("t"))
    within = (
        (lambda prev: F.lit(True))
        if max_gap_us is None
        else (lambda prev: F.col("t") <= F.col(prev) + max_gap_us)
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("t").alias("t_view"))
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter((F.col("t") >= F.col("t_view")) & within("t_view"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_click"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter((F.col("t") >= F.col("t_click")) & within("t_click"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t_purchase"))
    )

    def stage(df: DataFrame, name: str, order: int) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(order).alias("stage_order"),
            F.lit(name).alias("stage"),
            "n_users",
        )

    return (
        stage(views, "view", 1)
        .unionByName(stage(clicks, "click", 2))
        .unionByName(stage(purchases, "purchase", 3))
    )


def event_props_typed(events: DataFrame) -> DataFrame:
    """Schema-on-read JSON normalization via ``from_json`` — the
    structured twin of ``parse_event_props``'s regexp extraction.

    ``from_json`` with a declared schema stays JVM-side (Jackson
    inside codegen), null-safe on malformed payloads, and prunes
    unreferenced fields at parse time at scale.
    """
    parsed = events.select(
        "event_id",
        "event_type",
        F.from_json("props", "k INT").alias("_p"),
    )
    return parsed.select(
        "event_id",
        "event_type",
        F.col("_p.k").cast("int").alias("prop_k"),
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Per-user session aggregation via Spark's BUILT-IN
    ``session_window`` (gap-based dynamic windows): same semantics as
    the hand-rolled ``sessionize`` (lag/cumsum), but expressed as one
    native grouped aggregate — the form that also runs unchanged under
    Structured Streaming with watermark-driven state eviction.

    One shuffle on (user, window); the session assembly happens inside
    the aggregation operator (no window-function sort pass). Output is
    one row per session: bounds, event count, decimal-exact value sum.
    """
    e = events.select(
        "user_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("event_time"),
        "value",
    )
    return (
        e.groupBy("user_id", F.session_window("event_time", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec_money("value")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("start_us"),
            F.unix_micros(F.col("w.end")).alias("end_us"),
            "n_events",
            "total_value",
        )
    )
