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
