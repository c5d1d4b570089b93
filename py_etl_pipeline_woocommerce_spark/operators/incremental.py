"""Incremental-load primitives: watermark filter/advance + backfill
windows.

Re-expresses the reference's watermark state machine
(``/root/reference/src/etl/utils/state.py`` get/set ``since_iso``;
``src/run.py:140-150`` advances to max(order_date)+1min) and windowed
backfill (``src/run.py:106-130``: march a cursor in N-day windows).

Spark-first: the watermark predicate is a plain filter that Catalyst
pushes into the parquet/iceberg scan — at 100 TB with date-partitioned
data this becomes partition pruning, reading only new partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_since(df: DataFrame, ts_col: str, watermark_iso: str) -> DataFrame:
    """Rows strictly after the watermark (run.py's ``after=since_iso``).

    The watermark VALIDATES on the driver first: a corrupted state
    file ('2024-13-01...') would otherwise cast to NULL, the
    predicate would be NULL for every row, and the incremental run
    would "succeed" with zero rows forever — the reference's
    pendulum parse raises, and so does this."""
    from datetime import datetime

    datetime.fromisoformat(watermark_iso)  # raises on malformed input
    return df.filter(F.col(ts_col) > F.lit(watermark_iso).cast("timestamp"))


def next_watermark(df: DataFrame, ts_col: str) -> str | None:
    """max(ts) + 1 minute, ISO string — matches run.py:146
    (``p.parse(max_dt).add(minutes=1)``). ONE tiny agg whose +1min
    and formatting run INSIDE Spark: the old two-job version
    round-tripped the max through a driver-local naive datetime
    (collect → createDataFrame), which drops the DST fold bit — with
    a driver TZ that falls back (the repo's own Europe/Athens
    default) a max in the repeated hour could land the watermark an
    hour late and silently skip that hour's orders forever."""
    row = df.agg(
        F.date_format(
            F.max(ts_col) + F.expr("INTERVAL 1 MINUTE"),
            "yyyy-MM-dd'T'HH:mm:ss",
        ).alias("iso")
    ).collect()[0]
    return row["iso"]


def assign_backfill_windows(
    df: DataFrame, ts_col: str, start_iso: str, window_days: int = 30
) -> DataFrame:
    """Tag each row with its backfill window index (run.py:113-129
    marches ``cursor += window_days``); lets one job plan all windows
    instead of a driver loop of sequential fetches.

    ``start_iso`` validates on the DRIVER (the filter_since rule): a
    corrupted value would cast to NULL and tag every row's window
    NULL — a backfill that "succeeds" empty forever. Rows BEFORE the
    start clamp into window 0 instead of going negative: a planner
    iterating windows 0..N would silently never process a negative
    index, losing late-arriving rows with no error.
    """
    from datetime import datetime

    datetime.fromisoformat(start_iso)  # raises on malformed input
    if window_days <= 0:
        raise ValueError(
            f"window_days must be positive, got {window_days}"
        )
    start = F.lit(start_iso).cast("timestamp")
    # NTZ-safe epoch seconds: NTZ -> TIMESTAMP uses the UTC session tz.
    secs = F.col(ts_col).cast("timestamp").cast("long")
    idx = F.floor((secs - start.cast("long")) / (window_days * 86400))
    return df.withColumn(
        "backfill_window", F.greatest(idx, F.lit(0)).cast("bigint")
    )
