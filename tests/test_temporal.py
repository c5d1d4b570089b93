"""Temporal operators: as-of join, bucketed range join, multi-
resolution rollup, percentiles, daily actives — unit semantics on
literal frames (hand-computed) + sf0.001 shape checks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from py_etl_pipeline_woocommerce_spark.catalog import load_table
from py_etl_pipeline_woocommerce_spark.operators.temporal import (
    DAY_US,
    HOUR_US,
    asof_join,
    daily_active_users,
    multires_rollup,
    range_join_window,
    value_percentiles,
)

SCHEMA = "event_id long, ts long, user_id long, event_type string, value double, props string"


def _ev(spark, rows):
    # rows: (event_id, t_us, user_id, event_type, value); ts stored in ns
    return spark.createDataFrame(
        [(i, t * 1000, u, ty, v, "{}") for i, t, u, ty, v in rows], SCHEMA
    )


def test_asof_join_picks_latest_at_or_before(spark):
    ev = _ev(
        spark,
        [
            (1, 100, 7, "click", 0.0),
            (2, 200, 7, "click", 0.0),
            (3, 200, 7, "purchase", 9.0),   # tie: click at same µs counts
            (4, 150, 8, "purchase", 5.0),   # user 8 has no click before
            (5, 300, 7, "purchase", 2.0),
        ],
    )
    out = {r["event_id"]: r for r in asof_join(ev).collect()}
    assert out[3]["asof_event_id"] == 2 and out[3]["gap_us"] == 0
    assert out[5]["asof_event_id"] == 2 and out[5]["gap_us"] == 100
    assert out[4]["asof_event_id"] is None and out[4]["gap_us"] is None


def test_asof_join_tie_breaks_to_max_event_id(spark):
    ev = _ev(
        spark,
        [
            (10, 100, 1, "click", 0.0),
            (11, 100, 1, "click", 0.0),  # same user, same µs
            (12, 101, 1, "purchase", 1.0),
        ],
    )
    (row,) = asof_join(ev).collect()
    assert row["asof_event_id"] == 11


def test_range_join_window_counts_inclusive_window(spark):
    t0 = 10 * HOUR_US + 500  # not bucket-aligned
    ev = _ev(
        spark,
        [
            (1, t0 - HOUR_US - 1, 1, "view", 1.0),  # just outside
            (2, t0 - HOUR_US, 1, "view", 2.0),      # boundary: inclusive
            (3, t0 - 5, 1, "view", 3.0),
            (4, t0, 1, "view", 4.0),                # at anchor ts: inclusive
            (5, t0, 1, "purchase", 0.0),
            (6, t0, 2, "purchase", 0.0),            # other user: no views
        ],
    )
    out = {r["event_id"]: r for r in range_join_window(ev).collect()}
    assert out[5]["n_in_window"] == 3
    assert out[5]["value_in_window"] == pytest.approx(9.0)
    assert out[6]["n_in_window"] == 0 and out[6]["value_in_window"] == 0.0


def test_multires_rollup_grains_consistent(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = multires_rollup(ev)
    day = out.filter(F.col("grain") == "day")
    hour = out.filter(F.col("grain") == "hour")
    # hour rows re-aggregated to day must equal day rows
    re_day = hour.groupBy("event_type", "day_us").agg(
        F.sum("n_events").alias("n_events")
    )
    joined = day.select("event_type", "day_us", "n_events").join(
        re_day, ["event_type", "day_us"], "full"
    )
    assert joined.filter(day.n_events != re_day.n_events).count() == 0
    # hour buckets sit inside their day bucket
    assert hour.filter(
        (F.col("bucket_us") < F.col("day_us"))
        | (F.col("bucket_us") >= F.col("day_us") + DAY_US)
    ).count() == 0


def test_value_percentiles_ordering(spark, sf_dir):
    out = value_percentiles(load_table(spark, sf_dir, "events")).collect()
    assert len(out) == 5
    for r in out:
        assert r["p50"] <= r["p90"] <= r["p99"]


def test_daily_active_users_bounds(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = daily_active_users(ev)
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == ev.count()
    assert out.filter(F.col("n_users") > F.col("n_events")).count() == 0
