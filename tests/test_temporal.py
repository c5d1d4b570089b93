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


def test_asof_join_nearest_picks_closer_side(spark):
    ev = _ev(
        spark,
        [
            (1, 100, 7, "click", 0.0),
            (2, 500, 7, "click", 0.0),
            (3, 180, 7, "purchase", 0.0),  # back 80 < fwd 320 -> click 1
            (4, 400, 7, "purchase", 0.0),  # back 300 > fwd 100 -> click 2
            (5, 300, 8, "purchase", 0.0),  # user 8: no clicks -> NULLs
            (6, 600, 9, "click", 0.0),
            (7, 550, 9, "purchase", 0.0),  # only forward exists -> click 6
        ],
    )
    out = {
        r["event_id"]: r
        for r in asof_join(ev, direction="nearest").collect()
    }
    assert out[3]["asof_event_id"] == 1 and out[3]["gap_us"] == 80
    assert out[4]["asof_event_id"] == 2 and out[4]["gap_us"] == 100
    assert out[5]["asof_event_id"] is None and out[5]["gap_us"] is None
    assert out[7]["asof_event_id"] == 6 and out[7]["gap_us"] == 50


def test_asof_join_nearest_ties_tolerance_and_shared_sort(spark):
    ev = _ev(
        spark,
        [
            (1, 100, 7, "click", 0.0),
            (2, 300, 7, "click", 0.0),
            (3, 200, 7, "purchase", 0.0),  # equidistant -> backward wins
        ],
    )
    (row,) = asof_join(ev, direction="nearest").collect()
    assert row["asof_event_id"] == 1 and row["gap_us"] == 100
    # tolerance drops matches beyond the bound (row survives with NULLs)
    (row,) = asof_join(
        ev, direction="nearest", tolerance_us=50
    ).collect()
    assert row["asof_event_id"] is None and row["gap_us"] is None
    # an equal-time right is a 0-gap backward match
    ev2 = _ev(
        spark, [(1, 200, 7, "click", 0.0), (2, 200, 7, "purchase", 0.0)]
    )
    (r2,) = asof_join(ev2, direction="nearest").collect()
    assert r2["asof_event_id"] == 1 and r2["gap_us"] == 0
    # both carries share ONE user-keyed sort (merge_intervals shape)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join(ev, direction="nearest").explain("formatted")
    p = buf.getvalue()
    # Spark plans both frames over the single sort (one Window node
    # when it can merge the specs, never more than two)
    assert p.count(") Sort") == 1 and 1 <= p.count(") Window") <= 2


def test_asof_join_all_directions_match_brute_force(spark):
    """Seeded random fuzz: 400 events on a coarse time grid (many
    exact-time ties, one-sided users, empty sides) — all three
    directions and the tolerance cut must match an independent
    brute-force reference, including tie-break identities."""
    import random

    rng = random.Random(42)
    rows = []
    for eid in range(1, 401):
        rows.append(
            (
                eid,
                rng.randint(0, 50) * 100,
                rng.randint(1, 12),
                rng.choice(["click", "purchase"]),
                0.0,
            )
        )
    ev = _ev(spark, rows)
    clicks = {}
    for eid, t, u, ty, _v in rows:
        if ty == "click":
            clicks.setdefault(u, []).append((t, eid))

    def brute(direction, tolerance=None):
        out = {}
        for eid, t, u, ty, _v in rows:
            if ty != "purchase":
                continue
            cands = clicks.get(u, [])
            # backward: min gap, ties -> max id; forward: min gap,
            # ties -> min id (mirrors the union-tag sort order)
            back = min(
                ((t - ct, -cid) for ct, cid in cands if ct <= t),
                default=None,
            )
            fwd = min(
                ((ct - t, cid) for ct, cid in cands if ct >= t),
                default=None,
            )
            if direction == "backward":
                pick = (back[0], -back[1]) if back else None
            elif direction == "forward":
                pick = fwd
            else:  # nearest: backward wins ties
                if back and (not fwd or back[0] <= fwd[0]):
                    pick = (back[0], -back[1])
                else:
                    pick = fwd
            if pick and (tolerance is None or pick[0] <= tolerance):
                out[eid] = (pick[1], pick[0])
            else:
                out[eid] = (None, None)
        return out

    for direction in ("backward", "forward", "nearest"):
        got = {
            r["event_id"]: (r["asof_event_id"], r["gap_us"])
            for r in asof_join(ev, direction=direction).collect()
        }
        assert got == brute(direction), direction
    got_tol = {
        r["event_id"]: (r["asof_event_id"], r["gap_us"])
        for r in asof_join(
            ev, direction="nearest", tolerance_us=300
        ).collect()
    }
    assert got_tol == brute("nearest", tolerance=300)


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


def test_approx_sketches_bound_error(spark, sf_dir):
    """HLL distinct and GK percentiles must land within sketch error
    of the exact operators on the same data."""
    from py_etl_pipeline_woocommerce_spark.catalog import load_table
    from py_etl_pipeline_woocommerce_spark.operators.temporal import (
        daily_active_users,
        daily_active_users_approx,
        value_percentiles,
        value_percentiles_approx,
    )

    events = load_table(spark, sf_dir, "events")
    exact = {r.day_us: r.n_users for r in daily_active_users(events).collect()}
    approx = {
        r.day_us: r.approx_users
        for r in daily_active_users_approx(events, rsd=0.05).collect()
    }
    assert set(exact) == set(approx)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(3, 0.15 * n), (day, n, approx[day])

    # percentile_approx returns actual data points; the guarantee is on
    # RANK accuracy, not value distance (tails can be sparse). Check
    # each sketch output's empirical rank is within epsilon of target.
    vals_by_type: dict[str, list[float]] = {}
    for r in events.select("event_type", "value").collect():
        vals_by_type.setdefault(r.event_type, []).append(r.value)
    ap = {r.event_type: r for r in value_percentiles_approx(events).collect()}
    assert set(vals_by_type) == set(ap)
    for t, vals in vals_by_type.items():
        vals.sort()
        n = len(vals)
        for p, target in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            v = getattr(ap[t], p)
            rank = sum(1 for x in vals if x <= v) / n
            assert abs(rank - target) <= 0.05 + 1.0 / n, (t, p, rank, target)


def test_fill_missing_days_zero_fills(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import fill_missing_days

    day_ns = 86_400_000_000_000
    events = spark.createDataFrame(
        [(1, 0 * day_ns, 1, "click", 1.0, "{}"),
         (2, 2 * day_ns, 2, "click", 2.0, "{}")],   # day 1 missing
        "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string",
    )
    rows = {r.day_us // 86_400_000_000: r for r in fill_missing_days(events).collect()}
    assert sorted(rows) == [0, 1, 2]
    assert rows[1].n_events == 0 and rows[1].total_value == 0.0
    assert rows[2].n_events == 1 and rows[2].total_value == 2.0


def test_rolling_active_users_window(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import rolling_active_users

    day_ns = 86_400_000_000_000
    events = spark.createDataFrame(
        [(1, 0 * day_ns, 1, "click", 1.0, "{}"),
         (2, 3 * day_ns, 2, "click", 1.0, "{}"),
         (3, 3 * day_ns, 1, "view", 1.0, "{}"),
         (4, 20 * day_ns, 3, "view", 1.0, "{}")],
        "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string",
    )
    out = {r.day_us // 86_400_000_000: r.active_users
           for r in rolling_active_users(events, window_days=7).collect()}
    # day 0: just user 1; day 3: users 1,2 (user1 counted once though
    # seen twice); day 20 outside any earlier window: just user 3
    assert out == {0: 1, 3: 2, 20: 1}


def test_ohlc_bars_hand_computed(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import ohlc_bars

    d = DAY_US
    ev = _ev(
        spark,
        [
            (1, 10, 1, "trade", 5.0),          # day 0: open
            (2, 20, 1, "trade", 9.0),          # high
            (3, 30, 1, "trade", 1.0),          # low
            (4, 40, 1, "trade", 7.0),          # close
            (5, d + 5, 1, "trade", 3.0),       # day 1: single event
            (6, 25, 1, "view", 2.0),           # other type, day 0
        ],
    )
    out = {
        (r.event_type, r.bar_start_us): r for r in ohlc_bars(ev).collect()
    }
    b = out[("trade", 0)]
    assert (b.open_value, b.high_value, b.low_value, b.close_value) == (
        5.0, 9.0, 1.0, 7.0,
    )
    assert b.n_events == 4 and b.total_value == pytest.approx(22.0)
    b1 = out[("trade", d)]
    assert (b1.open_value, b1.close_value, b1.n_events) == (3.0, 3.0, 1)
    assert out[("view", 0)].open_value == 2.0


def test_ohlc_tie_at_same_microsecond_breaks_on_event_id(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import ohlc_bars

    ev = _ev(
        spark,
        [(2, 100, 1, "t", 8.0), (1, 100, 1, "t", 3.0), (3, 100, 1, "t", 6.0)],
    )
    b = ohlc_bars(ev).collect()[0]
    assert b.open_value == 3.0 and b.close_value == 6.0  # by event_id order


def test_value_histogram_bins(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import value_histogram

    ev = _ev(
        spark,
        [
            (1, 0, 1, "t", 0.0),
            (2, 0, 1, "t", 4.99),
            (3, 0, 1, "t", 5.0),
            (4, 0, 1, "t", 12.5),
            (5, 0, 1, "t", -0.1),  # negative lands in bin -1
        ],
    )
    out = {r.bin: r for r in value_histogram(ev).collect()}
    assert out[0].n_events == 2 and out[0].max_value == 4.99
    assert out[1].n_events == 1 and out[1].bin_low == 5.0
    assert out[2].n_events == 1
    assert out[-1].n_events == 1 and out[-1].bin_low == -5.0


def test_event_value_summary_defaults_to_mergeable_sketch(spark, sf_dir):
    # The pipeline-facing surface must pick the sketch path by default,
    # and the sketch plan must be a TWO-STAGE aggregate (partial
    # map-side summaries merged at the reduce side) — the property
    # that keeps per-group memory bounded at 100 TB.
    import contextlib
    import io

    from py_etl_pipeline_woocommerce_spark.catalog import load_table
    from py_etl_pipeline_woocommerce_spark.operators.temporal import (
        event_value_summary,
    )

    events = load_table(spark, sf_dir, "events")
    df = event_value_summary(events)
    assert df.columns == ["event_type", "p50", "p90", "p99"]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "partial_percentile_approx" in p, p  # map-side partial sketch
    # exact twin keeps the same schema for drop-in verification
    assert event_value_summary(events, exact=True).columns == df.columns


def test_dau_sketch_rollup_bounds_error_and_counts_cross_day_repeats(spark, sf_dir):
    from py_etl_pipeline_woocommerce_spark.catalog import load_table
    from py_etl_pipeline_woocommerce_spark.operators.temporal import (
        DAY_US,
        _ts_us,
        dau_sketch_rollup,
    )
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    got = {r["window_start_us"]: r for r in dau_sketch_rollup(events).collect()}
    # exact distinct users per 7-day window
    e = _ts_us(events)
    win = (F.col("t_us") / (7 * DAY_US)).cast("bigint")
    exact = {
        r["w"] * 7 * DAY_US: r["n"]
        for r in e.groupBy(win.alias("w"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for w, r in got.items():
        # HLL at default lgK=12 is well under 5% on these cardinalities
        assert abs(r["distinct_users"] - exact[w]) <= max(2, 0.05 * exact[w])
        # merged sketch must NOT double-count cross-day repeat users
        assert r["distinct_users"] <= r["summed_daily"]


def test_session_window_agg_matches_hand_rolled_sessionize(spark, sf_dir):
    from py_etl_pipeline_woocommerce_spark.catalog import load_table
    from py_etl_pipeline_woocommerce_spark.operators.events import session_window_agg
    from py_etl_pipeline_woocommerce_spark.operators.sessionize import sessionize

    events = load_table(spark, sf_dir, "events")
    built_in = session_window_agg(events)
    hand = sessionize(events)
    # same session set: (user, start, n_events) triples line up exactly
    b = {(r["user_id"], r["start_us"], r["n_events"]) for r in built_in.collect()}
    h = {(r["user_id"], r["start_us"], r["n_events"]) for r in hand.collect()}
    assert b == h


def _gap_events(spark):
    # type A observed on days 0, 3 (values 10, 40); type B only day 1
    day = 86_400_000_000_000  # ns
    rows = [
        (1, 0 * day, 1, "A", 10.0),
        (2, 3 * day, 1, "A", 40.0),
        (3, 1 * day, 2, "B", 7.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )


def test_fill_missing_days_locf_carries_forward(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import (
        fill_missing_days_locf,
    )

    out = {
        (r["event_type"], r["day_us"] // 86_400_000_000): r
        for r in fill_missing_days_locf(_gap_events(spark)).collect()
    }
    assert len(out) == 8  # 4-day spine x 2 types
    assert out[("A", 0)]["total_value"] == 10.0
    assert out[("A", 1)]["total_value"] == 10.0  # carried
    assert out[("A", 2)]["total_value"] == 10.0  # carried
    assert out[("A", 3)]["total_value"] == 40.0
    assert out[("B", 0)]["total_value"] is None  # nothing to carry yet
    assert out[("B", 2)]["total_value"] == 7.0  # carried
    assert out[("B", 2)]["n_events"] == 0


def test_fill_missing_days_interp_blends_between_neighbors(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import (
        fill_missing_days_interp,
    )

    out = {
        (r["event_type"], r["day_us"] // 86_400_000_000): r["total_value"]
        for r in fill_missing_days_interp(_gap_events(spark)).collect()
    }
    assert out[("A", 0)] == 10.0
    assert out[("A", 1)] == 20.0  # 10 + (40-10) * 1/3
    assert out[("A", 2)] == 30.0
    assert out[("A", 3)] == 40.0
    # B has a single observation: no pair to interpolate outside it
    assert out[("B", 1)] == 7.0
    assert out[("B", 0)] is None and out[("B", 3)] is None


def test_asof_join_forward_picks_next_event(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import asof_join

    us = 1000  # ns per us
    rows = [  # (event_id, ts_ns, user, type, value)
        (1, 100 * us, 1, "click", 0.0),
        (2, 200 * us, 1, "purchase", 0.0),
        (3, 300 * us, 1, "click", 0.0),
        (4, 50 * us, 2, "purchase", 0.0),   # no click before, click after
        (5, 90 * us, 2, "click", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    back = {r["event_id"]: r for r in asof_join(ev).collect()}
    fwd = {
        r["event_id"]: r for r in asof_join(ev, direction="forward").collect()
    }
    # user 1 purchase@200: backward -> click@100, forward -> click@300
    assert back[2]["asof_event_id"] == 1 and back[2]["gap_us"] == 100
    assert fwd[2]["asof_event_id"] == 3 and fwd[2]["gap_us"] == 100
    # user 2 purchase@50: nothing before, click@90 after
    assert back[4]["asof_event_id"] is None and back[4]["gap_us"] is None
    assert fwd[4]["asof_event_id"] == 5 and fwd[4]["gap_us"] == 40


def test_funnel_window_drops_late_conversions(spark):
    from py_etl_pipeline_woocommerce_spark.operators.events import funnel_steps

    us = 1000
    day = 86_400_000_000
    rows = [
        # user 1 converts quickly; user 2's purchase is 2 days late
        (1, 0, 1, "view", 0.0),
        (2, 100 * us, 1, "click", 0.0),
        (3, 200 * us, 1, "purchase", 0.0),
        (4, 0, 2, "view", 0.0),
        (5, 100 * us, 2, "click", 0.0),
        (6, (2 * day + 100) * us, 2, "purchase", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    plain = {r["stage"]: r["n_users"] for r in funnel_steps(ev).collect()}
    windowed = {
        r["stage"]: r["n_users"]
        for r in funnel_steps(ev, max_gap_us=day).collect()
    }
    assert plain == {"view": 2, "click": 2, "purchase": 2}
    assert windowed == {"view": 2, "click": 2, "purchase": 1}


def test_time_gaps_flags_only_silences_beyond_threshold(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import time_gaps

    ev = _ev(
        spark,
        [
            (1, 0, 1, "hb", 0.0),
            (2, 100, 1, "hb", 0.0),
            (3, 100, 2, "hb", 0.0),      # tie at same µs: 0-gap, never flags
            (4, 5_100, 2, "hb", 0.0),    # 5000 µs silence
            (5, 5_200, 1, "hb", 0.0),
            (6, 400, 1, "other", 0.0),   # other type: its own chain
        ],
    )
    got = {
        (r.event_type, r.gap_start_us, r.gap_end_us, r.gap_us)
        for r in time_gaps(ev, min_gap_us=1_000).collect()
    }
    assert got == {("hb", 100, 5_100, 5_000)}


def test_time_gaps_coarse_mode_surfaces_long_gaps(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import time_gaps

    ev = _ev(
        spark,
        [
            (1, 0, 1, "hb", 0.0),
            (2, 100, 1, "hb", 0.0),      # same 1000-µs bucket as event 1
            (3, 10_000, 1, "hb", 0.0),   # ~9.9 ms silence
            (4, 10_050, 1, "hb", 0.0),
        ],
    )
    got = {
        (r.event_type, r.gap_start_us, r.gap_end_us, r.gap_us)
        for r in time_gaps(ev, min_gap_us=5_000, coarse_us=1_000).collect()
    }
    # bucket-start to bucket-start: the true 9900-µs gap reports as
    # the 10000-µs bucket delta
    assert got == {("hb", 0, 10_000, 10_000)}
    # gaps under the threshold never flag at coarse grain either
    assert time_gaps(ev, min_gap_us=20_000, coarse_us=1_000).count() == 0


def test_merge_intervals_unions_overlapping_spans(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import merge_intervals

    ev = _ev(
        spark,
        [
            (1, 0, 7, "a", 0.0),
            (2, 50, 7, "b", 0.0),     # overlaps [0,100): extends to 150
            (3, 150, 7, "c", 0.0),    # touches end 150 -> same island
            (4, 400, 7, "d", 0.0),    # new island
            (5, 0, 8, "e", 0.0),      # other user independent
        ],
    )
    rows = {
        (r.user_id, r.island): (r.start_us, r.end_us, r.n_events, r.covered_us)
        for r in merge_intervals(ev, ttl_us=100).collect()
    }
    assert rows == {
        (7, 1): (0, 250, 3, 250),
        (7, 2): (400, 500, 1, 100),
        (8, 1): (0, 100, 1, 100),
    }


def test_m4_downsample_keeps_bucket_extrema(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import m4_downsample

    ev = _ev(
        spark,
        [
            (1, 0, 1, "m", 5.0),
            (2, 10, 1, "m", 1.0),    # bucket 0 min value
            (3, 20, 1, "m", 9.0),    # bucket 0 max value + last
            (4, 60, 1, "m", 4.0),
            (5, 100, 1, "m", 7.0),   # t == t1 lands in last bucket
        ],
    )
    out = {r.bucket: r for r in m4_downsample(ev, n_buckets=2).collect()}
    b0, b1 = out[0], out[1]
    assert (b0.t_first_us, b0.v_first, b0.t_last_us, b0.v_last) == (0, 5.0, 20, 9.0)
    assert (b0.v_min, b0.v_max, b0.n_events) == (1.0, 9.0, 3)
    assert (b1.t_first_us, b1.t_last_us, b1.n_events) == (60, 100, 2)


def test_ks_drift_detects_distribution_shift(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import ks_drift

    ev = _ev(
        spark,
        [
            # type "same": identical value sets before/after the cut
            (1, 0, 1, "same", 1.0),
            (2, 10, 1, "same", 2.0),
            (3, 1_000, 1, "same", 1.0),
            (4, 1_010, 1, "same", 2.0),
            # type "shift": disjoint supports -> D = 1
            (5, 0, 2, "shift", 1.0),
            (6, 10, 2, "shift", 2.0),
            (7, 1_000, 2, "shift", 10.0),
            (8, 1_010, 2, "shift", 20.0),
        ],
    )
    out = {r.event_type: r for r in ks_drift(ev, cut_us=500).collect()}
    assert out["same"].ks_d == 0.0 and not out["same"].drifted
    assert out["shift"].ks_d == 1.0 and out["shift"].drifted
    assert (out["shift"].n_before, out["shift"].n_after) == (2, 2)


def test_dayn_retention_counts_eligibility_and_returns(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import dayn_retention

    D = DAY_US
    ev = _ev(
        spark,
        [
            # user 1: first day 0, returns day 1; data spans to day 3
            (1, 0, 1, "a", 0.0),
            (2, 1 * D + 5, 1, "a", 0.0),
            # user 2: first day 0, never returns
            (3, 10, 2, "a", 0.0),
            # user 3: first day 2 -> eligible for D1 (3 <= 3), not D3
            (4, 2 * D, 3, "a", 0.0),
            (5, 3 * D, 3, "a", 0.0),   # returns on day 3 = its D1
        ],
    )
    out = {r.offset_days: r for r in dayn_retention(ev, offsets=(1, 3)).collect()}
    d1 = out[1]
    assert (d1.n_eligible, d1.n_retained) == (3, 2)
    assert d1.retention == round(2 / 3, 6)
    d3 = out[3]  # only users 1 and 2 eligible (first_day 0, 0+3 <= 3)
    assert (d3.n_eligible, d3.n_retained) == (2, 0)


def test_cusum_changepoint_locates_mean_shift(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import (
        cusum_changepoint,
    )

    D = DAY_US
    rows = []
    eid = 0
    # type "shift": level 10 for days 0-4, level 50 for days 5-9
    for day in range(10):
        eid += 1
        v = 10.0 if day < 5 else 50.0
        rows.append((eid, day * D + 1, 1, "shift", v))
    # type "flat": constant level -> peak at interior, height tiny
    for day in range(10):
        eid += 1
        rows.append((eid, day * D + 1, 2, "flat", 7.0))
    out = {r.event_type: r for r in cusum_changepoint(_ev(spark, rows)).collect()}
    s = out["shift"]
    # CUSUM peaks at the last pre-shift day (day 4)
    assert s.cp_day_us == 4 * D and s.n_days == 10
    # |n*prefix - t*S| at t=5: |10*50 - 5*300| = 1000 -> /n = 100
    assert s.cusum_peak == 100.0
    f = out["flat"]
    assert f.cusum_peak == 0.0
    assert f.cp_day_us == 0  # all-zero stats tie-break to the earliest day


def test_trend_fit_recovers_exact_line(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import trend_fit

    D = DAY_US
    rows = []
    eid = 0
    # type "line": daily total = 2*day + 10 exactly (value per single event)
    for day in range(5):
        eid += 1
        rows.append((eid, day * D, 1, "line", 2.0 * day + 10.0))
    # type "flat": constant 5 -> slope 0, r2 NULL (den_y = 0)
    for day in range(4):
        eid += 1
        rows.append((eid, day * D, 2, "flat", 5.0))
    out = {r.event_type: r for r in trend_fit(_ev(spark, rows)).collect()}
    line = out["line"]
    assert line.n_days == 5
    # x is the absolute epoch day, but slope/r2 are shift-invariant
    assert line.slope == 2.0 and line.r2 == 1.0
    # intercept is at epoch day 0: y = 2x + 10 with x0 = epoch day of t=0
    x0 = 0  # _ev uses µs offsets from epoch, so day_idx starts at 0
    assert line.intercept == 10.0 - 2.0 * x0
    flat = out["flat"]
    assert flat.slope == 0.0 and flat.r2 is None


def test_trend_fit_single_day_yields_nulls(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import trend_fit

    out = trend_fit(_ev(spark, [(1, 5, 1, "one", 3.0)])).collect()[0]
    assert out.n_days == 1
    assert out.slope is None and out.r2 is None


def test_user_streaks_gaps_and_islands(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import user_streaks

    D = DAY_US
    rows = [
        # user 1: days 0,1,2 then 5,6 -> streaks {3, 2}
        (1, 0, 1, "a", 0.0),
        (2, 0 + 5, 1, "a", 0.0),        # same day twice: still one day
        (3, 1 * D, 1, "a", 0.0),
        (4, 2 * D, 1, "a", 0.0),
        (5, 5 * D, 1, "a", 0.0),
        (6, 6 * D, 1, "a", 0.0),
        # user 2: one day only
        (7, 3 * D, 2, "a", 0.0),
    ]
    out = {r.user_id: r for r in user_streaks(_ev(spark, rows)).collect()}
    assert (out[1].n_active_days, out[1].n_streaks, out[1].max_streak) == (5, 2, 3)
    assert (out[2].n_active_days, out[2].n_streaks, out[2].max_streak) == (1, 1, 1)


def test_dau_new_vs_returning_split(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import (
        dau_new_vs_returning,
    )

    D = DAY_US
    rows = [
        (1, 0, 1, "a", 0.0),          # day 0: users 1, 2 both new
        (2, 5, 2, "a", 0.0),
        (3, 1 * D, 1, "a", 0.0),      # day 1: user 1 returning, 3 new
        (4, 1 * D, 3, "a", 0.0),
    ]
    out = {r.day_us // D: r for r in dau_new_vs_returning(_ev(spark, rows)).collect()}
    assert (out[0].n_active, out[0].n_new, out[0].n_returning) == (2, 2, 0)
    assert out[0].new_share == 1.0
    assert (out[1].n_active, out[1].n_new, out[1].n_returning) == (2, 1, 1)
    assert out[1].new_share == 0.5


def test_interarrival_stats_hand_computed(spark):
    from py_etl_pipeline_woocommerce_spark.operators.temporal import (
        interarrival_stats,
    )

    rows = [
        (1, 0, 1, "a", 0.0),
        (2, 100, 1, "a", 0.0),     # delta 100
        (3, 100, 2, "a", 0.0),     # tie at same µs: delta 0
        (4, 400, 2, "a", 0.0),     # delta 300
        (5, 999, 9, "b", 0.0),     # single event: no deltas, no row
    ]
    out = {r.event_type: r for r in interarrival_stats(_ev(spark, rows)).collect()}
    a = out["a"]
    assert a.n_gaps == 3
    assert a.p50_us == 100.0 and a.mean_us == (100 + 0 + 300) // 3
    assert "b" not in out


def _ev_nullable(spark, rows):
    # like _ev but keeps NULL ts (None stays None, no ns multiply)
    return spark.createDataFrame(
        [
            (i, None if t is None else t * 1000, u, ty, v, "{}")
            for i, t, u, ty, v in rows
        ],
        SCHEMA,
    )


def test_ewma_daily_all_nan_first_day_dropped(spark):
    """r12 review find: a type whose FIRST day carries only NaN
    values used to crash element_at under ANSI (empty series); now
    NaN observations are excluded like NULLs, so the day is simply
    absent and the fold seeds on the first real day."""
    from py_etl_pipeline_woocommerce_spark.operators.temporal import (
        DAY_US,
        ewma_daily,
    )

    D = DAY_US  # rows carry µs; DAY_US is already µs
    rows = [
        (1, 0, 1, "a", float("nan")),       # day 0: all NaN -> absent
        (2, 1 * D, 1, "a", 5.0),            # day 1: seeds the fold
        (3, 2 * D, 1, "a", float("nan")),   # mid-series NaN only
        (4, 2 * D + 5, 1, "a", 3.0),        # ...but day 2 has a real obs
    ]
    out = sorted(ewma_daily(_ev(spark, rows)).collect(), key=lambda r: r.day_us)
    assert [r.day_us // DAY_US for r in out] == [1, 2]
    assert out[0].ewma == 5.0
    assert abs(out[1].ewma - (0.2 * 3.0 + 0.8 * 5.0)) < 1e-9


def test_merge_intervals_null_ts_dropped(spark):
    """r12 review find: a NULL-ts event formed a phantom NULL-bounds
    island engine-side (and merged into the LAST island oracle-side);
    now a timeless event carries no presence span."""
    from py_etl_pipeline_woocommerce_spark.operators.temporal import (
        merge_intervals,
    )

    rows = [
        (1, 1_000_000, 7, "a", 0.0),
        (2, None, 7, "a", 0.0),
        (3, 5_000_000_000, 7, "a", 0.0),
    ]
    out = merge_intervals(_ev_nullable(spark, rows), ttl_us=1_000_000).collect()
    assert len(out) == 2
    assert all(r.start_us is not None and r.end_us is not None for r in out)
    assert sum(r.n_events for r in out) == 2


def test_asof_join_null_ts_rows_excluded(spark):
    """r12 review find: NULL-ts rows sorted NULLS-FIRST in Spark but
    NULLS-LAST in the oracle, flipping the carried match; both sides
    now drop them — a timeless event neither matches nor is matched."""
    from py_etl_pipeline_woocommerce_spark.operators.temporal import asof_join

    rows = [
        (1, 100, 7, "click", 0.0),
        (2, None, 7, "purchase", 1.0),   # timeless left: no output row
        (3, 200, 7, "purchase", 2.0),
        (4, None, 7, "click", 0.0),      # timeless right: never matched
    ]
    for direction in ("backward", "forward", "nearest"):
        out = asof_join(
            _ev_nullable(spark, rows), direction=direction
        ).collect()
        assert [r.event_id for r in out] == [3]
        if direction != "forward":
            assert out[0].asof_event_id == 1


def test_dau_new_vs_returning_null_day_group_zero_split(spark):
    """r12 review find: the NULL-day group's is_new comparison is
    NULL, which used to ripple NULL n_new/n_returning/new_share; the
    oracle's CASE ... ELSE 0 semantics now hold engine-side too."""
    from py_etl_pipeline_woocommerce_spark.operators.temporal import (
        dau_new_vs_returning,
    )

    rows = [(1, None, 7, "a", 0.0), (2, None, 8, "a", 0.0)]
    out = dau_new_vs_returning(_ev_nullable(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.day_us is None
    assert (r.n_active, r.n_new, r.n_returning) == (2, 0, 2)
    assert r.new_share == 0.0


def test_equidepth_histogram_degenerate_bins_both_modes(spark):
    """r12 review find: bins<2 fell back to one bucket only on the
    approx branch; exact=True reached ntile(0) and failed. The two
    precision modes must agree on the same degenerate input."""
    from py_etl_pipeline_woocommerce_spark.operators.temporal import (
        equidepth_histogram,
    )

    rows = [(1, 100, 7, "a", 1.0), (2, 200, 7, "a", 9.0)]
    for exact in (False, True):
        out = equidepth_histogram(
            _ev(spark, rows), bins=0, exact=exact
        ).collect()
        assert len(out) == 1
        assert (out[0].bin, out[0].n_events) == (1, 2)
        assert (out[0].lo, out[0].hi) == (1.0, 9.0)
