"""Dashboard facade: one call returns every page frame, windows
default from the data's own date bounds (app.py parity)."""

from __future__ import annotations

from py_etl_pipeline_woocommerce_spark.plans.dashboard import dashboard_payload


def test_dashboard_payload_returns_all_frames(spark, sf_dir):
    frames = dashboard_payload(spark, sf_dir)
    assert set(frames) == {
        "date_bounds",
        "kpis",
        "revenue_timeseries",
        "top_products",
        "category_mix",
        "geo_rollup",
        "cohort_retention",
    }
    for name, df in frames.items():
        assert df.count() > 0, name


def test_dashboard_payload_respects_window(spark, sf_dir):
    frames = dashboard_payload(spark, sf_dir, "1995-01-01", "1995-12-31")
    days = [r["d"] for r in frames["revenue_timeseries"].collect()]
    assert days and min(days) >= "1995-01-01" and max(days) <= "1995-12-31"
    # a narrower window strictly reduces the KPI order count
    all_k = dashboard_payload(spark, sf_dir)["kpis"].first()["orders_cnt"]
    win_k = frames["kpis"].first()["orders_cnt"]
    assert 0 < win_k < all_k
