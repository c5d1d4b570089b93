"""Quantified error contracts for the exact/sketch facade family.

Every operator that ranks, bins, or distinct-counts an unbounded frame
defaults to a mergeable-sketch plan (percentile_approx GK quantiles,
approx_count_distinct HLL) with ``exact=True`` as the oracle path —
one output schema for both. The plan-shape side of the contract is
guarded in test_plan_guards.py (sketch defaults plan zero
unpartitioned windows); THIS file quantifies the value side: how far
the sketch answer may drift from the exact one at sf0.01, in the
style of test_corpus.py::test_dsir_threshold_selection_tracks_exact_rank.

Bounds are deliberately generous versions of the estimators' published
accuracy (GK default accuracy 1/10000; HLL default rsd 5%) so they
fail on a broken facade, not on estimator noise.
"""

from __future__ import annotations

import math

import pytest

from py_etl_pipeline_woocommerce_spark.catalog import load_table
from py_etl_pipeline_woocommerce_spark.operators import (
    corpus,
    events as events_ops,
    temporal,
    warehouse,
)
from py_etl_pipeline_woocommerce_spark.plans import relational

from conftest import SF01_DIR


def _rel_err(approx: float, exact: float) -> float:
    if exact == 0:
        return abs(approx)
    return abs(approx - exact) / abs(exact)


def _events(spark):
    return load_table(spark, SF01_DIR, "events")


def _docs(spark):
    return load_table(spark, SF01_DIR, "documents")


def _check_event_value_summary(spark):
    exact = {
        r["event_type"]: r
        for r in temporal.event_value_summary(
            _events(spark), exact=True
        ).collect()
    }
    approx = {
        r["event_type"]: r
        for r in temporal.event_value_summary(_events(spark)).collect()
    }
    assert set(exact) == set(approx) and exact
    for t, e in exact.items():
        a = approx[t]
        for c in e.asDict():
            if c == "event_type":
                continue
            ev, av = e[c], a[c]
            if ev is None or av is None:
                assert ev == av
            elif isinstance(ev, (int, float)):
                # GK at default accuracy lands within a few adjacent
                # order statistics; 10% covers small-group granularity
                assert _rel_err(av, ev) <= 0.10, (t, c, av, ev)


def _check_value_outliers_mad(spark):
    key = lambda r: (r["event_type"], r["t_us"], r["value"])  # noqa: E731
    exact = {
        key(r)
        for r in temporal.value_outliers_mad(
            _events(spark), exact=True
        ).collect()
    }
    approx = {
        key(r) for r in temporal.value_outliers_mad(_events(spark)).collect()
    }
    assert exact and approx
    # a sketch median can only shift flags near the z-cut boundary
    assert len(exact ^ approx) / len(exact) <= 0.05, len(exact ^ approx)


def _check_equidepth_histogram(spark):
    ex = temporal.equidepth_histogram(_events(spark), exact=True).collect()
    ap = temporal.equidepth_histogram(_events(spark)).collect()
    n_by_type_exact: dict[str, int] = {}
    for r in ex:
        n_by_type_exact[r["event_type"]] = (
            n_by_type_exact.get(r["event_type"], 0) + r["n_events"]
        )
    n_by_type_approx: dict[str, int] = {}
    for r in ap:
        n_by_type_approx[r["event_type"]] = (
            n_by_type_approx.get(r["event_type"], 0) + r["n_events"]
        )
    # no rows lost either way
    assert n_by_type_exact == n_by_type_approx and n_by_type_exact
    # each sketch bucket stays near equal depth (ties + GK grid can
    # imbalance buckets, but not collapse them)
    bins = max(r["bin"] for r in ex)
    for r in ap:
        target = n_by_type_approx[r["event_type"]] / bins
        assert r["n_events"] <= 2.0 * target, (r, target)


def _check_profile_table(spark):
    orders = load_table(spark, SF01_DIR, "orders")
    exact = {r["column"]: r for r in warehouse.profile_table(orders, exact=True).collect()}
    approx = {r["column"]: r for r in warehouse.profile_table(orders).collect()}
    assert set(exact) == set(approx) and exact
    for c, e in exact.items():
        a = approx[c]
        # everything except the HLL distinct count is sketch-free and
        # must agree exactly
        for col in ("dtype", "n_rows", "n_nulls", "null_rate", "min_value", "max_value"):
            assert a[col] == e[col], (c, col, a[col], e[col])
        # approx_count_distinct default rsd = 5%; allow 3 sigma
        assert _rel_err(a["n_distinct"], e["n_distinct"]) <= 0.15, (
            c,
            a["n_distinct"],
            e["n_distinct"],
        )


def _check_user_overlap(spark):
    key = lambda r: (r["type_a"], r["type_b"])  # noqa: E731
    exact = {key(r): r for r in events_ops.user_overlap(_events(spark), exact=True).collect()}
    approx = {key(r): r for r in events_ops.user_overlap(_events(spark)).collect()}
    assert set(exact) == set(approx) and exact
    for k, e in exact.items():
        a = approx[k]
        for col in ("n_a", "n_b", "n_both"):
            assert _rel_err(a[col], e[col]) <= 0.15, (k, col, a[col], e[col])
        # jaccard is a ratio of two HLL estimates (inclusion-
        # exclusion numerator): absolute, not relative, bound
        assert abs(a["jaccard"] - e["jaccard"]) <= 0.10, (k, a, e)


def _check_quality_percentile_by_source(spark):
    exact = {
        r["doc_id"]: r["quality_pctile"]
        for r in corpus.quality_percentile_by_source(
            _docs(spark), exact=True
        ).collect()
    }
    approx = {
        r["doc_id"]: r["quality_pctile"]
        for r in corpus.quality_percentile_by_source(_docs(spark)).collect()
    }
    assert set(exact) == set(approx) and exact
    diffs = [abs(approx[d] - exact[d]) for d in exact]
    # 99-point GK grid quantizes to 1%, and at sf0.01's ~50 docs
    # per source the exact rank grid itself is ~2% — so the observed
    # mean drift is ~one rank position (0.021 measured)
    assert max(diffs) <= 0.08, max(diffs)
    assert sum(diffs) / len(diffs) <= 0.03


def _check_rfm_segments(spark):
    exact = {
        r["cust_id"]: r for r in relational.rfm_segments(spark, SF01_DIR, exact=True).collect()
    }
    approx = {
        r["cust_id"]: r for r in relational.rfm_segments(spark, SF01_DIR).collect()
    }
    assert set(exact) == set(approx) and exact
    agree = 0
    for cid, e in exact.items():
        a = approx[cid]
        for col in ("r_score", "f_score", "m_score"):
            # quantile-boundary ties move a customer at most one
            # quartile in either direction
            assert abs(a[col] - e[col]) <= 1, (cid, col, a[col], e[col])
        if all(a[c] == e[c] for c in ("r_score", "f_score", "m_score")):
            agree += 1
    # frequency is a small-integer count with heavy quartile-
    # boundary ties, so full-triple agreement saturates below 1
    # (0.788 measured at sf0.01); each score stays within one step
    assert agree / len(exact) >= 0.70, agree / len(exact)


def _check_perplexity_bucket_mix(spark):
    ex = corpus.perplexity_bucket_mix(_docs(spark), exact=True).collect()
    ap = corpus.perplexity_bucket_mix(_docs(spark)).collect()
    n_exact = sum(r["n_docs"] for r in ex)
    n_approx = sum(r["n_docs"] for r in ap)
    # mass conservation: every doc lands in exactly one decile on
    # both paths
    assert n_exact == n_approx > 0
    assert sum(r["total_tokens"] for r in ex) == sum(
        r["total_tokens"] for r in ap
    )
    # sketch deciles are only near-equal (score ties share a decile)
    target = n_approx / 10
    for r in ap:
        assert r["n_docs"] <= 2.0 * target, (r["decile"], r["n_docs"], target)
    shares = [r["token_share"] for r in ap]
    assert abs(sum(shares) - 1.0) <= 1e-3


def _check_conversion_latency(spark):
    e = temporal.conversion_latency(_events(spark), exact=True).first()
    a = temporal.conversion_latency(_events(spark)).first()
    for col in e.asDict():
        ev, av = e[col], a[col]
        if isinstance(ev, float) and not math.isnan(ev):
            assert _rel_err(av, ev) <= 0.10, (col, av, ev)
        else:
            assert av == ev, (col, av, ev)


FACADES = {
    "event_value_summary": _check_event_value_summary,
    "value_outliers_mad": _check_value_outliers_mad,
    "equidepth_histogram": _check_equidepth_histogram,
    "profile_table": _check_profile_table,
    "user_overlap": _check_user_overlap,
    "quality_percentile_by_source": _check_quality_percentile_by_source,
    "rfm_segments": _check_rfm_segments,
    "perplexity_bucket_mix": _check_perplexity_bucket_mix,
    "conversion_latency": _check_conversion_latency,
}


@pytest.mark.parametrize("facade", sorted(FACADES))
def test_sketch_path_tracks_exact_within_bounds(spark, facade):
    FACADES[facade](spark)
