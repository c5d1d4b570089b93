"""Driver-contract smoke: entry() runs, queries()/oracle_sql() line up,
and a sample of oracled queries hash-match DuckDB at sf0.001 (the same
compare the driver runs at sf0.01)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tools.selfcheck import compare, duck_con

SAMPLE = ["kpis", "pricing_summary", "geo_rollup", "dedup_exact", "sessionize"]


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset_of_queries():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles).issubset(set(qs))
    # everything except explicitly-approximate ops has an oracle
    assert set(qs) - set(oracles) == {
        "ann_ivf_topk",
        # sketch estimates are algorithm-specific; their tests bound
        # rank/relative error against the exact twins instead
        "daily_active_users_approx",
        "value_percentiles_approx",
        "dau_sketch_rollup",
        # GK-quantile threshold cut — drift-vs-exact-rank bounded in
        # tests instead
        "dsir_select_threshold",
        # eigenvectors are not SQL-expressible; the linear-algebra
        # contract (orthonormality, numpy parity, reconstruction) is
        # pytest-asserted instead
        "pca_project",
        # greedy set-conditioned selection (each pick depends on the
        # previous picks) — duplicate-demotion + determinism pytest
        "mmr_topk",
        # greedy bin assignment — capacity/waste/determinism pytest
        "pack_bins_bfd",
        # k-means centroids aren't SQL — size/inertia-contract pytest
        "cluster_stats",
        # iterative float power iteration — numpy-parity pytest
        "part_pagerank",
        # bounded-memory sketch, data-dependent decrements —
        # error-bound-vs-exact pytest
        "hot_keys_approx",
    }


@pytest.mark.parametrize("name", SAMPLE)
def test_sample_queries_match_oracle(spark, sf_dir, name):
    con = duck_con(sf_dir)
    sdf = entrymod.queries()[name](spark, sf_dir).toPandas()
    ddf = con.execute(entrymod.oracle_sql()[name]).df()
    assert compare(name, sdf, ddf) == "OK"


def test_session_timezone_never_changes_results(spark, sf_dir):
    """The engine pins UTC internally (catalog.load_table), so a host
    session configured for any other zone must see IDENTICAL results
    from every timestamp-sensitive surface — the 'notebook in New
    York, cluster in UTC' invariant."""
    qs = entrymod.queries()
    names = (
        "date_bounds",
        "revenue_timeseries",
        "ohlc_bars",
        "seasonal_profile",
        "incremental_watermark",
    )

    def run():
        return {
            n: sorted(map(str, qs[n](spark, sf_dir).collect()))
            for n in names
        }

    base = run()
    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = run()
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)
    assert shifted == base
