"""Dep-gated Delta Lake routing: the always-on contract tests (loud
failure without delta-spark, parquet default untouched) and the
parity suite that runs only where delta-spark is installed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from py_etl_pipeline_woocommerce_spark.sources.table_format import (
    delta_available,
)

needs_delta = pytest.mark.skipif(
    not delta_available(), reason="delta-spark not installed"
)


def _orders_batch(spark):
    return spark.createDataFrame(
        [
            (1, "1995-01", "O", 10.0),
            (2, "1995-01", "F", 20.0),
            (3, "1995-02", "O", 30.0),
        ],
        "order_id bigint, order_month string, status string, total double",
    )


def test_sql_str_literal_numeric_normalization():
    """The r11 ADVICE item: numpy scalars must render as plain SQL
    numerics (np.float64 subclasses float, so repr() under numpy>=2
    would emit 'np.float64(0.1)'), and non-finite floats have no SQL
    literal form — raise, don't emit 'inf'/'nan'."""
    import numpy as np

    from py_etl_pipeline_woocommerce_spark.sources.table_format import (
        _sql_str_literal,
    )

    assert _sql_str_literal(np.float64(0.1)) == "0.1"
    assert _sql_str_literal(0.5) == "0.5"
    assert _sql_str_literal(3) == "3"
    assert _sql_str_literal(True) == "TRUE"
    assert _sql_str_literal(None) == "NULL"
    # numpy ints/bools/float32 are NOT subclasses of the builtins
    # (the r12 review find: the int branch never fired for np.int64,
    # which fell through to the quoted-string fallback)
    assert _sql_str_literal(np.int64(3)) == "3"
    assert _sql_str_literal(np.int32(-7)) == "-7"
    assert _sql_str_literal(np.bool_(True)) == "TRUE"
    assert _sql_str_literal(np.bool_(False)) == "FALSE"
    assert _sql_str_literal(np.float32(0.5)) == "0.5"
    for bad in (float("nan"), float("inf"), float("-inf"), np.float64("nan")):
        with pytest.raises(ValueError, match="non-finite"):
            _sql_str_literal(bad)


def test_unknown_format_raises(spark, tmp_path):
    from py_etl_pipeline_woocommerce_spark.operators.upsert import (
        upsert_partitioned_parquet,
    )

    with pytest.raises(ValueError, match="table_format"):
        upsert_partitioned_parquet(
            _orders_batch(spark),
            str(tmp_path / "t"),
            "order_month",
            table_format="iceberg",
        )


def test_delta_route_raises_clearly_when_missing(spark, tmp_path):
    if delta_available():
        pytest.skip("delta installed — loud-failure branch unreachable")
    from py_etl_pipeline_woocommerce_spark.operators.upsert import (
        upsert_partitioned_parquet,
    )

    with pytest.raises(ImportError, match="delta-spark"):
        upsert_partitioned_parquet(
            _orders_batch(spark),
            str(tmp_path / "t"),
            "order_month",
            table_format="delta",
        )


def test_parquet_default_unchanged(spark, tmp_path):
    from py_etl_pipeline_woocommerce_spark.operators.upsert import (
        upsert_partitioned_parquet,
    )

    dest = str(tmp_path / "t")
    upsert_partitioned_parquet(_orders_batch(spark), dest, "order_month")
    # second batch touches only 1995-02; 1995-01 rows survive
    b2 = spark.createDataFrame(
        [(9, "1995-02", "O", 99.0)],
        "order_id bigint, order_month string, status string, total double",
    )
    upsert_partitioned_parquet(b2, dest, "order_month")
    got = {
        (r["order_id"], r["order_month"])
        for r in spark.read.parquet(dest).collect()
    }
    assert got == {(1, "1995-01"), (2, "1995-01"), (9, "1995-02")}


@needs_delta
def test_upsert_delta_parity_with_parquet(spark, tmp_path):
    from py_etl_pipeline_woocommerce_spark.operators.upsert import (
        upsert_partitioned_parquet,
    )

    pq_dest = str(tmp_path / "pq")
    dl_dest = str(tmp_path / "dl")
    b1 = _orders_batch(spark)
    b2 = spark.createDataFrame(
        [(9, "1995-02", "O", 99.0)],
        "order_id bigint, order_month string, status string, total double",
    )
    for b in (b1, b2):
        upsert_partitioned_parquet(b, pq_dest, "order_month")
        upsert_partitioned_parquet(
            b, dl_dest, "order_month", table_format="delta"
        )
    pq = {
        tuple(r)
        for r in spark.read.parquet(pq_dest)
        .select("order_id", "order_month", "status", "total")
        .collect()
    }
    dl = {
        tuple(r)
        for r in spark.read.format("delta")
        .load(dl_dest)
        .select("order_id", "order_month", "status", "total")
        .collect()
    }
    assert pq == dl


@needs_delta
def test_merge_rollup_delta_parity(spark, tmp_path, sf_dir):
    from py_etl_pipeline_woocommerce_spark.catalog import load_table
    from py_etl_pipeline_woocommerce_spark.operators.warehouse import (
        daily_rollup_partials,
        merge_rollup_store,
    )

    events = load_table(spark, sf_dir, "events")
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)
    pq_store = str(tmp_path / "pq_store")
    dl_store = str(tmp_path / "dl_store")
    for i, b in enumerate((first, second)):
        merge_rollup_store(spark, pq_store, b, batch_id=i)
        merge_rollup_store(
            spark, dl_store, b, batch_id=i, table_format="delta"
        )
        # replay: the delta txn options must make this a no-op
        merge_rollup_store(
            spark, dl_store, b, batch_id=i, table_format="delta"
        )
    cols = ["day_us", "event_type", "n_events", "total_value_dec"]
    pq = {
        tuple(r) for r in spark.read.parquet(pq_store).select(*cols).collect()
    }
    dl = {
        tuple(r)
        for r in spark.read.format("delta")
        .load(dl_store)
        .select(*cols)
        .collect()
    }
    assert pq == dl


@needs_delta
def test_line_partials_delta_idempotent_append(spark, tmp_path):
    from py_etl_pipeline_woocommerce_spark.operators.dedup import (
        write_line_partials,
    )

    lines = spark.createDataFrame(
        [(1, "h1"), (1, "h2"), (2, "h1")],
        "doc_id bigint, line_hash string",
    )
    dest = str(tmp_path / "lines")
    write_line_partials(lines, "t", batch_id=0, delta_path=dest)
    write_line_partials(lines, "t", batch_id=0, delta_path=dest)  # replay
    got = {
        (r["line_hash"], r["doc_freq"], r["n_occurrences"])
        for r in spark.read.format("delta").load(dest).collect()
    }
    assert got == {("h1", 2, 2), ("h2", 1, 1)}
