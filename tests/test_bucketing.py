"""Bucketed co-located joins: the write-once-shuffle-never layout.

The assertion that matters is on the PLAN: joining two tables
bucketed+sorted on the join key must contain NO Exchange (shuffle)
and NO Sort above the scans — that's the 100 TB win bucketing buys.
"""

from __future__ import annotations

import contextlib
import io
import shutil

import pytest
from pyspark.sql import functions as F

from py_etl_pipeline_woocommerce_spark.catalog import load_table
from py_etl_pipeline_woocommerce_spark.sources.bucketing import drop_table, write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(li, "li_bucketed", ["l_orderkey"], n_buckets=8)
    write_bucketed(
        ords.withColumnRenamed("o_orderkey", "l_orderkey"),
        "ord_bucketed",
        ["l_orderkey"],
        n_buckets=8,
    )
    yield "li_bucketed", "ord_bucketed"
    drop_table(spark, "li_bucketed")
    drop_table(spark, "ord_bucketed")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    li_t, ord_t = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(li_t).join(spark.table(ord_t), "l_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # values still correct
        n = joined.count()
        assert n == spark.table(li_t).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_is_shuffle_free(spark, bucketed_tables):
    li_t, _ = bucketed_tables
    agg = spark.table(li_t).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    assert "Exchange" not in _plan(agg)


def test_compact_parquet_bounds_file_count(spark, sf_dir, tmp_path):
    import glob

    from py_etl_pipeline_woocommerce_spark.catalog import load_table
    from py_etl_pipeline_woocommerce_spark.operators.maintenance import compact_parquet

    src = str(tmp_path / "small_files")
    dest = str(tmp_path / "compacted")
    orders = load_table(spark, sf_dir, "orders")
    orders.repartition(20).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 20

    n_files = compact_parquet(spark, src, dest, target_rows_per_file=1000)
    written = glob.glob(f"{dest}/part-*.parquet")
    assert len(written) == n_files < 20
    assert spark.read.parquet(dest).count() == orders.count()


def test_compact_parquet_preserves_hive_partitions(spark, tmp_path):
    """Compacting a key=value-partitioned tree must keep the layout:
    a flat rewrite would silently collapse the directories consumers
    mount (export_shards' documented use) and kill pruning."""
    import glob

    from py_etl_pipeline_woocommerce_spark.operators.maintenance import (
        compact_parquet,
    )

    src = str(tmp_path / "parts_src")
    dest = str(tmp_path / "parts_dest")
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", f"text {i}") for i in range(100)],
        "doc_id long, lang string, text string",
    )
    df.write.partitionBy("lang").parquet(src)
    compact_parquet(spark, src, dest, target_rows_per_file=1000)
    assert sorted(
        p.rsplit("/", 1)[-1] for p in glob.glob(f"{dest}/lang=*")
    ) == ["lang=de", "lang=en"]
    back = spark.read.parquet(dest)
    assert back.count() == 100
    assert back.filter("lang = 'en'").count() == 50


def test_compact_parquet_splits_hot_partition_value(spark, tmp_path):
    """A hot partition value (here ~96% of rows) must be rewritten as
    multiple target-sized files, while a cold value stays at ONE file
    — the per-value salt modulus must neither single-thread the hot
    value nor spray the cold one into n_files shards."""
    import glob

    from py_etl_pipeline_woocommerce_spark.operators.maintenance import (
        compact_parquet,
    )

    src = str(tmp_path / "hot_src")
    dest = str(tmp_path / "hot_dest")
    df = spark.createDataFrame(
        [(i, "hot" if i % 25 else "cold", f"text {i}") for i in range(5000)],
        "doc_id long, lang string, text string",
    )
    df.write.partitionBy("lang").parquet(src)
    compact_parquet(spark, src, dest, target_rows_per_file=1000)
    hot_files = glob.glob(f"{dest}/lang=hot/*.parquet")
    cold_files = glob.glob(f"{dest}/lang=cold/*.parquet")
    assert len(hot_files) >= 2  # 4800 rows / 1000 target → split
    assert len(cold_files) == 1  # 200 rows → exactly one file
    back = spark.read.parquet(dest)
    assert back.count() == 5000
    assert back.filter("lang = 'cold'").count() == 200


def test_chunk_documents_rejects_gapping_stride(spark):
    import pytest as _pytest

    from py_etl_pipeline_woocommerce_spark.operators.packing import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [(1, "en", "a b c")], "doc_id long, lang string, text string"
    )
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, max_tokens=64, stride=100)
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, max_tokens=64, stride=0)
