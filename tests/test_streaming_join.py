"""Stream-stream attribution join: watermarked interval join of two
unbounded streams, verified against the batch twin on the same data.
The time-range condition is what bounds join state — without it Spark
rejects the query — so this also pins that the op stays runnable."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from py_etl_pipeline_woocommerce_spark.sources.schemas import EVENTS_SCHEMA
from py_etl_pipeline_woocommerce_spark.streaming.joins import attribution_join
from py_etl_pipeline_woocommerce_spark.streaming.pipeline import read_event_stream

MIN_NS = 60_000_000_000


def _write_events(path, rows):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.int64()),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
            }
        ),
        path,
    )


def test_attribution_join_matches_batch(spark, tmp_path):
    src = tmp_path / "events_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    base = 1_600_000_000_000_000_000
    rows = [
        # user 10: view then click 5 min later -> match
        (1, base, 10, "view", 0.0),
        (2, base + 5 * MIN_NS, 10, "click", 2.5),
        # user 11: click 90 min after view -> outside 1h lag, no match
        (3, base, 11, "view", 0.0),
        (4, base + 90 * MIN_NS, 11, "click", 9.9),
        # user 12: click BEFORE view -> no match
        (5, base + 10 * MIN_NS, 12, "view", 0.0),
        (6, base, 12, "click", 1.0),
        # user 10 again: second view also precedes the click -> match
        (7, base + 2 * MIN_NS, 10, "view", 0.0),
    ]
    _write_events(f"{src}/part-0.parquet", rows)

    stream = read_event_stream(spark, str(src))
    views = stream.filter(F.col("event_type") == "view")
    clicks = stream.filter(F.col("event_type") == "click")
    out = attribution_join(views, clicks)
    query = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_join")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        query.processAllAvailable()
        got = {
            (r.view_id, r.click_id): r.lag_us
            for r in spark.sql("SELECT * FROM attr_join").collect()
        }
    finally:
        query.stop()

    # batch twin: same operator body on static frames
    batch_events = spark.read.schema(EVENTS_SCHEMA).parquet(str(src))
    expected = {
        (r.view_id, r.click_id): r.lag_us
        for r in attribution_join(
            batch_events.filter(F.col("event_type") == "view"),
            batch_events.filter(F.col("event_type") == "click"),
        ).collect()
    }
    assert got == expected
    assert got == {(1, 2): 5 * 60_000_000, (7, 2): 3 * 60_000_000}


def test_streaming_drops_check_against_stored_index(spark, tmp_path):
    """Two document drops stream in; each micro-batch is flagged
    against the bucketed LSH index written once up front."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq_

    from py_etl_pipeline_woocommerce_spark.operators.dedup import write_lsh_index
    from py_etl_pipeline_woocommerce_spark.sources.bucketing import drop_table
    from py_etl_pipeline_woocommerce_spark.streaming.pipeline import (
        run_stream_dedup_against_index,
    )

    phrase = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(1, phrase, "en", "s"), (2, "unrelated corpus text entirely", "en", "s")],
        "doc_id bigint, text string, lang string, source string",
    )
    write_lsh_index(corpus, "t_stream_lsh", n_buckets=4)

    src = tmp_path / "drops"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def _drop(path, rows):
        pq_.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                    "lang": pa.array(["en"] * len(rows), pa.string()),
                    "source": pa.array(["s"] * len(rows), pa.string()),
                }
            ),
            path,
        )

    _drop(f"{src}/drop-0.parquet", [(10, phrase), (11, "fresh novel content here")])
    try:
        query, sink = run_stream_dedup_against_index(
            spark, str(src), ckpt, "t_stream_lsh", corpus.schema
        )
        try:
            query.processAllAvailable()
            assert sink.rows[(10,)]["is_near_dup"] and sink.rows[(10,)]["dup_of"] == 1
            assert not sink.rows[(11,)]["is_near_dup"]

            _drop(f"{src}/drop-1.parquet", [(12, phrase + " extra")])
            query.processAllAvailable()
            assert sink.rows[(12,)]["is_near_dup"]
            assert sink.batches_seen >= 2
        finally:
            query.stop()
    finally:
        drop_table(spark, "t_stream_lsh_bands")
        drop_table(spark, "t_stream_lsh_shingles")
        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_streaming_drops_strip_against_self_maintaining_line_index(
    spark, tmp_path
):
    """Drops stream in against the stored line index; with the
    default fold, a footer seen ONCE PER DROP (never twice in one)
    starts being stripped once enough drops accumulate — the
    cross-drop boilerplate case per-batch stripping cannot catch."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq_

    from py_etl_pipeline_woocommerce_spark.operators.dedup import (
        write_line_index,
    )
    from py_etl_pipeline_woocommerce_spark.sources.bucketing import drop_table
    from py_etl_pipeline_woocommerce_spark.streaming.pipeline import (
        run_stream_line_strip,
    )

    footer = "copyright acme corp"
    promo = "todays promo banner line"
    corpus = spark.createDataFrame(
        [(1, f"historic body\n{footer}", "en", "s")],
        "doc_id bigint, text string, lang string, source string",
    )
    write_line_index(corpus, "t_stream_li", n_buckets=4, mode="overwrite")

    src = tmp_path / "drops"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def _drop(path, rows):
        pq_.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                    "lang": pa.array(["en"] * len(rows), pa.string()),
                    "source": pa.array(["s"] * len(rows), pa.string()),
                }
            ),
            path,
        )

    # drop 0: footer known from the corpus -> stripped immediately;
    # the promo line is seen for the FIRST time -> kept
    _drop(
        f"{src}/drop-0.parquet",
        [(10, f"fresh content ten\n{footer}\n{promo}")],
    )
    try:
        query, sink = run_stream_line_strip(
            spark, str(src), ckpt, "t_stream_li", corpus.schema, n_buckets=4
        )
        try:
            query.processAllAvailable()
            assert sink.rows[(10,)]["clean_text"] == (
                f"fresh content ten\n{promo}"
            )
            assert sink.rows[(10,)]["n_lines_removed"] == 1

            # drop 1: the promo line's SECOND drop — the fold made the
            # store remember drop 0, so it is now boilerplate
            _drop(
                f"{src}/drop-1.parquet",
                [(11, f"other content eleven\n{promo}")],
            )
            query.processAllAvailable()
            assert sink.rows[(11,)]["clean_text"] == "other content eleven"
            assert sink.rows[(11,)]["n_lines_removed"] == 1
            assert sink.batches_seen >= 2
        finally:
            query.stop()
    finally:
        drop_table(spark, "t_stream_li_lines")
        shutil.rmtree("spark-warehouse", ignore_errors=True)
