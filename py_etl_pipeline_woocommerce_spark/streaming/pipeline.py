"""Structured Streaming twin of the reference's incremental flow.

The reference polls the WooCommerce REST API since a stored watermark
and upserts each batch (``run.py:140-150`` + ``duckdb_client.py``).
Spark-first, that's a stream: ``readStream`` over an append-only
source, event-time watermark instead of a stored ``since_iso``, a
windowed aggregation with late-data tolerance, and ``foreachBatch``
doing the delete+insert upsert per micro-batch.

All transforms are plain DataFrame ops shared with the batch path
(``operators/events.py``), so batch and streaming stay semantically
identical — one definition, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.timeutil import TS_US_FLOOR

from ..functions.money import dec_money
from ..sources.schemas import EVENTS_SCHEMA


def read_event_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 4,
    schema=None,
) -> DataFrame:
    """File-source stream over a parquet-drop directory (events by
    default; pass ``schema`` for document/CDC drops — ONE place
    defines the source plumbing so options can't drift per stream).

    Declared schema (no inference pass); ``maxFilesPerTrigger`` bounds
    micro-batch size so a backlog replay cannot OOM an executor.
    """
    return (
        spark.readStream.schema(EVENTS_SCHEMA if schema is None else schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def with_event_time(events: DataFrame) -> DataFrame:
    """epoch-ns BIGINT → TIMESTAMP event-time column for watermarking.

    NULL-ts rows are DROPPED here, for every consumer at once: a NULL
    event_time never matches a stream-stream join condition but also
    never satisfies the watermark eviction predicate, so such rows
    accumulate in join/aggregation state FOREVER on a long-running
    stream (the same poison-pill class the stateful ops filter; a row
    with no timestamp carries no event-time signal anyway)."""
    return events.filter(F.col("ts").isNotNull()).withColumn(
        "event_time", F.timestamp_micros(F.expr(TS_US_FLOOR))
    )


def windowed_event_agg(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window count+sum per event_type with late-data bound.

    The watermark is the streaming analogue of the reference's
    ``LOOKBACK_MINUTES`` re-read window (``time.py``): rows later than
    it are dropped, state for closed windows is evicted — bounded
    state at any scale.
    """
    return (
        with_event_time(events)
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec_money("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


class ForeachBatchUpserter:
    """``foreachBatch`` sink with delete+insert upsert semantics.

    Mirrors the reference loader: each micro-batch replaces any
    existing rows sharing its keys (``duckdb_client.py:55-75``). The
    in-memory dict of key→row stands in for the warehouse table in
    tests; at scale the same callable body runs MERGE against an
    Iceberg/Delta table — only the 3 lines in ``_merge`` change.
    """

    def __init__(self, keys: list[str]):
        self.keys = keys
        self.rows: dict[tuple, dict] = {}
        self.batches_seen = 0

    def _merge(self, batch_df: DataFrame) -> None:
        for row in batch_df.collect():  # micro-batch: already aggregated, small
            d = row.asDict()
            self.rows[tuple(d[k] for k in self.keys)] = d

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.batches_seen += 1
        self._merge(batch_df)


def run_stream_to_upsert(
    spark: SparkSession,
    source_path: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> tuple:
    """Wire source → windowed agg → foreachBatch upsert; returns
    (query, upserter). Caller awaits/stops the query."""
    agg = windowed_event_agg(
        read_event_stream(spark, source_path), window, watermark
    )
    upserter = ForeachBatchUpserter(["window_start", "event_type"])
    query = (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(upserter)
        .start()
    )
    return query, upserter


def streaming_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps one row per key and evicts
    key state once the watermark passes — bounded memory on an
    unbounded stream, the streaming twin of ``dedup_exact``. Re-sent
    events (at-least-once sources always re-send) collapse as long as
    the duplicate arrives within the watermark window.
    """
    return (
        with_event_time(events)
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def run_stream_dedup_against_index(
    spark: SparkSession,
    source_path: str,
    checkpoint_dir: str,
    index_prefix: str,
    schema,
    threshold: float = 0.5,
) -> tuple:
    """Streaming daily-drop near-dup: document drops land as files,
    each micro-batch is annotated against the STORED bucketed LSH
    index (``dedup.write_lsh_index``) inside ``foreachBatch``.

    This is the full incremental-corpus shape at scale: the 100 TB
    corpus was tokenized once at ingest; the stream only ever pays
    O(drop) work per batch — band-hash its own docs and join the
    index. ``foreachBatch`` is the right seam because the per-batch
    body is an arbitrary *batch* plan (joins against warehouse
    tables), which pure streaming operators can't express.

    Returns (query, sink) where sink.rows maps doc_id → flag row.
    """
    from ..operators.dedup import dedup_against_index

    stream = read_event_stream(
        spark, source_path, max_files_per_trigger=1, schema=schema
    )
    sink = ForeachBatchUpserter(["doc_id"])

    def check_batch(batch_df: DataFrame, batch_id: int) -> None:
        frames: list = []
        flagged = dedup_against_index(
            batch_df, index_prefix, threshold, persisted_frames=frames
        )
        # the sink's own __call__ does increment-then-merge — don't
        # re-implement its bookkeeping here (r12 review find)
        sink(flagged, batch_id)
        # the sink collected the result; free the shingle frame now or
        # a long-running stream pins one persisted frame per batch.
        for f in frames:
            f.unpersist()

    query = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(check_batch)
        .start()
    )
    return query, sink


def run_stream_line_strip(
    spark: SparkSession,
    source_path: str,
    checkpoint_dir: str,
    index_prefix: str,
    schema,
    min_df: int = 2,
    fold_into_index: bool = True,
    n_buckets: int = 32,
) -> tuple:
    """Streaming daily-drop boilerplate strip: each micro-batch is
    stripped against the STORED line-frequency index
    (``dedup.write_line_index`` — initialize it over the existing
    corpus before starting the stream), and by default its own line
    partials are then appended, making the store SELF-MAINTAINING: a
    footer that appears once per daily drop crosses ``min_df`` after
    enough drops and starts being stripped — the cross-drop detection
    no per-batch strip can do. Per-batch cost is O(drop) (see
    ``strip_against_line_index``); run ``compact_line_index``
    periodically to bound the partial tail.

    ``foreachBatch`` is the seam because the body is a batch plan
    (joins against a warehouse table). The fold is REPLAY-SAFE: each
    micro-batch's append is guarded by a per-batch-id applied marker
    (``write_line_partials`` — the same device as
    ``merge_rollup_store``), so an at-least-once re-delivery finds
    its marker and skips the fold instead of double-counting
    doc_freq. The re-delivered batch's STRIP still re-runs, against a
    store that now already contains the batch's own partials — it can
    strip strictly MORE lines than the first delivery (never fewer),
    and the upsert sink keeps the re-run's rows; the store counts are
    identical either way. The residual crash window (between the
    append and its marker) is the transactional-format seam; a
    from-scratch rebuild is ``write_line_index(...,
    mode="overwrite")``, which also resets the markers.

    Returns (query, sink) where sink.rows maps (doc_id,) → stripped
    row (clean_text + kept/removed counts).
    """
    from ..operators.dedup import strip_against_line_index, write_line_partials

    stream = read_event_stream(
        spark, source_path, max_files_per_trigger=1, schema=schema
    )
    sink = ForeachBatchUpserter(["doc_id"])

    def strip_batch(batch_df: DataFrame, batch_id: int) -> None:
        frames: list = []
        # strip BEFORE folding: the batch's own cross-doc repeats are
        # already counted by strip_against_line_index's batch_df term,
        # so folding first would double-count them for this batch
        sink(
            strip_against_line_index(
                batch_df, index_prefix, min_df, lines_out=frames
            ),
            batch_id,
        )
        if fold_into_index:
            # fold the SAME checkpointed exploded frame the strip just
            # consumed — no second explode+md5 of the drop's text; the
            # n_buckets must match the store's spec (Spark rejects a
            # mismatched append loudly, no silent bucket corruption).
            # batch_id makes the fold idempotent under replay (marker
            # checked/written inside write_line_partials)
            write_line_partials(
                frames[0], index_prefix, n_buckets=n_buckets,
                batch_id=batch_id,
            )
        # drop the reference: the checkpoint blocks are GC-managed,
        # and a long-running stream must not accumulate one per batch
        frames.clear()

    query = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(strip_batch)
        .start()
    )
    return query, sink


def streaming_session_agg(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session aggregation on a STREAM via the built-in
    ``session_window`` — the same grouped-aggregate plan as the batch
    ``operators.events.session_window_agg``, plus a watermark so
    session state for closed sessions is evicted (bounded memory on an
    unbounded stream). One definition of "session", two execution
    modes — the reason the built-in beats hand-rolled lag/cumsum for
    anything that must also run continuously.
    """
    from ..operators.events import _session_window_kernel

    # with_event_time drops NULL-ts rows (the unbounded-state poison
    # documented there); the kernel is session_window_agg's verbatim
    # aggregate — one definition, two execution modes, now literally
    e = with_event_time(stream).select("user_id", "event_time", "value")
    return _session_window_kernel(
        e.withWatermark("event_time", watermark), gap
    )


def streaming_daily_active_sketch(
    events: DataFrame, watermark: str = "2 hours", rsd: float = 0.05
) -> DataFrame:
    """Per-day approximate distinct users on a STREAM — the streaming
    twin of ``temporal.daily_active_users_approx``: HLL++
    (``approx_count_distinct``) inside a watermarked daily window, so
    state per open window is one KB-scale sketch instead of a
    distinct-user set, and closed windows evict. Exact streaming
    distinct would need unbounded per-window state; the sketch is THE
    way DAU is computed on live streams at scale.

    Same estimator and same ``rsd`` as the batch op ⇒ identical
    estimates on identical input (the algorithm is deterministic) —
    the batch-parity test pins that.
    """
    return (
        with_event_time(events)
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "1 day"))
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("window.start").alias("day_start"),
            "approx_users",
            "n_events",
        )
    )


class RollupMergeSink:
    """``foreachBatch`` sink that maintains an on-disk continuous
    aggregate: every micro-batch of raw events folds into the stored
    month-partitioned daily rollup via
    ``warehouse.merge_rollup_store`` — the IDENTICAL code path a
    batch drop uses, so stream- and batch-maintained stores are
    bit-equal (pytest-asserted). Per batch cost is O(batch + touched
    months' partial rows); history is never rescanned. Late events
    within the watermark fold into their (old) day naturally because
    the stored measures are associative partials."""

    def __init__(self, store_path: str):
        self.store_path = store_path
        self.batches_seen = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.warehouse import merge_rollup_store

        self.batches_seen += 1
        # batch_id makes re-delivered micro-batches no-ops (the SUM
        # fold is not idempotent; see merge_rollup_store's marker note)
        merge_rollup_store(
            batch_df.sparkSession, self.store_path, batch_df,
            batch_id=batch_id,
        )


def run_stream_rollup_merge(
    spark: SparkSession,
    source_path: str,
    checkpoint_dir: str,
    store_path: str,
) -> tuple:
    """Wire source → foreachBatch continuous-aggregate maintenance;
    returns (query, sink). Raw events go straight to the sink (no
    pre-aggregation in the stream graph): the merge aggregates
    per-batch inside ``merge_rollup_store``, keeping ALL state in
    the store — restart-safe with zero streaming state beyond the
    source offsets in the checkpoint."""
    stream = read_event_stream(spark, source_path)
    sink = RollupMergeSink(store_path)
    query = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )
    return query, sink


class CdcApplySink:
    """``foreachBatch`` sink that maintains an on-disk current-state
    table from a CDC change stream: every micro-batch folds through
    ``warehouse.cdc_apply_store`` — the IDENTICAL code path a batch
    drop uses. Because the store keeps each row's last applied
    sequence and the fold resolves max-seq over stored ∪ incoming,
    the result is independent of micro-batch boundaries AND of
    out-of-order delivery across batches (split-invariance
    pytest-asserted)."""

    def __init__(self, store_path: str, key: str):
        self.store_path = store_path
        self.key = key
        self.batches_seen = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.warehouse import cdc_apply_store

        self.batches_seen += 1
        cdc_apply_store(
            batch_df.sparkSession, self.store_path, batch_df, self.key
        )


def run_stream_cdc_apply(
    spark: SparkSession,
    source_path: str,
    source_schema,
    checkpoint_dir: str,
    store_path: str,
    key: str,
) -> tuple:
    """Wire a CDC change-file stream → foreachBatch current-state
    maintenance; returns (query, sink). All state lives in the store
    (rows + their last applied seq) — restart-safe with zero
    streaming state beyond source offsets."""
    stream = read_event_stream(
        spark, source_path, max_files_per_trigger=1, schema=source_schema
    )
    sink = CdcApplySink(store_path, key)
    query = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )
    return query, sink


class FirstSeenSink:
    """``foreachBatch`` sink maintaining the on-disk (user, first-day)
    table via ``warehouse.merge_first_seen_store`` — MIN is
    associative, so the stream-maintained store equals the one-shot
    batch fold regardless of micro-batch boundaries or arrival order
    (pytest-asserted). The live new-vs-returning split joins each
    day's actives against this store."""

    def __init__(self, store_path: str):
        self.store_path = store_path
        self.batches_seen = 0

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.warehouse import merge_first_seen_store

        self.batches_seen += 1
        merge_first_seen_store(
            batch_df.sparkSession, self.store_path, batch_df
        )


def run_stream_first_seen(
    spark: SparkSession,
    source_path: str,
    checkpoint_dir: str,
    store_path: str,
) -> tuple:
    """Wire an event stream → foreachBatch first-seen maintenance;
    returns (query, sink). All state is in the store — restart-safe
    with zero streaming state beyond source offsets."""
    stream = read_event_stream(spark, source_path, max_files_per_trigger=1)
    sink = FirstSeenSink(store_path)
    query = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
        .start()
    )
    return query, sink
