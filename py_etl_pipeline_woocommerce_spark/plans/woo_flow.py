"""End-to-end incremental ingest flow: the Spark twin of the
reference orchestration (``/root/reference/src/etl/orchestration/
flow.py`` incremental_flow + backfill windows).

One run: watermark → paged extract → from_json normalize → category
enrich (broadcast) → refund apply → delete+insert upsert into a
parquet warehouse → watermark advance. Everything between extract and
load is lazy DataFrame lineage — a single job materializes the
warehouse write.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.logging import get_logger
from ..operators.upsert import upsert_df
from ..sources import rest
from ..sources.state import WatermarkStore

log = get_logger(__name__)


def build_facts(
    spark: SparkSession, transport: rest.Transport, since_iso: str
) -> tuple[DataFrame, DataFrame]:
    """Extract + transform since the watermark → (orders, items) with
    categories and refunds applied (flow.py t_process_batch)."""
    raw = rest.fetch_orders_since(spark, transport, since_iso)
    parsed = rest.parse_orders(raw)
    orders = rest.orders_frame(parsed)
    items = rest.items_frame(parsed)

    cats = rest.fetch_products_by_ids(
        spark, transport, items.select("product_id")
    )
    items = items.join(F.broadcast(cats), "product_id", "left")

    refunds = rest.fetch_refunds_for_orders(
        spark, transport, orders.select("order_id")
    )
    order_ref = rest.order_refund_totals(refunds)
    item_ref = rest.item_refund_totals(refunds)

    orders = (
        orders.join(F.broadcast(order_ref), "order_id", "left")
        .withColumn("refund_total", F.coalesce("refund_total", F.lit(0.0)))
        .withColumn(
            "net_after_refunds", F.col("net_total") - F.col("refund_total")
        )
    )
    items = (
        items.withColumn(
            "variation_id", F.coalesce("variation_id", F.lit(0))
        )
        .join(
            F.broadcast(item_ref),
            ["order_id", "product_id", "variation_id"],
            "left",
        )
        .withColumn(
            "refunded_quantity", F.coalesce("refunded_quantity", F.lit(0))
        )
        .withColumn(
            "refunded_total", F.coalesce("refunded_total", F.lit(0.0))
        )
    )
    return orders, items


def _upsert_table(
    spark: SparkSession, batch: DataFrame, path: str, keys: list[str]
) -> None:
    """Delete+insert upsert into a parquet table dir (the local-mode
    stand-in for MERGE INTO an Iceberg/Delta table; duckdb_client.py
    semantics)."""
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        merged = upsert_df(existing, batch, keys)
    else:
        merged = batch
    # Two-step write: the merged plan reads from `path`, so it must
    # materialize to a staging dir before `path` is overwritten.
    tmp = f"{path}.__staging__"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(path)
    shutil.rmtree(tmp, ignore_errors=True)

def incremental_run(
    spark: SparkSession,
    transport: rest.Transport,
    state: WatermarkStore,
    warehouse_dir: str,
) -> dict:
    """One incremental cycle (flow.py incremental_flow): returns run
    stats. Idempotent: re-running with an unmoved watermark rewrites
    the same keys (delete+insert), so retries are safe."""
    since = state.get_since()
    log.info("incremental run since=%s", since)
    orders, items = build_facts(spark, transport, since)
    orders = orders.persist()
    items = items.persist()
    n_orders = orders.count()
    n_items = items.count()
    log.info("extracted %d orders / %d items", n_orders, n_items)
    if n_orders:
        _upsert_table(
            spark, orders, os.path.join(warehouse_dir, "fct_orders"), ["order_id"]
        )
        _upsert_table(
            spark,
            items,
            os.path.join(warehouse_dir, "fct_order_items"),
            ["order_id", "product_id", "variation_id"],
        )
        max_date = orders.agg(F.max("order_date")).first()[0]
        nxt = WatermarkStore.advance_from(max_date)
        if nxt:
            state.set_since(nxt)
            log.info("watermark advanced to %s", nxt)
    orders.unpersist()
    items.unpersist()
    return {"since": since, "orders": n_orders, "items": n_items}


def backfill_windows(
    start_iso: str, end_iso: str, window_days: int
) -> list[tuple[str, str]]:
    """Date-range windows for chunked backfill (run.py:106-130)."""
    fmt = "%Y-%m-%dT%H:%M:%S"
    start = datetime.fromisoformat(start_iso)
    end = datetime.fromisoformat(end_iso)
    out = []
    cur = start
    while cur < end:
        nxt = min(cur + timedelta(days=window_days), end)
        out.append((cur.strftime(fmt), nxt.strftime(fmt)))
        cur = nxt
    return out
