"""Refund application: order-level totals + item-level quantities.

Re-expresses ``/root/reference/src/etl/transform/enrich.py:25-77``
(``apply_refunds``: per-row dict lookups into a refunds map keyed by
order then (product_id, variation_id)) and the refunds extractor
``/root/reference/src/etl/extract/refunds.py:6-63`` (accumulates
``refund_total`` per order and qty/total per item key).

In the testdata model a refunded line is one with
``l_returnflag = 'R'`` — the refunds "source" is therefore an
aggregation over the items fact instead of a per-order REST call.
Spark-first: the extractor's driver-side accumulation loop becomes a
partial (map-side combined) groupBy, and the per-row map lookup
becomes a key join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.money import disc_price, money

REFUND_FLAG = "R"


def refund_aggregates(lineitem: DataFrame) -> DataFrame:
    """Per-order refund totals (refunds.py:49-56 builds the same map).

    Output: order_id, refund_total (exact-decimal sum -> double),
    refunded_quantity. Only refunded orders appear — the join side
    coalesces missing orders to 0 like the reference's
    ``refunds_map.get(oid, {})``.
    """
    return (
        lineitem.filter(F.col("l_returnflag") == REFUND_FLAG)
        .groupBy(F.col("l_orderkey").alias("order_id"))
        .agg(
            money(F.sum(disc_price())).alias("refund_total"),
            # floor, not a bare cast: Spark truncates, DuckDB rounds
            F.sum(F.floor("l_quantity").cast("bigint")).alias("refunded_quantity"),
        )
    )


def apply_refunds_orders(orders_base: DataFrame, refunds: DataFrame) -> DataFrame:
    """Join refund totals onto order headers (enrich.py:38-48).

    ``net_after_refunds = net_total - refund_total`` with missing
    refunds coalesced to 0.0 (reference defaults via ``_f``/get).
    ``normalize_orders`` output carries a placeholder
    ``refund_total`` column — dropped before the join so the joined
    frame never holds two ambiguously-named copies.
    """
    base = orders_base
    if "refund_total" in base.columns:
        base = base.drop("refund_total")
    joined = base.join(
        refunds.select("order_id", "refund_total"), "order_id", "left"
    )
    refund = F.coalesce(F.col("refund_total"), F.lit(0.0))
    return joined.withColumn("refund_total", refund).withColumn(
        "net_after_refunds", F.col("net_total") - refund
    )


def apply_refunds_items(items: DataFrame) -> DataFrame:
    """Item-level refunded qty/total (enrich.py:51-75).

    The reference looks each item up by (product_id, variation_id)
    inside its order's refund map; here the refund marker is on the
    line itself, so this is a pure projection — no join, no shuffle.
    """
    is_ref = F.col("return_flag") == REFUND_FLAG
    return items.withColumn(
        "refunded_quantity", F.when(is_ref, F.col("quantity")).otherwise(F.lit(0)).cast("bigint")
    ).withColumn(
        "refunded_total", F.when(is_ref, F.col("total")).otherwise(F.lit(0.0))
    )
