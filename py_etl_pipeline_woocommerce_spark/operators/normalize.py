"""Normalize raw source rows into the warehouse fact shapes.

Re-expresses ``/root/reference/src/etl/transform/normalize_orders.py``
(pandas row loop over Woo order JSON) as declarative Spark projections:
the reference's ``normalize_orders()`` (``normalize_orders.py:13-77``)
flattens one order JSON into an orders row + N item rows with float
coercion (``_f``, line 6) and date parsing. Here the flattening is a
typed ``select`` — Catalyst prunes unused source columns at the scan
and the whole projection stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.money import disc_price, money


def normalize_orders(orders: DataFrame) -> DataFrame:
    """Typed projection of the raw orders source -> order header rows.

    Mirrors the reference's order-row dict (normalize_orders.py:27-48):
    id/date/status/customer plus money columns and refund placeholders
    (refunds are applied by ``operators.refunds``). ``net_total`` here
    is the pre-refund baseline exactly like the reference's
    ``net_total = total - total_tax`` (line 41) — at this stage tax is
    not yet known (it lives on the items), so the placeholder equals
    the gross; ``plans.woo_model.fct_orders`` computes the real one.
    """
    return orders.select(
        F.col("o_orderkey").alias("order_id"),
        # ISO date string: engine-portable (DATE crosses pandas/Arrow
        # boundaries as different dtypes per engine; ISO strings sort
        # and hash identically everywhere).
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderpriority").alias("order_priority"),
        F.col("o_totalprice").alias("gross_total"),
        F.col("o_totalprice").alias("net_total"),
        F.lit(0.0).alias("refund_total"),
    )


def normalize_items(lineitem: DataFrame) -> DataFrame:
    """Line-item flattening -> one row per order line.

    Mirrors the reference's item-row dict (normalize_orders.py:51-69):
    ids, quantity, price, totals, plus enrichment placeholders
    (``category_snapshot``/refund columns filled by ``enrich``/
    ``refunds``). ``total`` is the discounted extended price, computed
    in exact decimal (see ``functions.money``).
    """
    return lineitem.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("product_id"),
        F.col("l_suppkey").alias("supplier_id"),
        F.col("l_linenumber").cast("int").alias("line_number"),
        # explicit floor: a bare DOUBLE->BIGINT cast TRUNCATES on
        # Spark but ROUNDS (half-even) on DuckDB — floor is identical
        # on both engines, and a fractional weight-based quantity
        # lands deterministically (oracle in lockstep)
        F.floor("l_quantity").cast("bigint").alias("quantity"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
        money(disc_price()).alias("total"),
        F.col("l_returnflag").alias("return_flag"),
    )
