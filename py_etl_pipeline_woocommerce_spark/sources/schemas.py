"""Explicit schemas for every surface the engine reads or writes.

Mirrors the reference warehouse DDL (``/root/reference/sql/ddl.sql``):
``fct_orders`` keeps money as DOUBLE and PK ``order_id``;
``fct_order_items`` is the flattened line-item grain. The raw-ingest
schemas describe the driver testdata star schema so streaming /
file-source readers can declare schema up front — at 100 TB you never
want ``inferSchema`` touching the data twice.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- raw

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # stored TIMESTAMP(NANOS) in parquet; read as epoch-ns BIGINT
        # (see session.py nanosAsLong). File/JSON stream sources use
        # this LongType directly.
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

#: JSON payload carried in ``events.props`` (the engine's analogue of
#: the reference's raw WooCommerce order JSON).
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])

# ------------------------------------------------------- warehouse DDL

#: ref ddl.sql fct_orders — money DOUBLE, ids BIGINT, PK order_id.
FCT_ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.LongType(), nullable=False),
        T.StructField("order_date", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("customer_id", T.LongType()),
        T.StructField("order_priority", T.StringType()),
        T.StructField("gross_total", T.DoubleType()),
        T.StructField("total_tax", T.DoubleType()),
        T.StructField("net_total", T.DoubleType()),
        T.StructField("refund_total", T.DoubleType()),
        T.StructField("net_after_refunds", T.DoubleType()),
        T.StructField("n_items", T.LongType()),
    ]
)

#: ref ddl.sql fct_order_items — (order_id, product_id, line_number) grain.
FCT_ORDER_ITEMS_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.LongType(), nullable=False),
        T.StructField("product_id", T.LongType()),
        T.StructField("supplier_id", T.LongType()),
        T.StructField("line_number", T.IntegerType()),
        T.StructField("quantity", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("discount", T.DoubleType()),
        T.StructField("tax", T.DoubleType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("return_flag", T.StringType()),
    ]
)

# ------------------------------------------------------- multimodal

#: Opaque media as binary + typed metadata (image/audio/video rows).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), nullable=False),
        T.StructField("modality", T.StringType()),  # image|audio|video
        T.StructField("mime_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

#: Output of the feature-extraction stage (see operators/multimodal.py).
MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), nullable=False),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)
