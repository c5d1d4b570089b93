"""PySpark-native analytics engine with the capabilities of
leonidasmich/py-etl-pipeline-woocommerce (WooCommerce -> warehouse ETL +
dashboard analytics), rebuilt Spark-first for 100 TB scale.

Layers
------
- ``session``    : tuned SparkSession factory (AQE, shuffle sizing, Arrow)
- ``catalog``    : testdata star-schema loader + temp-view registry
- ``functions``  : exact-decimal money math, text/hash column expressions
- ``operators``  : normalize / enrich / refunds / upsert / incremental /
                   dedup / similarity / textstats / sessionize / multimodal
- ``plans``      : woo_model (fct_orders / fct_order_items), dashboard
                   analytics, relational breadth (TPC-H-style)
- ``streaming``  : Structured Streaming event pipeline
"""

__version__ = "0.1.0"
