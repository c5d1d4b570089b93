"""Category enrichment: item rows gain a product category snapshot.

Re-expresses ``/root/reference/src/etl/transform/enrich.py:5-22``
(``enrich_items_with_categories``: per-row dict lookup into a fetched
``{product_id: product}`` map, joining category names with ``" | "``).

Spark-first: the product dimension is a DataFrame and the "lookup" is
a broadcast hash join — no driver-side map, no Python in the loop.
At 100 TB the items fact streams through executors while the product
dim (always orders of magnitude smaller) ships once per executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_items_with_categories(items: DataFrame, part: DataFrame) -> DataFrame:
    """Left-join the product dim; NULL category when product unknown
    (the reference leaves ``category_snapshot = None`` when the lookup
    misses, ``enrich.py:14-17``)."""
    cats = part.select(
        F.col("p_partkey").alias("product_id"),
        F.col("p_type").alias("category_snapshot"),
        F.col("p_brand").alias("brand"),
    )
    return items.join(F.broadcast(cats), "product_id", "left")
