"""Bucketed warehouse tables — the co-located-join storage layout.

At 100 TB the dominant cost of a fact⋈fact join (lineitem⋈orders) is
shuffling both sides on the join key every query. Bucketing pays that
shuffle ONCE at write time: both tables are hash-partitioned into the
same number of buckets on the join key and sorted within buckets, so
every subsequent join (and groupBy on the key) is exchange-free —
Spark's scan reports the bucket distribution and Catalyst drops the
Exchange nodes entirely.

Rules that make it work (and that ``write_bucketed`` encodes):
- same bucket count on both sides (or an integer multiple with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``),
- join keys exactly the bucket columns,
- ``sortBy`` the same columns so the sort-merge join also skips the
  per-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet warehouse table.

    The input is first repartitioned on the bucket columns with one
    partition per bucket: ``bucketBy`` alone makes EVERY write task
    emit one file per bucket it holds rows for (up to input-partitions
    x n_buckets files — the classic bucketed-write small-file
    explosion); pre-hashing on the same columns lands each bucket's
    rows in exactly one task, so the table materializes as n_buckets
    files per partition tree."""
    writer = (
        df.repartition(n_buckets, *[df[c] for c in bucket_cols])
        .write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
