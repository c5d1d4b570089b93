"""Skew-mitigation helpers for 100 TB joins/aggregations.

AQE's skew-join splitting (on in ``session.py``) handles most cases
at runtime; these helpers cover the two places AQE can't: skewed
*aggregation* keys (two-phase salted agg) and skewed *join* keys
where the other side must be replicated per salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def add_salt(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Uniform deterministic salt derived from the row (not rand(), so
    retried tasks produce identical output — required for exactly-once
    sinks)."""
    return df.withColumn(
        SALT_COL,
        F.pmod(F.hash(*df.columns), F.lit(n_salts)).cast("int"),
    )


def replicate_for_salt(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Explode the build side of a skewed join: one copy per salt
    value, so ``fact ⋈ dim`` on ``keys + [SALT_COL]`` spreads a hot
    key across ``n_salts`` reducers."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    fact: DataFrame, dim: DataFrame, keys: list[str], n_salts: int = 16
) -> DataFrame:
    """Skew-proof inner join: salt the fact side, replicate the dim
    side, join on keys+salt, drop the salt."""
    return (
        add_salt(fact, n_salts)
        .join(replicate_for_salt(dim, n_salts), keys + [SALT_COL])
        .drop(SALT_COL)
    )


def salted_sum(
    df: DataFrame, keys: list[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial sum per
    (key, salt), then final sum per key. The first shuffle spreads a
    hot key over ``n_salts`` partitions; the second is tiny."""
    partial = (
        add_salt(df, n_salts)
        .groupBy(*keys, SALT_COL)
        .agg(F.sum(value_col).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias(f"sum_{value_col}"))
