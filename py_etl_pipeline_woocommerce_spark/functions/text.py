"""Text column expressions (pure ``pyspark.sql.functions`` — no UDFs).

Everything here has an exact ANSI-SQL twin runnable by the DuckDB
oracle; the twins live next to the queries in ``__spark_entry__``.
NOTE on parity: Spark's ``regexp_replace`` is global by default while
DuckDB's replaces the first match only — oracle SQL must pass the
``'g'`` flag.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_text(col: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics, collapse whitespace, trim.

    The canonical form used by exact dedup and fingerprinting — two
    documents differing only in case/punctuation/whitespace collapse
    to the same normal form.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def tokens_expr(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(norm_text(col), " ")


def token_count_expr(col: Column | str) -> Column:
    """Number of whitespace-separated tokens — 0 for empty AND for
    NULL text: a NULL count would silently drop the row from BOTH
    sides of any downstream ``n_tokens`` threshold (the quality_score
    contract, made uniform here in r9; oracle in lockstep)."""
    n = F.size(tokens_expr(col))
    empty = F.length(norm_text(col)) == 0
    return (
        F.when(empty.isNull() | empty, F.lit(0)).otherwise(n).cast("bigint")
    )


def word_shingles(tokens: Column, n: int) -> Column:
    """Word n-gram shingles as strings: array of ``n``-token joins.

    Expressed with higher-order functions so it stays inside
    whole-stage codegen (no Python in the loop at 100 TB).
    """
    count = F.size(tokens) - (n - 1)
    idx = F.when(count >= 1, F.sequence(F.lit(1), count)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))


def md5_hex(col: Column) -> Column:
    """Lowercase 32-char md5 hex — identical string in Spark & DuckDB."""
    return F.md5(col)
