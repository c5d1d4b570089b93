"""Exact-decimal money arithmetic.

The reference (``/root/reference/src/etl/transform/normalize_orders.py:6``,
``_f()``) coerces money to Python floats; on a 100 TB cluster
float-summation order is nondeterministic across partitions, so we do
all money aggregation in DECIMAL (exact, associative, overflow-safe to
precision 38) and only cast to DOUBLE at the output boundary. This
also makes results bit-identical to any ANSI-SQL engine (the DuckDB
correctness oracle) regardless of partitioning / shuffle order.

Input money columns in the testdata are 2-decimal doubles; rates
(discount/tax) are 2-decimal fractions < 10. Casting double ->
DECIMAL rounds to the nearest 2-dp value, which is exact here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 2-dp money; precision 18 holds per-row values up to 10^16 dollars.
MONEY = "decimal(18,2)"
#: 2-dp rate in [0, 9.99] — tax / discount fractions.
RATE = "decimal(4,2)"


def dec_money(col: Column | str) -> Column:
    return F.col(col).cast(MONEY) if isinstance(col, str) else col.cast(MONEY)


def dec_rate(col: Column | str) -> Column:
    return F.col(col).cast(RATE) if isinstance(col, str) else col.cast(RATE)


def money(col: Column) -> Column:
    """Output boundary: exact decimal -> double (deterministic)."""
    return col.cast("double")


def disc_price(price: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    """price * (1 - discount), exact: the rate casts to DECIMAL(4,2)
    and (1 - rate) widens to DECIMAL(5,2), so the product is
    DECIMAL(18,2) * DECIMAL(5,2) -> DECIMAL(24,4)."""
    return dec_money(price) * (F.lit(1).cast(RATE) - dec_rate(discount))


def gross_price(
    price: str = "l_extendedprice",
    discount: str = "l_discount",
    tax: str = "l_tax",
) -> Column:
    """price * (1 - discount) * (1 + tax), exact to scale 6."""
    return disc_price(price, discount) * (F.lit(1).cast(RATE) + dec_rate(tax))


def tax_amount(
    price: str = "l_extendedprice",
    discount: str = "l_discount",
    tax: str = "l_tax",
) -> Column:
    """price * (1 - discount) * tax, exact to scale 6."""
    return disc_price(price, discount) * dec_rate(tax)
