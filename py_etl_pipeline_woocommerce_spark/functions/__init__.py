"""Column-expression library (all JVM-side, whole-stage-codegen safe)."""

from .money import dec_money, dec_rate, disc_price, gross_price, money, tax_amount
from .text import norm_text, token_count_expr, tokens_expr

__all__ = [
    "dec_money",
    "dec_rate",
    "disc_price",
    "gross_price",
    "money",
    "norm_text",
    "tax_amount",
    "token_count_expr",
    "tokens_expr",
]
