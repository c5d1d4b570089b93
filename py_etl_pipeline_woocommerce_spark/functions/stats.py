"""Shared statistical expression helpers."""

from __future__ import annotations

from pyspark.sql import functions as F


def pctl_fn(exact: bool):
    """The engine-wide exact/approx percentile selector: ONE place
    owns the pair so the three query families using it (supplier
    percentiles, daily value percentiles, the temporal facade) can
    never drift on approx accuracy or the double-cast boundary.

    ``exact=True`` is the interpolating ``percentile`` (the oracle
    gate's semantics); the default sketch path is the mergeable GK
    ``percentile_approx`` cast to the same double schema.
    """
    if exact:
        return lambda c, p: F.percentile(c, p)
    return lambda c, p: F.percentile_approx(c, p).cast("double")
