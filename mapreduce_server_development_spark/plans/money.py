"""Shared decimal-money helpers for the relational query modules.

ONE definition of the cross-engine money idiom (see relational.py's
module docstring): doubles are cast to DECIMAL(16,4) before arithmetic
and aggregation (exact for the <=2-decimal generated data), and the
TPC-H revenue expression extprice * (1 - discount) is built from the
same casts in every module — previously copied verbatim into three
files, where a precision tweak to one copy would silently fork the
others.
"""

from __future__ import annotations

from pyspark.sql import functions as F

DEC = "decimal(16,4)"


def _dec(c):
    return F.col(c).cast(DEC)


def _rev():
    """Decimal-exact extended revenue: extprice * (1 - discount)."""
    one = F.lit(1).cast("decimal(8,4)")
    return _dec("l_extendedprice") * (one - F.col("l_discount").cast("decimal(8,4)"))


def _ts_str(c):
    return F.date_format(F.col(c), "yyyy-MM-dd HH:mm:ss")
