"""Money/measure conventions shared by plans and oracles."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column) -> Column:
    """Exact integer cents: ``FLOOR(x * 100)`` as long.

    The engine-wide convention for aggregating money-like doubles so sums
    are order-independent and bit-equal across engines (every oracle uses
    the same ``CAST(FLOOR(x * 100) AS BIGINT)``).  FLOOR, not CAST:
    DuckDB's double->BIGINT cast rounds while Spark's truncates, so only
    the explicit floor agrees everywhere.
    """
    return F.floor(col * 100).cast("long")
