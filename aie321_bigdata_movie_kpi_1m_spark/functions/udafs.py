"""Custom aggregates (Arrow grouped-agg pandas UDFs).

NOTE: deliberately NO ``from __future__ import annotations`` here —
pyspark's pandas_udf infers the UDF kind from evaluated type hints
(``pd.Series -> float`` = grouped aggregate), and stringified
annotations from the future-import break that inference.
"""

import pandas as pd

from pyspark.sql import functions as F


@F.pandas_udf("double")
def trimmed_mean(v: pd.Series) -> float:
    """10% two-sided trimmed mean — a robust location statistic Spark has
    no builtin for.  Arrow ships each group's column as one batch; the
    UDAF composes inside a normal ``.agg()`` next to builtin aggregates.
    Trim count is ``len // 10`` per side (kept in lockstep with the
    DuckDB oracle's ``n // 10`` integer division)."""
    s = v.sort_values(ignore_index=True)
    k = len(s) // 10
    if len(s) > 2 * k:
        s = s.iloc[k : len(s) - k]
    return float(s.mean())
