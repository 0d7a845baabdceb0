"""Interval overlap join: all pairs (l, r) whose closed intervals
[l_start, l_end] and [r_start, r_end] intersect — WITHOUT a cartesian
product and without Spark's broadcast-nested-loop fallback.

The naive plan for ``ON l.s <= r.e AND r.s <= l.e`` is a BNLJ (small
side broadcast) or a cartesian shuffle — both quadratic at 100 TB.  The
scale shape here is BIN DECOMPOSITION (the same idea behind Databricks'
range-join bin optimization and spatial grid joins):

1. each interval emits one row per fixed-width bin it spans
   (``explode(sequence(floor(s/w), floor(e/w)))``);
2. the two sides EQUI-join on the bin id (plus any caller equi keys) —
   a plain hash-partitioned join, so Catalyst/AQE plan it like any
   other shuffle join (no nested loop anywhere);
3. the exact overlap predicate filters the candidates;
4. a pair overlapping across several shared bins is emitted EXACTLY
   ONCE — kept only in the bin containing ``greatest(l_start,
   r_start)`` — so no post-join ``distinct`` shuffle is ever needed
   (that bin is always shared: the later start lies inside both
   intervals whenever they overlap).

Cost model: duplication factor is O(span / bin_width) rows per input
interval, bucket density is O(concurrency x bin_width); pick the bin
near the median interval span so both stay small.  Degenerate wide
intervals (spanning the whole domain) make ANY partitioning quadratic —
cap or split them upstream.

No counterpart in the reference (single-node pandas, no joins at all);
nearest public analogues: Spark range-join hints, PostGIS &&-grid
joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    *,
    bin_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """All (left row, right row) pairs whose closed intervals overlap:
    ``l_start <= r_end AND r_start <= l_end``.

    ``bin_width`` is the decomposition grain in the interval columns'
    own units (must be a positive integer; bounds must be integral
    types).  ``keys`` adds equi-join columns present on BOTH sides
    (e.g. a tenant id) — they ride the same shuffle for free and cut
    bucket density by the key cardinality.

    Column names of ``left`` and ``right`` must be disjoint apart from
    ``keys`` (rename before calling).  Rows with a NULL bound or an
    inverted interval (end < start) match nothing, mirroring what the
    SQL predicate would do.  Output columns: keys, then left's, then
    right's; each overlapping pair appears exactly once.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    keys = list(keys or [])
    overlap_l = set(left.columns) & set(right.columns) - set(keys)
    if overlap_l:
        raise ValueError(
            f"left/right share non-key columns {sorted(overlap_l)} — "
            "rename one side before joining"
        )

    def _binned(df: DataFrame, start: str, end: str) -> DataFrame:
        lo = F.floor(F.col(start) / F.lit(bin_width)).cast("long")
        hi = F.floor(F.col(end) / F.lit(bin_width)).cast("long")
        return df.filter(
            F.col(start).isNotNull()
            & F.col(end).isNotNull()
            & (F.col(end) >= F.col(start))
        ).withColumn("__bin", F.explode(F.sequence(lo, hi)))

    lb = _binned(left, l_start, l_end)
    rb = _binned(right, r_start, r_end)
    emit_bin = F.floor(
        F.greatest(F.col(l_start), F.col(r_start)) / F.lit(bin_width)
    ).cast("long")
    return (
        lb.join(rb, ["__bin", *keys])
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("__bin") == emit_bin)
        )
        .drop("__bin")
    )
