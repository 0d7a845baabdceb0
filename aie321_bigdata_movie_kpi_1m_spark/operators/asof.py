"""As-of (temporal) join — an operator the reference lacks (SURVEY.md §2.8)
and Spark has no built-in for.

Implemented as the union + keyed-window "piggyback" pattern rather than a
range join: both sides are unioned, sorted within each key partition by
(time, side), and each left row picks up the most recent right payload via
``last(..., ignorenulls=True)``.

Scale rationale: one shuffle on the join key, no O(left x right-window)
range-join explosion, no driver-side state — at 100 TB this is a single
sort-based window over co-partitioned data, and skewed keys are handled by
AQE like any other shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TIME = "__asof_time"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    left_time: str,
    right_time: str,
    payload: list[str],
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """As-of left join: backward (default) or forward.

    ``backward``: for each ``left`` row, attach ``payload`` columns from
    the ``right`` row with the greatest ``right_time`` <= ``left_time``
    within the same ``on`` key.  ``forward``: the smallest ``right_time``
    >= ``left_time``.  Unmatched left rows keep NULL payloads.  Equal
    timestamps match in both directions (inclusive semantics — the same
    contract as DuckDB's ``ASOF JOIN ... ON l.t >= r.t`` / ``l.t <=
    r.t``).  Ties *within* the right side at the same (key, time) are
    the caller's job to pre-dedupe.

    NULL semantics follow the SQL contract exactly: a NULL never
    compares true, so right rows with a NULL time or NULL key can match
    nothing (dropped from the candidate side), and left rows with a NULL
    time or NULL key keep NULL payloads.  Without this the window
    machinery would invent matches — ascending sort puts NULLs first, so
    a NULL-time right row would look "earlier than everything", and
    ``partitionBy`` groups NULL keys together while an equi-join never
    matches them.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [on] if isinstance(on, str) else list(on)
    payload_struct = F.struct(*[F.col(c) for c in payload])
    left_schema = {f.name: f.dataType for f in left.schema.fields}

    right = right.filter(F.col(right_time).isNotNull())
    for k in keys:
        right = right.filter(F.col(k).isNotNull())

    r = right.select(
        *[
            F.col(name) if name in keys else F.lit(None).cast(dt).alias(name)
            for name, dt in left_schema.items()
        ],
        F.col(right_time).alias(_TIME),
        F.lit(0).alias(_SIDE),
        payload_struct.alias(_PAYLOAD),
    )
    l = left.select(
        *left.columns,
        F.col(left_time).alias(_TIME),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )

    if direction == "backward":
        # right(0) sorts before left(1) at equal times, so an inclusive
        # trailing frame sees the equal-time right row
        w = (
            Window.partitionBy(*keys)
            .orderBy(_TIME, _SIDE)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = F.last(_PAYLOAD, ignorenulls=True)
    else:
        # mirrored: left(1) sorts before right(0) at equal times, and an
        # inclusive leading frame picks the first following right row
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(_TIME), F.col(_SIDE).desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = F.first(_PAYLOAD, ignorenulls=True)
    # NULL left time -> NULL payload (a NULL-time left row sorts to the
    # partition head, where the forward frame would otherwise hand it the
    # earliest right payload)
    merged = l.unionByName(r).withColumn(
        _PAYLOAD,
        F.when(F.col(_TIME).isNull(), F.lit(None)).otherwise(pick.over(w)),
    )

    out = merged.filter(F.col(_SIDE) == 1)
    for c in payload:
        out_name = c if c not in left.columns else f"{c}{suffix}"
        out = out.withColumn(out_name, F.col(_PAYLOAD)[c])
    return out.drop(_SIDE, _TIME, _PAYLOAD)
