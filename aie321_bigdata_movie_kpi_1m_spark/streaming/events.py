"""Structured Streaming surface over the events table.

The reference is batch-only (SURVEY.md §2.8); this module supplies the
streaming capabilities a large-scale pipeline needs: file-source ingest,
watermarked windowed aggregation, and custom stateful sessionization via
``applyInPandasWithState``.  Batch twins live in ``operators/sessions.py``
(identical semantics — tested against each other), so backfill and live
paths share one definition of correctness.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.money import cents
from ..schemas import STAR_SCHEMAS


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table.  The testdata directory
    holds a single events.parquet, so an availableNow run is exactly one
    micro-batch — the property the sessionization backfill contract below
    relies on.  On a real bus this is the Kafka reader with the same
    downstream plan."""
    from ..schemas import EVENTS_NANOS_SCHEMA
    from ..sources.readers import _events_ts_unit

    if _events_ts_unit(f"{sf_dir}/events.parquet") == "ns":
        # legacy TIMESTAMP(NANOS) files: Spark's parquet reader rejects
        # nanos, so read as long ns and convert (see readers.load_star_table)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return (
            spark.readStream.schema(EVENTS_NANOS_SCHEMA)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    return (
        spark.readStream.schema(STAR_SCHEMAS["events"])
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def dedup_events_within_watermark(
    events: DataFrame, *, delay: str = "1 hour"
) -> DataFrame:
    """Built-in BOUNDED-STATE streaming dedup:
    ``dropDuplicatesWithinWatermark`` on (user_id, event_type).

    Plain ``dropDuplicates`` on a stream keeps every key seen forever —
    state grows without bound, the classic slow-death at 100 TB/day.
    The within-watermark variant drops a key's state once the watermark
    passes its event time + delay, so state is bounded by (keys active
    per delay window), not (keys ever seen).  The stateful-API twin of
    the fingerprint dedup in ``streaming/documents.py`` (which tracks
    extra per-key aggregates); this one is the pure built-in, zero
    Python in the loop.

    Output projects the key columns only: which *full row* survives for
    a key is first-arrival order, nondeterministic under parallel read —
    the key set itself is exact.  One availableNow backfill batch never
    advances the watermark mid-batch, so the result equals batch
    ``SELECT DISTINCT`` (the oracle).
    """
    return (
        events.withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )


def windowed_event_counts(
    events: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts + value cents per event type.

    The watermark bounds state for late data; output schema is flattened
    so the same aggregation runs in batch mode for backfill parity.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents(F.col("value"))).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_cents",
        )
    )


def sliding_event_counts(
    events: DataFrame,
    *,
    window: str = "2 hours",
    slide: str = "30 minutes",
    watermark: str = "4 hours",
) -> DataFrame:
    """Watermarked SLIDING-window counts per event type.

    Each event lands in ``window/slide`` overlapping windows (4 here);
    Spark expands the assignment inline (no self-join), and state per
    key-window is bounded by the watermark exactly as in the tumbling
    case — the overlap multiplies state size by window/slide, which is
    the knob to watch at scale.  Same batch/stream parity contract as
    ``windowed_event_counts``.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def error_purchase_join_stream(
    events: DataFrame, *, horizon: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream event-time join: each error joined to the same
    user's purchases within ``horizon`` after it.

    The remaining Structured Streaming tier after windows and stateful
    sessionization: both sides carry watermarks, and the time-range
    predicate bounds how long either side's rows wait in state (without
    it the join state would grow forever).  With one availableNow batch
    the inner join emits exactly the batch join — the same backfill
    parity contract as every streaming query here.
    """
    errors = (
        events.filter(F.col("event_type") == "error")
        .withWatermark("ts", watermark)
        .select(F.col("user_id").alias("e_user"), F.col("ts").alias("error_ts"))
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", watermark)
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"))
    )
    return (
        errors.join(
            purchases,
            (F.col("e_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("error_ts"))
            & (F.col("purchase_ts") <= F.col("error_ts") + F.expr(f"INTERVAL {horizon}")),
            "inner",
        )
        .select(
            F.col("e_user").alias("user_id"),
            F.unix_timestamp("error_ts").alias("error_sec"),
            F.unix_timestamp("purchase_ts").alias("purchase_sec"),
        )
    )


_SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("duration_secs", T.LongType()),
    ]
)

_SESSION_STATE = T.StructType(
    [
        T.StructField("session_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_sec", T.LongType()),
        T.StructField("last_sec", T.LongType()),
    ]
)


def _session_fn(gap_seconds: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            seq, n, start, last = state.get
        else:
            seq, n, start, last = 0, 0, None, None
        out: list[tuple] = []
        secs: list[int] = []
        for pdf in pdfs:
            # drop NULL timestamps (NaT): same contract as the batch twin
            # operators.sessions.assign_sessions — astype('int64') on NaT
            # raises on modern pandas, and older pandas yields a min-int
            # sentinel that would fabricate an epoch-1677 session
            ts = pdf["ts"].dropna()
            secs.extend(int(v) for v in ts.astype("int64") // 1_000_000_000)
        for s in sorted(secs):
            if last is None or s - last > gap_seconds:
                if n > 0:
                    out.append((user_id, seq, n, start, last - start))
                seq, n, start = seq + 1, 0, s
            n += 1
            last = s
        state.update((seq, n, start, last))
        # close the open session too: with availableNow backfill semantics
        # every seen session is emitted; a live run would instead rely on
        # the timeout to flush it.
        if n > 0:
            out.append((user_id, seq, n, start, last - start))
        result = pd.DataFrame(
            out,
            columns=["user_id", "session_seq", "n_events", "start_sec", "duration_secs"],
        )
        result["session_start"] = pd.to_datetime(result["start_sec"], unit="s")
        yield result[
            ["user_id", "session_seq", "n_events", "session_start", "duration_secs"]
        ]

    return fn


def sessionize_stream(events: DataFrame, *, gap_seconds: int = 21600) -> DataFrame:
    """Custom stateful sessionization (``applyInPandasWithState``): the
    streaming twin of ``operators.sessions.session_summary``.

    State per user: (open session seq, count, start, last-seen second);
    a new event more than ``gap_seconds`` after the last closes the open
    session.

    Contract: single-batch **backfill** parity.  Each batch emits its
    closed sessions AND the still-open session, so one availableNow batch
    reproduces the batch SQL exactly (the oracle for
    ``streaming_sessionize``).  A multi-batch live run would re-emit a
    user's open session each batch it grows; a live deployment should
    switch to a ProcessingTime timeout that flushes open sessions once
    instead of the end-of-batch emission below.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds),
        outputStructType=_SESSION_OUTPUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def error_purchase_left_join_stream(
    events_wm: DataFrame,
    *,
    horizon: str = "1 hour",
    flush_type: str = "__flush__",
) -> DataFrame:
    """LEFT OUTER stream-stream event-time join: every error, joined to
    the same user's purchases within ``horizon`` after it — errors with
    NO such purchase emit a NULL-purchase row, but only once the
    watermark proves no match can still arrive (error_ts + horizon is
    behind the watermark); until then the row waits in state.  This is
    the semantics an inner join cannot give: the unmatched side is the
    interesting one (errors never recovered by a purchase).

    ``events_wm`` must already carry the watermark.  Both side filters
    deliberately KEEP the ``flush_type`` sentinel: a plain
    ``event_type == 'error'`` predicate is pushed below the
    EventTimeWatermark operator and would prune the very row that
    advances the watermark, so no outer row would ever emit (the
    pushdown trap pinned in ``_read_flushed_events_stream``).  The
    sentinel self-match (user -1) is dropped by the caller's batch
    post-pass.  The time-range condition bounds both sides' state.
    """
    errors = events_wm.filter(
        F.col("event_type").isin("error", flush_type)
    ).select(F.col("user_id").alias("e_user"), F.col("ts").alias("error_ts"))
    purchases = events_wm.filter(
        F.col("event_type").isin("purchase", flush_type)
    ).select(F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"))
    return (
        errors.join(
            purchases,
            (F.col("e_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("error_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("error_ts") + F.expr(f"INTERVAL {horizon}")
            ),
            "leftOuter",
        )
        .select(
            F.col("e_user").alias("user_id"),
            F.unix_timestamp("error_ts").alias("error_sec"),
            F.unix_timestamp("purchase_ts").alias("purchase_sec"),
        )
    )


def error_purchase_full_join_stream(
    events_wm: DataFrame,
    *,
    horizon: str = "1 hour",
    flush_type: str = "__flush__",
) -> DataFrame:
    """FULL OUTER stream-stream event-time join: matched error/purchase
    pairs emit as they are produced; an error with NO purchase in the
    ``horizon`` after it AND a purchase answering NO error both emit a
    NULL-other-side row — each only once the watermark proves the match
    can no longer arrive, which requires watermark-gated NULL emission
    on BOTH sides' join state (the tier beyond left-outer, where only
    the left side waits).  The time-range condition is what bounds both
    state stores; without it either side would buffer forever.

    ``events_wm`` must already carry the watermark.  Both side filters
    KEEP the ``flush_type`` sentinel for the same pushdown reason as the
    left join (an equality predicate pushes below EventTimeWatermark and
    starves the watermark); the sentinel self-matches (user -1, equal
    timestamps are inside the range), so it emits exactly one matched
    row the caller's batch post-pass drops.  ``user_id`` coalesces the
    two sides because either one can be NULL in an unmatched row."""
    errors = events_wm.filter(
        F.col("event_type").isin("error", flush_type)
    ).select(F.col("user_id").alias("e_user"), F.col("ts").alias("error_ts"))
    purchases = events_wm.filter(
        F.col("event_type").isin("purchase", flush_type)
    ).select(F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"))
    return (
        errors.join(
            purchases,
            (F.col("e_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("error_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("error_ts") + F.expr(f"INTERVAL {horizon}")
            ),
            "fullOuter",
        )
        .select(
            F.coalesce(F.col("e_user"), F.col("p_user")).alias("user_id"),
            F.unix_timestamp("error_ts").alias("error_sec"),
            F.unix_timestamp("purchase_ts").alias("purchase_sec"),
        )
    )
