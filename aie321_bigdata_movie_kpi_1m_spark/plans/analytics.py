"""Warehouse-analytics query surface over the ``events`` / ``orders`` /
``lineitem`` / ``customer`` tables: funnel, cohort retention, time-series
gap-fill, GROUPING SETS, exact median/mode, unpivot.

The reference is a single-table KPI pipeline (transform.py:80-207); none
of these shapes exist there, but they are table stakes for the analytics
engine the brief demands.  Portability conventions follow
plans/movie_view.py: money as FLOOR(x*100) integer cents, deterministic
tie-breaks on every window, timestamps already microsecond-exact on both
engines (sources/readers.py nanos handling).

Scale notes per query are in the registered descriptions — each is a
constant number of shuffles with map-side partial aggregation; nothing
here fans out more than the grid it returns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import cents as _cents
from ..sources.readers import load_star_table
from .catalog import register


@register(
    "funnel_user_conversion",
    """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(t_view) AS n_view,
       COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
       COUNT(CASE WHEN t_click > t_view AND t_purchase > t_click
             THEN 1 END) AS n_full_funnel
FROM per_user
""",
    "first-touch funnel (view -> click -> purchase): one conditional-min "
    "groupBy per user then a global conditional count — two shuffles "
    "total, both with map-side partials; timestamps compare exactly on "
    "both engines (micros)",
    tags=("analytics", "events"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_star_table(spark, sf_dir, "events")
    stage = [
        F.min(F.when(F.col("event_type") == t, F.col("ts"))).alias(f"t_{t}")
        for t in ("view", "click", "purchase")
    ]
    per_user = ev.groupBy("user_id").agg(*stage)
    through_click = F.col("t_click") > F.col("t_view")
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count(F.when(through_click, 1)).alias("n_view_click"),
        F.count(
            F.when(through_click & (F.col("t_purchase") > F.col("t_click")), 1)
        ).alias("n_full_funnel"),
    )


@register(
    "cohort_weekly_retention",
    """
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
)
SELECT CAST(f.cohort_week AS VARCHAR) AS cohort_week,
       CAST(FLOOR((CAST(e.ts AS DATE) - f.cohort_week) / 7) AS BIGINT)
         AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_active
FROM events e JOIN firsts f USING (user_id)
GROUP BY 1, 2
""",
    "weekly cohort retention: cohort = Monday-truncated week of first "
    "event, activity bucketed by whole-week offset, distinct users per "
    "cell; the firsts side is one row per user so at scale it broadcasts "
    "into the fact scan (classic retention matrix)",
    tags=("analytics", "events"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_star_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    return (
        ev.join(F.broadcast(firsts), "user_id")
        .select(
            "cohort_week",
            F.floor(
                F.datediff(F.to_date("ts"), F.col("cohort_week")) / 7
            ).alias("week_offset"),
            "user_id",
        )
        .groupBy(F.col("cohort_week").cast("string").alias("cohort_week"), F.col("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "events_gapfill_ffill",
    """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS day_cents
  FROM events GROUP BY 1, 2
),
spans AS (SELECT user_id, MIN(d) AS d0, MAX(d) AS d1 FROM daily GROUP BY 1),
grid AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
  FROM spans
)
SELECT g.user_id, CAST(g.d AS VARCHAR) AS d,
       CAST(last_value(daily.day_cents IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS filled_cents,
       daily.day_cents IS NOT NULL AS observed
FROM grid g LEFT JOIN daily ON daily.user_id = g.user_id AND daily.d = g.d
""",
    "time-series resample + forward fill: per-user daily grid "
    "(sequence-explode between first and last active day), left join of "
    "observed daily sums, last-non-null carried forward via a running "
    "window; the grid explode is arithmetic (no shuffle) and the fill is "
    "one window over the user partitioning the join already established",
    tags=("analytics", "events", "timeseries"),
)
def q_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_star_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(F.sum(_cents(F.col("value"))).alias("day_cents"))
    grid = (
        daily.groupBy("user_id")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("d"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(daily, ["user_id", "d"], "left").select(
        "user_id",
        F.col("d").cast("string").alias("d"),
        F.last("day_cents", ignorenulls=True).over(w).alias("filled_cents"),
        F.col("day_cents").isNotNull().alias("observed"),
    )


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM {table}
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register(
    "grouping_sets_orders",
    _GROUPING_SETS_SQL.format(table="orders"),
    "explicit GROUPING SETS (by-status, by-priority, grand total) with "
    "GROUPING() markers — the general form behind rollup/cube, expressed "
    "through the SQL surface (temp view + spark.sql, the engine's "
    "every-query-is-also-SQL contract); one expand + one shuffle",
    tags=("analytics", "sql"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_star_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__orders_gs")
    return spark.sql(_GROUPING_SETS_SQL.format(table="__orders_gs"))


@register(
    "lineitem_median_mode",
    """
WITH counts AS (
  SELECT l_returnflag, l_quantity, COUNT(*) AS n
  FROM lineitem GROUP BY 1, 2
),
modes AS (
  SELECT l_returnflag, l_quantity AS mode_qty, n AS mode_count
  FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                     ORDER BY n DESC, l_quantity ASC) AS rn
        FROM counts)
  WHERE rn = 1
),
meds AS (
  SELECT l_returnflag, COUNT(*) AS n_rows,
         ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty
  FROM lineitem GROUP BY 1
)
SELECT m.l_returnflag, m.n_rows, m.median_qty, mo.mode_qty, mo.mode_count
FROM meds m JOIN modes mo USING (l_returnflag)
""",
    "exact per-group median (interpolating percentile) and deterministic "
    "mode (max count, ties broken by smallest value — engine-portable, "
    "unlike builtin mode()); median is the only full-sort-per-group "
    "aggregate, mode is a groupBy + top-1 window over the distinct-value "
    "counts",
    tags=("analytics", "stats"),
)
def q_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_star_table(spark, sf_dir, "lineitem")
    meds = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median_qty"),
    )
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("n"), F.asc("l_quantity")
    )
    modes = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("n").alias("mode_count"),
        )
    )
    return meds.join(modes, "l_returnflag")


@register(
    "unpivot_segment_stats",
    """
WITH wide AS (
  SELECT c_mktsegment,
         COUNT(*) AS n_customers,
         CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS acctbal_cents
  FROM customer GROUP BY 1
)
SELECT c_mktsegment, 'n_customers' AS metric, n_customers AS metric_value
FROM wide
UNION ALL
SELECT c_mktsegment, 'acctbal_cents' AS metric, acctbal_cents AS metric_value
FROM wide
""",
    "unpivot (wide metrics -> long key/value rows), the inverse of "
    "pivot_priority_by_status: native DataFrame.unpivot generates an "
    "Expand node — rows multiply by the metric count with no shuffle; "
    "the oracle spells it as the equivalent UNION ALL",
    tags=("analytics", "sql"),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_star_table(spark, sf_dir, "customer")
    wide = cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(_cents(F.col("c_acctbal"))).alias("acctbal_cents"),
    )
    return wide.unpivot(
        "c_mktsegment",
        ["n_customers", "acctbal_cents"],
        "metric",
        "metric_value",
    )


@register(
    "events_rolling_7d",
    """
SELECT event_id, user_id,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
         AS BIGINT) AS rolling_7d_cents,
       CAST(COUNT(*) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
         AS BIGINT) AS n_7d
FROM events
""",
    "per-user 7-day rolling spend: a RANGE window frame over exact "
    "epoch-microseconds (604800000000 us preceding) — time-based frames "
    "are the shape event analytics runs constantly; one shuffle on "
    "user_id, frame bounds evaluated by the window operator itself "
    "(ties at identical timestamps are included by RANGE on both "
    "engines, so no tie-break hazard)",
    tags=("analytics", "events", "timeseries"),
)
def q_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_star_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-604_800_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(_cents(F.col("value"))).over(w).alias("rolling_7d_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_7d"),
    )
