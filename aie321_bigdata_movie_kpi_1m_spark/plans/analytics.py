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
from ..operators.materialize import materialize


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


# ---------------------------------------------------------------------------
# Graph & sequence analytics
# ---------------------------------------------------------------------------

#: shared oracle prefix: the cust-nation -> supp-nation trade graph and its
#: out-normalized transition rows (lockstep with q_pagerank_nation_flow)
_PR_GRAPH_CTE = """
WITH e AS (
  SELECT c.c_nationkey AS u, s.s_nationkey AS v, COUNT(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
outw AS (SELECT u, SUM(w) AS ow FROM e GROUP BY u),
trans AS (
  SELECT e.u, e.v, CAST(e.w AS DOUBLE) / CAST(o.ow AS DOUBLE) AS p
  FROM e JOIN outw o USING (u)
),
nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS rank FROM nodes, nn)
"""


def _pr_iter_cte(prev: str, cur: str) -> str:
    """One unrolled power-iteration step (d = 7/8 — dyadic, so 1-d is
    bit-exact on both engines; only SUM order can drift, handled by the
    final ROUND)."""
    return f""",
{cur} AS (
  SELECT nodes.node,
         CAST(0.125 AS DOUBLE) / nn.n
           + CAST(0.875 AS DOUBLE) * COALESCE(f.inflow, CAST(0 AS DOUBLE))
           AS rank
  FROM nodes CROSS JOIN nn
  LEFT JOIN (
    SELECT t.v AS node, SUM(r.rank * t.p) AS inflow
    FROM trans t JOIN {prev} r ON r.node = t.u
    GROUP BY t.v
  ) f USING (node)
)"""


_PR_ORACLE = (
    _PR_GRAPH_CTE
    + _pr_iter_cte("r0", "r1")
    + _pr_iter_cte("r1", "r2")
    + _pr_iter_cte("r2", "r3")
    + """
SELECT n.n_name AS nation, ROUND(r3.rank, 6) AS rank_r6
FROM r3 JOIN nation n ON n.n_nationkey = r3.node
"""
)


@register(
    "pagerank_nation_flow",
    _PR_ORACLE,
    "weighted PageRank (3 fixed power iterations, d=7/8) over the "
    "customer-nation -> supplier-nation trade graph built from "
    "lineitem x orders x customer x supplier — the iterative-join "
    "family beyond connected components; the heavy work is the one-time "
    "edge aggregation (the 4-way fact join), after which each iteration "
    "joins a 25-node rank vector against a tiny normalized edge list; "
    "lineage stays linear in iters so no checkpoint is needed; d=7/8 "
    "keeps 1-d dyadic (bit-exact both engines), final ROUND(6) absorbs "
    "SUM-order drift",
    tags=("graph", "analytics"),
)
def q_pagerank_nation_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_fixed

    li = load_star_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_star_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_star_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_star_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_star_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node"), "n_name"
    )
    edges = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = pagerank_fixed(edges, damping=0.875, iters=3)
    return ranks.join(F.broadcast(nation), "node").select(
        F.col("n_name").alias("nation"), F.round("rank", 6).alias("rank_r6")
    )


@register(
    "event_transition_matrix",
    """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type), 4)
         AS p_next
FROM pairs
""",
    "first-order Markov transition matrix over per-user event sequences: "
    "lag window (deterministic ts, event_id tie-break) -> pair counts -> "
    "row-normalized probabilities via a partition-sum window; the lag "
    "shuffle partitions by user_id (the natural key, no skew), the "
    "normalizer window runs over the tiny |types|^2 grid; exact-integer "
    "counts, one division, ROUND(4) is cosmetic",
    tags=("analytics", "events", "sequence"),
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_star_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wt), 4).alias("p_next"),
    )


@register(
    "events_ewma_daily",
    """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT d1.event_type, CAST(d1.day AS VARCHAR) AS day, d1.n,
       SUM(d2.n * power(CAST(0.5 AS DOUBLE),
                        date_diff('day', d2.day, d1.day)))
         / SUM(power(CAST(0.5 AS DOUBLE),
                     date_diff('day', d2.day, d1.day))) AS ewma_7d
FROM daily d1
JOIN daily d2
  ON d2.event_type = d1.event_type
 AND d2.day >= d1.day - 6 AND d2.day <= d1.day
GROUP BY 1, 2, 3
""",
    "exponentially-weighted 7-day smoothing of the daily event-type "
    "series: aggregate first (events -> tiny daily grid), then a "
    "self-join over a 7-day trailing range with dyadic 0.5^k weights — "
    "every term n/2^k is an exact double and the <=7-term sums stay "
    "under 53 bits, so the result is bit-exact with NO rounding needed "
    "(the reason alpha=1/2, not 0.3); smoothing after aggregation keeps "
    "the range join on the grid, never on the raw fact table",
    tags=("analytics", "events", "timeseries"),
)
def q_events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_star_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    d1 = daily.alias("d1")
    d2 = daily.alias("d2")
    k = F.datediff(F.col("d1.day"), F.col("d2.day"))
    wgt = F.pow(F.lit(0.5), k)
    return (
        d1.join(
            d2,
            (F.col("d2.event_type") == F.col("d1.event_type"))
            & (F.col("d2.day") >= F.date_sub(F.col("d1.day"), 6))
            & (F.col("d2.day") <= F.col("d1.day")),
        )
        .groupBy(
            F.col("d1.event_type").alias("event_type"),
            # dates surface as ISO strings (catalog canonicalization
            # convention — see events_gapfill_ffill)
            F.col("d1.day").cast("string").alias("day"),
            F.col("d1.n").alias("n"),
        )
        .agg((F.sum(F.col("d2.n") * wgt) / F.sum(wgt)).alias("ewma_7d"))
    )


@register(
    "triangle_coorder_customers",
    """
WITH o AS (
  SELECT o_custkey, o_orderdate, o_orderpriority FROM orders
  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
),
e AS (
  SELECT DISTINCT a.o_custkey AS u, b.o_custkey AS v
  FROM o a JOIN o b
    ON a.o_orderdate = b.o_orderdate
   AND a.o_orderpriority = b.o_orderpriority
   AND a.o_custkey < b.o_custkey
)
SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
       CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.u = e1.v
JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
""",
    "triangle counting with DEGREE ORIENTATION (operators/graph.py::"
    "triangles, the Suri-Vassilvitskii 'last reducer' fix): the "
    "co-order graph (customers ordering on the same day at the same "
    "priority, 1996) is counted by directing every edge from its "
    "lower-(degree, id) endpoint to the higher, bounding per-vertex "
    "out-degree by ~sqrt(2m) and total wedges by O(m^1.5) no matter "
    "how hot a hub vertex gets — the naive wedges-at-every-vertex plan "
    "dies on the first celebrity node at 100 TB; one wedge self-join + "
    "one closing-edge join, each triangle exactly once, no distinct "
    "shuffle; oracle replays the ID-ordered 3-way join in SQL",
    tags=("graph",),
)
def q_triangle_coorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangles

    o = (
        load_star_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_custkey", "o_orderdate", "o_orderpriority")
    )
    a = o.select(
        F.col("o_custkey").alias("u"),
        F.col("o_orderdate").alias("d"),
        F.col("o_orderpriority").alias("p"),
    )
    b = o.select(
        F.col("o_custkey").alias("v"),
        F.col("o_orderdate").alias("d"),
        F.col("o_orderpriority").alias("p"),
    )
    e = (
        a.join(b, ["d", "p"])
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    tri = triangles(e, src="u", dst="v")
    return e.agg(F.count(F.lit(1)).cast("long").alias("n_edges")).crossJoin(
        tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


@register(
    "events_anomaly_mad",
    """
WITH daily AS (
  SELECT CAST(FLOOR(EPOCH(ts)/86400.0) AS BIGINT) AS day_idx,
         CAST(SUM(CAST(FLOOR(value*100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
roll AS (
  SELECT day_idx, value_cents,
         list(value_cents) OVER (ORDER BY day_idx
                                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS w
  FROM daily
),
m AS (
  SELECT day_idx, value_cents,
         list_aggregate(w, 'median') AS med7,
         list_aggregate(
           list_transform(w, x -> abs(x - list_aggregate(w, 'median'))),
           'median') AS mad7
  FROM roll
)
SELECT day_idx, value_cents, med7, mad7,
       (abs(value_cents - med7) > 3 * mad7) AS is_anomaly
FROM m
""",
    "robust rolling anomaly detection: daily revenue vs a 7-day rolling "
    "MEDIAN with a 3x rolling-MAD band — median/MAD ignore the outliers "
    "a mean/stddev band is dragged by, so a single spike day cannot "
    "mask itself; the nested median-of-deviations is a pure JVM array "
    "expression over a ROWS window (collect_list -> array_sort -> "
    "element_at, transform lambda), NO Python stage and ONE shuffle for "
    "the daily rollup (the window then runs on a single ordered day "
    "spine, ~365 rows/year — driver-scale math on executor-side "
    "expressions); every median is order-independent dyadic-rational "
    "arithmetic, so Spark and DuckDB agree bit-for-bit",
    tags=("temporal", "stats"),
)
def q_events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_star_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
    )
    daily = events.groupBy(
        F.floor(F.col("ts").cast("long") / 86400.0).cast("long").alias("day_idx")
    ).agg(F.sum(_cents(F.col("value"))).cast("long").alias("value_cents"))

    def arr_median(arr):
        s = F.array_sort(arr)
        n = F.size(s)
        mid = F.floor(n / 2).cast("int")
        return (
            F.when(
                n % 2 == 1, F.element_at(s, mid + 1).cast("double")
            ).otherwise(
                (F.element_at(s, mid) + F.element_at(s, mid + 1)) / 2.0
            )
        )

    w = Window.orderBy("day_idx").rowsBetween(-6, 0)
    rolled = daily.withColumn("w", F.collect_list("value_cents").over(w))
    med = arr_median(F.col("w"))
    with_med = rolled.withColumn("med7", med)
    devs = F.transform(
        F.col("w"), lambda x: F.abs(x.cast("double") - F.col("med7"))
    )
    out = with_med.withColumn("mad7", arr_median(devs))
    return out.select(
        "day_idx",
        "value_cents",
        "med7",
        "mad7",
        (F.abs(F.col("value_cents") - F.col("med7")) > 3 * F.col("mad7")).alias(
            "is_anomaly"
        ),
    )


@register(
    "association_rules_parts",
    """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
sized AS (SELECT l_orderkey FROM items GROUP BY 1 HAVING COUNT(*) <= 100),
it AS (SELECT i.* FROM items i JOIN sized s USING (l_orderkey)),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM it),
cnt AS (SELECT l_partkey, COUNT(*) AS c FROM it GROUP BY 1),
p AS (SELECT a.l_partkey pa, b.l_partkey pb, COUNT(*) pn
      FROM it a JOIN it b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
rules AS (
  SELECT pa AS antecedent, pb AS consequent, pn, ca.c AS na, cb.c AS nb
  FROM p JOIN cnt ca ON ca.l_partkey = pa JOIN cnt cb ON cb.l_partkey = pb
  UNION ALL
  SELECT pb, pa, pn, cb.c, ca.c
  FROM p JOIN cnt ca ON ca.l_partkey = pa JOIN cnt cb ON cb.l_partkey = pb
)
SELECT antecedent, consequent,
       CAST(pn AS BIGINT) AS support_n,
       CAST(pn AS DOUBLE) / na AS confidence,
       CAST(pn * n.n_orders AS DOUBLE) / (na * nb) AS lift
FROM rules, n
""",
    "association-rule mining over order baskets (the A-Priori pair "
    "pass, distributed): ONE groupBy collects each basket's distinct "
    "items into a sorted array (baskets over 100 items are CAPPED OUT "
    "before the quadratic step, the guard that keeps one hot basket "
    "from emitting millions of pairs at 100 TB), per-basket i<j pairs "
    "are generated JVM-side from the array (nested transform+flatten — "
    "no self-join, so the basket data is shuffled ONCE instead of "
    "twice), pair counts filtered to min-support, then "
    "support/confidence/lift via a broadcast join against the "
    "item-count dim; lift is computed as one exact integer product per "
    "side divided once, so Spark and DuckDB doubles agree bit-for-bit; "
    "both rule directions emitted",
    tags=("analytics", "mining"),
)
def q_association_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_star_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    # baskets as sorted arrays: one shuffle on the basket key; the cap
    # and every downstream consumer (total, item counts, pair pass)
    # derive from this ONE table — a lazy localCheckpoint computes it
    # once instead of re-running distinct+groupBy per consumer
    baskets = (
        items.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_partkey")).alias("__ps"))
        .filter(F.size("__ps") <= 100)
        .transform(materialize)
    )
    total = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    cnt = baskets.select(
        F.explode("__ps").alias("l_partkey")
    ).groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    # per-basket i<j pairs, generated inside codegen from the sorted
    # array (ps is distinct per basket, so < on positions == < on
    # values): C(k,2) structs per basket, k <= 100 by the cap
    n = F.size("__ps")
    pair_arrays = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.slice("__ps", i + 1, n - i),
                lambda x: F.struct(
                    F.element_at("__ps", i).alias("pa"), x.alias("pb")
                ),
            ),
        )
    )
    p = (
        baskets.filter(n >= 2)
        .select(F.explode(pair_arrays).alias("__pr"))
        .select("__pr.pa", "__pr.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("pn"))
        .filter(F.col("pn") >= 2)
    )
    ca = cnt.select(F.col("l_partkey").alias("pa"), F.col("c").alias("na"))
    cb = cnt.select(F.col("l_partkey").alias("pb"), F.col("c").alias("nb"))
    joined = p.join(F.broadcast(ca), "pa").join(F.broadcast(cb), "pb")
    fwd = joined.select(
        F.col("pa").alias("antecedent"),
        F.col("pb").alias("consequent"),
        "pn", "na", "nb",
    )
    rev = joined.select(
        F.col("pb").alias("antecedent"),
        F.col("pa").alias("consequent"),
        "pn",
        F.col("nb").alias("na"),
        F.col("na").alias("nb"),
    )
    rules = fwd.unionByName(rev).crossJoin(F.broadcast(total))
    return rules.select(
        "antecedent",
        "consequent",
        F.col("pn").cast("long").alias("support_n"),
        (F.col("pn").cast("double") / F.col("na")).alias("confidence"),
        (
            (F.col("pn") * F.col("n_orders")).cast("double")
            / (F.col("na") * F.col("nb"))
        ).alias("lift"),
    )


@register(
    "user_feature_vector",
    """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
       CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
       CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(MAX(FLOOR(epoch(ts))) AS BIGINT) AS last_seen_sec,
       CAST(COUNT(DISTINCT CAST(FLOOR(epoch(ts)/86400.0) AS BIGINT)) AS BIGINT)
         AS active_days
FROM events
WHERE user_id IS NOT NULL AND ts IS NOT NULL
GROUP BY user_id
""",
    "per-entity feature engineering in ONE pass (the feature-store "
    "materialization shape): event counts by type (conditional "
    "aggregates, not a pivot's wide shuffle), monetary sum in exact "
    "cents, recency, and distinct active days — all fold in a single "
    "groupBy with map-side partial aggregation (the distinct-days "
    "count runs as Spark's standard two-phase distinct aggregate), so "
    "the per-user feature table materializes with one shuffle of "
    "partial states however wide the event log gets",
    tags=("analytics", "features"),
)
def q_user_feature_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_star_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    sec = F.col("ts").cast("long")

    def n_of(t: str):
        return F.count(F.when(F.col("event_type") == t, 1)).cast("long")

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        n_of("click").alias("n_click"),
        n_of("view").alias("n_view"),
        n_of("purchase").alias("n_purchase"),
        n_of("error").alias("n_error"),
        n_of("signup").alias("n_signup"),
        F.sum(_cents(F.col("value"))).cast("long").alias("value_cents"),
        F.max(sec).cast("long").alias("last_seen_sec"),
        F.countDistinct(F.floor(sec / 86400.0).cast("long"))
        .cast("long")
        .alias("active_days"),
    )
