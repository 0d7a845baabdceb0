"""SQL-surface parity: the engine's design promise (SURVEY.md §7) that
every capability is also expressible as Spark SQL text over temp views —
no capability is locked behind the Python DataFrame API.

Representative coverage: the flagship KPI, a §2.8 join, and a window
query, each written as plain Spark SQL and compared row-for-row against
the DataFrame plan.  Plus the HLL sketch's error bound vs exact distinct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aie321_bigdata_movie_kpi_1m_spark.plans.catalog import CATALOG
from aie321_bigdata_movie_kpi_1m_spark.plans.movie_view import movies_raw_from_star
from aie321_bigdata_movie_kpi_1m_spark.sources.readers import load_star_table

SF = "/root/testdata/sf0.001"


def rows_of(df):
    return {tuple(r) for r in df.collect()}


def test_flagship_kpi_as_spark_sql(spark):
    movies_raw_from_star(spark, SF).createOrReplaceTempView("movies_raw")
    sql = spark.sql(
        """
        WITH facts AS (
          SELECT try_cast(id AS bigint) AS movie_fact_id,
                 try_cast(revenue AS string) AS revenue_s,
                 try_cast(revenue AS double) AS revenue,
                 try_cast(imdb_rating AS double) AS imdb_rating,
                 filter(transform(split(coalesce(genres, ''), ','), x -> trim(x)),
                        x -> x != '') AS genres_list
          FROM movies_raw
        ),
        exploded AS (
          SELECT movie_fact_id, revenue, explode(genres_list) AS genre_name
          FROM facts WHERE imdb_rating IS NOT NULL
        )
        SELECT genre_name,
               ROUND(AVG(revenue), 4) AS average_revenue,
               COUNT(movie_fact_id) AS total_movies
        FROM exploded
        WHERE revenue IS NOT NULL AND revenue > 0
        GROUP BY genre_name
        """
    )
    assert rows_of(sql) == rows_of(CATALOG["genre_avg_revenue"].fn(spark, SF))


def test_window_query_as_spark_sql(spark):
    load_star_table(spark, SF, "orders").createOrReplaceTempView("orders_v")
    sql = spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               row_number() OVER w AS order_rank,
               CAST(FLOOR(o_totalprice * 100) AS bigint) AS totalprice_cents,
               lag(CAST(FLOOR(o_totalprice * 100) AS bigint)) OVER w
                   AS prev_totalprice_cents,
               SUM(CAST(FLOOR(o_totalprice * 100) AS bigint))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS running_cents
        FROM orders_v
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """
    )
    assert rows_of(sql) == rows_of(CATALOG["window_customer_orders"].fn(spark, SF))


def test_approx_distinct_error_bound(spark):
    # raw HLL++ estimates vs exact (the catalog query now exposes only
    # the oracle-checkable exact counts + within-3sd booleans, so the
    # raw-error bound is asserted here on the aggregates directly)
    rows = {
        r["l_returnflag"]: r
        for r in load_star_table(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
        )
        .collect()
    }
    assert rows
    for k, r in rows.items():
        for a, e in (
            (r["approx_parts"], r["n_parts"]),
            (r["approx_suppliers"], r["n_suppliers"]),
        ):
            assert abs(a - e) / e < 0.1, f"{k}: HLL estimate {a} vs exact {e}"
    # and the catalog query's own assertions must hold
    flags = CATALOG["approx_distinct_sketch"].fn(spark, SF).collect()
    assert all(r["parts_within_3sd"] and r["suppliers_within_3sd"] for r in flags)
