"""Deterministic "dirty movies_raw" view derived from the star schema.

The correctness harness runs on the driver's TPC-H-ish tables
(TESTDATA.md), not on movie CSVs — so to get DuckDB-oracle coverage of the
*actual* reference pipeline semantics (parse/coerce/derive/filter/explode/
agg, transform.py:80-207), this module derives a movies_raw-shaped table
from ``part`` twice, in lockstep:

- ``movies_raw_from_star``: Spark DataFrame expression,
- ``MOVIES_RAW_ORACLE_CTE``: the byte-equivalent DuckDB SQL.

Both derivations are pure integer/modulo/string arithmetic on
``p_partkey`` (deterministic, order-free) and inject exactly the dirty
values FIXTURES.md §5 demands: NULLs, empty strings, whitespace-only
lists, non-numeric garbage ('abc', 'N/A', 'oops'), malformed dates
('garbage'), zero revenue (the ``> 0`` boundary), and duplicate list
tokens.

Numeric-portability rules used throughout this repo's oracles:
- double -> string roundtrips are FORBIDDEN (engines format differently);
  every stringified numeric is integer-derived.
- double -> int conversions go through explicit FLOOR (DuckDB CAST rounds,
  Spark CAST truncates — FLOOR is identical in both).
- aggregated measures are integral-valued doubles where possible, so sums
  are exact (< 2^53) and order-independent across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_star_table


def movies_raw_from_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Movies_raw-shaped DataFrame (all-string measure columns + dirty
    values) derived from ``part``.  Keep in lockstep with
    ``MOVIES_RAW_ORACLE_CTE`` below."""
    k = F.col("p_partkey")
    part = load_star_table(spark, sf_dir, "part")
    return part.select(
        F.when(k % 53 == 0, None).otherwise(k.cast("string")).alias("id"),
        F.col("p_name").alias("title"),
        F.upper("p_name").alias("original_title"),
        F.when(k % 11 == 0, None)
        .when(k % 7 == 0, F.lit("garbage"))
        .otherwise(
            F.concat(
                (k % 40 + 1980).cast("string"),
                F.lit("-"),
                F.lpad((k % 12 + 1).cast("string"), 2, "0"),
                F.lit("-15"),
            )
        )
        .alias("release_date"),
        F.when(k % 4 == 0, F.lit("Released"))
        .when(k % 4 == 1, F.lit("Post Production"))
        .when(k % 4 == 2, F.lit("Rumored"))
        .otherwise(F.lit("Canceled"))
        .alias("status"),
        F.when(k % 13 == 0, F.lit("abc"))
        .when(k % 17 == 0, F.lit(""))
        .otherwise((k % 120 + 60).cast("string"))
        .alias("runtime"),
        F.when(k % 23 == 0, None)
        .when(k % 10 == 0, F.lit("0"))
        .otherwise((F.col("p_size").cast("long") * 1000000).cast("string"))
        .alias("budget"),
        F.when(k % 19 == 0, None)
        .when(k % 5 == 0, F.lit("0"))
        .otherwise(
            F.floor(F.col("p_retailprice") * 1000).cast("long").cast("string")
        )
        .alias("revenue"),
        (k % 100).cast("string").alias("vote_average"),
        F.when(k % 31 == 0, None)
        .otherwise(((k * 7) % 5000).cast("string"))
        .alias("vote_count"),
        F.when(k % 3 == 0, None)
        .when(k % 29 == 0, F.lit("N/A"))
        .otherwise((k % 90).cast("string"))
        .alias("imdb_rating"),
        ((k * 13) % 100000).cast("string").alias("imdb_votes"),
        F.when(k % 41 == 0, F.lit("oops"))
        .otherwise(((k * 17) % 1000).cast("string"))
        .alias("popularity"),
        F.when(k % 3 == 0, F.lit("en"))
        .when(k % 3 == 1, F.lit("fr"))
        .otherwise(F.lit("ja"))
        .alias("original_language"),
        F.when(k % 17 == 0, None)
        .when(k % 19 == 0, F.lit(""))
        .when(k % 23 == 0, F.lit("   "))
        .when(
            k % 2 == 0,
            F.concat(
                F.col("p_type"),
                F.lit(", "),
                F.regexp_replace(F.col("p_name"), " ", ","),
                F.lit(","),
            ),
        )
        .otherwise(F.regexp_replace(F.col("p_name"), " ", " , "))
        .alias("genres"),
        F.when(k % 13 == 0, None)
        .when(k % 5 == 0, F.lit("US,FR"))
        .when(k % 5 == 1, F.lit(" US , DE ,"))
        .when(k % 5 == 2, F.lit("JP"))
        .when(k % 5 == 3, F.lit("US,US"))
        .otherwise(F.lit("GB, FR"))
        .alias("production_countries"),
        F.col("p_brand").alias("production_companies"),
        F.col("p_brand").alias("spoken_languages"),
        F.col("p_brand").alias("cast"),
        F.col("p_brand").alias("writers"),
        F.col("p_brand").alias("producers"),
    )


#: DuckDB CTE defining the same movies_raw (keep in lockstep with
#: ``movies_raw_from_star``).
MOVIES_RAW_ORACLE_CTE = """
WITH movies_raw AS (
  SELECT
    CASE WHEN p_partkey % 53 = 0 THEN NULL ELSE CAST(p_partkey AS VARCHAR) END AS id,
    p_name AS title,
    upper(p_name) AS original_title,
    CASE WHEN p_partkey % 11 = 0 THEN NULL
         WHEN p_partkey % 7 = 0 THEN 'garbage'
         ELSE CAST(p_partkey % 40 + 1980 AS VARCHAR) || '-' ||
              lpad(CAST(p_partkey % 12 + 1 AS VARCHAR), 2, '0') || '-15'
    END AS release_date,
    CASE WHEN p_partkey % 4 = 0 THEN 'Released'
         WHEN p_partkey % 4 = 1 THEN 'Post Production'
         WHEN p_partkey % 4 = 2 THEN 'Rumored'
         ELSE 'Canceled' END AS status,
    CASE WHEN p_partkey % 13 = 0 THEN 'abc'
         WHEN p_partkey % 17 = 0 THEN ''
         ELSE CAST(p_partkey % 120 + 60 AS VARCHAR) END AS runtime,
    CASE WHEN p_partkey % 23 = 0 THEN NULL
         WHEN p_partkey % 10 = 0 THEN '0'
         ELSE CAST(CAST(p_size AS BIGINT) * 1000000 AS VARCHAR) END AS budget,
    CASE WHEN p_partkey % 19 = 0 THEN NULL
         WHEN p_partkey % 5 = 0 THEN '0'
         ELSE CAST(CAST(FLOOR(p_retailprice * 1000) AS BIGINT) AS VARCHAR) END AS revenue,
    CAST(p_partkey % 100 AS VARCHAR) AS vote_average,
    CASE WHEN p_partkey % 31 = 0 THEN NULL
         ELSE CAST((p_partkey * 7) % 5000 AS VARCHAR) END AS vote_count,
    CASE WHEN p_partkey % 3 = 0 THEN NULL
         WHEN p_partkey % 29 = 0 THEN 'N/A'
         ELSE CAST(p_partkey % 90 AS VARCHAR) END AS imdb_rating,
    CAST((p_partkey * 13) % 100000 AS VARCHAR) AS imdb_votes,
    CASE WHEN p_partkey % 41 = 0 THEN 'oops'
         ELSE CAST((p_partkey * 17) % 1000 AS VARCHAR) END AS popularity,
    CASE WHEN p_partkey % 3 = 0 THEN 'en'
         WHEN p_partkey % 3 = 1 THEN 'fr'
         ELSE 'ja' END AS original_language,
    CASE WHEN p_partkey % 17 = 0 THEN NULL
         WHEN p_partkey % 19 = 0 THEN ''
         WHEN p_partkey % 23 = 0 THEN '   '
         WHEN p_partkey % 2 = 0 THEN p_type || ', ' || replace(p_name, ' ', ',') || ','
         ELSE replace(p_name, ' ', ' , ') END AS genres,
    CASE WHEN p_partkey % 13 = 0 THEN NULL
         WHEN p_partkey % 5 = 0 THEN 'US,FR'
         WHEN p_partkey % 5 = 1 THEN ' US , DE ,'
         WHEN p_partkey % 5 = 2 THEN 'JP'
         WHEN p_partkey % 5 = 3 THEN 'US,US'
         ELSE 'GB, FR' END AS production_countries,
    p_brand AS production_companies,
    p_brand AS spoken_languages,
    p_brand AS "cast",
    p_brand AS writers,
    p_brand AS producers
  FROM part
)
"""

#: DuckDB CTE for the cleaned + quality-filtered fact table (the oracle
#: twin of operators.kpi.build_movie_facts; arrays stay real lists here).
MOVIE_FACTS_ORACLE_CTE = (
    MOVIES_RAW_ORACLE_CTE
    + """,
movie_facts AS (
  SELECT
    TRY_CAST(id AS BIGINT) AS movie_fact_id,
    title,
    original_title,
    CAST(year(TRY_CAST(release_date AS TIMESTAMP)) AS INTEGER) AS release_year,
    release_date,
    status,
    TRY_CAST(runtime AS DOUBLE) AS runtime,
    TRY_CAST(budget AS DOUBLE) AS budget,
    TRY_CAST(revenue AS DOUBLE) AS revenue,
    TRY_CAST(vote_average AS DOUBLE) AS vote_average,
    TRY_CAST(vote_count AS DOUBLE) AS vote_count,
    TRY_CAST(imdb_rating AS DOUBLE) AS imdb_rating,
    TRY_CAST(imdb_votes AS DOUBLE) AS imdb_votes,
    TRY_CAST(popularity AS DOUBLE) AS popularity,
    original_language,
    list_filter(list_transform(string_split(coalesce(genres, ''), ','), x -> trim(x)),
                x -> x <> '') AS genres_list,
    list_filter(list_transform(string_split(coalesce(production_countries, ''), ','), x -> trim(x)),
                x -> x <> '') AS production_countries_list
  FROM movies_raw
  WHERE TRY_CAST(imdb_rating AS DOUBLE) IS NOT NULL
)
"""
)

#: DuckDB CTE for the genre-exploded fact (twin of build_movie_genre_fact).
MOVIE_GENRE_FACT_ORACLE_CTE = (
    MOVIE_FACTS_ORACLE_CTE
    + """,
movie_genre_fact AS (
  SELECT movie_fact_id, title, release_year, revenue, budget, imdb_rating,
         popularity, genre_name
  FROM (
    SELECT *, unnest(genres_list) AS genre_name FROM movie_facts
  )
  WHERE genre_name IS NOT NULL AND genre_name <> ''
)
"""
)
