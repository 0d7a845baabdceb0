"""Canonical StructTypes.

The reference infers every schema at runtime (pandas CSV inference at
ingest.py:64, DDL generated from an empty DataFrame head at
ingest.py:32-38 / transform.py:47-54).  Inference is nondeterministic at
scale, so this engine declares schemas once and lets them travel with the
DataFrame.

Two families:
- the movie model (raw -> cleaned -> exploded -> summary), matching the
  reference's column surface (transform.py:107-113, 148-157, 192-195);
- the driver's synthetic star schema (TPC-H-ish) used by the correctness
  harness (/root/testdata, TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Movie model
# ---------------------------------------------------------------------------

#: Columns the reference parses from comma-separated strings into lists
#: (transform.py:96-98).  Only the first two survive projection.
LIST_COLUMNS = [
    "genres",
    "production_countries",
    "production_companies",
    "spoken_languages",
    "cast",
    "writers",
    "producers",
]

#: Columns the reference coerces to numeric (transform.py:100-102).
NUMERIC_COLUMNS = [
    "revenue",
    "budget",
    "runtime",
    "vote_count",
    "imdb_votes",
    "imdb_rating",
    "popularity",
]

#: Raw layer: permissive all-string schema (schema-on-read posture of
#: ingest.py:64, made explicit).  Garbage flows through try_cast -> null
#: instead of failing the scan.
MOVIES_RAW_SCHEMA = T.StructType(
    [T.StructField("id", T.StringType())]
    + [
        T.StructField(name, T.StringType())
        for name in (
            "title",
            "original_title",
            "release_date",
            "status",
            "runtime",
            "budget",
            "revenue",
            "vote_average",
            "vote_count",
            "imdb_rating",
            "imdb_votes",
            "popularity",
            "original_language",
        )
    ]
    + [T.StructField(name, T.StringType()) for name in LIST_COLUMNS]
)

#: Cleaned fact table, 17 columns (transform.py:107-113).  ``vote_average``
#: is typed double here (documented deviation: the reference never coerces
#: it, transform.py:100).
MOVIE_FACTS_SCHEMA = T.StructType(
    [
        T.StructField("movie_fact_id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("original_title", T.StringType()),
        T.StructField("release_year", T.IntegerType()),
        T.StructField("release_date", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("runtime", T.DoubleType()),
        T.StructField("budget", T.DoubleType()),
        T.StructField("revenue", T.DoubleType()),
        T.StructField("vote_average", T.DoubleType()),
        T.StructField("vote_count", T.DoubleType()),
        T.StructField("imdb_rating", T.DoubleType()),
        T.StructField("imdb_votes", T.DoubleType()),
        T.StructField("popularity", T.DoubleType()),
        T.StructField("original_language", T.StringType()),
        T.StructField("genres_list", T.ArrayType(T.StringType())),
        T.StructField("production_countries_list", T.ArrayType(T.StringType())),
    ]
)

#: Genre-exploded fact, 8 columns (transform.py:148-157).
MOVIE_GENRE_FACT_SCHEMA = T.StructType(
    [
        T.StructField("movie_fact_id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("release_year", T.IntegerType()),
        T.StructField("revenue", T.DoubleType()),
        T.StructField("budget", T.DoubleType()),
        T.StructField("imdb_rating", T.DoubleType()),
        T.StructField("popularity", T.DoubleType()),
        T.StructField("genre_name", T.StringType()),
    ]
)

#: KPI summary, 3 columns (transform.py:190-197).
GENRE_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("genre_name", T.StringType()),
        T.StructField("average_revenue", T.DoubleType()),
        T.StructField("total_movies", T.LongType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver star schema (TESTDATA.md) — declared so reads never re-infer.
# ---------------------------------------------------------------------------

STAR_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

STAR_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            # canonical shape: a real timestamp.  The parquet file may store
            # TIMESTAMP(MICROS) (read directly) or TIMESTAMP(NANOS) (Spark
            # rejects it; sources.readers detects the footer logical type and
            # falls back to nanosAsLong + div-1000 via EVENTS_NANOS_SCHEMA).
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# Legacy events shape for TIMESTAMP(NANOS) parquet files: Spark's vectorized
# reader rejects nanos timestamps, so those files are read as long
# nanoseconds (spark.sql.legacy.parquet.nanosAsLong) and converted back to a
# TimestampType column by the reader (integer ``div 1000`` — ns epochs exceed
# 2^53, float division would lose precision).  Selected per-file by footer
# inspection in sources.readers._events_ts_unit.
EVENTS_NANOS_SCHEMA: T.StructType = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)
