"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`aie321_bigdata_movie_kpi_1m_spark.plans.catalog`,
the single registry of (Spark plan, DuckDB oracle) pairs.  The driver's
verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aie321_bigdata_movie_kpi_1m_spark.plans.catalog import CATALOG

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's headline
    KPI (genre_average_revenue, transform.py:177-197) computed through the
    full clean -> filter -> explode -> agg -> sort pipeline."""
    return CATALOG["genre_avg_revenue"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/capability (SURVEY.md §2)."""
    return {name: spec.fn for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted entries (oracle=None) are
    genuinely non-SQL-expressible and get the driver's rows-only check."""
    return {
        name: spec.oracle for name, spec in CATALOG.items() if spec.oracle is not None
    }
