"""Every catalog query must match its DuckDB oracle exactly (the local,
stricter replica of the driver's t2 correctness gate).

Runs at BOTH sf0.001 (fast smoke) and sf0.01 (the driver's own gate
scale) — scale-sensitive drift such as FP rounding boundaries or LSH
band misses only shows up with the bigger row counts.
"""

from __future__ import annotations

import pytest

from aie321_bigdata_movie_kpi_1m_spark.plans.catalog import CATALOG

from .conftest import PARITY_SFS, SF_ORACLE, SF_SMOKE
from .oracle_harness import run_compare

pytestmark = pytest.mark.usefixtures("spark")


@pytest.mark.parametrize(
    "sf", PARITY_SFS, ids=[p.rsplit("/", 1)[1] for p in PARITY_SFS]
)
@pytest.mark.parametrize("name", sorted(CATALOG))
def test_oracle_parity(spark, sf, name):
    problems = run_compare(spark, sf, name)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("sf", [SF_SMOKE, SF_ORACLE], ids=["sf0.001", "sf0.01"])
def test_events_ts_unit_canary(spark, sf):
    """Canary for timestamp-unit drift in the raw events table.

    The testdata generator has shipped ``events.ts`` as both
    TIMESTAMP(NANOS) and TIMESTAMP(MICROS); a unit mix-up in the reader
    scales every timestamp 1000x and breaks ~10 downstream queries at
    once (round-2 regression).  This asserts min/max/span parity of the
    RAW column against DuckDB so the unit bug fails loudly here first.
    """
    from pyspark.sql import functions as F

    from aie321_bigdata_movie_kpi_1m_spark.sources.readers import load_star_table

    from .oracle_harness import duckdb_connection

    row = (
        load_star_table(spark, sf, "events")
        .agg(
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    con = duckdb_connection(sf)
    try:
        lo, hi, n = con.execute(
            "SELECT min(ts), max(ts), count(*) FROM events"
        ).fetchone()
    finally:
        con.close()
    assert row["n"] == n
    # parity to the second is unit-proof: a 1000x error shifts min/max by
    # decades; sub-second truncation differences (ns->us) are tolerated
    assert abs((row["lo"] - lo).total_seconds()) < 1, (row["lo"], lo)
    assert abs((row["hi"] - hi).total_seconds()) < 1, (row["hi"], hi)
    span = (row["hi"] - row["lo"]).total_seconds()
    oracle_span = (hi - lo).total_seconds()
    assert abs(span - oracle_span) < 1, (span, oracle_span)
