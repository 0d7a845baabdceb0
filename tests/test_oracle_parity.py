"""Every catalog query must match its DuckDB oracle exactly (the local,
stricter replica of the driver's t2 correctness gate).

Runs at BOTH sf0.001 (fast smoke) and sf0.01 (the driver's own gate
scale) — scale-sensitive drift such as FP rounding boundaries or LSH
band misses only shows up with the bigger row counts.
"""

from __future__ import annotations

import pytest

from aie321_bigdata_movie_kpi_1m_spark.plans.catalog import CATALOG

from .conftest import SF_ORACLE, SF_SMOKE
from .oracle_harness import run_compare

pytestmark = pytest.mark.usefixtures("spark")


@pytest.mark.parametrize("sf", [SF_SMOKE, SF_ORACLE], ids=["sf0.001", "sf0.01"])
@pytest.mark.parametrize("name", sorted(CATALOG))
def test_oracle_parity(spark, sf, name):
    problems = run_compare(spark, sf, name)
    assert not problems, f"{name}: " + "; ".join(problems)
