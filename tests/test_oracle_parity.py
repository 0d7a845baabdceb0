"""Every catalog query must match its DuckDB oracle exactly (the local,
stricter replica of the driver's t2 correctness gate)."""

from __future__ import annotations

import pytest

from aie321_bigdata_movie_kpi_1m_spark.plans.catalog import CATALOG

from .oracle_harness import run_compare

pytestmark = pytest.mark.usefixtures("spark")


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_oracle_parity_smoke_sf(spark, sf_dir, name):
    problems = run_compare(spark, sf_dir, name)
    assert not problems, f"{name}: " + "; ".join(problems)
