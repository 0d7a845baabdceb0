from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from aie321_bigdata_movie_kpi_1m_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# Bench-scale parity tier: sf0.1 parity once caught a range-partition
# sampling bug in assign_contiguous_ids invisible at sf0.001/sf0.01, so
# the tier stays available — but it is OPT-IN since r16
# (SPARK_GRAFT_PARITY_BENCH=1): it alone costs ~15+ min of Spark work
# and the driver's pytest budget truncated the default suite at ~12%
# (VERIFY_r15 tests_ok:false), while the driver separately benches at
# sf0.1 every round.  Run it (plus `-o addopts=""` for the slow marker
# tier) as pre-round validation.
import os  # noqa: E402

# gitignored scratch layer; the harness may wipe it between sessions
os.makedirs(REPO_ROOT / ".scratch", exist_ok=True)

PARITY_SFS = [SF_SMOKE]
# sf0.01 tier (~12 min of Spark+DuckDB work): opt-OUT since r16 — the
# default driver-budget tier keeps full per-query parity at sf0.001;
# scale-sensitive drift (FP rounding boundaries, LSH band misses) is
# re-checked at sf0.01/sf0.1 in the pre-round validation runs
if os.environ.get("SPARK_GRAFT_PARITY_ORACLE", "0").lower() not in ("0", "", "false"):
    PARITY_SFS.append(SF_ORACLE)
if os.environ.get("SPARK_GRAFT_PARITY_BENCH", "0").lower() not in ("0", "", "false"):
    PARITY_SFS.append("/root/testdata/sf0.1")


from contextlib import contextmanager  # noqa: E402


@contextmanager
def override_confs(spark, overrides: dict[str, str]):
    """Set session confs for the block, restoring previous values (or
    unset state) after.  Shared by plan-shape tests (which assert under
    both AQE settings) and state-store parity tests — one copy of the
    unset-vs-set restore semantics."""
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="aie321-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
