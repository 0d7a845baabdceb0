"""Full-catalog sweep under a PLAIN SparkSession — the driver simulation.

The correctness driver consumes ``__spark_entry__`` from its OWN
unconfigured session (``SparkSession.builder.master(...).getOrCreate()``,
none of ``session.get_spark``'s confs).  Two past failures were visible
ONLY this way: TIMESTAMP(NANOS) events scans (needed nanosAsLong, now set
at read time by sources.readers) and mapInPandas closures referencing
package functions (now shipped via ensure_package_on_workers).  This test
pins that whole failure class: every catalog query must run end-to-end in
a fresh subprocess whose session gets no engine confs at all.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parents[1])


def test_full_catalog_under_plain_driver_session():
    script = textwrap.dedent(
        f"""
        import sys
        sys.path.insert(0, {REPO_ROOT!r})
        from pyspark.sql import SparkSession

        # the driver's session: master + app name only — NO engine confs
        # (shuffle partitions stay at the 200 default; AQE coalesces)
        spark = (
            SparkSession.builder.master("local[8]")
            .appName("plain-driver-sim")
            .config("spark.ui.enabled", "false")  # sandbox hygiene only
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")

        import __spark_entry__ as contract

        assert contract.entry(spark).count() >= 0
        qs = contract.queries()
        osql = contract.oracle_sql()
        missing = sorted(set(qs) - set(osql))
        assert not missing, f"queries without oracle SQL: {{missing}}"

        failed = {{}}
        for name in sorted(qs):
            try:
                qs[name](spark, "/root/testdata/sf0.001").count()
            except Exception as e:  # noqa: BLE001 — collect, report all
                failed[name] = repr(e)[:300]
        assert not failed, f"{{len(failed)}} queries died: {{failed}}"
        print("PLAIN_SESSION_OK", len(qs))
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "PLAIN_SESSION_OK" in proc.stdout
