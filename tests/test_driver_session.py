"""Full-catalog sweep under a PLAIN SparkSession — the driver simulation.

The correctness driver consumes ``__spark_entry__`` from its OWN
unconfigured session (``SparkSession.builder.master(...).getOrCreate()``,
none of ``session.get_spark``'s confs).  Two past failures were visible
ONLY this way: TIMESTAMP(NANOS) events scans (needed nanosAsLong, now set
at read time by sources.readers) and mapInPandas closures referencing
package functions (now shipped via ensure_package_on_workers).  This pins
that whole failure class: catalog queries must run end-to-end in a fresh
subprocess whose session gets no engine confs at all.

Two tiers (r16 — the full sweep alone ran ~10 min and the driver's
pytest budget truncated the suite): the DEFAULT tier sweeps one
representative query per execution-machinery family (raw-parquet scans,
events timestamps, pandas UDFs, mapInPandas, Python DataSources,
structured streaming, snapshot layers, persisted models) — each past
plain-session failure broke an entire family, so family coverage is
what the gate needs; the ``slow`` tier keeps the exhaustive 230-query
sweep for pre-round validation.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO_ROOT = str(Path(__file__).resolve().parents[1])

#: one query per plain-session failure FAMILY (the machinery named in
#: the comment), not per feature: a conf or closure-shipping regression
#: breaks every member of its family at once
_FAMILY_SAMPLE = [
    "movie_facts",            # raw parquet scan + core relational
    "events_rolling_7d",      # events TIMESTAMP(NANOS) scan (past failure)
    "doc_quality_score",      # pandas UDF / Arrow boundary
    "multimodal_features",    # mapInPandas closure shipping (past failure)
    "chunked_source_roundtrip",  # Python DataSource write+read
    "streaming_window_counts",   # structured streaming to memory sink
    "indexed_keyword_search",    # snapshot/token-index layer machinery
    "ann_ivf_topk",           # persisted model + vector pipeline
    "minhash_lsh_neardup",    # dedup operator + materialize barrier
    "dedup_clusters",         # iterative graph (localCheckpoint path)
]


def _run_plain_session(query_names: list[str] | None) -> None:
    names_expr = repr(query_names)
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

        names = {names_expr} or sorted(qs)
        unknown = sorted(set(names) - set(qs))
        assert not unknown, f"sample names not in catalog: {{unknown}}"
        failed = {{}}
        for name in names:
            try:
                qs[name](spark, "/root/testdata/sf0.001").count()
            except Exception as e:  # noqa: BLE001 — collect, report all
                failed[name] = repr(e)[:300]
        assert not failed, f"{{len(failed)}} queries died: {{failed}}"
        print("PLAIN_SESSION_OK", len(names))
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


def test_family_sample_under_plain_driver_session():
    _run_plain_session(_FAMILY_SAMPLE)


@pytest.mark.slow
def test_full_catalog_under_plain_driver_session():
    _run_plain_session(None)
