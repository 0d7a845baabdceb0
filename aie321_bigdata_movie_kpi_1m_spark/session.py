"""SparkSession factory.

Replaces the reference's implicit "runtime" (a single pandas process,
``run_pipeline.py:22-59``) with a configured Spark session.  Defaults are
chosen for the local[32] test harness but every knob scales: AQE handles
runtime re-planning/skew on a real cluster, shuffle partitions follow the
available parallelism, and Arrow makes any unavoidable pandas exchange
vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def scratch_dir(*parts: str) -> str:
    """Path under the repo-local ``.scratch`` layer (sink round-trip
    queries write here), derived from the package location so any
    checkout works — not a hardcoded absolute path.  Ensures the root
    exists: it is gitignored and the harness wipes it between sessions,
    and while Spark writers create missing parents, ``tempfile`` with an
    explicit ``dir=`` does not."""
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
    )
    os.makedirs(root, exist_ok=True)
    return os.path.join(root, *parts) if parts else root


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Make this package importable in Python workers of an
    already-running session.

    ``get_spark`` exports PYTHONPATH before the JVM starts, but a session
    built elsewhere (the driver harness's own) launches workers without
    it; operators whose closures reference package-level functions
    (mapInPandas decode, etc.) would fail to unpickle.  Zipping the
    package once per session and ``addPyFile``-ing it covers that case —
    workers insert the zip into sys.path.
    """
    sc = spark.sparkContext
    marker = "_aie321_pkg_shipped"
    if getattr(sc, marker, False):
        return
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    staging = tempfile.mkdtemp(prefix="aie321_pkg_")
    zip_base = os.path.join(staging, os.path.basename(pkg_dir))
    archive = shutil.make_archive(zip_base, "zip", os.path.dirname(pkg_dir),
                                  os.path.basename(pkg_dir))
    sc.addPyFile(archive)
    setattr(sc, marker, True)


#: Streaming state-store confs for production deployments: RocksDB keeps
#: state off-heap and spillable (the default HDFSBackedStateStoreProvider
#: holds every key in executor heap — the thing that OOMs a 100 TB
#: streaming dedup), and changelog checkpointing uploads per-batch deltas
#: instead of full snapshots.  Per-QUERY: the provider is frozen from
#: session conf at query start, so set these before ``start()`` (pass as
#: ``extra_conf`` to ``get_spark`` or ``spark.conf.set`` them).  Tests
#: keep the default provider (faster per-batch at toy state sizes) and
#: pin RocksDB equivalence separately.
ROCKSDB_STATE_CONFS: dict[str, str] = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


def get_spark(
    app_name: str = "aie321-movie-kpi-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Scale posture:
    - AQE on: runtime partition coalescing + skew-join splitting, so the
      same plans survive a 100x scale-up without retuning.
    - ``shuffle_partitions`` sized to local cores here; on a cluster this
      is the one knob to raise (or leave to AQE's coalescing with a high
      initial value).
    - ANSI mode stays at the Spark 4 default (enabled); coerce-to-null
      semantics (the reference's ``errors='coerce'``, transform.py:100-102)
      are expressed explicitly with ``try_cast`` so nothing depends on
      legacy silent casts.
    """
    # Python workers unpickle package-level closures (mapInPandas /
    # pandas_udf stages) by module reference, so the package root must be
    # importable in the worker no matter where the driver process started.
    # PYTHONPATH is inherited by workers launched after session start.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if pkg_root not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + os.pathsep + os.environ["PYTHONPATH"]
            if os.environ.get("PYTHONPATH")
            else pkg_root
        )

    scratch_dir()  # recreate the scratch layer (wiped between sessions)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # legacy TIMESTAMP(NANOS) parquet support: Spark's vectorized
        # reader rejects nanos timestamps outright, so allow reading them
        # as long nanoseconds.  The loader (sources.readers) detects the
        # actual footer logical type per file and only takes the nanos
        # path for genuine TIMESTAMP(NANOS) files; this conf is inert for
        # standard TIMESTAMP(MICROS) data.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # keep driver results honest: sinks iterate, they don't giant-collect
        .config("spark.driver.maxResultSize", "2g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
