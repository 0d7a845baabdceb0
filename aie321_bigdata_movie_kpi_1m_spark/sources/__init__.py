from .readers import load_star_table, read_csv, read_jdbc, read_parquet
from .sinks import bounded_export, write_parquet
from .snapshots import (
    commit_snapshot,
    delete_snapshot,
    read_snapshot,
    retry_commit,
    snapshot_changes,
    snapshot_changes_keyed,
    snapshot_history,
    snapshot_minmax,
    snapshot_row_count,
    snapshot_version_as_of,
    snapshot_versions,
    vacuum_snapshots,
)

__all__ = [
    "load_star_table",
    "read_csv",
    "read_jdbc",
    "read_parquet",
    "bounded_export",
    "write_parquet",
    "commit_snapshot",
    "delete_snapshot",
    "read_snapshot",
    "retry_commit",
    "snapshot_changes",
    "snapshot_changes_keyed",
    "snapshot_history",
    "snapshot_minmax",
    "snapshot_row_count",
    "snapshot_version_as_of",
    "snapshot_versions",
    "vacuum_snapshots",
]
