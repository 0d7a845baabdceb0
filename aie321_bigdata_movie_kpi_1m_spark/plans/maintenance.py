"""Tier-agnostic AUTO-MAINTENANCE GOVERNOR for stream-maintained index
groups — ONE implementation shared by all three index families (token
postings, ANN assignments, near-dup buckets), closing the production
loop each tier's pieces support: a streaming sink applies micro-batches
O(delta), small appends and merge-on-read delete entries accumulate,
and the governor periodically consults the METADATA-ONLY advisor and
executes the tier's maintainer only when the sweep warrants work.

The governor knows nothing tier-specific: the tier passes its
``maintainer(spark, group, target_rows_per_file=...) -> {layer:
actions}`` (``maintain_token_index`` / ``maintain_ann_assignments`` /
``maintain_neardup_index``) and, for single-layer groups without a pin
catalog, the explicit ``plan_paths`` to sweep.  Maintenance itself runs
under each tier's own pin/txn discipline, so a reader racing the stream
never sees a torn cycle — the governor only decides WHEN.

No counterpart in the reference (the 584-LoC pandas pipeline has no
indexes and no streams); this is the scheduler glue a 100 TB
continuously-ingesting deployment runs inside its sink.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import SparkSession

#: advisor actions that warrant running the maintainer
_WARRANTING = ("compact_small_files", "fold_deletes")


def recluster_if_dull(
    spark: SparkSession,
    path: str,
    serving_col: str,
    *,
    stats_cols: list[str],
    target_rows_per_file: int = 100_000,
) -> bool:
    """ACT on the advisor's layout signal for one index layer: when the
    layer's SERVING column (the one its probes range-prune on — token /
    rot / bkey / cell) appears in a ``cluster`` or ``zorder``
    recommendation, rewrite the layer range-clustered on it
    (``rewrite_snapshot(cluster_by=...)`` — per-file [min, max]
    narrows, blooms regenerate under the pinned parameters).

    Interleaved O(delta) appends are each internally clustered but
    straddle EACH OTHER, so after enough churn every interval probe
    admits every file — compaction alone packs bytes without restoring
    the layout.  The serving column is fixed per layer by its query
    shape, so a multi-dimensional ``zorder`` recommendation still
    re-clusters on the serving column here (restoring the probes the
    layer exists for) and leaves the Morton rewrite as an operator
    decision.  Returns True when a rewrite ran."""
    from ..sources.snapshots import (
        _maintenance_plan_rows,
        rewrite_snapshot,
    )

    dull: set[str] = set()
    total_rows = 0
    for r in _maintenance_plan_rows(
        spark, path, target_rows_per_file=target_rows_per_file
    ):
        if r[0] == "cluster" and r[1]:
            dull.add(str(r[1]))
            total_rows = max(total_rows, int(r[3] or 0))
        elif r[0] == "zorder" and r[1]:
            dull.update(str(r[1]).split(","))
            total_rows = max(total_rows, int(r[3] or 0))
    if serving_col not in dull:
        return False
    # rows-scaled output sizing, the same file-size contract the
    # layer's appends follow (the advisor row carries the live total)
    rewrite_snapshot(
        spark,
        path,
        cluster_by=serving_col,
        stats_cols=stats_cols,
        n_files=max(
            1, -(-total_rows // max(1, int(target_rows_per_file)))
        ),
    )
    return True


def auto_maintenance_hook(
    spark: SparkSession,
    group: str,
    maintainer: Callable[..., dict],
    *,
    plan_paths: list[str] | None = None,
    every_n: int = 2,
    target_rows_per_file: int = 100_000,
):
    """Returns ``(on_batch, stats)``: the sink's ``foreachBatch`` calls
    ``on_batch()`` AFTER each applied micro-batch.  Every ``every_n``
    batches the governor sweeps the advisor — ``catalog_maintenance_
    plan`` over the group's pin catalog when ``plan_paths`` is None
    (multi-layer groups: the pin set IS a table catalog, one sweep,
    zero data reads), else ``snapshot_maintenance_plan`` per listed
    layer (single-layer groups like the near-dup bucket index) — and
    runs ``maintainer`` only when the sweep warrants compaction or
    delete folding.

    ``stats`` (shared, mutated in place) counts batches, sweeps,
    maintenance runs, and actions taken — the observability a
    scheduler (and the pytests) pin on."""
    stats = {"batches": 0, "sweeps": 0, "maintenance_runs": 0, "actions": 0}

    def on_batch() -> dict:
        stats["batches"] += 1
        if stats["batches"] % max(1, every_n):
            return stats
        stats["sweeps"] += 1
        if plan_paths is None:
            from ..sources.table_catalog import catalog_maintenance_plan

            actions = {
                r["action"]
                for r in catalog_maintenance_plan(
                    spark, group, target_rows_per_file=target_rows_per_file
                ).collect()
            }
        else:
            # pure-Python advisor rows (tuples lead with the action):
            # a per-batch sweep must not pay a Spark job per layer
            from ..sources.snapshots import _maintenance_plan_rows

            actions = {
                r[0]
                for p in plan_paths
                for r in _maintenance_plan_rows(
                    spark, p, target_rows_per_file=target_rows_per_file
                )
            }
        if not actions & set(_WARRANTING):
            return stats
        taken = maintainer(
            spark, group, target_rows_per_file=target_rows_per_file
        )
        stats["maintenance_runs"] += 1
        stats["actions"] += sum(len(v) for v in taken.values())
        return stats

    return on_batch, stats
