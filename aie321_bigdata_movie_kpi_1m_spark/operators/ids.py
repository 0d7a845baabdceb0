"""Contiguous global ID assignment without a single-partition sort.

The naive ``row_number() OVER (ORDER BY ...)`` collapses the whole table
into one task — the classic 100 TB killer.  The scalable idiom (the
DataFrame rendition of ``zipWithIndex``):

1. range-repartition on the FULL ordering key (so partition p holds a
   contiguous slice of the total order),
2. count rows per partition (one tiny agg — ``numPartitions`` rows reach
   the driver, same O(model-state) contract as an ML fit),
3. prefix-sum those counts into per-partition offsets, broadcast back,
4. ``row_number`` within each partition + offset = exact global rank.

The assigned IDs are independent of where the range sampler places
boundaries: any range partitioning that respects the total order yields
the same global rank, so the output is deterministic even though
partition sizes are sample-driven.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_contiguous_ids(
    df: DataFrame,
    order_by: list[Column | str],
    *,
    id_col: str = "stable_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense 0-based IDs in the total order of ``order_by``.

    ``order_by`` must be a total order (include a unique tie-break key);
    equal keys split across range-partition boundaries would otherwise
    make ranks of ties partition-dependent.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # PIN one materialization: repartitionByRange picks boundaries by
    # SAMPLING, so two executions of the same plan can place rows in
    # different partitions.  The sizes collect below and the final
    # window must see the SAME partitioning or the prefix-sum offsets
    # are wrong (observed at sf0.1: ids off by a few boundary rows).
    # On a cluster swap localCheckpoint for checkpoint()/persist to
    # reliable storage — the contract is identical.
    ranged = (
        df.repartitionByRange(parts, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # tiny: numPartitions rows; the only driver-side state in the op
    sizes = {
        r["__pid"]: r["n"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    offset_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in sorted(offsets.items()) for x in kv]
        ),
        F.col("__pid"),
    )
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        ranged.withColumn(
            id_col,
            (F.row_number().over(w) - 1 + offset_expr).cast("long"),
        )
        .drop("__pid")
    )
