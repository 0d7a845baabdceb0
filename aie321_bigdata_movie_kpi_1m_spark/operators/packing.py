"""Sequence packing: assign documents to fixed token-budget bins — the
step that turns a filtered corpus into dense training shards (every bin
becomes one training sequence / file of ~budget tokens).

Scale shape: a single global greedy pack would serialize on one ordered
window, so packing is sharded — documents hash into ``n_shards``
independent streams and each shard packs its own documents in
deterministic id order (one window per shard, all shards in parallel).
That is exactly how a 1000-executor packer runs: the shard is the unit
of parallelism, the bin is the unit of output.

Semantics: contiguous greedy fill.  A document's bin is
``floor(cumulative_tokens_before_it / budget)`` within its shard; a
document longer than the remaining budget starts in the current bin and
spills into the next (document *splitting* is the consumer's concern —
the assignment is the engine contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def pack_sequences(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    n_shards: int = 4,
) -> DataFrame:
    """Per-document packing assignment: (doc_id, shard, bin_id, n_tokens).

    Deterministic and engine-portable: shard = id % n_shards (portable
    unlike a seeded hash; swap in ``xxhash64`` for production key
    balance), packing order = id order within the shard.
    """
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(
            F.col(id_col),
            F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
            F.size(tokens(text_col)).cast("long").alias("n_tokens"),
        )
        .withColumn(
            "bin_id",
            F.floor(
                F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / F.lit(budget)
            ).cast("long"),
        )
        .select(id_col, "shard", "bin_id", "n_tokens")
    )


def bin_fill_stats(packed: DataFrame, *, budget: int = 512) -> DataFrame:
    """Roll packing assignments up to bins: docs per bin, token fill, and
    fill ratio vs the budget (the shard-quality metric packers tune)."""
    return packed.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.round(F.sum("n_tokens") / F.lit(budget), 4).alias("fill_ratio"),
    )
