"""Evaluate-once materialization barrier for expensive subtrees.

Spark re-plans a DataFrame subtree once per consumer: AQE's exchange
reuse recovers the map side of a duplicated aggregation, but the
reduce-side final aggregate and everything above it re-runs per
consumer, and subtrees under differing projections are not deduped at
all.  The r15 round materialized such subtrees with
``localCheckpoint(eager=False)``; the r15 advisor and verdict both
flagged the fault-tolerance trade — a local checkpoint truncates
lineage onto executor-local blocks with NO recompute path, so on a
real cluster an executor loss mid-query kills the job instead of
retrying the task.

``materialize(df)`` is the one place that trade is made.  Strategies
(``SPARK_GRAFT_MATERIALIZE`` env, default ``checkpoint``):

- ``checkpoint`` (default): ``localCheckpoint(eager=False)``.  Chosen
  default for two reasons beyond speed.  (1) MEASUREMENT HONESTY: a
  ``persist()`` registers the subtree in the session CacheManager,
  which matches by analyzed-plan equality — a SECOND invocation of the
  same query function in one session (the bench's best-of-2, any
  repeated call) would silently serve run 1's materialized blocks,
  i.e. cross-invocation result caching, which the bench contract
  forbids (every invocation must compute from the parquet inputs).  A
  local checkpoint is per-DataFrame-instance: each invocation
  materializes afresh and blocks are reclaimed when the plan is
  GC'd.  (2) At corpus scale, parking multi-TB intermediates in
  storage memory across unrelated queries is its own stability hazard.
- ``persist``: ``persist(MEMORY_AND_DISK)`` — lineage kept, a lost
  executor's blocks recompute instead of failing the job, and repeated
  invocations share work BY DESIGN.  The right choice for a real
  cluster deployment that calls these operators as a library and wants
  fault tolerance (the advisor's ask); wrong for a benchmark that
  defines each call as a fresh computation.  The cluster trade is
  documented in OPTIMIZATION_r16.md with the sf0.1 A/B numbers.

Iterative operators (connected components' per-round label relation)
keep their explicit ``localCheckpoint`` calls: plan TRUNCATION is the
point there (the plan doubles per round otherwise), which persist does
not provide.
"""

from __future__ import annotations

import os
from collections import deque

from pyspark.sql import DataFrame

#: FIFO of live persisted barriers.  Nonce-salting makes every entry
#: unmatchable by later invocations, so without retirement the session
#: CacheManager would accumulate one dead entry per materialize() call
#: (planning-time lookup walks every registered entry, and dead blocks
#: squat in storage memory until LRU pressure).  Unpersisting an old
#: entry is ALWAYS safe: lineage is kept, so a consumer still holding
#: the plan just recomputes.  The cap is sized far above the number of
#: barriers any single query plan holds (max observed: 4).
_LIVE: deque[DataFrame] = deque()
_MAX_LIVE = 32


def materialize(df: DataFrame) -> DataFrame:
    """Return ``df`` behind an evaluate-once barrier (see module doc)."""
    mode = os.environ.get("SPARK_GRAFT_MATERIALIZE", "persist")
    if mode == "checkpoint":
        return df.localCheckpoint(eager=False)
    import uuid

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    # NONCE-SALTED persist: CacheManager substitutes a cached relation
    # into ANY later plan whose canonicalized subtree matches, so a bare
    # persist() would let a SECOND invocation of the same query function
    # silently serve the first invocation's blocks — cross-invocation
    # result reuse, which the bench contract forbids (every call must
    # compute from the parquet inputs).  A unique literal column, added
    # below the persist and projected away above it, makes each
    # invocation's cached plan unmatchable by any other invocation while
    # every consumer WITHIN the invocation (built over the returned df,
    # so containing the salted subtree) still hits the one cache entry.
    # The nonce must be the literal VALUE, not just the column name:
    # plan canonicalization strips names and expression ids but keeps
    # literal values, so only a unique value defeats the match.
    # Lineage is kept, so an evicted or lost block recomputes instead of
    # failing the job (the localCheckpoint trade the r15 advisor
    # flagged), and the cached data is COLUMNAR (InMemoryRelation) —
    # measurably faster to write and re-scan than the row-form RDD
    # blocks a localCheckpoint stores (r16 A/B in OPTIMIZATION_r16.md).
    nonce = f"__mat_{uuid.uuid4().hex}"
    salted = df.withColumn(nonce, F.lit(nonce)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    _LIVE.append(salted)
    while len(_LIVE) > _MAX_LIVE:
        try:
            _LIVE.popleft().unpersist(blocking=False)
        except Exception:
            pass  # stopped session / already unpersisted — nothing to free
    return salted.drop(nonce)
