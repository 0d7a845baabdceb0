"""Storage-layout / warehouse-maintenance query surface: bucketed
co-located joins, scalable ID assignment, SCD2 merge, ORC interchange.

These are the operations that distinguish a 100 TB engine from a demo:
- bucketing pre-pays the join shuffle once at write time so every
  subsequent join/agg on the bucket key is exchange-free;
- contiguous ID assignment is the zipWithIndex idiom (range partition +
  offset prefix-sum), never a one-partition global sort;
- SCD2 merge is the declarative upsert every dimension pipeline runs;
- ORC completes the interchange matrix (parquet/csv/json/orc).

Scratch layers live under the repo-local ``.scratch`` like the other
roundtrip queries (sandbox boundary: never outside the repo).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import cents as _cents
from ..operators.ids import assign_contiguous_ids
from ..session import scratch_dir
from ..sources.readers import load_star_table
from .catalog import register

_SCRATCH = scratch_dir()


def _tag(sf_dir: str) -> str:
    """Filesystem/table-name-safe tag for one testdata scale."""
    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return re.sub(r"[^A-Za-z0-9_]", "_", base)


#: per-process fixture marker for the compaction query's shattered input
_COMPACT_INPUT_BUILT: set[str] = set()


@register(
    "bucketed_join_orders",
    """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c_mktsegment
""",
    "co-located join via bucketing: orders and customer are written "
    "bucketed (8 buckets) + sorted on the join key, then joined bucket-"
    "to-bucket — the scan-side Exchange disappears (pinned by plan test); "
    "at 100 TB this is the pattern that amortizes one shuffle at ingest "
    "across every downstream join on the key",
    tags=("layout", "join"),
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.sinks import write_bucketed

    tag = _tag(sf_dir)
    for name, df, key in (
        ("orders", load_star_table(spark, sf_dir, "orders"), "o_custkey"),
        ("customer", load_star_table(spark, sf_dir, "customer"), "c_custkey"),
    ):
        write_bucketed(
            df,
            f"b_{name}_{tag}",
            bucket_cols=[key],
            n_buckets=8,
            sort_cols=[key],
            path=f"{_SCRATCH}/bucketed/{tag}/{name}",
        )
    o = spark.table(f"b_orders_{tag}")
    c = spark.table(f"b_customer_{tag}")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("price_cents"),
        )
    )


@register(
    "stable_doc_ids",
    """
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY lang, doc_id) - 1 AS BIGINT)
         AS stable_id
FROM documents
""",
    "contiguous global IDs in (lang, doc_id) order via the zipWithIndex "
    "idiom — range repartition on the full ordering key, per-partition "
    "counts prefix-summed into offsets (numPartitions rows on the "
    "driver), row_number within partitions; never the one-task global "
    "sort the naive window would plan",
    tags=("layout", "ids"),
)
def q_stable_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_star_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return assign_contiguous_ids(
        docs, ["lang", "doc_id"], num_partitions=8
    ).select("doc_id", "stable_id")


_SCD2_ORACLE = """
WITH changes AS (
  SELECT CASE WHEN c_custkey % 50 = 0 THEN c_custkey + 10000000
              ELSE c_custkey END AS new_custkey,
         'SEG_' || CAST(c_custkey % 3 AS VARCHAR) AS new_segment
  FROM customer
  WHERE c_custkey % 10 = 0
),
updated AS (
  SELECT ch.new_custkey, ch.new_segment
  FROM changes ch JOIN customer c ON c.c_custkey = ch.new_custkey
  WHERE ch.new_segment <> c.c_mktsegment
),
inserts AS (
  SELECT ch.new_custkey, ch.new_segment
  FROM changes ch LEFT JOIN customer c ON c.c_custkey = ch.new_custkey
  WHERE c.c_custkey IS NULL
)
SELECT c.c_custkey, 1 AS version, c.c_mktsegment,
       (u.new_custkey IS NULL) AS is_current
FROM customer c LEFT JOIN updated u ON u.new_custkey = c.c_custkey
UNION ALL
SELECT new_custkey AS c_custkey, 2 AS version, new_segment AS c_mktsegment,
       TRUE AS is_current
FROM updated
UNION ALL
SELECT new_custkey AS c_custkey, 1 AS version, new_segment AS c_mktsegment,
       TRUE AS is_current
FROM inserts
"""


@register(
    "scd2_customer_merge",
    _SCD2_ORACLE,
    "SCD2 dimension merge (the MERGE INTO every warehouse runs, spelled "
    "as one full-outer join): a deterministic synthetic change batch "
    "(every 10th customer re-segmented, every 50th arriving as a brand-"
    "new key) is merged into the customer dimension — unchanged rows "
    "stay current v1, updated keys close v1 and open v2, inserts open "
    "v1; single shuffle on the merge key, change side broadcast at scale",
    tags=("layout", "merge"),
)
def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = load_star_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    changes = (
        dim.filter(F.col("c_custkey") % 10 == 0)
        .select(
            F.when(
                F.col("c_custkey") % 50 == 0, F.col("c_custkey") + 10000000
            )
            .otherwise(F.col("c_custkey"))
            .alias("c_custkey"),
            F.concat(
                F.lit("SEG_"), (F.col("c_custkey") % 3).cast("string")
            ).alias("new_segment"),
        )
    )
    merged = dim.join(changes, "c_custkey", "full_outer")
    is_update = (
        F.col("c_mktsegment").isNotNull()
        & F.col("new_segment").isNotNull()
        & (F.col("new_segment") != F.col("c_mktsegment"))
    )
    is_insert = F.col("c_mktsegment").isNull()
    # existing rows: v1, current unless superseded by an update
    v1 = merged.filter(F.col("c_mktsegment").isNotNull()).select(
        "c_custkey",
        F.lit(1).alias("version"),
        F.col("c_mktsegment"),
        (~is_update).alias("is_current"),
    )
    # change rows that land: updates open v2, inserts open v1
    v_new = merged.filter(is_update | is_insert).select(
        "c_custkey",
        F.when(is_update, 2).otherwise(1).alias("version"),
        F.col("new_segment").alias("c_mktsegment"),
        F.lit(True).alias("is_current"),
    )
    return v1.unionByName(v_new)


@register(
    "orc_roundtrip",
    """
SELECT p_brand,
       COUNT(*) AS n_parts,
       CAST(SUM(CAST(FLOOR(p_retailprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents,
       CAST(SUM(p_size) AS BIGINT) AS size_sum
FROM part
GROUP BY p_brand
""",
    "ORC interchange, driver-exercised: spill part to an ORC layer, "
    "re-read, aggregate — completes the source/sink format matrix "
    "(parquet/csv/json/orc); the oracle reads the parquet truth so any "
    "ORC encode/decode defect breaks the hash",
    tags=("sources",),
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_star_table(spark, sf_dir, "part")
    path = f"{_SCRATCH}/orc_roundtrip/{_tag(sf_dir)}"
    part.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(_cents(F.col("p_retailprice"))).cast("long").alias("price_cents"),
        F.sum("p_size").cast("long").alias("size_sum"),
    )


@register(
    "compact_layer_roundtrip",
    """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM lineitem
GROUP BY l_returnflag
""",
    "small-file compaction, driver-exercised: lineitem is deliberately "
    "shattered into 48 tiny files, compacted back to right-sized files "
    "with a shuffle-free coalesce rewrite, and re-aggregated — the "
    "oracle reads the parquet truth, so any row lost or duplicated in "
    "the maintenance rewrite breaks the hash (the file-count contract "
    "itself is pytest-covered in test_sources.py)",
    tags=("layout", "maintenance"),
)
def q_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.sinks import compact_parquet_layer

    tag = _tag(sf_dir)
    small = f"{_SCRATCH}/compact/{tag}/small"
    packed = f"{_SCRATCH}/compact/{tag}/packed"
    li = load_star_table(spark, sf_dir, "lineitem")
    # the 48-file shatter is FIXTURE scaffolding (the pathological input
    # the compactor is being exercised on), not part of the operation
    # under measurement — write it once per process like every other
    # fixture layer; the compaction itself re-runs per call
    # the in-memory marker is only a fast-path hint: also gate on the
    # _SUCCESS marker so an external wipe of .scratch mid-process
    # triggers a rebuild instead of a missing-input failure (ADVICE r15)
    if small not in _COMPACT_INPUT_BUILT or not os.path.exists(
        f"{small}/_SUCCESS"
    ):
        li.repartition(48).write.mode("overwrite").parquet(small)
        _COMPACT_INPUT_BUILT.add(small)
    compact_parquet_layer(spark, small, packed, target_file_bytes=64 << 20)
    back = spark.read.parquet(packed)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty_sum"),
        F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("price_cents"),
    )


@register(
    "salted_join_revenue",
    """
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o_orderpriority
""",
    "skew-safe join, driver-exercised: lineitem->orders through "
    "operators.skew.salted_join with salt='auto' — a sampled skew probe "
    "picks the salt factor from the hottest key's observed row share, "
    "resolving to 1 (plain join, no replication tax) on balanced keys "
    "and to a real fan-out factor on the one-hot-key day at 100 TB; "
    "result provably identical to the plain equi-join the oracle runs, "
    "equality + gating also pytest-pinned in test_operators.py",
    tags=("layout", "join", "skew"),
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_join

    li = load_star_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_star_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, "l_orderkey", salt="auto")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("long")
        .alias("revenue_cents"),
    )


def _zorder_oracle() -> str:
    """DuckDB replay of the full z-order pipeline: min/max normalize to
    16 bits (IEEE double arithmetic matches Spark op-for-op), Morton
    interleave as 32 explicit shift-mask terms, file id = top 4 bits."""
    terms = " + ".join(
        f"(((nx >> {k}) & 1) << {2 * k}) + (((ny >> {k}) & 1) << {2 * k + 1})"
        for k in range(16)
    )
    return f"""
WITH stats AS (
  SELECT min(o_custkey) AS lo_c, max(o_custkey) AS hi_c,
         min(o_totalprice) AS lo_p, max(o_totalprice) AS hi_p
  FROM orders
),
norm AS (
  SELECT o_custkey, o_totalprice,
         LEAST(GREATEST(CAST(FLOOR((o_custkey - lo_c) / (hi_c - lo_c) * 65535)
                             AS BIGINT), 0), 65535) AS nx,
         LEAST(GREATEST(CAST(FLOOR((o_totalprice - lo_p) / (hi_p - lo_p) * 65535)
                             AS BIGINT), 0), 65535) AS ny
  FROM orders CROSS JOIN stats
),
zed AS (SELECT o_custkey, o_totalprice, {terms} AS z FROM norm)
SELECT z >> 28 AS file_id,
       COUNT(*) AS n_rows,
       MIN(o_custkey) AS custkey_lo,
       MAX(o_custkey) AS custkey_hi,
       CAST(MIN(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS price_lo_cents,
       CAST(MAX(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS price_hi_cents
FROM zed
GROUP BY 1
"""


@register(
    "zorder_file_stats",
    _zorder_oracle(),
    "multi-dimensional layout clustering (operators/layout.py): Morton/"
    "Z-order interleave of min/max-normalized (o_custkey, o_totalprice) "
    "— a pure JVM expression tree, no UDF — with file assignment as the "
    "TOP BITS of the z-value (the quad-tree cell: map-side, no global "
    "sort/window; equal-SIZED files would use repartitionByRange on "
    "__z).  Returns per-file min/max of BOTH dimensions — the narrow "
    "two-dimensional ranges are exactly what lets parquet min/max stats "
    "skip files for predicates on EITHER column at 100 TB (the Delta "
    "OPTIMIZE ZORDER BY / Iceberg sort-order lever); the oracle replays "
    "normalize + 32-term interleave + top-bits binning in SQL",
    tags=("layout",),
)
def q_zorder_file_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import zorder_layout

    orders = load_star_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    laid = zorder_layout(
        orders, ["o_custkey", "o_totalprice"], bits=16, n_files=16
    )
    return (
        laid.groupBy(F.col("__file_id").alias("file_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_custkey").alias("custkey_lo"),
            F.max("o_custkey").alias("custkey_hi"),
            F.min(_cents(F.col("o_totalprice"))).cast("long").alias("price_lo_cents"),
            F.max(_cents(F.col("o_totalprice"))).cast("long").alias("price_hi_cents"),
        )
    )


def kpi_partial_state(df: DataFrame, key: str = "l_returnflag") -> DataFrame:
    """Mergeable per-key partial state for the lineitem KPI: exact integer
    cents sums + row count.  Any disjoint row partition of the input
    yields states that :func:`merge_kpi_states` combines into exactly the
    single-pass aggregate (cents are floored PER ROW, so partial sums are
    order- and split-invariant — the property the fuzz test pins)."""
    return df.groupBy(key).agg(
        F.sum(_cents(F.col("l_quantity"))).alias("qty_cents"),
        F.sum(_cents(F.col("l_extendedprice"))).alias("price_cents"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_kpi_states(*states: DataFrame) -> DataFrame:
    """Merge partial KPI states by re-aggregation (sum of sums/counts)."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    key = merged.columns[0]
    return merged.groupBy(key).agg(
        F.sum("qty_cents").alias("qty_cents"),
        F.sum("price_cents").alias("price_cents"),
        F.sum("n_rows").alias("n_rows"),
    )


_INC_MERGE_ORACLE = """
WITH full_agg AS (
  SELECT l_returnflag,
         SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS qty_cents,
         SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS price_cents,
         COUNT(*) AS n_rows
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(qty_cents AS BIGINT) AS qty_cents,
       CAST(price_cents AS BIGINT) AS price_cents,
       CAST(n_rows AS BIGINT) AS n_rows,
       ROUND(qty_cents / (100.0 * n_rows), 4) AS avg_qty
FROM full_agg
"""


@register(
    "incremental_agg_merge",
    _INC_MERGE_ORACLE,
    "materialized-aggregate maintenance (incremental view refresh): the "
    "per-flag lineitem KPI is kept as a mergeable partial state "
    "(sum/sum/count in exact integer cents) computed separately on the "
    "base slice (l_shipdate < 1998-01-01) and the delta slice, then "
    "merged by re-aggregating the union of states — at 100 TB the base "
    "state is a stored few-KB table and a daily refresh touches ONLY the "
    "delta partition instead of rescanning the corpus; derived averages "
    "come from the merged sums so the refresh is exact, and the oracle "
    "is the full-table recompute the merge must equal",
    tags=("layout", "merge", "incremental"),
)
def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_star_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_shipdate"
    )
    cut = F.lit("1998-01-01").cast("timestamp")
    # the two slices must PARTITION all rows: a NULL l_shipdate fails both
    # `< cut` and `>= cut`, so the delta slice is NULL-inclusive — TPC-H
    # has no NULL ship dates, but the merge contract can't depend on that
    merged = merge_kpi_states(
        kpi_partial_state(li.filter(F.col("l_shipdate") < cut)),
        kpi_partial_state(
            li.filter(
                (F.col("l_shipdate") >= cut) | F.col("l_shipdate").isNull()
            )
        ),
    )
    return merged.select(
        "l_returnflag",
        F.col("qty_cents").cast("long").alias("qty_cents"),
        F.col("price_cents").cast("long").alias("price_cents"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.round(F.col("qty_cents") / (100.0 * F.col("n_rows")), 4).alias(
            "avg_qty"
        ),
    )


_SNAPSHOT_VERSIONS_CTE = """
WITH base AS (SELECT c_custkey, c_mktsegment FROM customer),
app AS (
  SELECT c_custkey + 10000000 AS c_custkey, 'BUILDING' AS c_mktsegment
  FROM customer WHERE c_custkey % 100 = 0
),
v2 AS (SELECT * FROM base UNION ALL SELECT * FROM app),
v3 AS (SELECT * FROM v2 WHERE c_mktsegment = 'BUILDING')
"""


_SNAPSHOT_LAYERS_BUILT: set[str] = set()


def _snapshot_layer(spark: SparkSession, sf_dir: str) -> str:
    """(Re)build the versioned demo layer: v1 = customer slice
    (overwrite), v2 = appended synthetic BUILDING customers (append —
    commits without touching v1's files), v3 = BUILDING-only compaction
    (overwrite).  Deterministic, so repeated runs rebuild identically;
    built once per process (both snapshot queries — and a bench/driver
    sweep running them back-to-back — read the same committed layer, as
    production readers would)."""
    from ..sources.snapshots import commit_snapshot, drop_snapshot_layer

    path = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/customer_layer"
    if path in _SNAPSHOT_LAYERS_BUILT:
        return path
    drop_snapshot_layer(spark, path)
    base = load_star_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    app = base.filter(F.col("c_custkey") % 100 == 0).select(
        (F.col("c_custkey") + 10000000).alias("c_custkey"),
        F.lit("BUILDING").alias("c_mktsegment"),
    )
    commit_snapshot(spark, base, path, mode="overwrite")
    commit_snapshot(spark, app, path, mode="append")
    from ..sources.snapshots import read_snapshot

    v3 = read_snapshot(spark, path, 2).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    commit_snapshot(spark, v3, path, mode="overwrite")
    _SNAPSHOT_LAYERS_BUILT.add(path)
    return path


@register(
    "snapshot_time_travel",
    _SNAPSHOT_VERSIONS_CTE
    + """
SELECT 1 AS version, COUNT(*) AS n_rows,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum FROM base
UNION ALL
SELECT 2, COUNT(*), CAST(SUM(c_custkey) AS BIGINT) FROM v2
UNION ALL
SELECT 3, COUNT(*), CAST(SUM(c_custkey) AS BIGINT) FROM v3
""",
    "snapshot-versioned table layer with time travel "
    "(sources/snapshots.py — the manifest pattern behind modern table "
    "formats): v1 overwrite, v2 append (manifest reuse: the commit "
    "touches ONLY delta files, O(delta) not O(table)), v3 overwrite; "
    "every version stays readable by manifest pin — the training-data "
    "reproducibility contract ('which exact corpus built this "
    "checkpoint?'); all IO via the Hadoop FS API so hdfs://s3a:// "
    "layers behave identically; the oracle recomputes what each "
    "version must contain",
    tags=("layout", "snapshots"),
)
def q_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot

    path = _snapshot_layer(spark, sf_dir)
    parts = []
    for v in (1, 2, 3):
        parts.append(
            read_snapshot(spark, path, v).agg(
                F.lit(v).alias("version"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("c_custkey").alias("key_sum"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "snapshot_change_feed",
    _SNAPSHOT_VERSIONS_CTE
    + """
SELECT 'insert' AS change_type, c_custkey, c_mktsegment
FROM (SELECT * FROM v3 EXCEPT ALL SELECT * FROM base)
UNION ALL
SELECT 'delete' AS change_type, c_custkey, c_mktsegment
FROM (SELECT * FROM base EXCEPT ALL SELECT * FROM v3)
""",
    "exact change feed between two snapshot versions "
    "(sources/snapshots.py::snapshot_changes): multiset row diff "
    "(exceptAll both ways) labels inserts and deletes between v1 and "
    "v3 — the CDC view downstream consumers tail instead of re-reading "
    "the table; generic no-primary-key contract (an update = delete + "
    "insert), full-row shuffle, with a key-equi-join diff as the "
    "cheaper keyed specialization",
    tags=("layout", "snapshots", "cdc"),
)
def q_snapshot_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import snapshot_changes

    path = _snapshot_layer(spark, sf_dir)
    return snapshot_changes(spark, path, 1, 3)


_DPP_LAYERS_BUILT: set[str] = set()


def _orders_partitioned_layer(spark: SparkSession, sf_dir: str) -> str:
    """Orders written partitioned by o_orderpriority (5 hive-style
    partitions) — the layout that lets a selective dim join prune whole
    partitions at runtime.  Built once per process."""
    path = f"{_SCRATCH}/dpp/{_tag(sf_dir)}/orders_by_prio"
    if path not in _DPP_LAYERS_BUILT:
        load_star_table(spark, sf_dir, "orders").write.mode(
            "overwrite"
        ).partitionBy("o_orderpriority").parquet(path)
        _DPP_LAYERS_BUILT.add(path)
    return path


@register(
    "dpp_join_prune",
    """
WITH dim AS (
  SELECT o_orderpriority FROM (
    SELECT o_orderpriority,
           row_number() OVER (ORDER BY COUNT(*) DESC, o_orderpriority) AS rk
    FROM orders GROUP BY o_orderpriority
  ) WHERE rk <= 2
)
SELECT o.o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM orders o JOIN dim ON o.o_orderpriority = dim.o_orderpriority
GROUP BY o.o_orderpriority
""",
    "dynamic partition pruning: the orders fact lives partitioned by "
    "priority; joining it to a dim whose selectivity exists only at "
    "RUNTIME (top-2 priorities by count — not statically derivable, so "
    "no filter can be pushed at plan time) makes Catalyst inject a "
    "dynamicpruning subquery into the fact's PartitionFilters, and the "
    "scan reads 2 of 5 partitions instead of the table — at 100 TB this "
    "is the difference between scanning the star schema's fact once per "
    "dim filter and touching only matching partitions (pinned by plan "
    "test)",
    tags=("layout", "join", "pruning"),
)
def q_dpp_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    path = _orders_partitioned_layer(spark, sf_dir)
    fact = spark.read.parquet(path)
    # rank-and-FILTER, deliberately not orderBy+limit: Catalyst's
    # partition-pruning rule keys on a selective Filter on the dim side
    # (a LIMIT is not recognized — verified: the limit variant plans no
    # dynamicpruning).  The global window is over the 5-row priority
    # aggregate — domain-bounded, so its single partition is a non-issue
    dim = (
        load_star_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("n").desc(), F.col("o_orderpriority"))
            ),
        )
        .filter(F.col("rk") <= 2)
        .select("o_orderpriority")
    )
    return (
        fact.join(dim, "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("price_cents"),
        )
    )


_SKIP_LAYERS_BUILT: dict[str, str] = {}


def _orders_skip_layer(spark: SparkSession, sf_dir: str) -> str:
    """Orders committed to a snapshot layer range-clustered on
    o_orderkey (8 disjoint-range files) with per-file min/max stats in
    the manifest — the layout manifest data skipping needs.  Built once
    per process."""
    from ..sources.snapshots import commit_snapshot, drop_snapshot_layer

    path = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/orders_skip_layer"
    if path in _SKIP_LAYERS_BUILT:
        return path
    drop_snapshot_layer(spark, path)
    orders = load_star_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    commit_snapshot(
        spark,
        orders.repartitionByRange(8, "o_orderkey"),
        path,
        stats_cols=["o_orderkey"],
    )
    _SKIP_LAYERS_BUILT[path] = path
    return path


@register(
    "snapshot_skip_scan",
    """
SELECT COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM orders
WHERE o_orderkey BETWEEN 1000 AND 2000
""",
    "manifest data skipping (the min/max file index every table format "
    "keeps): orders commit range-clustered on o_orderkey with per-file "
    "stats in the manifest; a key-band read drops non-intersecting "
    "files BEFORE Spark opens a footer, then the same predicate applies "
    "normally (skipping is an optimization, never a filter) — at 100 TB "
    "a selective range plans over a handful of files instead of the "
    "table; the file-count reduction itself is pinned by pytest",
    tags=("layout", "snapshots", "pruning"),
)
def q_snapshot_skip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot

    path = _orders_skip_layer(spark, sf_dir)
    lo, hi = 1000, 2000
    pruned = read_snapshot(
        spark, path, prune_range=("o_orderkey", lo, hi)
    ).filter(F.col("o_orderkey").between(lo, hi))
    return pruned.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_orderkey").alias("key_sum"),
        F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("price_cents"),
    )


@register(
    "xml_roundtrip",
    """
SELECT r_regionkey,
       COUNT(*) AS n_nations,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
FROM (SELECT CAST(n_regionkey AS BIGINT) AS r_regionkey, n_nationkey
      FROM nation)
GROUP BY r_regionkey
""",
    "XML interchange (Spark 4 native XML source): spill nation to an "
    "XML layer (rowTag records), re-read with the DECLARED schema — "
    "never inference, which at scale costs an extra pass and can drift "
    "types — and aggregate; completes the format matrix "
    "(parquet/csv/json/orc/xml); the oracle reads the parquet truth so "
    "any encode/decode defect breaks the hash",
    tags=("sources",),
)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    nation = load_star_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = f"{_SCRATCH}/xml_roundtrip/{_tag(sf_dir)}"
    (
        nation.write.mode("overwrite")
        .option("rootTag", "nations")
        .option("rowTag", "nation")
        .format("xml")
        .save(path)
    )
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.LongType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.LongType()),
        ]
    )
    back = (
        spark.read.schema(schema).option("rowTag", "nation").format("xml").load(path)
    )
    return (
        back.groupBy(F.col("n_regionkey").alias("r_regionkey"))
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.sum("n_nationkey").alias("key_sum"),
        )
    )


@register(
    "snapshot_incremental_refresh",
    _SNAPSHOT_VERSIONS_CTE
    + """
SELECT c_mktsegment,
       COUNT(*) AS n_rows,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum
FROM v3 GROUP BY c_mktsegment
""",
    "incremental view maintenance WITH retractions (the full IVM story "
    "the plain partial-state merge can't tell): the v1 aggregate is "
    "refreshed to the v3 state by folding in ONLY the change feed — "
    "inserts contribute +1/+key, deletes contribute -1/-key — and "
    "groups whose count retracts to zero drop out; equals the direct "
    "v3 recompute (the oracle) while touching the base table not at "
    "all, which at 100 TB turns a daily full rescan into "
    "O(churned rows)",
    tags=("layout", "snapshots", "incremental", "cdc"),
)
def q_snapshot_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot, snapshot_changes

    path = _snapshot_layer(spark, sf_dir)
    base = (
        read_snapshot(spark, path, 1)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("c_custkey").alias("key_sum"),
        )
    )
    sign = F.when(F.col("change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta = (
        snapshot_changes(spark, path, 1, 3)
        .withColumn("__sign", sign)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("__sign").alias("n_rows"),
            F.sum(F.col("__sign") * F.col("c_custkey")).alias("key_sum"),
        )
    )
    return (
        base.unionByName(delta)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("key_sum").cast("long").alias("key_sum"),
        )
        .filter(F.col("n_rows") > 0)
    )


@register(
    "snapshot_incremental_refresh_keyed",
    _SNAPSHOT_VERSIONS_CTE
    + """
SELECT c_mktsegment,
       COUNT(*) AS n_rows,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum
FROM v3 GROUP BY c_mktsegment
""",
    "keyed incremental view maintenance: same refresh contract as "
    "snapshot_incremental_refresh (v1 aggregate folded to the v3 state "
    "by the change feed only), but consuming the KEYED feed "
    "(snapshot_changes_keyed include_values) — ONE full-outer equi-join "
    "on the declared key instead of two full-row exceptAll shuffles, "
    "and an update folds as retract(before)+apply(after) from a single "
    "row; with wide rows and a real key this is the cheaper feed, which "
    "is why every production CDC consumer declares one",
    tags=("layout", "snapshots", "incremental", "cdc"),
)
def q_snapshot_incremental_refresh_keyed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.snapshots import read_snapshot, snapshot_changes_keyed

    path = _snapshot_layer(spark, sf_dir)
    base = (
        read_snapshot(spark, path, 1)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("c_custkey").alias("key_sum"),
        )
    )
    feed = snapshot_changes_keyed(
        spark, path, 1, 3, ["c_custkey"], include_values=True
    )
    retract = feed.filter(
        F.col("change_type").isin("delete", "update")
    ).select(
        F.col("before.c_mktsegment").alias("c_mktsegment"),
        F.lit(-1).alias("__n"),
        (-F.col("c_custkey")).alias("__k"),
    )
    apply_ = feed.filter(
        F.col("change_type").isin("insert", "update")
    ).select(
        F.col("after.c_mktsegment").alias("c_mktsegment"),
        F.lit(1).alias("__n"),
        F.col("c_custkey").alias("__k"),
    )
    delta = (
        retract.unionByName(apply_)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("__n").alias("n_rows"),
            F.sum("__k").alias("key_sum"),
        )
    )
    return (
        base.unionByName(delta)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("key_sum").cast("long").alias("key_sum"),
        )
        .filter(F.col("n_rows") > 0)
    )


_COMPACT_LAYERS_BUILT: set[str] = set()


def _compact_layer(spark: SparkSession, sf_dir: str) -> str:
    """Dedicated layer for the in-layer compaction roundtrip: v1 = the
    customer slice deliberately sprayed over 12 small files, v2 = an
    O(delta) append (more small files — exactly how a snapshot layer
    degrades under streaming ingest), v3 = ``rewrite_snapshot`` head
    compaction.  Built once per process; the builder asserts the file
    count actually dropped so a silently non-compacting rewrite can't
    hide behind a content-only oracle."""
    from ..sources.snapshots import (
        commit_snapshot,
        drop_snapshot_layer,
        rewrite_snapshot,
        snapshot_files,
    )

    path = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/compact_layer"
    if path in _COMPACT_LAYERS_BUILT:
        return path
    drop_snapshot_layer(spark, path)
    base = load_star_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    app = base.filter(F.col("c_custkey") % 100 == 0).select(
        (F.col("c_custkey") + 20000000).alias("c_custkey"),
        F.lit("MACHINERY").alias("c_mktsegment"),
    )
    commit_snapshot(spark, base.repartition(12), path, mode="overwrite")
    commit_snapshot(spark, app.repartition(4), path, mode="append")
    n_before = len(snapshot_files(spark, path, 2))
    report = rewrite_snapshot(spark, path)
    if not (report["files_after"] < n_before):
        raise AssertionError(
            f"rewrite_snapshot did not compact: {n_before} -> "
            f"{report['files_after']} files"
        )
    _COMPACT_LAYERS_BUILT.add(path)
    return path


@register(
    "snapshot_compact_roundtrip",
    """
WITH base AS (SELECT c_custkey, c_mktsegment FROM customer),
app AS (
  SELECT c_custkey + 20000000 AS c_custkey, 'MACHINERY' AS c_mktsegment
  FROM customer WHERE c_custkey % 100 = 0
),
head AS (SELECT * FROM base UNION ALL SELECT * FROM app)
SELECT c_mktsegment,
       COUNT(*) AS n_rows,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum
FROM head GROUP BY c_mktsegment
""",
    "small-file compaction INSIDE the snapshot layer "
    "(snapshots.rewrite_snapshot): a 16-small-file head (overwrite + "
    "O(delta) append — the way versioned layers actually degrade) is "
    "rewritten byte-sized via shuffle-free coalesce and committed as a "
    "NEW manifest version; old versions keep reading their original "
    "files (time travel preserved — pinned by pytest), vacuum GCs the "
    "small files after retention; the oracle recomputes the head "
    "content, which compaction must not change by a single row",
    tags=("layout", "snapshots", "maintenance"),
)
def q_snapshot_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot

    path = _compact_layer(spark, sf_dir)
    return (
        read_snapshot(spark, path)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("c_custkey").cast("long").alias("key_sum"),
        )
    )


_MERGE_LAYERS_BUILT: set[str] = set()


def _merge_layer(spark: SparkSession, sf_dir: str) -> str:
    """Layer for the copy-on-write MERGE roundtrip: v1 = the customer
    slice RANGE-CLUSTERED on the key across 8 files with key stats in
    the manifest (the layout that makes MERGE file-prunable), v2 = one
    ``merge_snapshot`` upsert whose delta is (a) updates confined to a
    narrow low-key band and (b) inserts far beyond every file's range.
    The builder asserts at least one file was CARRIED (not rewritten) —
    a merge that silently rewrote the whole table could otherwise hide
    behind the content-only oracle.  Built once per process."""
    from ..sources.snapshots import (
        commit_snapshot,
        drop_snapshot_layer,
        merge_snapshot,
    )

    path = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/merge_layer"
    if path in _MERGE_LAYERS_BUILT:
        return path
    drop_snapshot_layer(spark, path)
    base = load_star_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    commit_snapshot(
        spark,
        base.repartitionByRange(8, "c_custkey"),
        path,
        stats_cols=["c_custkey"],
    )
    upd = base.filter(
        (F.col("c_custkey") % 10 == 0) & (F.col("c_custkey") <= 100)
    ).select("c_custkey", F.lit("MERGED").alias("c_mktsegment"))
    ins = base.filter(F.col("c_custkey") % 100 == 0).select(
        (F.col("c_custkey") + 30000000).alias("c_custkey"),
        F.lit("MERGED").alias("c_mktsegment"),
    )
    report = merge_snapshot(
        spark,
        upd.unionByName(ins),
        path,
        "c_custkey",
        stats_cols=["c_custkey"],
    )
    if report["files_carried"] < 1:
        raise AssertionError(
            f"merge rewrote every file: {report} — file pruning failed"
        )
    _MERGE_LAYERS_BUILT.add(path)
    return path


@register(
    "snapshot_merge_cow",
    """
WITH base AS (SELECT c_custkey, c_mktsegment FROM customer),
delta AS (
  SELECT c_custkey, 'MERGED' AS c_mktsegment FROM customer
  WHERE c_custkey % 10 = 0 AND c_custkey <= 100
  UNION ALL
  SELECT c_custkey + 30000000, 'MERGED' FROM customer
  WHERE c_custkey % 100 = 0
),
merged AS (
  SELECT b.c_custkey, b.c_mktsegment FROM base b
  WHERE b.c_custkey NOT IN (SELECT c_custkey FROM delta)
  UNION ALL
  SELECT * FROM delta
)
SELECT c_mktsegment,
       COUNT(*) AS n_rows,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum
FROM merged GROUP BY c_mktsegment
""",
    "copy-on-write MERGE (upsert) into the snapshot layer with FILE-"
    "LEVEL PRUNING (snapshots.merge_snapshot — the Delta/Iceberg MERGE "
    "contract): only head files whose manifest [min,max] key range "
    "contains a delta key are anti-joined and rewritten; every other "
    "file is carried into the new manifest verbatim (builder-asserted), "
    "and out-of-range inserts rewrite NOTHING — a daily CDC upsert on a "
    "key-clustered 100 TB layer touches O(affected files), not "
    "O(table); time travel to the pre-merge version is preserved; the "
    "oracle recomputes the post-merge state from scratch",
    tags=("layout", "snapshots", "merge", "cdc"),
)
def q_snapshot_merge_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot

    path = _merge_layer(spark, sf_dir)
    return (
        read_snapshot(spark, path)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("c_custkey").cast("long").alias("key_sum"),
        )
    )


_CLUSTER_LAYERS_BUILT: set[str] = set()


def _cluster_layer(spark: SparkSession, sf_dir: str) -> str:
    """Layer for the clustered-rewrite roundtrip: v1 = the customer slice
    hash-scrambled across 6 files (every file straddles the whole key
    range, so manifest skipping can prune NOTHING — the layout streaming
    ingest actually produces), v2 = ``rewrite_snapshot(cluster_by=key)``
    re-clustering the same rows range-wise with key stats.  The builder
    asserts the same narrow key band keeps every file before and a
    strict subset after — the maintenance job that turns a write-
    optimized layout into a read-optimized one without breaking time
    travel.  Built once per process."""
    from ..sources.snapshots import (
        commit_snapshot,
        drop_snapshot_layer,
        rewrite_snapshot,
        snapshot_files,
    )

    path = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/cluster_layer"
    if path in _CLUSTER_LAYERS_BUILT:
        return path
    drop_snapshot_layer(spark, path)
    base = load_star_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    commit_snapshot(
        spark, base.repartition(6), path, stats_cols=["c_custkey"]
    )
    band = ("c_custkey", 1, 100)
    before = snapshot_files(spark, path, 1, prune_range=band)
    rewrite_snapshot(spark, path, cluster_by="c_custkey", n_files=6)
    after = snapshot_files(spark, path, 2, prune_range=band)
    if not (len(after) < len(before) == 6):
        raise AssertionError(
            f"clustered rewrite did not sharpen skipping: "
            f"{len(before)} -> {len(after)} files kept for {band}"
        )
    _CLUSTER_LAYERS_BUILT.add(path)
    return path


@register(
    "snapshot_cluster_rewrite",
    """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum
FROM customer WHERE c_custkey BETWEEN 1 AND 100
""",
    "read-layout maintenance: rewrite_snapshot(cluster_by=key) range-"
    "clusters the head version (one shuffle, paid once) and records "
    "per-file key stats, turning a hash-scrambled write-optimized "
    "layout — where a narrow key band keeps EVERY file (builder-"
    "asserted) — into one where manifest skipping prunes to a strict "
    "subset BEFORE any footer is opened; the query then actually reads "
    "through that pruned path (prune_range + residual predicate) and "
    "the oracle recomputes the band from the base table, so a skip "
    "that drops a straddling file breaks the hash; this is also the "
    "layout merge_snapshot's file-level pruning needs",
    tags=("layout", "snapshots", "maintenance"),
)
def q_snapshot_cluster_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot

    path = _cluster_layer(spark, sf_dir)
    return (
        read_snapshot(spark, path, prune_range=("c_custkey", 1, 100))
        .filter(F.col("c_custkey").between(1, 100))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("c_custkey").cast("long").alias("key_sum"),
        )
    )


_BLOOM_LAYERS_BUILT: set[str] = set()


def _bloom_layer(spark: SparkSession, sf_dir: str) -> str:
    """Layer for the Bloom point-lookup roundtrip: the documents slice
    hash-scrambled across 8 files — the layout where min/max stats are
    USELESS for a point probe (every file's [min, max] doc_id spans the
    whole domain; builder-asserted) — committed with a per-file Bloom
    index on doc_id.  The builder asserts the bloom probe keeps strictly
    fewer files than the stats probe.  Built once per process."""
    from ..sources.snapshots import (
        commit_snapshot,
        drop_snapshot_layer,
        snapshot_files,
    )

    path = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/bloom_layer"
    if path in _BLOOM_LAYERS_BUILT:
        return path
    drop_snapshot_layer(spark, path)
    docs = load_star_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    commit_snapshot(
        spark,
        docs.repartition(8),
        path,
        stats_cols=["doc_id"],
        bloom_col="doc_id",
        # live CHECK-constraint enforcement on a real build path (one
        # aggregate scan of the staged delta; violations abort pre-commit)
        checks={"doc_id_nonneg": "doc_id >= 0", "lang_set": "lang IS NOT NULL"},
    )
    all_f = snapshot_files(spark, path)
    by_range = snapshot_files(spark, path, prune_range=("doc_id", 7, 7))
    by_bloom = snapshot_files(spark, path, prune_point=("doc_id", 7))
    # hash-scrambled files mostly straddle the probe (random min/max can
    # still exclude a few at small scales); the bloom must beat min/max
    if not (len(by_bloom) < len(by_range) and len(all_f) == 8):
        raise AssertionError(
            f"bloom index did not out-prune min/max stats: all={len(all_f)} "
            f"range={len(by_range)} bloom={len(by_bloom)}"
        )
    _BLOOM_LAYERS_BUILT.add(path)
    return path


@register(
    "snapshot_bloom_skip",
    """
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM documents WHERE doc_id = 7
""",
    "manifest-level BLOOM FILE INDEX for point lookups "
    "(snapshots.commit_snapshot(bloom_col=...) — the Delta/Iceberg "
    "secondary-index story): on a hash-scrambled layout every file's "
    "[min,max] spans the whole key domain, so min/max skipping keeps "
    "most files for a point probe — the per-file "
    "Bloom bit set (xxhash64 family, 8192 bits, 4 hashes, ~1 KB/file "
    "in the manifest) skips every file whose bloom is missing any probe "
    "bit; false positives only cost a scanned file, never correctness, "
    "and the residual predicate still applies, so the oracle (the "
    "direct point lookup) breaks if skipping ever drops a true file",
    tags=("layout", "snapshots", "index"),
)
def q_snapshot_bloom_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot

    path = _bloom_layer(spark, sf_dir)
    return (
        read_snapshot(spark, path, prune_point=("doc_id", 7))
        .filter(F.col("doc_id") == 7)
        .select("doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"))
    )


_DELETE_LAYERS_BUILT: set[str] = set()


def _delete_layer(spark: SparkSession, sf_dir: str) -> str:
    """Layer for the merge-on-read DELETE roundtrip: documents slice
    key-clustered into 8 files, then ``doc_id % 10 = 3`` deleted as
    position delete files — the builder asserts the data file set is
    UNCHANGED across the delete (zero rewrite) and that the
    metadata-only row count matches the post-delete cardinality.
    Built once per process; both delete queries share it."""
    from ..sources.snapshots import (
        commit_snapshot,
        delete_snapshot,
        drop_snapshot_layer,
        snapshot_files,
        snapshot_row_count,
    )

    path = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/delete_layer"
    if path in _DELETE_LAYERS_BUILT:
        return path
    drop_snapshot_layer(spark, path)
    docs = load_star_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    commit_snapshot(
        spark,
        docs.repartitionByRange(8, "doc_id"),
        path,
        stats_cols=["doc_id"],
    )
    n_total = snapshot_row_count(spark, path)
    res = delete_snapshot(spark, path, "doc_id % 10 = 3")
    if not (
        res["rows_deleted"] > 0
        and snapshot_files(spark, path, 1) == snapshot_files(spark, path, 2)
        and snapshot_row_count(spark, path) == n_total - res["rows_deleted"]
    ):
        raise AssertionError(f"merge-on-read delete contract broken: {res}")
    _DELETE_LAYERS_BUILT.add(path)
    return path


@register(
    "snapshot_delete_mor",
    """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_sum
FROM documents
WHERE NOT (doc_id % 10 = 3)
GROUP BY lang
""",
    "merge-on-read DELETE via position delete files (the Iceberg v2 / "
    "Delta deletion-vector design, snapshots.delete_snapshot): matching "
    "rows are recorded as (file, pos) pairs in a delete sidecar and the "
    "new manifest keeps the exact same data file set — a DELETE that "
    "writes O(matches) bytes instead of rewriting every touched file; "
    "readers anti-join only the DIRTY files against the delete set "
    "(clean files stream through the plain scan), rewrite_snapshot "
    "folds the vectors back in at compaction; the builder asserts zero "
    "data files were rewritten, and the oracle (a recompute over the "
    "surviving rows) breaks if the vectors drop or resurrect anything",
    tags=("layout", "snapshots", "delete"),
)
def q_snapshot_delete_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot

    path = _delete_layer(spark, sf_dir)
    return (
        read_snapshot(spark, path)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
        )
    )


_STATS_BROADCAST_BUILT: set[str] = set()


def _stats_broadcast_views(spark: SparkSession, sf_dir: str) -> str:
    """Dimension layer + stats-driven SQL facade for the broadcast-join
    roundtrip: the nation slice committed as a snapshot layer (sizes
    recorded per segment entry), registered TWICE — once plain, once
    with ``auto_broadcast_bytes`` above its recorded size.  The builder
    disables Spark's own size-based broadcasting (threshold -1, Spark's
    estimator is blind through a manifest-planned read) and asserts the
    hinted view plans a BroadcastHashJoin while the unhinted one does
    NOT — proving the hint is STATS-driven, not a blanket broadcast.
    Built once per process."""
    from ..sources.snapshots import (
        commit_snapshot,
        drop_snapshot_layer,
        register_snapshot_view,
        snapshot_table_raw_bytes,
    )

    tag = _tag(sf_dir)
    path = f"{_SCRATCH}/snapshots/{tag}/stats_bcast_dim"
    view = f"nation_snap_{tag}"
    if path in _STATS_BROADCAST_BUILT:
        return view
    drop_snapshot_layer(spark, path)
    commit_snapshot(
        spark,
        load_star_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name"
        ),
        path,
        stats_cols=["n_nationkey"],
    )
    # the hint decision compares LOGICAL in-memory bytes (round 7:
    # compressed parquet bytes understate the build side 3-10x)
    total = snapshot_table_raw_bytes(spark, path)
    if not total:
        raise AssertionError("segment entries missing raw byte sizes")
    cust = load_star_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        register_snapshot_view(spark, path, f"{view}_plain")
        plain = (
            cust.join(
                spark.table(f"{view}_plain"),
                cust["c_nationkey"] == F.col("n_nationkey"),
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        register_snapshot_view(
            spark, path, view, auto_broadcast_bytes=total + 1
        )
        hinted = (
            cust.join(
                spark.table(view),
                cust["c_nationkey"] == F.col("n_nationkey"),
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if "BroadcastHashJoin" in plain or "BroadcastHashJoin" not in hinted:
            raise AssertionError(
                "broadcast hint is not stats-driven: "
                f"plain={'BHJ' in plain} hinted={'BHJ' in hinted}"
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    _STATS_BROADCAST_BUILT.add(path)
    return view


@register(
    "snapshot_stats_broadcast_join",
    """
SELECT n.n_name,
       COUNT(*) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    "STATS-DRIVEN broadcast join over the snapshot SQL facade "
    "(snapshots.register_snapshot_view(auto_broadcast_bytes=...) + "
    "snapshot_table_raw_bytes — Delta/Iceberg's stats-based join "
    "planning): the manifest's segment entries record LOGICAL in-memory "
    "bytes at commit time (compressed parquet bytes understate a hash "
    "relation 3-10x), so the facade KNOWS the dimension fits and attaches a "
    "broadcast hint where Spark's own estimator — blind through a "
    "manifest-planned multi-parquet read — would fall back to a "
    "sort-merge join with a full shuffle of the fact side; the builder "
    "asserts (under autoBroadcastJoinThreshold=-1) that the hinted view "
    "plans a BroadcastHashJoin and the unhinted one does not, and the "
    "oracle recomputes the join from the raw tables",
    tags=("layout", "snapshots", "join", "stats"),
)
def q_snapshot_stats_broadcast_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    view = _stats_broadcast_views(spark, sf_dir)
    cust = load_star_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    return (
        cust.join(
            spark.table(view),
            cust["c_nationkey"] == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


_EQ_DELETE_LAYERS_BUILT: set[str] = set()


def _eq_delete_layer(spark: SparkSession, sf_dir: str) -> str:
    """Layer for the KEY-EQUALITY delete roundtrip: v1 = customer slice
    range-clustered on the key (8 files, key stats), v2 =
    ``delete_snapshot_keys`` for the multiples of 7 up to 100 — O(keys)
    metadata, ZERO data reads, and the builder asserts the touch scope
    resolved from manifest stats alone is a strict subset of the files —
    v3 = an append RE-INSERTING two deleted keys, which must survive
    (no-resurrect: the delete's scope is the files live at delete time).
    Built once per process."""
    from ..sources.snapshots import (
        commit_snapshot,
        delete_snapshot_keys,
        drop_snapshot_layer,
    )

    path = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/eq_delete_layer"
    if path in _EQ_DELETE_LAYERS_BUILT:
        return path
    drop_snapshot_layer(spark, path)
    base = load_star_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    commit_snapshot(
        spark,
        base.repartitionByRange(8, "c_custkey"),
        path,
        stats_cols=["c_custkey"],
    )
    res = delete_snapshot_keys(
        spark, path, "c_custkey", list(range(7, 101, 7))
    )
    if not (0 < res["files_in_scope"] < 8):
        raise AssertionError(
            f"equality delete scope not stats-pruned: {res}"
        )
    commit_snapshot(
        spark,
        spark.createDataFrame(
            [(14, "REBORN"), (28, "REBORN")],
            "c_custkey long, c_mktsegment string",
        ),
        path,
        mode="append",
        stats_cols=["c_custkey"],
    )
    _EQ_DELETE_LAYERS_BUILT.add(path)
    return path


@register(
    "snapshot_delete_equality",
    """
WITH alive AS (
  SELECT c_custkey, c_mktsegment FROM customer
  WHERE NOT (c_custkey % 7 = 0 AND c_custkey BETWEEN 7 AND 100)
  UNION ALL
  SELECT * FROM (VALUES (14, 'REBORN'), (28, 'REBORN'))
           AS t(c_custkey, c_mktsegment)
)
SELECT c_mktsegment,
       COUNT(*) AS n_rows,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum
FROM alive GROUP BY c_mktsegment
""",
    "KEY-EQUALITY merge-on-read DELETE (snapshots.delete_snapshot_keys "
    "— the Iceberg v2 equality-delete flavor): a DELETE by key writes "
    "O(keys) metadata and reads ZERO data files — the key set lands as "
    "a small parquet sidecar and the manifest entry records the touch "
    "scope resolved from SEGMENT + FILE stats alone (builder-asserted "
    "strict subset of the layer's files); readers apply it as two "
    "broadcast joins on only the in-scope dirty files; a later append "
    "re-inserting a deleted key is outside the scope and SURVIVES "
    "(no-resurrect, Iceberg's sequence-number semantics); this is the "
    "delete shape streaming CDC issues constantly at 100 TB, where "
    "delete_snapshot's O(matching data) scan per DELETE defeats the "
    "O(delta) design; the oracle recomputes the surviving rows from "
    "scratch, so a scope, fold, or resurrect bug breaks the hash",
    tags=("layout", "snapshots", "delete", "cdc"),
)
def q_snapshot_delete_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot

    path = _eq_delete_layer(spark, sf_dir)
    return (
        read_snapshot(spark, path)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("c_custkey").cast("long").alias("key_sum"),
        )
    )


@register(
    "snapshot_count_metadata_only",
    """
SELECT CAST((SELECT COUNT(*) FROM documents
             WHERE NOT (doc_id % 10 = 3)) AS BIGINT) AS n_live,
       CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_total
""",
    "metadata-only COUNT(*) (snapshots.snapshot_row_count — the "
    "Delta/Iceberg numRecords fast path): per-file row counts recorded "
    "by the commit-time stats pass, position-delete counts subtracted "
    "per file, so the count of any version — including one with live "
    "deletion vectors — resolves from a KB of manifest JSON with ZERO "
    "data or footer reads; at 100 TB that is milliseconds vs a "
    "cluster-wide scan; oracle recomputes both cardinalities from the "
    "raw table",
    tags=("snapshots", "metadata"),
)
def q_snapshot_count_metadata_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import snapshot_row_count

    path = _delete_layer(spark, sf_dir)
    n_live = snapshot_row_count(spark, path)       # head: post-delete
    n_total = snapshot_row_count(spark, path, 1)   # v1: pre-delete
    if n_live is None or n_total is None:
        raise AssertionError("manifest row counts missing — not metadata-only")
    return spark.createDataFrame(
        [(n_live, n_total)], "n_live long, n_total long"
    )


_ZORDER_LAYERS_BUILT: dict[str, tuple[int, int, int, int]] = {}


def _zorder_layer(spark: SparkSession, sf_dir: str) -> tuple[str, tuple]:
    """Layer for the Z-order rewrite roundtrip: a lineitem slice
    hash-scrambled across 16 files (v1 — the builder asserts a 10%
    l_orderkey band keeps ALL files, i.e. 1-D stats are useless), then
    rewritten with ``zorder_by=[l_orderkey, l_partkey]`` (v2).  The
    builder asserts the SAME band now prunes to a strict subset on
    EACH dimension independently — the property a single-column range
    cluster cannot deliver.  Band = [min + 40% span, min + 50% span]
    per dimension (scale-independent).  Built once per process."""
    import math

    from ..sources.snapshots import (
        commit_snapshot,
        drop_snapshot_layer,
        rewrite_snapshot,
        snapshot_files,
    )

    path = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/zorder_layer"
    if path in _ZORDER_LAYERS_BUILT:
        return path, _ZORDER_LAYERS_BUILT[path]
    drop_snapshot_layer(spark, path)
    li = load_star_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    commit_snapshot(
        spark,
        li.repartition(16),
        path,
        stats_cols=["l_orderkey", "l_partkey"],
    )
    row = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).first()
    o_min, o_max, p_min, p_max = (int(x) for x in row)

    def band(lo: int, hi: int) -> tuple[int, int]:
        span = hi - lo
        return (
            lo + int(math.floor(0.40 * span)),
            lo + int(math.floor(0.50 * span)),
        )

    olo, ohi = band(o_min, o_max)
    plo, phi = band(p_min, p_max)
    pre = snapshot_files(spark, path, prune_range=("l_orderkey", olo, ohi))
    rewrite_snapshot(
        spark, path, zorder_by=["l_orderkey", "l_partkey"], n_files=16
    )
    all_f = snapshot_files(spark, path)
    post_o = snapshot_files(spark, path, prune_range=("l_orderkey", olo, ohi))
    post_p = snapshot_files(spark, path, prune_range=("l_partkey", plo, phi))
    both = snapshot_files(
        spark,
        path,
        prune_range=[("l_orderkey", olo, ohi), ("l_partkey", plo, phi)],
    )
    if not (
        len(pre) == 16
        and len(post_o) < len(all_f)
        and len(post_p) < len(all_f)
        and len(both) <= min(len(post_o), len(post_p))
    ):
        raise AssertionError(
            "zorder rewrite did not sharpen multi-dim skipping: "
            f"pre={len(pre)} all={len(all_f)} o={len(post_o)} "
            f"p={len(post_p)} both={len(both)}"
        )
    bounds = (olo, ohi, plo, phi)
    _ZORDER_LAYERS_BUILT[path] = bounds
    return path, bounds


@register(
    "snapshot_zorder_rewrite",
    """
WITH b AS (
  SELECT CAST(MIN(l_orderkey) + FLOOR(0.40*(MAX(l_orderkey)-MIN(l_orderkey))) AS BIGINT) AS olo,
         CAST(MIN(l_orderkey) + FLOOR(0.50*(MAX(l_orderkey)-MIN(l_orderkey))) AS BIGINT) AS ohi,
         CAST(MIN(l_partkey) + FLOOR(0.40*(MAX(l_partkey)-MIN(l_partkey))) AS BIGINT) AS plo,
         CAST(MIN(l_partkey) + FLOOR(0.50*(MAX(l_partkey)-MIN(l_partkey))) AS BIGINT) AS phi
  FROM lineitem
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(FLOOR(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
FROM lineitem, b
WHERE l_orderkey BETWEEN b.olo AND b.ohi
  AND l_partkey BETWEEN b.plo AND b.phi
""",
    "multi-dimensional Z-ORDER rewrite inside the snapshot layer "
    "(rewrite_snapshot(zorder_by=[...]) — Delta OPTIMIZE ZORDER BY): "
    "the head is range-partitioned + sorted on the Morton interleave "
    "of the normalized keys (pure JVM bit expression after one "
    "broadcast min/max row, operators/layout.py), so per-file [min, "
    "max] stays narrow on EVERY participating column — the builder "
    "asserts a 10% band on EACH dimension independently prunes to a "
    "strict file subset where the hash-scrambled v1 kept all 16, and "
    "the 2-D probe composes both prunes; old versions time-travel to "
    "their original files; oracle recomputes the band aggregate from "
    "the raw table, so over-pruning a truly-needed file breaks it",
    tags=("layout", "snapshots", "index"),
)
def q_snapshot_zorder_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot

    path, (olo, ohi, plo, phi) = _zorder_layer(spark, sf_dir)
    return (
        read_snapshot(
            spark,
            path,
            prune_range=[("l_orderkey", olo, ohi), ("l_partkey", plo, phi)],
        )
        .filter(
            F.col("l_orderkey").between(olo, ohi)
            & F.col("l_partkey").between(plo, phi)
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(_cents(F.col("l_quantity"))).cast("long").alias("qty_cents"),
        )
    )


@register(
    "snapshot_minmax_metadata_only",
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc
FROM documents
""",
    "metadata-only MIN/MAX + COUNT (snapshots.snapshot_minmax / "
    "snapshot_row_count): the commit-time per-file stats answer the "
    "aggregate from a KB of manifest JSON with zero file or footer "
    "opens — sound because MIN/MAX distribute over the file union and "
    "each file's bounds are exact; the API refuses (returns None) when "
    "exactness is lost — a file without stats, or ANY live deletion "
    "vector (a deleted row could be the extremum), pinned by pytest; "
    "oracle recomputes all three from the raw table",
    tags=("snapshots", "metadata"),
)
def q_snapshot_minmax_metadata_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import snapshot_minmax, snapshot_row_count

    # the bloom layer commits doc_id stats and never deletes: eligible
    path = _bloom_layer(spark, sf_dir)
    n = snapshot_row_count(spark, path)
    mm = snapshot_minmax(spark, path, "doc_id")
    if n is None or mm is None:
        raise AssertionError("manifest could not answer metadata-only")
    return spark.createDataFrame(
        [(n, int(mm[0]), int(mm[1]))], "n_docs long, min_doc long, max_doc long"
    )


_BINPACK_LAYERS_BUILT: set[str] = set()


def _binpack_layer(spark: SparkSession, sf_dir: str) -> str:
    """Layer for the bin-packing compaction roundtrip: one healthy base
    file (90% of documents) plus three tiny append files (the remaining
    10% split three ways — the shape a streaming sink leaks).  The
    builder compacts with a threshold between the two sizes and asserts
    the big file is carried VERBATIM (same basename in the new
    manifest) while the three small files pack into one."""
    from ..sources.snapshots import (
        commit_snapshot,
        compact_small_files,
        drop_snapshot_layer,
        snapshot_files,
    )

    path = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/binpack_layer"
    if path in _BINPACK_LAYERS_BUILT:
        return path
    drop_snapshot_layer(spark, path)
    docs = load_star_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    commit_snapshot(
        spark, docs.filter(F.col("doc_id") % 10 != 0).coalesce(1), path
    )
    for k in range(3):
        commit_snapshot(
            spark,
            docs.filter(
                (F.col("doc_id") % 10 == 0) & (F.col("doc_id") % 3 == k)
            ).coalesce(1),
            path,
            mode="append",
        )
    before = snapshot_files(spark, path)
    from ..sources.snapshots import _fs, _hpath

    jvm, fs = _fs(spark, path)
    sizes = {f: fs.getFileStatus(_hpath(jvm, f)).getLen() for f in before}
    big = max(sizes, key=sizes.get)
    threshold = sizes[big]  # strictly-below-big threshold
    res = compact_small_files(
        spark, path, small_file_bytes=threshold, target_file_bytes=10**9
    )
    after = snapshot_files(spark, path)
    if not (
        res["files_rewritten"] == 3
        and res["files_carried"] == 1
        and big in after
        and len(after) == 2
    ):
        raise AssertionError(
            f"bin-packing contract broken: {res}, "
            f"before={len(before)} after={len(after)} big_carried={big in after}"
        )
    _BINPACK_LAYERS_BUILT.add(path)
    return path


@register(
    "snapshot_compact_small_files",
    """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_sum
FROM documents
GROUP BY lang
""",
    "BIN-PACKING compaction (snapshots.compact_small_files — Delta "
    "OPTIMIZE semantics): only head files under the size threshold are "
    "rewritten, coalesced to target-size outputs; healthy files are "
    "carried into the new manifest verbatim with their stats/counts/"
    "bloom/deletion-vector entries — each maintenance run costs "
    "O(small-file bytes), never O(table), which is what keeps a layer "
    "fed by O(delta) appends or streaming micro-batches healthy at "
    "100 TB; the builder asserts the big file's basename survives "
    "untouched while 3 tiny appends pack into 1; oracle recomputes the "
    "full content from the raw table, so losing or doubling any packed "
    "row breaks it",
    tags=("layout", "snapshots"),
)
def q_snapshot_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot

    path = _binpack_layer(spark, sf_dir)
    return (
        read_snapshot(spark, path)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
        )
    )


@register(
    "snapshot_history_audit",
    """
SELECT 1 AS version, 'overwrite' AS mode, 8 AS n_files,
       CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_rows,
       0 AS n_delete_entries
UNION ALL
SELECT 2, 'delete', 8,
       CAST((SELECT COUNT(*) FROM documents
             WHERE NOT (doc_id % 10 = 3)) AS BIGINT),
       1
""",
    "DESCRIBE HISTORY for the snapshot layer "
    "(snapshots.snapshot_history): one row per surviving version with "
    "its commit mode, file count, metadata-exact row count (per-file "
    "counts minus live position-delete counts — correct across the "
    "merge-on-read DELETE, where the file set is UNCHANGED but the "
    "logical cardinality drops), and live delete-entry count — the "
    "audit surface a reproducibility contract needs ('which exact "
    "corpus state trained this checkpoint'); resolved from manifest "
    "JSON only, zero data reads; companion snapshot_version_as_of "
    "gives TIMESTAMP AS OF resolution (pytest-pinned); oracle states "
    "the expected audit rows with recomputed cardinalities",
    tags=("snapshots", "metadata"),
)
def q_snapshot_history_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import snapshot_history

    path = _delete_layer(spark, sf_dir)
    return snapshot_history(spark, path).select(
        "version", "mode", "n_files", "n_rows", "n_delete_entries"
    )


_RESTORE_LAYERS_BUILT: set[str] = set()


def _restore_layer(spark: SparkSession, sf_dir: str) -> str:
    """Layer for the RESTORE roundtrip: v1 = the full documents slice,
    v2 = a botched overwrite (a 10% subset — the bad-job scenario),
    v3 = RESTORE to v1 (new manifest referencing v1's files, zero data
    movement — builder asserts the file list is v1's verbatim and the
    botched v2 stays in history)."""
    from ..sources.snapshots import (
        commit_snapshot,
        drop_snapshot_layer,
        restore_snapshot,
        snapshot_files,
        snapshot_history,
    )

    path = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/restore_layer"
    if path in _RESTORE_LAYERS_BUILT:
        return path
    drop_snapshot_layer(spark, path)
    docs = load_star_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    commit_snapshot(spark, docs.coalesce(2), path)
    commit_snapshot(spark, docs.filter(F.col("doc_id") % 10 == 0).coalesce(1), path)
    v3 = restore_snapshot(spark, path, 1)
    hist = {
        r["version"]: r["mode"]
        for r in snapshot_history(spark, path).collect()
    }
    if not (
        v3 == 3
        and hist[3] == "restore"
        and hist[2] == "overwrite"
        and snapshot_files(spark, path, 3) == snapshot_files(spark, path, 1)
    ):
        raise AssertionError(f"restore contract broken: v3={v3} hist={hist}")
    _RESTORE_LAYERS_BUILT.add(path)
    return path


@register(
    "snapshot_restore_rollback",
    """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_sum
FROM documents
GROUP BY lang
""",
    "RESTORE / rollback-as-a-commit (snapshots.restore_snapshot — "
    "Delta RESTORE semantics): after a botched overwrite, the head is "
    "rolled back by committing a NEW manifest that references the good "
    "version's exact files, stats, blooms and deletion vectors — zero "
    "data movement, the bad version stays in history for audit, and "
    "writer txn high-water marks carry from the CURRENT head so a "
    "replayed streaming batch still no-ops after the rollback "
    "(pytest-pinned, with the vacuumed-version up-front failure); the "
    "oracle (the good version's content, i.e. the full table) breaks "
    "if the rollback loses or resurrects anything; companion "
    "clone_snapshot gives zero-copy SHALLOW CLONE (pytest: clone "
    "diverges via its own COW merge, source untouched)",
    tags=("snapshots", "metadata"),
)
def q_snapshot_restore_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot

    path = _restore_layer(spark, sf_dir)
    return (
        read_snapshot(spark, path)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_sum"),
        )
    )


@register(
    "snapshot_restore_provenance",
    """
SELECT 1 AS version, 'overwrite' AS mode, CAST(NULL AS INT) AS restore_of
UNION ALL SELECT 2, 'overwrite', NULL
UNION ALL SELECT 3, 'restore', 1
""",
    "RESTORE PROVENANCE in DESCRIBE HISTORY (snapshot_history's "
    "restore_of column): a rollback commit records WHICH version it "
    "reinstated, so 'what state was current after the restore' — the "
    "question an incident review always asks — is answerable from "
    "manifest JSON alone, zero data reads; non-restore versions carry "
    "NULL; the oracle states the expected audit rows for the "
    "botched-overwrite -> restore(v1) history",
    tags=("snapshots", "metadata"),
)
def q_snapshot_restore_provenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.snapshots import snapshot_history

    path = _restore_layer(spark, sf_dir)
    return snapshot_history(spark, path).select(
        "version", "mode", "restore_of"
    )


_IVM_JOIN_BUILT: set[str] = set()


def _ivm_join_layers(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Two append-only snapshot layers for JOIN-view maintenance: the
    fact (orders) and the dim (customer), each committed as v1 = a
    deterministic slice, v2 = append of the rest — so v2 of each equals
    the full base table and the incremental result is oracle-checkable
    against a raw-table recompute."""
    from ..sources.snapshots import commit_snapshot, drop_snapshot_layer

    base = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/ivm_join"
    pa, pb = f"{base}/fact", f"{base}/dim"
    if base in _IVM_JOIN_BUILT:
        return pa, pb
    orders = load_star_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_star_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    for p, df, gate in (
        (pa, orders, F.col("o_orderkey") % 3 == 0),
        (pb, cust, F.col("c_custkey") % 2 == 0),
    ):
        drop_snapshot_layer(spark, p)
        commit_snapshot(spark, df.filter(gate).coalesce(2), p)
        commit_snapshot(spark, df.filter(~gate).coalesce(2), p, mode="append")
    _IVM_JOIN_BUILT.add(base)
    return pa, pb


@register(
    "ivm_join_refresh",
    """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c_mktsegment
""",
    "incremental maintenance of a JOIN view over TWO independently "
    "appended snapshot layers: new_view = old_view + agg(dA JOIN "
    "B_new) + agg(A_old JOIN dB) — the delta-join identity "
    "(A+dA)x(B+dB) = AxB + dAxB_new + A_old x dB — where each delta "
    "comes from snapshot_append_delta, a MANIFEST SET DIFFERENCE that "
    "reads O(delta files) with zero comparison compute (the generic "
    "change feed pays two full-table exceptAll shuffles; the "
    "specialization is guarded: non-append modes or changed deletion "
    "vectors raise); the deltas ride broadcast joins, the three "
    "partials fold in one final rollup, and the oracle (the full "
    "join-aggregate over the raw tables) breaks if any partial is "
    "lost, doubled, or joined against the wrong side's version",
    tags=("snapshots", "ivm", "join"),
)
def q_ivm_join_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot, snapshot_append_delta

    pa, pb = _ivm_join_layers(spark, sf_dir)
    a1 = read_snapshot(spark, pa, 1)
    b1 = read_snapshot(spark, pb, 1)
    b2 = read_snapshot(spark, pb, 2)
    da = snapshot_append_delta(spark, pa, 1, 2)
    db = snapshot_append_delta(spark, pb, 1, 2)

    def part(fact: DataFrame, dim: DataFrame) -> DataFrame:
        return (
            fact.join(
                F.broadcast(dim), fact["o_custkey"] == dim["c_custkey"]
            )
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(_cents(F.col("o_totalprice"))).alias("revenue_cents"),
            )
        )

    old_view = part(a1, b1)           # the materialized state
    inc_a = part(da, b2)              # new facts against the new dim
    inc_b = part(a1, db)              # old facts against the new dim rows
    return (
        old_view.unionByName(inc_a)
        .unionByName(inc_b)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("revenue_cents").cast("long").alias("revenue_cents"),
        )
    )


_PUSHDOWN_LAYERS_BUILT: set[str] = set()


def _orders_pushdown_layer(spark: SparkSession, sf_dir: str) -> str:
    """Orders committed range-clustered on o_orderkey with BOTH per-file
    min/max stats AND the Bloom point index — the layout the pushdown
    DataSource prunes against on every predicate shape (range bands via
    stats, point/IN probes via blooms).  Built once per process."""
    from ..sources.snapshots import commit_snapshot, drop_snapshot_layer

    path = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/orders_pushdown_layer"
    if path in _PUSHDOWN_LAYERS_BUILT:
        return path
    drop_snapshot_layer(spark, path)
    orders = load_star_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    commit_snapshot(
        spark,
        orders.repartitionByRange(8, "o_orderkey"),
        path,
        stats_cols=["o_orderkey"],
        bloom_col="o_orderkey",
    )
    _PUSHDOWN_LAYERS_BUILT.add(path)
    return path


@register(
    "snapshot_pushdown_scan",
    """
SELECT 'range' AS scan_kind,
       COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM orders
WHERE o_orderkey BETWEEN 3000 AND 4000
UNION ALL
SELECT 'point',
       COUNT(*),
       CAST(SUM(o_orderkey) AS BIGINT),
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
FROM orders
WHERE o_orderkey IN (7, 4242)
""",
    "PREDICATE-DRIVEN manifest pruning with zero caller cooperation "
    "(sources/snapshot_batch.py — the filter-pushdown batch DataSource "
    "over the snapshot layer): a plain WHERE on the loaded relation is "
    "pushed through Spark's Python-DataSource pushFilters hook and "
    "mapped onto the manifest's two-level stats (segment envelopes, "
    "then per-file ranges) and Bloom indexes (segment unions, then "
    "per-file bit sets) — the range band opens 1 of 8 files and the "
    "IN probe bloom-skips everything else, with NO prune_range/"
    "prune_point argument anywhere (Delta/Iceberg's skipping-from-the-"
    "query's-own-predicates contract); every filter is also re-applied "
    "row-level by Spark, so pruning is an optimization, never the "
    "correctness boundary; the file/segment counts are counter-pinned "
    "by pytest, and the oracle recomputes both scans through the raw "
    "table",
    tags=("snapshots", "pruning", "sources"),
)
def q_snapshot_pushdown_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshot_batch import read_snapshot_pushdown

    path = _orders_pushdown_layer(spark, sf_dir)
    # one fresh relation PER QUERY: the safe usage unit for a
    # filter-pushdown Python DataSource (module docstring sharp edge)
    band = (
        read_snapshot_pushdown(spark, path)
        .filter(F.col("o_orderkey").between(3000, 4000))
        .agg(
            F.lit("range").alias("scan_kind"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("price_cents"),
        )
    )
    point = (
        read_snapshot_pushdown(spark, path)
        .filter(F.col("o_orderkey").isin([7, 4242]))
        .agg(
            F.lit("point").alias("scan_kind"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_orderkey").alias("key_sum"),
            F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("price_cents"),
        )
    )
    return band.unionByName(point)


_HIDDEN_PART_BUILT: set[str] = set()


def _hidden_partition_layer(spark: SparkSession, sf_dir: str) -> str:
    """Customer committed under HIDDEN PARTITIONING: a
    ``bucket(8, c_custkey)`` partition spec with ``cluster=True``, so
    each data file holds one hash bucket — after which the key's
    NATURAL per-file [min, max] spans the whole domain (range stats are
    provably useless; the builder asserts a point probe still prunes to
    a strict subset via the transform stats).  Built once per process."""
    import json as _json

    from ..sources.snapshot_batch import read_snapshot_pushdown
    from ..sources.snapshots import commit_snapshot, drop_snapshot_layer

    path = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/hidden_partition_layer"
    if path in _HIDDEN_PART_BUILT:
        return path
    drop_snapshot_layer(spark, path)
    cust = load_star_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    commit_snapshot(
        spark,
        cust,
        path,
        stats_cols=["c_custkey"],  # recorded AND useless: hash layout
        partition_spec=[
            {"transform": "bucket", "n": 8, "source": "c_custkey"}
        ],
        cluster=True,
    )
    log_path = f"{path}_probe_log"
    probe = read_snapshot_pushdown(spark, path, plan_log=log_path).filter(
        F.col("c_custkey") == 57
    )
    n = probe.count()
    log = _json.load(open(log_path.removeprefix("file:")))
    if n != 1 or not (0 < log["n_files_planned"] < log["n_files_total"]):
        raise AssertionError(
            f"hidden-partition probe did not prune: rows={n}, plan={log}"
        )
    _HIDDEN_PART_BUILT.add(path)
    return path


@register(
    "snapshot_hidden_partition_prune",
    """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum
FROM customer
WHERE c_custkey IN (11, 57, 123)
GROUP BY c_mktsegment
""",
    "HIDDEN PARTITIONING (Iceberg partition-spec transforms, VERDICT r7 "
    "#7): the layer records bucket(8, c_custkey) as a table property; "
    "commit computes each file's transform-value [min, max] in the same "
    "single stats scan, cluster=True lays files out one-bucket-per-file, "
    "and the pushdown DataSource maps the query's own IN predicate "
    "through the transform (pure-Python xxhash64, bit-parity-pinned with "
    "Spark's) onto the derived stats BEFORE the scan plans — so a point "
    "lookup on a hash-scrambled key opens only its buckets' files with "
    "zero caller cooperation, where the key's natural min/max (also "
    "recorded, spanning the domain per file) can prune nothing; the "
    "builder asserts strict-subset planning, pytest counter-pins "
    "bucket/truncate/day mapping, and the oracle recomputes the probe "
    "from the raw table",
    tags=("snapshots", "pruning", "layout", "sources"),
)
def q_snapshot_hidden_partition_prune(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.snapshot_batch import read_snapshot_pushdown

    path = _hidden_partition_layer(spark, sf_dir)
    return (
        read_snapshot_pushdown(spark, path)
        .filter(F.col("c_custkey").isin([11, 57, 123]))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("c_custkey").cast("long").alias("key_sum"),
        )
    )


_EVOLVED_PART_BUILT: set[str] = set()


def _evolved_partition_layer(spark: SparkSession, sf_dir: str) -> str:
    """PARTITION-SPEC EVOLUTION fixture: the even-key half of customer
    committed under ``bucket(4, c_custkey)``, the odd-key half APPENDED
    under a NEW ``bucket(8, c_custkey)`` spec — Iceberg spec evolution,
    where each file carries the derived stats of the spec it was
    written under and the manifest accumulates the spec history
    (``partition_specs_all``) so the pushdown reader probes BOTH
    generations sharply.  The builder asserts a point probe on an
    old-generation key plans <= 2 of the files (one bucket-file per
    generation; probing only the head's active spec would keep every
    old file).  Built once per process."""
    import json as _json

    from ..sources.snapshot_batch import read_snapshot_pushdown
    from ..sources.snapshots import commit_snapshot, drop_snapshot_layer

    path = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/evolved_partition_layer"
    if path in _EVOLVED_PART_BUILT:
        return path
    drop_snapshot_layer(spark, path)
    cust = load_star_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    commit_snapshot(
        spark,
        cust.filter(F.col("c_custkey") % 2 == 0),
        path,
        stats_cols=["c_custkey"],
        partition_spec=[
            {"transform": "bucket", "n": 4, "source": "c_custkey"}
        ],
        cluster=True,
    )
    commit_snapshot(
        spark,
        cust.filter(F.col("c_custkey") % 2 == 1),
        path,
        mode="append",
        stats_cols=["c_custkey"],
        partition_spec=[
            {"transform": "bucket", "n": 8, "source": "c_custkey"}
        ],
        cluster=True,
    )
    log_path = f"{path}_probe_log"
    probe = read_snapshot_pushdown(spark, path, plan_log=log_path).filter(
        F.col("c_custkey") == 42  # old-generation (even) key
    )
    n = probe.count()
    log = _json.load(open(log_path.removeprefix("file:")))
    if n != 1 or not (0 < log["n_files_planned"] <= 2 < log["n_files_total"]):
        raise AssertionError(
            f"evolved-spec probe did not prune both generations: "
            f"rows={n}, plan={log}"
        )
    _EVOLVED_PART_BUILT.add(path)
    return path


@register(
    "snapshot_partition_evolution",
    """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum
FROM customer
WHERE c_custkey IN (11, 42, 57, 124)
GROUP BY 1
""",
    "PARTITION-SPEC EVOLUTION (Iceberg spec-id semantics): a layer's "
    "hidden-partitioning spec may change on a later commit — here "
    "bucket(4, key) for the even-key generation, bucket(8, key) "
    "declared on the odd-key append — and the manifest accumulates "
    "EVERY spec the layer wrote under (partition_specs_all), so the "
    "pushdown reader maps a predicate through all of them and each "
    "file prunes via the stats of the spec it was actually written "
    "under (builder-asserted: an old-generation point probe plans <=2 "
    "of the files, where probing only the head's active spec would "
    "keep the whole old generation); files lacking a probed stat are "
    "conservatively kept, so stale specs are never wrong, only less "
    "sharp; an IN probe spanning both generations feeds a segment "
    "rollup the oracle recomputes from the raw table",
    tags=("snapshots", "pruning", "pushdown"),
)
def q_snapshot_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshot_batch import read_snapshot_pushdown

    path = _evolved_partition_layer(spark, sf_dir)
    return (
        read_snapshot_pushdown(spark, path)
        .filter(F.col("c_custkey").isin([11, 42, 57, 124]))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("c_custkey").cast("long").alias("key_sum"),
        )
    )


_WAP_STAR_BUILT: set[str] = set()


def _wap_star_store(spark: SparkSession, sf_dir: str) -> str:
    """MULTI-TABLE WAP fixture: facts (orders with o_orderkey % 4 = 0)
    + dims (customer segments) published at catalog v1; a facts branch
    APPENDS the % 4 = 1 slice while a dims branch OVERWRITES with
    'W_'-prefixed labels — the correlated change only a JOINT publish
    keeps consistent (new facts against old labels, or vice versa,
    breaks the oracle) — then ONE ``wap_publish_many`` swap lands both
    with audits.  The builder asserts mid-branch isolation on BOTH
    tables.  Once per process."""
    from ..sources.snapshots import commit_snapshot, drop_snapshot_layer
    from ..sources.table_catalog import (
        commit_catalog,
        read_catalog_table,
        wap_branch,
        wap_publish_many,
    )

    cat = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/wap_star"
    if cat in _WAP_STAR_BUILT:
        return cat
    pf, pd = f"{cat}_facts", f"{cat}_dims"
    bf, bd = f"{cat}_bfacts", f"{cat}_bdims"
    for p in (cat, pf, pd, bf, bd):
        # rebuild hygiene drops sources AND their WAP branches together,
        # so the branch-pin drop guard is intentionally overridden
        drop_snapshot_layer(spark, p, force=True)
    orders = load_star_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_star_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    vf = commit_snapshot(
        spark,
        orders.filter(F.col("o_orderkey") % 4 == 0),
        pf,
        stats_cols=["o_orderkey"],
    )
    vd = commit_snapshot(spark, cust, pd)
    commit_catalog(
        spark,
        cat,
        {
            "facts": {"path": pf, "version": vf},
            "dims": {"path": pd, "version": vd},
        },
    )
    n_f = read_catalog_table(spark, cat, "facts").count()
    wap_branch(spark, cat, "facts", bf, audit_id="load-w2")
    wap_branch(spark, cat, "dims", bd, audit_id="load-w2")
    commit_snapshot(
        spark,
        orders.filter(F.col("o_orderkey") % 4 == 1),
        bf,
        mode="append",
        stats_cols=["o_orderkey"],
    )
    commit_snapshot(
        spark,
        cust.select(
            "c_custkey",
            F.concat(F.lit("W_"), F.col("c_mktsegment")).alias(
                "c_mktsegment"
            ),
        ),
        bd,
    )
    # isolation on BOTH tables until the joint swap
    if (
        read_catalog_table(spark, cat, "facts").count() != n_f
        or read_catalog_table(spark, cat, "dims")
        .filter(F.col("c_mktsegment").startswith("W_"))
        .count()
        != 0
    ):
        raise AssertionError("multi-table WAP isolation broken mid-branch")
    wap_publish_many(
        spark,
        cat,
        [bf, bd],
        checks={
            bf: {"keyed": "o_orderkey IS NOT NULL"},
            bd: {"labeled": "c_mktsegment IS NOT NULL"},
        },
    )
    _WAP_STAR_BUILT.add(cat)
    return cat


@register(
    "snapshot_wap_publish_many",
    """
SELECT CAST(1 AS BIGINT) AS catalog_version,
       c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey % 4 = 0
GROUP BY 2
UNION ALL
SELECT CAST(2 AS BIGINT),
       'W_' || c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey % 4 IN (0, 1)
GROUP BY 2
""",
    "MULTI-TABLE Write-Audit-Publish (the cross-table branch commit "
    "Nessie/LakeFS give over per-table Iceberg WAP): facts and dims "
    "branch independently as zero-copy clones, take CORRELATED changes "
    "(appended facts + re-labeled dims — the pair only a joint publish "
    "keeps consistent), pass per-branch audits, and land in ONE CAS "
    "catalog swap — catalog readers see all of the publish or none "
    "(builder-asserted isolated mid-branch on BOTH tables; pytest "
    "proves a failed audit on either branch publishes NEITHER); the "
    "query joins facts to dims THROUGH the catalog at both versions, "
    "so a torn or half-published swap breaks the oracle hash",
    tags=("snapshots", "catalog", "transactions"),
)
def q_snapshot_wap_publish_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.table_catalog import read_catalog_table

    cat = _wap_star_store(spark, sf_dir)

    def level(cv: int) -> DataFrame:
        facts = read_catalog_table(spark, cat, "facts", catalog_version=cv)
        dims = read_catalog_table(spark, cat, "dims", catalog_version=cv)
        return (
            facts.join(
                F.broadcast(dims),
                facts["o_custkey"] == dims["c_custkey"],
            )
            .groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum(_cents(F.col("o_totalprice")))
                .cast("long")
                .alias("revenue_cents"),
            )
            .select(
                F.lit(cv).cast("long").alias("catalog_version"),
                "segment",
                "n_orders",
                "revenue_cents",
            )
        )

    return level(1).unionByName(level(2))


_CATALOG_TXN_BUILT: set[str] = set()


def _catalog_txn_store(spark: SparkSession, sf_dir: str) -> str:
    """Two-table catalog exercising multi-table ATOMIC commits: txn 1
    publishes facts (orders with o_orderkey % 3 = 0) + dims (customer
    segments as-is); txn 2 publishes, IN ONE SWAP, appended facts
    (% 3 = 1) and a re-labeled dim (segments prefixed 'X_') — so any
    reader mixing catalog versions would join new facts against old
    labels or vice versa, which the oracle would catch.  Once per
    process."""
    from ..sources.snapshots import drop_snapshot_layer
    from ..sources.table_catalog import multi_table_commit

    cat = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/catalog_txn"
    if cat in _CATALOG_TXN_BUILT:
        return cat
    pa = f"{cat}_facts"
    pb = f"{cat}_dims"
    for p in (cat, pa, pb):
        drop_snapshot_layer(spark, p)
    orders = load_star_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_star_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    multi_table_commit(
        spark,
        cat,
        [
            (
                "facts",
                orders.filter(F.col("o_orderkey") % 3 == 0),
                pa,
                {"stats_cols": ["o_orderkey"]},
            ),
            ("dims", cust, pb, {}),
        ],
    )
    multi_table_commit(
        spark,
        cat,
        [
            (
                "facts",
                orders.filter(F.col("o_orderkey") % 3 == 1),
                pa,
                {"mode": "append", "stats_cols": ["o_orderkey"]},
            ),
            (
                "dims",
                cust.select(
                    "c_custkey",
                    F.concat(F.lit("X_"), F.col("c_mktsegment")).alias(
                        "c_mktsegment"
                    ),
                ),
                pb,
                {},
            ),
        ],
    )
    _CATALOG_TXN_BUILT.add(cat)
    return cat


@register(
    "snapshot_catalog_txn",
    """
SELECT CAST(1 AS BIGINT) AS catalog_version,
       c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey % 3 = 0
GROUP BY 2
UNION ALL
SELECT CAST(2 AS BIGINT),
       'X_' || c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey % 3 IN (0, 1)
GROUP BY 2
""",
    "multi-table ATOMIC transactions via a versioned TABLE CATALOG "
    "(sources/table_catalog.py — the Iceberg REST-catalog transaction "
    "shape): each transaction stages normal per-layer commits, then ONE "
    "no-overwrite catalog swap pins every table's new layer version, so "
    "catalog readers see all of a transaction or none of it and "
    "`catalog_version=N` time-travels the WHOLE star consistently; the "
    "query joins facts to dims at BOTH catalog versions — txn 2 changed "
    "facts and dim labels together, so a reader mixing versions (new "
    "facts with old labels or vice versa) breaks the oracle hash; swap "
    "losers rebase-and-retry under the same OCC as layer commits "
    "(pytest: injected race, crash-before-swap invisibility)",
    tags=("snapshots", "catalog", "transactions"),
)
def q_snapshot_catalog_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.table_catalog import read_catalog_table

    cat = _catalog_txn_store(spark, sf_dir)

    def level(cv: int) -> DataFrame:
        facts = read_catalog_table(spark, cat, "facts", catalog_version=cv)
        dims = read_catalog_table(spark, cat, "dims", catalog_version=cv)
        return (
            facts.join(
                F.broadcast(dims),
                facts["o_custkey"] == dims["c_custkey"],
            )
            .groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum(_cents(F.col("o_totalprice")))
                .cast("long")
                .alias("revenue_cents"),
            )
            .select(
                F.lit(cv).cast("long").alias("catalog_version"),
                "segment",
                "n_orders",
                "revenue_cents",
            )
        )

    return level(1).unionByName(level(2))


_WAP_BUILT: set[str] = set()


def _wap_store(spark: SparkSession, sf_dir: str) -> str:
    """WRITE-AUDIT-PUBLISH fixture: documents published at catalog v1,
    then a WAP branch (zero-copy clone of the pinned state) takes an
    append (every 3rd doc mirrored at doc_id + 100000) AND a
    merge-on-read DELETE (doc_id % 10 = 7) in ISOLATION — the builder
    asserts catalog readers still see the untouched v1 content
    mid-branch — then an audited atomic repoint publishes the branch
    head as catalog v2.  Once per process."""
    from ..sources.snapshots import (
        commit_snapshot,
        delete_snapshot,
        drop_snapshot_layer,
    )
    from ..sources.table_catalog import (
        commit_catalog,
        read_catalog_table,
        wap_branch,
        wap_publish,
    )

    cat = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/wap_catalog"
    if cat in _WAP_BUILT:
        return cat
    docs_layer, branch = f"{cat}_docs", f"{cat}_audit"
    for p in (cat, docs_layer, branch):
        # rebuild hygiene drops sources AND their WAP branches together,
        # so the branch-pin drop guard is intentionally overridden
        drop_snapshot_layer(spark, p, force=True)
    base = load_star_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    v1 = commit_snapshot(spark, base, docs_layer, stats_cols=["doc_id"])
    commit_catalog(spark, cat, {"docs": {"path": docs_layer, "version": v1}})
    n_base = base.count()
    wap_branch(spark, cat, "docs", branch, audit_id="ingest-batch-1")
    commit_snapshot(
        spark,
        base.filter(F.col("doc_id") % 3 == 1).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "source", "text"
        ),
        branch,
        mode="append",
        stats_cols=["doc_id"],
    )
    delete_snapshot(spark, branch, "doc_id % 10 = 7")
    # WAP's whole point, asserted: the branch's append AND delete are
    # invisible through the catalog until the publish swap
    n_mid = read_catalog_table(spark, cat, "docs").count()
    if n_mid != n_base:
        raise AssertionError(
            f"WAP isolation broken: catalog readers saw {n_mid} rows "
            f"mid-branch, expected the published {n_base}"
        )
    wap_publish(
        spark, cat, branch, checks={"ids_present": "doc_id IS NOT NULL"}
    )
    _WAP_BUILT.add(cat)
    return cat


@register(
    "snapshot_wap_publish",
    """
WITH base AS (SELECT doc_id, source, text FROM documents),
aug AS (
  SELECT doc_id, source, text FROM base
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, source, text
  FROM base WHERE doc_id % 3 = 1
),
pub AS (SELECT * FROM aug WHERE doc_id % 10 <> 7)
SELECT CAST(1 AS BIGINT) AS catalog_version, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(coalesce(text, ''))) AS BIGINT) AS n_chars
FROM base GROUP BY 2
UNION ALL
SELECT CAST(2 AS BIGINT), source, CAST(COUNT(*) AS BIGINT),
       CAST(SUM(length(coalesce(text, ''))) AS BIGINT)
FROM pub GROUP BY 2
""",
    "WRITE-AUDIT-PUBLISH via catalog-level branching (the Iceberg WAP / "
    "Nessie / LakeFS pattern, composed from the repo's own primitives): "
    "a BRANCH is a zero-copy shallow clone of the exact (path, version) "
    "the catalog pins — so the full layer API (here: an append AND a "
    "merge-on-read DELETE) works on it unchanged and in isolation, "
    "builder-asserted invisible to catalog readers mid-branch; audit "
    "checks run over the branch head (MoR-aware, one aggregate scan) "
    "and gate the PUBLISH, not the write — bad data may land on the "
    "branch, it never reaches readers; the publish is one CAS catalog "
    "repoint with a stale-source lost-update guard (pytest: audit "
    "failure keeps serving v1, concurrent publish refused, forced "
    "last-writer-wins recorded in history); the query reads per-source "
    "doc/char rollups THROUGH the catalog at BOTH versions — a torn or "
    "leaked publish breaks the hash",
    tags=("snapshots", "catalog", "transactions"),
)
def q_snapshot_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.table_catalog import read_catalog_table

    cat = _wap_store(spark, sf_dir)

    def level(cv: int) -> DataFrame:
        docs = read_catalog_table(spark, cat, "docs", catalog_version=cv)
        return docs.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit(""))))
            .cast("long")
            .alias("n_chars"),
        ).select(
            F.lit(cv).cast("long").alias("catalog_version"),
            "source",
            "n_docs",
            "n_chars",
        )

    return level(1).unionByName(level(2))


_MERGE_CDF_BUILT: set[str] = set()


def _orders_merge_cdf_layer(spark: SparkSession, sf_dir: str) -> str:
    """Orders committed CHANGE-FEED-enabled and key-clustered, then
    MERGEd with a deterministic CDC batch: every 7th order re-priced
    (+1000) and re-inserted under an offset key at price 42 — so v2 is
    recomputable in SQL and the recorded change file carries exactly
    the update's delete+insert pairs plus the inserts.  Once per
    process."""
    from ..sources.snapshots import (
        commit_snapshot,
        drop_snapshot_layer,
        merge_snapshot,
    )

    path = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/orders_merge_cdf"
    if path in _MERGE_CDF_BUILT:
        return path
    drop_snapshot_layer(spark, path)
    orders = load_star_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    commit_snapshot(
        spark,
        orders.repartitionByRange(8, "o_orderkey"),
        path,
        stats_cols=["o_orderkey"],
        change_feed=True,
    )
    hot = orders.filter(F.col("o_orderkey") % 7 == 0)
    delta = hot.withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000
    ).unionByName(
        hot.select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            "o_custkey",
            F.lit(42.0).alias("o_totalprice"),
        )
    )
    merge_snapshot(spark, delta, path, "o_orderkey", stats_cols=["o_orderkey"])
    _MERGE_CDF_BUILT.add(path)
    return path


@register(
    "ivm_merge_refresh",
    """
WITH v2 AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000
              ELSE o_totalprice END AS o_totalprice
  FROM orders
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, 42.0
  FROM orders WHERE o_orderkey % 7 = 0
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM v2 JOIN customer c ON v2.o_custkey = c.c_custkey
GROUP BY c_mktsegment
""",
    "O(delta) incremental view maintenance ACROSS A MERGE version via "
    "the recorded change-data feed (snapshots.py change_feed property — "
    "per-commit change files, Delta CDF style): a join-view (orders x "
    "customer dim, broadcast) materialized at v1 is refreshed to the "
    "post-MERGE v2 state by folding ONLY the commit's recorded change "
    "rows (+1 per insert, -1 per delete; an update folds as the "
    "delete+insert pair the change file carries) — the generic feed "
    "would pay two full-table exceptAll shuffles per refresh, which is "
    "exactly what made IVM over CDC-maintained layers O(table) before "
    "(VERDICT r6 #2); zero-fallback is counter-pinned by pytest, and "
    "the oracle recomputes the v2 join-aggregate from the raw tables",
    tags=("snapshots", "ivm", "cdc", "join"),
)
def q_ivm_merge_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot, snapshot_changes

    path = _orders_merge_cdf_layer(spark, sf_dir)
    dim = load_star_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )

    base = (
        read_snapshot(spark, path, 1)
        .join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).alias("revenue_cents"),
        )
    )
    feed = snapshot_changes(spark, path, 1, 2)
    sign = F.when(F.col("change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    fold = (
        feed.withColumn("__sign", sign)
        .join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.sum("__sign").alias("n_orders"),
            F.sum(F.col("__sign") * _cents(F.col("o_totalprice"))).alias(
                "revenue_cents"
            ),
        )
    )
    return (
        base.unionByName(fold)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("revenue_cents").cast("long").alias("revenue_cents"),
        )
    )


_MERGE_EVOLVE_BUILT: set[str] = set()


def _docs_merge_evolve_layer(spark: SparkSession, sf_dir: str) -> str:
    """Documents layer whose schema EVOLVES through a MERGE: v1 commits
    (doc_id, lang) key-clustered; v2 merges a delta carrying a new
    ``quality`` column (every 11th doc scored, plus scored inserts under
    offset ids) — the CDC-feed-gains-a-column reality.  Once per
    process."""
    from ..sources.snapshots import (
        commit_snapshot,
        drop_snapshot_layer,
        merge_snapshot,
    )

    path = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/docs_merge_evolve"
    if path in _MERGE_EVOLVE_BUILT:
        return path
    drop_snapshot_layer(spark, path)
    docs = load_star_table(spark, sf_dir, "documents").select(
        "doc_id", "lang"
    )
    commit_snapshot(
        spark,
        docs.repartitionByRange(8, "doc_id"),
        path,
        stats_cols=["doc_id"],
    )
    hot = docs.filter(F.col("doc_id") % 11 == 0)
    delta = hot.withColumn(
        "quality", (F.col("doc_id") % 5) * F.lit(0.5)
    ).unionByName(
        hot.select(
            (F.col("doc_id") + 1000000000).alias("doc_id"),
            F.lit("xx").alias("lang"),
            F.lit(9.5).alias("quality"),
        )
    )
    merge_snapshot(spark, delta, path, "doc_id", stats_cols=["doc_id"])
    _MERGE_EVOLVE_BUILT.add(path)
    return path


@register(
    "snapshot_merge_evolve",
    """
WITH ev AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 11 = 0 THEN (doc_id % 5) * 0.5 END AS quality
  FROM documents
  UNION ALL
  SELECT doc_id + 1000000000, 'xx', 9.5
  FROM documents WHERE doc_id % 11 = 0
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(quality) AS BIGINT) AS n_scored,
       CAST(SUM(CAST(FLOOR(quality * 10) AS BIGINT)) AS BIGINT)
         AS q_tenths
FROM ev GROUP BY lang
""",
    "ADDITIVE SCHEMA EVOLUTION ON MERGE (VERDICT r6 #3): a CDC upsert "
    "whose delta carries a brand-new quality column merges without a "
    "manual migration — the rewritten region holds the column "
    "physically, every carried file reads NULL for it under "
    "merge_schema (same contract as evolving appends), the manifest "
    "records the widened schema, and re-typing is still rejected at "
    "the write; the oracle recomputes the post-merge state (scored "
    "updates + scored offset inserts + NULL-quality untouched rows) "
    "from the raw table",
    tags=("snapshots", "merge", "schema-evolution"),
)
def q_snapshot_merge_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import read_snapshot

    path = _docs_merge_evolve_layer(spark, sf_dir)
    df = read_snapshot(spark, path, merge_schema=True)
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("quality").alias("n_scored"),
        F.sum(F.floor(F.col("quality") * 10).cast("long"))
        .cast("long")
        .alias("q_tenths"),
    )


_MAINT_LAYERS_BUILT: set[str] = set()

#: maintenance-plan knobs, shared by the engine call and the SQL oracle
_MAINT_BUCKETS = 12
_MAINT_TARGET_ROWS = 10_000


def _maintenance_layer(spark: SparkSession, sf_dir: str) -> str:
    """A layer in exactly the shape steady-state micro-batch ingest
    leaves behind: 12 tiny single-file appends (documents split by
    doc_id parity class), doc_id stats on every file — so every file is
    under the row target AND every file's [min, max] doc_id range spans
    the whole domain (interleaved residues: the layout data skipping
    hates).  Built once per process."""
    from ..sources.snapshots import commit_snapshot, drop_snapshot_layer

    path = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/maint_layer"
    if path in _MAINT_LAYERS_BUILT:
        return path
    drop_snapshot_layer(spark, path)
    docs = load_star_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    for i in range(_MAINT_BUCKETS):
        commit_snapshot(
            spark,
            docs.filter(F.col("doc_id") % _MAINT_BUCKETS == i).repartition(1),
            path,
            mode="overwrite" if i == 0 else "append",
            stats_cols=["doc_id"],
        )
    _MAINT_LAYERS_BUILT.add(path)
    return path


@register(
    "snapshot_maintenance_plan",
    f"""
WITH f AS (
  SELECT doc_id % {_MAINT_BUCKETS} AS b, COUNT(*) AS n,
         MIN(doc_id) AS lo, MAX(doc_id) AS hi
  FROM documents GROUP BY 1
),
small AS (
  SELECT COUNT(*) AS ns, SUM(n) AS sr FROM f
  WHERE n < {_MAINT_TARGET_ROWS // 2}
),
compact AS (
  SELECT 'compact_small_files' AS action, CAST(NULL AS VARCHAR) AS col,
         CAST(ns AS BIGINT) AS n_files, CAST(sr AS BIGINT) AS n_rows,
         GREATEST(CAST(CEIL(sr / {_MAINT_TARGET_ROWS}.0) AS BIGINT), 1)
           AS predicted_files,
         CAST(NULL AS BIGINT) AS overlap_files
  FROM small
  WHERE ns >= 2
    AND GREATEST(CAST(CEIL(sr / {_MAINT_TARGET_ROWS}.0) AS BIGINT), 1) < ns
),
chain AS (
  SELECT lo, hi,
         MAX(hi) OVER (ORDER BY lo, hi
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS run_hi
  FROM f
),
ov AS (
  SELECT COUNT(*) FILTER (run_hi IS NOT NULL AND lo <= run_hi) AS overlap,
         COUNT(*) AS nr
  FROM chain
),
clus AS (
  SELECT 'cluster' AS action, 'doc_id' AS col,
         CAST(nr AS BIGINT) AS n_files,
         CAST((SELECT SUM(n) FROM f) AS BIGINT) AS n_rows,
         CAST(nr AS BIGINT) AS predicted_files,
         CAST(overlap AS BIGINT) AS overlap_files
  FROM ov
  WHERE nr >= 2 AND overlap > 0.5 * nr
)
SELECT * FROM compact UNION ALL SELECT * FROM clus
ORDER BY action
""",
    "TABLE-MAINTENANCE ADVISOR (metadata-only, "
    "sources/snapshots.py snapshot_maintenance_plan): one pass over "
    "the manifest JSON — never a data file — emits the actions a "
    "steady-state layer needs with the figures an operator schedules "
    "by: compact_small_files (live files under the row target, with "
    "the predicted post-compaction file count), cluster (per stats "
    "column whose per-file [min,max] ranges overlap past 50% — the "
    "signal data skipping has gone dull), fold_deletes (live DVs "
    "forcing merge-on-read), vacuum (files only old versions "
    "reference); exercised here on 12 tiny interleaved appends of the "
    "documents table, so the plan must recommend BOTH compaction and "
    "clustering with exact file/row arithmetic the oracle recomputes "
    "from the base table (row-based thresholds keep the figures "
    "deterministic across writers/codecs); the act-then-replan loop "
    "(compact -> recommendations clear -> vacuum row appears) is "
    "pytest-pinned in test_sources.py",
    tags=("layout", "maintenance", "snapshots"),
)
def q_snapshot_maintenance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.snapshots import snapshot_maintenance_plan

    path = _maintenance_layer(spark, sf_dir)
    return snapshot_maintenance_plan(
        spark, path, target_rows_per_file=_MAINT_TARGET_ROWS
    )


_CMAINT_BUILT: set[str] = set()

#: orders-side knobs for the catalog-wide sweep (docs side reuses
#: _MAINT_BUCKETS/_MAINT_TARGET_ROWS so the two advisors share arithmetic)
_CMAINT_ORD_BUCKETS = 8


def _cmaint_catalog(spark: SparkSession, sf_dir: str) -> str:
    """A 4-table catalog in maintenance-relevant shapes: ``docs`` = the
    12-append interleaved documents layer (same fixture the single-layer
    advisor query plans), ``orders`` = 8 interleaved single-file appends
    keyed o_orderkey (ONE dull dimension -> a cluster row),
    ``orders_wide`` = the same appends carrying stats on BOTH
    o_orderkey AND o_custkey (TWO dull dimensions -> ONE zorder row,
    r10 verdict item 7), ``nation`` = one clean single-file commit that
    must contribute ZERO plan rows (the sweep reports need, it never
    invents work).  One catalog version pins all four.  Once per
    process."""
    from ..sources.snapshots import commit_snapshot, drop_snapshot_layer
    from ..sources.table_catalog import commit_catalog

    cat = f"{_SCRATCH}/snapshots/{_tag(sf_dir)}/cmaint_cat"
    if cat in _CMAINT_BUILT:
        return cat
    import shutil

    shutil.rmtree(cat, ignore_errors=True)
    docs_path = _maintenance_layer(spark, sf_dir)
    orders_path = f"{cat}/orders"
    wide_path = f"{cat}/orders_wide"
    nation_path = f"{cat}/nation"
    for p in (orders_path, wide_path, nation_path):
        drop_snapshot_layer(spark, p)
    orders = load_star_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    for i in range(_CMAINT_ORD_BUCKETS):
        part = orders.filter(
            F.col("o_orderkey") % _CMAINT_ORD_BUCKETS == i
        ).repartition(1)
        commit_snapshot(
            spark,
            part,
            orders_path,
            mode="overwrite" if i == 0 else "append",
            stats_cols=["o_orderkey"],
        )
        commit_snapshot(
            spark,
            part,
            wide_path,
            mode="overwrite" if i == 0 else "append",
            stats_cols=["o_custkey", "o_orderkey"],
        )
    commit_snapshot(
        spark,
        load_star_table(spark, sf_dir, "nation").repartition(1),
        nation_path,
        stats_cols=["n_nationkey"],
    )
    commit_catalog(
        spark,
        cat,
        {
            "docs": {"path": docs_path, "version": _MAINT_BUCKETS},
            "orders": {"path": orders_path, "version": _CMAINT_ORD_BUCKETS},
            "orders_wide": {
                "path": wide_path,
                "version": _CMAINT_ORD_BUCKETS,
            },
            "nation": {"path": nation_path, "version": 1},
        },
    )
    _CMAINT_BUILT.add(cat)
    return cat


def _cmaint_oracle_for(table: str, base: str, key: str, buckets: int) -> str:
    """One table's worth of the catalog-sweep oracle: the same manifest
    arithmetic as the single-layer advisor SQL, prefixed with the table
    name (UNION'd by the caller)."""
    return f"""
SELECT * FROM (
  WITH f AS (
    SELECT {key} % {buckets} AS b, COUNT(*) AS n,
           MIN({key}) AS lo, MAX({key}) AS hi
    FROM {base} GROUP BY 1
  ),
  small AS (
    SELECT COUNT(*) AS ns, SUM(n) AS sr FROM f
    WHERE n < {_MAINT_TARGET_ROWS // 2}
  ),
  compact AS (
    SELECT '{table}' AS table_name, 'compact_small_files' AS action,
           CAST(NULL AS VARCHAR) AS col,
           CAST(ns AS BIGINT) AS n_files, CAST(sr AS BIGINT) AS n_rows,
           GREATEST(CAST(CEIL(sr / {_MAINT_TARGET_ROWS}.0) AS BIGINT), 1)
             AS predicted_files,
           CAST(NULL AS BIGINT) AS overlap_files
    FROM small
    WHERE ns >= 2
      AND GREATEST(CAST(CEIL(sr / {_MAINT_TARGET_ROWS}.0) AS BIGINT), 1) < ns
  ),
  chain AS (
    SELECT lo, hi,
           MAX(hi) OVER (ORDER BY lo, hi
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS run_hi
    FROM f
  ),
  ov AS (
    SELECT COUNT(*) FILTER (run_hi IS NOT NULL AND lo <= run_hi) AS overlap,
           COUNT(*) AS nr
    FROM chain
  ),
  clus AS (
    SELECT '{table}' AS table_name, 'cluster' AS action, '{key}' AS col,
           CAST(nr AS BIGINT) AS n_files,
           CAST((SELECT SUM(n) FROM f) AS BIGINT) AS n_rows,
           CAST(nr AS BIGINT) AS predicted_files,
           CAST(overlap AS BIGINT) AS overlap_files
    FROM ov
    WHERE nr >= 2 AND overlap > 0.5 * nr
  )
  SELECT * FROM compact UNION ALL SELECT * FROM clus
)
"""


def _cmaint_zorder_oracle_for(
    table: str, base: str, key: str, col2: str, buckets: int
) -> str:
    """The two-dull-dimension table's worth of the catalog-sweep
    oracle: same compaction arithmetic, but the clustering signal
    replays the advisor's MULTI-COLUMN collapse — when both columns'
    per-file [min, max] chains overlap past 50%, ONE zorder row with
    the comma-joined sorted columns and the summed overlap counts."""
    cols_sorted = ",".join(sorted([key, col2]))
    return f"""
SELECT * FROM (
  WITH f AS (
    SELECT {key} % {buckets} AS b, COUNT(*) AS n,
           MIN({key}) AS lo1, MAX({key}) AS hi1,
           MIN({col2}) AS lo2, MAX({col2}) AS hi2
    FROM {base} GROUP BY 1
  ),
  small AS (
    SELECT COUNT(*) AS ns, SUM(n) AS sr FROM f
    WHERE n < {_MAINT_TARGET_ROWS // 2}
  ),
  compact AS (
    SELECT '{table}' AS table_name, 'compact_small_files' AS action,
           CAST(NULL AS VARCHAR) AS col,
           CAST(ns AS BIGINT) AS n_files, CAST(sr AS BIGINT) AS n_rows,
           GREATEST(CAST(CEIL(sr / {_MAINT_TARGET_ROWS}.0) AS BIGINT), 1)
             AS predicted_files,
           CAST(NULL AS BIGINT) AS overlap_files
    FROM small
    WHERE ns >= 2
      AND GREATEST(CAST(CEIL(sr / {_MAINT_TARGET_ROWS}.0) AS BIGINT), 1) < ns
  ),
  chain1 AS (
    SELECT lo1 AS lo, hi1 AS hi,
           MAX(hi1) OVER (ORDER BY lo1, hi1
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS run_hi
    FROM f
  ),
  ov1 AS (
    SELECT COUNT(*) FILTER (run_hi IS NOT NULL AND lo <= run_hi) AS o,
           COUNT(*) AS nr
    FROM chain1
  ),
  chain2 AS (
    SELECT lo2 AS lo, hi2 AS hi,
           MAX(hi2) OVER (ORDER BY lo2, hi2
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS run_hi
    FROM f
  ),
  ov2 AS (
    SELECT COUNT(*) FILTER (run_hi IS NOT NULL AND lo <= run_hi) AS o,
           COUNT(*) AS nr
    FROM chain2
  ),
  zord AS (
    SELECT '{table}' AS table_name, 'zorder' AS action,
           '{cols_sorted}' AS col,
           CAST(GREATEST(ov1.nr, ov2.nr) AS BIGINT) AS n_files,
           CAST((SELECT SUM(n) FROM f) AS BIGINT) AS n_rows,
           CAST(GREATEST(ov1.nr, ov2.nr) AS BIGINT) AS predicted_files,
           CAST(ov1.o + ov2.o AS BIGINT) AS overlap_files
    FROM ov1, ov2
    WHERE ov1.nr >= 2 AND ov1.o > 0.5 * ov1.nr
      AND ov2.nr >= 2 AND ov2.o > 0.5 * ov2.nr
  )
  SELECT * FROM compact UNION ALL SELECT * FROM zord
)
"""


@register(
    "catalog_maintenance_plan",
    _cmaint_oracle_for("docs", "documents", "doc_id", _MAINT_BUCKETS)
    + " UNION ALL "
    + _cmaint_oracle_for("orders", "orders", "o_orderkey", _CMAINT_ORD_BUCKETS)
    + " UNION ALL "
    + _cmaint_zorder_oracle_for(
        "orders_wide", "orders", "o_orderkey", "o_custkey", _CMAINT_ORD_BUCKETS
    )
    + "\nORDER BY table_name, action\n",
    "CATALOG-WIDE MAINTENANCE SWEEP (r9 verdict item 7): ONE call plans "
    "every table a catalog version pins — the per-layer metadata-only "
    "advisor runs over each pinned layer path with the table name "
    "prefixed, so a production scheduler iterates one DataFrame for "
    "the whole star instead of remembering per-table calls; exercised "
    "on a 4-table catalog (12-append interleaved documents layer, "
    "8-append interleaved orders layer -> one dull dimension, a "
    "two-stats-column orders_wide layer whose dimensions are BOTH "
    "overlap-dull -> ONE multi-column ZORDER recommendation instead of "
    "per-column cluster rows (r10 verdict item 7; acting on it via "
    "rewrite_snapshot(zorder_by) is pytest-pinned to clear both "
    "signals), and a CLEAN single-file nation layer that must "
    "contribute zero rows — the sweep reports need, never invents it); "
    "the oracle replays every dirty table's file/row/overlap "
    "arithmetic, including the zorder collapse, from the raw tables; "
    "the act-then-replan loop under vacuum_catalog's min_pinned floors "
    "is pytest-pinned in test_sources.py",
    tags=("layout", "maintenance", "snapshots", "catalog"),
)
def q_catalog_maintenance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.table_catalog import catalog_maintenance_plan

    cat = _cmaint_catalog(spark, sf_dir)
    return catalog_maintenance_plan(
        spark, cat, target_rows_per_file=_MAINT_TARGET_ROWS
    )
