"""Similarity search over embedding columns (LLM-data-pipeline surface).

Two tiers:
- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Query set is broadcast; candidates stream (one pass over the 100 TB
  side, no shuffle of the big table).  Dot products are sequential
  ``aggregate`` folds in double precision so they are bit-portable
  against SQL oracles.
- ``lsh_topk``: random-hyperplane (signed projection) LSH — the scale
  path.  Candidates bucket on sign-bit prefixes, exact cosine re-ranks
  inside buckets.  Hyperplanes are deterministic (hash-derived), so runs
  are reproducible without a random seed exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries`` must carry (query_id_col, vec_col).  Self-matches
    (query_id == candidate id) are excluded.  Output: query_id,
    neighbor_id, cosine_sim (rounded 6), deterministic tie-break on
    neighbor id.
    """
    q = queries.select(
        F.col(query_id_col),
        _as_double(vec_col).alias("__qv"),
    ).withColumn("__qn", _dot(F.col("__qv"), F.col("__qv")))
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("__cv"),
    ).withColumn("__cn", _dot(F.col("__cv"), F.col("__cv")))
    sim = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn(
            "__sim",
            _dot(F.col("__qv"), F.col("__cv"))
            / F.sqrt(F.col("__qn") * F.col("__cn")),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__sim").desc(), F.col("neighbor_id")
    )
    return (
        sim.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            query_id_col,
            "neighbor_id",
            F.round("__sim", 6).alias("cosine_sim"),
        )
    )


def _plane(table: int, p: int, dims: int) -> list[float]:
    """Deterministic pseudo-random ±1 hyperplane (sha256-derived, no RNG
    state): component d is the parity of sha256(table|p|d)."""
    import hashlib

    return [
        1.0 if hashlib.sha256(f"{table}|{p}|{d}".encode()).digest()[0] % 2 == 0 else -1.0
        for d in range(dims)
    ]


def hyperplane_signature(vec: Column, dims: int, n_planes: int = 16, table: int = 0) -> Column:
    """Deterministic random-hyperplane sign signature (int bucket key).

    The ``n_planes`` ±1 plane vectors are generated driver-side (tiny,
    deterministic) and embedded as literal arrays, so the per-row work is
    ``n_planes`` sequential-fold dot products — no per-element hash calls
    in the hot path.  Cosine-similar vectors collide with probability
    (1 - theta/pi)^n_planes; multiple ``table`` values give independent
    hash tables whose candidate sets union (the standard recall lever).
    """
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _plane(table, p, dims)])
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, r: x * r),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0))
    return sig


def cosine_neardup_pairs(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (i < j, sim >= t) via
    block-matrix self-join.

    The classic distributed exact all-pairs shape: vectors hash into
    ``n_blocks`` blocks, every block *pair* (upper triangle incl.
    diagonal) becomes one task, and each task is a single numpy matmul
    over the two blocks' matrices.  Work is O(n^2 d) but spread over
    B(B+1)/2 independent tasks of bounded memory — at 100 TB you size
    ``n_blocks`` so a block fits an executor (the shuffle moves each
    vector B times, far cheaper than an exploded pair join).  For corpora
    where even that is too much, ``minhash_lsh_pairs``/``lsh_topk`` are
    the sub-quadratic approximate tier.
    """
    from pyspark.sql import types as T

    e = embeddings.select(
        F.col(id_col).alias("__id"),
        _as_double(vec_col).alias("__v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("__blk"),
    )
    blocks = e.groupBy("__blk").agg(
        F.collect_list(F.struct("__id", "__v")).alias("__rows")
    )
    block_pairs = (
        blocks.select(F.col("__blk").alias("__ba"), F.col("__rows").alias("__ra"))
        .crossJoin(
            blocks.select(F.col("__blk").alias("__bb"), F.col("__rows").alias("__rb"))
        )
        .filter(F.col("__ba") <= F.col("__bb"))
        # one block pair per task: the matmul is the unit of work
        .repartition(F.col("__ba"), F.col("__bb"))
    )
    out_schema = T.StructType(
        [
            T.StructField("i", T.LongType()),
            T.StructField("j", T.LongType()),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def emit(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                ia = np.asarray([r["__id"] for r in row["__ra"]], dtype=np.int64)
                va = np.asarray([r["__v"] for r in row["__ra"]], dtype=np.float64)
                ib = np.asarray([r["__id"] for r in row["__rb"]], dtype=np.int64)
                vb = np.asarray([r["__v"] for r in row["__rb"]], dtype=np.float64)
                na = va / np.linalg.norm(va, axis=1, keepdims=True)
                nb = vb / np.linalg.norm(vb, axis=1, keepdims=True)
                sims = na @ nb.T
                ai, bj = np.nonzero(sims >= threshold)
                ii, jj = ia[ai], ib[bj]
                if row["__ba"] == row["__bb"]:
                    # same block: both orderings are present, keep i < j once
                    keep = ii < jj
                else:
                    # distinct blocks: each unordered pair appears once,
                    # just normalize the orientation
                    keep = ii != jj
                lo, hi = np.minimum(ii, jj)[keep], np.maximum(ii, jj)[keep]
                yield pd.DataFrame(
                    {"i": lo, "j": hi, "cosine_sim": sims[ai, bj][keep]}
                )

    return (
        block_pairs.mapInPandas(emit, out_schema)
        # diagonal block pairs emit each (i, j) once; cross-block pairs
        # appear exactly once since each unordered block pair is one row
        .select("i", "j", F.round("cosine_sim", 6).alias("cosine_sim"))
    )


def quantize_embeddings(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 quantization per vector — the 4x storage/bandwidth
    compression applied before embeddings are shipped or indexed at
    100 TB scale.

    scale = max|x| / 127; q_i = floor(x_i / scale + 0.5) (explicit
    half-up — engine-portable, unlike round()'s engine-specific
    half-even/half-away behavior).  Emits the quantized array plus the
    scalar profile (scale, sum/min/max of the codes) that downstream
    checks and SQL oracles consume.

    The scale is materialized as a column BEFORE the per-element lambda:
    feeding the max-abs expression into the HOF re-evaluates it per
    element (see operators/dedup.py::_shingled_hashed).

    An ALL-ZERO vector has max|x| = 0; its scale pins to 1.0 (codes all
    zero) instead of dividing by zero — under ANSI mode x/0.0 is
    Infinity and the long cast of floor(Inf) would FAIL THE JOB on the
    one degenerate row (padding vectors and dead embeddings are routine
    in real corpora).
    """
    v = F.col("__v")
    raw_scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    scaled = embeddings.select(
        F.col(id_col),
        _as_double(vec_col).alias("__v"),
    ).withColumn(
        "scale",
        F.when(raw_scale > 0, raw_scale).otherwise(F.lit(1.0)),
    )
    q = F.transform(v, lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("long"))
    return scaled.withColumn("q", q).select(
        F.col(id_col),
        F.round("scale", 6).alias("scale_r6"),
        F.aggregate("q", F.lit(0).cast("long"), lambda acc, x: acc + x).alias("q_sum"),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
        "q",
    )


def _nearest_centroids_udf(centroids: np.ndarray, n_probe: int) -> Column:
    """pandas UDF: vector -> array of the ``n_probe`` nearest centroid ids
    (squared-L2, deterministic ties by centroid index)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe(v: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        if len(mat) == 0:
            return pd.Series([], dtype=object)
        # ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2 ; ||v||^2 constant per row
        d = c_sq - 2.0 * (mat @ C.T)
        order = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.astype(np.int32) for row in order])

    return probe


def ivf_fit_centroids(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 2,
) -> np.ndarray:
    """Fit the IVF coarse quantizer: deterministic seeding (the
    ``n_centroids`` vectors with smallest ``md5(id)`` hex — md5 is
    engine-portable, so SQL oracles can replay the seed choice) +
    ``iters`` Lloyd steps.

    Assignment is a distributed pandas-UDF argmin; the centroid update is
    ``posexplode -> groupBy(cluster, dim) -> avg`` — both scale-out shapes.
    Only the k x d centroid matrix ever reaches the driver (model state,
    same contract as ``ml.clustering.KMeans``)."""
    e = embeddings.select(
        F.col(id_col).alias("__id"), _as_double(vec_col).alias("__v")
    ).cache()  # scanned once per Lloyd step + once for seeding
    try:
        seeds = (
            e.withColumn("__h", F.md5(F.col("__id").cast("string")))
            .orderBy("__h", "__id")
            .limit(n_centroids)
            .select("__v")
            .collect()
        )
        cents = np.asarray([r["__v"] for r in seeds], dtype=np.float64)
        for _ in range(iters):
            assign = _nearest_centroids_udf(cents, 1)
            means = (
                e.withColumn("__c", assign(F.col("__v"))[0])
                .select("__c", F.posexplode("__v").alias("__d", "__x"))
                .groupBy("__c", "__d")
                .agg(F.avg("__x").alias("__m"))
                .collect()
            )
            nxt = cents.copy()  # empty clusters keep their previous centroid
            for r in means:
                nxt[r["__c"], r["__d"]] = r["__m"]
            cents = nxt
        return cents
    finally:
        e.unpersist()


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    iters: int = 2,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate cosine top-k: coarse-quantize the corpus into
    ``n_centroids`` inverted lists, probe the ``n_probe`` nearest lists
    per query, exact-rerank inside the probed lists.

    The scan side shuffles once on the centroid id; at 100 TB the
    inverted lists are the partitioning, so a query touches
    ``n_probe / n_centroids`` of the corpus.  Output schema matches
    ``cosine_topk`` (exact cosine on the candidates, same rounding).

    ``centroids`` lets the caller reuse a previously fitted quantizer —
    the real IVF contract is build-once/query-many, so refitting per
    query would misstate the cost model."""
    cents = (
        centroids
        if centroids is not None
        else ivf_fit_centroids(
            embeddings,
            id_col=id_col,
            vec_col=vec_col,
            n_centroids=n_centroids,
            iters=iters,
        )
    )
    assign1 = _nearest_centroids_udf(cents, 1)
    cv = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__cv")
    ).withColumn("__cell", assign1(F.col("__cv"))[0])
    probe = _nearest_centroids_udf(cents, n_probe)
    qv = queries.select(
        F.col(query_id_col), _as_double(vec_col).alias("__qv")
    ).withColumn("__cell", F.explode(probe(F.col("__qv"))))
    paired = (
        cv.join(F.broadcast(qv), "__cell")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("__qn", _dot(F.col("__qv"), F.col("__qv")))
        .withColumn("__cn", _dot(F.col("__cv"), F.col("__cv")))
        .withColumn(
            "__sim",
            _dot(F.col("__qv"), F.col("__cv")) / F.sqrt(F.col("__qn") * F.col("__cn")),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__sim").desc(), F.col("neighbor_id")
    )
    return (
        paired.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(query_id_col, "neighbor_id", F.round("__sim", 6).alias("cosine_sim"))
    )


def hyperplane_signatures_vec(
    dims: int, n_planes: int, n_tables: int
) -> Column:
    """All-tables hyperplane signatures as one Arrow-batched pandas UDF.

    Returns array<long> of length ``n_tables`` (element t == the JVM
    ``hyperplane_signature(vec, dims, n_planes, t)`` — pytest asserts the
    two stay bit-identical).  One numpy matmul per batch replaces
    ``n_tables * n_planes`` interpreted higher-order-function folds, and
    keeps the Catalyst expression tree small (the literal-plane version
    adds ~2k expression nodes per table, which costs more in optimization
    time than execution at any scale).
    """
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [_plane(t, p, dims) for t in range(n_tables) for p in range(n_planes)]
    )  # (n_tables*n_planes, dims)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def sigs(v: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        if len(mat) == 0:
            return pd.Series([], dtype=object)
        bits = (mat @ planes.T) > 0  # (batch, n_tables*n_planes)
        per_table = bits.reshape(len(mat), n_tables, n_planes)
        packed = (per_table * weights).sum(axis=2).astype(np.int64)
        return pd.Series(list(packed))

    return sigs


def sq8_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    shortlist_factor: int = 4,
) -> DataFrame:
    """SQ8 approximate cosine top-k with exact rerank — the SCALAR-
    quantization compression tier (FAISS SQ8): the tier a production
    stack reaches for BEFORE product quantization, because it needs no
    codebook fit, no training set, and no rebuild gate.

    Corpus vectors quantize to int8 codes with the exact
    ``quantize_embeddings`` arithmetic (scale = max|x|/127, half-up,
    zero-vector scale pinned to 1).  The key identity: a PER-VECTOR
    SYMMETRIC scale cancels in cosine, so the approximate score is
    cosine(query, codes) directly — no dequantization pass, no scale
    column in the scan.  Per query, the top ``k * shortlist_factor``
    by approximate score (id tie-break) rerank by exact cosine on the
    ORIGINAL vectors.

    At 100 TB the approximate scan reads the byte-packed code arrays
    (~4-8x less IO/memory bandwidth than float64).  The rerank joins the
    O(queries x k x factor)-row shortlist against the full-precision
    embeddings as the BROADCAST side of a hash join, so the corpus is
    STREAMED once with no shuffle and only shortlist rows survive the
    probe; the scan itself still reads the vector column (id-level file
    pruning needs a persisted layer's Bloom point-probe path — see
    ``pruned_postings`` — not a bare DataFrame).  Output schema matches
    ``cosine_topk``."""
    from pyspark.sql import Window

    v = F.col("__v")
    raw_scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(
        127.0
    )
    codes = (
        embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            _as_double(vec_col).alias("__v"),
        )
        .withColumn(
            "__scale",
            F.when(raw_scale > 0, raw_scale).otherwise(F.lit(1.0)),
        )
        .select(
            "neighbor_id",
            F.transform(
                v,
                lambda x: F.floor(x / F.col("__scale") + F.lit(0.5))
                .cast("long")
                .cast("double"),
            ).alias("__cq"),
        )
        .withColumn("__cqq", _dot(F.col("__cq"), F.col("__cq")))
    )
    q = queries.select(
        F.col(query_id_col), _as_double(vec_col).alias("__qv")
    ).withColumn("__qq", _dot(F.col("__qv"), F.col("__qv")))
    approx = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn(
            "__a",
            # an all-zero code vector has no direction: score it below
            # any real cosine instead of tripping ANSI divide-by-zero
            F.when(
                F.col("__qq") * F.col("__cqq") > 0,
                _dot(F.col("__qv"), F.col("__cq"))
                / F.sqrt(F.col("__qq") * F.col("__cqq")),
            ).otherwise(F.lit(-2.0)),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__a").desc(), F.col("neighbor_id")
    )
    shortlist = (
        approx.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k * shortlist_factor)
        .select(query_id_col, "neighbor_id")
    )
    cv = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("__cv"),
    ).withColumn("__cn", _dot(F.col("__cv"), F.col("__cv")))
    # shortlist side BROADCAST: the corpus-side vector scan streams
    # through a broadcast hash join (no corpus shuffle, no corpus-wide
    # sort) and only the O(queries x k x factor) shortlist rows survive
    rer = (
        cv.join(
            F.broadcast(shortlist.join(F.broadcast(q), query_id_col)),
            "neighbor_id",
        )
        .withColumn(
            "__sim",
            F.when(
                F.col("__qq") * F.col("__cn") > 0,
                _dot(F.col("__qv"), F.col("__cv"))
                / F.sqrt(F.col("__qq") * F.col("__cn")),
            ).otherwise(F.lit(-2.0)),
        )
    )
    w2 = Window.partitionBy(query_id_col).orderBy(
        F.col("__sim").desc(), F.col("neighbor_id")
    )
    return (
        rer.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .select(
            query_id_col,
            "neighbor_id",
            F.round(F.col("__sim"), 6).alias("cosine_sim"),
        )
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dims: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    k: int = 10,
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate cosine top-k: candidates share a hyperplane-sign bucket
    with the query in any of ``n_tables`` independent tables; exact cosine
    re-ranks the unioned candidates.

    At 100 TB the bucket join replaces the full cross product; recall is
    tuned by ``n_planes`` (bucket width) and ``n_tables`` (independent
    chances to collide).  Output schema matches ``cosine_topk``.

    ``multiprobe=True`` additionally probes, per table, every signature
    at HAMMING DISTANCE 1 from the query's (each of the n_planes sign
    bits flipped once) — the multi-probe LSH idea (Lv et al., VLDB'07):
    a true neighbor that lands just across ONE separating hyperplane is
    recovered from the adjacent bucket, buying the recall of ~n_planes
    extra tables for zero extra index state; the candidate set grows
    ~(1 + n_planes)x per table, the QUERY side of the bucket join only.
    """
    sig_udf = hyperplane_signatures_vec(dims, n_planes, n_tables)

    def buckets(df: DataFrame, idc: str, vc: str) -> DataFrame:
        # ids + bucket keys only: vectors are re-attached after the
        # candidate set is deduped, so the distinct shuffles 16-byte id
        # pairs instead of 64-double arrays
        return df.select(idc, sig_udf(F.col(vc)).alias("__sigs")).select(
            idc, F.posexplode("__sigs").alias("__tbl", "__sig")
        )

    qv = queries.select(F.col(query_id_col), _as_double(vec_col).alias("__qv"))
    cv = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__cv")
    )
    qb = buckets(qv, query_id_col, "__qv")
    if multiprobe:
        # per (table, signature): the signature itself plus each
        # single-bit flip — pure JVM bit expressions, no extra UDF pass
        qb = qb.select(
            query_id_col,
            "__tbl",
            F.explode(
                F.expr(
                    "array_union(array(__sig), "
                    f"transform(sequence(0, {n_planes - 1}), "
                    "i -> __sig ^ shiftleft(CAST(1 AS BIGINT), i)))"
                )
            ).alias("__sig"),
        )
    cand = (
        buckets(cv, "neighbor_id", "__cv")
        .join(F.broadcast(qb), ["__tbl", "__sig"])
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .select("neighbor_id", query_id_col)
        .distinct()
    )
    paired = (
        cand.join(F.broadcast(qv), query_id_col)
        .join(cv, "neighbor_id")
        .withColumn("__qn", _dot(F.col("__qv"), F.col("__qv")))
        .withColumn("__cn", _dot(F.col("__cv"), F.col("__cv")))
        .withColumn(
            "__sim",
            _dot(F.col("__qv"), F.col("__cv"))
            / F.sqrt(F.col("__qn") * F.col("__cn")),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__sim").desc(), F.col("neighbor_id")
    )
    return (
        paired.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            query_id_col,
            "neighbor_id",
            F.round("__sim", 6).alias("cosine_sim"),
        )
    )


def semdedup_pairs(
    embeddings: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: assign every vector to its
    nearest coarse-quantizer cell, then exact cosine all-pairs WITHIN each
    cell only (i < j, sim >= t).

    This is the scale trick of SemDeDup (Abbas et al. 2023): clustering
    first turns the O(n^2) corpus problem into k independent
    O((n/k)^2) cell problems; pairs across cells are assumed dissimilar
    by construction.  Each cell is one matmul task here; a corpus-scale
    deployment composes this with the block-pair decomposition of
    ``cosine_neardup_pairs`` inside hot cells (same emit contract).
    """
    from pyspark.sql import types as T

    assign = _nearest_centroids_udf(centroids, 1)
    e = embeddings.select(
        F.col(id_col).alias("__id"),
        _as_double(vec_col).alias("__v"),
    ).withColumn("__cell", assign(F.col("__v"))[0])
    cells = e.groupBy("__cell").agg(
        F.collect_list(F.struct("__id", "__v")).alias("__rows")
    )
    out_schema = T.StructType(
        [
            T.StructField("cell", T.LongType()),
            T.StructField("i", T.LongType()),
            T.StructField("j", T.LongType()),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def emit(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                ids = np.asarray([r["__id"] for r in row["__rows"]], dtype=np.int64)
                vec = np.asarray([r["__v"] for r in row["__rows"]], dtype=np.float64)
                if len(ids) < 2:
                    continue
                norms = np.linalg.norm(vec, axis=1)
                sims = (vec @ vec.T) / np.outer(norms, norms)
                ai, bj = np.nonzero(sims >= threshold)
                keep = ids[ai] < ids[bj]
                yield pd.DataFrame(
                    {
                        "cell": np.full(keep.sum(), row["__cell"], dtype=np.int64),
                        "i": ids[ai][keep],
                        "j": ids[bj][keep],
                        "cosine_sim": sims[ai, bj][keep],
                    }
                )

    return cells.repartition("__cell").mapInPandas(emit, out_schema).select(
        "cell", "i", "j", F.round("cosine_sim", 6).alias("cosine_sim")
    )


def _pq_assign_codes_udf(books: list[np.ndarray]) -> Column:
    """pandas UDF: full vector -> array of ``m`` nearest-codeword ids,
    one per subspace (squared-L2 per subspace, stable ties by code
    index — same math as ``_nearest_centroids_udf`` applied to each
    slice, but ONE Arrow round-trip instead of m)."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    Bs = [np.asarray(b, dtype=np.float64) for b in books]
    sqs = [(B * B).sum(axis=1) for B in Bs]
    sub = Bs[0].shape[1]

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def codes(v: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        if len(mat) == 0:
            return pd.Series([], dtype=object)
        outs = []
        for s, B in enumerate(Bs):
            seg = mat[:, s * sub : (s + 1) * sub]
            d = sqs[s] - 2.0 * (seg @ B.T)
            outs.append(np.argsort(d, axis=1, kind="stable")[:, 0])
        packed = np.stack(outs, axis=1).astype(np.int32)
        return pd.Series(list(packed))

    return codes


def pq_fit_codebooks(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    m: int = 4,
    n_codes: int = 16,
    iters: int = 1,
) -> list[np.ndarray]:
    """Fit product-quantization codebooks: the vector is split into ``m``
    contiguous subspaces of ``dims // m`` dimensions and each subspace
    gets its own ``n_codes``-entry codebook, fitted with the SAME
    deterministic k-means semantics as the IVF coarse quantizer (md5-id
    seed order, ``iters`` Lloyd steps) on the sliced vectors — but all
    ``m`` subspaces fit in ONE pass per Lloyd step: a single seed
    collect (the seed ids are identical across subspaces), one
    assignment UDF emitting all m codes, and one posexplode->avg over
    (subspace, code, dim).  Driver state is ``m * n_codes * (dims/m)``
    floats — the whole index model is a few KB regardless of corpus
    size."""
    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m} subspaces")
    sub = dims // m
    e = embeddings.select(
        F.col(id_col).alias("__id"), _as_double(vec_col).alias("__v")
    )
    # cache only pays when the corpus is re-scanned per Lloyd step; the
    # single-step fit reads it twice (seeds + means) and a materialization
    # costs more than the second scan
    if iters > 1:
        e = e.cache()
    try:
        seed_rows = (
            e.withColumn("__h", F.md5(F.col("__id").cast("string")))
            .orderBy("__h", "__id")
            .limit(n_codes)
            .select("__v")
            .collect()
        )
        full = np.asarray([r["__v"] for r in seed_rows], dtype=np.float64)
        books = [full[:, s * sub : (s + 1) * sub].copy() for s in range(m)]
        for _ in range(iters):
            assign = _pq_assign_codes_udf(books)
            means = (
                e.withColumn("__codes", assign(F.col("__v")))
                .select("__codes", F.posexplode("__v").alias("__dim", "__x"))
                .withColumn("__s", (F.col("__dim") / sub).cast("int"))
                .withColumn("__d", F.col("__dim") % sub)
                .withColumn("__c", F.element_at("__codes", F.col("__s") + 1))
                .groupBy("__s", "__c", "__d")
                .agg(F.avg("__x").alias("__m"))
                .collect()
            )
            nxt = [b.copy() for b in books]  # empty codes keep their seed
            for r in means:
                nxt[r["__s"]][r["__c"], r["__d"]] = r["__m"]
            books = nxt
        return books
    finally:
        if iters > 1:
            e.unpersist()


#: observability counter: ADC distance-table rows built ON THE DRIVER
#: (collect + literal relation).  Request-scale serving pays this by
#: design; the BATCH kNN path (plans.vectors.ann_ivfadc_batch_topk)
#: must never — its pytest pins this counter flat across a batch run.
_ADC_DRIVER_MODEL_ROWS = {"n": 0}


def adc_distance_model(
    q: DataFrame,
    books: list[np.ndarray],
    *,
    query_id_col: str = "query_id",
) -> DataFrame:
    """Per-query ADC distance tables as ONE literal broadcast relation.

    Per subspace the table maps (query, code) -> ||c||^2 - 2 q_s.c
    (||q_s||^2 is constant per query, so it cannot change the ranking).
    Evaluated ONCE as sequential expression folds (bit-portable against
    SQL oracles) and re-created as a literal relation: n_queries * m *
    n_codes values — query-prep model state, like the fitted codebooks.
    Joining the live lineage instead would re-execute the query-side
    plan once per subspace join.

    The relation is keyed on ``__code_0`` (the candidate x query fan-out
    key): each row holds t0 for that (query, code0) pair plus the full
    subspace-1..m-1 tables as a nested array, so the remaining m-1
    lookups are expression-side element_at's instead of m-1 further
    joins — same doubles, same fixed left-assoc add order (bit-portable
    vs the SQL oracle), but 1 join stage where the sequential form paid
    m.  ``q`` must carry (query_id_col, __qv array<double>).  Shared by
    ``pq_topk`` (global ADC scan) and the IVFADC assignment-layer
    search (``plans.vectors.ann_ivfadc_topk``) so both score
    bit-identically."""
    spark = q.sparkSession
    m = len(books)
    sub = int(np.asarray(books[0]).shape[1])
    cb_all = spark.createDataFrame(
        [
            (s, int(c), [float(x) for x in books[s][c]])
            for s in range(m)
            for c in range(len(books[s]))
        ],
        "__s int, __code int, __cbv array<double>",
    )
    dt_rows = (
        q.crossJoin(F.broadcast(cb_all))
        .select(
            query_id_col,
            "__s",
            "__code",
            (
                _dot(F.col("__cbv"), F.col("__cbv"))
                - 2
                * _dot(
                    F.slice(
                        F.col("__qv"), F.col("__s") * sub + 1, F.lit(sub)
                    ),
                    F.col("__cbv"),
                )
            ).alias("__t"),
        )
        .collect()
    )
    by_q: dict = {}
    for r in dt_rows:
        by_q.setdefault(r[query_id_col], {})[(r["__s"], r["__code"])] = r["__t"]
    rows0 = []
    for qid, t in by_q.items():
        rest = [[t[(s, c)] for c in range(len(books[s]))] for s in range(1, m)]
        for c in range(len(books[0])):
            rows0.append((qid, c, t[(0, c)], rest))
    _ADC_DRIVER_MODEL_ROWS["n"] += len(rows0)
    return spark.createDataFrame(
        rows0,
        f"{query_id_col} long, __code_0 int, __t0 double, "
        "__rest array<array<double>>",
    )


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    dims: int = 64,
    m: int = 4,
    n_codes: int = 16,
    n_candidates: int = 40,
    iters: int = 1,
    codebooks: list[np.ndarray] | None = None,
) -> DataFrame:
    """Product-quantization approximate cosine top-k (ADC search).

    The corpus is ENCODED once: per subspace, each vector stores only its
    nearest codeword id — ``m`` small ints instead of ``dims`` floats
    (64 doubles -> 4 bytes here; at 100 TB the scan side becomes code
    lookups over a ~100x smaller table, the bandwidth win PQ exists
    for).  A query builds one tiny distance table per subspace
    (``n_codes`` entries, computed as bit-portable expression folds) and
    every candidate's approximate distance is the FIXED-ORDER sum of its
    ``m`` table entries — asymmetric distance computation.  The top
    ``n_candidates`` by (adc, id) are exact-cosine reranked to ``k``,
    same output contract as ``cosine_topk``.

    Candidates sharing all ``m`` codes tie EXACTLY on adc in any engine
    (same doubles, same add order), so the id tie-break keeps the
    candidate set deterministic and SQL-replayable.
    """
    from pyspark.sql import Window

    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m} subspaces")
    sub = dims // m
    books = (
        codebooks
        if codebooks is not None
        else pq_fit_codebooks(
            embeddings,
            id_col=id_col,
            vec_col=vec_col,
            dims=dims,
            m=m,
            n_codes=n_codes,
            iters=iters,
        )
    )

    # encode: all m codes from ONE Arrow round-trip (one corpus pass)
    assign = _pq_assign_codes_udf(books)
    codes = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        assign(_as_double(vec_col)).alias("__codes"),
    ).select(
        "neighbor_id",
        *[
            F.element_at("__codes", s + 1).alias(f"__code_{s}")
            for s in range(m)
        ],
    )

    q = queries.select(F.col(query_id_col), _as_double(vec_col).alias("__qv"))
    dt0 = adc_distance_model(q, books, query_id_col=query_id_col)
    cand = codes.join(F.broadcast(dt0), "__code_0")

    adc = F.col("__t0")
    for s in range(1, m):  # fixed left-assoc order: portable
        adc = adc + F.element_at(
            F.element_at("__rest", s), F.col(f"__code_{s}") + 1
        )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("__adc").asc(), F.col("neighbor_id")
    )
    short = (
        cand.withColumn("__adc", adc)
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_candidates)
        .select(query_id_col, "neighbor_id")
    )

    # exact cosine rerank of the shortlist (same contract as cosine_topk).
    # Query vectors come from the QUERIES side — the small, broadcastable
    # relation, and the only correct source when query ids are not corpus
    # ids (external search queries); sourcing them from the corpus would
    # both broadcast the full embeddings table and silently drop or
    # mis-score external queries.
    qe = q.select(F.col(query_id_col), F.col("__qv").alias("__qfull"))
    ce = embeddings.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("__cfull")
    )
    ranked = (
        short.join(F.broadcast(qe), query_id_col)
        .join(ce, "neighbor_id")
        .withColumn(
            "__sim",
            _dot(F.col("__qfull"), F.col("__cfull"))
            / F.sqrt(
                _dot(F.col("__qfull"), F.col("__qfull"))
                * _dot(F.col("__cfull"), F.col("__cfull"))
            ),
        )
    )
    w2 = Window.partitionBy(query_id_col).orderBy(
        F.col("__sim").desc(), F.col("neighbor_id")
    )
    return (
        ranked.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .select(
            query_id_col, "neighbor_id", F.round("__sim", 6).alias("cosine_sim")
        )
    )
