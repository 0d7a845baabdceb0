"""Deduplication operators (LLM-data-pipeline surface): exact,
n-gram-Jaccard, MinHash+LSH, SimHash.

Scale design notes
------------------
- Exact dedup is a hash groupBy on a fingerprint — one shuffle, the
  canonical 100 TB shape.
- Exact Jaccard self-joins block on shared shingles; a frequent-shingle
  cap (``max_df``) keeps hot keys from exploding the join at scale.
- MinHash+LSH is the sub-quadratic path: signatures are 32 column-wise
  ``min(xxhash64(seed, shingle))`` aggregates, banded (b=16, r=2) into
  bucket keys, candidates joined on bucket, then exact-verified on the
  candidate pairs only.  Every stage is a groupBy/join on bounded keys —
  no driver state, no UDFs.
- SimHash gives a 60-bit locality-sensitive fingerprint (first 15 md5
  hex chars per token, staying in a signed long) assembled from per-bit
  weighted sums.

Minimum-length contract
-----------------------
The shingle-based tiers (Jaccard, MinHash) operate on ``n``-token
shingles with a SENTINEL for short input: a document with fewer than
``n`` tokens contributes one whole-text shingle (empty docs share the
``''`` sentinel — see ``functions.text.word_shingles``), so short
exact-duplicates still surface in every shingle tier instead of silently
vanishing.  A sentinel only ever matches an *identical* short doc (real
shingles always have ``n`` tokens), so it adds no false positives.
SimHash is the exception: it votes per TOKEN, so zero-token docs produce
no fingerprint row (no evidence to vote with) — those are the exact
tier's job (``dedup_exact`` fingerprints every document, including empty
ones).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_fingerprint, tokens, word_shingles
from .materialize import materialize


def dedup_exact(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: one surviving row
    per distinct content, keeping the smallest id (deterministic)."""
    return (
        docs.select(F.col(id_col), md5_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingle_sets(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(__id, __set) — each document's distinct word-n-gram shingle
    array, the relation BOTH MinHash tiers are defined over: the
    signature path hashes these exact strings (``_shingled_hashed``)
    and the exact-verify path intersects them, so a caller that needs
    both can compute the tokenize+shingle pass ONCE and feed the two
    consumers bit-identical inputs.

    Tokens MUST be materialized as a real column before shingling:
    word_shingles indexes the token array with element_at inside a
    lambda, and feeding it the raw split/filter *expression* makes the
    tokenizer re-run per element access (quadratic in doc length,
    measured 13x slower at sf0.1)."""
    return docs.select(
        F.col(id_col).alias("__id"), tokens(text_col).alias("__tok")
    ).select("__id", word_shingles(F.col("__tok"), n).alias("__set"))


def _hashed_from_sets(sets: DataFrame) -> DataFrame:
    """(__id, __shingle) — shingles as xxhash64 longs: 8-byte shuffle
    keys instead of strings.  A hash collision (p ~ |shingles|^2 / 2^64)
    would merge two shingles; at any realistic corpus size this is far
    below the FP noise floor."""
    return sets.select(
        "__id",
        F.explode(
            F.transform(F.col("__set"), lambda s: F.xxhash64(s))
        ).alias("__shingle"),
    )


def _shingled_hashed(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return _hashed_from_sets(
        shingle_sets(docs, id_col=id_col, text_col=text_col, n=n)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs (i < j, jaccard >= t).

    Blocking self-join on shared shingles, |A ∩ B| by counting shared
    shingles, |A ∪ B| = |A| + |B| - |A ∩ B|.  ``max_df`` (document
    frequency cap) drops ultra-common shingles before the join — the
    skew-control lever at scale (changes semantics only for pairs whose
    *entire* overlap is stop-shingles).
    """
    # set size rides along with every exploded shingle row (one extra int
    # per row), so |A|/|B| arrive through the join itself — no separate
    # sizes aggregation and no re-joins afterwards
    sh = (
        docs.select(F.col(id_col).alias("__id"), tokens(text_col).alias("__tok"))
        .select("__id", word_shingles(F.col("__tok"), n).alias("__sh"))
        .select(
            "__id",
            F.size("__sh").alias("__n"),
            F.explode(
                F.transform("__sh", lambda s: F.xxhash64(s))
            ).alias("__shingle"),
        )
    )
    if max_df is not None:
        rare = (
            sh.groupBy("__shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("__shingle")
        )
        # NOTE: after a max_df cut the ride-along __n still counts ALL
        # shingles (true set size), which is the correct jaccard
        # denominator — dropped stop-shingles only shrink the overlap
        sh = sh.join(rare, "__shingle")
    # alias self-join: both join inputs canonicalize to the same subplan,
    # so in the shuffle-join regime (the 100 TB shape) Spark plans the
    # tokenize/shingle/explode/shuffle pipeline ONCE and the second side
    # is a ReusedExchange — pinned by plan test so no refactor (e.g. a
    # nondeterministic column) silently doubles the heaviest stage.  At
    # broadcast sizes there is no shuffle to reuse and the pipeline
    # legitimately runs twice — that regime is cheap by definition.
    sa, sb = sh.alias("A"), sh.alias("B")
    return (
        sa.join(sb, "__shingle")
        .filter(F.col("A.__id") < F.col("B.__id"))
        .groupBy(
            F.col("A.__id").alias("i"),
            F.col("B.__id").alias("j"),
            F.col("A.__n").alias("n_i"),
            F.col("B.__n").alias("n_j"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_i") + F.col("n_j") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("i", "j", "n_common", F.round("jaccard", 4).alias("jaccard"))
    )


def minhash_signatures(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    n: int = 3,
) -> DataFrame:
    """MinHash signatures: column ``h0..h{k-1}`` of
    ``min(xxhash64(seed_i, shingle))`` per document.  Deterministic (seeded
    by column position), one explode + one groupBy; hashes are computed
    over pre-hashed 8-byte shingle keys, not strings."""
    sh = _shingled_hashed(docs, id_col, text_col, n)
    return _signatures_from_hashed(sh, num_hashes=num_hashes, id_col=id_col)


def _signatures_from_hashed(
    sh: DataFrame, *, num_hashes: int, id_col: str
) -> DataFrame:
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("__shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("__id").agg(*aggs).withColumnRenamed("__id", id_col)


def minhash_signatures_from_sets(
    sets: DataFrame, *, num_hashes: int = 32, id_col: str = "doc_id"
) -> DataFrame:
    """``minhash_signatures`` over a precomputed ``shingle_sets``
    relation — bit-identical values (same xxhash64-of-the-same-strings
    expressions), for callers that ALSO consume the shingle arrays and
    want the tokenize+shingle pass paid once."""
    return _signatures_from_hashed(
        _hashed_from_sets(sets), num_hashes=num_hashes, id_col=id_col
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.8,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-verified.

    Pipeline: signatures -> band bucket keys (rows r = k/b per band) ->
    candidate pairs sharing any bucket -> exact n-gram-Jaccard verification
    at ``threshold``.  With b=16, r=2 the probability of missing a pair at
    jaccard 0.8 is (1 - 0.8^2)^16 ≈ 9e-8, so the verified output equals
    the exact-Jaccard answer — which is what the oracle checks.

    ``max_bucket`` optionally drops pathologically HOT buckets before
    the candidate self-join — the same documented recall trade as
    ``simhash_neardup_pairs(max_bucket=...)`` and the Jaccard blocker's
    ``max_df``: a boilerplate bucket of B docs otherwise yields B²
    candidate pairs, and on template-heavy corpora that quadratic term
    IS the cost.  Pairs whose EVERY shared bucket is hot are lost
    (recall trade, recorded here); near-dup pairs that also share any
    normal bucket still surface.  Default None = exact banding
    semantics, unchanged.
    """
    if num_hashes % bands:
        raise ValueError(
            f"num_hashes={num_hashes} not divisible by bands={bands}: the "
            "trailing hashes would be computed but never banded, silently "
            "changing the documented miss-probability"
        )
    rows = num_hashes // bands
    # the 2k-aggregate signature relation feeds both sides of the bucket
    # self-join (and the optional hot-bucket gate): materialize once —
    # O(corpus) rows of k+1 longs, shuffle-sized — instead of re-running
    # tokenize/shingle/k-hashes per plan consumer
    sig = minhash_signatures(
        docs, id_col=id_col, text_col=text_col, num_hashes=num_hashes, n=n
    ).transform(materialize)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.xxhash64(*[F.col(f"h{bi * rows + r}") for r in range(rows)]).alias(
                "bucket"
            ),
        )
        for bi in range(bands)
    ]
    buckets = sig.select(
        F.col(id_col).alias("__id"), F.explode(F.array(*band_cols)).alias("bk")
    ).select("__id", "bk.band", "bk.bucket")
    if max_bucket is not None:
        ok = (
            buckets.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket)
            .select("band", "bucket")
        )
        buckets = buckets.join(ok, ["band", "bucket"])
    cand = (
        buckets.alias("a")
        .join(buckets.alias("b"), ["band", "bucket"])
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("i"), F.col("b.__id").alias("j"))
        .distinct()
        # consumed three times below (final pair join + two semi-join
        # prunes); materialize so the banded self-join runs once
        .transform(materialize)
    )
    # Exact verification touches CANDIDATE pairs only (never the global
    # self-join): the docs side is LEFT-SEMI-joined to the DISTINCT
    # candidate ids BEFORE its shingles are computed — candidates-only
    # shingling is a plan property (the neardup_index._verified_pairs
    # discipline), so at 100 TB the re-shingling cost is candidate-scale,
    # not corpus-scale.  ONE distinct-id set (i and j exploded together)
    # feeds ONE semi-join, and the pruned+shingled relation is
    # materialized once for both sides of the pair join; r15 derived a
    # distinct-id set and ran the semi-join + shingling PER SIDE, which
    # doubled the prune's exchanges and re-shingled twice — measured as
    # the round's one touched-path regression (2.62 -> 3.13 s @32c).
    cand_ids = cand.select(F.explode(F.array("i", "j")).alias("__id")).distinct()
    sets = docs.select(
        F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__tok")
    ).select("__id", word_shingles(F.col("__tok"), n).alias("__set"))
    pruned = sets.join(cand_ids, "__id", "left_semi").transform(materialize)
    verified = (
        cand.join(
            pruned.select(F.col("__id").alias("i"), F.col("__set").alias("__si")), "i"
        )
        .join(
            pruned.select(F.col("__id").alias("j"), F.col("__set").alias("__sj")), "j"
        )
        .withColumn("n_common", F.size(F.array_intersect("__si", "__sj")).cast("long"))
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.size("__si") + F.size("__sj") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("i", "j", "n_common", F.round("jaccard", 4).alias("jaccard"))


def simhash_fingerprints(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
) -> DataFrame:
    """SimHash fingerprint per document (60 bits in a signed long).

    Per bit b: sum over tokens of +1/-1 by token-hash bit b; the sign
    becomes fingerprint bit b.  Near-duplicates land at small Hamming
    distance; exact-equal simhash is a cheap groupBy dedup key.

    The token hash is the first 15 hex chars of md5 parsed as a 60-bit
    int — md5 is bit-identical across engines, so the fingerprint is
    fully SQL-oracle-able (unlike xxhash64, which only Spark computes).
    Docs with zero tokens produce no row (no token evidence to vote).
    """
    tok = docs.select(
        F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("__t")
    ).withColumn(
        "__h", F.conv(F.substring(F.md5(F.col("__t")), 1, 15), 16, 10).cast("long")
    )
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    per_bit = tok.groupBy("__id").agg(*bit_aggs)
    sig = None
    for b in range(bits):
        contrib = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (1 << b)).otherwise(
            F.lit(0).cast("long")
        )
        sig = contrib if sig is None else sig + contrib
    return per_bit.select(F.col("__id").alias(id_col), sig.alias("simhash"))


def simhash_neardup_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Hamming-ball near-duplicate pairs over SimHash fingerprints via
    PIGEONHOLE BANDING — the pair-search half of the SimHash story
    (``simhash_fingerprints`` is the signature half).

    The fingerprint splits into ``bands`` disjoint bit bands; any two
    fingerprints within Hamming distance ``<= bands - 1`` must agree
    EXACTLY on at least one band (pigeonhole), so the candidate set is a
    per-band equi-self-join on (band_id, band_value) — never an
    all-pairs scan — followed by an exact popcount verify.  This is the
    Google-crawl simhash dedup shape (Manku et al., WWW'07): at 100 TB
    each band join shuffles on a 15-bit-bounded key plus band id, and
    candidates are bounded by bucket co-membership, not corpus size².

    ``max_hamming`` must be < ``bands`` or the blocking would lose
    recall (raises).  Singleton buckets are dropped before the join
    (pure optimization); ``max_bucket`` optionally also drops
    pathologically hot buckets (boilerplate-heavy corpora), a documented
    recall trade like the Jaccard blocker's ``max_df``.

    Emits (i, j, hamming) with i < j, exact distances, one row per pair
    regardless of how many bands matched.
    """
    if bits % bands:
        raise ValueError(f"bits={bits} not divisible by bands={bands}")
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs > {max_hamming} bands for "
            f"lossless pigeonhole blocking, got bands={bands}"
        )
    from pyspark.sql import Window

    width = bits // bands
    mask = (1 << width) - 1
    # the 60-aggregate fingerprint relation feeds BOTH sides of the
    # band self-join: materialize it once (executor-local blocks,
    # O(corpus) rows of two longs — shuffle-sized) instead of
    # re-running the token explode + per-bit aggregation per consumer
    sig = simhash_fingerprints(
        docs, id_col=id_col, text_col=text_col, bits=bits
    ).transform(materialize)
    banded = sig.select(
        F.col(id_col).alias("__id"),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * width)
                    .bitwiseAND(F.lit(mask))
                    .cast("long")
                    for b in range(bands)
                ]
            )
        ).alias("__band", "__bv"),
    )
    # singleton/hot-bucket gate as ONE count-over-window on the same
    # (band, bv) partitioning the self-join shuffles on — the separate
    # sizes aggregation + semi-join paid a second exchange of the
    # banded rows for the same filter (r15: one exchange removed)
    bucket_n = F.count(F.lit(1)).over(Window.partitionBy("__band", "__bv"))
    size_gate = (
        bucket_n >= 2
        if max_bucket is None
        else (bucket_n >= 2) & (bucket_n <= max_bucket)
    )
    banded = (
        banded.withColumn("__keep", size_gate)
        .filter(F.col("__keep"))
        .drop("__keep")
    )
    left = banded.select(
        "__band",
        "__bv",
        F.col("__id").alias("i"),
        F.col("simhash").alias("__si"),
    )
    right = banded.select(
        "__band",
        "__bv",
        F.col("__id").alias("j"),
        F.col("simhash").alias("__sj"),
    )
    pairs = (
        left.join(right, ["__band", "__bv"])
        .filter(F.col("i") < F.col("j"))
        .select("i", "j", "__si", "__sj")
        .distinct()  # one row per pair even when several bands match
    )
    return (
        pairs.withColumn(
            "hamming",
            F.bit_count(F.expr("__si ^ __sj")).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("i", "j", "hamming")
    )
