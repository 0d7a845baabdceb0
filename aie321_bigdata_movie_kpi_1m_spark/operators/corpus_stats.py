"""Corpus-distribution statistics operators: drift divergence between two
corpus slices and token co-occurrence association (PMI).

Both are two-pass corpus statistics: a global token aggregate (the small,
broadcastable side regardless of corpus size) joined or folded against the
corpus.  The catalog queries in ``plans/corpus_stats.py`` bind them to the
``documents`` table; these functions take any DataFrame so tests can fuzz
them against independent reference implementations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens as _tokens


def kl_drift_summary(
    docs: DataFrame,
    is_slice_a: Column,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Unigram-distribution drift between two corpus slices.

    Slice A is the rows where ``is_slice_a`` is true, slice B the rows
    where it is false; NULL predicate rows join NEITHER distribution
    (SQL CASE-WHEN semantics on both the plan and oracle sides).  Token
    distributions get add-one smoothing over the JOINT vocabulary, so
    both are strictly positive on the same support and KL is finite even
    for tokens one slice never saw.  Returns one row: vocab_size,
    tokens_a, tokens_b, kl_ab, kl_ba, js_divergence (all divergences in
    nats, rounded to 4).

    Shape: one map-side-combinable token groupBy (the corpus pass), a
    1-row totals aggregate broadcast back, and a scalar fold over the
    vocabulary — the token agg is computed ONCE and reused by both
    consumers (pinned by plan test).
    """
    ex = docs.select(
        is_slice_a.alias("__a"), F.explode(_tokens(text_col)).alias("token")
    )
    cnt = ex.groupBy("token").agg(
        F.sum(F.when(F.col("__a"), 1).otherwise(0)).alias("c_a"),
        F.sum(F.when(~F.col("__a"), 1).otherwise(0)).alias("c_b"),
    )
    tot = cnt.agg(
        F.sum("c_a").alias("t_a"),
        F.sum("c_b").alias("t_b"),
        F.count(F.lit(1)).alias("v"),
    )
    p = (F.col("c_a") + 1) / (F.col("t_a") + F.col("v")).cast("double")
    q = (F.col("c_b") + 1) / (F.col("t_b") + F.col("v")).cast("double")
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            F.col("t_a"),
            F.col("t_b"),
            F.col("v"),
            (p * F.log(p / q)).alias("__kl_ab"),
            (q * F.log(q / p)).alias("__kl_ba"),
            (
                0.5 * p * F.log(2 * p / (p + q))
                + 0.5 * q * F.log(2 * q / (p + q))
            ).alias("__js"),
        )
        .groupBy()
        .agg(
            F.min("v").alias("vocab_size"),
            F.min("t_a").alias("tokens_a"),
            F.min("t_b").alias("tokens_b"),
            F.round(F.sum("__kl_ab"), 4).alias("kl_ab"),
            F.round(F.sum("__kl_ba"), 4).alias("kl_ba"),
            F.round(F.sum("__js"), 4).alias("js_divergence"),
        )
    )


def pmi_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 50,
    max_df: int = 450,
    min_both: int = 20,
) -> DataFrame:
    """Document-level pointwise mutual information for token pairs.

    PMI = ln( P(t1,t2) / (P(t1) P(t2)) ) with probabilities estimated as
    document frequencies over n_docs.  The document-frequency band
    [min_df, max_df] is the scale knob: it drops both the singleton tail
    and stopword-grade hot keys BEFORE the per-document pair expansion,
    so the self-join fans out only over mid-frequency tokens.  Pair
    membership thresholds are exact integers (band bounds, min_both), so
    the output SET is engine-portable; only the pmi value itself is a
    rounded double.
    """
    ex = docs.select(
        F.col(id_col).alias("__doc"),
        F.explode(F.array_distinct(_tokens(text_col))).alias("token"),
    )
    dfs = ex.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    band = dfs.filter(F.col("df").between(min_df, max_df))
    bex = ex.join(F.broadcast(band), "token").select("__doc", "token", "df")
    n_docs = ex.agg(F.countDistinct("__doc").alias("n"))
    a = bex.select(
        "__doc", F.col("token").alias("t1"), F.col("df").alias("df1")
    )
    b = bex.select(
        "__doc", F.col("token").alias("t2"), F.col("df").alias("df2")
    )
    pairs = (
        a.join(b, "__doc")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(
            F.count(F.lit(1)).alias("n_both"),
            F.min("df1").alias("df1"),
            F.min("df2").alias("df2"),
        )
        .filter(F.col("n_both") >= min_both)
    )
    return pairs.crossJoin(F.broadcast(n_docs)).select(
        "t1",
        "t2",
        "n_both",
        F.round(
            F.log(
                F.col("n_both")
                * F.col("n").cast("double")
                / (F.col("df1") * F.col("df2"))
            ),
            4,
        ).alias("pmi"),
    )


def grouped_kl_vs_reference(
    obs: DataFrame,
    ref: DataFrame,
    *,
    group_col: str,
    cat_col: str,
    obs_count: str = "c",
    ref_count: str = "cr",
) -> DataFrame:
    """Per-group KL divergence of an observed categorical distribution
    against a reference distribution (drift alerting: "does this window's
    event mix diverge from the historical baseline?").

    ``obs`` holds (group, category, count) — sparse: absent categories
    are implicit zeros; (group, category) must be unique (the natural
    output of a count aggregation — duplicates fail loudly in the map
    build under Spark's default map-key dedup policy rather than
    silently summing).  ``ref`` holds (category, count) over the FULL
    category domain and is the broadcast side (the domain is tiny
    regardless of data size).  Each group is collapsed to a count map in
    ONE pass (no self-join — ``obs`` may be a memory-sink table, which
    cannot self-join), densified onto the domain by broadcast cross
    join + map lookup, add-one smoothed, and folded to one KL value in
    nats.  One shuffle on the group key; the window sum and final fold
    reuse its partitioning.  Returns (group_col, n_events, kl_vs_ref)
    with kl rounded to 4.

    Categories observed in a group but absent from ``ref`` are DROPPED
    (their reference probability would be the smoothing floor and the
    group's divergence unbounded); monitor the reference domain itself
    separately if brand-new categories must alert.
    """
    from pyspark.sql import Window

    tot = ref.agg(
        F.sum(ref_count).alias("__n"), F.count(F.lit(1)).alias("__v")
    )
    per_g = obs.groupBy(group_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col(cat_col), F.col(obs_count)))
        ).alias("__m")
    )
    dense = per_g.crossJoin(F.broadcast(ref)).withColumn(
        "__c", F.coalesce(F.element_at("__m", F.col(cat_col)), F.lit(0))
    )
    dense = dense.withColumn(
        "__n_w", F.sum("__c").over(Window.partitionBy(group_col))
    )
    p = (F.col("__c") + 1) / (F.col("__n_w") + F.col("__v")).cast("double")
    q = (F.col(ref_count) + 1) / (F.col("__n") + F.col("__v")).cast("double")
    return (
        dense.crossJoin(F.broadcast(tot))
        .groupBy(group_col)
        .agg(
            F.min("__n_w").alias("n_events"),
            F.round(F.sum(p * F.log(p / q)), 4).alias("kl_vs_ref"),
        )
    )
