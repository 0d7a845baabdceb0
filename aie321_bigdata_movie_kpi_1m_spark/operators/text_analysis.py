"""Text analysis operators over a documents table (LLM-data-pipeline
surface, BASELINE.json north star): token stats, language ID, quality
scoring, fingerprinting.

Every operator is a single codegen'd projection (plus at most one
aggregation) — the shapes that stream through 100 TB of text at scan
speed.  Ratios divide exact integer counts so results are engine-portable
without tolerance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_fingerprint, tokens

#: (language, marker-bigrams) for the n-gram heuristic language ID.
#: Scores are substring occurrence mass (length deltas), argmax with a
#: fixed priority order — deterministic and SQL-portable, the point of a
#: heuristic LID stage (a real model slots in behind the same signature).
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["th", "he"]),
    ("de", ["er", "ch"]),
    ("es", ["os", "la"]),
    ("fr", ["le", "re"]),
]

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def _occurrence_mass(text: Column, marker: str) -> Column:
    """len(text) - len(replace(text, marker)) == occurrences * len(marker);
    monotone in occurrence count, exact integer math."""
    return F.length(text) - F.length(F.replace(text, F.lit(marker), F.lit("")))


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token statistics: count, distinct count, mean token
    length (exact int/int division)."""
    toks = F.col("__tok")
    return docs.select(F.col(id_col), tokens(text_col).alias("__tok")).select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
            )
            / F.greatest(F.size(toks), F.lit(1)),
            4,
        ).alias("avg_token_len"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic n-gram language ID: marker-bigram occurrence mass per
    language, argmax with fixed priority (first language wins ties)."""
    text = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    scores = {
        lang: sum(
            (_occurrence_mass(text, m) for m in markers), F.lit(0)
        ).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS
    }
    scored = docs.select(F.col(id_col), *scores.values())
    langs = [lang for lang, _ in LANG_MARKERS]
    pred = None
    for lang in langs:
        cond = F.lit(True)
        for other in langs:
            if other != lang:
                # priority order: earlier language wins ties
                op = (
                    F.col(f"score_{lang}") >= F.col(f"score_{other}")
                    if langs.index(other) > langs.index(lang)
                    else F.col(f"score_{lang}") > F.col(f"score_{other}")
                )
                cond = cond & op
        pred = (pred.when(cond, lang) if pred is not None else F.when(cond, lang))
    return scored.select(
        id_col,
        *[f"score_{lang}" for lang in langs],
        pred.otherwise(langs[0]).alias("predicted_lang"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic document quality: length, punctuation density, stopword
    ratio, mean word length — combined into one bounded score.

    The combination is a deterministic linear blend of exact ratios (the
    standard C4/Gopher-style rule family); swap the weights freely, the
    plumbing is the contract.
    """
    docs = docs.select("*", tokens(text_col).alias("__tok"))
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.col("__tok")
    n_chars = F.length(text)
    n_punct = F.length(F.regexp_replace(text, r"[^.!?,;:]", ""))
    n_tokens = F.greatest(F.size(toks), F.lit(1))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS)))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / n_tokens
    mean_word_len = n_chars / n_tokens
    score = (
        F.lit(1.0)
        - F.least(punct_ratio * 2, F.lit(0.5))
        + F.least(stop_ratio, F.lit(0.3))
        - F.when(mean_word_len > 12, 0.3).otherwise(0.0)
    )
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars_actual"),
        F.size(toks).alias("n_tokens"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_dup_ratio: float = 0.2,
) -> DataFrame:
    """Within-document repetition profile (the Gopher-style repetition
    gates): duplicate-sentence ratio and duplicate-word-bigram ratio,
    plus the combined ``is_repetitive`` flag at ``max_dup_ratio``.

    Sentence = non-empty trimmed '.'-separated span.  Bigram counting is
    over the NON-distinct sequence (repetition is exactly the mass that
    ``array_distinct`` removes).  All ratios are exact int/int divisions
    rounded to 4; the flag compares the rounded values so the threshold
    is engine-portable.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    # materialize token/sentence arrays before HOF indexing — feeding the
    # raw expressions into element_at lambdas re-evaluates the tokenizer
    # per element (see operators/dedup.py::_shingled_hashed)
    base = docs.select(
        F.col(id_col),
        tokens(text_col).alias("__tok"),
        F.filter(
            F.transform(F.split(text, r"\."), lambda s: F.trim(s)),
            lambda s: s != F.lit(""),
        ).alias("__sent"),
    )
    toks, sents = F.col("__tok"), F.col("__sent")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = base.select(
        F.col(id_col),
        F.size(sents).alias("n_sentences"),
        F.size(F.array_distinct(sents)).alias("n_distinct_sentences"),
        F.size(bigrams).alias("__nb"),
        F.size(F.array_distinct(bigrams)).alias("__ndb"),
    )
    dup_sent = F.when(F.col("n_sentences") == 0, F.lit(0.0)).otherwise(
        F.round(
            F.lit(1.0) - F.col("n_distinct_sentences") / F.col("n_sentences"), 4
        )
    )
    dup_bigram = F.when(F.col("__nb") == 0, F.lit(0.0)).otherwise(
        F.round(F.lit(1.0) - F.col("__ndb") / F.col("__nb"), 4)
    )
    return staged.select(
        F.col(id_col),
        "n_sentences",
        "n_distinct_sentences",
        dup_sent.alias("dup_sentence_ratio"),
        dup_bigram.alias("dup_bigram_ratio"),
        (
            (dup_sent > max_dup_ratio) | (dup_bigram > max_dup_ratio)
        ).alias("is_repetitive"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """md5 fingerprint of normalized text per document (the exact-dedup
    key)."""
    return docs.select(F.col(id_col), md5_fingerprint(text_col).alias("fingerprint"))


# encoding-health patterns, kept as \u escapes so the source stays ASCII:
# U+FFFD replacement char; C3+continuation = UTF-8 2-byte lead read as
# Latin-1 ("A-tilde" mojibake); E2+U+20AC = the cp1252 "a-circumflex Euro"
# prefix of curly-quote/ellipsis mojibake
_REPLACEMENT = "\ufffd"
_MOJIBAKE_LATIN1 = "\u00c3[\u0080-\u00bf]"
_MOJIBAKE_CP1252 = "\u00e2\u20ac"


def encoding_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document encoding-health profile: control characters, UTF-8
    replacement characters (U+FFFD — the scar a lossy decode leaves),
    classic UTF-8-read-as-Latin-1 / cp1252 mojibake markers, and the
    non-ASCII character count.

    All counters are built-in ``regexp_count`` expressions (JVM-side,
    shuffle-free scan).  Caveat: Spark's regex walks UTF-16 units, so
    astral-plane codepoints count twice vs a codepoint engine — these
    are threshold gates, and the contract is BMP-exact.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_control = F.regexp_count(
        text, F.lit("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]")
    )
    n_replace = F.regexp_count(text, F.lit(_REPLACEMENT))
    n_mojibake = F.regexp_count(text, F.lit(_MOJIBAKE_LATIN1)) + F.regexp_count(
        text, F.lit(_MOJIBAKE_CP1252)
    )
    n_nonascii = F.regexp_count(text, F.lit("[^\\x00-\\x7f]"))
    return docs.select(
        F.col(id_col),
        F.length(text).alias("n_chars"),
        n_control.cast("long").alias("n_control"),
        n_replace.cast("long").alias("n_replacement"),
        n_mojibake.cast("long").alias("n_mojibake_marks"),
        n_nonascii.cast("long").alias("n_nonascii"),
        ((n_replace > 0) | (n_mojibake > 0) | (n_control > 0)).alias(
            "is_encoding_suspect"
        ),
    )


def token_runs_udtf():
    """Python UDTF (Spark 4, Arrow-batched) emitting maximal runs of
    repeated tokens per document: ``(doc_id, run_start, token, run_len)``
    with 1-based positions over a single-space split.

    This is the engine's UDTF surface — the lateral table-generator
    shape a custom model-side expander (tokenizer, augmenter, candidate
    generator) plugs into when the fan-out logic genuinely can't be a
    JVM expression.  ``useArrow=True`` keeps transfer columnar; state is
    per-row only, so the operator parallelizes like any projection.
    Registered per-session via :func:`register_token_runs`.

    The run-length encoding itself is a gaps-and-islands computation, so
    the DuckDB oracle can replay it exactly with window functions
    (catalog query ``udtf_token_runs``).
    """
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id: bigint, run_start: bigint, token: string, run_len: bigint",
        useArrow=True,
    )
    class TokenRuns:
        def eval(self, doc_id, text):
            if text is None:
                return
            toks = text.split(" ")
            i = 0
            while i < len(toks):
                j = i
                while j < len(toks) and toks[j] == toks[i]:
                    j += 1
                yield doc_id, i + 1, toks[i], j - i
                i = j

    return TokenRuns


def register_token_runs(spark) -> None:
    """Idempotently register the ``token_runs`` UDTF on a session."""
    from ..session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    spark.udtf.register("token_runs", token_runs_udtf())


def duplicate_spans(
    docs: DataFrame,
    *,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document repeated n-gram spans — the candidate pass of exact
    substring deduplication (the "repeated passage" removal training
    pipelines run after doc-level dedup: boilerplate, licenses, chain
    letters that survive whole-doc fingerprinting because the documents
    AROUND them differ).

    Every length-``n`` token window becomes one row; spans whose window
    text appears in at least ``min_docs`` DISTINCT documents are emitted
    with their corpus frequency.  The window fan-out is a pure JVM
    expression (``transform`` over a ``sequence``, no UDF), and the one
    shuffle groups on ``xxhash64`` of the span — 8-byte keys, never the
    span strings (the strings ride as an aggregated payload).  Span text
    is the GROUP identity for the oracle; hashing only shapes the
    shuffle, and a 64-bit collision merging two distinct spans is ~2^-64.
    """
    # materialize the token array as a real column FIRST: referencing the
    # raw tokens() expression inside the per-window slice lambda would
    # re-run the split/filter tokenizer once per window — O(T^2) in doc
    # length, the measured-13x trap documented at dedup._shingled_hashed
    with_toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__ts")
    )
    ts = F.col("__ts")
    n_windows = F.size(ts) - (n - 1)
    # guard: Spark's sequence(1, 0) is DESCENDING [1, 0], so a doc with
    # fewer than n tokens must short-circuit to an empty window list
    # (explode then drops it) rather than reach slice() with start 0
    grams = F.when(
        n_windows > 0,
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.concat_ws(" ", F.slice(ts, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = with_toks.select("doc_id", F.explode(grams).alias("span"))
    return (
        exploded.groupBy(F.xxhash64("span").alias("__k"))
        .agg(
            F.min("span").alias("span"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_total"),
            F.min("doc_id").alias("rep_doc"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .drop("__k")
    )


#: hashed-feature space size for the linear quality model (2^10 buckets:
#: the classic fastText/DCLM hashing-trick tradeoff scaled to the test
#: corpus; a production filter uses 2^20+ with the same plan shape)
N_HASH_BUCKETS = 1024


def hashed_feature_weights(spark, n_buckets: int = N_HASH_BUCKETS) -> DataFrame:
    """Stand-in TRAINED WEIGHTS table for the hashed linear quality
    model: weight_milli(bucket) = (bucket * 2654435761) % 2001 - 1000,
    an integer in [-1000, 1000] (Knuth multiplicative scramble —
    deterministic, exactly replayable in SQL, stands in for the
    classifier weights a DCLM/FineWeb-style filter trains offline).
    Real deployments load this table from the model artifact; it is a
    few MB even at 2^20 buckets, hence always broadcast-able."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (F.pmod(F.col("id") * F.lit(2654435761), F.lit(2001)) - F.lit(1000))
        .cast("long")
        .alias("weight_milli"),
    )


def linear_model_scores(
    docs: DataFrame,
    weights: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_HASH_BUCKETS,
) -> DataFrame:
    """MODEL-BASED quality filtering (the DCLM / FineWeb-Edu pipeline
    stage): score every document with a linear classifier over hashed
    bag-of-words features and gate on the sign — entirely as JVM
    expressions plus ONE broadcast join, no Python in the hot path.

    Feature hashing: bucket(token) = md5-derived 32-bit int mod
    ``n_buckets`` (md5 is bit-identical across engines, so the whole
    model — hash, weights, score — replays in a SQL oracle; a real
    deployment swaps xxhash64 for speed, same plan).  The score and the
    gate are EXACT INTEGER arithmetic end to end: ``score_milli_sum``
    is the sum of per-token milli-weights and admission compares it to
    zero — no double division anywhere, so results are engine-portable
    with no tolerance (a rounded mean is presentation the caller can
    derive; round-half behavior differs across engines).  Token-less
    documents sum 0 and are rejected (no evidence).

    At 100 TB this is one scan-speed projection (tokenize + hash), a
    broadcast hash join against the MB-scale weights table, and a
    map-side-combinable groupBy — the same cost envelope as
    ``token_stats``; the trained-model artifact rides the broadcast,
    which is how model-based filters actually deploy on clusters.
    Output: (id_col, n_tokens, score_milli_sum, keep)."""
    tok = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__t")
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("__t")), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )
    per_doc = (
        tok.select(F.col(id_col), bucket.alias("bucket"))
        .join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("weight_milli").alias("__wsum"),
            F.count(F.lit(1)).alias("__ntok"),
        )
    )
    out = docs.select(F.col(id_col)).join(per_doc, id_col, "left")
    return out.select(
        F.col(id_col),
        F.coalesce(F.col("__ntok"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.col("__wsum"), F.lit(0))
        .cast("long")
        .alias("score_milli_sum"),
        F.coalesce(F.col("__wsum") > 0, F.lit(False)).alias("keep"),
    )
