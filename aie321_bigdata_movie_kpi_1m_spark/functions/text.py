"""Text-analysis column functions (LLM-data-pipeline surface).

All JVM-side expressions (no Python UDFs): tokenization, shingling,
normalization, fingerprinting.  These feed the dedup / quality / language
operators in ``operators/``.  At 100 TB the hot path is one projection
inside whole-stage codegen per document — no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text -> array<string>.
    Empty/NULL text -> empty array."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(F.coalesce(c, F.lit(""))), r"\s+")
    return F.filter(toks, lambda x: x != F.lit(""))


def word_tokens_bpe_ish(col: Column | str) -> Column:
    """BPE-ish sub-token split: words, numbers, and single punctuation
    marks as separate tokens (a regex approximation of byte-pair behavior
    for token counting)."""
    c = F.col(col) if isinstance(col, str) else col
    # split points: between word chars and non-word chars
    spaced = F.regexp_replace(
        F.coalesce(c, F.lit("")), r"([^\w\s])", r" $1 "
    )
    toks = F.split(F.trim(spaced), r"\s+")
    return F.filter(toks, lambda x: x != F.lit(""))


def word_shingles(tokens_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token array (1-based
    ``element_at`` to stay aligned with SQL oracles).

    Fewer than ``n`` tokens -> one sentinel shingle of the whole token
    join (empty docs share the ``''`` sentinel), so short exact-duplicate
    docs still surface in every shingle-based near-dup tier instead of
    silently vanishing.  A sentinel only ever matches an *identical*
    short doc — it never collides with a real n-gram of a longer doc
    (real shingles always have n tokens)."""
    joined = F.transform(
        F.sequence(F.lit(1), F.size(tokens_col) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens_col, i + j) for j in range(n)]
        ),
    )
    return F.array_distinct(
        F.when(F.size(tokens_col) >= n, joined).otherwise(
            F.array(F.concat_ws(" ", tokens_col))
        )
    )


def normalized_text(col: Column | str) -> Column:
    """Canonical form for exact-dedup fingerprints: lowercase, collapsed
    whitespace, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(F.coalesce(c, F.lit("")), r"\s+", " ")))


def md5_fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 hex of the normalized text
    (portable: identical in every engine)."""
    return F.md5(normalized_text(col))


def rolling_hash(col: Column | str, base: int = 257, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash of the normalized text — the classic
    Rabin-Karp fingerprint, computed JVM-side with ``aggregate`` over the
    character codes.  Kept alongside md5 for parity with rolling-hash
    fingerprinting schemes; md5 is the oracle-checked default."""
    c = normalized_text(col)
    chars = F.split(c, "")
    return F.aggregate(
        F.filter(chars, lambda x: x != F.lit("")),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )
