"""Unit tests for the cleaning/text column functions — the §1.4 edge cases
(null/empty/whitespace lists, malformed numerics and dates) on tiny
literal DataFrames."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from aie321_bigdata_movie_kpi_1m_spark.functions.cleaning import (
    array_to_display_string,
    parse_list_column,
    to_double,
    to_long,
    year_of,
)
from aie321_bigdata_movie_kpi_1m_spark.functions.text import (
    md5_fingerprint,
    normalized_text,
    rolling_hash,
    tokens,
    word_shingles,
)


def _one(spark, expr, value, typ="string"):
    return spark.createDataFrame([(value,)], f"v {typ}").select(expr.alias("r")).first()["r"]


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        (None, []),                     # null -> [] (intended semantics, not the
                                        # reference's 'None'-genre bug, SURVEY §1.4 Q1)
        ("", []),
        ("   ", []),
        ("A, B ,C", ["A", "B", "C"]),   # trim each token
        ("A,,B,", ["A", "B"]),          # drop empties / trailing comma
        ("US,US", ["US", "US"]),        # duplicates preserved
    ],
)
def test_parse_list_column(spark, raw, expected):
    assert _one(spark, parse_list_column("v"), raw) == expected


@pytest.mark.parametrize(
    ("raw", "expected"),
    [("7.5", 7.5), ("abc", None), ("", None), (None, None), ("1e3", 1000.0)],
)
def test_to_double_coerce(spark, raw, expected):
    assert _one(spark, to_double("v"), raw) == expected


def test_to_long(spark):
    assert _one(spark, to_long("v"), "42") == 42
    assert _one(spark, to_long("v"), "4.2") is None
    assert _one(spark, to_long("v"), "garbage") is None


@pytest.mark.parametrize(
    ("raw", "expected"),
    [("2001-03-15", 2001), ("garbage", None), (None, None), ("", None)],
)
def test_year_of(spark, raw, expected):
    assert _one(spark, year_of("v"), raw) == expected


def test_array_display_string(spark):
    df = spark.createDataFrame([(["A", "B"],), ([],), (None,)], "v array<string>")
    got = [r["r"] for r in df.select(array_to_display_string("v").alias("r")).collect()]
    assert got == ["[A,B]", "[]", "[]"]


def test_tokens_and_shingles(spark):
    assert _one(spark, tokens("v"), "  a  b\tc ") == ["a", "b", "c"]
    assert _one(spark, tokens("v"), None) == []
    assert _one(spark, word_shingles(tokens("v"), 3), "a b c d") == ["a b c", "b c d"]
    # sub-n-token docs: one whole-doc sentinel shingle (short exact-dups
    # must still surface in shingle-based near-dup tiers); empty docs
    # share the '' sentinel
    assert _one(spark, word_shingles(tokens("v"), 3), "a b") == ["a b"]
    assert _one(spark, word_shingles(tokens("v"), 3), "") == [""]


def test_normalization_and_fingerprints(spark):
    a = _one(spark, md5_fingerprint("v"), "  Hello   World ")
    b = _one(spark, md5_fingerprint("v"), "hello world")
    assert a == b
    assert _one(spark, normalized_text("v"), "A\t B") == "a b"
    h1 = _one(spark, rolling_hash("v"), "same text")
    h2 = _one(spark, rolling_hash("v"), "same text")
    h3 = _one(spark, rolling_hash("v"), "other text")
    assert h1 == h2 != h3


def test_chunk_sliding_edge_cases(spark):
    # empty doc -> one 0-token chunk; short doc -> one chunk; exactly one
    # window -> one chunk; size+1 tokens -> two chunks with 16-token overlap
    from aie321_bigdata_movie_kpi_1m_spark.plans.catalog import CATALOG
    from aie321_bigdata_movie_kpi_1m_spark.session import scratch_dir
    import tempfile, os

    with tempfile.TemporaryDirectory(dir=scratch_dir()) as d:
        docs = spark.createDataFrame(
            [
                (0, None, "en", "s", 0),
                (1, "a b c", "en", "s", 5),
                (2, " ".join(f"t{i}" for i in range(64)), "en", "s", 300),
                (3, " ".join(f"t{i}" for i in range(65)), "en", "s", 305),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = CATALOG["doc_chunk_sliding"].fn(spark, d).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[0]) == 1 and by_doc[0][0]["n_chunk_tokens"] == 0
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_chunk_tokens"] == 3
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 64
    chunks3 = sorted(by_doc[3], key=lambda r: r["chunk_idx"])
    assert [r["n_chunk_tokens"] for r in chunks3] == [64, 17]
    assert chunks3[1]["chunk_start"] == 49  # stride 48, 1-based
