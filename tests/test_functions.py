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
