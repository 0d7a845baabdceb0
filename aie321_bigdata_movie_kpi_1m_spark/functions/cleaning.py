"""Scalar cleaning functions (SURVEY.md §2.3, F1-F5).

Every one of these is a pure JVM-side Column expression — no Python UDFs.
The reference implements F1 and F5 as row-wise Python lambdas
(transform.py:30-39, transform.py:129-130); here they stay inside
whole-stage codegen, which is the difference between a scan-speed pipeline
and a serialization-bound one at 100 TB.

Null semantics note (SURVEY.md §1.4 Q1): the reference accidentally turns
NULL list cells into a literal ``'None'`` genre via ``astype(str)``
(transform.py:98).  This engine implements the *intended* semantics —
NULL/empty/whitespace -> empty array — and the correctness oracles encode
the intended version.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_list_column(col: Column | str) -> Column:
    """F1 — comma-separated string -> array<string>.

    Split on ',', trim each token, drop empties; NULL -> [].
    Mirrors the intent of ``parse_and_extract_names`` (transform.py:30-39):
    tokens are plain names, not JSON, despite the reference's variable name
    ``json_cols`` (transform.py:96).
    """
    c = F.col(col) if isinstance(col, str) else col
    tokens = F.transform(F.split(F.coalesce(c, F.lit("")), ","), lambda x: F.trim(x))
    return F.filter(tokens, lambda x: x != F.lit(""))


def to_double(col: Column | str) -> Column:
    """F2 — numeric coercion: malformed -> NULL.

    Equivalent to ``pd.to_numeric(errors='coerce')`` (transform.py:100-102);
    ``try_cast`` keeps that semantics under Spark 4's ANSI mode.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def to_long(col: Column | str) -> Column:
    """F4 — nullable integer id cast (``astype('Int64')``, transform.py:105)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("long")


def year_of(col: Column | str) -> Column:
    """F3 — date parse + year extract; malformed/NULL date -> NULL year
    (``to_datetime(errors='coerce').dt.year``, transform.py:104)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.year(F.try_to_timestamp(c)).cast("int")


def array_to_display_string(col: Column | str) -> Column:
    """F5 — array -> bracketed display string ``[A,B]`` (transform.py:129-130).

    Sink-boundary only: in-engine data keeps the real ArrayType; this is
    the lossy stringification the reference applies before its DB write.
    NULL array -> '[]' (intended semantics; arrays here are non-null by
    construction after F1).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(
        F.lit("["), F.array_join(F.coalesce(c, F.array()), ","), F.lit("]")
    )
