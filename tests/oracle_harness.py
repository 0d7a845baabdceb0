"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog entry's Spark plan and its DuckDB oracle on the same
parquet tables, then compares row count, column names, and values
(order-insensitive, exact).  Exact equality here is deliberately stricter
than any plausible driver hash: if this passes, the driver's
order-insensitive value-hash passes.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from aie321_bigdata_movie_kpi_1m_spark.schemas import STAR_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Pre-register the testdata tables as views, as the driver does."""
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)  # None -> 'None', stable
        elif str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype).startswith(("int", "Int", "uint")):
            df[c] = df[c].astype("float64")  # unify int widths & NA-ints
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(
        drop=True
    )


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of human-readable mismatches (empty == pass)."""
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} "
            f"oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        return problems
    for c in sorted(spark_pdf.columns):
        sd, od = str(spark_pdf[c].dtype), str(oracle_pdf[c].dtype)
        # timestamp resolution (ns vs us) is a pandas artifact, not a type
        # mismatch; anything else (int32 vs int64, int vs float) can foil
        # the driver's schema/value hash and must be aligned in the query.
        if sd.startswith("datetime") and od.startswith("datetime"):
            continue
        if sd != od:
            problems.append(f"col {c!r} dtype: spark={sd} oracle={od}")
    a, b = _canonical(spark_pdf), _canonical(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype == "float64":
            eq = (av == bv) | (av.isna() & bv.isna())
            # exact-first; report ULP-level drift distinctly so the query
            # can be tightened (rounding / integral-valued measures)
            if not eq.all():
                bad = (~eq).idxmax()
                close = all(
                    (math.isnan(x) and math.isnan(y)) or x == y or abs(x - y) < 1e-9
                    for x, y in zip(av.fillna(float("nan")), bv.fillna(float("nan")))
                )
                problems.append(
                    f"col {c!r} first mismatch at row {bad}: "
                    f"spark={av[bad]!r} oracle={bv[bad]!r}"
                    + (" (within 1e-9 — FP drift)" if close else "")
                )
        else:
            # null == null (NaT/None) counts as a match, as in the
            # driver's value hash where NULL is a stable sentinel
            eq = av.eq(bv) | (av.isna() & bv.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                problems.append(
                    f"col {c!r} first mismatch at row {bad}: "
                    f"spark={av[bad]!r} oracle={bv[bad]!r}"
                )
    return problems


def run_compare(spark, sf_dir: str, name: str) -> list[str]:
    from aie321_bigdata_movie_kpi_1m_spark.plans.catalog import CATALOG

    spec = CATALOG[name]
    if spec.oracle is None:
        sdf = spec.fn(spark, sf_dir)
        return [] if sdf.count() >= 0 else ["spark query failed"]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(spec.oracle).df()
    finally:
        con.close()
    return compare_frames(spark_pdf, oracle_pdf)
