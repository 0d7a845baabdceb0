#!/usr/bin/env python
"""Isolate and measure catalog queries (guide §1): times each named query
against $SPARK_GRAFT_SF_DIR with the noop sink (computes every column,
no sink cost), after one untimed warm run that pays fixture builds, and
optionally dumps .explain("formatted") to a file.

Usage:
  python measure_query.py [--explain-dir plans/r15 --suffix before]
                          [--runs 2] q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf typehint resolution)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aie321_bigdata_movie_kpi_1m_spark.plans.catalog import CATALOG  # noqa: E402
from aie321_bigdata_movie_kpi_1m_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="aie321-measure")
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up as bench.py: JVM/codegen + python worker pool
    CATALOG["genre_avg_revenue"].fn(spark, sf_dir).count()
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _warm(x: pd.Series) -> pd.Series:
        return x

    spark.range(32).select(_warm("id")).count()

    for name in args.queries:
        spec = CATALOG[name]
        if not args.no_warm:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            spec.fn(spark, sf_dir).count()  # untimed: fixture builds
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name}:run{i}")
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: noop_best={min(times)} runs={times}", flush=True)


if __name__ == "__main__":
    main()
