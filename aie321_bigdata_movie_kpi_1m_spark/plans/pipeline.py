"""End-to-end movie pipeline orchestration — the ``run_pipeline.py`` analog
(run_pipeline.py:22-59), Spark-first.

The reference runs three eager, fail-fast stages crossing a process
boundary at every edge (CSV -> Postgres -> pandas -> Postgres -> Sheets).
Here the whole thing is one lazy DAG with Parquet layer boundaries:

    raw --clean/filter--> movie_facts --explode--> movie_genre_fact
                                             \\--agg/sort--> genre_summary

- each layer is written ``mode=overwrite`` (the reference's
  drop-and-recreate semantics, transform.py:58);
- the exploded genre fact is computed ONCE and cached across its two
  consumers (the reference recomputes it, transform.py:138 vs :177);
- re-run-from-layer comes free: every stage reads the previous layer's
  parquet.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..operators import kpi
from ..sources.readers import read_parquet
from ..sources.sinks import write_parquet


@dataclass
class PipelineResult:
    facts_rows: int
    genre_fact_rows: int
    summary_rows: int


def run_movie_pipeline(
    spark: SparkSession,
    raw: DataFrame,
    out_dir: str,
) -> PipelineResult:
    """raw movies -> three production parquet layers.

    Returns row counts per layer (the reference's printed checkpoints,
    transform.py:116-121, as values instead of stdout).
    """
    facts = kpi.build_movie_facts(raw)
    write_parquet(facts, f"{out_dir}/movie_facts")

    # re-read the layer so downstream lineage starts at columnar parquet
    facts_l = read_parquet(spark, f"{out_dir}/movie_facts")
    genre_fact = kpi.build_movie_genre_fact(facts_l).cache()
    try:
        write_parquet(genre_fact, f"{out_dir}/movie_genre_fact")
        summary = kpi.build_genre_summary(genre_fact)
        write_parquet(summary, f"{out_dir}/genre_average_revenue")
        return PipelineResult(
            facts_rows=facts_l.count(),
            genre_fact_rows=genre_fact.count(),
            summary_rows=read_parquet(spark, f"{out_dir}/genre_average_revenue").count(),
        )
    finally:
        genre_fact.unpersist()
