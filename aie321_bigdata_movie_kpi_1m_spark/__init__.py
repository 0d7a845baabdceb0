"""PySpark-native analytics engine with the capabilities of
``Phoom173/AIE321_Bigdata_Movie_KPI_1M`` (reference, read-only at
/root/reference/), rebuilt Spark-first.

The reference is a single-node pandas ETL (CSV -> Postgres -> pandas
transform -> Postgres -> Sheets).  This package re-expresses every
capability as lazy, declarative Spark DataFrame plans designed for
multi-executor clusters at ~100 TB scale: explicit schemas, Parquet
layers, zero row-wise Python UDFs in the reference-parity core, AQE on,
broadcast-able dimension joins, and partial-aggregation-friendly shapes.

Layout
------
- ``session``    SparkSession factory (AQE, shuffle partitions, tz)
- ``schemas``    canonical StructTypes (movies model + testdata star)
- ``sources``    readers (csv/parquet/jdbc) & sinks (parquet, bounded export)
- ``functions``  column-level building blocks (cleaning, text, vectors)
- ``operators``  composable DataFrame ops (kpi, dedup, similarity, text,
                 multimodal, windows)
- ``plans``      end-to-end pipelines & the star-schema query catalog
- ``streaming``  Structured Streaming surface over the events table
"""

__version__ = "0.1.0"
