"""Streaming ingest-time deduplication over a documents stream.

The streaming twin of ``operators.dedup.dedup_exact``: content
fingerprints are the state key, and per key the state tracks the
smallest doc id seen and the copy count.  With an availableNow backfill
the emission equals the batch fingerprint groupBy exactly (the oracle
contract shared by every streaming query here, see streaming/events.py);
a live run keeps the fingerprint -> (keeper, count) state across batches
so re-ingested duplicates are dropped at the door rather than by a
nightly batch job — the shape that keeps continuous crawl ingest cheap
against a 100 TB historical store.

State size note: state is one (fingerprint, long, long) row per DISTINCT
content ever seen — the same cardinality a batch dedup shuffles, but
amortized over the stream's lifetime and sharded by the state store.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.text import md5_fingerprint
from ..schemas import STAR_SCHEMAS

_DEDUP_OUTPUT = T.StructType(
    [
        T.StructField("fingerprint", T.StringType()),
        T.StructField("keeper_id", T.LongType()),
        T.StructField("n_copies", T.LongType()),
    ]
)

_DEDUP_STATE = T.StructType(
    [
        T.StructField("keeper_id", T.LongType()),
        T.StructField("n_copies", T.LongType()),
    ]
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the documents table (one micro-batch per
    availableNow run over the single testdata file; a real bus is the
    Kafka reader with the same downstream plan)."""
    return (
        spark.readStream.schema(STAR_SCHEMAS["documents"])
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def _dedup_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (fingerprint,) = key
    keeper, count = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        if len(pdf):
            batch_min = int(pdf["doc_id"].min())
            keeper = batch_min if keeper is None else min(keeper, batch_min)
            count += len(pdf)
    state.update((keeper, count))
    # availableNow backfill contract (see module docstring): emit the
    # key's current rollup each batch it appears in; one batch == the
    # batch dedup_exact output, and live consumers upsert on fingerprint
    yield pd.DataFrame(
        {"fingerprint": [fingerprint], "keeper_id": [keeper], "n_copies": [count]}
    )


def dedup_stream(docs: DataFrame) -> DataFrame:
    """Stateful streaming exact-dedup: fingerprint-keyed
    ``applyInPandasWithState`` tracking (min doc id, copy count)."""
    from ..session import ensure_package_on_workers

    # _dedup_fn is module-level, so workers unpickle it by module
    # reference — the package must be importable worker-side even when
    # the session wasn't built by session.get_spark (driver sessions)
    ensure_package_on_workers(docs.sparkSession)
    keyed = docs.select(
        "doc_id", md5_fingerprint("text").alias("fingerprint")
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_DEDUP_OUTPUT,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
