"""Streaming per-source admission quota — a training-data mixture cap
enforced at ingest time.

Semantics (prefix quota): per ``source``, documents are consumed in
ARRIVAL order — ``doc_id`` order within each micro-batch, batches in
delivery order — and a document is admitted iff the source's cumulative
char count — over ALL its documents so far, admitted or not — stays
within ``budget_chars``.  Once a source's stream of characters crosses
the budget, everything later from that source is dropped at the door:
the cheap, auditable way to stop one crawl domain from flooding a
training mixture (the batch twin of ``source_mix_weights`` reweighting).

Determinism contract: the admitted set equals the global-``doc_id``
prefix (what the SQL oracle computes) exactly when the SOURCE delivers
doc_ids in nondecreasing order across micro-batches — true for the
replay source (offset = row position over an id-ordered file) and any
log-ordered bus.  Under out-of-order delivery the quota is still exact
in chars spent (every doc charged once), but WHICH docs got in depends
on arrival order — the inherent property of admission at the door; a
reorder-buffer would mean unbounded state.  Batch-split invariance over
ordered delivery is property-tested.

Two implementations, one semantics, selected automatically:

- ``transformWithStateInPandas`` (Spark 4's arbitrary-state API: typed
  ``ValueState``, optional TTL, timers).  Its state protocol needs
  ``google.protobuf``, which THIS sandbox does not ship, so it is gated
  behind an import check — on a real cluster it is the default path.
- ``applyInPandasWithState`` (the stable API the rest of ``streaming/``
  uses) with an identical single-long state row.  This is the path the
  sandbox tests and the oracle exercise.

State size note: ONE long per distinct source — orders of magnitude
below the dedup operators' per-fingerprint state; a 100 TB corpus with
10^5 sources carries ~1 MB of quota state total.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

QUOTA_OUTPUT = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("cum_chars", T.LongType()),
    ]
)

_QUOTA_STATE = T.StructType([T.StructField("spent", T.LongType())])

#: default budget: bites at every testdata scale (sf0.001 sources carry
#: ~7-9k chars each, so some docs are admitted and some rejected)
DEFAULT_BUDGET_CHARS = 5_000


def tws_available() -> bool:
    """transformWithStateInPandas needs google.protobuf for its state
    server protocol; absent here, the operator falls back."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _admit(
    spent: int, pdfs: Iterable[pd.DataFrame], source: str, budget: int
) -> tuple[int, list[tuple]]:
    """Shared admission kernel: fold batches in doc_id order, return the
    new running total and the admitted rows."""
    out: list[tuple] = []
    frames = [f for f in pdfs if len(f)]
    if not frames:
        return spent, out
    batch = pd.concat(frames, ignore_index=True).sort_values("doc_id")
    for doc_id, n in zip(batch["doc_id"], batch["n_chars"]):
        spent += int(n)
        if spent <= budget:
            out.append((int(doc_id), source, int(n), spent))
    return spent, out


def _quota_fn_factory(budget: int):
    """applyInPandasWithState kernel with the budget baked in (the
    closure is cloudpickled by value, so workers need no extra state)."""

    def quota_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (source,) = key
        (spent,) = state.get if state.exists else (0,)
        spent, out = _admit(int(spent), pdfs, source, budget)
        state.update((spent,))
        if out:
            yield pd.DataFrame(
                out, columns=["doc_id", "source", "n_chars", "cum_chars"]
            )

    return quota_fn


def _tws_processor(budget: int):
    """transformWithStateInPandas processor (Spark 4 StatefulProcessor):
    the same kernel over a typed ValueState.  Instantiated lazily so the
    module imports cleanly where the TWS protocol deps are absent."""
    from pyspark.sql.streaming import StatefulProcessor

    class QuotaProcessor(StatefulProcessor):
        def __init__(self, budget_chars: int):
            self._budget = budget_chars

        def init(self, handle) -> None:
            self._spent = handle.getValueState("spent", "spent long")

        def handleInputRows(self, key, rows, timerValues):
            prev = self._spent.get() if self._spent.exists() else None
            spent = int(prev[0]) if prev is not None else 0
            spent, out = _admit(spent, rows, key[0], self._budget)
            self._spent.update((spent,))
            if out:
                yield pd.DataFrame(
                    out, columns=["doc_id", "source", "n_chars", "cum_chars"]
                )

        def close(self) -> None:
            pass

    return QuotaProcessor(budget)


def admit_quota_stream(
    docs: DataFrame,
    *,
    budget_chars: int = DEFAULT_BUDGET_CHARS,
    api: str = "auto",
) -> DataFrame:
    """Admission-quota stream over a documents stream.

    ``api``: ``"auto"`` (transformWithStateInPandas when its protobuf
    dependency is importable, else applyInPandasWithState), or force
    ``"tws"`` / ``"apply_in_pandas"``.  Both paths produce identical
    output (the shared ``_admit`` kernel) and carry one long of state
    per source.
    """
    from ..session import ensure_package_on_workers

    if api not in ("auto", "tws", "apply_in_pandas"):
        raise ValueError(f"api must be auto|tws|apply_in_pandas, got {api!r}")
    ensure_package_on_workers(docs.sparkSession)
    keyed = docs.select("doc_id", "source", "n_chars").groupBy("source")
    use_tws = api == "tws" or (api == "auto" and tws_available())
    if use_tws:
        return keyed.transformWithStateInPandas(
            _tws_processor(budget_chars),
            outputStructType=QUOTA_OUTPUT,
            outputMode="append",
            timeMode="none",
        )
    return keyed.applyInPandasWithState(
        _quota_fn_factory(budget_chars),
        outputStructType=QUOTA_OUTPUT,
        stateStructType=_QUOTA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
