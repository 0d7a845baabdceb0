#!/usr/bin/env python
"""Pre-commit parity smoke: the cheap regression net for the catalog's
driver-evidence gap.

The round driver samples only 50 of the catalog's queries per round, so a
regression in exactly the never-yet-sampled population could hide until
the round it finally gets sampled — and the two queries whose only driver
rows are stale round-1 failures (``ann_lsh_topk``, ``ann_ivf_topk``) must
be provably green EVERY commit so a re-sample lands green.

This script therefore runs, at sf0.01 (seconds, not the 15-minute full
matrix):

1. the two stale-row queries, ALWAYS;
2. a rotating deterministic 10-query slice of the rest of the catalog —
   the rotation index is ``(day-of-year + optional $SMOKE_SLICE offset)``
   so consecutive days (or consecutive explicit offsets) sweep the whole
   catalog in ~2 weeks with no query ever structurally excluded.

Usage:  python smoke.py            # today's slice
        SMOKE_SLICE=3 python smoke.py   # explicit slice, CI sharding
Exit code 0 = all compared queries oracle-equal.
"""

from __future__ import annotations

import datetime
import os
import subprocess
import sys

# - ann_lsh_topk / ann_ivf_topk: the two queries whose only driver rows
#   are stale round-1 failures — must be provably green every commit
# - snapshot_merge_cow / streaming_drift_kl: one representative each of
#   the two families dominating the never-driver-sampled population (the
#   snapshot table layer and the flush-sentinel streaming monitors) —
#   their members share failure modes, so a green representative guards
#   the family between rotations
# - snapshot_delete_equality / streaming_snapshot_cdc_apply: the newest,
#   most state-machine-heavy members of those same two families (VERDICT
#   r6 next-round #4) — a regression there would otherwise hide until
#   the driver's rotation lands on them
# - snapshot_pushdown_scan / streaming_snapshot_cdf_tail: the round-7/8
#   state machines (filter-pushdown batch DataSource; CDF tail across
#   merge + append + predicate-delete + equality-key delete) — the two
#   newest members of the never-driver-sampled families (VERDICT r7
#   next-round #5)
# - indexed_bm25_topk: the round-9 index-group state machine (pruned
#   postings + doclen + signed-delta stats ledger) — newest
#   never-driver-sampled member of the snapshot-index family
# - streaming_index_maintenance: the round-9 stream-built index (cdf
#   feed with _commit_version, per-commit-order refresh replay) — the
#   most state-machine-heavy never-sampled query
ALWAYS = [
    "ann_lsh_topk",
    "ann_ivf_topk",
    "snapshot_merge_cow",
    "streaming_drift_kl",
    "snapshot_delete_equality",
    "streaming_snapshot_cdc_apply",
    "snapshot_pushdown_scan",
    "streaming_snapshot_cdf_tail",
    "indexed_bm25_topk",
    "streaming_index_maintenance",
    # r10 state machines: CDF-maintained ANN assignments and the
    # lexicon-sideband probe derivation
    "ann_cdf_mixture_weights",
    "indexed_keyword_search",
    # r12 state machines: the DataFrame-probe admission path, the
    # permuterm wildcard layer, and the stream-governed IVFADC tier
    "indexed_neardup_batch_admission",
    "indexed_wildcard_search",
    "streaming_ivfadc_maintenance",
    # r13 state machines: the fuzzy deletion-neighborhood layer (and
    # its BM25 composition) and the WAP branch-audit-publish flow
    "indexed_bm25_fuzzy",
    "snapshot_wap_publish",
]
SLICE = 10


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from aie321_bigdata_movie_kpi_1m_spark.plans.catalog import CATALOG

    rest = sorted(n for n in CATALOG if n not in ALWAYS)
    n_slices = (len(rest) + SLICE - 1) // SLICE
    idx = int(
        os.environ.get("SMOKE_SLICE", datetime.date.today().timetuple().tm_yday)
    ) % n_slices
    picked = ALWAYS + rest[idx * SLICE : (idx + 1) * SLICE]
    expr = " or ".join(f"({n} and sf0.01)" for n in picked)
    print(f"smoke slice {idx + 1}/{n_slices}: {picked}", flush=True)
    return subprocess.call(
        [
            sys.executable,
            "-m",
            "pytest",
            "tests/test_oracle_parity.py",
            "-q",
            "-k",
            expr,
        ],
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )


if __name__ == "__main__":
    raise SystemExit(main())
