"""Property-based tests (hypothesis): the composite operators whose edge
cases are easiest to get wrong are checked against independent reference
implementations on randomized inputs — pandas ``merge_asof`` for the
as-of join, a pure-Python set computation for n-gram Jaccard.

One shared Spark session; small bounded inputs keep each example fast,
``deadline=None`` because Spark job latency is not the property under
test.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aie321_bigdata_movie_kpi_1m_spark.operators.asof import asof_join
from aie321_bigdata_movie_kpi_1m_spark.operators.dedup import ngram_jaccard_pairs

import os

# HYPOTHESIS_EXAMPLES=100 pytest ... for a deeper one-off fuzz; the CI
# default stays small because each example runs Spark jobs
_SETTINGS = dict(
    max_examples=int(os.environ.get("HYPOTHESIS_EXAMPLES", "12")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def asof_case(draw):
    keys = draw(st.lists(st.integers(0, 2), min_size=1, max_size=4, unique=True))
    lefts = draw(
        st.lists(
            st.tuples(st.sampled_from(keys), st.integers(0, 50)),
            min_size=1,
            max_size=12,
        )
    )
    rights = draw(
        st.lists(
            st.tuples(st.sampled_from(keys), st.integers(0, 50)),
            min_size=0,
            max_size=12,
        )
    )
    # right side deduped per (key, time): ties within the right side are
    # documented as caller's responsibility (asof.py docstring)
    rights = list({(k, t) for k, t in rights})
    return lefts, rights


@given(asof_case())
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, case):
    lefts, rights = case
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], "k int, t long, lid int"
    )
    right = spark.createDataFrame(
        [(k, t, 1000 + i) for i, (k, t) in enumerate(rights)],
        "k int, t long, rid int",
    ) if rights else spark.createDataFrame([], "k int, t long, rid int")

    got = {
        (r["lid"], r["rid"])
        for r in asof_join(
            left, right, "k", left_time="t", right_time="t", payload=["rid"]
        ).collect()
    }

    lp = pd.DataFrame([(k, t, i) for i, (k, t) in enumerate(lefts)],
                      columns=["k", "t", "lid"]).sort_values("t", kind="stable")
    rp = pd.DataFrame([(k, t, 1000 + i) for i, (k, t) in enumerate(rights)],
                      columns=["k", "t", "rid"]).sort_values("t", kind="stable")
    if len(rp):
        merged = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
        expect = {
            (int(r.lid), None if pd.isna(r.rid) else int(r.rid))
            for r in merged.itertuples()
        }
    else:
        expect = {(int(r.lid), None) for r in lp.itertuples()}
    assert got == expect


@given(
    st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=12).map(" ".join),
        min_size=2,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_ngram_jaccard_matches_python_sets(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["i"], r["j"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=2, threshold=0.0).collect()
    }

    def shingles(t: str) -> set[str]:
        toks = t.split()
        if len(toks) < 2:
            # word_shingles sentinel: sub-n-token docs contribute the
            # whole-token-join shingle ('' for empty docs)
            return {" ".join(toks)}
        return {" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)}

    expect = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = shingles(texts[i]), shingles(texts[j])
            if a & b:
                expect[(i, j)] = round(len(a & b) / len(a | b), 4)
    assert got == expect


@given(
    st.lists(
        st.integers(min_value=0, max_value=30),  # token count per doc
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=1, max_value=10),  # budget
)
@settings(**_SETTINGS)
def test_pack_sequences_invariants(spark, token_counts, budget):
    from aie321_bigdata_movie_kpi_1m_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(token_counts)],
        "doc_id long, text string",
    )
    rows = pack_sequences(docs, budget=budget, n_shards=2).collect()
    # every doc assigned exactly once, token mass conserved
    assert sorted(r["doc_id"] for r in rows) == list(range(len(token_counts)))
    assert sum(r["n_tokens"] for r in rows) == sum(token_counts)
    # within a shard (id order): bins start at 0 and never decrease, and
    # each bin's starting offset is below the next budget boundary
    by_shard: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        cum = 0
        prev_bin = 0
        for r in shard_rows:
            assert r["bin_id"] == cum // budget
            assert r["bin_id"] >= prev_bin
            prev_bin = r["bin_id"]
            cum += r["n_tokens"]


@st.composite
def quota_case(draw):
    n = draw(st.integers(1, 30))
    sizes = draw(st.lists(st.integers(0, 400), min_size=n, max_size=n))
    budget = draw(st.integers(0, 3000))
    # cut points partitioning [0, n) into ordered micro-batches
    cuts = draw(st.sets(st.integers(1, max(1, n - 1)), max_size=5))
    return sizes, budget, sorted(cuts)


@given(quota_case())
@settings(**_SETTINGS)
def test_quota_admission_is_batch_split_invariant(case):
    """streaming/quota.py correctness core: folding the admission kernel
    over ANY split of a doc_id-ordered stream into micro-batches yields
    exactly the single-pass prefix-sum admission — the invariant that
    makes the streaming operator equal its batch oracle regardless of
    how the source chops batches.  Pure-pandas kernel, no Spark jobs."""
    import pandas as pd

    from aie321_bigdata_movie_kpi_1m_spark.streaming.quota import _admit

    sizes, budget, cuts = case
    docs = [(i, "s", n) for i, n in enumerate(sizes)]

    # reference: single-pass prefix sum
    cum, expected = 0, []
    for i, _, n in docs:
        cum += n
        if cum <= budget:
            expected.append((i, "s", n, cum))

    # kernel folded over the micro-batch split, state threaded through
    bounds = [0, *cuts, len(docs)]
    spent, got = 0, []
    for lo, hi in zip(bounds, bounds[1:]):
        frame = pd.DataFrame(
            docs[lo:hi], columns=["doc_id", "source", "n_chars"]
        )
        spent, out = _admit(spent, [frame], "s", budget)
        got.extend(out)
    assert got == expected
    assert spent == sum(sizes)
