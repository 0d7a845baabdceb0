"""Unit tests for the composite operators: as-of join edge cases, session
boundaries, dedup determinism, SimHash locality, LSH recall."""

from __future__ import annotations

import pytest

from datetime import datetime

import pyspark.sql.functions as F

from aie321_bigdata_movie_kpi_1m_spark.operators.asof import asof_join
from aie321_bigdata_movie_kpi_1m_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from aie321_bigdata_movie_kpi_1m_spark.operators.sessions import session_summary
from aie321_bigdata_movie_kpi_1m_spark.operators.similarity import cosine_topk, lsh_topk


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), "l1"),
         (1, ts("2024-01-01 12:00:00"), "l2"),
         (2, ts("2024-01-01 09:00:00"), "l3")],
        "k int, t timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:30:00"), 100),
         (1, ts("2024-01-01 11:00:00"), 200),
         (2, ts("2024-01-01 09:30:00"), 300)],  # after l3: no match
        "k int, t timestamp, payload int",
    )
    out = {
        r["name"]: r["payload"]
        for r in asof_join(
            left, right, "k", left_time="t", right_time="t", payload=["payload"]
        ).collect()
    }
    assert out == {"l1": 100, "l2": 200, "l3": None}


def test_asof_join_inclusive_equal_timestamp(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01 10:00:00"), "l")],
                                 "k int, t timestamp, name string")
    right = spark.createDataFrame([(1, ts("2024-01-01 10:00:00"), 7)],
                                  "k int, t timestamp, payload int")
    [row] = asof_join(left, right, "k", left_time="t", right_time="t",
                      payload=["payload"]).collect()
    assert row["payload"] == 7


def test_asof_join_null_times_and_keys_follow_sql_contract(spark):
    """A NULL never compares true in SQL: NULL-time right rows match
    nothing (ascending sort would otherwise put them 'before everything'
    and hand their payload to unmatched left rows), NULL-time left rows
    keep NULL payloads (the forward frame would otherwise grab the
    earliest right row), and NULL keys never join."""
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 08:00:00"), "early"),   # before any valid right
         (1, None, "null_t"),
         (None, ts("2024-01-01 10:00:00"), "null_k")],
        "k int, t timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, None, 666),                             # can match nothing
         (1, ts("2024-01-01 09:00:00"), 100),
         (None, ts("2024-01-01 07:00:00"), 777)],    # NULL key: no partner
        "k int, t timestamp, payload int",
    )
    for direction, expect in [
        ("backward", {"early": None, "null_t": None, "null_k": None}),
        ("forward", {"early": 100, "null_t": None, "null_k": None}),
    ]:
        got = {
            r["name"]: r["payload"]
            for r in asof_join(
                left, right, "k", left_time="t", right_time="t",
                payload=["payload"], direction=direction,
            ).collect()
        }
        assert got == expect, direction


def test_minhash_rejects_indivisible_bands(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_pairs(docs, num_hashes=32, bands=10)


def test_streaming_session_kernel_drops_nat(spark):
    """The applyInPandasWithState kernel must drop NaT like its batch
    twin — astype('int64') on NaT raises on modern pandas (query death)
    or fabricates an epoch-1677 session on older pandas."""
    import pandas as pd

    from aie321_bigdata_movie_kpi_1m_spark.streaming.events import _session_fn

    class StubState:
        exists = False

        def update(self, v):
            self.saved = v

    pdf = pd.DataFrame(
        {"user_id": [1] * 3,
         "ts": pd.to_datetime([None, "2024-01-01 10:00:00",
                               "2024-01-01 10:10:00"])}
    )
    state = StubState()
    [out] = list(_session_fn(3600)((1,), iter([pdf]), state))
    assert list(out["n_events"]) == [2]
    assert list(out["duration_secs"]) == [600]


@pytest.mark.slow


def test_session_boundaries(spark):
    events = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00")),
         (1, ts("2024-01-01 10:10:00")),    # same session (gap 600s)
         (1, ts("2024-01-01 20:00:00")),    # new session
         (2, ts("2024-01-01 10:00:00"))],
        "user_id int, ts timestamp",
    )
    rows = session_summary(events, gap_seconds=3600).orderBy("user_id", "session_seq").collect()
    assert [(r["user_id"], r["session_seq"], r["n_events"], r["duration_secs"]) for r in rows] == [
        (1, 1, 2, 600),
        (1, 2, 1, 0),
        (2, 1, 1, 0),
    ]


def test_sessionize_drops_null_timestamps(spark):
    """A null-ts event can't sit on the timeline; before the fix each one
    became its own spurious session AND shifted session_seq for all of
    that user's real events (nulls sort first in the ascending window)."""
    events = spark.createDataFrame(
        [(1, None),
         (1, ts("2024-01-01 10:00:00")),
         (1, ts("2024-01-01 10:10:00")),
         (1, None)],
        "user_id int, ts timestamp",
    )
    rows = session_summary(events, gap_seconds=3600).collect()
    assert [(r["user_id"], r["session_seq"], r["n_events"], r["duration_secs"])
            for r in rows] == [(1, 1, 2, 600)]


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog and runs away fast"),
    (2, "the quick brown fox jumps over the lazy dog and runs away quickly"),  # near-dup of 1
    (3, "completely different content about spark query engines and shuffles here"),
    (4, "the quick brown fox jumps over the lazy dog and runs away fast"),     # exact dup of 1
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_ngram_jaccard_finds_neardups(spark):
    pairs = {(r["i"], r["j"]) for r in ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()}
    assert (1, 2) in pairs and (1, 4) in pairs and (2, 4) in pairs
    assert not any(3 in p for p in pairs)


def test_minhash_lsh_matches_exact_on_small_data(spark):
    exact = {(r["i"], r["j"]) for r in ngram_jaccard_pairs(_docs(spark), threshold=0.8).collect()}
    lsh = {(r["i"], r["j"]) for r in minhash_lsh_pairs(_docs(spark), threshold=0.8).collect()}
    assert lsh == exact and (1, 4) in lsh


def test_simhash_deterministic_and_local(spark):
    fp1 = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(_docs(spark)).collect()}
    fp2 = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(_docs(spark)).collect()}
    assert fp1 == fp2
    assert fp1[1] == fp1[4]  # exact dup -> identical fingerprint
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(fp1[1], fp1[2]) < ham(fp1[1], fp1[3])  # near-dup closer than unrelated


@pytest.mark.slow


def test_lsh_topk_recall_on_clustered_vectors(spark):
    # LSH's contract is high recall in the high-similarity regime (near-dup
    # retrieval), so test on clustered vectors: 5 tight clusters (cos>0.9
    # within, ~orthogonal across).  The testdata embeddings are near-random
    # (top-5 cosine ~0.33) where hyperplane LSH cannot and should not be
    # expected to approximate exact kNN.
    import numpy as np

    rng = np.random.default_rng(7)
    dims, per_cluster = 64, 10
    centers = rng.normal(size=(5, dims))
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(per_cluster):
            v = c + rng.normal(scale=0.08, size=dims)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") % per_cluster == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(emb, queries, dims=dims, n_planes=6, n_tables=6, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"LSH recall too low on clustered data: {recall}"
    again = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(emb, queries, dims=dims, n_planes=6, n_tables=6, k=5).collect()
    }
    assert approx == again


def test_lsh_multiprobe_beats_single_probe_recall(spark):
    """Multi-probe LSH (Hamming-1 bit-flip probes per table) must
    strictly beat single-probe recall on the SAME index state — the
    near-random testdata embeddings are exactly the hard regime where
    one separating hyperplane loses the true neighbor, so the adjacent
    buckets recover most of the deficit (measured: 5/80 -> 37/80 at
    sf0.001)."""
    from aie321_bigdata_movie_kpi_1m_spark.operators.similarity import (
        cosine_topk,
        lsh_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(emb, queries, n_planes=8, k=10).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(
            emb, queries, n_planes=8, k=10, multiprobe=True
        ).collect()
    }
    r_single = len(single & exact)
    r_multi = len(multi & exact)
    assert r_multi > r_single, (r_single, r_multi)
    # the deterministic fixture makes the measured win pinnable: at
    # least 4x here (5 -> 37 when authored)
    assert r_multi >= 4 * max(r_single, 1), (r_single, r_multi)


def test_sq8_topk_matches_exact_and_survives_zero_vectors(spark):
    """SQ8 with a 4x shortlist recovers the exact top-k on the testdata
    (int8 distortion is far below the neighbor gaps), and an all-zero
    vector neither crashes the quantizer (scale pins to 1) nor poisons
    the ranking."""
    from aie321_bigdata_movie_kpi_1m_spark.operators.similarity import (
        cosine_topk,
        sq8_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sorted(
        map(tuple, cosine_topk(emb, queries, k=10).collect())
    )
    sq8 = sorted(map(tuple, sq8_topk(emb, queries, k=10).collect()))
    assert sq8 == exact
    # zero-vector robustness: scale pins to 1, codes all zero, the row
    # scores 0/0-free (NaN sims sort below real ones, never crash)
    dead = spark.createDataFrame(
        [(99999, [0.0] * 64)], "vec_id long, embedding array<double>"
    )
    got = sq8_topk(
        emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        ).union(dead),
        queries,
        k=10,
    )
    assert sorted(map(tuple, got.collect())) == exact


def test_cosine_neardup_pairs_matches_bruteforce(spark):
    import numpy as np

    from aie321_bigdata_movie_kpi_1m_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=(20, 16))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # plant two near-duplicates of vector 0 and one of vector 5
    for vid, src, scale in [(100, 0, 0.01), (101, 0, 0.02), (102, 5, 0.01)]:
        rows.append(
            (vid, [float(x) for x in base[src] + rng.normal(scale=scale, size=16)])
        )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["i"], r["j"])
        for r in cosine_neardup_pairs(emb, threshold=0.95, n_blocks=4).collect()
    }
    norm = base / np.linalg.norm(base, axis=1, keepdims=True)
    mats = {vid: np.array(v) / np.linalg.norm(v) for vid, v in rows}
    expect = {
        (a, b)
        for a in mats
        for b in mats
        if a < b and float(mats[a] @ mats[b]) >= 0.95
    }
    assert got == expect
    assert (0, 100) in got and (0, 101) in got and (5, 102) in got


def test_ivf_topk_recall_and_determinism(spark):
    import numpy as np

    from aie321_bigdata_movie_kpi_1m_spark.operators.similarity import ivf_topk

    # clustered corpus: IVF's designed-for regime (cells align to clusters)
    rng = np.random.default_rng(13)
    centers = rng.normal(size=(4, 32))
    rows = []
    vid = 0
    for c in centers:
        for _ in range(12):
            rows.append((vid, [float(x) for x in c + rng.normal(scale=0.05, size=32)]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") % 12 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    # n_probe=2 of 4 cells: still a sub-linear probe, but robust to the
    # one bad-seed layout (a cluster split across two cells) that a
    # single-cell probe cannot recover from
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            emb, queries, k=5, n_centroids=4, n_probe=2, iters=2
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"IVF recall too low on clustered data: {recall}"
    again = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            emb, queries, k=5, n_centroids=4, n_probe=2, iters=2
        ).collect()
    }
    assert approx == again


def test_salted_join_equals_plain_join(spark):
    from aie321_bigdata_movie_kpi_1m_spark.operators.skew import salted_join

    # heavily skewed big side: one hot key with 500 rows
    big = spark.createDataFrame(
        [(1 if i < 500 else i % 7, i) for i in range(600)], "k int, payload int"
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(7)], "k int, name string")
    plain = {(r["k"], r["payload"], r["name"]) for r in big.join(small, "k").collect()}
    salted = {
        (r["k"], r["payload"], r["name"])
        for r in salted_join(big, small, "k", salt=8).collect()
    }
    assert salted == plain
    left_plain = big.join(small.filter("k < 3"), "k", "left").count()
    left_salted = salted_join(big, small.filter("k < 3"), "k", salt=8, how="left").count()
    assert left_salted == left_plain


def test_observed_salt_gates_on_real_skew(spark):
    """salt='auto' pays the replication tax only when a sampled probe
    sees a genuinely hot key; balanced keys resolve to a plain join."""
    from aie321_bigdata_movie_kpi_1m_spark.operators.skew import (
        observed_salt,
        salted_join,
    )

    # one key holds ~83% of rows -> needs multiple reducers' worth
    skewed = spark.createDataFrame(
        [(1 if i < 500 else i % 7, i) for i in range(600)], "k int, payload int"
    )
    assert observed_salt(skewed, "k", sample_frac=1.0) > 1

    # uniform keys -> no salting (salt machinery fully skipped)
    uniform = spark.createDataFrame(
        [(i % 200, i) for i in range(600)], "k int, payload int"
    )
    assert observed_salt(uniform, "k", sample_frac=1.0) == 1
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(200)], "k int, name string"
    )
    auto = salted_join(uniform, small, "k", salt="auto")
    assert "__salt" not in auto.columns
    assert auto.count() == uniform.join(small, "k").count()


def test_salted_join_rejects_bad_string_salt(spark):
    import pytest

    from aie321_bigdata_movie_kpi_1m_spark.operators.skew import salted_join

    df = spark.createDataFrame([(1, 1)], "k int, v int")
    with pytest.raises(ValueError, match="salt"):
        salted_join(df, df, "k", salt="Auto")  # typo'd mode, not TypeError


def test_observed_salt_floors_tiny_samples(spark):
    """A sample below min_sample_rows is noise, not evidence of skew —
    resolve to a plain join even if the few sampled rows share a key."""
    from aie321_bigdata_movie_kpi_1m_spark.operators.skew import observed_salt

    tiny = spark.createDataFrame([(1, i) for i in range(40)], "k int, v int")
    assert observed_salt(tiny, "k", sample_frac=1.0) == 1
    # same data clears the floor when the floor is lowered -> salts
    assert observed_salt(tiny, "k", sample_frac=1.0, min_sample_rows=10) > 1


def test_observed_salt_reprobes_large_input_with_tiny_fraction(spark):
    """The sample floor must not scale as min_sample_rows/sample_frac: a
    tiny fraction of a LARGE skewed input re-probes at a bigger fraction
    instead of silently returning 1 (which would leave the hot key on one
    reducer with no warning)."""
    from aie321_bigdata_movie_kpi_1m_spark.operators.skew import observed_salt

    big_skewed = spark.createDataFrame(
        [(1 if i < 17_000 else i % 7, i) for i in range(20_000)],
        "k int, v int",
    )
    # frac=0.002 samples ~40 rows (< the 256 floor); input estimate says
    # "large", so one escalated probe runs and sees the 85%-hot key
    assert observed_salt(big_skewed, "k", sample_frac=0.002) > 1


def test_salted_groupby_equals_plain_groupby(spark):
    from aie321_bigdata_movie_kpi_1m_spark.operators.skew import salted_groupby

    # v carries nulls so count(v) vs count(*) semantics are exercised
    df = spark.createDataFrame(
        [
            (1 if i < 500 else i % 7, None if i % 5 == 0 else float(i), i)
            for i in range(600)
        ],
        "k int, v double, w long",
    )
    plain = {
        (r["k"], r["n_rows"], r["n_v"], r["total"], r["lo"], r["hi"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("v").alias("n_v"),
            F.sum("w").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    salted = {
        (r["k"], r["n_rows"], r["n_v"], r["total"], r["lo"], r["hi"])
        for r in salted_groupby(
            df,
            ["k"],
            {
                "n_rows": ("count", "*"),
                "n_v": ("count", "v"),
                "total": ("sum", "w"),
                "lo": ("min", "v"),
                "hi": ("max", "v"),
            },
            salt=8,
        ).collect()
    }
    assert salted == plain


def test_hyperplane_signature_jvm_and_vectorized_parity(spark):
    # the pandas-UDF matmul path and the JVM fold path must produce the
    # same bucket keys on the real testdata (docstring contract of
    # hyperplane_signatures_vec)
    from aie321_bigdata_movie_kpi_1m_spark.operators.similarity import (
        hyperplane_signature,
        hyperplane_signatures_vec,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sig_udf = hyperplane_signatures_vec(64, 8, 4)
    vec = F.col("embedding").cast("array<double>")
    mismatches = (
        emb.select(
            sig_udf(vec).alias("s"),
            *[hyperplane_signature(vec, 64, 8, t).alias(f"j{t}") for t in range(4)],
        )
        .filter(
            ~(
                (F.col("s")[0] == F.col("j0"))
                & (F.col("s")[1] == F.col("j1"))
                & (F.col("s")[2] == F.col("j2"))
                & (F.col("s")[3] == F.col("j3"))
            )
        )
        .count()
    )
    assert mismatches == 0


def test_connected_components_chain_triangle_singles(spark):
    from aie321_bigdata_movie_kpi_1m_spark.operators.graph import connected_components

    # chain 1-2-3-4, triangle 10-11-12 (+redundant edge), isolated pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (21, 20)],
        "i long, j long",
    )
    got = {
        (r["node"], r["cluster_id"]) for r in connected_components(edges).collect()
    }
    expect = {(1, 1), (2, 1), (3, 1), (4, 1),
              (10, 10), (11, 10), (12, 10),
              (20, 20), (21, 20)}
    assert got == expect


def test_connected_components_star_matches_min_label(spark):
    import random

    from aie321_bigdata_movie_kpi_1m_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    random.seed(7)
    raw = [
        (random.randrange(300), random.randrange(300)) for _ in range(250)
    ]
    edges = spark.createDataFrame(
        [e for e in raw if e[0] != e[1]], "i long, j long"
    )
    a = {
        (r["node"], r["cluster_id"])
        for r in connected_components(edges).collect()
    }
    b = {
        (r["node"], r["cluster_id"])
        for r in connected_components_star(edges).collect()
    }
    assert a == b


def test_connected_components_string_ids_and_self_loops(spark):
    """Two contracts that numeric-only test data can't see: (1) string
    node ids — the convergence signal must be type-agnostic (a plain sum
    of labels is only sound for integral ids); (2) self-loop-only nodes
    — the star contraction drops a != b edges, so (n, n) nodes must still
    come back as singleton clusters, matching min-label."""
    from aie321_bigdata_movie_kpi_1m_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    # numeric-string ids where +1/-1 label moves could cancel in a sum
    sedges = spark.createDataFrame(
        [("9", "10"), ("10", "21"), ("20", "21"), ("7", "7")],
        "i string, j string",
    )
    expect = {("10", "10"), ("9", "10"), ("21", "10"), ("20", "10"),
              ("7", "7")}
    got_min = {
        (r["node"], r["cluster_id"])
        for r in connected_components(sedges).collect()
    }
    got_star = {
        (r["node"], r["cluster_id"])
        for r in connected_components_star(sedges).collect()
    }
    assert got_min == expect
    assert got_star == expect

    # long ids: self-loop-only node alongside a normal component
    ledges = spark.createDataFrame([(5, 5), (1, 2)], "i long, j long")
    for fn in (connected_components, connected_components_star):
        assert {
            (r["node"], r["cluster_id"]) for r in fn(ledges).collect()
        } == {(5, 5), (1, 1), (2, 1)}


def test_pagerank_empty_edges_returns_empty(spark):
    from aie321_bigdata_movie_kpi_1m_spark.operators.graph import pagerank_fixed

    empty = spark.createDataFrame([], "src long, dst long, w double")
    out = pagerank_fixed(empty)
    assert out.columns == ["node", "rank"]
    assert out.count() == 0


def test_connected_components_star_deep_chain_few_rounds(spark):
    from aie321_bigdata_movie_kpi_1m_spark.operators.graph import (
        connected_components_star,
    )

    # a 300-node path has diameter 299 — min-label would need ~300 rounds;
    # star contraction must collapse it within its default O(log^2 n) cap
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(299)], "i long, j long"
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(chain).collect()
    }
    assert got == {n: 0 for n in range(300)}


def test_pack_sequences_greedy_fill_and_straddle(spark):
    from aie321_bigdata_movie_kpi_1m_spark.operators.packing import (
        bin_fill_stats,
        pack_sequences,
    )

    # one shard (n_shards=1), budget 5: docs of 3/3/6/2 tokens ->
    # cum-before 0,3,6,12 -> bins 0,0,1,2 (the 6-token doc starts in bin 1
    # and straddles into 2 — assignment is by its start position)
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "d e f"), (2, "g h i j k l"), (3, "m n")],
        "doc_id long, text string",
    )
    packed = {
        r["doc_id"]: (r["shard"], r["bin_id"], r["n_tokens"])
        for r in pack_sequences(docs, budget=5, n_shards=1).collect()
    }
    assert packed == {0: (0, 0, 3), 1: (0, 0, 3), 2: (0, 1, 6), 3: (0, 2, 2)}
    fills = {
        (r["shard"], r["bin_id"]): (r["n_docs"], r["bin_tokens"])
        for r in bin_fill_stats(
            pack_sequences(docs, budget=5, n_shards=1), budget=5
        ).collect()
    }
    assert fills == {(0, 0): (2, 6), (0, 1): (1, 6), (0, 2): (1, 2)}


def test_repetition_stats_flags_repetitive_docs(spark):
    from aie321_bigdata_movie_kpi_1m_spark.operators.text_analysis import (
        repetition_stats,
    )

    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam spam"),       # one repeated bigram
            (1, "all words here are fully distinct"),   # clean
            (2, "Same line. Same line. Same line."),    # repeated sentences
            (3, ""),                                    # empty -> all zeros
        ],
        "doc_id long, text string",
    )
    r = {x["doc_id"]: x for x in repetition_stats(docs).collect()}
    assert r[0]["is_repetitive"] and r[0]["dup_bigram_ratio"] == 0.8
    assert not r[1]["is_repetitive"] and r[1]["dup_bigram_ratio"] == 0.0
    assert r[2]["is_repetitive"] and r[2]["n_sentences"] == 3
    assert r[2]["n_distinct_sentences"] == 1
    assert r[3]["dup_sentence_ratio"] == 0.0 and not r[3]["is_repetitive"]


def test_quantize_embeddings_reconstruction_error(spark):
    import numpy as np

    from aie321_bigdata_movie_kpi_1m_spark.operators.similarity import (
        quantize_embeddings,
    )

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in quantize_embeddings(emb).collect()}
    for vid, v in rows:
        r = out[vid]
        scale = max(abs(x) for x in v) / 127.0
        # codes are half-up rounded -> reconstruction within scale/2 per dim
        assert -127 <= r["q_min"] <= r["q_max"] <= 127
        recon = [q * scale for q in r["q"]]
        assert max(abs(a - b) for a, b in zip(recon, v)) <= scale / 2 + 1e-12


def test_quantize_embeddings_zero_vector_survives(spark):
    """An all-zero vector has max|x| = 0: the scale pins to 1.0 and the
    codes are all zero — without the guard, ANSI mode fails the whole
    job on floor(0/0.0)'s NaN→long cast (padding vectors and dead
    embeddings are routine in real corpora)."""
    from aie321_bigdata_movie_kpi_1m_spark.operators.similarity import (
        quantize_embeddings,
    )

    emb = spark.createDataFrame(
        [(0, [0.0] * 8), (1, [1.0, -2.0] + [0.0] * 6)],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(emb).collect()}
    assert out[0]["q"] == [0] * 8 and out[0]["q_sum"] == 0
    assert out[0]["scale_r6"] == 1.0
    assert out[1]["q_min"] == -127  # normal vectors unaffected


def test_connected_components_raises_instead_of_wrong_labels(spark):
    import pytest

    from aie321_bigdata_movie_kpi_1m_spark.operators.graph import connected_components

    # a 12-node path graph needs ~11 propagation rounds: with max_iters=3
    # the operator must refuse to return unconverged (silently wrong)
    # labels; with enough rounds the whole chain collapses to label 0
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "i long, j long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=3)
    ok = {r["node"]: r["cluster_id"] for r in connected_components(chain, max_iters=15).collect()}
    assert ok == {n: 0 for n in range(12)}


class TestContiguousIds:
    def test_ids_are_dense_and_order_correct(self, spark):
        from aie321_bigdata_movie_kpi_1m_spark.operators.ids import (
            assign_contiguous_ids,
        )

        df = spark.createDataFrame(
            [(i, f"g{i % 3}") for i in range(101)], "k long, g string"
        )
        out = assign_contiguous_ids(df, ["g", "k"], num_partitions=7).collect()
        assert sorted(r["stable_id"] for r in out) == list(range(101))
        by_rank = sorted(out, key=lambda r: r["stable_id"])
        keys = [(r["g"], r["k"]) for r in by_rank]
        assert keys == sorted(keys)

    def test_ids_stable_across_runs_and_partition_counts(self, spark):
        from aie321_bigdata_movie_kpi_1m_spark.operators.ids import (
            assign_contiguous_ids,
        )

        df = spark.createDataFrame(
            [(i * 17 % 97, i) for i in range(97)], "k long, tiebreak long"
        )
        a = {
            (r["k"], r["tiebreak"]): r["stable_id"]
            for r in assign_contiguous_ids(
                df, ["k", "tiebreak"], num_partitions=5
            ).collect()
        }
        b = {
            (r["k"], r["tiebreak"]): r["stable_id"]
            for r in assign_contiguous_ids(
                df, ["k", "tiebreak"], num_partitions=11
            ).collect()
        }
        assert a == b


def test_encoding_profile_detects_mojibake_and_control_chars(spark):
    from aie321_bigdata_movie_kpi_1m_spark.operators.text_analysis import (
        encoding_profile,
    )

    rows = [
        (0, "clean ascii text."),
        (1, "lossy decode here: ��"),
        (2, "cafÃ© double-encoded"),       # 'Ã©' = UTF-8 é read as Latin-1
        (3, "curly â€™quoteâ€™ mojibake"),
        (4, "bell\x07 and\x01 control chars"),
        (5, None),
        (6, "plain café (real accent, not mojibake)"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = {x["doc_id"]: x for x in encoding_profile(docs).collect()}
    assert not r[0]["is_encoding_suspect"] and r[0]["n_nonascii"] == 0
    assert r[1]["n_replacement"] == 2 and r[1]["is_encoding_suspect"]
    assert r[2]["n_mojibake_marks"] == 1 and r[2]["is_encoding_suspect"]
    assert r[3]["n_mojibake_marks"] == 2 and r[3]["is_encoding_suspect"]
    assert r[4]["n_control"] == 2 and r[4]["is_encoding_suspect"]
    assert r[5]["n_chars"] == 0 and not r[5]["is_encoding_suspect"]
    # a real accented char is non-ASCII but NOT suspect
    assert r[6]["n_nonascii"] == 1 and not r[6]["is_encoding_suspect"]


def test_pagerank_fixed_closed_form(spark):
    from aie321_bigdata_movie_kpi_1m_spark.operators.graph import pagerank_fixed

    # 3-cycle: the uniform vector is the exact fixed point, every
    # iterate stays 1/3 bit-exactly (all constants dyadic with d=7/8)
    cyc = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 5), (3, 1, 5)], "src long, dst long, w long"
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank_fixed(cyc, damping=0.875, iters=3).collect()
    }
    third = 1.0 / 3
    assert got == {1: 0.125 / 3 + 0.875 * third, 2: got[1], 3: got[1]}

    # single edge a->b: a gets only the teleport term after round 1 and
    # b's inflow decays geometrically — exact dyadic arithmetic
    edge = spark.createDataFrame([(10, 20, 1)], "src long, dst long, w long")
    got2 = {
        r["node"]: r["rank"]
        for r in pagerank_fixed(edge, damping=0.875, iters=2).collect()
    }
    # r1 = (0.0625, 0.0625 + 0.875*0.5); r2 = (0.0625, 0.0625 + 0.875*0.0625)
    assert got2 == {10: 0.0625, 20: 0.0625 + 0.875 * 0.0625}

    # weights steer the split: 1->2 (w=3), 1->3 (w=1) sends 3/4 vs 1/4
    wgt = spark.createDataFrame(
        [(1, 2, 3), (1, 3, 1)], "src long, dst long, w long"
    )
    got3 = {
        r["node"]: r["rank"]
        for r in pagerank_fixed(wgt, damping=0.875, iters=1).collect()
    }
    base = 0.125 / 3
    third = 1.0 / 3
    assert got3[2] == base + 0.875 * (third * 0.75)
    assert got3[3] == base + 0.875 * (third * 0.25)
    assert got3[1] == base


def test_zorder_value_interleaves_bits(spark):
    from aie321_bigdata_movie_kpi_1m_spark.operators.layout import zorder_value

    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
    # Morton layout: x bit k -> position 2k, y bit k -> position 2k+1
    # x=101, y=011 -> z = x0<<0 | y0<<1 | x1<<2 | y1<<3 | x2<<4 | y2<<5
    #               = 1 | 2 | 0 | 8 | 16 | 0 = 27
    row = df.select(zorder_value(["x", "y"], bits=3).alias("z")).collect()[0]
    assert row["z"] == 27


def test_zorder_layout_narrows_both_dimensions(spark):
    """The point of z-ordering: per-file min/max ranges stay narrow on
    EVERY participating column, where a single-column sort leaves the
    other column's per-file range at full width (no skipping)."""
    from pyspark.sql import functions as F

    from aie321_bigdata_movie_kpi_1m_spark.operators.layout import zorder_layout

    n = 64
    grid = spark.createDataFrame(
        [(i, j) for i in range(n) for j in range(n)], "a long, b long"
    )
    laid = zorder_layout(grid, ["a", "b"], bits=6, n_files=16)
    z_stats = (
        laid.groupBy("__file_id")
        .agg(
            (F.max("a") - F.min("a")).alias("ra"),
            (F.max("b") - F.min("b")).alias("rb"),
        )
        .agg(F.avg("ra").alias("ra"), F.avg("rb").alias("rb"))
        .collect()[0]
    )
    # 16 files over a 64x64 grid -> 4x4 quad-tree cells of 16x16: both
    # ranges ~15.  A sort on `a` alone gives ra ~3 but rb = 63 (full).
    assert z_stats["ra"] < 20 and z_stats["rb"] < 20

    # every row lands in exactly one of the 16 files, none lost
    assert laid.count() == n * n
    assert laid.select("__file_id").distinct().count() == 16


def test_zorder_normalize_edge_cases(spark):
    import pytest

    from aie321_bigdata_movie_kpi_1m_spark.operators.layout import (
        normalize_to_bits,
        zorder_layout,
        zorder_value,
    )

    # degenerate span (constant column): everything maps to 0, no div/0
    const = spark.createDataFrame([(5, i) for i in range(10)], "a long, b long")
    laid = zorder_layout(const, ["a", "b"], bits=4, n_files=4)
    assert laid.count() == 10
    assert laid.select("__file_id").distinct().count() >= 1

    # out-of-range normalized values clamp to [0, 2^bits)
    df = spark.createDataFrame([(0,), (100,)], "x long")
    got = df.select(
        normalize_to_bits(F.col("x"), 10, 20, bits=4).alias("n")
    ).collect()
    assert {r["n"] for r in got} == {0, 15}

    # key-width guard: 5 cols x 16 bits would exceed a signed long
    with pytest.raises(ValueError, match="64-bit"):
        zorder_value(["a", "b", "c", "d", "e"], bits=16)

    # n_files must be a power of two (top-bits binning)
    with pytest.raises(ValueError, match="power of two"):
        zorder_layout(const, ["a", "b"], bits=4, n_files=6)


def test_reduce_wide_key_preserves_order_beyond_double_precision(spark):
    """xxhash64-style keys exceed 2^53; reduced keys must stay exact in
    double arithmetic while preserving the unsigned key order."""
    import pytest

    from aie321_bigdata_movie_kpi_1m_spark.operators.layout import reduce_wide_key

    # adjacent wide keys differing only below double precision, plus a
    # negative key (top unsigned bit set -> sorts last unsigned)
    keys = [(1 << 62) + 7, (1 << 62) + 9, (1 << 61), -1, 0]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["r"]
        for r in df.select("k", reduce_wide_key(F.col("k")).alias("r")).collect()
    }
    # all reduced values fit in 53 bits (exact as doubles)
    assert all(0 <= v < (1 << 53) for v in got.values())
    # unsigned order preserved (ties allowed where keys differ only in
    # the discarded low bits — the two adjacent keys collapse together)
    unsigned = sorted(keys, key=lambda k: k % (1 << 64))
    reduced = [got[k] for k in unsigned]
    assert reduced == sorted(reduced)
    assert got[(1 << 61)] < got[(1 << 62) + 7] <= got[(1 << 62) + 9]
    assert got[-1] == max(got.values())

    with pytest.raises(ValueError, match="keep_bits"):
        df.select(reduce_wide_key(F.col("k"), keep_bits=63))


def test_token_runs_udtf_edge_cases(spark):
    """UDTF surface: null text emits nothing; empty string is one run of
    the empty token (split(' ') semantics, lockstep with the oracle);
    runs are maximal with 1-based starts."""
    from aie321_bigdata_movie_kpi_1m_spark.operators.text_analysis import (
        register_token_runs,
    )

    register_token_runs(spark)
    spark.createDataFrame(
        [(1, "a a a"), (2, None), (3, ""), (4, "x y y x")],
        "doc_id long, text string",
    ).createOrReplaceTempView("v_runs_docs")
    rows = {
        (r["doc_id"], r["run_start"], r["token"], r["run_len"])
        for r in spark.sql(
            "SELECT r.* FROM v_runs_docs d, LATERAL token_runs(d.doc_id, d.text) r"
        ).collect()
    }
    assert rows == {
        (1, 1, "a", 3),
        (3, 1, "", 1),
        (4, 1, "x", 1),
        (4, 2, "y", 2),
        (4, 4, "x", 1),
    }


def test_duplicate_spans_finds_shared_passages(spark):
    """Repeated-passage candidates: a boilerplate sentence shared by two
    otherwise-different docs must surface; sub-n-token docs contribute
    no windows; within-doc repeats alone don't cross the min_docs gate."""
    from aie321_bigdata_movie_kpi_1m_spark.operators.text_analysis import (
        duplicate_spans,
    )

    boiler = "this content is licensed under creative commons attribution four"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta gamma {boiler} delta"),
            (2, f"{boiler} epsilon zeta eta theta iota"),
            (3, "totally unrelated text that is short"),  # 6 tokens: no window
            (4, "rep rep rep rep rep rep rep rep rep"),  # within-doc repeats only
        ],
        "doc_id long, text string",
    )
    rows = {r["span"]: (r["n_docs"], r["n_total"], r["rep_doc"])
            for r in duplicate_spans(docs, n=8, min_docs=2).collect()}
    assert boiler.startswith(" ".join(boiler.split()[:8]))  # sanity
    # the full 10-token boilerplate yields 3 shared 8-gram windows
    shared = [s for s in rows if "licensed under" in s or "creative commons" in s]
    assert shared, rows
    for s in shared:
        assert rows[s][0] == 2 and rows[s][2] == 1
    # doc 4's self-repeated window appears once per start pos but in ONE doc
    assert not any(s.startswith("rep rep") for s in rows)


def test_pq_topk_recall_and_determinism(spark):
    import numpy as np

    from aie321_bigdata_movie_kpi_1m_spark.operators.similarity import (
        cosine_topk,
        pq_fit_codebooks,
        pq_topk,
    )

    # clustered corpus: codewords align to clusters, ADC separates them
    rng = np.random.default_rng(17)
    centers = rng.normal(size=(4, 32))
    rows = []
    vid = 0
    for c in centers:
        for _ in range(12):
            rows.append((vid, [float(x) for x in c + rng.normal(scale=0.05, size=32)]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") % 12 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    books = pq_fit_codebooks(emb, dims=32, m=4, n_codes=8, iters=1)
    assert len(books) == 4 and all(b.shape == (8, 8) for b in books)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    kw = dict(k=5, dims=32, m=4, n_codes=8, n_candidates=15, codebooks=books)
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(emb, queries, **kw).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"PQ recall too low on clustered data: {recall}"
    again = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(emb, queries, **kw).collect()
    }
    assert approx == again

    import pytest

    with pytest.raises(ValueError, match="divisible"):
        pq_fit_codebooks(emb, dims=32, m=5)
    with pytest.raises(ValueError, match="divisible"):
        pq_topk(emb, queries, dims=32, m=5, codebooks=books)

    # external queries: ids NOT in the corpus (the normal search case) —
    # rerank must score against the query's own vector, not a corpus
    # lookup by id (which would silently return 0 rows or, on an id
    # collision, score the wrong vector)
    ext = emb.filter(F.col("vec_id") % 12 == 0).select(
        (F.col("vec_id") + 10_000).alias("query_id"), "embedding"
    )
    ext_hits = pq_topk(emb, ext, **kw).collect()
    assert len(ext_hits) == 4 * 5
    ext_pairs = {(r["query_id"] - 10_000, r["neighbor_id"]) for r in ext_hits}
    # external ids can't self-exclude, so the query's own corpus twin is a
    # legitimate (cos=1) hit; apart from that the neighbor sets must match
    # the in-corpus run's
    own = {p for p in ext_pairs if p[0] == p[1]}
    assert len(own) == 4  # each query finds its identical corpus vector
    assert ext_pairs - own <= approx


def test_simhash_neardup_pairs_equals_bruteforce(spark):
    """Pigeonhole banding is LOSSLESS for hamming <= bands-1: the banded
    pair search must return exactly the brute-force all-pairs answer."""
    from itertools import combinations

    from aie321_bigdata_movie_kpi_1m_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_neardup_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(i, base) for i in range(3)]  # exact dups: hamming 0
    rows += [(3, base + " today"), (4, base + " tonight quietly")]
    rows += [(5, "completely different text about spark shuffle exchange")]
    rows += [(6, "another unrelated document on parquet footer statistics")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r["i"], r["j"], r["hamming"])
        for r in simhash_neardup_pairs(docs, max_hamming=3).collect()
    }
    sig = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(docs).collect()
    }
    brute = {
        (i, j, bin(sig[i] ^ sig[j]).count("1"))
        for i, j in combinations(sorted(sig), 2)
        if bin(sig[i] ^ sig[j]).count("1") <= 3
    }
    assert got == brute and any(h == 0 for _, _, h in got)

    # blocking-validity guards
    import pytest

    with pytest.raises(ValueError, match="lossless"):
        simhash_neardup_pairs(docs, bands=4, max_hamming=4)
    with pytest.raises(ValueError, match="divisible"):
        simhash_neardup_pairs(docs, bits=60, bands=7)


class TestIntervalOverlapJoin:
    def _naive(self, spark, l, r):
        from pyspark.sql import functions as F

        return l.join(
            r,
            (F.col("l_s") <= F.col("r_e")) & (F.col("r_s") <= F.col("l_e")),
        )

    def test_matches_naive_predicate_join(self, spark):
        """Bin-decomposed overlap join == the naive quadratic predicate
        join, pair-for-pair (exactly once each), on a randomized-ish
        deterministic interval set spanning many bins."""
        from pyspark.sql import functions as F

        from aie321_bigdata_movie_kpi_1m_spark.operators.intervals import (
            interval_overlap_join,
        )

        # deterministic pseudo-random intervals: starts scattered over
        # [0, 10000), spans 0..600 (several 128-wide bins), incl. point
        # intervals (span 0) and bin-boundary-aligned ones
        base = spark.range(0, 300).select(
            F.col("id").alias("lid"),
            (F.pmod(F.col("id") * 2654435761, F.lit(10000))).alias("l_s"),
        )
        l = base.withColumn(
            "l_e", F.col("l_s") + F.pmod(F.col("lid") * 40503, F.lit(601))
        )
        r = (
            spark.range(0, 300)
            .select(
                F.col("id").alias("rid"),
                (F.pmod(F.col("id") * 97 + 31, F.lit(10000))).alias("r_s"),
            )
            .withColumn(
                "r_e", F.col("r_s") + F.pmod(F.col("rid") * 7919, F.lit(601))
            )
        )
        got = interval_overlap_join(
            l, r, "l_s", "l_e", "r_s", "r_e", bin_width=128
        )
        want = self._naive(spark, l, r)
        gp = {(x["lid"], x["rid"]) for x in got.select("lid", "rid").collect()}
        wp = [(x["lid"], x["rid"]) for x in want.select("lid", "rid").collect()]
        assert gp == set(wp)
        assert got.count() == len(wp)  # exactly-once: no bin duplicates
        assert len(wp) > 1000  # the fixture genuinely overlaps a lot

    def test_null_and_inverted_intervals_match_nothing(self, spark):
        from aie321_bigdata_movie_kpi_1m_spark.operators.intervals import (
            interval_overlap_join,
        )

        l = spark.createDataFrame(
            [(1, 0, 10), (2, None, 10), (3, 5, None), (4, 9, 3)],
            "lid long, l_s long, l_e long",
        )
        r = spark.createDataFrame([(1, 0, 100)], "rid long, r_s long, r_e long")
        got = interval_overlap_join(
            l, r, "l_s", "l_e", "r_s", "r_e", bin_width=16
        )
        assert [x["lid"] for x in got.collect()] == [1]

    def test_keys_and_name_collision_guard(self, spark):
        import pytest

        from aie321_bigdata_movie_kpi_1m_spark.operators.intervals import (
            interval_overlap_join,
        )

        l = spark.createDataFrame(
            [("a", 0, 10), ("b", 0, 10)], "tenant string, l_s long, l_e long"
        )
        r = spark.createDataFrame(
            [("a", 5, 15), ("b", 50, 60)], "tenant string, r_s long, r_e long"
        )
        got = interval_overlap_join(
            l, r, "l_s", "l_e", "r_s", "r_e", bin_width=8, keys=["tenant"]
        )
        # tenant a overlaps; tenant b does not (and cross-tenant never joins)
        assert [x["tenant"] for x in got.collect()] == ["a"]
        with pytest.raises(ValueError, match="share non-key"):
            interval_overlap_join(
                l, r.withColumnRenamed("r_s", "l_s"), "l_s", "l_e", "l_s",
                "r_e", bin_width=8,
            )

    def test_plan_has_no_nested_loop(self, spark):
        from pyspark.sql import functions as F

        from aie321_bigdata_movie_kpi_1m_spark.operators.intervals import (
            interval_overlap_join,
        )

        l = spark.range(100).select(
            F.col("id").alias("l_s"), (F.col("id") + 5).alias("l_e")
        )
        r = spark.range(100).select(
            F.col("id").alias("r_s"), (F.col("id") + 5).alias("r_e")
        )
        plan = (
            interval_overlap_join(l, r, "l_s", "l_e", "r_s", "r_e", bin_width=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestTriangles:
    def test_matches_brute_force_with_noise(self, spark):
        """Degree-oriented triangle enumeration == brute force over all
        3-subsets, on a deterministic G(40, 0.2) graph fed with reversed
        duplicates and a self-loop; each triangle appears exactly once."""
        from itertools import combinations
        import random

        from pyspark.sql import functions as F

        from aie321_bigdata_movie_kpi_1m_spark.operators.graph import triangles

        random.seed(7)
        edges = [
            (a, b) for a, b in combinations(range(40), 2)
            if random.random() < 0.2
        ]
        es = {frozenset(e) for e in edges}
        want = {
            frozenset((a, b, c))
            for a, b, c in combinations(range(40), 3)
            if {frozenset((a, b)), frozenset((b, c)), frozenset((a, c))} <= es
        }
        df = spark.createDataFrame(edges, "i long, j long")
        noisy = df.union(
            df.select(F.col("j").alias("i"), F.col("i").alias("j"))
        ).union(spark.createDataFrame([(5, 5)], "i long, j long"))
        rows = triangles(noisy).collect()
        got = [frozenset((r["a"], r["b"], r["c"])) for r in rows]
        assert set(got) == want
        assert len(got) == len(want)  # exactly once each

    def test_star_graph_has_no_triangles_and_bounded_wedges(self, spark):
        """A hub-and-spoke graph (the 'celebrity vertex' that kills the
        naive plan): zero triangles, and orientation points every edge
        AT the hub, so no wedge is ever built from the hub's fan-out."""
        from pyspark.sql import functions as F

        from aie321_bigdata_movie_kpi_1m_spark.operators.graph import triangles

        star = spark.range(1, 200).select(
            F.lit(0).alias("i"), F.col("id").alias("j")
        )
        assert triangles(star).count() == 0

    def test_triangle_with_tie_degrees(self, spark):
        from aie321_bigdata_movie_kpi_1m_spark.operators.graph import triangles

        tri = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3)], "i long, j long"
        )
        rows = triangles(tri).collect()
        assert len(rows) == 1
        assert {rows[0]["a"], rows[0]["b"], rows[0]["c"]} == {1, 2, 3}


class TestTokenIndexMaintenance:
    """The inverted-index GROUP (plans/token_index.py) under base-table
    deletes (round-8 verdict item 2): a deleted doc disappears from
    every index read at the next version with NO rebuild — the refresh
    folds the docs layer's keyed change feed in as equality-deletes
    (zero driver key hops, counter-pinned) plus O(changed-docs)
    appends."""

    def _docs(self, spark):
        rows = [
            (1, "spark join window spark"),
            (2, "spark window"),
            (3, "join join join window"),
            (4, "quiet unrelated words here"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    @pytest.mark.slow

    def test_delete_maintenance_is_o_delta_and_driver_free(
        self, spark, tmp_path
    ):
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs_layer = str(tmp_path / "docs")
        group = str(tmp_path / "token_index")
        v1 = snap.commit_snapshot(
            spark, self._docs(spark), docs_layer, change_feed=True
        )
        # tiny target: deltas are a few tokens, and the pruning the
        # default-asserted searches pin needs multiple files per delta
        ti.build_token_index(
            spark,
            snap.read_snapshot(spark, docs_layer),
            group,
            splits=2,
            target_rows_per_file=2,
        )
        terms = ["spark", "window"]
        before = {
            r["doc_id"]: r["score"]
            for r in ti.indexed_keyword_search(spark, group, terms).collect()
        }
        assert before == {1: 3, 2: 2}  # docs 1 and 2 match both terms

        # snapshot the O(delta) pins: posting file set + driver-key
        # counter before the maintenance cycle
        post_path = f"{group}/{ti.POSTINGS}"
        files_before = set(snap.snapshot_files(spark, post_path))
        driver_keys_before = snap._EQ_DELETE_DRIVER_KEYS["n"]

        # base-table DELETE by key (the CDC shape), then refresh the
        # index from the keyed change feed
        keys = spark.createDataFrame([(1,)], "doc_id long")
        v2 = snap.delete_snapshot_keys(spark, docs_layer, "doc_id", keys)[
            "version"
        ]
        changes = snap.snapshot_changes_keyed(
            spark, docs_layer, v1, v2, ["doc_id"], include_values=True
        )
        rep = ti.refresh_token_index(spark, group, changes)
        assert rep["removed_docs"] is True

        # the deleted doc is GONE from the index reads, no rebuild
        after = {
            r["doc_id"]: r["score"]
            for r in ti.indexed_keyword_search(spark, group, terms).collect()
        }
        assert after == {2: 2}
        bm25 = ti.indexed_bm25_topk(spark, group, terms).collect()
        assert 1 not in {r["doc_id"] for r in bm25}

        # O(delta) pin 1: every pre-existing posting file survives
        # untouched (merge-on-read equality delete — no rewrite)
        files_after = set(snap.snapshot_files(spark, post_path))
        assert files_before <= files_after
        # O(delta) pin 2: zero delete keys moved through the driver
        # (DataFrame-native equality-delete path)
        assert snap._EQ_DELETE_DRIVER_KEYS["n"] == driver_keys_before
        # corpus stats ledger went signed-delta: n_docs down by 1,
        # total tokens down by doc 1's 4 tokens
        stats = ti.corpus_stats(spark, group).first()
        assert stats["n_docs"] == 3
        assert stats["total_tokens"] == 2 + 4 + 4

    @pytest.mark.slow

    def test_update_and_insert_maintenance(self, spark, tmp_path):
        """Updates re-point a doc's postings to its new text (old rows
        equality-deleted, new rows appended AFTER the delete, so
        no-resurrect semantics keep them live); inserts just append."""
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs_layer = str(tmp_path / "docs")
        group = str(tmp_path / "token_index")
        v1 = snap.commit_snapshot(
            spark, self._docs(spark), docs_layer, change_feed=True
        )
        ti.build_token_index(
            spark,
            snap.read_snapshot(spark, docs_layer),
            group,
            splits=1,
            target_rows_per_file=2,
        )
        # doc 2 rewritten to drop 'window'; doc 9 inserted matching both
        merged = spark.createDataFrame(
            [(2, "spark spark spark"), (9, "window spark")],
            "doc_id long, text string",
        )
        snap.merge_snapshot(spark, merged, docs_layer, "doc_id")
        v2 = snap.snapshot_versions(spark, docs_layer)[-1]
        changes = snap.snapshot_changes_keyed(
            spark, docs_layer, v1, v2, ["doc_id"], include_values=True
        )
        ti.refresh_token_index(spark, group, changes)
        got = {
            r["doc_id"]: r["score"]
            for r in ti.indexed_keyword_search(
                spark, group, ["spark", "window"]
            ).collect()
        }
        # doc 2 no longer matches 'window'; doc 9 now matches both
        assert got == {1: 3, 9: 2}
        stats = ti.corpus_stats(spark, group).first()
        assert stats["n_docs"] == 5  # 4 originals + 1 insert
        assert stats["total_tokens"] == 4 + 3 + 4 + 4 + 2


class TestPersistedAnnModel:
    """ANN model state as a versioned snapshot layer (round-8 verdict
    item 3): fit once, commit, reuse from disk in any later session;
    ann_recall_eval's comparison becomes the rebuild gate."""

    def _emb(self, spark):
        return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def test_save_load_roundtrip_and_versioning(self, spark, tmp_path):
        import numpy as np

        from aie321_bigdata_movie_kpi_1m_spark.plans.vectors import (
            load_ann_model,
            save_ann_model,
        )

        layer = str(tmp_path / "model")
        m1 = {0: np.arange(12, dtype=np.float64).reshape(3, 4)}
        v1 = save_ann_model(spark, layer, m1, {"kind": "ivf", "iters": 1})
        # PQ-shaped: one part per subspace codebook
        m2 = {
            0: np.ones((2, 2), dtype=np.float64),
            1: np.full((2, 2), 7.0),
        }
        v2 = save_ann_model(spark, layer, m2, {"kind": "pq", "m": 2})
        assert (v1, v2) == (1, 2)
        mats, meta = load_ann_model(spark, layer)  # head = v2
        assert meta["kind"] == "pq"
        assert sorted(mats) == [0, 1]
        assert np.array_equal(mats[1], m2[1])
        # time travel to the v1 model
        mats1, meta1 = load_ann_model(spark, layer, 1)
        assert meta1["kind"] == "ivf"
        assert np.array_equal(mats1[0], m1[0])

    def test_fit_once_reuse_many(self, spark, tmp_path):
        import numpy as np

        from aie321_bigdata_movie_kpi_1m_spark.plans import vectors

        layer = str(tmp_path / "ivf")
        emb = self._emb(spark)
        n0 = vectors._ANN_FIT_RUNS["ivf"]
        c1 = vectors.persisted_ivf_centroids(
            spark, emb, layer, n_centroids=8, iters=1
        )
        assert vectors._ANN_FIT_RUNS["ivf"] == n0 + 1  # fit ran once
        # second resolution (any later session: state is ON DISK) loads
        c2 = vectors.persisted_ivf_centroids(
            spark, emb, layer, n_centroids=8, iters=1
        )
        assert vectors._ANN_FIT_RUNS["ivf"] == n0 + 1  # no refit
        assert np.array_equal(c1, c2)

    def test_rebuild_gate(self, spark, tmp_path):
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from aie321_bigdata_movie_kpi_1m_spark.plans import vectors

        layer = str(tmp_path / "ivf")
        emb = self._emb(spark)
        # passing gate: fit+commit v1 (bootstrap), measure, NO rebuild
        rep = vectors.ivf_rebuild_gate(
            spark, emb, layer, min_recall=0.0, n_centroids=8
        )
        assert rep["rebuilt"] is False
        assert rep["model_version"] == 1
        assert 0.0 <= rep["recall"] <= 1.0
        # unreachable threshold forces the degraded-recall branch: the
        # gate refits and commits the NEXT model version
        rep2 = vectors.ivf_rebuild_gate(
            spark, emb, layer, min_recall=1.01, n_centroids=8
        )
        assert rep2["rebuilt"] is True
        assert rep2["model_version"] == 2
        assert snap.snapshot_versions(spark, layer) == [1, 2]


def test_persisted_pq_codebooks_fit_once(spark, tmp_path):
    """PQ twin of the persisted-model contract: codebooks load from the
    layer on every later resolution (no refit), one part per subspace."""
    import numpy as np

    from aie321_bigdata_movie_kpi_1m_spark.plans import vectors

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    layer = str(tmp_path / "pq")
    n0 = vectors._ANN_FIT_RUNS["pq"]
    b1 = vectors.persisted_pq_codebooks(spark, emb, layer, m=4, n_codes=8)
    assert vectors._ANN_FIT_RUNS["pq"] == n0 + 1
    b2 = vectors.persisted_pq_codebooks(spark, emb, layer, m=4, n_codes=8)
    assert vectors._ANN_FIT_RUNS["pq"] == n0 + 1  # reused from disk
    assert len(b1) == len(b2) == 4
    for a, b in zip(b1, b2):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_token_index_counts_empty_docs_in_corpus_stats(spark, tmp_path):
    """BM25 convention pin: n_docs counts ALL docs (the raw-text
    oracle's COUNT(*) FROM documents), so a token-less doc must get a
    dl=0 doclen row and a ledger slot — deriving doclen from the
    postings would silently drop it and skew idf/avgdl."""
    from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

    docs = spark.createDataFrame(
        [(1, "spark window"), (2, None), (3, "   "), (4, "spark")],
        "doc_id long, text string",
    )
    group = str(tmp_path / "ti")
    ti.build_token_index(spark, docs, group, splits=1)
    stats = ti.corpus_stats(spark, group).first()
    assert stats["n_docs"] == 4  # incl. the NULL and whitespace-only docs
    assert stats["total_tokens"] == 3
    from aie321_bigdata_movie_kpi_1m_spark.sources.snapshots import (
        read_snapshot,
    )

    dl = {
        r["doc_id"]: r["dl"]
        for r in read_snapshot(spark, f"{group}/{ti.DOCLEN}").collect()
    }
    assert dl == {1: 2, 2: 0, 3: 0, 4: 1}


class TestIndexedPhraseSearch:
    """Positional postings + exact phrase adjacency semantics."""

    def _group(self, spark, tmp_path, rows):
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs = spark.createDataFrame(rows, "doc_id long, text string")
        group = str(tmp_path / "ti")
        ti.build_token_index(spark, docs, group, splits=1)
        return group

    def test_adjacency_overlap_and_duplicate_terms(self, spark, tmp_path):
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        group = self._group(
            spark,
            tmp_path,
            [(1, "a b a b a"), (2, "b a"), (3, "a a a")],
        )
        got = {
            r["doc_id"]: r["n_matches"]
            for r in ti.indexed_phrase_search(
                spark, group, ["a", "b"], assert_pruned=False
            ).collect()
        }
        assert got == {1: 2}  # positions (0,2); (4,5) out of range; doc2 reversed
        # duplicate terms: overlapping occurrences all count
        got = {
            r["doc_id"]: r["n_matches"]
            for r in ti.indexed_phrase_search(
                spark, group, ["a", "a"], assert_pruned=False
            ).collect()
        }
        assert got == {3: 2}
        # 3-term phrase through the same join chain
        got = {
            r["doc_id"]: r["n_matches"]
            for r in ti.indexed_phrase_search(
                spark, group, ["a", "b", "a"], assert_pruned=False
            ).collect()
        }
        assert got == {1: 2}
        import pytest

        with pytest.raises(ValueError, match="two tokens"):
            ti.indexed_phrase_search(spark, group, ["a"])

    @pytest.mark.slow

    def test_phrase_results_track_maintenance(self, spark, tmp_path):
        """An update through the change-feed refresh re-points the
        positions — phrase hits change with NO rebuild."""
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs_layer = str(tmp_path / "docs")
        group = str(tmp_path / "ti")
        v1 = snap.commit_snapshot(
            spark,
            spark.createDataFrame(
                [(1, "x y z"), (2, "z x")], "doc_id long, text string"
            ),
            docs_layer,
            change_feed=True,
        )
        ti.build_token_index(
            spark, snap.read_snapshot(spark, docs_layer), group, splits=1
        )
        hit = lambda: {  # noqa: E731
            r["doc_id"]: r["n_matches"]
            for r in ti.indexed_phrase_search(
                spark, group, ["x", "y"], assert_pruned=False
            ).collect()
        }
        assert hit() == {1: 1}
        snap.merge_snapshot(
            spark,
            spark.createDataFrame(
                [(1, "y x"), (2, "x y x y")], "doc_id long, text string"
            ),
            docs_layer,
            "doc_id",
        )
        v2 = snap.snapshot_versions(spark, docs_layer)[-1]
        ti.refresh_token_index(
            spark,
            group,
            snap.snapshot_changes_keyed(
                spark, docs_layer, v1, v2, ["doc_id"], include_values=True
            ),
        )
        assert hit() == {2: 2}  # doc1 reversed out, doc2 now matches twice


def test_token_index_readers_never_see_torn_state(spark, tmp_path):
    """The group's three layers commit sequentially, so mid-cycle a
    reader could pair new postings with the old ledger — unless reads
    resolve through the published PIN SET (one catalog version pinning
    all three layer versions, swapped atomically at cycle end)."""
    import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
    from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

    docs = spark.createDataFrame(
        [(1, "spark window"), (2, "spark")], "doc_id long, text string"
    )
    group = str(tmp_path / "ti")
    ti.build_token_index(spark, docs, group, splits=1)
    before = {
        r["doc_id"]: r["score"]
        for r in ti.indexed_keyword_search(
            spark, group, ["spark"], assert_pruned=False
        ).collect()
    }
    stats_before = ti.corpus_stats(spark, group).first()

    # simulate MID-CYCLE state: postings advanced, ledger NOT (a crash
    # or a concurrent refresh between its layer commits)
    extra = spark.createDataFrame([(9, "spark spark")], "doc_id long, text string")
    snap.commit_snapshot(
        spark,
        ti.postings_of(extra),
        f"{group}/{ti.POSTINGS}",
        mode="append",
        stats_cols=["token", "doc_id"],
        bloom_col="token",
    )
    # pinned readers still serve the LAST PUBLISHED consistent cycle
    after = {
        r["doc_id"]: r["score"]
        for r in ti.indexed_keyword_search(
            spark, group, ["spark"], assert_pruned=False
        ).collect()
    }
    assert after == before
    assert ti.corpus_stats(spark, group).first() == stats_before
    # completing the cycle (ledger/doclen append + pin swap) exposes it
    snap.commit_snapshot(
        spark,
        extra.selectExpr("doc_id", "CAST(2 AS LONG) AS dl"),
        f"{group}/{ti.DOCLEN}",
        mode="append",
        stats_cols=["doc_id"],
    )
    snap.commit_snapshot(
        spark,
        spark.createDataFrame([(1, 2)], "n_docs long, total_tokens long"),
        f"{group}/{ti.STATS}",
        mode="append",
    )
    ti.publish_index_pins(spark, group)
    got = {
        r["doc_id"]: r["score"]
        for r in ti.indexed_keyword_search(
            spark, group, ["spark"], assert_pruned=False
        ).collect()
    }
    assert got == {9: 2, 1: 1, 2: 1}
    assert ti.corpus_stats(spark, group).first()["n_docs"] == 3


@pytest.mark.slow


def test_maintain_token_index_folds_deletes_and_repins(spark, tmp_path):
    """The index lifecycle loop: refreshes leave small files + live
    equality-delete entries; maintenance compacts where the advisor
    says to (folding the deletes), publishes a fresh pin set, and
    search results are unchanged."""
    import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
    from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

    docs_layer = str(tmp_path / "docs")
    group = str(tmp_path / "ti")
    rows = [(i, f"spark token{i % 3} window") for i in range(12)]
    v = snap.commit_snapshot(
        spark,
        spark.createDataFrame(rows, "doc_id long, text string"),
        docs_layer,
        change_feed=True,
    )
    ti.build_token_index(
        spark, snap.read_snapshot(spark, docs_layer), group, splits=4
    )
    # several delete cycles: small ledger/posting appends + live DVs
    for batch in ([0, 1], [2, 3]):
        keys = spark.createDataFrame([(k,) for k in batch], "doc_id long")
        v2 = snap.delete_snapshot_keys(spark, docs_layer, "doc_id", keys)[
            "version"
        ]
        ti.refresh_token_index(
            spark,
            group,
            snap.snapshot_changes_keyed(
                spark, docs_layer, v, v2, ["doc_id"], include_values=True
            ),
        )
        v = v2
    search = lambda: {  # noqa: E731
        r["doc_id"]: r["score"]
        for r in ti.indexed_keyword_search(
            spark, group, ["spark", "window"], assert_pruned=False
        ).collect()
    }
    before = search()
    assert set(before) == set(range(4, 12))
    post_path = f"{group}/{ti.POSTINGS}"
    m = snap._manifest_raw(
        spark, post_path, snap.snapshot_versions(spark, post_path)[-1]
    )
    assert m.get("delete_files")  # live merge-on-read tax
    taken = ti.maintain_token_index(spark, group, target_rows_per_file=1000)
    assert "compacted" in taken[ti.POSTINGS]
    # the signed-delta ledger (4 build appends + 2 refresh cycles of
    # rows) netted into one row, stats unchanged
    assert taken.get(ti.STATS) == ["ledger_netted"]
    stats_path = f"{group}/{ti.STATS}"
    assert (
        snap.read_snapshot(spark, stats_path).count() == 1
    )
    assert ti.corpus_stats(spark, group).first()["n_docs"] == 8
    # deletes folded: the maintained head carries no delete entries
    m2 = snap._manifest_raw(
        spark, post_path, snap.snapshot_versions(spark, post_path)[-1]
    )
    assert not m2.get("delete_files")
    # pins advanced to the maintained version; results unchanged
    assert ti.index_pins(spark, group)[ti.POSTINGS] == snap.snapshot_versions(
        spark, post_path
    )[-1]
    assert search() == before
    # the re-planned advisor has nothing left to say about postings
    plan = {
        r["action"]
        for r in snap.snapshot_maintenance_plan(
            spark, post_path, target_rows_per_file=1000
        ).collect()
        if r["action"] != "vacuum"  # superseded originals, expected
    }
    assert "fold_deletes" not in plan


def test_pruned_postings_zero_hit_term_is_legitimate(spark, tmp_path):
    """A probe term no file can hold plans ZERO scans — the strongest
    pruning, not an assertion failure; the searches then return empty
    instead of crashing (r9 self-review)."""
    from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

    docs = spark.createDataFrame(
        [(i, f"tok{i} common") for i in range(40)],
        "doc_id long, text string",
    )
    group = str(tmp_path / "ti")
    ti.build_token_index(spark, docs, group, splits=2)
    assert (
        ti.pruned_postings(spark, group, ["zzz_not_a_token"]).count() == 0
    )
    assert (
        ti.indexed_keyword_search(spark, group, ["zzz_not_a_token"]).count()
        == 0
    )


class TestTokenIndexRound10:
    """Round-10 verdict/advice items on the index group: pmod splits,
    rows-scaled delta sizing, proximity search, bloom-preserving
    maintenance, the bucketed doclen mirror, and the refresh-vs-
    maintenance pin race."""

    def test_negative_doc_ids_land_in_a_split(self, spark, tmp_path):
        """ADVICE r9: Spark's % keeps the dividend's sign, so a
        negative odd doc_id matched no `% splits == i` arm and silently
        vanished from postings/doclen/stats; pmod fixes it."""
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs = spark.createDataFrame(
            [(-3, "neg odd doc"), (-2, "neg even"), (1, "pos"), (0, "zero")],
            "doc_id long, text string",
        )
        group = str(tmp_path / "ti")
        ti.build_token_index(spark, docs, group, splits=2)
        stats = ti.corpus_stats(spark, group).first()
        assert stats["n_docs"] == 4  # incl. BOTH negative ids
        assert stats["total_tokens"] == 3 + 2 + 1 + 1
        from aie321_bigdata_movie_kpi_1m_spark.sources.snapshots import (
            read_snapshot,
        )

        dl = {
            r["doc_id"]: r["dl"]
            for r in read_snapshot(spark, f"{group}/{ti.DOCLEN}").collect()
        }
        assert dl == {-3: 3, -2: 2, 1: 1, 0: 1}

    @pytest.mark.slow

    def test_delta_partitioning_scales_with_rows(self, spark, tmp_path):
        """r9 verdict item 2: the postings delta writes
        ceil(delta tokens / target) files — a micro-batch lands ONE
        file, a backfill proportionally many, never a fixed 8."""
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti
        from aie321_bigdata_movie_kpi_1m_spark.sources.snapshots import (
            snapshot_files,
            snapshot_versions,
        )

        group = str(tmp_path / "ti")
        # tiny bootstrap at the PRODUCTION default target: one file
        tiny = spark.createDataFrame(
            [(1, "a b c"), (2, "d e")], "doc_id long, text string"
        )
        ti.build_token_index(spark, tiny, group, splits=1)
        post = f"{group}/{ti.POSTINGS}"
        assert len(snapshot_files(spark, post)) == 1
        # big synthetic delta at a small target: ceil(1000 tokens / 100)
        big = spark.range(100, 200).selectExpr(
            "id AS doc_id",
            "concat_ws(' ', transform(sequence(1, 10), "
            "x -> concat('tok', (id * 10 + x) % 97))) AS text",
        )
        v_before = snapshot_versions(spark, post)[-1]
        ti._commit_delta(
            spark, group, big, first=False, target_rows_per_file=100
        )
        v_after = snapshot_versions(spark, post)[-1]
        delta_files = set(snapshot_files(spark, post, v_after)) - set(
            snapshot_files(spark, post, v_before)
        )
        assert len(delta_files) == 10  # ceil(100 docs * 10 tokens / 100)

    def test_proximity_search_window_semantics(self, spark, tmp_path):
        """r9 verdict item 6: terms-within-k through the positional
        index — n_matches counts anchor positions of the FIRST term
        with every other term within |slop| positions."""
        import pytest

        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs = spark.createDataFrame(
            [
                (1, "a x b"),        # |b - a| = 2
                (2, "a x x x b"),    # |b - a| = 4
                (3, "b x a"),        # reversed, distance 2 (symmetric)
                (4, "a c a c"),      # anchors 0 and 2 both within 1 of a c
                (5, "a only here"),  # missing second term
            ],
            "doc_id long, text string",
        )
        group = str(tmp_path / "ti")
        ti.build_token_index(
            spark, docs, group, splits=1, target_rows_per_file=2
        )
        prox = lambda terms, slop: {  # noqa: E731
            r["doc_id"]: r["n_matches"]
            for r in ti.indexed_proximity_search(
                spark, group, terms, slop=slop, assert_pruned=False
            ).collect()
        }
        assert prox(["a", "b"], 2) == {1: 1, 3: 1}
        assert prox(["a", "b"], 4) == {1: 1, 2: 1, 3: 1}
        assert prox(["a", "c"], 1) == {4: 2}
        # three terms: all must fall within slop of the anchor
        docs3 = prox(["a", "x", "b"], 2)
        assert docs3 == {1: 1, 3: 1}
        with pytest.raises(ValueError, match="two tokens"):
            ti.indexed_proximity_search(spark, group, ["a"], slop=2)
        with pytest.raises(ValueError, match="slop"):
            ti.indexed_proximity_search(spark, group, ["a", "b"], slop=0)

    def test_proximity_ordered_semantics(self, spark, tmp_path):
        """r10 verdict item 6: ordered sloppy phrase — anchor on term 0,
        monotone chain q_1 < q_2 < … with q_i ∈ (q_{i−1}, p + slop + i];
        pinned against symmetric-window disagreement cases and 3-term
        chains."""
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs = spark.createDataFrame(
            [
                (1, "a b c"),        # adjacent chain
                (2, "a x b c"),      # displaced chain (b trails by 2)
                (3, "b x a c"),      # b BEFORE the anchor
                (4, "a c b"),        # tail out of order
                (5, "a b c a b c"),  # two valid anchors
                (6, "c b a"),        # fully reversed
            ],
            "doc_id long, text string",
        )
        group = str(tmp_path / "ti")
        ti.build_token_index(
            spark, docs, group, splits=1, target_rows_per_file=4
        )

        def prox(terms, slop, ordered):
            return {
                r["doc_id"]: r["n_matches"]
                for r in ti.indexed_proximity_search(
                    spark,
                    group,
                    terms,
                    slop=slop,
                    ordered=ordered,
                    assert_pruned=False,
                ).collect()
            }

        # 3-term ordered chains: monotone only
        assert prox(["a", "b", "c"], 1, True) == {1: 1, 2: 1, 5: 2}
        # disagreement: symmetric admits the reversed doc 3, ordered
        # never does (b precedes the anchor)
        assert 3 in prox(["a", "b", "c"], 2, False)
        assert 3 not in prox(["a", "b", "c"], 2, True)
        # out-of-order tail: symmetric yes (both within slop), ordered no
        sym = prox(["a", "b", "c"], 2, False)
        orda = prox(["a", "b", "c"], 2, True)
        assert 4 in sym and 4 not in orda
        assert 6 in sym and 6 not in orda
        # slop=0 ordered IS the exact phrase
        phrase = {
            r["doc_id"]: r["n_matches"]
            for r in ti.indexed_phrase_search(
                spark, group, ["a", "b", "c"], assert_pruned=False
            ).collect()
        }
        assert prox(["a", "b", "c"], 0, True) == phrase == {1: 1, 5: 2}
        # ordered admits slop=0; symmetric still requires >= 1
        import pytest

        with pytest.raises(ValueError, match="slop"):
            ti.indexed_proximity_search(
                spark, group, ["a", "b"], slop=-1, ordered=True
            )

    @pytest.mark.slow

    def test_maintenance_compaction_keeps_bloom_skipping(
        self, spark, tmp_path
    ):
        """r9 verdict item 1 (index level): after maintenance packs the
        postings layer, a term probe still bloom-skips — including a
        mid-range ABSENT token that min/max stats alone cannot drop."""
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs = spark.createDataFrame(
            [(i, f"tok{i:03d} common filler") for i in range(60)],
            "doc_id long, text string",
        )
        group = str(tmp_path / "ti")
        ti.build_token_index(
            spark, docs, group, splits=2, target_rows_per_file=20
        )
        post = f"{group}/{ti.POSTINGS}"
        before = {
            r["doc_id"]: r["score"]
            for r in ti.indexed_keyword_search(
                spark, group, ["tok007", "common"]
            ).collect()
        }
        # the maintenance cycle's packer, byte-tuned so the toy layer
        # still packs into several files
        snap.compact_small_files(
            spark,
            path=post,
            target_file_bytes=4096,
            stats_cols=["token", "doc_id"],
        )
        ti.publish_index_pins(spark, group)
        pins = ti.index_pins(spark, group)
        all_files = snap.snapshot_files(spark, post, pins[ti.POSTINGS])
        assert len(all_files) >= 2
        kept = snap.snapshot_files(
            spark, post, pins[ti.POSTINGS], prune_point=("token", "tok007")
        )
        assert 0 < len(kept) < len(all_files)  # still a strict subset
        # mid-range absent token: every packed file's [min, max] covers
        # it, ONLY the regenerated blooms can prove it absent
        ghost = snap.snapshot_files(
            spark, post, pins[ti.POSTINGS], prune_point=("token", "tok0075x")
        )
        assert len(ghost) == 0
        after = {
            r["doc_id"]: r["score"]
            for r in ti.indexed_keyword_search(
                spark, group, ["tok007", "common"]
            ).collect()
        }
        assert after == before

    @pytest.mark.slow

    def test_doclen_mirror_serves_and_falls_back(self, spark, tmp_path):
        """r9 verdict item 3: BM25's doclen side reads from the
        doc_id-bucketed mirror when it matches the pinned version and
        falls back to the snapshot read (same results) when a refresh
        has moved the layer on; maintenance re-syncs the mirror."""
        import json
        import os

        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs_layer = str(tmp_path / "docs")
        group = str(tmp_path / "ti")
        v1 = snap.commit_snapshot(
            spark,
            spark.createDataFrame(
                [(i, f"spark data pipeline term{i % 5}") for i in range(20)],
                "doc_id long, text string",
            ),
            docs_layer,
            change_feed=True,
        )
        ti.build_token_index(
            spark,
            snap.read_snapshot(spark, docs_layer),
            group,
            splits=2,
            target_rows_per_file=10,
        )
        mpath = f"{group}/doclen_bucketed/MIRROR.json"
        assert os.path.exists(mpath)
        rec = json.loads(open(mpath).read())
        pins = ti.index_pins(spark, group)
        assert rec["doclen_version"] == pins[ti.DOCLEN]
        # mirror-served relation IS the bucketed table
        dl = ti._doclen_df(spark, group, pins)
        assert "FileScan" in dl._jdf.queryExecution().executedPlan().toString()
        fresh = ti.indexed_bm25_topk(spark, group, ["spark", "data"]).collect()
        # a refresh moves doclen past the mirror -> fallback path, same
        # numbers recomputed over the surviving corpus
        keys = spark.createDataFrame([(0,), (1,)], "doc_id long")
        v2 = snap.delete_snapshot_keys(spark, docs_layer, "doc_id", keys)[
            "version"
        ]
        ti.refresh_token_index(
            spark,
            group,
            snap.snapshot_changes_keyed(
                spark, docs_layer, v1, v2, ["doc_id"], include_values=True
            ),
        )
        pins2 = ti.index_pins(spark, group)
        assert pins2[ti.DOCLEN] != rec["doclen_version"]  # mirror stale
        stale_rows = ti.indexed_bm25_topk(
            spark, group, ["spark", "data"]
        ).collect()
        assert {r["doc_id"] for r in stale_rows} == {
            r["doc_id"] for r in fresh
        } - {0, 1}
        # maintenance re-syncs the mirror to the new pinned version
        taken = ti.maintain_token_index(spark, group, target_rows_per_file=5)
        assert "mirror_refreshed" in taken[ti.DOCLEN]
        rec2 = json.loads(open(mpath).read())
        assert rec2["doclen_version"] == ti.index_pins(spark, group)[ti.DOCLEN]
        # superseded mirror dirs are GC'd with ONE-CYCLE GRACE (r10
        # verdict item 3): the immediately-superseded dir survives this
        # cycle (a reader that resolved the old manifest mid-swap keeps
        # its files), everything older is reclaimed
        vdirs = {
            d
            for d in os.listdir(f"{group}/doclen_bucketed")
            if d.startswith("v")
        }
        assert vdirs == {
            f"v{rec['doclen_version']}",
            f"v{rec2['doclen_version']}",
        }
        # maintenance packed the toy layer into one file — pruning is
        # moot there, the mirror-vs-fallback parity is what's pinned
        resynced = ti.indexed_bm25_topk(
            spark, group, ["spark", "data"], assert_pruned=False
        ).collect()
        assert [
            (r["doc_id"], r["bm25_r4"]) for r in resynced
        ] == [(r["doc_id"], r["bm25_r4"]) for r in stale_rows]

    @pytest.mark.slow

    def test_doclen_mirror_gc_grace_period(self, spark, tmp_path):
        """r10 verdict item 3, the injected interleaving: a reader
        resolves the OLD mirror, maintenance re-syncs mid-"scan", and
        the old reader's read still completes (its dir survives one
        cycle); the cycle after that reclaims the N-2 dir."""
        import os

        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs_layer = str(tmp_path / "docs")
        group = str(tmp_path / "ti")
        v = snap.commit_snapshot(
            spark,
            spark.createDataFrame(
                [(i, f"alpha beta w{i % 4}") for i in range(16)],
                "doc_id long, text string",
            ),
            docs_layer,
            change_feed=True,
        )
        ti.build_token_index(
            spark,
            snap.read_snapshot(spark, docs_layer),
            group,
            splits=1,
            target_rows_per_file=8,
        )
        mdir = f"{group}/doclen_bucketed"

        def _vdirs():
            return {d for d in os.listdir(mdir) if d.startswith("v")}

        def _churn(keys):
            nonlocal v
            v2 = snap.delete_snapshot_keys(
                spark,
                docs_layer,
                "doc_id",
                spark.createDataFrame([(k,) for k in keys], "doc_id long"),
            )["version"]
            ti.refresh_token_index(
                spark,
                group,
                snap.snapshot_changes_keyed(
                    spark, docs_layer, v, v2, ["doc_id"], include_values=True
                ),
            )
            v = v2

        pins_a = ti.index_pins(spark, group)
        va = pins_a[ti.DOCLEN]
        # the old reader: resolves the CURRENT mirror, scan deferred
        old_reader = ti._doclen_df(spark, group, pins_a)
        _churn([0, 1])
        ti.maintain_token_index(spark, group, target_rows_per_file=8)
        pins_b = ti.index_pins(spark, group)
        vb = pins_b[ti.DOCLEN]
        assert vb != va
        # grace: the superseded dir survives the swap, so the old
        # reader's scan completes against its resolved files
        assert _vdirs() == {f"v{va}", f"v{vb}"}
        got = {r["doc_id"]: r["dl"] for r in old_reader.collect()}
        assert got == {i: 3 for i in range(16)}  # pre-delete corpus
        # next cycle: N-2 (va) is reclaimed, vb kept one more cycle
        _churn([2, 3])
        ti.maintain_token_index(spark, group, target_rows_per_file=8)
        vc = ti.index_pins(spark, group)[ti.DOCLEN]
        assert _vdirs() == {f"v{vb}", f"v{vc}"}

    @pytest.mark.slow

    def test_auto_maintenance_governor_fires_and_pins_consistent(
        self, spark
    ):
        """r10 verdict item 8: the foreachBatch governor sweeps the pin
        catalog every N batches and executes warranted maintenance
        mid-stream; the final pin set satisfies the race-test
        invariant (ledger == doclen recompute, postings ⊆ doclen)."""
        from pyspark.sql import functions as F

        from aie321_bigdata_movie_kpi_1m_spark.plans import textops
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti
        from aie321_bigdata_movie_kpi_1m_spark.sources.snapshots import (
            read_snapshot,
        )

        group, stats = textops._auto_maint_index(
            spark, "/root/testdata/sf0.001"
        )
        assert stats["batches"] >= 6
        assert stats["sweeps"] >= 2
        assert stats["maintenance_runs"] >= 1
        assert stats["actions"] >= 1
        pins = ti.index_pins(spark, group)
        st = ti.corpus_stats(spark, group, pins=pins).first()
        dl = read_snapshot(spark, f"{group}/{ti.DOCLEN}", pins[ti.DOCLEN])
        agg = dl.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("t"),
        ).first()
        assert (st["n_docs"], st["total_tokens"]) == (agg["n"], agg["t"])
        post_docs = {
            r["doc_id"]
            for r in read_snapshot(
                spark, f"{group}/{ti.POSTINGS}", pins[ti.POSTINGS]
            )
            .select("doc_id")
            .distinct()
            .collect()
        }
        dl_docs = {r["doc_id"] for r in dl.select("doc_id").collect()}
        assert post_docs <= dl_docs
        # and the churn is fully applied: no deleted residue survives,
        # every mirrored insert is indexed
        assert not any(
            d % 9 in (1, 3, 5) for d in dl_docs if d < 1000000
        )
        assert any(d >= 1000000 for d in dl_docs)

    @pytest.mark.slow

    def test_shared_governor_closes_loop_on_ann_stream(self, spark):
        """r11 verdict item 4: ALL THREE tiers share one governor
        implementation (plans.maintenance.auto_maintenance_hook) and
        the vector stream — previously the only tier without a
        mid-stream governor — now runs it: stats counters pin that the
        advisor swept and warranted maintenance executed MID-STREAM,
        and the stream-built assignment layer holds exactly the
        surviving vectors afterwards (lossless compaction)."""
        from pyspark.sql import functions as F

        from aie321_bigdata_movie_kpi_1m_spark.plans import (
            token_index as ti,
        )
        from aie321_bigdata_movie_kpi_1m_spark.plans import (
            maintenance,
            textops,
            vectors as vx,
        )
        from aie321_bigdata_movie_kpi_1m_spark.sources.snapshots import (
            read_snapshot,
        )

        group = vx._stream_ann_group(spark, "/root/testdata/sf0.001")
        stats = vx._STREAM_ANN_STATS
        assert stats["batches"] >= 1
        assert stats["sweeps"] >= 1
        assert stats["maintenance_runs"] >= 1
        assert stats["actions"] >= 1
        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        surv = {
            r["vec_id"]
            for r in emb.filter(F.col("vec_id") % 7 != 3)
            .select("vec_id")
            .collect()
        }
        got = {
            r["vec_id"]
            for r in read_snapshot(spark, f"{group}/assign")
            .select("vec_id")
            .collect()
        }
        assert got == surv
        # one shared implementation: the token-tier hook is a binding
        # of the tier-agnostic governor, and the neardup stream passes
        # it its maintainer too
        import inspect

        assert "maintenance.auto_maintenance_hook" in inspect.getsource(
            ti.auto_maintenance_hook
        ) or "from .maintenance import" in inspect.getsource(
            ti.auto_maintenance_hook
        )
        assert "auto_maintenance_hook" in inspect.getsource(
            textops._stream_neardup_group
        )
        assert callable(maintenance.auto_maintenance_hook)

    def test_lexicon_build_is_window_free(self, spark):
        """r10 verdict item 1: the lexicon delta's top-K + watermark
        compile to distributed TakeOrderedAndProject — NO Window node
        funnels the (possibly corpus-sized bootstrap) delta vocabulary
        through one task."""
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs = spark.createDataFrame(
            [(i, " ".join(f"t{(i * 7 + j) % 97}" for j in range(10)))
             for i in range(200)],
            "doc_id long, text string",
        )
        lex = ti._lexicon_delta(ti.postings_of(docs))
        plan = lex._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "TakeOrderedAndProject" in plan

    @pytest.mark.slow

    def test_refresh_vs_maintenance_race_pins_never_torn(
        self, spark, tmp_path, monkeypatch
    ):
        """r9 verdict item 5: a refresh landing INSIDE a maintenance
        cycle — both commits land, and EVERY published pin set is
        internally consistent (ledger totals == doclen recompute,
        postings doc_ids ⊆ doclen doc_ids at the same pins)."""
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        import aie321_bigdata_movie_kpi_1m_spark.sources.table_catalog as tc
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti
        from pyspark.sql import functions as F

        docs_layer = str(tmp_path / "docs")
        group = str(tmp_path / "ti")
        v = snap.commit_snapshot(
            spark,
            spark.createDataFrame(
                [(i, f"alpha beta w{i % 4}") for i in range(16)],
                "doc_id long, text string",
            ),
            docs_layer,
            change_feed=True,
        )

        def refresh_batch(v_from, keys):
            kdf = spark.createDataFrame([(k,) for k in keys], "doc_id long")
            v_to = snap.delete_snapshot_keys(
                spark, docs_layer, "doc_id", kdf
            )["version"]
            ti.refresh_token_index(
                spark,
                group,
                snap.snapshot_changes_keyed(
                    spark, docs_layer, v_from, v_to,
                    ["doc_id"], include_values=True,
                ),
            )
            return v_to

        ti.build_token_index(
            spark,
            snap.read_snapshot(spark, docs_layer),
            group,
            splits=4,
            target_rows_per_file=8,
        )
        v = refresh_batch(v, [0, 1])  # leaves small files + live DVs

        # inject the race: the FIRST compaction inside the maintenance
        # cycle is preceded by a concurrent refresh landing new layer
        # versions + its own pin publish
        real_compact = snap.compact_small_files
        state = {"fired": False, "v": v}

        def racing_compact(spark_, path, **kw):
            if not state["fired"]:
                state["fired"] = True
                state["v"] = refresh_batch(state["v"], [2, 3])
            return real_compact(spark_, path, **kw)

        monkeypatch.setattr(snap, "compact_small_files", racing_compact)
        taken = ti.maintain_token_index(spark, group, target_rows_per_file=8)
        assert state["fired"] and "compacted" in taken[ti.POSTINGS]

        # both landed: the final search reflects BOTH delete batches
        got = {
            r["doc_id"]: r["score"]
            for r in ti.indexed_keyword_search(
                spark, group, ["alpha", "beta"], assert_pruned=False
            ).collect()
        }
        assert set(got) == set(range(4, 16))

        # EVERY published pin set is internally consistent
        for cat_v in tc.catalog_versions(spark, group):
            pins = {
                t: int(p["version"])
                for t, p in tc.catalog_tables(spark, group, cat_v).items()
            }
            dl = snap.read_snapshot(
                spark, f"{group}/{ti.DOCLEN}", pins[ti.DOCLEN]
            )
            ledger = ti.corpus_stats(spark, group, pins=pins).first()
            recomputed = dl.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum("dl"), F.lit(0)).alias("t"),
            ).first()
            assert ledger["n_docs"] == recomputed["n"]
            assert ledger["total_tokens"] == recomputed["t"]
            post_docs = {
                r["doc_id"]
                for r in snap.read_snapshot(
                    spark, f"{group}/{ti.POSTINGS}", pins[ti.POSTINGS]
                )
                .select("doc_id")
                .distinct()
                .collect()
            }
            dl_docs = {r["doc_id"] for r in dl.select("doc_id").collect()}
            assert post_docs <= dl_docs


class TestAnnCdfAssignments:
    """r9 verdict item 4: the assignment layer is the vector twin of
    the token index — corpus churn folds in O(changed vectors) from the
    keyed change feed, results change, and the persisted fit is NEVER
    re-run (the rebuild gate alone owns re-fits)."""

    def test_refresh_changes_results_without_refit(self, spark, tmp_path):
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from aie321_bigdata_movie_kpi_1m_spark.plans import vectors as vx
        from pyspark.sql import functions as F

        emb_layer = str(tmp_path / "emb")
        group = str(tmp_path / "ann")
        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", "embedding")
        v1 = snap.commit_snapshot(
            spark, emb, emb_layer, stats_cols=["vec_id"], change_feed=True
        )
        vx.build_ann_assignments(
            spark, snap.read_snapshot(spark, emb_layer), group
        )
        assign_path = f"{group}/assign"
        fit_runs_before = dict(vx._ANN_FIT_RUNS)
        files_before = set(snap.snapshot_files(spark, assign_path))
        before = {
            r["cell"]: r["n"]
            for r in snap.read_snapshot(spark, assign_path)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

        # CDC: delete a residue class, insert mirrored vectors
        snap.delete_snapshot_keys(
            spark,
            emb_layer,
            "vec_id",
            emb.filter(F.col("vec_id") % 5 == 2).select("vec_id"),
        )
        snap.commit_snapshot(
            spark,
            emb.filter(F.col("vec_id") % 9 == 4).select(
                (F.col("vec_id") + 500000).alias("vec_id"),
                F.transform("embedding", lambda x: -x).alias("embedding"),
            ),
            emb_layer,
            mode="append",
            stats_cols=["vec_id"],
        )
        v3 = snap.snapshot_versions(spark, emb_layer)[-1]
        rep = vx.refresh_ann_assignments(
            spark,
            group,
            snap.snapshot_changes_keyed(
                spark, emb_layer, v1, v3, ["vec_id"], include_values=True
            ),
        )
        assert rep["removed"] and rep["added"]

        # NO refit: the fit-run counter is pinned
        assert dict(vx._ANN_FIT_RUNS) == fit_runs_before
        # O(delta): every pre-existing assignment file survives
        # untouched (equality delete, no rewrite)
        assert files_before <= set(snap.snapshot_files(spark, assign_path))
        # results changed AND match a direct recompute over the layer's
        # surviving corpus with the SAME persisted model
        after = {
            r["cell"]: r["n"]
            for r in snap.read_snapshot(spark, assign_path)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert after != before
        mats, _ = vx.load_ann_model(spark, f"{group}/model")
        expect = {
            r["cell"]: r["n"]
            for r in vx._assign_cells(
                snap.read_snapshot(spark, emb_layer).select(
                    "vec_id", "embedding"
                ),
                mats[0],
            )
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert after == expect
        # and no deleted vec_id survives in the assignment layer
        assert (
            snap.read_snapshot(spark, assign_path)
            .filter((F.col("vec_id") % 5 == 2) & (F.col("vec_id") < 500000))
            .count()
            == 0
        )

    def test_ann_delta_partitioning_scales_with_rows(self, spark, tmp_path):
        """r10 verdict item 2 (the postings contract, mirrored): an
        assignment delta writes ceil(delta rows / target) files — a
        micro-batch lands ONE file, a backfill proportionally many,
        never a fixed 2."""
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from aie321_bigdata_movie_kpi_1m_spark.plans import vectors as vx
        from pyspark.sql import functions as F

        group = str(tmp_path / "ann")
        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", "embedding")
        vx.build_ann_assignments(spark, emb, group)
        assign_path = f"{group}/assign"
        # bootstrap at the production default target: one file
        assert len(snap.snapshot_files(spark, assign_path)) == 1

        def _delta(src, offset):
            return src.select(
                (F.col("vec_id") + offset).alias("vec_id"),
                F.lit("insert").alias("change_type"),
                F.lit(None)
                .cast("struct<embedding:array<float>>")
                .alias("before"),
                F.struct(F.col("embedding").alias("embedding")).alias(
                    "after"
                ),
            )

        # tiny delta (5 vectors) at a 100-row target: ONE file
        v0 = snap.snapshot_versions(spark, assign_path)[-1]
        vx.refresh_ann_assignments(
            spark,
            group,
            _delta(emb.filter(F.col("vec_id") < 5), 10_000),
            target_rows_per_file=100,
        )
        v1 = snap.snapshot_versions(spark, assign_path)[-1]
        tiny_files = set(snap.snapshot_files(spark, assign_path, v1)) - set(
            snap.snapshot_files(spark, assign_path, v0)
        )
        assert len(tiny_files) == 1
        # big delta (500 vectors) at the same target: ceil(500/100)
        vx.refresh_ann_assignments(
            spark, group, _delta(emb, 20_000), target_rows_per_file=100
        )
        v2 = snap.snapshot_versions(spark, assign_path)[-1]
        big_files = set(snap.snapshot_files(spark, assign_path, v2)) - set(
            snap.snapshot_files(spark, assign_path, v1)
        )
        assert len(big_files) == 5


class TestLexiconSideband:
    """r9 verdict item 8: probe-term derivation through the lexicon
    sideband — O(commits x K) ledger rows with a threshold-algorithm
    exactness bound, full-pass fallback when the bound can't prove the
    answer, complete negative rows keeping it exact under deletes, and
    completeness-preserving netting."""

    def _docs(self, spark, beta_per_split):
        # per split (doc parity): 'alpha' x20 (rank 1), five fillers x6
        # each, 'beta' x beta_per_split; fillers DIFFER across splits so
        # no filler can reach global rank 2
        rows = []
        did = 0
        for s in (0, 1):
            for tok, cnt in (
                [("alpha", 20), ("beta", beta_per_split)]
                + [(f"f{s}_{i}", 6) for i in range(5)]
            ):
                while did % 2 != s:
                    did += 1
                rows.append((did, " ".join([tok] * cnt)))
                did += 1
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_bound_proof_resolves_and_matches_full_pass(
        self, spark, tmp_path, monkeypatch
    ):
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        monkeypatch.setattr(ti, "_LEX_K", 4)
        group = str(tmp_path / "ti")
        # beta x15/split: inside every commit's top-4 -> exact total,
        # lb(beta)=30 beats every filler ub (6+6) and the unseen bound
        ti.build_token_index(spark, self._docs(spark, 15), group, splits=2)
        stats0 = dict(ti._LEX_PROBE_STATS)
        got = ti.top_terms(spark, group, 2)
        assert got == ["alpha", "beta"]
        assert ti._LEX_PROBE_STATS["resolved"] == stats0["resolved"] + 1
        assert ti._LEX_PROBE_STATS["fallbacks"] == stats0["fallbacks"]

    def test_unprovable_bound_falls_back_correctly(
        self, spark, tmp_path, monkeypatch
    ):
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        monkeypatch.setattr(ti, "_LEX_K", 4)
        group = str(tmp_path / "ti")
        # beta x5/split: EXCLUDED from every commit's top-4 (fillers x6
        # outrank it) yet globally rank 2 (10 > 6) — the sideband alone
        # cannot prove the answer; the fallback full pass must
        ti.build_token_index(spark, self._docs(spark, 5), group, splits=2)
        stats0 = dict(ti._LEX_PROBE_STATS)
        got = ti.top_terms(spark, group, 2)
        assert got == ["alpha", "beta"]
        assert ti._LEX_PROBE_STATS["fallbacks"] == stats0["fallbacks"] + 1

    @pytest.mark.slow

    def test_deletes_keep_sideband_exact(self, spark, tmp_path, monkeypatch):
        """Complete negative rows: deleting docs through the change-feed
        refresh re-ranks the lexicon exactly (a delete can DEMOTE the
        old #2 below a token the sideband fully knows)."""
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        monkeypatch.setattr(ti, "_LEX_K", 16)
        docs_layer = str(tmp_path / "docs")
        group = str(tmp_path / "ti")
        docs = self._docs(spark, 15)
        v1 = snap.commit_snapshot(spark, docs, docs_layer, change_feed=True)
        ti.build_token_index(
            spark, snap.read_snapshot(spark, docs_layer), group, splits=2
        )
        assert ti.top_terms(spark, group, 2) == ["alpha", "beta"]
        # delete every beta doc (text is 'beta beta ...')
        keys = docs.filter(F.col("text").startswith("beta")).select("doc_id")
        v2 = snap.delete_snapshot_keys(spark, docs_layer, "doc_id", keys)[
            "version"
        ]
        ti.refresh_token_index(
            spark,
            group,
            snap.snapshot_changes_keyed(
                spark, docs_layer, v1, v2, ["doc_id"], include_values=True
            ),
        )
        stats0 = dict(ti._LEX_PROBE_STATS)
        got = ti.top_terms(spark, group, 2)
        # beta netted to 0 by the complete negative rows; the new #2 is
        # the lexically-first filler at 6
        assert got == ["alpha", "f0_0"]
        assert ti._LEX_PROBE_STATS["resolved"] == stats0["resolved"] + 1

    @pytest.mark.slow

    def test_netting_merges_complete_commits_only(
        self, spark, tmp_path, monkeypatch
    ):
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        # K=2: the 6 pmod-splits hold 2-3 distinct tokens each, so
        # several commits overflow K and carry a wm > 0 (incomplete)
        monkeypatch.setattr(ti, "_LEX_K", 2)
        group = str(tmp_path / "ti")
        ti.build_token_index(spark, self._docs(spark, 15), group, splits=6)
        lex_path = f"{group}/{ti.LEXICON}"
        assert len(snap.snapshot_versions(spark, lex_path)) == 6
        before = ti.top_terms(spark, group, 2)
        taken = ti.maintain_token_index(spark, group, target_rows_per_file=50)
        assert taken.get(ti.LEXICON) == ["lexicon_netted"]
        lex = snap.read_snapshot(spark, lex_path).collect()
        # incomplete commits carried verbatim: their wm>0 rows survive;
        # netting never fakes exactness
        wms = [r["tf"] for r in lex if r["token"] is None]
        assert any(w > 0 for w in wms)
        assert ti.top_terms(spark, group, 2) == before


class TestAnnAssignTopk:
    """IVF search through the maintained assignment layer: per-query
    cell pruning (the scale contract) and bit-parity with the direct
    ivf_topk path on the same persisted quantizer."""

    def test_single_query_prunes_and_matches_direct_path(
        self, spark, tmp_path
    ):
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from aie321_bigdata_movie_kpi_1m_spark.operators import similarity
        from aie321_bigdata_movie_kpi_1m_spark.plans import vectors as vx
        from pyspark.sql import functions as F

        group = str(tmp_path / "ann")
        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", "embedding")
        vx.build_ann_assignments(
            spark, emb, group, target_rows_per_file=125
        )
        queries = emb.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        # assert_pruned=True raises unless the probed cells admit a
        # STRICT file subset — one query, n_probe=2 over 4 range-
        # clustered files (500 rows / 125 target) must prune
        got = sorted(
            (r["query_id"], r["neighbor_id"], r["cosine_sim"])
            for r in vx.ann_assign_topk(
                spark, group, queries, n_probe=2, assert_pruned=True
            ).collect()
        )
        mats, _ = vx.load_ann_model(spark, f"{group}/model")
        expect = sorted(
            (r["query_id"], r["neighbor_id"], r["cosine_sim"])
            for r in similarity.ivf_topk(
                emb, queries, k=10, n_centroids=16, n_probe=2,
                iters=1, centroids=mats[0],
            ).collect()
        )
        assert got == expect and len(got) == 10
        # the probed-cell read planned a strict file subset
        probe = similarity._nearest_centroids_udf(mats[0], 2)
        cells = [
            int(c)
            for c in queries.select(
                probe(similarity._as_double("embedding")).alias("cs")
            ).first()["cs"]
        ]
        path = f"{group}/assign"
        assert len(
            snap.snapshot_files(spark, path, prune_point=("cell", cells))
        ) < len(snap.snapshot_files(spark, path))

    def test_batch_knn_join_non_broadcast_path(self, spark, tmp_path):
        """The BATCH kNN-join shape: a table-scale query side with the
        broadcast hint OFF produces bit-identical results to the
        interactive broadcast path, and under autoBroadcastJoinThreshold
        =-1 the candidate ⋈ query pairing really is NOT a broadcast
        join (the plan a 10M-row shard needs — shipping the shard to
        every executor is the failure mode the flag exists to avoid)."""
        from pyspark.sql import functions as F

        from aie321_bigdata_movie_kpi_1m_spark.plans import vectors as vx

        group = str(tmp_path / "ann")
        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", "embedding")
        vx.build_ann_assignments(
            spark, emb, group, target_rows_per_file=125
        )
        shard = emb.filter(F.pmod(F.col("vec_id"), F.lit(5)) == 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )

        def run(broadcast):
            return sorted(
                (r["query_id"], r["neighbor_id"], r["cosine_sim"])
                for r in vx.ann_assign_topk(
                    spark,
                    group,
                    shard,
                    k=3,
                    n_probe=2,
                    assert_pruned=False,
                    broadcast_queries=broadcast,
                ).collect()
            )

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            batch_df = vx.ann_assign_topk(
                spark,
                group,
                shard,
                k=3,
                n_probe=2,
                assert_pruned=False,
                broadcast_queries=False,
            )
            plan = batch_df._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" not in plan
            batch = run(False)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert batch == run(True) and batch
        # the decontamination wrapper flags exactly the threshold
        # clearers: a negated shard against an un-churned corpus has no
        # mirrored twins, so nothing clears 0.9 (see below)
        self._check_decontaminate(spark, group, shard)

    @pytest.mark.slow

    def test_batch_adc_executor_side_no_driver_model_rows(
        self, spark, tmp_path
    ):
        """The COMPRESSED-tier batch shape (r13 verdict item #1):
        ann_ivfadc_batch_topk is bit-identical to the interactive
        ann_ivfadc_topk on BOTH code families, builds ZERO per-query
        ADC rows on the driver (counter pin — the interactive path
        increments it, the batch path must not), and pairs candidates
        with the query side WITHOUT a broadcast hint (under
        autoBroadcastJoinThreshold=-1 the cell join is a shuffle join;
        the only BroadcastHashJoin left is the k-row centroid relation
        of the residual family)."""
        from pyspark.sql import functions as F

        from aie321_bigdata_movie_kpi_1m_spark.operators.similarity import (
            _ADC_DRIVER_MODEL_ROWS,
        )
        from aie321_bigdata_movie_kpi_1m_spark.plans import vectors as vx

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", "embedding")
        shard = emb.filter(F.pmod(F.col("vec_id"), F.lit(5)) == 2).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        for by_residual, max_bhj in ((False, 0), (True, 1)):
            group = str(tmp_path / f"adc_{int(by_residual)}")
            vx.build_ann_ivfadc(
                spark,
                emb,
                group,
                by_residual=by_residual,
                target_rows_per_file=125,
            )
            inter = sorted(
                map(
                    tuple,
                    vx.ann_ivfadc_topk(
                        spark, group, shard, assert_pruned=False
                    ).collect(),
                )
            )
            n0 = _ADC_DRIVER_MODEL_ROWS["n"]
            assert n0 > 0  # the interactive path DID pay driver rows
            batch_df = vx.ann_ivfadc_batch_topk(spark, group, shard)
            old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                plan = (
                    vx.ann_ivfadc_batch_topk(spark, group, shard)
                    ._jdf.queryExecution()
                    .executedPlan()
                    .toString()
                )
                assert plan.count("BroadcastHashJoin") <= max_bhj
                assert "SortMergeJoin" in plan
            finally:
                spark.conf.set(
                    "spark.sql.autoBroadcastJoinThreshold", old
                )
            batch = sorted(map(tuple, batch_df.collect()))
            assert _ADC_DRIVER_MODEL_ROWS["n"] == n0  # ZERO driver rows
            assert batch == inter and batch

    def _check_decontaminate(self, spark, group, shard):
        from pyspark.sql import functions as F

        from aie321_bigdata_movie_kpi_1m_spark.plans import vectors as vx

        decon = vx.ann_semantic_decontaminate(
            spark,
            group,
            shard.select(
                "query_id",
                F.transform("embedding", lambda x: -x).alias("embedding"),
            ),
        ).collect()
        assert decon and all(not r["contaminated"] for r in decon)
        assert all(r["best_sim"] < 0.9 for r in decon)


@pytest.mark.slow


def test_maintain_ann_assignments_folds_and_keeps_blooms(spark, tmp_path):
    """The vector tier's maintenance loop: refresh churn leaves small
    files + live equality-delete entries; the cycle compacts, FOLDS the
    deletes (fold_deletes forces touched files in), regenerates cell
    blooms on the packed outputs, and search results are unchanged."""
    import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
    from aie321_bigdata_movie_kpi_1m_spark.plans import vectors as vx
    from pyspark.sql import functions as F

    emb_layer = str(tmp_path / "emb")
    group = str(tmp_path / "ann")
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    v = snap.commit_snapshot(
        spark, emb, emb_layer, stats_cols=["vec_id"], change_feed=True
    )
    vx.build_ann_assignments(spark, emb, group, target_rows_per_file=125)
    # two refresh cycles of delete churn -> live DVs + ledger appends
    for residue in (2, 4):
        keys = emb.filter(F.col("vec_id") % 9 == residue).select("vec_id")
        v2 = snap.delete_snapshot_keys(spark, emb_layer, "vec_id", keys)[
            "version"
        ]
        vx.refresh_ann_assignments(
            spark,
            group,
            snap.snapshot_changes_keyed(
                spark, emb_layer, v, v2, ["vec_id"], include_values=True
            ),
        )
        v = v2
    assign_path = f"{group}/assign"
    m = snap._manifest_raw(
        spark, assign_path, snap.snapshot_versions(spark, assign_path)[-1]
    )
    assert m.get("delete_files")  # merge-on-read tax live
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    before = sorted(
        (r["neighbor_id"], r["cosine_sim"])
        for r in vx.ann_assign_topk(
            spark, group, queries, n_probe=2, assert_pruned=False
        ).collect()
    )
    taken = vx.maintain_ann_assignments(spark, group, target_rows_per_file=500)
    assert taken["assign"] == ["compacted"]
    m2 = snap._manifest_raw(
        spark, assign_path, snap.snapshot_versions(spark, assign_path)[-1]
    )
    assert not m2.get("delete_files")  # folded
    mm = snap._manifest(
        spark, assign_path, snap.snapshot_versions(spark, assign_path)[-1]
    )
    assert set(mm["blooms"]) == {
        f.rsplit("/", 1)[-1] for f in mm["files"]
    }  # packed outputs re-bloomed
    assert snap.snapshot_row_count(spark, assign_path) is not None  # exact again
    after = sorted(
        (r["neighbor_id"], r["cosine_sim"])
        for r in vx.ann_assign_topk(
            spark, group, queries, n_probe=2, assert_pruned=False
        ).collect()
    )
    assert after == before


def test_doclen_mirror_recreates_table_in_new_session(spark, tmp_path):
    """The mirror is self-describing: its manifest carries the bucket
    spec, so a process that never wrote it (here simulated by dropping
    the table registration) re-creates the bucketed external table from
    the manifest and still gets the bucketed scan."""
    from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i % 3}") for i in range(12)],
        "doc_id long, text string",
    )
    group = str(tmp_path / "ti")
    ti.build_token_index(
        spark, docs, group, splits=1, target_rows_per_file=6
    )
    pins = ti.index_pins(spark, group)
    dl = ti._doclen_df(spark, group, pins)
    plan1 = dl._jdf.queryExecution().executedPlan().toString()
    assert "idx_doclen_" in plan1
    table = [
        t for t in plan1.split() if "idx_doclen_" in t
    ][0].split(".")[-1].split("[")[0]
    # simulate a fresh session: the table registration is gone, the
    # mirror dir + manifest survive on disk
    spark.sql(f"DROP TABLE {table}")
    assert not spark.catalog.tableExists(table)
    dl2 = ti._doclen_df(spark, group, pins)
    assert spark.catalog.tableExists(table)  # re-created from manifest
    got = {r["doc_id"]: r["dl"] for r in dl2.collect()}
    assert got == {i: 3 for i in range(12)}
    # and the re-created table still drives the bucketed BM25 join
    rows = ti.indexed_bm25_topk(
        spark, group, ["alpha", "beta"], assert_pruned=False
    ).collect()
    assert {r["doc_id"] for r in rows} == set(range(12))


def test_ann_readers_never_see_torn_state(spark, tmp_path):
    """ANN group pin discipline (the token index's contract, mirrored):
    an assign-layer commit that has NOT been published through the pin
    set is invisible to searches; publishing exposes it atomically."""
    import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
    from aie321_bigdata_movie_kpi_1m_spark.plans import vectors as vx
    from pyspark.sql import functions as F

    group = str(tmp_path / "ann")
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    vx.build_ann_assignments(spark, emb, group)
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    search = lambda: {  # noqa: E731
        r["neighbor_id"]
        for r in vx.ann_assign_topk(
            spark, group, queries, n_probe=2, assert_pruned=False
        ).collect()
    }
    before = search()
    # mid-cycle state: a clone of the query vector lands in the assign
    # layer (its own cell — always probed) WITHOUT a pin publish
    mats, _ = vx.load_ann_model(spark, f"{group}/model")
    ghost = emb.filter(F.col("vec_id") == 0).select(
        F.lit(99999).cast("long").alias("vec_id"), "embedding"
    )
    snap.commit_snapshot(
        spark,
        vx._assign_cells(ghost, mats[0]),
        f"{group}/assign",
        mode="append",
        stats_cols=["cell", "vec_id"],
        bloom_col="cell",
    )
    assert search() == before  # pinned readers still see the last cycle
    assert 99999 not in before
    vx.publish_ann_pins(spark, group)
    after = search()
    assert 99999 in after  # cosine 1.0 clone: top neighbor once published


class TestIndexedPrefixSearch:
    """Prefix (wildcard) search through the range-clustered postings."""

    def _group(self, spark, tmp_path, rows, **kw):
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs = spark.createDataFrame(rows, "doc_id long, text string")
        group = str(tmp_path / "ti")
        ti.build_token_index(spark, docs, group, splits=1, **kw)
        return group

    def test_prefix_successor_is_exact(self):
        from aie321_bigdata_movie_kpi_1m_spark.plans.token_index import (
            _prefix_successor,
        )

        assert _prefix_successor("ab") == "ac"
        assert _prefix_successor("a") == "b"
        # carry past the max code point: the last position drops and
        # the previous one increments
        assert _prefix_successor("a" + chr(0x10FFFF)) == "b"
        assert _prefix_successor(chr(0x10FFFF)) is None
        # interval property on real strings: everything with the prefix
        # sits in [p, succ), nothing else does
        p, s = "pre", _prefix_successor("pre")
        assert p <= "pre" < s and p <= "prezzz" < s
        assert not (p <= "prd" < s) and not (p <= s < s)

    def test_prefix_semantics_and_ranking(self, spark, tmp_path):
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        group = self._group(
            spark,
            tmp_path,
            [
                (1, "alpha alpine alto beta"),
                (2, "alpha alpha gamma"),
                (3, "beta gamma"),
                (4, "al"),  # the bare prefix itself is a matching token
            ],
        )
        got = {
            r["doc_id"]: (r["score"], r["n_terms"])
            for r in ti.indexed_prefix_search(
                spark, group, "al", assert_pruned=False
            ).collect()
        }
        # doc1: alpha+alpine+alto = 3 tokens, 3 distinct terms; doc2:
        # alpha x2 = score 2, 1 term; doc3 no match; doc4 the literal
        assert got == {1: (3, 3), 2: (2, 1), 4: (1, 1)}
        import pytest

        with pytest.raises(ValueError, match="non-empty"):
            ti.indexed_prefix_search(spark, group, "")

    def test_prefix_pruning_strict_subset(self, spark, tmp_path):
        """Range stats admit only the files whose token slice meets the
        EXACT prefix interval — and the pruned read equals the full
        read's answer."""
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti
        from aie321_bigdata_movie_kpi_1m_spark.sources.snapshots import (
            snapshot_files,
        )

        # 26 prefix families spread the token range so range clustering
        # yields many narrow files
        rows = [
            (i, " ".join(f"{chr(97 + i % 26)}tok{j}" for j in range(8)))
            for i in range(80)
        ]
        group = self._group(spark, tmp_path, rows, target_rows_per_file=40)
        pins = ti.index_pins(spark, group)
        path = f"{group}/postings"
        n_all = len(snapshot_files(spark, path, pins["postings"]))
        assert n_all > 4
        pruned = ti.indexed_prefix_search(spark, group, "m")  # asserts
        full = ti.indexed_prefix_search(
            spark, group, "m", assert_pruned=False
        )
        assert sorted(map(tuple, pruned.collect())) == sorted(
            map(tuple, full.collect())
        )

    @pytest.mark.slow

    def test_prefix_tracks_deletes(self, spark, tmp_path):
        """Merge-on-read equality deletes drop a doc from prefix
        results with no rebuild."""
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs_layer = str(tmp_path / "docs")
        group = str(tmp_path / "ti")
        v1 = snap.commit_snapshot(
            spark,
            spark.createDataFrame(
                [(1, "prefix prefab"), (2, "prefix other")],
                "doc_id long, text string",
            ),
            docs_layer,
            change_feed=True,
        )
        ti.build_token_index(
            spark, snap.read_snapshot(spark, docs_layer), group, splits=1
        )
        hits = lambda: {  # noqa: E731
            r["doc_id"]
            for r in ti.indexed_prefix_search(
                spark, group, "pre", assert_pruned=False
            ).collect()
        }
        assert hits() == {1, 2}
        v2 = snap.delete_snapshot_keys(spark, docs_layer, "doc_id", [1])[
            "version"
        ]
        ti.refresh_token_index(
            spark,
            group,
            snap.snapshot_changes_keyed(
                spark, docs_layer, v1, v2, ["doc_id"], include_values=True
            ),
        )
        assert hits() == {2}


class TestReclusterMaintenance:
    """Opt-in layout restoration: maintenance ACTS on the advisor's
    cluster/zorder signal by re-range-clustering a layer on its SERVING
    column, restoring interval-probe sharpness interleaved deltas
    dulled."""

    @pytest.mark.slow

    def test_token_index_recluster_restores_prefix_pruning(
        self, spark, tmp_path
    ):
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti
        from aie321_bigdata_movie_kpi_1m_spark.sources.snapshots import (
            snapshot_files,
        )

        # 4 interleaved appends, each internally clustered over the
        # same a-z token range -> per-file ranges straddle each other
        rows = [
            (i, " ".join(f"{chr(97 + (i + j) % 26)}w{j}" for j in range(8)))
            for i in range(120)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        group = str(tmp_path / "ti")
        ti.build_token_index(
            spark, docs, group, splits=4, target_rows_per_file=120
        )
        path = f"{group}/postings"
        before = sorted(
            map(
                tuple,
                ti.indexed_prefix_search(
                    spark, group, "m", assert_pruned=False
                ).collect(),
            )
        )
        taken = ti.maintain_token_index(
            spark, group, target_rows_per_file=120, recluster=True
        )
        assert "reclustered" in taken[ti.POSTINGS]
        v = ti.index_pins(spark, group)[ti.POSTINGS]
        n_all = len(snapshot_files(spark, path, v))
        assert n_all > 2
        hi = ti._prefix_successor("m")
        n_probe = len(
            snapshot_files(
                spark, path, v, prune_range=("token", "m", hi)
            )
        )
        # the reclustered layout admits a strict minority of files
        assert n_probe <= n_all // 2
        # lossless: results identical, and the in-function strict-subset
        # assertion passes on the reclustered layer
        after = sorted(
            map(
                tuple,
                ti.indexed_prefix_search(spark, group, "m").collect(),
            )
        )
        assert after == before and after

    @pytest.mark.slow

    def test_neardup_recluster_keeps_lookup_exact(self, spark, tmp_path):
        from aie321_bigdata_movie_kpi_1m_spark.plans import neardup_index as ni

        rows = [
            (1000 + i, " ".join(f"r{i}s{j}" for j in range(12)))
            for i in range(60)
        ] + [
            (1, " ".join(f"w{k}" for k in range(30))),
            (2, " ".join(f"w{k}" for k in range(29)) + " zz"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        group = str(tmp_path / "nd")
        # many interleaved splits dull the bkey ranges across deltas
        ni.build_neardup_index(
            spark,
            docs,
            group,
            num_hashes=32,
            bands=16,
            splits=6,
            target_rows_per_file=64,
        )
        taken = ni.maintain_neardup_index(
            spark, group, target_rows_per_file=64, recluster=True
        )
        assert "reclustered" in taken["buckets"]
        q = spark.createDataFrame(
            [(500, rows[-2][1])], "doc_id long, text string"
        )
        got = {
            j
            for _, j, _, _ in map(
                tuple,
                ni.indexed_neardup_lookup(spark, group, q, docs).collect(),
            )
        }
        assert got == {1, 2}


class TestIndexedWildcardSearch:
    """Permuterm layer: wildcard classes, LIKE-exact filtering,
    pruning, and O(delta) vocabulary maintenance."""

    def test_wildcard_classes_and_overlap_exactness(self, spark, tmp_path):
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs = spark.createDataFrame(
            [
                (1, "window shadow stream"),
                (2, "order border ab"),
                (3, "seam steam window window"),
            ],
            "doc_id long, text string",
        )
        group = str(tmp_path / "ti")
        ti.build_token_index(spark, docs, group, splits=1)

        def hits(pat):
            return {
                r["doc_id"]: (r["score"], r["n_terms"])
                for r in ti.indexed_wildcard_search(
                    spark, group, pat, assert_pruned=False
                ).collect()
            }

        # suffix: *dow -> window, shadow
        assert hits("*dow") == {1: (2, 2), 3: (2, 1)}
        # infix: *rde* -> order, border
        assert hits("*rde*") == {2: (2, 2)}
        # anchored X*Y: s*eam -> seam, steam, stream (LIKE allows empty %)
        assert hits("s*eam") == {1: (1, 1), 3: (2, 2)}
        # overlap exactness: ab*b must NOT match the 2-char token "ab"
        # (starts with ab AND ends with b, but LIKE 'ab%b' needs >= 3)
        assert hits("ab*b") == {}
        # prefix class through the same layer: wi*
        assert hits("wi*") == {1: (1, 1), 3: (2, 1)}
        import pytest

        with pytest.raises(ValueError, match="needs literal"):
            ti.indexed_wildcard_search(spark, group, "*")
        with pytest.raises(ValueError, match="unsupported"):
            ti.indexed_wildcard_search(spark, group, "a*b*c")

    def test_wildcard_pruning_strict_subset(self, spark, tmp_path):
        """The rot-range probe admits a strict subset of a multi-file
        permuterm layer (the in-function assertion raises otherwise)
        and equals the unpruned answer."""
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti
        from aie321_bigdata_movie_kpi_1m_spark.sources.snapshots import (
            snapshot_files,
        )

        rows = [
            (i, " ".join(f"{chr(97 + i % 26)}mid{j}x" for j in range(8)))
            for i in range(80)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        group = str(tmp_path / "ti")
        ti.build_token_index(
            spark, docs, group, splits=1, target_rows_per_file=120
        )
        pins = ti.index_pins(spark, group)
        assert len(snapshot_files(spark, f"{group}/permuterm",
                                  pins[ti.PERMUTERM])) > 4
        pruned = sorted(
            map(
                tuple,
                ti.indexed_wildcard_search(spark, group, "*d0x").collect(),
            )
        )
        full = sorted(
            map(
                tuple,
                ti.indexed_wildcard_search(
                    spark, group, "*d0x", assert_pruned=False
                ).collect(),
            )
        )
        assert pruned == full and pruned

    @pytest.mark.slow

    def test_wildcard_tracks_vocabulary_churn(self, spark, tmp_path):
        """Refresh folds the vocabulary delta O(delta): a new token
        becomes wildcard-servable, a token whose last posting vanishes
        leaves the layer (dead probe through the live postings), and a
        token still held by a surviving doc stays."""
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs_layer = str(tmp_path / "docs")
        group = str(tmp_path / "ti")
        v1 = snap.commit_snapshot(
            spark,
            spark.createDataFrame(
                [(1, "unique window"), (2, "window keeper")],
                "doc_id long, text string",
            ),
            docs_layer,
            change_feed=True,
        )
        ti.build_token_index(
            spark, snap.read_snapshot(spark, docs_layer), group, splits=1
        )

        def toks():
            return {
                r["token"]
                for r in snap.read_snapshot(spark, f"{group}/permuterm")
                .select("token")
                .distinct()
                .collect()
            }

        assert toks() == {"unique", "window", "keeper"}
        # delete doc 1 (kills 'unique', 'window' survives via doc 2),
        # insert doc 3 with a brand-new token
        v2 = snap.delete_snapshot_keys(spark, docs_layer, "doc_id", [1])[
            "version"
        ]
        v3 = snap.commit_snapshot(
            spark,
            spark.createDataFrame(
                [(3, "novel window")], "doc_id long, text string"
            ),
            docs_layer,
            mode="append",
        )
        ti.refresh_token_index(
            spark,
            group,
            snap.snapshot_changes_keyed(
                spark, docs_layer, v1, v3, ["doc_id"], include_values=True
            ),
        )
        assert toks() == {"window", "keeper", "novel"}
        assert {
            r["doc_id"]
            for r in ti.indexed_wildcard_search(
                spark, group, "*vel", assert_pruned=False
            ).collect()
        } == {3}
        assert not ti.indexed_wildcard_search(
            spark, group, "*ique", assert_pruned=False
        ).collect()
        # maintenance sweeps the permuterm layer too (folds its delete
        # entries / packs small rotation files) and must be lossless
        taken = ti.maintain_token_index(spark, group)
        assert ti.PERMUTERM in taken
        assert toks() == {"window", "keeper", "novel"}
        assert {
            r["doc_id"]
            for r in ti.indexed_wildcard_search(
                spark, group, "*dow", assert_pruned=False
            ).collect()
        } == {2, 3}


class TestIndexedFuzzySearch:
    """Fuzzy (deletion-neighborhood / FastSS) layer: edit-distance
    semantics, verify-filter exactness, depth pinning, pruning, and
    O(delta) vocabulary maintenance."""

    def test_fuzzy_semantics_and_depth_guard(self, spark, tmp_path):
        import pytest

        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs = spark.createDataFrame(
            [
                (1, "stream of data stream"),
                (2, "strem typo steam"),
                (3, "dream team"),
            ],
            "doc_id long, text string",
        )
        group = str(tmp_path / "ti")
        ti.build_token_index(spark, docs, group, splits=1)
        assert ti.fuzzy_max_edits(spark, group) == 1

        def hits(term, d):
            return {
                r["doc_id"]: (r["score"], r["n_terms"])
                for r in ti.indexed_fuzzy_search(
                    spark, group, term, max_dist=d, assert_pruned=False
                ).collect()
            }

        # d=1: stream itself (doc 1 x2) + strem/steam (doc 2, lev 1
        # each); dream is lev 2 — the levenshtein verify must reject
        # the FastSS collision class
        assert hits("stream", 1) == {1: (2, 1), 2: (2, 2)}
        # d=0 degenerates to exact term search
        assert hits("stream", 0) == {1: (2, 1)}
        # a query deeper than the build is REFUSED (completeness needs
        # both sides' variants at depth d), never silently partial
        with pytest.raises(ValueError, match="max_edits=1"):
            ti.indexed_fuzzy_search(
                spark, group, "stream", max_dist=2, assert_pruned=False
            )
        with pytest.raises(ValueError, match="non-empty"):
            ti.indexed_fuzzy_search(spark, group, "")
        # a depth-2 build serves d=2: dream (del r, sub d->t is 2 subs?
        # lev(stream,dream)=2) and team (2 deletions) join the match set
        group2 = str(tmp_path / "ti2")
        ti.build_token_index(spark, docs, group2, splits=1, fuzzy_edits=2)
        assert {
            r["doc_id"]
            for r in ti.indexed_fuzzy_search(
                spark, group2, "stream", max_dist=2, assert_pruned=False
            ).collect()
        } == {1, 2, 3}

    def test_fuzzy_phrase_and_proximity_semantics(self, spark, tmp_path):
        """Typo-tolerant positional queries (r13 verdict item #2):
        each slot expands through the fuzzy layer, adjacency/window
        predicates run over the per-slot union position arrays —
        equivalent to testing every expansion combination; the
        max_expansions bound refuses fan-out blow-ups loudly."""
        import pytest

        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs = spark.createDataFrame(
            [
                # 'stream table' adjacent twice; typo'd query must find it
                (1, "stream table x stream table"),
                # expansion variants adjacent once ('strem' lev-0 of
                # the typo'd query itself, 'tabel' lev-1 of 'tabl')
                (2, "strem tabel end"),
                # both slots match but NOT adjacent (gap 2): phrase
                # misses, proximity slop>=3 catches
                (3, "stream a b table"),
                # reversed order at distance 1: phrase+ordered miss,
                # symmetric proximity catches
                (4, "table stream"),
                (5, "dream beam"),
            ],
            "doc_id long, text string",
        )
        group = str(tmp_path / "tifp")
        ti.build_token_index(spark, docs, group, splits=1)

        def phrase(terms, **kw):
            return {
                r["doc_id"]: r["n_matches"]
                for r in ti.indexed_fuzzy_phrase_search(
                    spark, group, terms, assert_pruned=False, **kw
                ).collect()
            }

        def prox(terms, **kw):
            return {
                r["doc_id"]: r["n_matches"]
                for r in ti.indexed_fuzzy_proximity_search(
                    spark, group, terms, assert_pruned=False, **kw
                ).collect()
            }

        # typo'd both slots: 'strem'~{stream,strem}, 'tabl'~{table,
        # tabel}; doc1 two adjacent anchors, doc2 one (strem+tabel)
        assert phrase(["strem", "tabl"]) == {1: 2, 2: 1}
        # symmetric slop=3 additionally admits doc3 (gap 3 within
        # window) and doc4 (reversed at distance 1)
        assert prox(["strem", "tabl"], slop=3) == {1: 2, 2: 1, 3: 1, 4: 1}
        # ORDERED chain keeps doc3 (forward within slop+1) but never
        # the reversed doc4
        assert prox(["strem", "tabl"], slop=3, ordered=True) == {
            1: 2,
            2: 1,
            3: 1,
        }
        # ordered slop=0 degenerates to the phrase query exactly
        assert prox(["strem", "tabl"], slop=0, ordered=True) == phrase(
            ["strem", "tabl"]
        )
        # a slot with an empty expansion -> typed empty result
        assert phrase(["zzzzzz", "tabl"]) == {}
        # the fan-out bound refuses instead of planning a blow-up
        with pytest.raises(ValueError, match="max_expansions"):
            phrase(["strem", "tabl"], max_expansions=1)
        with pytest.raises(ValueError, match="at least two"):
            phrase(["strem"])

    def test_fuzzy_join_terms_matches_per_term_expansion(
        self, spark, tmp_path
    ):
        """The BATCH fuzzy join: a table of terms matched executor-side
        agrees exactly with the per-term driver-side expansion
        (fuzzy_expand_term) for every term, the probe⋈layer pairing is
        a shuffle join (no broadcast hint — under
        autoBroadcastJoinThreshold=-1 the var join degrades to
        SortMergeJoin, never a nested loop), and the depth guard
        refuses joins deeper than the build."""
        import pytest

        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs = spark.createDataFrame(
            [
                (1, "stream of data stream"),
                (2, "strem typo steam"),
                (3, "dream team table"),
            ],
            "doc_id long, text string",
        )
        group = str(tmp_path / "ti")
        ti.build_token_index(spark, docs, group, splits=1)
        terms = ["stream", "steem", "tabl", "zzz", ""]
        terms_df = spark.createDataFrame(
            [(t,) for t in terms], "term string"
        )
        got: dict[str, set] = {}
        for r in ti.fuzzy_join_terms(spark, group, terms_df).collect():
            got.setdefault(r["term"], set()).add(r["token"])
        for t in terms:
            if not t:
                continue  # empty terms are dropped, never joined
            expect = set(
                ti.fuzzy_expand_term(
                    spark, group, t, assert_pruned=False
                )
            )
            assert got.get(t, set()) == expect, t
        assert "" not in got
        # plan shape: the var pairing shuffles (batch contract)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                ti.fuzzy_join_terms(spark, group, terms_df)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
            assert "SortMergeJoin" in plan
            assert "BroadcastNestedLoopJoin" not in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        with pytest.raises(ValueError, match="max_edits=1"):
            ti.fuzzy_join_terms(spark, group, terms_df, max_dist=2)

    def test_fuzzy_pruning_strict_subset(self, spark, tmp_path):
        """The deletion-variant Bloom/range probe admits a strict
        subset of a multi-file fuzzy layer (the in-function assertion
        raises otherwise) and equals the unpruned answer."""
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti
        from aie321_bigdata_movie_kpi_1m_spark.sources.snapshots import (
            snapshot_files,
        )

        rows = [
            (i, " ".join(f"{chr(97 + i % 26)}mid{j}x" for j in range(8)))
            for i in range(80)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        group = str(tmp_path / "ti")
        ti.build_token_index(
            spark, docs, group, splits=1, target_rows_per_file=120
        )
        pins = ti.index_pins(spark, group)
        assert len(
            snapshot_files(spark, f"{group}/fuzzy", pins[ti.FUZZY])
        ) > 4
        pruned = sorted(
            map(
                tuple,
                ti.indexed_fuzzy_search(spark, group, "amid0x").collect(),
            )
        )
        full = sorted(
            map(
                tuple,
                ti.indexed_fuzzy_search(
                    spark, group, "amid0x", assert_pruned=False
                ).collect(),
            )
        )
        assert pruned == full and pruned

    @pytest.mark.slow

    def test_fuzzy_tracks_vocabulary_churn(self, spark, tmp_path):
        """Refresh folds the vocabulary delta O(delta) into the fuzzy
        layer alongside the permuterm one: a new token becomes
        fuzzy-servable, a dead token leaves, survivors stay; the
        maintenance sweep covers the layer and stays lossless."""
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from aie321_bigdata_movie_kpi_1m_spark.plans import token_index as ti

        docs_layer = str(tmp_path / "docs")
        group = str(tmp_path / "ti")
        v1 = snap.commit_snapshot(
            spark,
            spark.createDataFrame(
                [(1, "unique stream"), (2, "stream keeper")],
                "doc_id long, text string",
            ),
            docs_layer,
            change_feed=True,
        )
        ti.build_token_index(
            spark, snap.read_snapshot(spark, docs_layer), group, splits=1
        )

        def toks():
            return {
                r["token"]
                for r in snap.read_snapshot(spark, f"{group}/fuzzy")
                .select("token")
                .distinct()
                .collect()
            }

        assert toks() == {"unique", "stream", "keeper"}
        snap.delete_snapshot_keys(spark, docs_layer, "doc_id", [1])
        v3 = snap.commit_snapshot(
            spark,
            spark.createDataFrame(
                [(3, "novel strem")], "doc_id long, text string"
            ),
            docs_layer,
            mode="append",
            change_feed=True,
        )
        ti.refresh_token_index(
            spark,
            group,
            snap.snapshot_changes_keyed(
                spark, docs_layer, v1, v3, ["doc_id"], include_values=True
            ),
        )
        assert toks() == {"stream", "keeper", "novel", "strem"}
        # the typo'd new doc is served, the dead token is not
        assert {
            r["doc_id"]
            for r in ti.indexed_fuzzy_search(
                spark, group, "stream", assert_pruned=False
            ).collect()
        } == {2, 3}
        assert not ti.indexed_fuzzy_search(
            spark, group, "unique", assert_pruned=False
        ).collect()
        # maintenance sweeps the fuzzy layer too and must be lossless
        taken = ti.maintain_token_index(spark, group)
        assert ti.FUZZY in taken
        assert toks() == {"stream", "keeper", "novel", "strem"}
        assert {
            r["doc_id"]
            for r in ti.indexed_fuzzy_search(
                spark, group, "stream", assert_pruned=False
            ).collect()
        } == {2, 3}


class TestNeardupIndex:
    """Persisted MinHash-LSH near-dup index: build / lookup / refresh /
    pruning / parity with the recomputed operator."""

    #: two ~0.87-jaccard families plus singletons — long enough that
    #: one changed token keeps jaccard above the 0.8 threshold
    ROWS = [
        (1, " ".join(f"w{k}" for k in range(30))),
        (2, " ".join(f"w{k}" for k in range(29)) + " zz"),
        (3, " ".join(f"v{k}" for k in range(30))),
        (4, " ".join(f"v{k}" for k in range(29)) + " yy"),
        (5, "lonely document with no twin at all"),
    ]

    def _docs(self, spark, rows=None):
        return spark.createDataFrame(
            rows or self.ROWS, "doc_id long, text string"
        )

    def test_build_lookup_hit_and_miss(self, spark, tmp_path):
        from aie321_bigdata_movie_kpi_1m_spark.plans import neardup_index as ni

        docs = self._docs(spark)
        group = str(tmp_path / "nd")
        ni.build_neardup_index(spark, docs, group, num_hashes=32, bands=16)
        assert ni.index_params(spark, group) == {
            "num_hashes": 32,
            "bands": 16,
            "n": 3,
        }
        q = spark.createDataFrame(
            [(100, self.ROWS[0][1]), (200, "utterly unrelated text here")],
            "doc_id long, text string",
        )
        got = {
            (r["i"], r["j"]): r["jaccard"]
            for r in ni.indexed_neardup_lookup(
                spark, group, q, docs, assert_pruned=False
            ).collect()
        }
        # the copy of doc 1 hits doc 1 exactly and its twin doc 2 above
        # threshold; the unrelated query hits nothing
        assert got[(100, 1)] == 1.0
        assert (100, 2) in got and got[(100, 2)] >= 0.8
        assert not any(i == 200 for i, _ in got)

    def test_divisibility_and_param_pinning(self, spark, tmp_path):
        import pytest

        from aie321_bigdata_movie_kpi_1m_spark.plans import neardup_index as ni

        with pytest.raises(ValueError, match="not divisible"):
            ni.build_neardup_index(
                spark, self._docs(spark), str(tmp_path / "x"), num_hashes=32,
                bands=7,
            )

    def test_pairs_parity_with_recomputed_operator(self, spark, tmp_path):
        """Index-served corpus pairs == minhash_lsh_pairs recomputed
        from raw text (same hashes, same verify) — bit parity."""
        from aie321_bigdata_movie_kpi_1m_spark.operators import dedup
        from aie321_bigdata_movie_kpi_1m_spark.plans import neardup_index as ni

        docs = self._docs(spark)
        group = str(tmp_path / "nd")
        ni.build_neardup_index(spark, docs, group, num_hashes=32, bands=16)
        served = sorted(
            map(tuple, ni.indexed_neardup_pairs(spark, group, docs).collect())
        )
        direct = sorted(
            map(
                tuple,
                dedup.minhash_lsh_pairs(
                    docs, num_hashes=32, bands=16, threshold=0.8
                ).collect(),
            )
        )
        assert served == direct and len(served) == 2

    def test_refresh_insert_and_delete(self, spark, tmp_path):
        """Change-feed refresh: an inserted twin appears, a deleted doc
        vanishes — no rebuild, and the layer never re-hashes survivors."""
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from aie321_bigdata_movie_kpi_1m_spark.plans import neardup_index as ni

        docs_layer = str(tmp_path / "docs")
        group = str(tmp_path / "nd")
        v1 = snap.commit_snapshot(
            spark, self._docs(spark), docs_layer, change_feed=True
        )
        ni.build_neardup_index(
            spark,
            snap.read_snapshot(spark, docs_layer),
            group,
            num_hashes=32,
            bands=16,
        )
        pairs = lambda: {  # noqa: E731
            (r["i"], r["j"])
            for r in ni.indexed_neardup_pairs(
                spark, group, snap.read_snapshot(spark, docs_layer)
            ).collect()
        }
        assert pairs() == {(1, 2), (3, 4)}
        # insert a second twin of the w-family, delete doc 3
        v2 = snap.commit_snapshot(
            spark,
            spark.createDataFrame(
                [(6, " ".join(f"w{k}" for k in range(29)) + " qq")],
                "doc_id long, text string",
            ),
            docs_layer,
            mode="append",
        )
        v3 = snap.delete_snapshot_keys(spark, docs_layer, "doc_id", [3])[
            "version"
        ]
        ni.refresh_neardup_index(
            spark,
            group,
            snap.snapshot_changes_keyed(
                spark, docs_layer, v1, v3, ["doc_id"], include_values=True
            ),
        )
        assert pairs() == {(1, 2), (1, 6), (2, 6)}

    def test_lookup_prunes_files(self, spark, tmp_path):
        """With the layer spread over many files, a one-doc probe's
        Bloom admits a strict subset (builder-asserted) and the pruned
        answer equals the unpruned one."""
        from aie321_bigdata_movie_kpi_1m_spark.plans import neardup_index as ni
        from aie321_bigdata_movie_kpi_1m_spark.sources.snapshots import (
            snapshot_files,
        )

        rows = [
            (1000 + i, " ".join(f"t{i}x{j}" for j in range(12)))
            for i in range(60)
        ] + list(self.ROWS)
        docs = self._docs(spark, rows)
        group = str(tmp_path / "nd")
        ni.build_neardup_index(
            spark,
            docs,
            group,
            num_hashes=32,
            bands=16,
            target_rows_per_file=64,
        )
        assert len(snapshot_files(spark, f"{group}/buckets")) > 8
        q = spark.createDataFrame(
            [(500, self.ROWS[0][1])], "doc_id long, text string"
        )
        before = ni._PRUNE_STATS["pruned_lookups"]
        got = sorted(
            map(
                tuple,
                ni.indexed_neardup_lookup(spark, group, q, docs).collect(),
            )
        )
        assert ni._PRUNE_STATS["pruned_lookups"] == before + 1
        full = sorted(
            map(
                tuple,
                ni.indexed_neardup_lookup(
                    spark, group, q, docs, assert_pruned=False
                ).collect(),
            )
        )
        assert got == full and {j for _, j, _, _ in got} == {1, 2}

    def test_hot_bucket_cap_parity(self, spark, tmp_path):
        """max_bucket on BOTH MinHash tiers (recomputed operator and
        persisted index): an engineered boilerplate family whose every
        bucket is hot is dropped under the cap (the documented recall
        trade simhash already offered), while twin pairs living in
        normal buckets survive; uncapped keeps exact banding
        semantics."""
        from aie321_bigdata_movie_kpi_1m_spark.operators import dedup
        from aie321_bigdata_movie_kpi_1m_spark.plans import neardup_index as ni

        boiler = " ".join(f"b{k}" for k in range(30))
        rows = list(self.ROWS) + [(100 + i, boiler) for i in range(8)]
        docs = self._docs(spark, rows)
        hot = {(i, j) for i in range(100, 108) for j in range(i + 1, 108)}

        def pairset(df):
            return {(r["i"], r["j"]) for r in df.collect()}

        uncapped = pairset(
            dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=16)
        )
        capped = pairset(
            dedup.minhash_lsh_pairs(
                docs, num_hashes=32, bands=16, max_bucket=4
            )
        )
        assert uncapped == {(1, 2), (3, 4)} | hot
        assert capped == {(1, 2), (3, 4)}

        group = str(tmp_path / "nd")
        ni.build_neardup_index(spark, docs, group, num_hashes=32, bands=16)
        assert pairset(ni.indexed_neardup_pairs(spark, group, docs)) == (
            {(1, 2), (3, 4)} | hot
        )
        assert pairset(
            ni.indexed_neardup_pairs(spark, group, docs, max_bucket=4)
        ) == {(1, 2), (3, 4)}

    def test_signatures_from_shared_shingle_sets_are_bit_identical(
        self, spark
    ):
        """The batch-admission probe computes tokenize+shingle ONCE and
        derives the MinHash signature from the shared shingle_sets
        relation (r16); a value drift between that path and
        minhash_signatures would silently probe the wrong buckets.
        Pin: identical signature rows on mixed docs (normal / short /
        empty / null / unicode)."""
        from aie321_bigdata_movie_kpi_1m_spark.operators.dedup import (
            minhash_signatures,
            minhash_signatures_from_sets,
            shingle_sets,
        )

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon"),
                (2, "alpha beta"),  # < n tokens: sentinel shingle
                (3, ""),
                (4, None),
                (5, "héllo wörld ünïcode tokens here"),
            ],
            "doc_id long, text string",
        )
        a = minhash_signatures(docs, num_hashes=8, n=3).collect()
        b = minhash_signatures_from_sets(
            shingle_sets(docs, n=3), num_hashes=8
        ).collect()
        key = lambda r: r["doc_id"]  # noqa: E731
        assert sorted(a, key=key) == sorted(b, key=key)

    def test_dataframe_probe_path(self, spark, tmp_path):
        """probe_mode='dataframe': zero probe keys cross the driver
        (counter-pinned), file pruning still proves a strict subset for
        a narrow probe, and both probe modes return identical rows —
        for a one-doc probe AND a whole-table batch admission."""
        from aie321_bigdata_movie_kpi_1m_spark.plans import neardup_index as ni
        from aie321_bigdata_movie_kpi_1m_spark.sources.snapshots import (
            snapshot_files,
        )

        rows = [
            (1000 + i, " ".join(f"p{i}q{j}" for j in range(12)))
            for i in range(60)
        ] + list(self.ROWS)
        docs = self._docs(spark, rows)
        group = str(tmp_path / "nd")
        ni.build_neardup_index(
            spark,
            docs,
            group,
            num_hashes=32,
            bands=16,
            target_rows_per_file=64,
        )
        assert len(snapshot_files(spark, f"{group}/buckets")) > 8
        q = spark.createDataFrame(
            [(500, self.ROWS[0][1])], "doc_id long, text string"
        )
        keys_before = ni._PRUNE_STATS["driver_probe_keys"]
        pruned_before = ni._PRUNE_STATS["pruned_lookups"]
        df_mode = sorted(
            map(
                tuple,
                ni.indexed_neardup_lookup(
                    spark, group, q, docs, probe_mode="dataframe"
                ).collect(),
            )
        )
        # the strict-subset assertion ran AND no probe key hit the driver
        assert ni._PRUNE_STATS["pruned_lookups"] == pruned_before + 1
        assert ni._PRUNE_STATS["driver_probe_keys"] == keys_before
        driver_mode = sorted(
            map(
                tuple,
                ni.indexed_neardup_lookup(spark, group, q, docs).collect(),
            )
        )
        assert ni._PRUNE_STATS["driver_probe_keys"] > keys_before
        assert df_mode == driver_mode
        assert {j for _, j, _, _ in df_mode} == {1, 2}
        # whole-table batch admission: every doc probes at once; the
        # answer must equal the driver path's (pruning legitimately ~nil
        # for a batch spanning most buckets, so no strict-subset assert)
        batch_df = sorted(
            map(
                tuple,
                ni.indexed_neardup_lookup(
                    spark,
                    group,
                    docs,
                    docs,
                    probe_mode="dataframe",
                    assert_pruned=False,
                ).collect(),
            )
        )
        batch_driver = sorted(
            map(
                tuple,
                ni.indexed_neardup_lookup(
                    spark, group, docs, docs, assert_pruned=False
                ).collect(),
            )
        )
        assert batch_df == batch_driver
        assert {(i, j) for i, j, _, _ in batch_df} == {
            (1, 2),
            (2, 1),
            (3, 4),
            (4, 3),
        }

    def test_delta_files_scale_with_rows(self, spark, tmp_path):
        """Bucket appends are rows-scaled: a big bootstrap delta writes
        proportionally many files, a one-doc refresh writes one."""
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from aie321_bigdata_movie_kpi_1m_spark.plans import neardup_index as ni

        rows = [
            (i, " ".join(f"d{i}y{j}" for j in range(8))) for i in range(40)
        ]
        group = str(tmp_path / "nd")
        ni.build_neardup_index(
            spark,
            self._docs(spark, rows),
            group,
            num_hashes=32,
            bands=16,
            splits=1,
            target_rows_per_file=80,
        )
        path = f"{group}/buckets"
        v1 = snap.snapshot_versions(spark, path)[-1]
        n_big = len(snap.snapshot_files(spark, path, v1))
        assert n_big == 8  # ceil(40 docs x 16 bands / 80)
        docs_layer = str(tmp_path / "docs")
        va = snap.commit_snapshot(
            spark, self._docs(spark, rows), docs_layer, change_feed=True
        )
        vb = snap.commit_snapshot(
            spark,
            spark.createDataFrame(
                [(99, "one new tiny document")], "doc_id long, text string"
            ),
            docs_layer,
            mode="append",
        )
        ni.refresh_neardup_index(
            spark,
            group,
            snap.snapshot_changes_keyed(
                spark, docs_layer, va, vb, ["doc_id"], include_values=True
            ),
            target_rows_per_file=80,
        )
        v2 = snap.snapshot_versions(spark, path)[-1]
        assert len(snap.snapshot_files(spark, path, v2)) - n_big == 1


    @pytest.mark.slow


    def test_maintenance_compacts_and_keeps_pruning(self, spark, tmp_path):
        """After churn, maintenance folds the delete entries and packs
        small files; lookups are unchanged and the Bloom (regenerated
        under the layer's pinned size) still prunes."""
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from aie321_bigdata_movie_kpi_1m_spark.plans import neardup_index as ni

        rows = [
            (1000 + i, " ".join(f"m{i}z{j}" for j in range(12)))
            for i in range(60)
        ] + list(self.ROWS)
        docs_layer = str(tmp_path / "docs")
        group = str(tmp_path / "nd")
        v1 = snap.commit_snapshot(
            spark,
            spark.createDataFrame(rows, "doc_id long, text string"),
            docs_layer,
            change_feed=True,
        )
        ni.build_neardup_index(
            spark,
            snap.read_snapshot(spark, docs_layer),
            group,
            num_hashes=32,
            bands=16,
            target_rows_per_file=64,
        )
        # churn: drop the v-family and half the filler docs
        v2 = snap.delete_snapshot_keys(
            spark,
            docs_layer,
            "doc_id",
            [3, 4] + [1000 + i for i in range(0, 60, 2)],
        )["version"]
        ni.refresh_neardup_index(
            spark,
            group,
            snap.snapshot_changes_keyed(
                spark, docs_layer, v1, v2, ["doc_id"], include_values=True
            ),
        )
        docs_now = snap.read_snapshot(spark, docs_layer)
        pairs_before = sorted(
            map(
                tuple,
                ni.indexed_neardup_pairs(spark, group, docs_now).collect(),
            )
        )
        assert {(i, j) for i, j, *_ in pairs_before} == {(1, 2)}
        taken = ni.maintain_neardup_index(
            spark, group, target_rows_per_file=64
        )
        assert taken["buckets"] == ["compacted"]
        assert sorted(
            map(
                tuple,
                ni.indexed_neardup_pairs(spark, group, docs_now).collect(),
            )
        ) == pairs_before
        # lookup still prunes through the REGENERATED blooms
        q = spark.createDataFrame(
            [(500, self.ROWS[0][1])], "doc_id long, text string"
        )
        got = {
            j
            for _, j, _, _ in map(
                tuple,
                ni.indexed_neardup_lookup(
                    spark, group, q, docs_now
                ).collect(),
            )
        }
        assert got == {1, 2}


class TestAnnIvfadc:
    """IVFADC through the persisted assignment layer: per-query file
    pruning, parity with the global PQ scan, O(delta) refresh."""

    def _group(self, spark, tmp_path):
        from aie321_bigdata_movie_kpi_1m_spark.plans import vectors as vx

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", "embedding")
        group = str(tmp_path / "ivfadc")
        vx.build_ann_ivfadc(spark, emb, group, target_rows_per_file=40)
        return group, emb

    def test_single_query_prunes_files(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from aie321_bigdata_movie_kpi_1m_spark.plans import vectors as vx

        group, emb = self._group(spark, tmp_path)
        q = emb.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        # n_probe=2 of 16 cells: the strict-subset assertion inside
        # must hold (raises otherwise), and results are non-empty
        got = vx.ann_ivfadc_topk(spark, group, q, n_probe=2).collect()
        assert 0 < len(got) <= 10
        assert all(r["neighbor_id"] != 0 for r in got)

    def test_all_cells_probed_equals_global_pq(self, spark, tmp_path):
        """With every cell probed the candidate set is the whole corpus
        minus self — bit-identical to the global PQ/ADC scan using the
        same persisted codebooks."""
        from pyspark.sql import functions as F

        from aie321_bigdata_movie_kpi_1m_spark.operators import similarity
        from aie321_bigdata_movie_kpi_1m_spark.plans import vectors as vx

        group, emb = self._group(spark, tmp_path)
        q = emb.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        served = sorted(
            map(
                tuple,
                vx.ann_ivfadc_topk(
                    spark, group, q, n_probe=16, assert_pruned=False
                ).collect(),
            )
        )
        mats_b, _ = vx.load_ann_model(spark, f"{group}/pq")
        books = [mats_b[s] for s in sorted(mats_b)]
        direct = sorted(
            map(
                tuple,
                similarity.pq_topk(emb, q, codebooks=books).collect(),
            )
        )
        assert served == direct and len(served) == 40

    def test_refresh_insert_delete_no_refit(self, spark, tmp_path):
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from pyspark.sql import functions as F

        from aie321_bigdata_movie_kpi_1m_spark.plans import vectors as vx

        group, emb = self._group(spark, tmp_path)
        fits_before = dict(vx._ANN_FIT_RUNS)
        emb_layer = str(tmp_path / "emb")
        v1 = snap.commit_snapshot(spark, emb, emb_layer, change_feed=True)
        # clone of query vector 0 under a new id, plus delete vec 7
        clone = emb.filter(F.col("vec_id") == 0).select(
            F.lit(99999).cast("long").alias("vec_id"), "embedding"
        )
        v2 = snap.commit_snapshot(
            spark, clone, emb_layer, mode="append"
        )
        v3 = snap.delete_snapshot_keys(spark, emb_layer, "vec_id", [7])[
            "version"
        ]
        vx.refresh_ann_ivfadc(
            spark,
            group,
            snap.snapshot_changes_keyed(
                spark, emb_layer, v1, v3, ["vec_id"], include_values=True
            ),
        )
        q = emb.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = {
            r["neighbor_id"]: r["cosine_sim"]
            for r in vx.ann_ivfadc_topk(
                spark, group, q, n_probe=16, assert_pruned=False
            ).collect()
        }
        # the cosine-1.0 clone shares vec 0's cell and codes: top hit
        assert got.get(99999) == 1.0
        assert 7 not in got
        # both models were LOADED, never refit
        assert dict(vx._ANN_FIT_RUNS) == fits_before

    @pytest.mark.slow

    def test_residual_refresh_encodes_under_pinned_kind(
        self, spark, tmp_path
    ):
        """O(delta) refresh on a RESIDUAL group: appended vectors are
        encoded under the pinned codebooks' kind (residual), never the
        raw family — a cosine-1.0 clone of a query vector lands in the
        same cell with the same residual codes and surfaces as the top
        hit; fit counters stay flat (models loaded, never refit)."""
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from pyspark.sql import functions as F

        from aie321_bigdata_movie_kpi_1m_spark.plans import vectors as vx

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", "embedding")
        group = str(tmp_path / "ivfadc_res")
        vx.build_ann_ivfadc(
            spark, emb, group, by_residual=True, target_rows_per_file=40
        )
        fits_before = dict(vx._ANN_FIT_RUNS)
        emb_layer = str(tmp_path / "emb")
        v1 = snap.commit_snapshot(spark, emb, emb_layer, change_feed=True)
        clone = emb.filter(F.col("vec_id") == 0).select(
            F.lit(77777).cast("long").alias("vec_id"), "embedding"
        )
        v2 = snap.commit_snapshot(spark, clone, emb_layer, mode="append")
        vx.refresh_ann_ivfadc(
            spark,
            group,
            snap.snapshot_changes_keyed(
                spark, emb_layer, v1, v2, ["vec_id"], include_values=True
            ),
        )
        q = emb.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = {
            r["neighbor_id"]: r["cosine_sim"]
            for r in vx.ann_ivfadc_topk(
                spark, group, q, n_probe=16, assert_pruned=False
            ).collect()
        }
        assert got.get(77777) == 1.0
        assert dict(vx._ANN_FIT_RUNS) == fits_before

    @pytest.mark.slow

    def test_residual_recall_improves_on_clustered_corpus(
        self, spark, tmp_path
    ):
        """Residual encoding's reason to exist, isolated from fixture
        noise: on a corpus with REAL cluster structure (16 gaussian
        clusters, center scale >> within-cluster noise) raw PQ codes
        collapse to the cluster centers — every sibling gets the same
        code and ADC cannot rank within a cluster — while residual
        codes spend the whole (m, n_codes) budget on the within-cell
        offsets.  All cells probed (no IVF effect) and a tight
        shortlist so ADC precision is the binding constraint: residual
        recall@10 must be STRICTLY higher.  Also pins that the two
        groups share the coarse quantizer (same cells) and that the pq
        meta kind drives the scoring branch."""
        import numpy as np
        from pyspark.sql import functions as F

        from aie321_bigdata_movie_kpi_1m_spark.operators import similarity
        from aie321_bigdata_movie_kpi_1m_spark.plans import vectors as vx

        rng = np.random.default_rng(7)
        centers = rng.normal(0.0, 10.0, size=(16, 64))
        rows = [
            (
                i,
                [
                    float(x)
                    for x in centers[i % 16] + rng.normal(0.0, 0.5, 64)
                ],
            )
            for i in range(240)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        queries = emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in similarity.cosine_topk(emb, queries, k=10).collect()
        }
        model_layer = str(tmp_path / "coarse")
        raw_group = str(tmp_path / "raw")
        res_group = str(tmp_path / "res")
        vx.build_ann_ivfadc(
            spark, emb, raw_group, model_layer=model_layer,
            target_rows_per_file=40,
        )
        vx.build_ann_ivfadc(
            spark, emb, res_group, model_layer=model_layer,
            by_residual=True, target_rows_per_file=40,
        )
        _, meta_raw = vx.load_ann_model(spark, f"{raw_group}/pq")
        _, meta_res = vx.load_ann_model(spark, f"{res_group}/pq")
        assert meta_raw["kind"] == "pq"
        assert meta_res["kind"] == "pq_residual"

        def recall(group):
            hits = {
                (r["query_id"], r["neighbor_id"])
                for r in vx.ann_ivfadc_topk(
                    spark,
                    group,
                    queries,
                    n_probe=16,
                    n_candidates=12,
                    assert_pruned=False,
                ).collect()
            }
            return len(hits & exact)

        r_raw, r_res = recall(raw_group), recall(res_group)
        assert r_res > r_raw, (r_res, r_raw)

    def test_pq_rebuild_gate(self, spark, tmp_path):
        """Codebook twin of the IVF rebuild gate: a passing gate
        commits nothing; a forced degraded-recall branch refits and
        commits the next codebook version."""
        import aie321_bigdata_movie_kpi_1m_spark.sources.snapshots as snap
        from pyspark.sql import functions as F

        from aie321_bigdata_movie_kpi_1m_spark.plans import vectors

        layer = str(tmp_path / "pq")
        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", "embedding")
        rep = vectors.pq_rebuild_gate(spark, emb, layer, min_recall=0.0)
        assert rep["rebuilt"] is False
        assert rep["model_version"] == 1
        assert 0.0 <= rep["recall"] <= 1.0
        fits = vectors._ANN_FIT_RUNS["pq"]
        rep2 = vectors.pq_rebuild_gate(spark, emb, layer, min_recall=1.01)
        assert rep2["rebuilt"] is True
        assert rep2["model_version"] == 2
        assert vectors._ANN_FIT_RUNS["pq"] == fits + 1
        assert snap.snapshot_versions(spark, layer) == [1, 2]
