"""Connected components over an edge list — the clustering step that
turns near-duplicate *pairs* into dedup *groups* (every doc in a group
keeps/drops together; the canonical representative is the min id).

Iterative min-label propagation, the classic Spark shape for this:
each round joins current labels across edges and keeps the per-node min;
convergence in O(component diameter) rounds.  Near-dup graphs have tiny,
shallow components, so 3-4 rounds settle real corpora.

Scale notes: lineage is truncated every round with an eager
``localCheckpoint`` — without it the plan doubles per iteration and
Catalyst optimization time explodes (on a cluster with an HDFS
checkpoint dir, swap in ``checkpoint``).  The convergence check is one
tiny count per round, far cheaper than a wasted extra round at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .materialize import materialize


def connected_components(
    edges: DataFrame,
    *,
    src: str = "i",
    dst: str = "j",
    max_iters: int = 20,
) -> DataFrame:
    """Label every node of the undirected ``edges`` graph with its
    component's minimum node id.  Returns (node, cluster_id); nodes with
    no edges are not in the output (callers union singletons if needed).
    """
    # mirror each edge in ONE pass over the (often expensive) upstream
    # pairs subtree — a self-union would evaluate it once per branch:
    # exchange reuse recovers the map side but the final aggregate /
    # verify stage above the exchange re-runs per branch (r15 measured:
    # the near-dup pair subtree's reduce side is ~1/3 of this operator)
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                    F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
                )
            ).alias("__e")
        )
        .select("__e.a", "__e.b")
        .distinct()
        .transform(lambda d: materialize(d, eager=True))
    )
    # initialize at min(self, direct neighbors) — the state the first
    # propagation round of an identity init would produce, for the same
    # one-shuffle cost as the identity init's distinct(); shallow
    # components (the near-dup norm) then converge one join-round earlier
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("__nbr_min"))
        .select(
            "node", F.least(F.col("node"), F.col("__nbr_min")).alias("label")
        )
    )

    def labels_checksum(df: DataFrame):
        # order-independent 64-bit-hash sum over (node, label) pairs: a
        # changed label set colliding on the sum is ~2^-64.  Works for ANY
        # id type — a plain sum of labels ("label mass") is only sound for
        # integral ids (numeric-string ids can trade +1/-1 across nodes in
        # one round and keep the sum fixed while labels changed; the cast
        # itself crashes on non-numeric strings under ANSI).  One scan
        # over the already-checkpointed partitions, no join.
        # decimal(38,0): a sum of 64-bit hashes cannot overflow.
        return df.agg(
            F.sum(F.xxhash64("node", "label").cast("decimal(38,0)"))
        ).collect()[0][0]

    prev_sig = None
    converged = False
    for _ in range(max_iters):
        nbr = sym.join(
            labels.select(F.col("node").alias("b"), "label"), "b"
        ).select(F.col("a").alias("node"), "label")
        labels = (
            labels.union(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        sig = labels_checksum(labels)
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # returning unconverged labels would be SILENTLY wrong output
        # (nodes of one component under different labels) — fail loudly;
        # callers with genuinely deep graphs raise max_iters
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds; "
            "a component's diameter exceeds max_iters — raise max_iters"
        )
    return labels.select("node", F.col("label").alias("cluster_id"))


def _round_checksum(edges: DataFrame):
    # (count, sum of per-edge hashes) — an exact-enough fixed-point signal:
    # two different edge sets colliding on BOTH count and a 64-bit-hash sum
    # is ~2^-64; decimal(38,0) cannot overflow.  One scan, no join.
    return tuple(
        edges.agg(
            F.count(F.lit(1)),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")),
        ).collect()[0]
    )


def connected_components_star(
    edges: DataFrame,
    *,
    src: str = "i",
    dst: str = "j",
    max_iters: int = 40,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — converges in O(log^2 n) rounds regardless of component
    DIAMETER, vs O(diameter) for min-label propagation.  This is the
    scale path for pathological graphs (long chains of pairwise
    near-duplicates); for the shallow graphs real near-dup corpora
    produce, ``connected_components`` converges in fewer wall-clock
    rounds and stays the default.

    Both star steps are expressed as join + groupBy (per-node min over
    the neighborhood rides through an aggregation, never a
    ``collect_list``), so a celebrity node with 10^7 neighbors costs a
    wide shuffle partition, not an executor OOM.

    Returns (node, cluster_id) with cluster_id = component min; nodes
    with no edges are not in the output (same contract as
    ``connected_components`` — including nodes whose only edge is a
    SELF-loop, which the star contraction would otherwise drop when it
    filters ``a != b``: they are unioned back as their own singleton
    cluster at the end).
    """
    # ONE evaluation of the upstream pairs subtree: mirror by explode
    # (not a self-union per consumer — see connected_components), keep
    # self-loops, and materialize; all_nodes and the contraction's
    # working edge set both derive from the checkpointed mirror (the
    # mirrored set's "a" column alone covers every endpoint), so the
    # edge computation never re-runs for the node inventory
    sym0 = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                    F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
                )
            ).alias("__e")
        )
        .select("__e.a", "__e.b")
        .distinct()
        .transform(lambda d: materialize(d, eager=True))
    )
    all_nodes = sym0.select(F.col("a").alias("node")).distinct()
    # undirected edge set, kept as a<->b pairs with self-loops dropped
    e = sym0.filter(F.col("a") != F.col("b"))

    def large_star(sym: DataFrame) -> DataFrame:
        # m(u) = min over N(u) ∪ {u}; emit (v, m) for v ∈ N(u), v > u
        m = (
            sym.groupBy("a")
            .agg(F.min("b").alias("__mb"))
            .select("a", F.least("__mb", "a").alias("m"))
        )
        return (
            sym.join(m, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("big"), F.col("m").alias("small"))
        )

    def small_star(directed: DataFrame) -> DataFrame:
        # edges arrive big->small; m(u) = min(N⁻(u) ∪ {u}); emit (v, m)
        # for every v ∈ N⁻(u) ∪ {u} except m itself
        m = directed.groupBy("big").agg(F.min("small").alias("m"))
        attach = directed.join(m, "big").filter(F.col("small") != F.col("m"))
        re_nbrs = attach.select(F.col("small").alias("big"), F.col("m").alias("small"))
        re_self = m.select(F.col("big"), F.col("m").alias("small"))
        return re_nbrs.union(re_self).filter(F.col("big") != F.col("small"))

    prev = None
    converged = False
    for _ in range(max_iters):
        ss = small_star(large_star(e))
        # mirror each directed edge in ONE pass (explode, not a
        # self-union that would re-evaluate the star subtree twice)
        e = (
            ss.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("big").alias("a"), F.col("small").alias("b")
                        ),
                        F.struct(
                            F.col("small").alias("a"), F.col("big").alias("b")
                        ),
                    )
                ).alias("e")
            )
            .select("e.a", "e.b")
            .distinct()
            .localCheckpoint(eager=True)
        )
        sig = _round_checksum(e)
        if sig == prev:
            converged = True
            break
        prev = sig
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iters} "
            "rounds — raise max_iters"
        )
    # fixed point is a star forest mirrored into both directions: every
    # non-root points at its component min
    out = (
        e.filter(F.col("a") > F.col("b"))
        .groupBy("a")
        .agg(F.min("b").alias("cluster_id"))
        .select(F.col("a").alias("node"), "cluster_id")
    )
    roots = out.select(F.col("cluster_id").alias("node")).distinct().select(
        "node", F.col("node").alias("cluster_id")
    )
    labeled = out.union(roots)
    # self-loop-only nodes never entered the contraction — singleton them
    singletons = all_nodes.join(labeled, "node", "left_anti").select(
        "node", F.col("node").alias("cluster_id")
    )
    return labeled.union(singletons)


def pagerank_fixed(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    damping: float = 0.85,
    iters: int = 3,
) -> DataFrame:
    """Weighted PageRank, a FIXED number of power iterations (the
    deterministic contract an oracle can replay; production callers pick
    ``iters`` by convergence monitoring instead).

    rank_{t+1}(v) = (1-d)/N + d * sum_{(u,v) in E} rank_t(u) * w(u,v)/out(u)

    Simplified-PageRank convention: dangling mass is dropped, not
    redistributed (ranks then sum to < 1; relative ordering is what
    downstream consumers use).  Returns (node, rank) unnormalized.

    Scale shape: each iteration is one join of the rank vector against the
    out-normalized edge list plus one groupBy — the edge list is computed
    once, normalized once, and reused across iterations.  For web-scale
    graphs the rank vector join is the shuffle that matters; here lineage
    stays linear in ``iters`` (3-5), so no checkpointing is needed
    (contrast connected_components, whose round count is data-dependent).
    """
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"), F.col(weight).alias("w")
    )
    outw = e.groupBy("u").agg(F.sum("w").alias("ow"))
    # transition matrix rows: w/out(u) — built once and MATERIALIZED once
    # (localCheckpoint), so every iteration's join reads the computed
    # partitions instead of re-deriving the normalize subtree and hoping
    # exchange reuse fires
    trans = (
        e.join(outw, "u")
        .select("u", "v", (F.col("w") / F.col("ow")).alias("p"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        # empty graph: an empty (node, rank) frame, not a ZeroDivisionError
        return nodes.select("node", F.lit(0.0).alias("rank"))
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        inflow = (
            trans.join(ranks.select(F.col("node").alias("u"), "rank"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("p")).alias("inflow"))
        )
        ranks = nodes.join(inflow, "node", "left").select(
            "node",
            (F.lit(base) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias(
                "rank"
            ),
        )
    return ranks


def triangles(
    edges: DataFrame,
    *,
    src: str = "i",
    dst: str = "j",
) -> DataFrame:
    """Every triangle of the undirected graph, exactly once, as
    ``(a, b, c)`` — ``a`` the lowest-RANK vertex (the wedge apex),
    ``(b, c)`` its closing edge.

    DEGREE ORIENTATION is what makes this survive skew at 100 TB: each
    undirected edge is directed from its lower-(degree, id) endpoint to
    the higher, so every vertex's out-degree is bounded by ~sqrt(2m)
    and total wedge count by O(m^1.5) REGARDLESS of hub vertices — the
    naive "wedges at every vertex" plan explodes quadratically on the
    first celebrity node.  One wedge self-join on the apex + one edge
    join closes each triangle at the apex of its lowest-rank corner,
    exactly once, with no distinct shuffle.  (Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW'11.)

    Self-loops are dropped; parallel/reversed duplicate edges collapse
    via the canonicalizing distinct.  Output vertex type follows the
    input id type.
    """
    # both the degree pass and the orientation join consume the
    # canonical edge set, and the wedge + closing joins consume the
    # oriented set: lazy localCheckpoints collapse each to ONE
    # computation (ReuseExchange cannot match the differing projections)
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .transform(materialize)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = (
        e.join(deg.withColumnsRenamed({"node": "u", "deg": "du"}), "u")
        .join(deg.withColumnsRenamed({"node": "v", "deg": "dv"}), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    ).transform(materialize)
    x = oriented.select(
        F.col("a"), F.col("b").alias("p"), F.col("db").alias("dp")
    )
    y = oriented.select(
        F.col("a"), F.col("b").alias("q"), F.col("db").alias("dq")
    )
    p_first = (F.col("dp") < F.col("dq")) | (
        (F.col("dp") == F.col("dq")) & (F.col("p") < F.col("q"))
    )
    wedges = x.join(y, "a").filter(p_first).select("a", "p", "q")
    closing = oriented.select(
        F.col("a").alias("p"), F.col("b").alias("q")
    )
    return wedges.join(closing, ["p", "q"]).select(
        F.col("a"), F.col("p").alias("b"), F.col("q").alias("c")
    )
