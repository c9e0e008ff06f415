"""Distributed graph analytics over DataFrame edge lists.

The reference's query surface stops at relational finders; a
training-data pipeline does not — link graphs (page/domain citation,
co-occurrence, dedup-cluster adjacency) feed quality signals
(PageRank-style authority is a classic pretraining-corpus quality
prior) and sampling weights. This module adds the iterative-graph
family in plain DataFrame primitives, joining the engine's other
iterative operators (dup_clusters' pointer jumping, Lloyd training,
BPE merge rounds).

Determinism is the house integer rule taken to iteration: ranks are
LONGS in units of 1e-12 of total mass ("pico-ranks"), every step is
integer multiply / floor-divide, so results are BIT-IDENTICAL across
partitionings, retries, and engines — an independent SQL engine can
replay the whole iteration (the battery oracle does, via a recursive
CTE) and hash-match. Floating-point PageRank cannot make that promise:
cross-partition sum order alone moves the low bits.

Scale shape (per iteration): ONE join of the rank frame to the edge
list on src (rank frame is O(nodes), edge list O(edges)) and ONE
groupBy dst with map-side combine — the standard Pregel superstep as
two shuffles; no driver data path (the dangling scalar rides a
broadcast one-row frame, never a collect). Lineage is truncated with
localCheckpoint every ``checkpoint_every`` iterations (SCALE.md rule
#2: iterative DataFrames need lineage truncation). Edges are
repartitioned by src ONCE up front so every iteration's join reuses
that exchange side.

Mass accounting: integer floor division loses < outdeg(v) pico-units
per node per iteration (and < 10000 at the final //10000), so total
mass drifts DOWN by < (n_edges + n_nodes) pico per iteration — at
1e-12 granularity that is parts-per-million after tens of iterations
on million-edge graphs. The drift is deterministic (same everywhere),
bounded, and reported (``sum_rank`` in ``pagerank_summary``); it is
the price of bit-exact cross-engine replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import release_local_checkpoint

SCALE = 1_000_000_000_000  # 1e12 pico-units of total rank mass


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping_bp: int = 8500,
    n_iter: int = 10,
    checkpoint_every: int = 4,
    seeds: DataFrame | None = None,
    broadcast_max_nodes: int = 5_000_000,
) -> DataFrame:
    """Integer fixed-point (personalized) PageRank over a directed
    edge list.

    Returns ``(node, rank)`` with ``rank`` the node's share of total
    mass in pico-units (longs summing to ~SCALE). Nodes are everything
    appearing as ``src`` or ``dst``; parallel duplicate edges should be
    de-duplicated upstream if unwanted (each duplicate counts as an
    extra out-link, the multigraph reading).

    ``seeds`` (a one-column frame of node ids) personalizes the walk:
    teleport and dangling mass flow ONLY to seed nodes and the walk
    starts there — the related-items / recommendations shape. Seeds
    not present in the graph are ignored; an empty effective seed set
    raises. ``seeds=None`` is classic PageRank (every node a seed).

    Per step, with D = damping_bp, S = number of seed nodes,
    T = SCALE // S, seed(v) in {0, 1}:

        new(v) = ((10000 - D) * T * seed(v)
                  + D * (sum_{u->v} rank(u) // outdeg(u)
                         + (dangling // S) * seed(v))) // 10000

    where ``dangling`` is the summed rank of zero-outdegree nodes and
    rank0(v) = T * seed(v). Exactly this formula — floors and all —
    is what the battery oracle replays in SQL; change it only in
    lockstep with the oracle.
    """
    if not 1 <= damping_bp <= 10000:
        raise ValueError("damping_bp must be in [1, 10000]")
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    # Pin the edge list ONCE: it is scanned every iteration, and an
    # expensive upstream subtree (e.g. a pair self-join + distinct)
    # would otherwise re-execute per iteration — the 6x cost the
    # entry's first benchmark run caught. localCheckpoint also
    # truncates the caller's lineage (SCALE.md rule #2). Deliberately
    # NOT repartitioned here: when the rank frame broadcasts (the
    # common case), edge partitioning is irrelevant and the extra
    # shuffle is pure waste; the sort-merge path re-pins by src below.
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint()
    # (node, deg, has_in): the node universe and BOTH degrees from ONE
    # union-tagged map-side-combined aggregate over the pinned edges
    # (round 15, guide §2.4/§1.2). The old init paid a distinct-union
    # shuffle for the node set, a second shuffle for outdeg, a join to
    # stitch them, and then THREE more driver actions — a count, a
    # dangling limit-probe, and a full distinct over every dst — just
    # to detect the regular-graph fast path. All of that now rides the
    # one state aggregate plus one tiny stats action below. deg stays
    # NULL for dangling nodes (same dtype and semantics as the old
    # count-based outdeg join).
    state = (
        e.selectExpr("src AS node", "1L AS _o", "0L AS _i")
        .unionAll(e.selectExpr("dst AS node", "0L AS _o", "1L AS _i"))
        .groupBy("node")
        .agg(F.expr("sum(_o) AS _od"), F.expr("sum(_i) AS _id"))
        .selectExpr("node", "IF(_od > 0, _od, NULL) AS deg", "(_id > 0) AS has_in")
    )
    if seeds is None:
        state = state.selectExpr("node", "deg", "has_in", "1L AS is_seed")
    else:
        seed_col = seeds.columns[0]
        flags = (
            seeds.select(F.col(seed_col).alias("node"))
            .distinct()
            .withColumn("is_seed", F.lit(1).cast("long"))
        )
        state = state.join(flags, "node", "left").selectExpr(
            "node", "deg", "has_in", "coalesce(is_seed, 0L) AS is_seed"
        )
    state = state.localCheckpoint()
    # ONE stats action answers node count, seed count, and the
    # regular-graph test (no dangling node AND every node has an
    # in-edge — exactly the old no-dangling + distinct-dst == n test).
    stats = state.selectExpr(
        "count(1) AS n",
        "sum(IF(deg IS NULL, 1, 0)) AS n_dangling",
        "sum(IF(has_in, 0, 1)) AS n_no_in",
        "sum(is_seed) AS n_seeds",
    ).collect()[0]
    n_nodes = stats.n
    if n_nodes == 0:
        return state.select("node", F.lit(0).cast("long").alias("rank"))
    if seeds is None:
        n_base = n_nodes
    else:
        n_base = stats.n_seeds
        if n_base == 0:
            raise ValueError("pagerank: no seed node exists in the graph")
    # Regular-graph fast path: a symmetric/undirected graph (the
    # common co-occurrence shape) has no zero-outdegree nodes AND no
    # pure sources (every node has an in-edge), so each superstep is
    # exactly ONE join (edge list x rank frame, deg pre-joined onto
    # the edges) + ONE map-combined groupBy — the dangling aggregate,
    # the teleport-only node fill and their joins all drop out, and
    # the chain stays LAZY (one job at the end, periodic checkpoints
    # only for lineage depth). Otherwise every superstep materializes
    # (Pregel-style): the next dangling aggregate is an independent
    # subtree, and without the checkpoint total work goes quadratic in
    # n_iter.
    no_dangling = stats.n_dangling == 0
    regular = no_dangling and stats.n_no_in == 0
    # pure 64-bit integer step (`div`, never `/` — double division
    # loses bits once quotients approach the double ulp at 1e12):
    # new = ((10000-D)*T*seed + D*(contrib [+ (dang div S)*seed])) div 10000
    teleport = (10000 - damping_bp) * (SCALE // n_base)

    def step_expr(dang_term: str) -> F.Column:
        return (
            F.expr(
                f"((({teleport}L * is_seed)"
                f" + {damping_bp}L * (coalesce(contrib, 0L)"
                f"{dang_term})) div 10000L)"
            )
            .cast("long")
            .alias("rank")
        )

    # A rank frame under ~5M nodes (~100 MB broadcast) rides a hinted
    # broadcast-hash join — no edge-side sort/shuffle per superstep.
    # Above that, the hint is withheld and the join sort-merges against
    # e's pinned src partitioning (the 1e9-node plan).
    hint_broadcast = n_nodes < broadcast_max_nodes
    if not hint_broadcast:
        # big-graph path: pay one shuffle now so every superstep's
        # sort-merge join reuses the src partitioning
        e = e.repartition("src").localCheckpoint()

    def rank_side(r: DataFrame) -> DataFrame:
        r = r.withColumnRenamed("node", "src")
        if hint_broadcast:
            return F.broadcast(r)
        # big-graph leg: SHUFFLED HASH, not sort-merge — SMJ re-sorts
        # the (pinned, far larger) edge side every superstep, measured
        # 3.7x the broadcast leg at 24M edges; hashing the rank side
        # (one row per node, the smaller side by the multigraph's
        # average degree) streams the edges unsorted. K=10 leg in
        # docs/SCALE.md (round 9).
        return r.hint("shuffle_hash")

    if regular:
        # deg and dst_is_seed tagged onto the pinned edges once (deg
        # read back from the pinned state instead of a fresh groupBy
        # over the edges), so the superstep's groupBy can carry the
        # flag without another join
        e_deg = (
            e.join(state.selectExpr("node AS src", "deg"), "src")
            .join(
                state.select(F.col("node").alias("dst"), "is_seed"), "dst"
            )
            .localCheckpoint()
        )
        ranks = state.select(
            "node",
            (F.lit(SCALE // n_base) * F.col("is_seed"))
            .cast("long")
            .alias("rank"),
        )
        # loop-invariant Columns built once (§7.3: construction is
        # driver-side py4j traffic; these are identical every round)
        share_cols = (
            F.col("dst"),
            F.col("is_seed"),
            F.expr("rank div deg").cast("long").alias("share"),
        )
        agg_cols = (
            F.sum("share").cast("long").alias("contrib"),
            F.max("is_seed").alias("is_seed"),
        )
        out_cols = (F.col("dst").alias("node"), step_expr(""))
        prev_pin = None
        for i in range(n_iter):
            ranks = (
                e_deg.join(rank_side(ranks), "src")
                .select(*share_cols)
                .groupBy("dst")
                .agg(*agg_cols)
                .select(*out_cols)
            )
            if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
                nxt = ranks.localCheckpoint()
                # the new eager checkpoint supersedes the previous one;
                # free its blocks now (unpersist() is a no-op for
                # checkpoints and the async cleaner lags whole jobs)
                if prev_pin is not None:
                    release_local_checkpoint(prev_pin)
                ranks = prev_pin = nxt
        return ranks

    ranks = state.select(
        "node",
        "deg",
        "is_seed",
        (F.lit(SCALE // n_base) * F.col("is_seed")).cast("long").alias("rank"),
    )
    # loop-invariant Columns built once (§7.3)
    live_filter = F.col("deg").isNotNull()
    share_cols = (
        F.col("dst"),
        F.expr("rank div deg").cast("long").alias("share"),
    )
    contrib_agg = F.sum("share").cast("long").alias("contrib")
    dang_agg = (
        F.coalesce(
            F.sum(F.when(F.col("deg").isNull(), F.col("rank"))), F.lit(0)
        )
        .cast("long")
        .alias("dang")
    )
    step_col = step_expr(f" + (dang div {n_base}L) * is_seed")
    prev_pin = None
    for i in range(n_iter):
        contrib = (
            e.join(rank_side(ranks.filter(live_filter)), "src")
            .select(*share_cols)
            .groupBy("dst")
            .agg(contrib_agg)
        )
        dangling = ranks.agg(dang_agg)
        ranks = (
            state.join(contrib, state["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select("node", "deg", "is_seed", step_col)
        )
        if i + 1 < n_iter:
            nxt = ranks.localCheckpoint()
            if prev_pin is not None:
                release_local_checkpoint(prev_pin)
            ranks = prev_pin = nxt
    return ranks.select("node", "rank")


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Weakly-connected components over an edge list: ``(node,
    component)`` with component = the minimum node id reachable.
    Thin graph-vocabulary front for the engine's battle-tested
    min-label-propagation + pointer-jumping resolver
    (operators/dedup.py:dup_clusters — O(log diameter) rounds,
    hybrid driver union-find below 200k pairs, oracled in the battery
    as dedup_clusters); one implementation, two vocabularies."""
    from .dedup import dup_clusters

    out = dup_clusters(
        edges.select(F.col(src).alias("id_a"), F.col(dst).alias("id_b"))
    )
    return out.select(
        F.col(out.columns[0]).alias("node"),
        F.col(out.columns[1]).alias("component"),
    )


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int | None = None,
) -> DataFrame:
    """Per-node triangle participation counts over an UNDIRECTED
    reading of the edge list — the local-clustering signal community
    detection and spam/botnet heuristics start from.

    Edges are canonicalized to ordered pairs (u < v, self-loops and
    duplicates dropped), each triangle a<b<c is found exactly once via
    the two-join wedge closure ((a,b)⋈(b,c) closed by (a,c)), then
    exploded to its three corners for the per-node count. Pure integer
    counts — bit-identical across engines, so the battery oracle is a
    plain three-way SQL self-join.

    Scale shape: wedge volume is sum(deg(v)^2) — quadratic in hub
    degree. ``max_degree`` drops nodes above the cap BEFORE the wedge
    join (the standard hub guard: a 10^6-degree hub contributes 10^12
    wedges and is never what a clustering signal wants anyway);
    triangles touching a dropped hub are not counted, stated loudly
    here. Canonical-id orientation keeps each wedge built once.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    if max_degree is not None:
        deg = (
            e.select(F.col("u").alias("n"))
            .union(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") > max_degree)
            .select("n")
        )
        e = e.join(
            F.broadcast(deg), e["u"] == deg["n"], "left_anti"
        ).join(F.broadcast(deg), e["v"] == deg["n"], "left_anti")
    # pin: consumed three times by the wedge closure
    e = e.localCheckpoint()
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    return (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


def pagerank_summary(ranks: DataFrame) -> DataFrame:
    """One-row mass audit for a pagerank result: node count, total
    retained mass (pico and basis points of SCALE), max rank."""
    return ranks.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.coalesce(F.sum("rank"), F.lit(0)).cast("long").alias("sum_rank"),
        F.floor(
            F.coalesce(F.sum("rank"), F.lit(0)) * F.lit(10000) / F.lit(SCALE)
        )
        .cast("long")
        .alias("sum_rank_bp"),
        F.coalesce(F.max("rank"), F.lit(0)).cast("long").alias("max_rank"),
    )
