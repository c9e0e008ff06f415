"""Integer fixed-point PageRank (operators/graph.py).

The operator promises BIT-exact results (pure 64-bit integer steps),
so the tests compare against a pure-Python replay of the documented
formula — exact equality, no tolerances.
"""

import pytest

from factstore_spark.operators.graph import SCALE, pagerank, pagerank_summary


def _py_pagerank(edges, damping_bp=8500, n_iter=10, seeds=None):
    """Reference replay of the exact operator formula."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    seed = {
        v: (1 if seeds is None or v in seeds else 0) for v in nodes
    }
    s = sum(seed.values())
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    rank = {v: (SCALE // s) * seed[v] for v in nodes}
    t = (10000 - damping_bp) * (SCALE // s)
    for _ in range(n_iter):
        dang = sum(rank[v] for v in nodes if v not in outdeg)
        contrib = {v: 0 for v in nodes}
        for u, v in edges:
            contrib[v] += rank[u] // outdeg[u]
        rank = {
            v: (t * seed[v]
                + damping_bp * (contrib[v] + (dang // s) * seed[v]))
            // 10000
            for v in nodes
        }
    return rank


def _run(spark, edges, seeds=None, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    sdf = (
        spark.createDataFrame([(s,) for s in seeds], "node long")
        if seeds is not None
        else None
    )
    return {
        r["node"]: r["rank"]
        for r in pagerank(df, seeds=sdf, **kw).collect()
    }


RING = [(i, (i + 1) % 5) for i in range(5)]
STAR = [(1, 0), (2, 0), (3, 0), (0, 1)]
DANGLING = [(1, 2), (3, 2), (1, 3)]  # node 2 has no out-edges


@pytest.mark.parametrize("edges", [RING, STAR, DANGLING])
def test_matches_pure_python_replay_exactly(spark, edges):
    got = _run(spark, edges, n_iter=7)
    want = _py_pagerank(edges, n_iter=7)
    assert got == want


def test_ring_stays_uniform(spark):
    got = _run(spark, RING, n_iter=10)
    assert len(set(got.values())) == 1


def test_star_leaves_are_teleport_only(spark):
    """2 and 3 have no in-links: rank = teleport share, symmetric and
    strictly below the 0<->1 core that circulates all linked mass."""
    got = _run(spark, STAR, n_iter=10)
    assert got[2] == got[3] == min(got.values())
    assert min(got[0], got[1]) > got[2]


def test_mass_conservation_bound(spark):
    """Total mass drifts down by < (n_edges + n_nodes) pico per
    iteration — never up, never collapses."""
    edges, iters = DANGLING, 10
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = pagerank(df, n_iter=iters)
    s = pagerank_summary(ranks).collect()[0]
    assert s["n_nodes"] == 3
    assert s["sum_rank"] <= SCALE
    assert s["sum_rank"] >= SCALE - (len(edges) + 3 + 10000) * iters
    assert s["sum_rank_bp"] in (9999, 10000)


def test_bit_deterministic_across_partitionings(spark):
    edges = [(i % 23, (i * 7 + 3) % 23) for i in range(160)]
    edges = list({e for e in edges if e[0] != e[1]})
    df1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    df8 = spark.createDataFrame(edges, "src long, dst long").repartition(8)
    r1 = {r["node"]: r["rank"] for r in pagerank(df1, n_iter=6).collect()}
    r8 = {r["node"]: r["rank"] for r in pagerank(df8, n_iter=6).collect()}
    assert r1 == r8
    assert r1 == _py_pagerank(edges, n_iter=6)


def test_parallel_edges_count_as_extra_links(spark):
    """Multigraph semantics: a duplicated edge doubles that link's
    share (documented; dedup upstream if unwanted)."""
    plain = _run(spark, [(1, 2), (1, 3)], n_iter=3)
    doubled = _run(spark, [(1, 2), (1, 2), (1, 3)], n_iter=3)
    assert doubled[2] > plain[2]
    assert doubled == _py_pagerank([(1, 2), (1, 2), (1, 3)], n_iter=3)


def test_checkpointing_does_not_change_results(spark):
    edges = [(i % 11, (i * 5 + 1) % 11) for i in range(40) if i % 11 != (i * 5 + 1) % 11]
    a = _run(spark, edges, n_iter=8, checkpoint_every=2)
    b = _run(spark, edges, n_iter=8, checkpoint_every=100)
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame(RING, "src long, dst long")
    with pytest.raises(ValueError, match="damping_bp"):
        pagerank(df, damping_bp=0)
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(df, n_iter=0)


def test_checkpoint_every_validated(spark):
    df = spark.createDataFrame(RING, "src long, dst long")
    with pytest.raises(ValueError, match="checkpoint_every"):
        pagerank(df, checkpoint_every=0)


def test_personalized_matches_python_replay(spark):
    """PPR on a regular ring and on a dangling graph, exact replay."""
    got = _run(spark, RING, seeds=[0, 2], n_iter=7)
    assert got == _py_pagerank(RING, n_iter=7, seeds={0, 2})
    got = _run(spark, DANGLING, seeds=[1], n_iter=7)
    assert got == _py_pagerank(DANGLING, n_iter=7, seeds={1})


def test_personalized_mass_concentrates_near_seeds(spark):
    """Chain 0->1->2->3->4->0: seeding at 0 ranks nodes by walk
    distance from the seed."""
    got = _run(spark, RING, seeds=[0], n_iter=20)
    assert got[0] == max(got.values())
    assert got[1] > got[2] > got[3]


def test_seeds_all_nodes_equals_classic(spark):
    edges = [(i % 13, (i * 5 + 2) % 13) for i in range(50)]
    edges = [e for e in edges if e[0] != e[1]]
    classic = _run(spark, edges, n_iter=6)
    seeded = _run(spark, edges, seeds=list(range(13)), n_iter=6)
    assert classic == seeded


def test_unknown_seeds_ignored_empty_raises(spark):
    got = _run(spark, RING, seeds=[0, 999], n_iter=3)
    assert got == _py_pagerank(RING, n_iter=3, seeds={0})
    df = spark.createDataFrame(RING, "src long, dst long")
    sdf = spark.createDataFrame([(999,)], "node long")
    with pytest.raises(ValueError, match="no seed node"):
        pagerank(df, seeds=sdf)


def test_non_seed_rank_zero_when_unreachable(spark):
    """Two disconnected pairs; seeding one leaves the other at 0."""
    edges = [(1, 2), (2, 1), (3, 4), (4, 3)]
    got = _run(spark, edges, seeds=[1], n_iter=8)
    assert got[3] == got[4] == 0
    assert got[1] > 0 and got[2] > 0


# ---------------------------------------------------------------------------
# triangle_counts
# ---------------------------------------------------------------------------

from factstore_spark.operators.graph import triangle_counts  # noqa: E402


def _tri(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(df, **kw).collect()
    }


def _py_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c <= b:
                    continue
                for n in (a, b, c):
                    counts[n] = counts.get(n, 0) + 1
    return counts


def test_k4_every_node_in_three_triangles(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _tri(spark, k4)
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_square_has_no_triangles(spark):
    got = _tri(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert got == {}


def test_direction_duplicates_and_loops_ignored(spark):
    tri = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    got = _tri(spark, tri)
    assert got == {1: 1, 2: 1, 3: 1}


def test_matches_python_brute_force(spark):
    import random

    rnd = random.Random(20260815)
    edges = list(
        {
            tuple(sorted((rnd.randrange(15), rnd.randrange(15))))
            for _ in range(60)
        }
    )
    edges = [e for e in edges if e[0] != e[1]]
    assert _tri(spark, edges) == _py_triangles(edges)


def test_max_degree_drops_hub_triangles(spark):
    # star hub 0 connected to 1..5, plus triangle 1-2 closes via hub;
    # separate triangle 7-8-9 untouched by the cap
    edges = [(0, i) for i in range(1, 6)] + [(1, 2), (7, 8), (8, 9), (7, 9)]
    full = _tri(spark, edges)
    assert full[0] == 1 and full[7] == 1
    capped = _tri(spark, edges, max_degree=3)
    # hub (deg 5) dropped: its triangle disappears, 7-8-9 survives
    assert 0 not in capped
    assert capped == {7: 1, 8: 1, 9: 1}


def test_big_graph_path_no_broadcast_same_results(spark):
    """broadcast_max_nodes=0 forces the 1e9-node plan: ranks hash-join
    (shuffled-hash hint — measured 1.4x over sort-merge at 24M edges,
    docs/SCALE.md round 9) against src-pinned edges, results
    bit-identical."""
    edges = [(i % 17, (i * 3 + 1) % 17) for i in range(80)]
    edges = [e for e in edges if e[0] != e[1]]
    df = spark.createDataFrame(edges, "src long, dst long")
    small = pagerank(df, n_iter=5)
    big = pagerank(df, n_iter=5, broadcast_max_nodes=0)
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan, plan  # non-vacuous: superstep join visible
    assert "BroadcastHashJoin" not in plan
    # the superstep join must take the hinted shuffled-hash strategy,
    # not fall back to sort-merge (which re-sorts the edge side per
    # superstep)
    assert "ShuffledHashJoin" in plan, plan
    assert {(r["node"], r["rank"]) for r in small.collect()} == {
        (r["node"], r["rank"]) for r in big.collect()
    }


def test_connected_components_front(spark):
    from factstore_spark.operators.graph import connected_components

    edges = [(1, 2), (2, 3), (10, 11), (20, 20)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10
    assert got[20] == 20
