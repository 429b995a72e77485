"""pagerank_int structural properties (the q90 oracle pins exact values;
these pin the invariants that survive any graph)."""

from __future__ import annotations

from pincspark.operators.graph import SCALE, pagerank_int


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["node"]: r["rank"] for r in pagerank_int(df, **kw).collect()}


def test_star_hub_outranks_leaves(spark):
    # leaves 1..5 all cite hub 0; hub cites leaf 1 (so it has out-edges)
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    got = _ranks(spark, edges)
    hub = got[0]
    assert all(hub > got[i] for i in range(2, 6))
    assert got[1] > got[2]  # leaf 1 gets the hub's mass on top of base


def test_mass_conserved_up_to_truncation_and_dangling(spark):
    # ring graph: no dangling nodes, so total mass stays ~SCALE (each
    # truncating div loses < 1 micro-unit per node per round)
    n = 8
    edges = [(i, (i + 1) % n) for i in range(n)]
    got = _ranks(spark, edges)
    total = sum(got.values())
    assert SCALE - 10 * n <= total <= SCALE
    # perfect symmetry: every ring node ends with the identical rank
    assert len(set(got.values())) == 1


def model_pagerank(edges, iters=3, num=85, den=100):
    """Pure-Python integer model of the documented contract."""
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    out_deg: dict = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    rank = {v: SCALE // n for v in nodes}
    for _ in range(iters):
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += rank[s] // out_deg[s]
        base = SCALE * (den - num) // (den * n)
        rank = {v: base + num * inflow[v] // den for v in nodes}
    return rank


def test_random_graphs_match_integer_model(spark):
    """Random multigraphs (self-loop-free, duplicate edges allowed) must
    match the executable integer model bit-for-bit — covers shapes the
    fixed q90 citation graph cannot (cycles, multi-edges, dangling
    nodes, disconnected islands)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(
        st.lists(
            st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(
                lambda e: e[0] != e[1]
            ),
            min_size=1,
            max_size=25,
        )
    )
    def inner(edges):
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r["node"]: r["rank"] for r in pagerank_int(df).collect()}
        assert got == model_pagerank(edges)

    inner()


def test_pagerank_iteration_never_reshuffles_edges(spark):
    """The VERDICT r10 scale-killer, pinned: with the edge table staged
    hash(e_src)-partitioned, every steady-state power iteration must plan
    exactly ONE exchange — the contribution groupBy on the destination key
    (node-sized after partial agg) — and NEVER re-exchange the edge table.
    iter0 additionally carries the bounded 1-row ``__n`` broadcast plumbing
    (SinglePartition + IdentityBroadcast of a count aggregate), so the hard
    bound there is "no hash exchange keyed on an edge-table column".

    AQE and auto-broadcast are disabled for the inspection so the initial
    physical plan is deterministic (the tiny test graph would otherwise BHJ
    everything and hide the partitioning contract this test exists to pin).
    """
    from pincspark.planhooks import capture_staged_plans

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        edges = [(i, i // 2) for i in range(2, 40)]
        df = spark.createDataFrame(edges, ["src", "dst"])
        with capture_staged_plans() as sink:
            pagerank_int(df, iters=3)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    plans = dict(sink)
    assert set(plans) >= {"pagerank:edges", "pagerank:out_deg",
                          "pagerank:iter0", "pagerank:iter1", "pagerank:iter2"}
    # staging: the ONE edge shuffle, on the join key
    assert "Exchange hashpartitioning(e_src" in plans["pagerank:edges"]
    # out_deg rides the staged partitioning — zero exchanges
    assert "Exchange" not in plans["pagerank:out_deg"]
    for it in ("iter0", "iter1", "iter2"):
        plan = plans[f"pagerank:{it}"]
        # the edge table (e_src/e_dst columns) is never re-exchanged
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "e_src" not in line and "e_dst" not in line, (it, line)
    # steady-state iterations: exactly one exchange total, on `node`
    for it in ("iter1", "iter2"):
        plan = plans[f"pagerank:{it}"]
        ex_lines = [l for l in plan.splitlines() if "Exchange" in l]
        assert len(ex_lines) == 1 and "hashpartitioning(node" in ex_lines[0], (
            it, ex_lines)


def test_partitioning_invariance(spark):
    edges = [(i, i // 2) for i in range(2, 40)] + [(i, i // 3) for i in range(4, 40)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = {r["node"]: r["rank"] for r in pagerank_int(df).collect()}
    b = {
        r["node"]: r["rank"]
        for r in pagerank_int(df.repartition(13)).collect()
    }
    assert a == b  # integer arithmetic: bit-identical under any layout


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------

from pincspark.operators.graph import triangle_count  # noqa: E402


def _tri(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["node"]: r["n_tri"] for r in triangle_count(df).collect()}


def test_k4_every_node_in_three_triangles(spark):
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _tri(spark, edges)
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # K4: C(3,2)=3 per node, 4 total


def test_square_without_diagonal_has_none(spark):
    got = _tri(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert got == {}


def test_star_has_none(spark):
    got = _tri(spark, [(0, i) for i in range(1, 8)])
    assert got == {}


def test_multiset_reversed_and_self_loop_edges_canonicalize(spark):
    # K3 given as duplicates, both directions, plus a self loop: the
    # undirected simple graph is one triangle.
    edges = [(0, 1), (1, 0), (0, 1), (1, 2), (2, 1), (0, 2), (2, 2)]
    got = _tri(spark, edges)
    assert got == {0: 1, 1: 1, 2: 1}


def test_two_triangles_sharing_an_edge(spark):
    # {0,1,2} and {0,1,3}: nodes 0/1 sit in both, 2/3 in one each.
    got = _tri(spark, [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)])
    assert got == {0: 2, 1: 2, 2: 1, 3: 1}


def test_triangle_count_matches_brute_force_on_random_graph(spark):
    import itertools
    import random

    rng = random.Random(1207)
    nodes = list(range(24))
    edges = sorted(
        {(a, b) for a in nodes for b in nodes if a < b and rng.random() < 0.25}
    )
    got = _tri(spark, [list(e) for e in edges])
    eset = set(edges)
    expect: dict[int, int] = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in eset and (x, z) in eset and (y, z) in eset:
            for n in (x, y, z):
                expect[n] = expect.get(n, 0) + 1
    assert got == expect


def test_triangle_count_on_dense_window_graph(spark):
    """Dense overlapping-window graph (every node links to its K
    predecessors): each oriented node carries out-degree ~K, so the
    wedge self-join has real K^2 fan-out — the stage the sparse minted
    graphs barely touch (VERDICT r12 #5). A triangle {a<b<c} exists
    iff c - a <= K, so expected counts come from an exhaustive window
    enumeration."""
    n, k = 300, 8
    edges = [[i, i - j] for i in range(n) for j in range(1, k + 1) if i - j >= 0]
    got = _tri(spark, edges)

    expect: dict[int, int] = {}
    for a in range(n):
        for b in range(a + 1, min(a + k, n - 1) + 1):
            for c in range(b + 1, min(a + k, n - 1) + 1):
                for m in (a, b, c):
                    expect[m] = expect.get(m, 0) + 1
    assert got == expect
    # density sanity: interior nodes participate in 3*C(K,2) triangles
    assert expect[n // 2] == 3 * (k * (k - 1) // 2)
