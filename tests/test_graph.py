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


def test_partitioning_invariance(spark):
    edges = [(i, i // 2) for i in range(2, 40)] + [(i, i // 3) for i in range(4, 40)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = {r["node"]: r["rank"] for r in pagerank_int(df).collect()}
    b = {
        r["node"]: r["rank"]
        for r in pagerank_int(df.repartition(13)).collect()
    }
    assert a == b  # integer arithmetic: bit-identical under any layout
