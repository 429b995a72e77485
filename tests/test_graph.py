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


def test_partitioning_invariance(spark):
    edges = [(i, i // 2) for i in range(2, 40)] + [(i, i // 3) for i in range(4, 40)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = {r["node"]: r["rank"] for r in pagerank_int(df).collect()}
    b = {
        r["node"]: r["rank"]
        for r in pagerank_int(df.repartition(13)).collect()
    }
    assert a == b  # integer arithmetic: bit-identical under any layout
