"""Iterative graph ranking over edge tables — the authority-prior signal
(PageRank) a web-scale curation pipeline uses as a document/domain quality
feature (alongside the CCNet/DSIR content signals in `operators/lm.py`).

Design notes (100 TB):
- Power iteration is joins + aggregations only: the edge table is staged
  ONCE, hash-partitioned on its source key (the checkpoint's LogicalRDD
  preserves outputPartitioning), and every round's rank join co-locates
  against it with no edge exchange; the previous round's ranks checkpoint
  is already hash(node)-partitioned from its own join, so the steady-state
  iteration runs with exactly ONE exchange — the contribution groupBy on
  the destination key (node-sized after partial aggregation; pinned by
  tests/test_graph.py::test_pagerank_iteration_never_reshuffles_edges).
  Partial aggregation combines a hot destination's inflow map-side, so a
  celebrity node never funnels raw contribution rows through one task.
- **Integer fixed-point arithmetic** (BIGINT micro-units, truncating
  division): floating-point PageRank sums in shuffle order, so two runs —
  or two engines — disagree in the last ulp and a value-hash oracle goes
  red (the q59 driver-red class). With integer contributions the sum is
  exact and associative: Spark and DuckDB produce bit-identical ranks,
  making the operator value-hash gateable at ANY scale.
- Lineage per round is truncated the same way dedup_clusters does,
  through ``pincspark.staging.stage`` — localCheckpoint by default,
  reliable ``checkpoint()`` when the session sets
  ``spark.pincspark.staging=reliable`` (tests/test_staging.py pins
  result equality across modes).

Related public art: the PageRank example shipped with Spark and the
GraphX/Pregel formulation; this is the DataFrame-native, deterministic
re-expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pincspark.staging import stage

SCALE = 10**12  # 1.0 of rank mass == 10^12 micro-units


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Deterministic integer PageRank: ``iters`` power iterations at
    damping ``damping_num/damping_den`` over the directed edge table,
    entirely in BIGINT micro-units (``SCALE`` = rank 1.0).

    Per round, every node's new rank is

        base + d * inflow,   base = SCALE*(den-num) div (den*n)
        inflow = sum over in-edges of (rank(src) div out_degree(src))
        d * x  = damping_num * x div damping_den

    with truncating integer division throughout — the exact arithmetic an
    ANSI-SQL oracle reproduces bit-for-bit. Dangling-node mass (nodes with
    no out-edges) is NOT redistributed; with a fixed iteration count the
    ranking signal is unaffected and the arithmetic stays join-local
    (documented deviation from the normalized formulation).

    Returns (node, rank) with ranks in micro-units (BIGINT).
    """
    e = stage(
        edges.select(
            F.col(src).cast("bigint").alias("e_src"),
            F.col(dst).cast("bigint").alias("e_dst"),
        ).repartition(F.col("e_src")),
        "pagerank:edges",
        eager=False,
    )
    # Staged once, read by every round's join + out_deg + nodes — without
    # this the final action re-derives the edge scan ~2x per iteration.
    # Hash-partitioned on e_src BEFORE the checkpoint (LogicalRDD preserves
    # outputPartitioning), so each power iteration's rank join exchanges
    # only the node-sized ranks table, never the corpus-sized edge table —
    # at 100 TB of edges that is the difference between one staging shuffle
    # and `iters` full-table shuffles (VERDICT r10 #1).
    nodes = stage(
        e.select(F.col("e_src").alias("node"))
        .union(e.select(F.col("e_dst").alias("node")))
        .distinct(),
        "pagerank:nodes",
        eager=False,
    )  # consumed by n_df + ranks
    # n as a 1-row broadcast (the q67/q68 bounded cross-join idiom):
    # bounded by construction, never a corpus-scale nested loop.
    n_df = nodes.agg(F.count(F.lit(1)).alias("__n"))
    # Derived from the e_src-partitioned edges — the groupBy needs no
    # exchange; checkpointed so iterations rescan a node-sized local RDD
    # (hash(d_node)-partitioned, alias-aware) instead of re-aggregating.
    out_deg = stage(
        e.groupBy(F.col("e_src").alias("d_node")).agg(
            F.count(F.lit(1)).alias("out_deg")
        ),
        "pagerank:out_deg",
        eager=False,
    )
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", F.expr(f"{SCALE} div __n").alias("rank"), "__n"
    )
    base_expr = F.expr(
        f"{SCALE * (damping_den - damping_num)} div ({damping_den} * __n)"
    )
    for it in range(iters):
        contrib = (
            e.join(ranks.select(F.col("node").alias("r_node"), "rank"),
                   F.col("e_src") == F.col("r_node"))
            .join(out_deg, F.col("e_src") == F.col("d_node"))
            .select(
                F.col("e_dst").alias("node"),
                F.expr("rank div out_deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = stage(
            ranks.select("node", "__n")
            .join(contrib, "node", "left")
            .select(
                "node",
                (
                    base_expr
                    + F.expr(
                        f"{damping_num} * coalesce(inflow, CAST(0 AS BIGINT)) "
                        f"div {damping_den}"
                    )
                ).cast("bigint").alias("rank"),
                "__n",
            ),
            f"pagerank:iter{it}",
            eager=False,
        )
    return ranks.select("node", "rank")


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over the undirected simple graph induced
    by ``edges`` — the classic link-spam / community-density signal next
    to the PageRank authority prior (a page whose neighborhood closes
    many triangles is embedded in a clique-ish link farm or a genuine
    community; both matter to corpus curation).

    Algorithm (degree-ordered orientation, the standard shuffle-bounded
    formulation — cf. the Cohen / Suri-Vassilvitskii MapReduce scheme):

    1. canonicalize to undirected simple edges (least, greatest),
       dropping self-loops and duplicate/multiset edges;
    2. orient every edge from its lower-rank to higher-rank endpoint,
       rank = (degree, node) — a total order, ties broken by node id;
    3. wedges: self-join oriented edges on the tail ``a``; order the two
       heads by the same rank so each unordered head pair appears once;
    4. close: a wedge (a; x, y) with rank(x) < rank(y) is a triangle iff
       the oriented edge (x, y) exists — one semi-join.

    Every triangle {x, y, z} with rank x < y < z is counted exactly once
    (as the wedge at its lowest-rank apex x), so per-node counts are
    exact integers — value-hash gateable against an ANSI-SQL oracle.

    100 TB: orientation bounds every out-neighborhood by O(sqrt(m)) —
    the wedge join's fan-out per tail is out_deg^2, which degree
    ordering caps where a naive src-join explodes on celebrity nodes.
    Shuffles: degree agg (node), two orientation joins (node), wedge
    join (tail a), closing semi-join ((x, y) pair keys) — all key-hash
    exchanges, no cartesian anywhere. The oriented edge table is staged
    once (localCheckpoint / reliable checkpoint via pincspark.staging)
    and read by both sides of the wedge join and the closing semi-join.

    Returns (node BIGINT, n_tri BIGINT) for nodes in >= 1 triangle.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).cast("bigint").alias("u"),
            F.greatest(F.col(src), F.col(dst)).cast("bigint").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    lab = und.join(
        deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u"
    ).join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    lo_is_u = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = stage(
        lab.select(
            F.when(lo_is_u, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lo_is_u, F.col("v")).otherwise(F.col("u")).alias("b"),
            # rank key of the HEAD (b): the wedge filter orders head pairs
            F.when(lo_is_u, F.col("dv")).otherwise(F.col("du")).alias("bdeg"),
        ),
        "triangles:oriented",
        eager=False,
    )
    e1 = oriented.select("a", F.col("b").alias("x"), F.col("bdeg").alias("xdeg"))
    e2 = oriented.select("a", F.col("b").alias("y"), F.col("bdeg").alias("ydeg"))
    wedges = e1.join(e2, "a").filter(
        (F.col("xdeg") < F.col("ydeg"))
        | ((F.col("xdeg") == F.col("ydeg")) & (F.col("x") < F.col("y")))
    )
    tri = wedges.join(
        oriented.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
        "left_semi",
    )
    return (
        tri.select(F.explode(F.array("a", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
