"""Dense-graph depth probe for triangle_count (VERDICT r12 #5).

The q97 catalog graph (div-2 / div-3 / sibling links) is sparse — per-node
degree ~6 — so its 64x slope mostly measures the edge shuffles, not the
wedge self-join that dominates on dense graphs. This probe builds the
overlapping-window graph (every node linked to its K predecessors, the
same construction tests/test_graph.py pins for correctness) and measures
the two axes that matter at 100 TB:

  - N axis (fixed K): corpus growth at constant density — must be linear.
  - K axis (fixed N): density growth — wedge work is N*K^2/2 by
    construction, so runtime should track K^2 and NOT worse (a
    worse-than-K^2 curve would mean the operator adds cost beyond the
    work the answer itself requires).

Usage: python scripts/tri_dense_probe.py [--n 200000] [--nscales 8,64] [--ks 4,8,16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def window_graph(spark, n: int, k: int):
    """Edges i -> i-j for j in 1..K over n nodes, minted distributed
    (sequence explode, no driver-side list)."""
    return (
        spark.range(n)
        .select(F.col("id").alias("src"), F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j"))
        .filter(F.col("src") - F.col("j") >= 0)
        .select("src", (F.col("src") - F.col("j")).alias("dst"))
    )


def timed(spark, n: int, k: int, runs: int = 2) -> float:
    from pincspark.operators.graph import triangle_count

    best = float("inf")
    for _ in range(runs + 1):  # first iteration is the warmup
        t0 = time.time()
        triangle_count(window_graph(spark, n, k)).write.mode("overwrite").format(
            "noop"
        ).save()
        best = min(best, time.time() - t0) if _ else best
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--nscales", default="8,64")
    ap.add_argument("--ks", default="4,8,16")
    args = ap.parse_args()

    from pincspark.session import get_spark

    spark = get_spark("tri-dense-probe")
    spark.sparkContext.setLogLevel("ERROR")

    base_n, base_k = 50_000, 8
    t_base = timed(spark, base_n, base_k)
    print(f"N axis  (K={base_k}): N={base_n}: {t_base:.2f}s", flush=True)
    for s in (int(x) for x in args.nscales.split(",")):
        t = timed(spark, base_n * s, base_k)
        print(f"N axis  (K={base_k}): N={base_n * s} ({s}x): {t:.2f}s  ratio {t / t_base:.1f}x", flush=True)

    ks = [int(x) for x in args.ks.split(",")]
    t_k0 = timed(spark, args.n, ks[0])
    print(f"K axis  (N={args.n}): K={ks[0]}: {t_k0:.2f}s", flush=True)
    for k in ks[1:]:
        t = timed(spark, args.n, k)
        wedge_ratio = (k * k) / (ks[0] * ks[0])
        print(
            f"K axis  (N={args.n}): K={k}: {t:.2f}s  ratio {t / t_k0:.1f}x "
            f"(wedge-work ratio {wedge_ratio:.0f}x)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
