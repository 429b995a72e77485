"""Interleaved same-session A/B for env-gated variants.

Runs each named query alternately with the given env var unset (variant
NEW) and set to "1" (variant OLD), N rounds, in ONE warmed session —
box drift hits both variants equally. Prints per-variant medians.

Usage:
  python scripts/ab_probe.py q103,q83 --flag PINCSPARK_SKETCH_HASH_V1 \
      [--sf-dir /root/testdata/sf0.1] [--rounds 4]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries")
    ap.add_argument("--flag", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    from bench import _median
    from pincspark.plans.queries import QUERIES
    from pincspark.session import get_spark

    names = []
    for w in args.queries.split(","):
        w = w.strip()
        hits = [n for n in QUERIES if n == w or n.split("_")[0] == w]
        if not hits:
            print(f"no query matches {w!r}", file=sys.stderr)
            return 2
        names.extend(hits)

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark("pincspark-ab", cpus=cpus)

    def _run(name: str, old: bool) -> float:
        if old:
            os.environ[args.flag] = "1"
        else:
            os.environ.pop(args.flag, None)
        fn = QUERIES[name][0]
        t0 = time.time()
        fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    # warm both variants (janino compiles both plan shapes)
    for name in names:
        _run(name, True)
        _run(name, False)

    def _gc() -> None:
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    res: dict[str, dict[str, list[float]]] = {
        n: {"old": [], "new": []} for n in names
    }
    for _ in range(args.rounds):
        _gc()
        for name in names:
            res[name]["old"].append(_run(name, True))
            res[name]["new"].append(_run(name, False))

    out = {
        n: {
            "old_median": _median(v["old"]),
            "new_median": _median(v["new"]),
            "old": v["old"],
            "new": v["new"],
        }
        for n, v in res.items()
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
