"""Fast per-query timing harness for optimization A/Bs.

Times a comma-list of catalog queries (or 'flagship') in ONE warmed session
with the bench's noop-sink methodology — warmup pass, then N interleaved
timed passes, per-query median printed as one JSON line. Orders of
magnitude faster to iterate with than a full bench attempt; NOT an
official number (no flagship subprocess isolation, no load guard).

Usage:
  python scripts/qtime.py q103,q83 [--sf-dir /root/testdata/sf0.1] [--passes 5]
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
    ap.add_argument("queries", help="comma list of qNN prefixes")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=0)
    args = ap.parse_args()

    from bench import _median
    from pincspark.plans.queries import QUERIES
    from pincspark.session import get_spark

    want = [w.strip() for w in args.queries.split(",") if w.strip()]
    names = []
    for w in want:
        hits = [n for n in QUERIES if n == w or n.split("_")[0] == w]
        if not hits:
            print(f"no query matches {w!r}", file=sys.stderr)
            return 2
        names.extend(hits)

    cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (
        os.cpu_count() or 4
    )
    spark = get_spark("pincspark-qtime", cpus=cpus)

    def _run(name: str) -> float:
        fn = QUERIES[name][0]
        t0 = time.time()
        fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    # warmup (janino + page cache + AQE shapes at the timed sf)
    for name in names:
        _run(name)

    def _gc() -> None:
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.passes):
        _gc()
        for name in names:
            samples[name].append(_run(name))

    print(
        json.dumps(
            {
                "medians": {n: _median(r) for n, r in samples.items()},
                "samples": samples,
                "sf_dir": args.sf_dir,
                "cpus": cpus,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
