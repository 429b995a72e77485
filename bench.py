"""Benchmark harness: runs the query catalog at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with the noop sink (full execution, no driver
materialization) after a JVM/scan warmup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from pincspark.plans.queries import QUERIES
from pincspark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("pincspark-bench", cpus=cpus)

    # Warm up JVM + file metadata so per-query timings measure the plans.
    from pincspark.sources.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for name, (fn, _) in QUERIES.items():
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
