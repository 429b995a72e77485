"""Session-size drift probe (VERDICT r9 #1 adjudication).

Hypothesis under test: the catalog-wide ~1.28x median-vs-bests inflation is
SESSION-SCALE overhead — per-query bests were set in rounds when the catalog
(and therefore the shared session's codegen class count, JIT code cache,
metaspace, broadcast registry) was ~40% smaller — rather than at-sf warmup
residue or box drift.

Method: run a handful of the flagged queries in a MINIMAL fresh session
(only those queries warmed, nothing else), 3 timed passes, and compare the
medians against (a) the full-catalog run's numbers and (b) the all-time
bests. If the mini-session medians return to ~best while the same box/same
code full-catalog run sits 1.5x+, the inflation is session-size, not
hardware — and the bests are simply from a smaller-session era, to be
rebaselined rather than chased.

Usage: python scripts/mini_session_probe.py [q24_nmea_validate,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT = [
    "q24_nmea_validate",
    "q34_static_report_sql",
    "q31_position_decode_sql",
    "q33_classb_longrange_sql",
    "q23_zone_occupancy",
    "q16_token_stats",
]


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    best = bench._best_per_query(0.1, bench._hist_path())

    from pincspark.plans.queries import QUERIES
    from pincspark.session import get_spark

    spark = get_spark("pincspark-mini-probe", cpus=cpus)
    from pincspark.sources.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.write.mode("overwrite").format("noop").save()
    for n in names:  # warm ONLY the probed queries
        QUERIES[n][0](spark, sf_dir).write.mode("overwrite").format("noop").save()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(3):
        for n in names:
            t0 = time.time()
            QUERIES[n][0](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            samples[n].append(round(time.time() - t0, 3))

    out = {}
    for n, runs in samples.items():
        med = bench._median(runs)
        out[n] = {
            "mini_median": med,
            "samples": runs,
            "best": best.get(n),
            "ratio_vs_best": round(med / best[n], 2) if n in best else None,
        }
    spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "probe": out}, indent=1))


if __name__ == "__main__":
    main()
