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


def _ais_flagship(spark, sf: float) -> float:
    """The reference's own batch job (ais_analysis.py:main) at scale:
    synthesize an archive of ~500k*sf sentences by cycling the golden
    corpus with advancing tag-block times, then run the full
    decode -> as-of gold -> zone occupancy pipeline."""
    import json
    import tempfile

    from pincspark.analysis import batch_archive_analysis

    golden = json.load(open(os.path.join(os.path.dirname(__file__), "tests", "golden", "reference_decoded.json")))
    groups = [r["sentences"] for r in golden]
    n_msgs = max(int(500_000 * sf), len(groups))
    tmp = tempfile.mkdtemp(prefix="ais_bench_")
    path = os.path.join(tmp, "archive.log")
    with open(path, "w") as f:
        t = 1673222400
        for i in range(n_msgs):
            for s in groups[i % len(groups)]:
                f.write(f"\\s:rBENCH,c:{t}*00" + s + "\n")
            t += 1
    # A bench-scale archive is a few MB — one file split — which would pin
    # the scan-side tokenize/checksum stages to one core (at production
    # scale the archive naturally yields thousands of 128MB splits and this
    # knob is irrelevant). Split it so the whole pipeline uses the cluster.
    prev_split = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
    # Untimed warmup on a tiny archive: compiles the ~20 codegen stages of
    # the flagship DAG once, so the timed run measures the pipeline, not
    # janino (same policy as the catalog warmup above).
    wpath = os.path.join(tmp, "warmup.log")
    with open(wpath, "w") as f:
        for i in range(200):
            for s in groups[i % len(groups)]:
                f.write(f"\\s:rBENCH,c:{1673222400 + i}*00" + s + "\n")
    wgold, woccupancy = batch_archive_analysis(
        spark, wpath, gold_path=os.path.join(tmp, "gold_warm")
    )
    woccupancy.write.mode("overwrite").format("noop").save()

    t0 = time.time()
    try:
        # gold_path persists the gold table mid-pipeline (the reference
        # writes then analyzes, ais_analysis.py:477) — occupancy reads it
        # back instead of re-executing the decode DAG.
        gold, occupancy = batch_archive_analysis(
            spark, path, gold_path=os.path.join(tmp, "gold")
        )
        occupancy.write.mode("overwrite").format("noop").save()
        return time.time() - t0
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_split)


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

    # Spin up the Arrow Python-UDF worker pool (first pandas-UDF call pays
    # several seconds of worker fork + numpy/pandas import otherwise). One
    # task per core so EVERY worker is forked and warm, not just one.
    from pincspark.decode.kernel import decode_ais

    warm = spark.createDataFrame(
        [("15R9eN001n7DHvT13w0TBSM>00Rm",)] * (cpus * 2), "payload STRING"
    ).repartition(cpus * 2)
    decode_ais(warm).write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for name, (fn, _) in QUERIES.items():
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)

    timings["ais_flagship"] = round(_ais_flagship(spark, sf), 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "catalog_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }

    # Regression harness: compare against the best prior run at this sf
    # (bench_history.jsonl, committed per round). Machine noise here is
    # documented at up to ~2x, so regressions are REPORTED in the JSON and
    # on stderr rather than failing the run; >1.5x vs the best-known time
    # is the flag threshold.
    hist_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_history.jsonl")
    best: dict[str, float] = {}
    if os.path.exists(hist_path):
        for line in open(hist_path):
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("sf") != sf:
                continue
            for q, t in rec.get("queries", {}).items():
                if q not in best or t < best[q]:
                    best[q] = t
    regressions = {
        q: {"now": t, "best": best[q], "ratio": round(t / best[q], 2)}
        for q, t in timings.items()
        if q in best and best[q] > 0.2 and t > 1.5 * best[q]
    }
    if regressions:
        result["regressions"] = regressions
        print(f"WARN bench regressions vs best prior run: {regressions}", file=sys.stderr)
    with open(hist_path, "a") as f:
        f.write(json.dumps({"sf": sf, "value": total, "queries": timings}) + "\n")

    print(json.dumps(result))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
