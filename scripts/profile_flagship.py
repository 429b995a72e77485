"""Stage-timeline profile of the flagship at a given sf (default 0.1).

Runs the same synth-archive + warmup protocol as bench.py's flagship child,
then breaks ONE timed run into its stage barriers:

  A. scan -> tokenize -> checksum -> reassemble (staged valid frame)
  B. decode (Arrow kernel) + eager localCheckpoint barrier
  C. gold build (position/static fan-out + as-of join) + parquet write
  D. gold read-back -> spatial join -> occupancy agg -> noop

Usage: python scripts/profile_flagship.py [sf]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _flagship_once, _synth_archives  # noqa: E402
from pincspark.session import get_spark  # noqa: E402


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    path, wpath, tmp = _synth_archives(sf)
    spark = get_spark("pincspark-flagship-profile", cpus=cpus)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")

    # same warmup protocol as the bench child
    _flagship_once(spark, wpath, os.path.join(tmp, "gold_warm"))
    for w in ("gold_warm2", "gold_warm3"):
        _flagship_once(spark, path, os.path.join(tmp, w))

    from pyspark.sql import functions as F

    from pincspark.analysis import build_gold, position_frame, static_frame
    from pincspark.decode.kernel import decode_ais
    from pincspark.operators.geo import spatial_join
    from pincspark.sources.nmea_source import (
        read_archive,
        reassemble,
        tokenize_sentences,
        with_tagblock_ts,
    )
    from pincspark.staging import stage

    for run in range(3):
        gold_path = os.path.join(tmp, f"gold_prof{run}")
        t0 = time.time()
        df = tokenize_sentences(with_tagblock_ts(read_archive(spark, path)))
        reassembled = reassemble(df)
        reassembled = stage(reassembled, "profile:reassembled", eager=True)
        t1 = time.time()
        decoded = decode_ais(reassembled, plan_barrier=True)
        decoded = stage(decoded, "profile:decoded", eager=True)
        t2 = time.time()
        gold = build_gold(position_frame(decoded), static_frame(decoded))
        gold.write.mode("overwrite").parquet(gold_path)
        t3 = time.time()
        gold_rb = spark.read.parquet(gold_path)
        in_zones = spatial_join(gold_rb.filter(F.col("longitude").isNotNull()), zones=None)
        occupancy = in_zones.groupBy("zone_id", "zone_name").agg(
            F.countDistinct("mmsi").alias("n_vessels"),
            F.count(F.lit(1)).alias("n_reports"),
        )
        occupancy.write.mode("overwrite").format("noop").save()
        t4 = time.time()
        print(
            f"run{run}: total={t4-t0:.3f}  reassemble={t1-t0:.3f}  "
            f"decode={t2-t1:.3f}  gold={t3-t2:.3f}  occupancy={t4-t3:.3f}"
        )

    # and one composed run for comparison (what bench actually measures)
    for run in range(3):
        t = _flagship_once(spark, path, os.path.join(tmp, f"gold_comp{run}"))
        print(f"composed run{run}: {t:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
