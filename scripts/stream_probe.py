"""Streaming throughput slopes for the stateful operators.

``--op zones`` (default) probes the ST2 zone state machine;
``--op encounters`` probes the r13 pair-encounter detector — fleet
grows with AREA (constant traffic density, the honest growth model:
pair output is density-bound, so growing density measures the answer
size, not the operator), state sharded by (bucket, cell).

The batch operators have measured cost curves (scale_probe.py); this
probe answers the streaming question: does micro-batch throughput
through `track_zone_transitions` (applyInPandasWithState — per-key
in/out state, enter/exit event emission) hold as event volume and key
cardinality grow? It generates synthetic vessel tracks (deterministic
zig-zag across the TSS zone polygons — every vessel produces real
enter/exit transitions, so the state machine does real work), runs the
streaming query with an availableNow-style full drain over 1x and kx
volumes, and prints events/sec at each scale.

Scaling model: kx = k times the VESSELS, same track length per vessel —
a bigger fleet, not deeper per-key state — matching how an AIS feed
actually grows. Per-key state size is constant; the state store grows
in key count; a flat events/sec curve means the operator is
shuffle/state-bound, not key-bound.

Usage: python scripts/stream_probe.py [--base 100000] [--scale 8]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _inside_point(spark) -> tuple[float, float]:
    """A (lon, lat) that actually sits inside a zone polygon, discovered
    by flagging candidate points (vertex-pair midpoints + running
    centroids) through the production point-in-polygon path — no
    hand-maintained magic coordinates to go stale."""
    import json

    from pincspark.operators.geo import zones_df
    from pincspark.streaming.zones import with_zone_flags

    zpath = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "pincspark", "data", "tss_zones.json",
    )
    coords = json.load(open(zpath))[0]["coordinates"]
    cands = [
        ((a[0] + b[0]) / 2, (a[1] + b[1]) / 2)
        for a, b in zip(coords, coords[1:])
    ]
    k = max(3, len(coords) // 4)
    cands.append(
        (sum(c[0] for c in coords[:k]) / k, sum(c[1] for c in coords[:k]) / k)
    )
    df = spark.createDataFrame(
        [(i, 1700000000 + i, lon, lat) for i, (lon, lat) in enumerate(cands)],
        "mmsi BIGINT, epoch BIGINT, longitude DOUBLE, latitude DOUBLE",
    ).withColumn("ts", __import__("pyspark").sql.functions.timestamp_seconds("epoch"))
    flagged = with_zone_flags(df, zones_df(spark))
    zcol = next(c for c in flagged.columns if c not in df.columns)
    hit = flagged.filter(f"{zcol} IS NOT NULL").select("longitude", "latitude").first()
    if hit is None:
        raise SystemExit("no candidate point landed inside a zone polygon")
    return hit["longitude"], hit["latitude"]


def _tracks(spark, vessels: int, events_per_vessel: int, inside):
    """Deterministic fleet: every vessel zig-zags across the zone
    boundary every 4 steps (inside point discovered from the polygons),
    so the state machine emits enter/exit transitions continuously."""
    from pyspark.sql import functions as F

    lon_in, lat_in = inside
    n = vessels * events_per_vessel
    return (
        spark.range(n)
        .select(
            (F.col("id") % vessels + 100000).alias("mmsi"),
            (F.col("id") / vessels).cast("long").alias("step"),
        )
        .select(
            "mmsi",
            F.timestamp_seconds(F.lit(1700000000) + F.col("step") * 60).alias("ts"),
            F.lit(lon_in).alias("longitude"),
            F.when(
                (F.col("step") / 4).cast("long") % 2 == 0, F.lit(lat_in)
            ).otherwise(F.lit(lat_in + 10.0)).alias("latitude"),
        )
    )


def _drain(q) -> None:
    while q.isActive:
        q.processAllAvailable()
        if not q.status["isDataAvailable"]:
            break
    q.stop()
    q.awaitTermination(60)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=100_000, help="events at 1x")
    ap.add_argument("--scale", type=int, default=8)
    ap.add_argument("--events-per-vessel", type=int, default=50)
    ap.add_argument(
        "--op", choices=("zones", "encounters", "census"), default="zones"
    )
    args = ap.parse_args()
    if args.op == "encounters":
        return _encounters_probe(args)
    if args.op == "census":
        return _census_probe(args)

    from pincspark.operators.geo import zones_df
    from pincspark.session import get_spark
    from pincspark.streaming.zones import track_zone_transitions, with_zone_flags

    spark = get_spark("pincspark-stream-probe")
    spark.sparkContext.setLogLevel("ERROR")
    inside = _inside_point(spark)
    print(f"inside point: {inside}", file=sys.stderr)
    results = {}
    for tag, n_events in (("1x", args.base), (f"{args.scale}x", args.base * args.scale)):
        vessels = max(1, n_events // args.events_per_vessel)
        tmp = tempfile.mkdtemp(prefix="pincspark_stream_probe_")
        try:
            src = os.path.join(tmp, "pos")
            flagged = with_zone_flags(
                _tracks(spark, vessels, args.events_per_vessel, inside),
                zones_df(spark),
            )
            flagged.write.parquet(src)
            schema = spark.read.parquet(src).schema
            stream = spark.readStream.schema(schema).parquet(src)
            sink = f"probe_{tag.replace('x', '')}"
            t0 = time.time()
            q = (
                track_zone_transitions(stream, timeout_ms=None)
                .writeStream.format("memory")
                .queryName(sink)
                .outputMode("append")
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .start()
            )
            _drain(q)
            wall = time.time() - t0
            transitions = spark.sql(f"SELECT count(*) c FROM {sink}").collect()[0]["c"]
            results[tag] = {
                "events": n_events,
                "vessels": vessels,
                "wall_s": round(wall, 2),
                "events_per_sec": int(n_events / wall),
                "transitions": transitions,
            }
            print(f"{tag}: {results[tag]}", flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    r1, rk = results["1x"], results[f"{args.scale}x"]
    print(
        f"throughput ratio {args.scale}x/1x: "
        f"{rk['events_per_sec'] / r1['events_per_sec']:.2f} "
        f"(1.0 = perfectly flat; >{1/args.scale:.2f} required for sublinear wall)"
    )
    spark.stop()




def _encounter_fleet(spark, vessels: int, fixes_per_vessel: int):
    """Deterministic fleet over an area PROPORTIONAL to fleet size
    (constant density ~4 vessels per 0.05-degree cell): lat/lon walk
    inside each vessel's home cell, so close pairs exist in every cell
    but candidate volume per cell is bounded."""
    from pyspark.sql import functions as F

    # 4 vessels per cell BY CONSTRUCTION (cell = mmsi div 4 laid out on a
    # sqrt grid): every cell holds close pairs at every scale, and density
    # stays constant as the fleet grows — the AREA grows instead (the
    # honest growth model; growing density measures answer size).
    cells = max(1, vessels // 4)
    side = int(cells ** 0.5) + 1
    cell = F.expr("CAST(mmsi div 4 AS BIGINT)")
    return (
        spark.range(vessels)
        .select(
            F.col("id").alias("mmsi"),
            F.explode(F.sequence(F.lit(0), F.lit(fixes_per_vessel - 1))).alias("k"),
        )
        .select(
            "mmsi",
            F.timestamp_seconds(F.lit(1700000000) + F.col("k") * 60).alias("ts"),
            (F.lit(1.0)
             + (cell % F.lit(side)) * F.lit(0.05)
             + (F.col("mmsi") % 4) * F.lit(0.003)       # in-cell vessel spread
             + (F.col("k") % 10) * F.lit(0.001)).alias("latitude"),
            (F.lit(100.0)
             + F.expr(f"CAST((mmsi div 4) div {side} AS BIGINT)") * F.lit(0.05)
             + (F.col("k") % 7) * F.lit(0.001)).alias("longitude"),
        )
    )


def _encounters_probe(args) -> None:
    import json
    import tempfile
    import shutil
    import time

    from pincspark.session import get_spark
    from pincspark.streaming.encounters import encounters_stream

    spark = get_spark("pincspark-stream-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for tag, n_events in (("1x", args.base), (f"{args.scale}x", args.base * args.scale)):
        vessels = max(1, n_events // args.events_per_vessel)
        tmp = tempfile.mkdtemp(prefix="pincspark_enc_probe_")
        try:
            src = os.path.join(tmp, "fixes")
            fixes = _encounter_fleet(spark, vessels, args.events_per_vessel)
            fixes.write.parquet(src)
            schema = spark.read.parquet(src).schema
            stream = spark.readStream.schema(schema).parquet(src)
            sink = f"enc_probe_{tag.replace('x', '')}"
            t0 = time.time()
            q = (
                encounters_stream(stream, timeout_ms=None)
                .writeStream.format("memory")
                .queryName(sink)
                .outputMode("append")
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .start()
            )
            _drain(q)
            wall = time.time() - t0
            pairs = spark.sql(f"SELECT count(*) c FROM {sink}").collect()[0]["c"]
            results[tag] = {
                "fixes": n_events,
                "vessels": vessels,
                "wall_s": round(wall, 2),
                "fixes_per_sec": int(n_events / wall),
                "pair_events": pairs,
            }
            print(f"{tag}: {results[tag]}", flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    r1, rk = results["1x"], results[f"{args.scale}x"]
    print(
        f"throughput ratio {args.scale}x/1x: "
        f"{rk['fixes_per_sec'] / r1['fixes_per_sec']:.2f} "
        f"(1.0 = perfectly flat)"
    )
    spark.stop()


def _census_lines(n: int) -> list[str]:
    """Deterministic ingest mix: ~50% valid singletons, ~30% in-order
    2-part groups (seq id cycles 0-9 like the on-air slot protocol),
    ~20% quarantine classes (bad checksum / no '*' / empty / no NMEA).
    Every line's fate is decided by the operator, not the generator.

    Returns AT LEAST ``n`` lines, extended to the next group boundary
    (ADVICE r14 #2): a hard ``out[:n]`` could cut a 2-part group in
    half for arbitrary --base/--scale, leaving an orphan part-1 pending
    forever under timeout_ms=None and tripping the probe's own
    sum(census)==len(lines) assert; callers count the list they get."""
    def nmea(body: str) -> str:
        x = 0
        for ch in body:
            x ^= ord(ch)
        return f"!{body}*{x:02X}"

    out: list[str] = []
    i = 0
    while len(out) < n:
        m = i % 10
        if m < 3:  # 2-part group, in order
            s = i % 10
            out.append(nmea(f"ABVDM,2,1,{s},A,PART1x{i},0"))
            out.append(nmea(f"ABVDM,2,2,{s},A,PART2x{i},0"))
        elif m < 8:
            out.append(nmea(f"ABVDM,1,1,,A,SOLO{i},0"))
        elif m == 8:
            out.append(f"!ABVDM,1,1,,A,BAD{i},0*00")  # wrong checksum
        else:
            out.append("" if i % 20 == 9 else f"$GP{i},nobang")
        i += 1
    return out


def _census_probe(args) -> None:
    """Throughput of the r14 streaming quarantine census: the stateless
    classifier tier + (seq_id, channel) keyed reassembly outcomes, one
    reason-coded verdict row per input line. Key cardinality is FIXED by
    the NMEA slot protocol (seq id 0-9 x channel), so growing volume
    measures per-line cost, not state growth — flat lines/sec expected."""
    from pincspark.session import get_spark
    from pincspark.streaming.census import quarantine_census_stream

    spark = get_spark("pincspark-stream-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for tag, n_lines in (("1x", args.base), (f"{args.scale}x", args.base * args.scale)):
        tmp = tempfile.mkdtemp(prefix="pincspark_census_probe_")
        try:
            src = os.path.join(tmp, "lines")
            os.makedirs(src)
            lines = _census_lines(n_lines)
            with open(os.path.join(src, "feed.txt"), "w") as f:
                f.write("\n".join(lines) + "\n")
            stream = spark.readStream.format("text").load(src)
            sink = f"census_probe_{tag.replace('x', '')}"
            t0 = time.time()
            q = (
                quarantine_census_stream(stream, timeout_ms=None)
                .writeStream.format("memory")
                .queryName(sink)
                .outputMode("append")
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .start()
            )
            _drain(q)
            wall = time.time() - t0
            census = {
                r["status"]: r["c"]
                for r in spark.sql(
                    f"SELECT status, count(*) c FROM {sink} GROUP BY status"
                ).collect()
            }
            assert sum(census.values()) == len(lines), (census, len(lines))
            results[tag] = {
                "lines": len(lines),
                "wall_s": round(wall, 2),
                "lines_per_sec": int(len(lines) / wall),
                "census": census,
            }
            print(f"{tag}: {results[tag]}", flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    r1, rk = results["1x"], results[f"{args.scale}x"]
    print(
        f"throughput ratio {args.scale}x/1x: "
        f"{rk['lines_per_sec'] / r1['lines_per_sec']:.2f} "
        f"(1.0 = perfectly flat)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
