"""Measured single-process baseline for the flagship: the reference's own
batch job, run on the SAME synthetic archive bench.py's flagship consumes.

BASELINE.md's reference row had no wall-clock (the reference prints its
elapsed time at runtime, ais_analysis.py:309,497-498, but never recorded a
number in-repo), so "flagship within 2x of baseline" was judged by proxy.
This script closes that: it re-expresses the reference's batch pipeline
faithfully in its OWN architecture — one process, one thread, a per-line
Python loop, pandas — and times it end-to-end on bench.py's archive:

    read day archive             (ais_analysis.py:318-321)
    per-line tokenize + split    (ais_analysis.py:330-341)
    checksum validation          (ais_analysis.py:266-288 drop semantics)
    multi-part fragment buffer   (ais_ingressServer.py:84-106)
    per-message Python decode    (ais_analysis.py's per-sentence ais_decode)
    position/static DataFrames   (ais_analysis.py:443-447)
    pd.merge_asof on ts by mmsi  (ais_analysis.py:476)
    gold parquet                 (ais_analysis.py:477)
    zone point-in-polygon        (ais_analysis.py:483-492, geopandas sjoin)
    distinct-vessel occupancy    (ais_analysis.py:489-495)

Deliberate stand-ins (each FAVORS the baseline, so the reported
flagship-vs-reference ratio is conservative):
- decode: pincspark's pure-Python ``decode_payload`` called per message —
  the same role as the reference's per-sentence pyais ``ais_decode`` call,
  with identical field semantics (so occupancy is directly comparable).
- zone join: geopandas is not in this environment; a vectorized numpy
  even-odd ray cast stands in for ``gpd.sjoin`` — vectorized numpy is
  FASTER than a geopandas sjoin at these row counts, and mirrors the
  engine's predicate exactly (pincspark/operators/geo.py:53-79:
  consecutive-edge fold, ``(py>y) != (qy>y)`` span test, eastward
  crossing), so occupancy counts cross-check bit-for-bit.

The occupancy result doubles as an independent end-to-end oracle for the
entire Spark flagship (tokenize -> reassemble -> decode -> as-of -> PIP):
``--verify`` runs the Spark pipeline on the same archive and diffs.

Usage:
    python scripts/reference_baseline.py [--sf 0.1] [--runs 3] [--verify]
                                         [--update-baseline]

``--update-baseline`` writes REFERENCE_BASELINE.json at the repo root
(median seconds + environment calibration); bench.py picks it up and
reports ``flagship_vs_reference_ratio`` in every round's JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_PATH = os.path.join(REPO, "REFERENCE_BASELINE.json")


def _checksum_ok(sentence: str) -> bool:
    """NMEA checksum: XOR of chars between '!' and '*' equals the hex pair."""
    star = sentence.rfind("*")
    if star < 0 or star + 3 > len(sentence):
        return False
    x = 0
    for ch in sentence[1:star]:
        x ^= ord(ch)
    try:
        return x == int(sentence[star + 1 : star + 3], 16)
    except ValueError:
        return False


def _tag_epoch(tagblock: str) -> int | None:
    i = tagblock.find("c:")
    if i < 0:
        return None
    j = i + 2
    k = j
    while k < len(tagblock) and tagblock[k].isdigit():
        k += 1
    return int(tagblock[j:k]) if k > j else None


def decode_archive(path: str):
    """The reference's decode loop: per line, tokenize; singletons decode
    immediately; multi-part fragments buffer per seq id until the group
    completes with monotonic fragment numbers (ais_ingressServer.py:84-106),
    then the concatenated payload decodes once. Checksum failures, gapped
    groups, and malformed counts drop — the same contract the engine's
    reassemble() implements and q88 pins."""
    from pincspark.decode.kernel import decode_payload

    positions: list[tuple] = []
    statics: list[tuple] = []
    # seq_id -> [ts, total, next_num, payload_parts]
    pending: dict[str, list] = {}

    def emit(payload: str, ts: int | None) -> None:
        if ts is None:
            return
        rec = decode_payload(payload)
        mt = rec["messageType"]
        if mt in (1, 2, 3):
            p = rec["position"]
            positions.append((ts, mt, rec["mmsi"], p["longitude"], p["latitude"],
                              p["sog"], p["cog"]))
        elif mt == 5:
            s = rec["static_voyage"]
            statics.append((ts, rec["mmsi"], s.get("shipName"), s.get("shipType"),
                            s.get("callsign"), s.get("destination"),
                            s.get("draught")))
        elif mt == 24:
            s = rec["static_report"]
            statics.append((ts, rec["mmsi"], s.get("shipName"), s.get("shipType"),
                            s.get("callsign"), None, None))

    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            bang = line.find("!")
            if bang < 0:
                continue
            tag, ais = line[:bang], line[bang:]
            if not _checksum_ok(ais):
                continue
            det = ais.split(",")
            if len(det) < 7:
                continue
            try:
                total = int(det[1]) if det[1] else 1
            except ValueError:
                total = 1
            try:
                num = int(det[2]) if det[2] else 1
            except ValueError:
                num = 1
            seq, payload = det[3], det[5]
            if total == 1:
                if num == 1:
                    emit(payload, _tag_epoch(tag))
                continue
            if num == 1:
                pending[seq] = [_tag_epoch(tag), total, 2, [payload]]
            elif seq in pending and pending[seq][2] == num and pending[seq][1] == total:
                g = pending[seq]
                g[3].append(payload)
                g[2] += 1
                if len(g[3]) == total:
                    emit("".join(g[3]), g[0])
                    del pending[seq]
            else:
                pending.pop(seq, None)
    return positions, statics


def _pip_mask(xs: np.ndarray, ys: np.ndarray, ring: list) -> np.ndarray:
    """Even-odd ray cast over CONSECUTIVE vertex edges — the exact predicate
    pincspark/operators/geo.py:53-79 folds (no implicit ring closure; the
    zone data repeats its first vertex)."""
    inside = np.zeros(len(xs), dtype=bool)
    for (px, py), (qx, qy) in zip(ring[:-1], ring[1:]):
        span = (py > ys) != (qy > ys)
        with np.errstate(divide="ignore", invalid="ignore"):
            cross = xs < (qx - px) * (ys - py) / (qy - py) + px
        inside ^= span & cross
    return inside


def run_once(archive: str, gold_path: str) -> tuple[float, list[dict]]:
    from pincspark.operators.geo import load_zone_data

    t0 = time.time()
    positions, statics = decode_archive(archive)
    pos = pd.DataFrame(
        positions,
        columns=["ts", "messageType", "mmsi", "longitude", "latitude", "sog", "cog"],
    )
    stat = pd.DataFrame(
        statics,
        columns=["ts", "mmsi", "shipName", "shipType", "callsign",
                 "destination", "draught"],
    )
    pos["ts"] = pd.to_datetime(pos["ts"], unit="s")
    stat["ts"] = pd.to_datetime(stat["ts"], unit="s")
    gold = pd.merge_asof(
        pos.sort_values("ts", kind="stable"),
        stat.sort_values("ts", kind="stable"),
        on="ts",
        by="mmsi",
    )
    gold.to_parquet(gold_path, index=False)
    gold = pd.read_parquet(gold_path)

    pts = gold[gold["longitude"].notna()]
    xs = pts["longitude"].to_numpy()
    ys = pts["latitude"].to_numpy()
    occupancy = []
    for z in load_zone_data():
        m = _pip_mask(xs, ys, z["coordinates"])
        occupancy.append(
            {
                "zone_id": z["zone_id"],
                "zone_name": z["zone_name"],
                "n_vessels": int(pts.loc[m, "mmsi"].nunique()),
                "n_reports": int(m.sum()),
            }
        )
    return time.time() - t0, occupancy


def _verify_against_spark(archive: str, occupancy: list[dict]) -> bool:
    """Independent end-to-end check: the Spark flagship on the same archive
    must produce the identical occupancy rows."""
    from pincspark.analysis import batch_archive_analysis
    from pincspark.session import get_spark

    spark = get_spark("reference-baseline-verify", cpus=8)
    _, occ = batch_archive_analysis(spark, archive)
    got = {
        (r["zone_id"], r["zone_name"]): (r["n_vessels"], r["n_reports"])
        for r in occ.collect()
    }
    want = {
        (o["zone_id"], o["zone_name"]): (o["n_vessels"], o["n_reports"])
        for o in occupancy
        if o["n_reports"] > 0  # engine's inner-join semantics drop empty zones
    }
    ok = got == want
    print(f"verify vs Spark flagship: {'MATCH' if ok else 'MISMATCH'}")
    if not ok:
        print("  spark:", got)
        print("  pandas:", want)
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()

    import bench

    archive, _wpath, tmp = bench._synth_archives(args.sf)
    try:
        runs = []
        occupancy = None
        for i in range(args.runs):
            secs, occupancy = run_once(archive, os.path.join(tmp, f"gold_{i}.parquet"))
            runs.append(round(secs, 3))
            print(f"run {i}: {runs[-1]}s")
        med = sorted(runs)[len(runs) // 2]
        calib = bench._cpu_calibration()
        result = {
            "reference_batch_seconds": med,
            "runs": runs,
            "sf": args.sf,
            "cpu_calib_st_s": calib,
            "occupancy": occupancy,
            "pipeline": "single-process pandas twin of ais_analysis.py:308-498",
        }
        print(json.dumps({k: v for k, v in result.items() if k != "occupancy"}))
        if args.verify and not _verify_against_spark(archive, occupancy):
            return 1
        if args.update_baseline:
            with open(OUT_PATH, "w") as f:
                json.dump(result, f, indent=2)
            print(f"wrote {OUT_PATH}")
        return 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
