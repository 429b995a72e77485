"""Geo operator tests: the pure-SQL ray-casting predicate is checked against
an independent pure-Python winding-number implementation over a point grid
covering both TSS zones (FIXTURES.md B4: inside-N, inside-S, outside,
near-boundary)."""

from __future__ import annotations

import pytest

from pincspark.operators.geo import load_zone_data


def winding_inside(x: float, y: float, ring: list[list[float]]) -> bool:
    """Nonzero winding number test (independent algorithm from the engine's
    even-odd crossing fold; equivalent for simple polygons)."""
    wn = 0
    for (px, py), (qx, qy) in zip(ring[:-1], ring[1:]):
        if py <= y:
            if qy > y and (qx - px) * (y - py) - (x - px) * (qy - py) > 0:
                wn += 1
        elif qy <= y and (qx - px) * (y - py) - (x - px) * (qy - py) < 0:
            wn -= 1
    return wn != 0


@pytest.fixture(scope="module")
def grid():
    zones = load_zone_data()
    xs = [100.4 + 0.37 * i for i in range(10)]
    ys = [0.9 + 0.23 * j for j in range(10)]
    pts = [(round(x, 6), round(y, 6)) for x in xs for y in ys]
    expected = {
        z["zone_id"]: {p for p in pts if winding_inside(p[0], p[1], z["coordinates"])}
        for z in zones
    }
    return pts, expected


def test_ray_casting_matches_winding(spark, grid):
    from pyspark.sql import functions as F

    from pincspark.operators.geo import spatial_join, zones_df

    pts, expected = grid
    points = spark.createDataFrame(pts, "longitude DOUBLE, latitude DOUBLE")
    matched = spatial_join(points, zones_df(spark)).collect()
    got: dict[int, set] = {1: set(), 2: set()}
    for r in matched:
        got[r["zone_id"]].add((r["longitude"], r["latitude"]))
    assert got[1] == expected[1]
    assert got[2] == expected[2]
    # sanity: the grid exercises both zones and the outside
    assert expected[1] and expected[2]
    assert len(expected[1] | expected[2]) < len(pts)


def test_zone_polygons_shape():
    zones = load_zone_data()
    assert [z["zone_name"] for z in zones] == ["TSS-Northbound", "TSS-Southbound"]
    for z in zones:
        ring = z["coordinates"]
        assert ring[0] == ring[-1], "ring must be closed"
        assert len(ring) >= 42


def test_track_qc_flags_teleports(spark):
    """Planted track: a 0.01-degree hop (~1.1 km) in 10 min passes at
    26 m/s; the same hop in 10 seconds is physically impossible and is
    flagged; the first fix always passes."""
    from datetime import datetime

    from pincspark.operators.geo import track_qc

    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0), 1.0, 100.0),
        (1, datetime(2024, 1, 1, 10, 10, 0), 1.0, 100.01),   # ~1.1km / 600s ok
        (1, datetime(2024, 1, 1, 10, 10, 10), 1.0, 100.02),  # ~1.1km / 10s -> flag
        (2, datetime(2024, 1, 1, 10, 0, 0), 1.5, 101.0),     # lone first fix
    ]
    df = spark.createDataFrame(rows, "mmsi int, ts timestamp, latitude double, longitude double")
    out = {
        (r["mmsi"], str(r["ts"])): (r["dist_m"], r["dt_s"], r["speed_ok"])
        for r in track_qc(df, "mmsi", "ts", "latitude", "longitude").collect()
    }
    assert out[(1, "2024-01-01 10:00:00")] == (None, None, 1)
    d1, t1, ok1 = out[(1, "2024-01-01 10:10:00")]
    assert abs(d1 - 1113) < 5 and t1 == 600 and ok1 == 1
    d2, t2, ok2 = out[(1, "2024-01-01 10:10:10")]
    assert abs(d2 - 1113) < 5 and t2 == 10 and ok2 == 0
    assert out[(2, "2024-01-01 10:00:00")] == (None, None, 1)


def test_haversine_known_distance(spark):
    """One degree of longitude at the equator is ~111.19 km."""
    from pyspark.sql import functions as F

    from pincspark.operators.geo import haversine_m

    d = (
        spark.range(1)
        .select(haversine_m(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(1.0)).alias("d"))
        .collect()[0]["d"]
    )
    assert abs(d - 111195) < 10
