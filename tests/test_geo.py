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
