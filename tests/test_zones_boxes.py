"""TimezoneService bbox/polygon lookups (zones/boxes.py): contains vs
center semantics against hand-checkable geometry."""

from __future__ import annotations

import numpy as np
import pandas as pd

from routers_spark.zones.boxes import zones_for_boxes, zones_for_polygons

SQUARE = {"zone_id": "sq", "ring": [(0.0, 0.0), (10.0, 0.0),
                                    (10.0, 10.0), (0.0, 10.0)]}
# concave L-shape: the notch (x>5, y>5) is OUTSIDE the zone
ELL = {"zone_id": "ell", "ring": [(20.0, 0.0), (30.0, 0.0), (30.0, 5.0),
                                  (25.0, 5.0), (25.0, 10.0), (20.0, 10.0)]}
ZONES = [SQUARE, ELL]


def _boxes(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["req_id", "min_lon", "min_lat", "max_lon", "max_lat"]))


def test_contains_semantics(spark):
    df = _boxes(spark, [
        (0, 2.0, 2.0, 8.0, 8.0),     # fully inside sq
        (1, -5.0, -5.0, 5.0, 5.0),   # straddles sq's boundary -> no zone
        (2, 50.0, 50.0, 51.0, 51.0), # nowhere
        (3, 21.0, 1.0, 24.0, 9.0),   # inside the L's left arm
        (4, 21.0, 1.0, 29.0, 9.0),   # corners inside arms but spans the
                                     # notch -> edges cross -> NOT contained
        (5, 3.0, 3.0, 3.0, 3.0),     # degenerate rect == point lookup
    ])
    out = zones_for_boxes(df, ZONES, method="contains").toPandas() \
        .sort_values("req_id")
    got = dict(zip(out["req_id"], out["zone_id"]))
    assert got[0] == "sq" and got[3] == "ell" and got[5] == "sq"
    assert got[1] is None and got[2] is None and got[4] is None


def test_center_semantics(spark):
    df = _boxes(spark, [
        (0, -5.0, -5.0, 5.0, 5.0),   # center (0,0) on sq's corner ring
        (1, 4.0, 4.0, 16.0, 16.0),   # center (10,10) sq corner
        (2, 2.0, 2.0, 4.0, 4.0),     # center (3,3) in sq
        (3, 26.0, 6.0, 29.0, 9.0),   # center in the notch -> no zone
    ])
    out = zones_for_boxes(df, ZONES, method="center").toPandas() \
        .sort_values("req_id")
    got = dict(zip(out["req_id"], out["zone_id"]))
    assert got[2] == "sq" and got[3] is None


def test_polygon_requests_resolve_via_bbox(spark):
    """Reference contract: polygon search == search of its bounding rect
    (interface.rs:10-15) — a triangle inside sq resolves, one spanning the
    notch does not (its bbox escapes containment)."""
    pdf = pd.DataFrame({
        "req_id": [0, 1],
        "ring": [[[2.0, 2.0], [8.0, 2.0], [5.0, 8.0]],
                 [[21.0, 1.0], [29.0, 1.0], [25.0, 9.0]]],
    })
    df = spark.createDataFrame(pdf)
    out = zones_for_polygons(df, ZONES, method="contains").toPandas() \
        .sort_values("req_id")
    got = dict(zip(out["req_id"], out["zone_id"]))
    assert got[0] == "sq" and got[1] is None


def test_multi_zone_contains_rows(spark):
    """Overlapping zones: contains returns ONE ROW PER matching zone
    (the Vec<TimeZone> of basic.rs:31-50)."""
    inner = {"zone_id": "inner", "ring": [(2.0, 2.0), (8.0, 2.0),
                                          (8.0, 8.0), (2.0, 8.0)]}
    df = _boxes(spark, [(0, 3.0, 3.0, 7.0, 7.0)])
    out = zones_for_boxes(df, [SQUARE, inner], method="contains").toPandas()
    assert sorted(out["zone_id"]) == ["inner", "sq"]
