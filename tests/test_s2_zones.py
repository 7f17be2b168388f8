"""S2 sorted-cell-array zone backend (zones/s2cells.py) ≡ brute ray-cast
backend (zones/pip.py) — the reference tz S2 storage shape
(tz/src/storage/s2cell.rs:38-56) with real S2 cells, byte-identical by
interior-direct + boundary-refine construction."""

from __future__ import annotations

import numpy as np
import pandas as pd

from routers_spark.functions import s2 as s2f
from routers_spark.zones import s2cells as zs2
from routers_spark.zones.pip import assign_zones

ZONES = [
    {"zone_id": "hex", "ring": [
        (-118.50, 33.75), (-118.30, 33.72), (-118.20, 33.90),
        (-118.35, 33.85), (-118.40, 34.00), (-118.55, 33.95)]},
    {"zone_id": "box", "ring": [
        (-118.30, 33.80), (-118.10, 33.80), (-118.10, 33.98),
        (-118.30, 33.98)]},
    {"zone_id": "tri", "ring": [
        (-118.60, 33.70), (-118.45, 33.70), (-118.60, 33.85)]},
]


# ------------------------------------------------------ id arithmetic


def test_id_to_face_ij_inverts_encode():
    rng = np.random.default_rng(5)
    lon = rng.uniform(-179.0, 179.0, 200)
    lat = rng.uniform(-84.0, 84.0, 200)
    face, u, v = s2f.face_uv_np(lon, lat)
    i = s2f.st_to_ij_np(s2f.uv_to_st_np(u))
    j = s2f.st_to_ij_np(s2f.uv_to_st_np(v))
    ids = s2f.s2_cellid_np(lon, lat)
    for n in range(0, 200, 17):
        f2, i2, j2, lvl = zs2.id_to_face_ij(int(ids[n]))
        assert (f2, i2, j2, lvl) == (face[n], i[n], j[n], s2f.MAX_LEVEL)
    # and at a coarser level the min corner truncates
    parents = s2f.parent_id_np(ids, 9)
    shift = s2f.MAX_LEVEL - 9
    for n in range(0, 200, 29):
        f2, i2, j2, lvl = zs2.id_to_face_ij(int(parents[n]))
        assert lvl == 9 and f2 == face[n]
        assert i2 == (int(i[n]) >> shift) << shift
        assert j2 == (int(j[n]) >> shift) << shift


def test_child_ids_partition_parent():
    cid = int(s2f.parent_id_np(
        s2f.s2_cellid_np([-118.4], [33.9]), 7)[0])
    kids = zs2.child_ids(cid)
    assert len(set(kids)) == 4
    for k in kids:
        f, _, _, lvl = zs2.id_to_face_ij(k)
        assert lvl == 8
        # each child's level-7 ancestor is the parent
        assert int(s2f.parent_id_np(np.array([k]), 7)[0]) == cid


def test_cell_bbox_contains_point_samples():
    """The inflated lon/lat bbox must contain every point that encodes
    into the cell — the superset property the covering relies on."""
    rng = np.random.default_rng(13)
    lon = rng.uniform(-118.7, -118.0, 2000)
    lat = rng.uniform(33.6, 34.1, 2000)
    ids = s2f.s2_cellid_np(lon, lat)
    for level in (6, 10, 13):
        parents = s2f.parent_id_np(ids, level)
        for cid in np.unique(parents)[:20]:
            x0, y0, x1, y1 = zs2.cell_lonlat_bbox(int(cid))
            sel = parents == cid
            assert (lon[sel] >= x0).all() and (lon[sel] <= x1).all()
            assert (lat[sel] >= y0).all() and (lat[sel] <= y1).all()


# ---------------------------------------------------------- covering


def test_cover_ring_s2_shape():
    rx = np.array([p[0] for p in ZONES[0]["ring"]])
    ry = np.array([p[1] for p in ZONES[0]["ring"]])
    keys, interior = zs2.cover_ring_s2(rx, ry)
    assert len(keys) > 4
    assert interior.any() and (~interior).any()
    # every covering cell is within the level contract
    for cid in keys:
        _, _, _, lvl = zs2.id_to_face_ij(int(cid))
        assert zs2.ZONE_MIN_LEVEL <= lvl <= zs2.ZONE_MAX_LEVEL


def test_interior_cells_are_sound():
    """Points sampled inside interior covering cells must be inside the
    ring (the direct-assign path must never mislabel)."""
    rng = np.random.default_rng(3)
    rx = np.array([p[0] for p in ZONES[0]["ring"]])
    ry = np.array([p[1] for p in ZONES[0]["ring"]])
    keys, interior = zs2.cover_ring_s2(rx, ry)
    lon = rng.uniform(-118.7, -118.0, 30000)
    lat = rng.uniform(33.6, 34.1, 30000)
    leaf = s2f.s2_cellid_np(lon, lat)
    from routers_spark.functions.geo import point_in_polygon_np

    hit = np.zeros(len(lon), dtype=bool)
    for cid, is_int in zip(keys, interior):
        if not is_int:
            continue
        _, _, _, lvl = zs2.id_to_face_ij(int(cid))
        sel = s2f.parent_id_np(leaf, lvl) == cid
        hit |= sel
    inside = point_in_polygon_np(lon[hit], lat[hit], rx, ry)
    assert inside.all()


def test_covering_is_complete():
    """Every inside point lands in some covering cell (no false NULLs)."""
    rng = np.random.default_rng(23)
    rx = np.array([p[0] for p in ZONES[0]["ring"]])
    ry = np.array([p[1] for p in ZONES[0]["ring"]])
    keys, _ = zs2.cover_ring_s2(rx, ry)
    keys = np.sort(keys)
    lon = rng.uniform(-118.7, -118.0, 30000)
    lat = rng.uniform(33.6, 34.1, 30000)
    from routers_spark.functions.geo import point_in_polygon_np

    ins = point_in_polygon_np(lon, lat, rx, ry)
    leaf = s2f.s2_cellid_np(lon[ins], lat[ins])
    covered = np.zeros(len(leaf), dtype=bool)
    for lvl in range(zs2.ZONE_MIN_LEVEL, zs2.ZONE_MAX_LEVEL + 1):
        pk = s2f.parent_id_np(leaf, lvl)
        lo = np.searchsorted(keys, pk, side="left")
        hi = np.searchsorted(keys, pk, side="right")
        covered |= hi > lo
    assert covered.all()


# ------------------------------------------------------ backend parity


def test_s2_matches_brute_random_points(spark):
    rng = np.random.default_rng(17)
    n = 4000
    pts = pd.DataFrame({
        "pid": np.arange(n),
        "lon": -118.7 + rng.random(n) * 0.7,
        "lat": 33.65 + rng.random(n) * 0.45,
    })
    df = spark.createDataFrame(pts)
    a = assign_zones(df, ZONES, keep=["pid"]).toPandas() \
        .sort_values("pid").reset_index(drop=True)
    b = zs2.assign_zones_s2(df, ZONES, keep=["pid"]).toPandas() \
        .sort_values("pid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert set(a["zone_id"].dropna()) == {"hex", "box", "tri"}


def test_s2_matches_brute_edge_hugging_points(spark):
    """Points clustered tightly around every ring vertex and edge —
    the boundary-refine path under maximal stress."""
    rng = np.random.default_rng(29)
    lon_l, lat_l = [], []
    for z in ZONES:
        ring = np.array(z["ring"], dtype=np.float64)
        nxt = np.roll(ring, -1, axis=0)
        for frac in rng.random((40, len(ring))):
            p = ring + frac[:, None] * (nxt - ring)
            jit = rng.normal(0.0, 1e-4, p.shape)
            lon_l.append(p[:, 0] + jit[:, 0])
            lat_l.append(p[:, 1] + jit[:, 1])
    lon = np.concatenate(lon_l)
    lat = np.concatenate(lat_l)
    pts = pd.DataFrame({"pid": np.arange(len(lon)),
                        "lon": lon, "lat": lat})
    df = spark.createDataFrame(pts)
    a = assign_zones(df, ZONES, keep=["pid"]).toPandas() \
        .sort_values("pid").reset_index(drop=True)
    b = zs2.assign_zones_s2(df, ZONES, keep=["pid"]).toPandas() \
        .sort_values("pid").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
