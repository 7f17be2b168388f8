"""S2 sorted-cell-array zone backend — the reference's timezone-lookup
shape with REAL S2 cells.

The reference builds a RegionCoverer covering of each zone polygon
(min level 1, max 13, max_cells 1000; tz/build/impl/s2cell.rs:13-15,
70-99), keeps it as ONE sorted cell array (tz/src/storage/s2cell.rs:
12-13), and answers lookups by ascending a query point's leaf cell
through parents level 13..1 with binary searches over that array
(s2cell.rs:38-56). zones/cells.py serves this contract with a quadtree
covering; this module serves it with the S2 cell ids of functions/s2.py
— same interior-direct / boundary-refine split, same sorted-array walk,
byte-identical output to the brute backend (zones/pip.py).

Exactness note. S2 cells are rectangles in face (u, v) space but curved
quadrilaterals in lon/lat, while the engine's polygon semantics (and the
pip oracle) are planar lon/lat. Covering classification therefore runs
against a cell's lon/lat BOUNDING BOX, sampled at 9 uv points (corners,
edge midpoints, center) and inflated by 5% of the cell extent — three
orders of magnitude above the true curvature sagitta at sub-degree cell
sizes (O(h^2), ~1e-3 of extent at h ~ 1 deg, quadratically less below).
Over-coverage is free (boundary cells are refined by the exact ray
cast); the inflation only has to dominate the curvature error for the
"out" prune and the "interior" direct-assign, which it does with ~50x
margin at every level the fixture zones can reach. The parity suite
(tests/test_s2_zones.py) sweeps backend == brute over dense point grids.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions import s2 as s2f
from .cells import (_segments_intersect_rect, resolve_zone_candidates)
from ..functions.geo import point_in_polygon_np

# the reference tz build constants (build/impl/s2cell.rs:13-14)
ZONE_MIN_LEVEL = 1
ZONE_MAX_LEVEL = 13

# inverse of KIJTOPOS: POS2IJ[orientation][pos] -> ij
POS2IJ = tuple(
    tuple(row.index(pos) for pos in range(4)) for row in s2f.KIJTOPOS
)


def id_to_face_ij(cell_id: int) -> tuple[int, int, int, int]:
    """(face, i, j, level) of a cell id — inverse of the encode fold.
    i/j are the cell's MIN corner at leaf resolution."""
    uid = cell_id & ((1 << 64) - 1)
    face = uid >> 61
    lsb = uid & -uid
    level = s2f.MAX_LEVEL - (lsb.bit_length() - 1) // 2
    pos = (uid & ((1 << 61) - 1)) >> (2 * (s2f.MAX_LEVEL - level) + 1)
    o = face & 1
    i = j = 0
    for k in range(level):
        r = (pos >> (2 * (level - 1 - k))) & 3
        ij = POS2IJ[o][r]
        i = (i << 1) | (ij >> 1)
        j = (j << 1) | (ij & 1)
        o ^= s2f.KPOS_TO_ORIENTATION[r]
    shift = s2f.MAX_LEVEL - level
    return int(face), i << shift, j << shift, level


def child_ids(cell_id: int) -> list[int]:
    """The 4 children of a non-leaf cell id (sentinel moves down 2 bits;
    children at (2k+1) * new_lsb offsets from the id base)."""
    uid = cell_id & ((1 << 64) - 1)
    lsb = uid & -uid
    assert lsb > 1, "leaf cell has no children"
    nl = lsb >> 2
    out = [uid - lsb + (2 * k + 1) * nl for k in range(4)]
    return [x - (1 << 64) if x >= (1 << 63) else x for x in out]


def face_cell_id(face: int) -> int:
    uid = (face << 61) | (1 << 60)
    return uid - (1 << 64) if uid >= (1 << 63) else uid


def _st_to_uv(s: float) -> float:
    return ((4.0 * s * s - 1.0) / 3.0 if s >= 0.5
            else (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0)


def _face_uv_to_lonlat(face: int, u, v):
    """Inverse of the face frame in functions/s2.py: direction vector per
    face, then lon/lat. Vectorized over u/v arrays."""
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    if face == 0:
        x, y, z = one, u, v
    elif face == 1:
        x, y, z = -u, one, v
    elif face == 2:
        x, y, z = -u, -v, one
    elif face == 3:
        x, y, z = -one, -v, -u
    elif face == 4:
        x, y, z = v, -one, -u
    else:
        x, y, z = v, u, -one
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    return lon, lat


def cell_lonlat_bbox(cell_id: int,
                     inflate_frac: float = 0.05) -> tuple[float, float,
                                                          float, float]:
    """(lon_lo, lat_lo, lon_hi, lat_hi) over 9 uv sample points of the
    cell (corners, edge midpoints, center), inflated by ``inflate_frac``
    of each extent plus an absolute floor — a guaranteed superset of the
    true curved footprint at sub-degree cell sizes (see module note)."""
    face, i, j, level = id_to_face_ij(cell_id)
    size = 1 << (s2f.MAX_LEVEL - level)
    scale = 1.0 / (1 << s2f.MAX_LEVEL)
    us = [_st_to_uv(s) for s in (i * scale, (i + 0.5 * size) * scale,
                                 (i + size) * scale)]
    vs = [_st_to_uv(s) for s in (j * scale, (j + 0.5 * size) * scale,
                                 (j + size) * scale)]
    uu, vv = np.meshgrid(np.array(us), np.array(vs), indexing="ij")
    lon, lat = _face_uv_to_lonlat(face, uu.ravel(), vv.ravel())
    lon_lo, lon_hi = float(np.min(lon)), float(np.max(lon))
    lat_lo, lat_hi = float(np.min(lat)), float(np.max(lat))
    pad_lon = inflate_frac * (lon_hi - lon_lo) + 1e-7
    pad_lat = inflate_frac * (lat_hi - lat_lo) + 1e-7
    return (lon_lo - pad_lon, lat_lo - pad_lat,
            lon_hi + pad_lon, lat_hi + pad_lat)


def cover_ring_s2(rx: np.ndarray, ry: np.ndarray,
                  min_level: int = ZONE_MIN_LEVEL,
                  max_level: int = ZONE_MAX_LEVEL):
    """S2 covering of one lon/lat polygon ring: (cell_ids int64,
    interior bool). Same contract as cells.cover_ring: interior cells lie
    fully inside the ring, boundary cells (emitted at max_level) may
    intersect its edges, and every point of the polygon is inside some
    emitted cell. Classification uses the cell's inflated lon/lat bbox —
    conservative in both directions (see module note). BFS spans all six
    face cells, so rings anywhere on the sphere (fixture or not) are
    covered; a sub-degree ring prunes five faces at level 0."""
    rx = np.asarray(rx, dtype=np.float64)
    ry = np.asarray(ry, dtype=np.float64)
    sx = np.roll(rx, -1)
    sy = np.roll(ry, -1)
    keys: list[int] = []
    interior: list[bool] = []
    stack = [face_cell_id(f) for f in range(6)]
    while stack:
        cid = stack.pop()
        _, _, _, level = id_to_face_ij(cid)
        x0, y0, x1, y1 = cell_lonlat_bbox(cid)
        crossed = _segments_intersect_rect(x0, y0, x1, y1, rx, ry, sx, sy)
        if not crossed:
            cx, cy = 0.5 * (x0 + x1), 0.5 * (y0 + y1)
            if not bool(point_in_polygon_np([cx], [cy], rx, ry)[0]):
                continue  # bbox (=> cell) entirely outside
            if level >= min_level:
                keys.append(cid)
                interior.append(True)
                continue
        if level >= max_level:
            if crossed:
                keys.append(cid)
                interior.append(False)
            continue
        stack.extend(child_ids(cid))
    return (np.asarray(keys, dtype=np.int64),
            np.asarray(interior, dtype=bool))


def build_zone_index_s2(zones: list[dict],
                        min_level: int = ZONE_MIN_LEVEL,
                        max_level: int = ZONE_MAX_LEVEL):
    """One sorted S2 cell array across all zones (cell_ids + tz_indices,
    the S2StorageBackend shape, build/impl/s2cell.rs:107-113): returns
    (keys, zone_idx, interior, rings), keys sorted. A cell claimed by
    several zones stays as multiple rows; lookup resolves in zone list
    order (the build-conflict analog of s2cell.rs:106-134)."""
    all_keys, all_zidx, all_int = [], [], []
    rings = []
    for zi, z in enumerate(zones):
        rx = np.array([p[0] for p in z["ring"]], dtype=np.float64)
        ry = np.array([p[1] for p in z["ring"]], dtype=np.float64)
        rings.append((z["zone_id"], rx, ry))
        k, it = cover_ring_s2(rx, ry, min_level, max_level)
        all_keys.append(k)
        all_zidx.append(np.full(len(k), zi, dtype=np.int64))
        all_int.append(it)
    keys = np.concatenate(all_keys) if all_keys else np.empty(0, np.int64)
    zidx = np.concatenate(all_zidx) if all_zidx else np.empty(0, np.int64)
    intr = np.concatenate(all_int) if all_int else np.empty(0, bool)
    order = np.argsort(keys, kind="stable")
    return keys[order], zidx[order], intr[order], rings


def assign_zones_s2(points_df: DataFrame, zones: list[dict],
                    lon: str = "lon", lat: str = "lat",
                    keep: list[str] | None = None,
                    min_level: int = ZONE_MIN_LEVEL,
                    max_level: int = ZONE_MAX_LEVEL) -> DataFrame:
    """Zone assignment via the S2 cell index: per point one leaf encode,
    then per level (max..min — the leaf->parent walk of storage/
    s2cell.rs:42-49) one vectorized searchsorted over the broadcast
    sorted array; interior hits assign directly, boundary hits ray-cast
    against that single ring. First matching zone in list order wins; no
    match -> NULL — byte-identical to zones.pip.assign_zones."""
    keep = keep or [c for c in points_df.columns if c not in (lon, lat)]
    keys, zidx, intr, rings = build_zone_index_s2(zones, min_level,
                                                  max_level)
    n_zones = len(rings)
    out_fields = [f for f in points_df.schema.fields
                  if f.name in keep + [lon, lat]]
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in out_fields)
    schema += ", zone_id string"

    spark = points_df.sparkSession
    bidx = spark.sparkContext.broadcast((keys, zidx, intr, rings))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys_, zidx_, intr_, rings_ = bidx.value
        for pdf in batches:
            px = pdf[lon].values.astype(np.float64)
            py = pdf[lat].values.astype(np.float64)
            n = len(pdf)
            leaf = s2f.s2_cellid_np(px, py)
            cand = np.zeros((n, n_zones), dtype=bool)
            cand_int = np.zeros((n, n_zones), dtype=bool)
            for lvl in range(max_level, min_level - 1, -1):
                pk = s2f.parent_id_np(leaf, lvl)
                lo = np.searchsorted(keys_, pk, side="left")
                hi = np.searchsorted(keys_, pk, side="right")
                cnt = hi - lo
                if not cnt.any():
                    continue
                rep = np.repeat(np.arange(n), cnt)
                pos = (np.arange(int(cnt.sum()), dtype=np.int64)
                       - np.repeat(np.cumsum(cnt) - cnt, cnt)
                       + np.repeat(lo, cnt))
                cand[rep, zidx_[pos]] = True
                cand_int[rep, zidx_[pos]] |= intr_[pos]
            zone = resolve_zone_candidates(px, py, cand, cand_int, rings_)
            out = pdf[[f.name for f in out_fields]].copy()
            out["zone_id"] = zone
            yield out

    return points_df.mapInPandas(run, schema=schema)


__all__ = [
    "assign_zones_s2", "build_zone_index_s2", "cover_ring_s2",
    "cell_lonlat_bbox", "id_to_face_ij", "child_ids", "face_cell_id",
]
