"""Raster zonal statistics — per-zone pixel aggregates over a tiled
raster, the raster×vector join of the training-data pipeline extension
(the reference has the vector half — tz zone lookup, storage/basic.rs
ray-cast — and the tile half — T1/T7; this operator joins them the way a
geospatial pipeline aggregates imagery over admin/coverage polygons).

Semantics: vector zones are projected into the RASTER's pixel CRS once
(standard practice — rasterize the polygon in the raster grid, never
reproject every pixel), then every pixel CENTER (gx+0.5, gy+0.5) is
assigned to the FIRST zone whose ring contains it (crossing-number test,
identical expression to the tz gates in queries.py); pixels in no zone
aggregate under ``'none'``. Output: one row per zone with integer-exact
count / per-band sum / min / max.

Scale shape (the point of the design):
  - one narrow ``mapInPandas`` pass over the tiles — decode + aggregate
    per tile, NO per-pixel rows ever leave the kernel;
  - tiles that touch no zone bbox, and tiles provably INTERIOR to a zone
    (no ring edge intersects the tile rect and one pixel center is
    inside — exact for simple polygons), aggregate whole-tile in numpy
    with ZERO point-in-polygon tests; only boundary tiles pay the
    vectorized per-pixel ray cast. On real coverage the boundary set is
    O(perimeter), not O(area) — at 100 TB of tiles this is the
    difference between touching every pixel and touching ~sqrt of them;
  - the shuffle carries one partial row per (tile, zone) — KB-scale —
    into a map-side-combined groupBy.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from routers_spark.functions.raster import decode_image
from routers_spark.zones.boxes import _edges_hit_rects

ZONAL_PARTIAL_SCHEMA = (
    "zone_id string, n_px long, sum_r long, sum_g long, sum_b long, "
    "min_r long, max_r long, min_g long, max_g long, min_b long, max_b long"
)


def _ray_cast_np(px: np.ndarray, py: np.ndarray, ring_x: np.ndarray,
                 ring_y: np.ndarray) -> np.ndarray:
    """Crossing-number point-in-polygon, numerically IDENTICAL to the SQL
    form the oracle gates use (queries.py _ray_cast_sql): per edge,
    ``((y1 > py) != (y2 > py)) AND (px < x1 + (py - y1)*(x2 - x1)/(y2 - y1))``
    with left-associated IEEE ops — same inputs, same bits, any engine."""
    inside = np.zeros(len(px), dtype=np.int64)
    n = len(ring_x)
    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(n):
            x1, y1 = ring_x[i], ring_y[i]
            x2, y2 = ring_x[(i + 1) % n], ring_y[(i + 1) % n]
            crosses = (y1 > py) != (y2 > py)
            xcut = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            inside += (crosses & (px < xcut)).astype(np.int64)
    return (inside % 2) == 1


def _band_partial(zone_id: str, arr_flat: np.ndarray) -> tuple:
    r, g, b = (arr_flat[:, c].astype(np.int64) for c in range(3))
    return (zone_id, len(arr_flat), int(r.sum()), int(g.sum()), int(b.sum()),
            int(r.min()), int(r.max()), int(g.min()), int(g.max()),
            int(b.min()), int(b.max()))


def zonal_stats(tiles_df: DataFrame, zones_px: list[tuple[str, list]],
                tile_px: int = 16, fmt: str = "png") -> DataFrame:
    """Per-zone pixel statistics over georeferenced raster tiles.

    ``tiles_df``: (tx long, ty long, tile binary) — tile image bytes keyed
    by slippy tile coords at one zoom. ``zones_px``: ordered
    [(zone_id, [(gx, gy), ...]), ...] rings in GLOBAL PIXEL coordinates
    (tile coord × tile_px); first containing zone wins per pixel.
    """
    rings = [(zid, np.array([p[0] for p in ring], dtype=np.float64),
              np.array([p[1] for p in ring], dtype=np.float64))
             for zid, ring in zones_px]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.meshgrid(np.arange(tile_px), np.arange(tile_px),
                             indexing="ij")
        xxf = xx.ravel().astype(np.float64)
        yyf = yy.ravel().astype(np.float64)
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                arr = decode_image(bytes(t.tile), fmt)
                flat = arr.reshape(-1, arr.shape[2])
                x0 = float(t.tx) * tile_px
                y0 = float(t.ty) * tile_px
                # pixel-center bounds of this tile
                lo_x, hi_x = x0 + 0.5, x0 + tile_px - 0.5
                lo_y, hi_y = y0 + 0.5, y0 + tile_px - 0.5
                hits = [k for k, (_, rx, ry) in enumerate(rings)
                        if (rx.min() <= hi_x and rx.max() >= lo_x
                            and ry.min() <= hi_y and ry.max() >= lo_y)]
                if not hits:
                    rows.append(_band_partial("none", flat))
                    continue
                # interior fast path: exactly one candidate ring, no ring
                # edge crosses the tile rect, and one center is inside ->
                # the whole tile is inside (exact for simple polygons)
                if len(hits) == 1:
                    _, rx, ry = rings[hits[0]]
                    ex1, ey1 = np.roll(rx, -1), np.roll(ry, -1)
                    crossed = _edges_hit_rects(
                        rx, ry, ex1, ey1,
                        np.array([lo_x]), np.array([lo_y]),
                        np.array([hi_x]), np.array([hi_y]))[0]
                    if not crossed:
                        inside0 = _ray_cast_np(np.array([lo_x]),
                                               np.array([lo_y]), rx, ry)[0]
                        rows.append(_band_partial(
                            rings[hits[0]][0] if inside0 else "none", flat))
                        continue
                # boundary tile: vectorized first-match ray cast per pixel
                px = x0 + 0.5 + xxf
                py = y0 + 0.5 + yyf
                assigned = np.full(len(px), "none", dtype=object)
                unset = np.ones(len(px), dtype=bool)
                for k in hits:
                    zid, rx, ry = rings[k]
                    m = unset & _ray_cast_np(px, py, rx, ry)
                    assigned[m] = zid
                    unset &= ~m
                for zid in pd.unique(assigned):
                    rows.append(_band_partial(zid, flat[assigned == zid]))
            yield pd.DataFrame(rows, columns=[
                "zone_id", "n_px", "sum_r", "sum_g", "sum_b", "min_r",
                "max_r", "min_g", "max_g", "min_b", "max_b"])

    partial = tiles_df.select("tx", "ty", "tile").mapInPandas(
        kernel, schema=ZONAL_PARTIAL_SCHEMA)
    return partial.groupBy("zone_id").agg(
        F.sum("n_px").alias("n_px"),
        F.sum("sum_r").alias("sum_r"),
        F.sum("sum_g").alias("sum_g"),
        F.sum("sum_b").alias("sum_b"),
        F.min("min_r").alias("min_r"), F.max("max_r").alias("max_r"),
        F.min("min_g").alias("min_g"), F.max("max_g").alias("max_g"),
        F.min("min_b").alias("min_b"), F.max("max_b").alias("max_b"),
    )
