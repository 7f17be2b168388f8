"""Zone assignment: vectorized ray-cast point-in-polygon over a broadcast
polygon set — the timezone-lookup pattern (libs/routers_tz/src/lib.rs:84-93)
with the `basic` backend's contains-semantics (storage/basic.rs:27-41) plus
its bbox prefilter, re-expressed as numpy over Arrow batches.

Scale shape: polygons broadcast (zone tables are small — countries,
timezones, districts); points stream through ``mapInPandas`` with no
shuffle. For polygon sets too big to broadcast, assign cells first and join
on cell (the S2-cell backend analog, storage/s2cell.rs:38-56).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from routers_spark.functions.geo import point_in_polygon_np


def assign_zones(points_df: DataFrame, zones: list[dict],
                 lon: str = "lon", lat: str = "lat",
                 keep: list[str] | None = None) -> DataFrame:
    """zones: [{zone_id: str, ring: [(lon, lat), ...]}, ...]. First matching
    zone wins, in zone list order (deterministic); no match → NULL — the tz
    query contract (first containing geometry, basic.rs:27-41)."""
    keep = keep or [c for c in points_df.columns if c not in (lon, lat)]
    rings = [
        (z["zone_id"],
         np.array([p[0] for p in z["ring"]], dtype=np.float64),
         np.array([p[1] for p in z["ring"]], dtype=np.float64))
        for z in zones
    ]
    bboxes = [
        (float(rx.min()), float(ry.min()), float(rx.max()), float(ry.max()))
        for _, rx, ry in rings
    ]
    out_fields = [f for f in points_df.schema.fields if f.name in keep + [lon, lat]]
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    schema += ", zone_id string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = pdf[lon].values.astype(np.float64)
            py = pdf[lat].values.astype(np.float64)
            zone = np.full(len(pdf), None, dtype=object)
            unassigned = np.ones(len(pdf), dtype=bool)
            for (zid, rx, ry), (x0, y0, x1, y1) in zip(rings, bboxes):
                cand = unassigned & (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
                if not cand.any():
                    continue
                inside = point_in_polygon_np(px[cand], py[cand], rx, ry)
                idx = np.flatnonzero(cand)[inside]
                zone[idx] = zid
                unassigned[idx] = False
            out = pdf[[f.name for f in out_fields]].copy()
            out["zone_id"] = zone
            yield out

    return points_df.mapInPandas(run, schema=schema)
