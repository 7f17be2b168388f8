"""Haversine DBSCAN point clustering (T5) — the reference's ``IntoCluster``
(libs/routers_geo/src/cluster.rs:202-318): epsilon-range expansion with a
per-cluster capacity cap, clusters of >= 3 points become (centroid, convex
hull, geohash-packed u64 id); smaller groups pass through as noise.

Spark shape: points are cell-partitioned first (``groupBy(cell)`` —
clustering is local by construction since epsilon << cell size), then each
cell clusters in one Arrow batch. The cell boundary effect is the documented
padding tradeoff (O11); callers picking cell size >> epsilon keep it
negligible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from routers_spark.functions.cells import geohash_int_np
from routers_spark.functions.geo import haversine_m_np

DEFAULT_CAPACITY = 10  # cluster.rs c_capacity default
MIN_CLUSTER = 3        # clusters >= 3 points (Clustered::try_from :105-129)


def dbscan_numpy(lons: np.ndarray, lats: np.ndarray, eps_m: float,
                 capacity: int = DEFAULT_CAPACITY) -> np.ndarray:
    """Label array (-1 = noise). Deterministic: seeds expand in index order,
    neighbours join in index order, expansion stops at ``capacity`` members
    (cluster.rs:243-274 range_query/expand).

    Neighbour sets are precomputed once: an equirectangular-prefiltered
    haversine radius query in blocks (O(n^2) flops but fully vectorized;
    cells bound n)."""
    from collections import deque

    n = len(lons)
    labels = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return labels
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    # prefilter box in degrees (generous: eps * 1.5 safety)
    dlat = eps_m / 111_320.0 * 1.5
    dlon = dlat / max(np.cos(np.radians(np.abs(lats).max())), 1e-6)
    neighbours: list[np.ndarray] = []
    block = 256  # small blocks: large first-touch allocations stall badly
    # on this VM, and blocks this size still amortize the numpy call cost
    for s in range(0, n, block):
        e = min(s + block, n)
        box_mask = (
            (np.abs(lons[None, :] - lons[s:e, None]) <= dlon)
            & (np.abs(lats[None, :] - lats[s:e, None]) <= dlat)
        )
        for bi, i in enumerate(range(s, e)):
            cand = np.flatnonzero(box_mask[bi])
            d = haversine_m_np(lons[i], lats[i], lons[cand], lats[cand])
            neighbours.append(cand[d <= eps_m])
    cluster = 0
    for i in range(n):
        if labels[i] != -1:
            continue
        nbrs = neighbours[i]
        nbrs = nbrs[labels[nbrs] == -1]
        if len(nbrs) < 2:  # the seed itself + at least one other
            continue
        members = [i]
        labels[i] = cluster
        queue = deque(j for j in nbrs.tolist() if j != i)
        while queue and len(members) < capacity:
            j = queue.popleft()
            if labels[j] != -1:
                continue
            labels[j] = cluster
            members.append(j)
            nj = neighbours[j]
            queue.extend(nj[labels[nj] == -1].tolist())
        if len(members) < MIN_CLUSTER:
            for m in members:
                labels[m] = -1
        else:
            cluster += 1
    return labels


def convex_hull(xs: np.ndarray, ys: np.ndarray) -> list[tuple[float, float]]:
    """Andrew's monotone chain (counter-clockwise), the hull the reference
    derives per cluster (cluster.rs:110-115)."""
    pts = sorted(set(zip(xs.tolist(), ys.tolist())))
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


CLUSTER_SCHEMA = (
    "cell string, cluster_id long, n_points long, centroid_lon double, "
    "centroid_lat double, min_lon double, min_lat double, max_lon double, "
    "max_lat double, hull_wkt string"
)


def cluster_points(points_df: DataFrame, eps_m: float, cell_precision: int = 5,
                   capacity: int = DEFAULT_CAPACITY) -> DataFrame:
    """Cell-partitioned DBSCAN; one output row per cluster. cluster_id =
    geohash-packed u64 of the centroid (cluster.rs:79-103 id packing).

    The geohash cell comes from the numpy kernel in one Arrow pass — the
    unrolled SQL form is a ~52 KB expression tree whose codegen/analysis
    alone costs seconds per plan (same values either way, pytest-pinned)."""
    from collections.abc import Iterator

    from routers_spark.functions.cells import geohash_str_np

    def add_cell(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["lon", "lat"]].copy()
            out["cell"] = geohash_str_np(
                pdf["lon"].values.astype(np.float64),
                pdf["lat"].values.astype(np.float64), cell_precision)
            yield out

    with_cell = points_df.select("lon", "lat").mapInPandas(
        add_cell, schema="lon double, lat double, cell string")

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        lons = pdf["lon"].values.astype(np.float64)
        lats = pdf["lat"].values.astype(np.float64)
        labels = dbscan_numpy(lons, lats, eps_m, capacity)
        rows = []
        for c in np.unique(labels[labels >= 0]):
            m = labels == c
            cx = float(np.mean(lons[m]))
            cy = float(np.mean(lats[m]))
            hull = convex_hull(lons[m], lats[m])
            wkt = (
                "POLYGON ((" + ", ".join(f"{x:.7f} {y:.7f}" for x, y in
                                         hull + hull[:1]) + "))"
                if len(hull) >= 3 else "POINT EMPTY"
            )
            cid = int(np.uint64(geohash_int_np([cx], [cy], 12)[0]))
            # bbox in EXACT member coordinates (min/max, no arithmetic) —
            # unlike the float centroid these are bit-reproducible by any
            # engine, which is what the driver oracle compares
            rows.append((key[0], cid, int(m.sum()), cx, cy,
                         float(lons[m].min()), float(lats[m].min()),
                         float(lons[m].max()), float(lats[m].max()), wkt))
        return pd.DataFrame(
            rows, columns=["cell", "cluster_id", "n_points",
                           "centroid_lon", "centroid_lat", "min_lon",
                           "min_lat", "max_lon", "max_lat", "hull_wkt"]
        )

    return with_cell.groupBy("cell").applyInPandas(run, schema=CLUSTER_SCHEMA)
