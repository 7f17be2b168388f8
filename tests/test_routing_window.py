"""R10 geo routing (streaming/routing.py) + P6 shard window (shard/window.py).

Mirrors the reference semantics:
  - shard_of(point) = geohash-4 (event.rs:245-252), salted when hot;
  - ShardWindow::recenter delta {scoped, unscoped}
    (loader/window.rs:90-128) with the 8-probe neighbour trick
    (strategy/geohash.rs:168-204).
"""

import numpy as np
import pandas as pd

from routers_spark.functions.cells import (
    geohash_bounds,
    geohash_str_np,
    geohash_subdivide_scalar,
)
from routers_spark.functions.hashing import mix_np
from routers_spark.shard.window import (
    geohash_neighbors,
    recenter,
    window_cells,
)
from routers_spark.streaming.routing import route_assignments


def test_neighbors_are_adjacent_and_symmetric():
    gh = geohash_subdivide_scalar(-118.3, 33.9, 4)
    nbrs = geohash_neighbors(gh)
    assert len(nbrs) == 8
    assert len(set(nbrs)) == 8
    assert gh not in nbrs
    gx0, gy0, gx1, gy1 = geohash_bounds(gh)
    for n in nbrs:
        nx0, ny0, nx1, ny1 = geohash_bounds(n)
        # axis-aligned adjacency: bounds touch or overlap on both axes
        assert nx0 <= gx1 + 1e-9 and nx1 >= gx0 - 1e-9
        assert ny0 <= gy1 + 1e-9 and ny1 >= gy0 - 1e-9
        assert gh in geohash_neighbors(n)  # symmetry


def test_recenter_noop_within_center():
    gh = geohash_subdivide_scalar(-118.3, 33.9, 4)
    x0, y0, x1, y1 = geohash_bounds(gh)
    d = recenter(gh, 0.5 * (x0 + x1), 0.5 * (y0 + y1), precision=4)
    assert d == {"center": gh, "moved": False, "scoped": [], "unscoped": []}


def test_recenter_adjacent_move_delta():
    gh = geohash_subdivide_scalar(-118.3, 33.9, 4)
    x0, y0, x1, y1 = geohash_bounds(gh)
    # step one cell east: the 3 western cells evict, 3 new eastern fetch
    east_lon = x1 + 0.5 * (x1 - x0)
    lat = 0.5 * (y0 + y1)
    d = recenter(gh, east_lon, lat, precision=4)
    assert d["moved"]
    assert d["center"] == geohash_subdivide_scalar(east_lon, lat, 4)
    assert len(d["scoped"]) == 3 and len(d["unscoped"]) == 3
    old = set(window_cells(gh))
    new = set(window_cells(d["center"]))
    assert set(d["scoped"]) == new - old
    assert set(d["unscoped"]) == old - new


def test_recenter_cold_start_scopes_full_window():
    d = recenter(None, -118.3, 33.9, precision=4)
    assert d["moved"] and len(d["scoped"]) == 9 and d["unscoped"] == []


def test_route_assignments_shard_and_salt(spark):
    # two cells: a hot one (60 rows) and a cold one (6 rows)
    rng = np.random.default_rng(7)
    hot = pd.DataFrame({
        "event_id": np.arange(60, dtype=np.int64),
        "lon": -118.30 + rng.random(60) * 0.01,
        "lat": 33.90 + rng.random(60) * 0.01,
    })
    cold = pd.DataFrame({
        "event_id": np.arange(100, 106, dtype=np.int64),
        "lon": -117.20 + rng.random(6) * 0.01,
        "lat": 34.90 + rng.random(6) * 0.01,
    })
    df = spark.createDataFrame(pd.concat([hot, cold], ignore_index=True))
    out = route_assignments(df, hot_threshold=20, salt_buckets=4) \
        .toPandas().set_index("event_id").sort_index()

    exp_hot = geohash_str_np(hot["lon"].values, hot["lat"].values, 4)
    exp_cold = geohash_str_np(cold["lon"].values, cold["lat"].values, 4)
    assert (out.loc[hot["event_id"], "shard"].values == exp_hot).all()
    assert (out.loc[cold["event_id"], "shard"].values == exp_cold).all()
    # cold cells: unsalted single lane
    assert (out.loc[cold["event_id"], "salt"] == 0).all()
    # hot cell: the pinned splitmix lanes
    exp_salt = (mix_np(hot["event_id"].values.astype(np.uint64))
                & np.uint64(3)).astype(np.int64)
    assert (out.loc[hot["event_id"], "salt"].values == exp_salt).all()
    assert out.loc[hot["event_id"], "salt"].nunique() > 1
