"""MVT wire-format round-trip, DBSCAN clustering semantics, PIP zone
assignment, hilbert Column-expression parity."""

import numpy as np
import pandas as pd
import pytest

from routers_spark.functions.cells import (
    geohash_int_np,
    hilbert_xy2h_np,
    slippy_offsets_np,
    slippy_xy_np,
)
from routers_spark.tiling.cluster import convex_hull, dbscan_numpy
from routers_spark.tiling.mvt import (
    MOVE_TO_1,
    decode_layer,
    encode_point_layer,
    unzig,
    zig,
)


def test_zigzag_u32():
    assert zig(0) == 0
    assert zig(1) == 2
    assert zig(0xFFFFFFFF) == 0xFFFFFFFF  # u32 -1 → zig -1 = 1? (u32 math)
    # the reference zig is on u32: (v << 1) ^ (v >> 31)
    assert zig(2048) == 4096
    assert unzig(zig(2048)) == 2048


def test_mvt_roundtrip_point_layer():
    ids = [7, 9]
    px = [100, 4000]
    py = [200, 4095]
    blob = encode_point_layer("pts", ids, px, py,
                              keys=["name"], str_values=[["a"], ["b"]])
    layer = decode_layer(blob)
    assert layer["version"] == 2
    assert layer["extent"] == 4096
    assert layer["name"] == "pts"
    assert layer["keys"] == ["name"]
    assert len(layer["features"]) == 2
    f0 = layer["features"][0]
    assert f0["id"] == 7
    assert f0["type"] == 1
    assert f0["geometry"][0] == MOVE_TO_1 == 9
    assert unzig(f0["geometry"][1]) == 100
    assert unzig(f0["geometry"][2]) == 200
    # tags interleave [key_index, value_index] with value index =
    # feature_index * n_keys + k (layer.rs:86-90)
    assert f0["tags"] == [0, 0]
    assert layer["features"][1]["tags"] == [0, 1]


def test_dbscan_two_blobs_and_noise():
    # two tight blobs 400 m apart + one far point
    base = np.array([
        [-118.500, 34.000], [-118.5001, 34.0001], [-118.5002, 34.0000],
        [-118.496, 34.000], [-118.4961, 34.0001], [-118.4962, 34.0002],
        [-118.40, 34.10],
    ])
    labels = dbscan_numpy(base[:, 0], base[:, 1], eps_m=50.0)
    assert labels[6] == -1
    assert len(set(labels[:3])) == 1 and labels[0] >= 0
    assert len(set(labels[3:6])) == 1 and labels[3] >= 0
    assert labels[0] != labels[3]


def test_dbscan_capacity_cap():
    # 20 colinear close points with capacity 5: first cluster capped at 5
    lons = -118.5 + np.arange(20) * 0.00001
    lats = np.full(20, 34.0)
    labels = dbscan_numpy(lons, lats, eps_m=10.0, capacity=5)
    counts = {c: int((labels == c).sum()) for c in set(labels) if c >= 0}
    assert all(v <= 5 for v in counts.values())


def test_dbscan_min_cluster_three():
    # a pair (2 points) never forms a cluster (Clustered needs >= 3)
    lons = np.array([-118.5, -118.5001, -118.3])
    lats = np.array([34.0, 34.0, 34.0])
    labels = dbscan_numpy(lons, lats, eps_m=50.0)
    assert list(labels) == [-1, -1, -1]


def test_convex_hull_square_with_interior():
    xs = np.array([0.0, 1.0, 1.0, 0.0, 0.5])
    ys = np.array([0.0, 0.0, 1.0, 1.0, 0.5])
    hull = convex_hull(xs, ys)
    assert len(hull) == 4
    assert set(hull) == {(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)}


def test_slippy_offsets_range():
    lon = np.linspace(-118.5, -118.0, 100)
    lat = np.linspace(33.7, 34.1, 100)
    xo, yo = slippy_offsets_np(lon, lat, 12)
    assert (xo >= 0).all() and (xo < 4096).all()
    assert (yo >= 0).all() and (yo < 4096).all()


# --------------------------------------------------------------- spark side


def test_with_tile_columns_matches_numpy(spark):
    from routers_spark.tiling.pipeline import with_tile_columns

    pdf = pd.DataFrame({
        "lon": np.linspace(-118.5, -118.0, 50),
        "lat": np.linspace(33.7, 34.1, 50),
    })
    out = with_tile_columns(spark.createDataFrame(pdf), 12).toPandas()
    tx, ty = slippy_xy_np(pdf["lon"].values, pdf["lat"].values, 12)
    assert np.array_equal(out["tile_x"].values, tx)
    assert np.array_equal(out["tile_y"].values, ty)
    assert np.array_equal(out["hilbert"].values,
                          hilbert_xy2h_np(tx, ty, 12))


def test_assign_tile_cells_matches_jvm_form(spark):
    """The fused numpy fast path ≡ the JVM expression program (both also
    pinned to DuckDB by the tile_hilbert_key / cell_encode_geohash
    oracles)."""
    from routers_spark.functions.cells import geohash_str_np
    from routers_spark.tiling.pipeline import assign_tile_cells, with_tile_columns

    pdf = pd.DataFrame({
        "pid": np.arange(60, dtype=np.int64),
        "lon": np.linspace(-118.5, -118.0, 60),
        "lat": np.linspace(33.7, 34.1, 60),
    })
    df = spark.createDataFrame(pdf)
    fast = assign_tile_cells(df, zoom=12, gh_precision=6) \
        .toPandas().sort_values("pid").reset_index(drop=True)
    jvm = with_tile_columns(df, 12).toPandas() \
        .sort_values("pid").reset_index(drop=True)
    assert np.array_equal(fast["tile_x"].values, jvm["tile_x"].values)
    assert np.array_equal(fast["tile_y"].values, jvm["tile_y"].values)
    assert np.array_equal(fast["hilbert"].values, jvm["hilbert"].values)
    assert (fast["gh"].values == geohash_str_np(
        pdf["lon"].values, pdf["lat"].values, 6)).all()
    assert list(fast.columns) == ["pid", "gh", "tile_x", "tile_y", "hilbert"]


def test_raster_pyramid_spark(spark):
    from routers_spark.fixtures.images import generate_images
    from routers_spark.functions.raster import (
        decode_image,
        png_decode,
        psnr,
        pyramid,
    )
    from routers_spark.tiling.pipeline import raster_pyramid

    images = generate_images(20, seed=5)
    df = spark.createDataFrame(images)
    out = raster_pyramid(df, base_zoom=19, levels=2).toPandas()
    assert set(out["level"]) == {0, 1, 2}
    # verify one image end-to-end: level tiles equal the local pyramid
    img0 = images.iloc[0]
    mine = out[out.image_id == img0.image_id].sort_values("level")
    arr = decode_image(bytes(img0["bytes"]), img0["fmt"])
    local = pyramid(arr, 2)
    for lvl, (_, row) in enumerate(mine.iterrows()):
        got = png_decode(bytes(row["tile_png"]))
        assert np.array_equal(got, local[lvl])
        # parity gate: decoded pixels vs original-at-level
        assert psnr(got, local[lvl]) == float("inf")
    # tile keys follow the slippy projection of the GPS point
    tx, ty = slippy_xy_np([img0["lon"]], [img0["lat"]], 19)
    r0 = mine[mine.level == 0].iloc[0]
    assert (r0["x"], r0["y"]) == (tx[0], ty[0])


def test_mvt_point_tiles_spark(spark):
    from routers_spark.tiling.pipeline import mvt_point_tiles

    pdf = pd.DataFrame({
        "image_id": [f"i{k}" for k in range(30)],
        "lon": np.linspace(-118.45, -118.44, 30),
        "lat": np.full(30, 33.75),
    })
    out = mvt_point_tiles(spark.createDataFrame(pdf), zoom=14).toPandas()
    assert out["n_points"].sum() == 30
    total = 0
    for _, row in out.iterrows():
        layer = decode_layer(bytes(row["mvt"]))
        assert layer["version"] == 2 and layer["extent"] == 4096
        total += len(layer["features"])
    assert total == 30


def test_assign_zones_spark(spark):
    from routers_spark.zones.pip import assign_zones

    zones = [
        {"zone_id": "west", "ring": [(-118.52, 33.69), (-118.48, 33.69),
                                     (-118.48, 33.75), (-118.52, 33.75)]},
        {"zone_id": "east", "ring": [(-118.48, 33.69), (-118.40, 33.69),
                                     (-118.40, 33.75), (-118.48, 33.75)]},
    ]
    pdf = pd.DataFrame({
        "image_id": ["a", "b", "c"],
        "lon": [-118.50, -118.45, -118.30],
        "lat": [33.72, 33.72, 33.72],
    })
    out = assign_zones(spark.createDataFrame(pdf), zones).toPandas()
    z = dict(zip(out.image_id, out.zone_id))
    assert z == {"a": "west", "b": "east", "c": None}


def test_hilbert_jvm_matches_numpy(spark):
    """Chunked state-machine lookup joins == the classic rotation loop,
    bit for bit, across orders that exercise 1- and 2-chunk plans."""
    import numpy as np
    import pandas as pd

    from routers_spark.functions.cells import hilbert_xy2h_np
    from routers_spark.tiling.hilbert_jvm import with_hilbert_jvm

    rng = np.random.default_rng(3)
    for order in (3, 8, 9, 12, 15, 16):
        n = 4000
        pdf = pd.DataFrame({
            "i": np.arange(n),
            "x": rng.integers(0, 1 << order, n),
            "y": rng.integers(0, 1 << order, n),
        })
        got = (with_hilbert_jvm(spark.createDataFrame(pdf), "x", "y", order)
               .toPandas().sort_values("i"))
        want = hilbert_xy2h_np(got["x"].values, got["y"].values, order)
        np.testing.assert_array_equal(got["hilbert"].values, want), order


def test_assign_tile_cells_jvm_plan_has_no_python(spark):
    """Scale guard for the r4 fast path: the default assign_tile_cells plan
    must stay entirely JVM-side — broadcast lookup joins for hilbert, no
    Arrow/Python eval node anywhere (the Arrow pipe was the measured
    non-scaling resource, BENCH.md round-4 breakdown)."""
    import pandas as pd

    from routers_spark.tiling.pipeline import assign_tile_cells

    df = spark.createDataFrame(pd.DataFrame({
        "i": [1, 2, 3],
        "lon": [-118.41, -118.42, -118.43],
        "lat": [33.71, 33.72, 33.73],
    }))
    plan = assign_tile_cells(df, zoom=15, gh_precision=6) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for bad in ("ArrowEvalPython", "FlatMapInPandas", "MapInPandas",
                "BatchEvalPython"):
        assert bad not in plan, bad


def test_hilbert_jvm_preserves_null_rows(spark):
    """A NULL x/y must yield a NULL hilbert key, not a silently dropped
    row (the lookup joins are LEFT joins for exactly this reason)."""
    import pandas as pd

    from routers_spark.tiling.hilbert_jvm import with_hilbert_jvm

    pdf = pd.DataFrame({"i": [0, 1, 2],
                        "x": pd.array([3, None, 7], dtype="Int64"),
                        "y": pd.array([5, 2, None], dtype="Int64")})
    out = with_hilbert_jvm(spark.createDataFrame(pdf), "x", "y", 15) \
        .toPandas().sort_values("i")
    assert len(out) == 3
    assert out["hilbert"].notna().tolist() == [True, False, False]
