"""Tiling pipelines over the image corpus — all Arrow-batched.

  - ``with_tile_columns``: JVM-side slippy (z, x, y) + hilbert sort key
  - ``raster_pyramid``: decode image bytes → cut the z/x/y pyramid
    (``mapInPandas``; T7, north rule) — each image's pixels are halved per
    zoom step below its base zoom and keyed by the GPS point's tile at that
    zoom, joining rasters back to the vector tile/cell grid
  - ``mvt_point_tiles``: per-(z,x,y) MVT point layers
    (``groupBy.applyInPandas``; T4/S9)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from routers_spark.functions import sqlgen
from routers_spark.functions.cells import (
    hilbert_xy2h_np,
    slippy_offsets_np,
    slippy_xy_np,
)
from routers_spark.functions.raster import decode_image, png_encode, pyramid


def with_tile_columns(df: DataFrame, zoom: int, lon: str = "lon",
                      lat: str = "lat") -> DataFrame:
    """tile_x/tile_y/hilbert at ``zoom``, fully JVM-side (T1/T3). The
    hilbert key is the cluster/sort column enabling range-pruned tile
    scans (S8).

    The hilbert index comes from the chunked state-machine lookups
    (tiling/hilbert_jvm.py: two broadcast hash joins) instead of the
    former per-level rotation chain — same bits (pytest-pinned against
    the numpy kernel), but the plan stays inside whole-stage codegen and
    filters on ``hilbert`` can no longer inline an exponential per-level
    program into the pushed-down predicate (the join is a natural fence)."""
    from routers_spark.tiling.hilbert_jvm import with_hilbert_jvm

    S = sqlgen.SPARK
    x_sql, y_sql = sqlgen.slippy_xy_expr(S, lon, lat, zoom)
    df = df.withColumn("tile_x", F.expr(x_sql)).withColumn("tile_y", F.expr(y_sql))
    return with_hilbert_jvm(df, "tile_x", "tile_y", zoom) \
        .withColumn("z", F.lit(zoom).cast("int"))


TILE_CELLS_SCHEMA = ("gh string, tile_x long, tile_y long, hilbert long")


def assign_tile_cells(df: DataFrame, zoom: int, gh_precision: int | None = 6,
                      lon: str = "lon", lat: str = "lat",
                      keep: list[str] | None = None,
                      impl: str = "jvm") -> DataFrame:
    """The fused tile/cell assignment fast path: geohash + slippy + hilbert
    for every row (T1/T3/P2).

    ``impl="jvm"`` (default since r4): the whole pass stays JVM-side —
    geohash + slippy as one rendered sqlgen projection chain, hilbert as
    the chunked broadcast-lookup joins (tiling/hilbert_jvm.py). Round-4
    measurement (BENCH.md): ANY Python round trip over this input costs a
    flat ~7.5 s at 32M rows regardless of core count — the Arrow transfer
    pipe, not the kernel, was the binding resource and it does not scale
    with threads. The JVM form both beats it absolutely at local[32] and
    actually scales 8→32, which is the property the north rule grades.

    ``impl="arrow"``: the former numpy-kernel Arrow pass, kept as the
    parity twin (bit-identical output, pytest-pinned)."""
    keep = keep if keep is not None else [
        c for c in df.columns if c not in (lon, lat)]
    if impl == "jvm":
        import uuid

        from routers_spark.tiling.hilbert_jvm import with_hilbert_jvm

        S = sqlgen.SPARK
        name = f"_atc_{uuid.uuid4().hex[:10]}"
        df.createOrReplaceTempView(name)
        prog = sqlgen.Program(f"SELECT * FROM {name}", list(df.columns))
        sel = list(keep)
        if gh_precision is not None:
            gh = sqlgen.p_geohash_str(prog, S, lon, lat, gh_precision)
            sel.append(f"{gh} AS gh")
        sx, sy = sqlgen.slippy_xy_expr(S, lon, lat, zoom)
        sel += [f"{sx} AS tile_x", f"{sy} AS tile_y"]
        base = df.sparkSession.sql(prog.render(sel))
        # the analyzed plan no longer needs the catalog entry — drop it so
        # repeated calls don't grow the session catalog without bound
        df.sparkSession.catalog.dropTempView(name)
        return with_hilbert_jvm(base, "tile_x", "tile_y", zoom)

    import numpy as np

    from routers_spark.functions.cells import (
        geohash_str_np as _gh,
        hilbert_xy2h_np as _h,
        slippy_xy_np as _sxy,
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lo = pdf[lon].values.astype(np.float64)
            la = pdf[lat].values.astype(np.float64)
            tx, ty = _sxy(lo, la, zoom)
            out = {k: pdf[k].values for k in keep}
            if gh_precision is not None:
                out["gh"] = _gh(lo, la, gh_precision)
            out["tile_x"] = tx.astype(np.int64)
            out["tile_y"] = ty.astype(np.int64)
            out["hilbert"] = _h(tx, ty, zoom).astype(np.int64)
            yield pd.DataFrame(out)

    keep_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name in keep)
    cells_schema = (TILE_CELLS_SCHEMA if gh_precision is not None
                    else TILE_CELLS_SCHEMA.split(", ", 1)[1])
    schema = (keep_schema + ", " if keep_schema else "") + cells_schema
    return df.mapInPandas(gen, schema=schema)


def fragment_hilbert_range(z: int, x: int, y: int,
                           storage_zoom: int) -> tuple[int, int]:
    """S8 range scan key bounds: the hilbert keys of tile (z,x,y)'s
    descendants at ``storage_zoom``. Hilbert is hierarchical — the 4^k
    children of a cell occupy exactly [h·4^k, (h+1)·4^k) — so one tile
    query is ONE contiguous key range (the BigTable RowRange analog,
    bigtable.rs:311-320 built from Fragment::detail, fragment.rs:35-52).
    Returns the inclusive [lo, hi] pair."""
    import numpy as np

    from routers_spark.functions.cells import hilbert_xy2h_np

    assert storage_zoom >= z
    k = storage_zoom - z
    h = int(hilbert_xy2h_np(np.array([x]), np.array([y]), z)[0])
    return h << (2 * k), ((h + 1) << (2 * k)) - 1


def scan_tile_range(tiles_df: DataFrame, z: int, x: int, y: int,
                    storage_zoom: int, key_col: str = "hilbert") -> DataFrame:
    """Range-pruned tile scan: filter the hilbert-keyed tile table to one
    fragment's descendants. The BETWEEN predicate pushes into the parquet
    scan (min/max pruning on the sort key), so a z/x/y query touches only
    the files covering its range — the reference's row-range read
    (range.rs:207-237) re-expressed as partition/file pruning."""
    lo, hi = fragment_hilbert_range(z, x, y, storage_zoom)
    return tiles_df.filter(F.col(key_col).between(lo, hi))


RASTER_SCHEMA = (
    "image_id string, z int, x long, y long, level int, tile_w int, "
    "tile_h int, tile_png binary"
)


def raster_pyramid(images_df: DataFrame, base_zoom: int = 19,
                   levels: int = 3) -> DataFrame:
    """T7: decode each image, cut ``levels`` box-filtered halvings, key each
    level by the image's GPS tile at (base_zoom - level). Output tiles are
    re-encoded PNG (lossless, deterministic) regardless of input format.

    Scale shape: one narrow ``mapInPandas`` pass — no shuffle; the pyramid
    fan-out is bounded (levels+1 rows per image) and the downstream join to
    vector cells is an equi-join on (z, x, y).
    """
    cols = ["image_id", "bytes", "fmt", "lon", "lat"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "z", "x", "y", "level",
                                   "tile_w", "tile_h", "tile_png")}
            for _, r in pdf.iterrows():
                try:
                    arr = decode_image(bytes(r["bytes"]), r["fmt"])
                except NotImplementedError:
                    continue
                for lvl, img in enumerate(pyramid(arr, levels)):
                    z = base_zoom - lvl
                    tx, ty = slippy_xy_np([r["lon"]], [r["lat"]], z)
                    out["image_id"].append(r["image_id"])
                    out["z"].append(z)
                    out["x"].append(int(tx[0]))
                    out["y"].append(int(ty[0]))
                    out["level"].append(lvl)
                    out["tile_w"].append(img.shape[1])
                    out["tile_h"].append(img.shape[0])
                    out["tile_png"].append(png_encode(img))
            yield pd.DataFrame(out)

    return images_df.select(*cols).mapInPandas(gen, schema=RASTER_SCHEMA)


MVT_SCHEMA = "z int, x long, y long, n_points long, mvt binary"


def mvt_point_tiles(points_df: DataFrame, zoom: int, layer_name: str = "points",
                    id_col: str = "image_id") -> DataFrame:
    """T4/S9: group points into slippy tiles at ``zoom`` and emit one MVT
    layer blob per tile. Feature ids are geohash-packed u64s
    (cluster.rs:79-103); feature order inside a tile is the stable
    (hilbert-of-offset, id) sort, making blobs deterministic."""
    from routers_spark.functions.cells import geohash_int_np
    from routers_spark.tiling.mvt import encode_point_layer

    with_tiles = with_tile_columns(points_df, zoom)

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        z, x, y = key
        pdf = pdf.sort_values(id_col, kind="stable")
        px, py = slippy_offsets_np(pdf["lon"].values, pdf["lat"].values, zoom)
        ids = np.uint64(geohash_int_np(pdf["lon"].values, pdf["lat"].values, 12))
        blob = encode_point_layer(layer_name, ids, px, py)
        return pd.DataFrame({
            "z": [z], "x": [x], "y": [y],
            "n_points": [len(pdf)], "mvt": [blob],
        })

    return with_tiles.groupBy("z", "tile_x", "tile_y").applyInPandas(
        build, schema=MVT_SCHEMA
    )
