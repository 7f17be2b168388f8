"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., ...extras}

Execution is measured end-to-end with the noop sink (full plan runs, nothing
is collected to the driver). The north-star throughput (matched-edge +
tile-assignment rows/sec) is reported alongside; scaling-efficiency evidence
lives in tools/bench_scaling.py → BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE_SQL = [
    "tile_assign_slippy",
    "tile_hilbert_key",
    "cell_encode_geohash",
    "cell_encode_quadkey",
    "cell_encode_s2",
    "tile_pyramid_rollup",
    "spatial_cell_join",
    "knn_nearest_station",
    "zone_assign_pip",
    "gap_sessionize",
    "partition_assign",
    "minhash_engine",
    "simhash_dedup_pairs",
    "embedding_topk_cosine",
    "zone_assign_cells",
    "zone_bbox_lookup",
    "access_eval",
    "osm_pbf_way_expansion",
    "tile_range_scan",
    "geo_route_assign",
    "phash_hamming_pairs",
    "token_counts",
    "cell_count_rollup",
    "maxspeed_parse",
    "access_parse",
    "opening_hours_parse",
    "map_match_exact",
    "map_match_exact_celljoin",
    "ann_lsh_exact",
    "dbscan_clusters",
    "mvt_point_tiles",
]
HEADLINE_ENGINE = [
    "map_match_discretized",
    "map_match_celljoin",
    "raster_pyramid_tiles",
    "raster_zonal_stats",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_ivf_exact",
    "embedding_dedup",
    "image_features",
    "image_resize",
    "video_frame_sample",
    "audio_window_features",
    "phash_dedup_pairs",
    "minhash_dedup_pipeline",
]


def run_full(df) -> tuple[float, int]:
    """Time a FULL materialization of every column via the noop sink —
    ``count()`` alone would let Catalyst prune the computed projections and
    time only the scan. Row count read afterwards from the persisted plan
    (cheap)."""
    df = df.persist()
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    n = df.count()
    df.unpersist()
    return dt, n


def main() -> None:
    from routers_spark import queries as Q
    from routers_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"local[{cpus}]", app_name="routers_spark_bench",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qs = Q.queries()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}

    # warm the JVM + parquet footers once
    Q.register_views(spark, sf_dir)
    spark.sql("SELECT COUNT(*) FROM events").collect()

    # best-of-N per query (default 2): this host has documented ±30%
    # (observed up to ~15x) same-code noise windows — a single-shot record
    # fabricates regressions (round-4 verdict #2). Each rep rebuilds the
    # plan from scratch; min-of-reps is the noise floor, not a cache
    # artifact (the persist is dropped between reps).
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    for name in HEADLINE_SQL + HEADLINE_ENGINE:
        fn = qs[name]
        print(f"[bench] {name} ...", file=sys.stderr, flush=True)
        best = float("inf")
        n = 0
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            build = time.perf_counter() - t0
            dt, n = run_full(df)
            best = min(best, build + dt)
        timings[name] = round(best, 3)
        rows[name] = n
        print(f"[bench] {name}: {timings[name]}s {n} rows",
              file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 2)
    north_rows = rows["map_match_discretized"] + rows["tile_assign_slippy"]
    north_sec = timings["map_match_discretized"] + timings["tile_assign_slippy"]
    out = {
        "metric": "matched+tile rows/sec (suite wall sec)",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": sf_dir,
        "cpus": cpus,
        "reps": reps,
        "north_star_rows_per_sec": round(north_rows / max(north_sec, 1e-9), 1),
    }
    # full detail (incl. row counts) goes to a sidecar + stderr so the
    # official stdout record stays inside the driver's 2000-char tail window
    detail = dict(out, rows=rows)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(json.dumps(detail), file=sys.stderr, flush=True)
    line = json.dumps(out)
    if len(line) > 1900:  # never let the record outgrow the tail window
        out.pop("queries")
        line = json.dumps(out)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
