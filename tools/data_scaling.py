"""Data-scaling evidence past one box's RAM comfort (round-4 verdict
Next #7), in three legs — all at local[32], best-of-2 per measurement,
inputs materialized to parquet first so every timed stage starts from a
parallel scan like a real job:

1. ``tile``  — the JVM tile pass (assign_tile_cells) at 32/64/128/256M
   rows: extends the r4 curve one doubling past the last committed point
   and checks the per-row marginal cost stays flat (linear, no cliff).
2. ``match`` — the broadcast map-match leg at 0.6/2/4M GPS points on the
   grid(50) fixture: same linearity check for the Viterbi stage.
3. ``crossover`` — celljoin vs broadcast at growing GRAPH sizes, up to one
   the default broadcast guard (5M collected rows) REJECTS: demonstrates
   the no-broadcast scale path (a) keeps working where the broadcast path
   refuses, and (b) where the time crossover sits. The broadcast column
   past the guard is measured with the limit explicitly raised — the
   escape hatch a trusted caller would use — so both curves extend
   through the rejection point.

Usage: python tools/data_scaling.py [tile|match|crossover|all] [out_json]
Prints one JSON line per leg; writes the combined JSON to out_json
(default /tmp/data_scaling_r5.json).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    from routers_spark.session import get_spark

    spark = get_spark(f"local[{CPUS}]", app_name="data_scaling",
                      shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _timed_noop(df, warm_rows: int = 100_000, reps: int = 2) -> float:
    df.limit(warm_rows).write.mode("overwrite").format("noop").save()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def leg_tile(spark, sizes=(32_000_000, 64_000_000, 128_000_000,
                           256_000_000)) -> dict:
    from pyspark.sql import functions as F

    from routers_spark import queries as Q
    from routers_spark.tiling.pipeline import assign_tile_cells

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_events = ev.count()
    out = {"leg": "tile", "cpus": CPUS, "points": []}
    # ONE materialization at the largest size; smaller sizes filter on the
    # rep column from the same files (identical row shape, no re-write)
    max_mult = max(1, max(sizes) // n_events)
    big_dir = tempfile.mkdtemp(prefix="datascale_pts_")
    (
        ev.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(max_mult))))
        .withColumn("lon", F.expr(Q.EVENT_LON) + F.col("rep") * 1e-7)
        .withColumn("lat", F.expr(Q.EVENT_LAT))
        .select("event_id", "rep", "lon", "lat")
        .repartition(CPUS * 8)
        .write.mode("overwrite").parquet(big_dir)
    )
    pts_all = spark.read.parquet(big_dir)
    for target in sizes:
        mult = max(1, target // n_events)
        pts = pts_all.filter(F.col("rep") <= mult)
        sec = _timed_noop(assign_tile_cells(pts, zoom=15, gh_precision=6))
        rows = mult * n_events
        out["points"].append({
            "rows": rows, "sec": round(sec, 2),
            "mrows_per_sec": round(rows / sec / 1e6, 1),
        })
        print(json.dumps(out["points"][-1]), file=sys.stderr, flush=True)
    return out


def _write_trips(spark, nodes, edges, n_trips: int, seed: int) -> "object":
    from routers_spark.fixtures.roads import walk_trips

    trips = walk_trips(nodes, edges, n_trips=n_trips, points_per_trip=10,
                       seed=seed)
    d = tempfile.mkdtemp(prefix="datascale_trips_")
    (spark.createDataFrame(trips).repartition(CPUS * 4, "trip_id")
     .write.mode("overwrite").parquet(d))
    return spark.read.parquet(d), len(trips)


def leg_match(spark, n_points=(600_000, 2_000_000, 4_000_000)) -> dict:
    from routers_spark.fixtures.roads import grid_network
    from routers_spark.matching.matcher import match_trips

    nodes, edges = grid_network(50)
    nodes_df, edges_df = (spark.createDataFrame(nodes),
                          spark.createDataFrame(edges))
    out = {"leg": "match", "cpus": CPUS, "graph": "grid(50)", "points": []}
    for np_target in n_points:
        points_df, n = _write_trips(spark, nodes, edges, np_target // 10,
                                    seed=42)
        matched = match_trips(points_df, nodes_df, edges_df)
        sec = _timed_noop(matched, warm_rows=5_000)
        out["points"].append({
            "gps_points": n, "sec": round(sec, 2),
            "krows_per_sec": round(n / sec / 1e3, 1),
        })
        print(json.dumps(out["points"][-1]), file=sys.stderr, flush=True)
    return out


def _write_grid_graph_sql(spark, g: int, gd: str, spacing: float = 0.002,
                          lon0: float = -118.5, lat0: float = 33.7,
                          diag_every: int = 7) -> None:
    """Distributed twin of fixtures.roads.grid_network (identical ids,
    coords, edge order and weights — same integer arithmetic, same IEEE
    lon0 + j*spacing doubles): a grid past ~10M edges OOMs the driver if
    built as pandas and shipped through py4j, which is exactly the graph
    size the crossover leg needs to show the broadcast path failing."""
    from pyspark.sql import functions as F

    from routers_spark.fixtures.roads import DEFAULT_WEIGHT

    n = g
    nodes = spark.range(n * n).select(
        F.col("id").alias("node_id"),
        (F.lit(lon0) + (F.col("id") % n).cast("double") * spacing).alias("lon"),
        (F.lit(lat0) + (F.col("id") / n).cast("long").cast("double")
         * spacing).alias("lat"),
    )
    h = spark.range(n * (n - 1)).select(
        F.col("id").alias("edge_id"),
        ((F.col("id") / (n - 1)).cast("long") * n
         + F.col("id") % (n - 1)).alias("src"))
    h = h.withColumn("dst", F.col("src") + 1)
    v = spark.range((n - 1) * n).select(
        (F.col("id") + n * (n - 1)).alias("edge_id"),
        F.col("id").alias("src")).withColumn("dst", F.col("src") + n)
    m = len(range(0, n - 1, diag_every))
    d = spark.range(m * m).select(
        (F.col("id") + n * (n - 1) + (n - 1) * n).alias("edge_id"),
        ((F.col("id") / m).cast("long") * diag_every * n
         + (F.col("id") % m) * diag_every).alias("src"))
    d = d.withColumn("dst", F.col("src") + n + 1)
    fwd = h.unionByName(v).unionByName(d)
    both = fwd.unionByName(
        fwd.select("edge_id", F.col("dst").alias("src"),
                   F.col("src").alias("dst")))
    edges = both.withColumn("weight",
                            F.lit(DEFAULT_WEIGHT).cast("long"))
    nodes.repartition(CPUS).write.mode("overwrite").parquet(f"{gd}/nodes")
    edges.repartition(CPUS).write.mode("overwrite").parquet(f"{gd}/edges")


def leg_crossover(spark, grid_sizes=(50, 300, 700, 1150),
                  n_trips=20_000) -> dict:
    """Fixed trip corpus (200k GPS points), growing road graph. grid(1150)
    has ~1.32M nodes and ~5.3M directed edges — past the 5M-row default
    broadcast guard. Trips walk a SUBGRID (the grid(50) corner shared by
    every size) so the matched workload is identical across sizes; what
    grows is the graph the candidate stage must search."""
    import pandas as pd

    from routers_spark.fixtures.roads import grid_network
    from routers_spark.matching.matcher import match_trips

    sub_nodes, sub_edges = grid_network(50)
    points_df, n = _write_trips(spark, sub_nodes, sub_edges, n_trips, seed=7)
    out = {"leg": "crossover", "cpus": CPUS, "gps_points": n, "points": []}
    for g in grid_sizes:
        # graph tables go to parquet too: the guard/collect probe must run
        # against a scanned table, not a pre-materialized local relation.
        # Built distributedly — a >=10M-edge pandas frame shipped through
        # py4j OOMs the driver before any measurement runs.
        gd = tempfile.mkdtemp(prefix=f"datascale_graph{g}_")
        _write_grid_graph_sql(spark, g, gd)
        nodes_df = spark.read.parquet(f"{gd}/nodes")
        edges_df = spark.read.parquet(f"{gd}/edges")
        edge_rows = edges_df.count()
        n_nodes = nodes_df.count()

        rejected = False
        if edge_rows > 5_000_000:
            try:  # the default guard must refuse this size
                match_trips(points_df, nodes_df, edges_df).limit(1).collect()
            except ValueError:
                rejected = True
        # celljoin FIRST: past the driver's memory envelope the broadcast
        # leg can abort the JVM outright — the celljoin number must exist
        # by then, and a broadcast crash is itself the datapoint
        t_cj = _timed_noop(
            match_trips(points_df, nodes_df, edges_df,
                        candidate_path="celljoin"), warm_rows=5_000)
        point = {
            "grid": g, "nodes": n_nodes, "edge_rows": edge_rows,
            "guard_rejects_broadcast": rejected,
            "celljoin_sec": round(t_cj, 2),
        }
        print(json.dumps(point), file=sys.stderr, flush=True)
        try:
            t_bc = _timed_noop(
                match_trips(points_df, nodes_df, edges_df,
                            broadcast_limit_rows=None), warm_rows=5_000)
            point["broadcast_sec"] = round(t_bc, 2)
        except Exception as e:  # noqa: BLE001 — OOM/py4j abort IS the result
            point["broadcast_sec"] = None
            point["broadcast_error"] = f"{type(e).__name__}: {str(e)[:1200]}"
        out["points"].append(point)
        print(json.dumps(out["points"][-1]), file=sys.stderr, flush=True)
    return out


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/data_scaling_r5.json"
    spark = _spark()
    legs = []
    if which in ("tile", "all"):
        legs.append(leg_tile(spark))
    if which in ("match", "all"):
        msizes = os.environ.get("MATCH_POINTS")
        if msizes:
            legs.append(leg_match(
                spark, n_points=tuple(int(s) for s in msizes.split(","))))
        else:
            legs.append(leg_match(spark))
    if which in ("crossover", "all"):
        sizes = os.environ.get("CROSSOVER_GRIDS")
        if sizes:
            legs.append(leg_crossover(
                spark, grid_sizes=tuple(int(s) for s in sizes.split(","))))
        else:
            legs.append(leg_crossover(spark))
    result = {"sf": SF_DIR, "legs": legs}
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
