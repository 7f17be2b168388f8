"""Spark-level end-to-end map matching: match_trips over DataFrames with the
broadcast packed graph, both output modes, distributed determinism."""

import pandas as pd
import pytest

from routers_spark.fixtures.roads import grid_network, straight_road, walk_trips
from routers_spark.matching.matcher import MatchOptions, match_trips


@pytest.fixture(scope="module")
def grid(spark):
    nodes, edges = grid_network(20)
    trips = walk_trips(nodes, edges, n_trips=12, points_per_trip=10, seed=11)
    return (
        spark.createDataFrame(trips),
        spark.createDataFrame(nodes),
        spark.createDataFrame(edges),
        trips,
    )


def test_match_trips_discretized(spark, grid):
    points_df, nodes_df, edges_df, trips_pdf = grid
    out = match_trips(points_df, nodes_df, edges_df).toPandas()
    matched = out[out.status == "matched"]
    assert len(matched) > 0
    # one output row per input point for matched trips
    per_trip_in = trips_pdf.groupby("trip_id").size()
    per_trip_out = matched.groupby("trip_id").size()
    for tid, n in per_trip_out.items():
        assert n == per_trip_in[tid]
    # every matched point snapped within the 50 m + jitter envelope
    assert (matched["dist_m"] < 60).all()


def test_match_trips_interpolated(spark, grid):
    points_df, nodes_df, edges_df, _ = grid
    out = match_trips(points_df, nodes_df, edges_df,
                      output="interpolated").toPandas()
    matched = out[out.status == "matched"]
    assert len(matched) > 0
    # no consecutive duplicate points within a trip (route.rs:131 dedup)
    for _, grp in matched.groupby("trip_id"):
        grp = grp.sort_values("elem")
        pts = list(zip(grp.lon, grp.lat))
        assert all(pts[i] != pts[i + 1] for i in range(len(pts) - 1))


def test_match_trips_deterministic_across_runs(spark, grid):
    points_df, nodes_df, edges_df, _ = grid
    a = match_trips(points_df, nodes_df, edges_df).toPandas()
    b = match_trips(points_df, nodes_df, edges_df).toPandas()
    a = a.sort_values(["trip_id", "seq"]).reset_index(drop=True)
    b = b.sort_values(["trip_id", "seq"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_match_trips_statuses(spark):
    nodes, edges = straight_road()
    pts = pd.DataFrame({
        "trip_id": ["ok", "ok", "bad", "bad"],
        "seq": [0, 1, 0, 1],
        "lon": [-118.151, -118.165, -118.151, 0.0],
        "lat": [34.1503, 34.1503, 34.1503, 0.0],
    })
    out = match_trips(
        spark.createDataFrame(pts),
        spark.createDataFrame(nodes),
        spark.createDataFrame(edges),
    ).toPandas()
    by_trip = {t: set(g.status) for t, g in out.groupby("trip_id")}
    assert by_trip["ok"] == {"matched"}
    assert by_trip["bad"] == {"unanchored"}


def test_match_trips_drop_unanchored(spark):
    nodes, edges = straight_road()
    pts = pd.DataFrame({
        "trip_id": ["t"] * 3,
        "seq": [0, 1, 2],
        "lon": [-118.151, 0.0, -118.165],
        "lat": [34.1503, 0.0, 34.1503],
    })
    out = match_trips(
        spark.createDataFrame(pts),
        spark.createDataFrame(nodes),
        spark.createDataFrame(edges),
        MatchOptions(drop_unanchored=True),
    ).toPandas()
    assert set(out.status) == {"matched"}
    assert len(out) == 2


def test_broadcast_guard_rejects_big_graph(spark, grid):
    """A graph past the broadcast envelope must refuse the driver collect
    and point at the celljoin scale path instead of OOMing the driver."""
    points_df, nodes_df, edges_df, _ = grid
    with pytest.raises(ValueError, match="celljoin"):
        match_trips(points_df, nodes_df, edges_df, broadcast_limit_rows=10)
    # at/below the limit the path still works
    out = match_trips(points_df, nodes_df, edges_df,
                      broadcast_limit_rows=10_000_000).toPandas()
    assert (out.status == "matched").any()


def test_map_match_exact_premise_single_candidate(spark):
    """The driver gate's degenerate premise: EVERY corridor point's search
    box admits exactly one edge (emission-only solve). If a radius or
    fixture change breaks this, the gate's closed-form oracle is invalid —
    fail here, loudly, not in the driver record."""
    import numpy as np

    from routers_spark.graph.packed import build_packed_graph
    from routers_spark.matching.matcher import (
        MatchOptions,
        candidates_for_points,
    )
    from routers_spark.queries import _mme_points_sql

    pts = spark.sql(
        _mme_points_sql().replace(
            "FROM events",
            "FROM (SELECT explode(sequence(0, 999)) AS event_id)")
    ).toPandas()
    r = np.arange(40)
    import pandas as pd
    nodes = pd.DataFrame({
        "node_id": np.concatenate([2 * r, 2 * r + 1]),
        "lon": np.concatenate([np.full(40, -118.5), np.full(40, -118.4)]),
        "lat": np.concatenate([33.0 + r * 0.02] * 2),
    })
    edges = pd.DataFrame({"edge_id": r, "src": 2 * r, "dst": 2 * r + 1,
                          "weight": np.full(40, 10)})
    g = build_packed_graph(nodes, edges).build_cell_index()
    opts = MatchOptions()
    cands = candidates_for_points(g, pts["lon"].values, pts["lat"].values,
                                  opts.search_distance, opts.emission_error)
    counts = np.array([len(c["edge_row"]) for c in cands])
    assert (counts == 1).all()
    # and the admitted edge is the point's own road
    rows = np.array([c["edge_row"][0] for c in cands])
    assert (g.edge_id[rows] == pts["road"].values).all()


def test_driver_registry_holds_fifty_entries():
    """Round-3's driver record truncated at 50 rows; round 5 registers 52
    (cell_encode_s2 and raster_zonal_stats joined) with the sacrificial
    rows-only entries at the exact tail — if the cap still holds, the
    loss lands on map_match_discretized + map_match_celljoin (both
    rows-only perf rows, facade gated by their hash-green exact twins)
    per the documented truncation priority. Every oracle name must be a
    registered query."""
    from routers_spark import queries as Q

    qs = Q.queries()
    os_ = Q.oracle_sql()
    assert len(qs) == 52
    assert "cell_encode_s2" in os_
    assert "raster_zonal_stats" in os_
    # the tail rows are the documented cheapest drops
    assert list(qs)[-2:] == ["map_match_discretized", "map_match_celljoin"]
    assert set(os_) <= set(qs)
    names = list(qs)
    # the historically-truncated ANN rows sit ahead of the other
    # rows-only entries, away from the registry tail
    rows_only = [n for n in names if n not in os_]
    assert rows_only.index("ann_ivf_topk") < 2
    assert rows_only.index("ann_lsh_topk") < 2
    # the retired pure-SQL twins stay reachable for the pytest parity gates
    assert "minhash_signature" in Q.sql_queries()


def test_engine_gates_run_the_engine():
    """Anti-vacuous-gate guard (review-2 catch): every oracle-gated query
    whose docstring claims the Spark side runs the REAL engine must have a
    _SPARK_OVERRIDES entry — otherwise spark_fn falls back to executing
    the oracle SQL on both engines and the gate compares the oracle to
    itself."""
    from routers_spark import queries as Q

    engine_gates = [
        "maxspeed_parse", "access_parse", "opening_hours_parse",
        "map_match_exact", "map_match_exact_celljoin",
        "dbscan_clusters", "mvt_point_tiles", "audio_window_features",
        "image_features", "image_resize", "video_frame_sample",
        "raster_pyramid_tiles", "ann_lsh_exact", "ann_ivf_exact",
        "osm_pbf_way_expansion", "embedding_dedup",
        "minhash_dedup_pipeline", "zone_bbox_lookup",
        "cell_encode_s2",
    ]
    missing = [n for n in engine_gates if n not in Q._SPARK_OVERRIDES]
    assert not missing, missing
