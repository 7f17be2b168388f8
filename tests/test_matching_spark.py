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
