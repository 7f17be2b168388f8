"""Streaming matcher state machine — mirrors the reference streaming suite
(libs/routers_transition/tests/streaming.rs): streaming ≡ batch, stale
rejection, gap cut, revision merge semantics. Pure-python tests over the
state machine; the Spark applyInPandasWithState wrapper shares the exact
same function."""

import numpy as np
import pytest

from routers_spark.fixtures.roads import grid_network, straight_road, walk_trips
from routers_spark.graph.packed import build_packed_graph
from routers_spark.matching.matcher import MatchOptions, candidates_for_point, solve_trip
from routers_spark.streaming.match_stream import VehicleMatcherState


@pytest.fixture(scope="module")
def road():
    nodes, edges = straight_road()
    return build_packed_graph(nodes, edges).build_cell_index()


TRACK = [(0, -118.151, 34.1503), (1_000_000, -118.155, 34.1503),
         (2_000_000, -118.160, 34.1503), (3_000_000, -118.165, 34.1503)]


def batch_edges(g, pts):
    opts = MatchOptions()
    layers = [candidates_for_point(g, lon, lat, opts.search_distance,
                                   opts.emission_error) for lon, lat in pts]
    r = solve_trip(g, layers, opts)
    assert r["status"] == "matched"
    return [int(g.edge_id[layers[k]["edge_row"][r["path"][k]]])
            for k in range(len(r["path"]))]


def merge_by_revision(rows):
    """R11: per ts keep the highest-revision layer."""
    best = {}
    for r in rows:
        if r["ts_us"] not in best or r["revision"] > best[r["ts_us"]]["revision"]:
            best[r["ts_us"]] = r
    return dict(sorted(best.items()))


def test_streaming_equals_batch(road):
    # feed point-by-point; merged output must equal the one-shot batch match
    st = VehicleMatcherState()
    rows = []
    for obs in TRACK:
        rows += st.process(road, [obs])
    merged = merge_by_revision(rows)
    assert list(merged.keys()) == [t for t, _, _ in TRACK]
    batch = batch_edges(road, [(lon, lat) for _, lon, lat in TRACK])
    assert [r["edge_id"] for r in merged.values()] == batch


def test_stale_and_duplicate_dropped(road):
    st = VehicleMatcherState()
    st.process(road, [TRACK[0], TRACK[1]])
    n_before = len(st.history)
    out = st.process(road, [TRACK[1]])  # duplicate ts
    assert out == []
    out = st.process(road, [(500_000, -118.152, 34.1503)])  # older ts
    assert out == []
    assert len(st.history) == n_before


def test_gap_cut_segments(road):
    st = VehicleMatcherState()
    st.process(road, TRACK[:2])
    # jump > 120 s: history restarts at the new point
    far_ts = TRACK[1][0] + 200 * 1_000_000
    out = st.process(road, [(far_ts, -118.165, 34.1503)])
    assert len(st.history) == 1
    assert [r["ts_us"] for r in out] == [far_ts]


def test_revision_monotonic(road):
    st = VehicleMatcherState()
    revs = []
    for obs in TRACK:
        rows = st.process(road, [obs])
        if rows:
            revs.append(rows[-1]["revision"])
    assert revs == sorted(revs)
    assert len(set(revs)) == len(revs)


def test_context_window_bounds_state(road):
    nodes, edges = grid_network(10)
    g = build_packed_graph(nodes, edges).build_cell_index()
    trips = walk_trips(nodes, edges, n_trips=1, points_per_trip=30, seed=3)
    st = VehicleMatcherState()
    for _, row in trips.iterrows():
        st.process(g, [(int(row.ts_us), float(row.lon), float(row.lat))])
        assert len(st.history) <= 10  # CONTEXT_WINDOW


def test_unanchored_stream_points_dropped(road):
    st = VehicleMatcherState()
    rows = st.process(road, [TRACK[0], (1_500_000, 0.0, 0.0), TRACK[2]])
    assert {r["ts_us"] for r in rows} == {TRACK[0][0], TRACK[2][0]}


def test_state_roundtrip_resume(road):
    # serde-resume (streaming.rs:89-): serialize state, restore, continue —
    # same output as uninterrupted processing
    a = VehicleMatcherState()
    a.process(road, TRACK[:2])
    restored = VehicleMatcherState.from_tuple(a.to_tuple())
    restored.history = [(int(t), lo, la) for t, lo, la in restored.history]
    out_resumed = restored.process(road, TRACK[2:])
    b = VehicleMatcherState()
    b.process(road, TRACK[:2])
    out_direct = b.process(road, TRACK[2:])
    assert out_resumed == out_direct
