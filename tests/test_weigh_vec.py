"""Bit-parity of the batched boundary weigher (matching/weigh.py) against
the scalar per-pair kernel (matcher.transition_cost) — the vectorized path
must reproduce the reference-semantics scalar path EXACTLY (same IEEE-754
results, same u32 truncations), across random candidate layers on the grid
fixture, same-edge direct/backtrack cases, and the selective fan-out."""

from __future__ import annotations

import numpy as np
import pytest

from routers_spark.config import NO_EDGE
from routers_spark.fixtures.roads import grid_network, t_junction
from routers_spark.graph.dijkstra import PredicateCache
from routers_spark.graph.packed import build_packed_graph
from routers_spark.matching.matcher import (
    _cand,
    candidates_for_points,
    transition_cost,
)
from routers_spark.matching.weigh import weigh_boundary


def scalar_matrix(graph, cache, A, B, fanout=None, costing=None):
    """The round-1 per-pair loop, kept verbatim as the oracle."""
    from routers_spark.functions.geo import haversine_m_np

    m, n = len(A["edge_row"]), len(B["edge_row"])
    mat = np.full((m, n), np.uint32(NO_EDGE), dtype=np.uint32)
    for i in range(m):
        src = _cand(A, i)
        if fanout is not None and n > fanout:
            d = haversine_m_np(src["px"], src["py"], B["px"], B["py"])
            targets = np.argpartition(d, fanout - 1)[:fanout].tolist()
        else:
            targets = range(n)
        for j in targets:
            res = transition_cost(graph, cache, src, _cand(B, j),
                                  costing_strategies=costing)
            if res is not None:
                mat[i, j] = res[0]
    return mat


def _random_layers(graph, rng, n_points, lon0, lat0, span):
    lons = lon0 + rng.random(n_points) * span
    lats = lat0 + rng.random(n_points) * span
    return candidates_for_points(graph, lons, lats, 80.0, 25.0)


@pytest.fixture(scope="module")
def grid_graph():
    nodes, edges = grid_network(12)
    g = build_packed_graph(nodes, edges).build_cell_index()
    return g


def test_vectorized_equals_scalar_random_boundaries(grid_graph):
    g = grid_graph
    rng = np.random.default_rng(7)
    cache = PredicateCache()
    layers = _random_layers(g, rng, 24, -118.4995, 33.7005, 0.016)
    layers = [l for l in layers if len(l["edge_row"])]
    assert len(layers) >= 10
    for k in range(len(layers) - 1):
        want = scalar_matrix(g, cache, layers[k], layers[k + 1])
        got = weigh_boundary(g, cache, layers[k], layers[k + 1])
        np.testing.assert_array_equal(got, want)


def test_vectorized_equals_scalar_selective_fanout(grid_graph):
    g = grid_graph
    rng = np.random.default_rng(11)
    cache = PredicateCache()
    layers = _random_layers(g, rng, 12, -118.4995, 33.7005, 0.01)
    layers = [l for l in layers if len(l["edge_row"]) > 3]
    assert len(layers) >= 4
    for k in range(len(layers) - 1):
        want = scalar_matrix(g, cache, layers[k], layers[k + 1], fanout=3)
        got = weigh_boundary(g, cache, layers[k], layers[k + 1], fanout=3)
        np.testing.assert_array_equal(got, want)


def test_vectorized_same_edge_direct_and_backtrack():
    """A layer paired with itself exercises direct (frac <=) and same-edge
    backtrack (frac >) resolutions in one matrix."""
    nodes, edges = t_junction()
    g = build_packed_graph(nodes, edges).build_cell_index()
    cache = PredicateCache()
    rng = np.random.default_rng(3)
    lons = -118.16 + rng.random(6) * 0.02
    lats = 34.149 + rng.random(6) * 0.004
    layers = candidates_for_points(g, lons, lats, 300.0, 25.0)
    layers = [l for l in layers if len(l["edge_row"])]
    for A in layers:
        want = scalar_matrix(g, cache, A, A)
        got = weigh_boundary(g, cache, A, A)
        np.testing.assert_array_equal(got, want)


def test_vectorized_unreachable_boundary():
    """Disconnected components: every standard pair must stay NO_EDGE."""
    from routers_spark.fixtures.roads import disconnected

    nodes, edges = disconnected()
    g = build_packed_graph(nodes, edges).build_cell_index()
    cache = PredicateCache()
    # one point per component
    layers = candidates_for_points(
        g, np.array([nodes.lon.min(), nodes.lon.max()]),
        np.array([nodes.lat.min(), nodes.lat.max()]), 500.0, 25.0)
    A, B = layers[0], layers[1]
    if len(A["edge_row"]) and len(B["edge_row"]):
        want = scalar_matrix(g, cache, A, B)
        got = weigh_boundary(g, cache, A, B)
        np.testing.assert_array_equal(got, want)


def test_scalar_vector_geo_twins_bit_equal():
    """The weigh module's _hav/_bear must be bit-equal to the scalar libm
    kernels they mirror (costing.haversine_s / bearing_s)."""
    from routers_spark.matching import costing
    from routers_spark.matching.weigh import _bear, _hav

    rng = np.random.default_rng(5)
    lon1 = -180 + 360 * rng.random(500)
    lat1 = -85 + 170 * rng.random(500)
    lon2 = lon1 + rng.normal(0, 0.01, 500)
    lat2 = lat1 + rng.normal(0, 0.01, 500)
    hv = _hav(lon1, lat1, lon2, lat2)
    bv = _bear(lon1, lat1, lon2, lat2)
    for i in range(500):
        assert hv[i] == costing.haversine_s(lon1[i], lat1[i], lon2[i], lat2[i])
        assert bv[i] == costing.bearing_s(lon1[i], lat1[i], lon2[i], lat2[i])
