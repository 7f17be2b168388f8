"""Deterministic synthetic road networks + trips — the MockNetwork analog
(libs/routers_network/src/mock.rs) as pandas frames (convertible to Spark
DataFrames). Scenario geometry mirrors the reference integration tests
(libs/routers_transition/tests/matching.rs; examples/batch.rs:12-23).

Edges are directed rows; ``bidirectional`` emits a reversed twin sharing the
same ``edge_id`` (graph.rs:237-252 fwd/back convention). Default weight 1
(mock.rs DEFAULT_WEIGHT at :246).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DEFAULT_WEIGHT = 1


class RoadBuilder:
    def __init__(self):
        self.nodes: list[tuple[int, float, float]] = []
        self.edges: list[tuple[int, int, int, int]] = []  # (edge_id, src, dst, w)
        self._next_edge = 0

    def node(self, nid: int, lon: float, lat: float) -> "RoadBuilder":
        self.nodes.append((nid, lon, lat))
        return self

    def edge(self, src: int, dst: int, weight: int = DEFAULT_WEIGHT) -> "RoadBuilder":
        self.edges.append((self._next_edge, src, dst, weight))
        self._next_edge += 1
        return self

    def bidirectional(self, a: int, b: int, weight: int = DEFAULT_WEIGHT) -> "RoadBuilder":
        eid = self._next_edge
        self.edges.append((eid, a, b, weight))
        self.edges.append((eid, b, a, weight))
        self._next_edge += 1
        return self

    def build(self) -> tuple[pd.DataFrame, pd.DataFrame]:
        nodes = pd.DataFrame(self.nodes, columns=["node_id", "lon", "lat"])
        edges = pd.DataFrame(self.edges, columns=["edge_id", "src", "dst", "weight"])
        return nodes, edges


def straight_road() -> tuple[pd.DataFrame, pd.DataFrame]:
    """1 → 2 → 3 along lat 34.15 (matching.rs:11-19)."""
    return (
        RoadBuilder()
        .node(1, -118.15, 34.15)
        .node(2, -118.16, 34.15)
        .node(3, -118.17, 34.15)
        .edge(1, 2)
        .edge(2, 3)
        .build()
    )


def four_chain() -> tuple[pd.DataFrame, pd.DataFrame]:
    """1 → 2 → 3 → 4 (matching.rs:62-75 intermediate-edge scenario)."""
    return (
        RoadBuilder()
        .node(1, -118.14, 34.15)
        .node(2, -118.15, 34.15)
        .node(3, -118.16, 34.15)
        .node(4, -118.17, 34.15)
        .edge(1, 2)
        .edge(2, 3)
        .edge(3, 4)
        .build()
    )


def t_junction() -> tuple[pd.DataFrame, pd.DataFrame]:
    """Straight west track + south branch, bidirectional (matching.rs:88-97)."""
    return (
        RoadBuilder()
        .node(1, -118.10, 34.15)
        .node(2, -118.13, 34.15)
        .node(3, -118.16, 34.15)
        .node(4, -118.13, 34.12)
        .bidirectional(1, 2)
        .bidirectional(2, 3)
        .bidirectional(2, 4)
        .build()
    )


def disconnected() -> tuple[pd.DataFrame, pd.DataFrame]:
    """Two components far apart (matching.rs:358- semantics)."""
    return (
        RoadBuilder()
        .node(1, -118.15, 34.15)
        .node(2, -118.16, 34.15)
        .node(10, -117.00, 33.00)
        .node(11, -117.01, 33.00)
        .edge(1, 2)
        .edge(10, 11)
        .build()
    )


def grid_network(n: int, spacing_deg: float = 0.002, lon0: float = -118.5,
                 lat0: float = 33.7, diag_every: int = 7,
                 weight: int = DEFAULT_WEIGHT) -> tuple[pd.DataFrame, pd.DataFrame]:
    """n x n grid of bidirectional streets (~spacing_deg*111km apart) with
    sparse diagonals — the scale fixture (FIXTURES.md §2). Deterministic.
    Node ids are row-major; edge ids sequential."""
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    node_id = (ii * n + jj).ravel()
    lon = lon0 + jj.ravel() * spacing_deg
    lat = lat0 + ii.ravel() * spacing_deg
    nodes = pd.DataFrame({"node_id": node_id.astype(np.int64),
                          "lon": lon, "lat": lat})

    srcs, dsts = [], []
    # horizontal neighbours
    a = (ii[:, :-1] * n + jj[:, :-1]).ravel()
    b = (ii[:, :-1] * n + jj[:, :-1] + 1).ravel()
    srcs.append(a); dsts.append(b)
    # vertical neighbours
    a = (ii[:-1, :] * n + jj[:-1, :]).ravel()
    b = ((ii[:-1, :] + 1) * n + jj[:-1, :]).ravel()
    srcs.append(a); dsts.append(b)
    # sparse diagonals
    di, dj = np.meshgrid(np.arange(0, n - 1, diag_every),
                         np.arange(0, n - 1, diag_every), indexing="ij")
    a = (di * n + dj).ravel()
    b = ((di + 1) * n + dj + 1).ravel()
    srcs.append(a); dsts.append(b)

    src = np.concatenate(srcs).astype(np.int64)
    dst = np.concatenate(dsts).astype(np.int64)
    eid = np.arange(len(src), dtype=np.int64)
    # bidirectional: forward + reversed twin with same edge id
    edges = pd.DataFrame({
        "edge_id": np.concatenate([eid, eid]),
        "src": np.concatenate([src, dst]),
        "dst": np.concatenate([dst, src]),
        "weight": np.full(2 * len(src), weight, dtype=np.int64),
    })
    return nodes, edges


def walk_trips(nodes: pd.DataFrame, edges: pd.DataFrame, n_trips: int,
               points_per_trip: int, seed: int = 42,
               jitter_deg: float = 0.0003) -> pd.DataFrame:
    """Random walks along the directed graph, one GPS point per visited node
    position + jitter <= ~33 m (the reference trajectories drift ~0.0003 deg,
    matching.rs:38). Deterministic under seed.

    Returns trips(trip_id, seq, lon, lat, ts_us).
    """
    rng = np.random.default_rng(seed)
    pos = {
        int(n): (float(x), float(y))
        for n, x, y in zip(nodes["node_id"], nodes["lon"], nodes["lat"])
    }
    adj: dict[int, np.ndarray] = {
        int(k): v["dst"].values for k, v in edges.groupby("src")
    }
    rows = []
    start_nodes = nodes["node_id"].values
    for t in range(n_trips):
        cur = int(start_nodes[rng.integers(0, len(start_nodes))])
        prev = -1
        for s in range(points_per_trip):
            lon, lat = pos[cur]
            rows.append((
                f"trip{t:06d}", s,
                lon + float(rng.uniform(-jitter_deg, jitter_deg)),
                lat + float(rng.uniform(-jitter_deg, jitter_deg)),
                s * 1_000_000,
            ))
            nxts = adj.get(cur)
            if nxts is None or len(nxts) == 0:
                break
            # avoid immediate backtracking when possible (GPS-like forward walk)
            choices = nxts[nxts != prev] if len(nxts[nxts != prev]) else nxts
            prev, cur = cur, int(choices[rng.integers(0, len(choices))])
    return pd.DataFrame(rows, columns=["trip_id", "seq", "lon", "lat", "ts_us"])
