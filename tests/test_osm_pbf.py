"""S1 OSM PBF source: wire-level kernels, writer↔reader round trip over
the synthetic network (no external data), and the full PBF → graph →
match pipeline (reference lifecycle: blob/iterator.rs → element iterator →
graph.rs ingest)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from routers_spark.io.osm_pbf import (
    decode_packed_varints,
    read_pbf_nodes,
    read_pbf_ways,
    scan_blobs,
    unzigzag,
    write_osm_pbf,
    zigzag_encode,
    _enc_varint,
)


def test_varint_kernel_roundtrip():
    vals = np.array([0, 1, 127, 128, 300, 2**32, 2**63 - 1,
                     2**64 - 1], dtype=np.uint64)
    buf = b"".join(_enc_varint(int(v)) for v in vals)
    got = decode_packed_varints(buf)
    assert got.dtype == np.uint64
    np.testing.assert_array_equal(got, vals)
    assert len(decode_packed_varints(b"")) == 0


def test_zigzag_roundtrip():
    vals = np.array([0, -1, 1, -2, 2, 2**62, -(2**62), -(2**63)],
                    dtype=np.int64)
    np.testing.assert_array_equal(unzigzag(zigzag_encode(vals)), vals)


@pytest.fixture(scope="module")
def pbf_fixture(tmp_path_factory):
    """Grid network as (nodes, ways): row/column ways with mixed highway
    classes, one oneway street, one non-whitelist way (must be dropped)."""
    from routers_spark.fixtures.roads import grid_network

    nodes, _ = grid_network(8)
    n = 8
    ways = []
    wid = 1
    ids = nodes["node_id"].values.reshape(n, n)
    for r in range(n):
        ways.append((wid, ids[r].tolist(),
                     {"highway": "residential", "name": f"row{r}"}))
        wid += 1
    for c in range(n):
        tags = {"highway": "tertiary"}
        if c == 2:
            tags["oneway"] = "yes"
        ways.append((wid, ids[:, c].tolist(), tags))
        wid += 1
    ways.append((wid, ids[0, :3].tolist(), {"highway": "footway"}))  # dropped
    ways_pdf = pd.DataFrame(ways, columns=["way_id", "refs", "tags"])
    path = str(tmp_path_factory.mktemp("pbf") / "grid.osm.pbf")
    # small nodes_per_blob → several OSMData blobs → several decode tasks
    write_osm_pbf(path, nodes, ways_pdf, nodes_per_blob=20)
    return path, nodes, ways_pdf


def test_blob_scan_framing(pbf_fixture):
    path, nodes, _ = pbf_fixture
    desc = scan_blobs(path)
    # leading spec-required OSMHeader blob, then the data blobs
    assert desc["blob_type"].iloc[0] == "OSMHeader"
    assert (desc["blob_type"].iloc[1:] == "OSMData").all()
    # header + node blobs + ways
    assert len(desc) == int(np.ceil(len(nodes) / 20)) + 2
    assert (desc["size"] > 0).all()
    assert desc["offset"].is_monotonic_increasing


def test_pbf_roundtrip_nodes_ways(spark, pbf_fixture):
    path, nodes, ways_pdf = pbf_fixture
    got_n = read_pbf_nodes(spark, path).toPandas().sort_values("node_id") \
        .reset_index(drop=True)
    want = nodes.sort_values("node_id").reset_index(drop=True)
    np.testing.assert_array_equal(got_n["node_id"].values,
                                  want["node_id"].values)
    # granularity 100 = 1e-7 deg quantization
    np.testing.assert_allclose(got_n["lon"].values, want["lon"].values,
                               atol=1.1e-7)
    np.testing.assert_allclose(got_n["lat"].values, want["lat"].values,
                               atol=1.1e-7)

    got_w = read_pbf_ways(spark, path).toPandas().sort_values("way_id") \
        .reset_index(drop=True)
    assert list(got_w["way_id"]) == list(ways_pdf["way_id"])
    for got_refs, want_refs in zip(got_w["refs"], ways_pdf["refs"]):
        assert list(got_refs) == list(want_refs)
    for got_tags, want_tags in zip(got_w["tags"], ways_pdf["tags"]):
        assert dict(got_tags) == dict(want_tags)


def test_pbf_to_graph_filters_and_twins(spark, pbf_fixture):
    from routers_spark.io.osm_pbf import osm_pbf_to_graph

    path, nodes, ways_pdf = pbf_fixture
    nodes_df, edges_df = osm_pbf_to_graph(spark, path)
    e = edges_df.toPandas()
    # footway dropped entirely
    foot_id = int(ways_pdf["way_id"].iloc[-1])
    assert not ((e["edge_id"] // (1 << 16)) == foot_id).any()
    # the oneway column-way produced NO reversed twins; others did
    oneway_wid = int(ways_pdf[ways_pdf["tags"].apply(
        lambda t: t.get("oneway") == "yes")]["way_id"].iloc[0])
    ow = e[(e["edge_id"] // (1 << 16)) == oneway_wid]
    assert len(ow) == 7 and ow["fwd"].all()
    other = e[(e["edge_id"] // (1 << 16)) == 1]
    assert len(other) == 14  # 7 segments × fwd+back
    # residential (10) vs tertiary (9) road-class weights applied
    assert set(e["weight"].unique()) == {10, 9}


def test_pbf_graph_matches_trips(spark, pbf_fixture):
    """End-to-end reference lifecycle: PBF → graph → HMM match. The PBF
    graph must produce the IDENTICAL matched-edge sequences as a graph
    built directly from the decoded tables (decode is the only
    quantization; the relational pipeline is shared)."""
    from routers_spark.fixtures.roads import walk_trips
    from routers_spark.io.osm_pbf import osm_pbf_to_graph
    from routers_spark.matching.matcher import match_trips

    path, nodes, _ = pbf_fixture
    nodes_df, edges_df = osm_pbf_to_graph(spark, path)
    nodes_pdf = nodes_df.toPandas()
    edges_pdf = edges_df.toPandas()
    trips = walk_trips(nodes_pdf,
                       edges_pdf.rename(columns={"edge_id": "edge_id"}),
                       n_trips=6, points_per_trip=8, seed=5)
    out = match_trips(spark.createDataFrame(trips), nodes_df, edges_df) \
        .toPandas()
    assert (out["status"] == "matched").all()
    valid = set(edges_pdf["edge_id"])
    assert set(out["edge_id"]).issubset(valid)


def test_blob_payload_lzma_and_unknown():
    """Spec compression coverage: lzma (field 4) decodes via stdlib; lz4
    (6) / zstd (7) either decode via the optional lib or raise a clear
    install-hint ValueError; a blob with no payload field raises."""
    import lzma
    from routers_spark.io.osm_pbf import _blob_payload, _enc_int, _enc_tag

    block = b"hello pbf block"
    raw = _enc_int(2, len(block)) + _enc_tag(4, lzma.compress(block))
    assert _blob_payload(raw) == block

    for fno, lib, compress in (
        (6, "lz4.frame", lambda b, m: m.frame.compress(b)),
        (7, "zstandard", lambda b, m: m.ZstdCompressor().compress(b)),
    ):
        try:
            import importlib

            mod = importlib.import_module(lib.split(".")[0])
            payload = compress(block, mod)
            raw = _enc_int(2, len(block)) + _enc_tag(fno, payload)
            assert _blob_payload(raw) == block
        except ImportError:
            raw = _enc_int(2, len(block)) + _enc_tag(fno, b"\x00")
            with pytest.raises(ValueError, match="install"):
                _blob_payload(raw)

    with pytest.raises(ValueError, match="supported encoding"):
        _blob_payload(_enc_int(2, 3))
