"""gate_union output-mode parity: the single-pass combined emitter must
reproduce exactly the union of the discretized and interpolated outputs
(matched trips only) that the oracle-gated map_match_exact[_celljoin]
queries previously built from two full match_trips calls."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from routers_spark.matching.matcher import match_trips


@pytest.fixture(scope="module")
def inputs(spark):
    from routers_spark.fixtures.roads import grid_network, walk_trips

    nodes, edges = grid_network(12)
    trips = walk_trips(nodes, edges, n_trips=30, points_per_trip=8, seed=11)
    # one unanchored trip far off the graph: gate_union must emit nothing
    # for it, matching the status='matched' filters of the two-call form
    off = pd.DataFrame({
        "trip_id": ["offgrid"] * 3, "seq": [0, 1, 2],
        "lon": [10.0, 10.001, 10.002], "lat": [50.0, 50.0, 50.0],
    })
    trips = pd.concat([trips, off], ignore_index=True)
    return (spark.createDataFrame(trips), spark.createDataFrame(nodes),
            spark.createDataFrame(edges))


def _two_call_union(points, nodes_df, edges_df, path):
    disc = match_trips(points, nodes_df, edges_df, candidate_path=path)
    interp = match_trips(points, nodes_df, edges_df, candidate_path=path,
                         output="interpolated")
    null_d = F.lit(None).cast("double")
    return (
        disc.filter(F.col("status") == "matched")
        .select("trip_id", F.col("seq").alias("idx"),
                F.lit("matched").alias("kind"), "edge_id",
                F.col("frac"), null_d.alias("plon"), null_d.alias("plat"))
        .unionByName(
            interp.filter(F.col("status") == "matched")
            .select("trip_id", F.col("elem").alias("idx"), "kind", "edge_id",
                    null_d.alias("frac"), F.col("lon").alias("plon"),
                    F.col("lat").alias("plat")))
    )


def _one_call_union(points, nodes_df, edges_df, path):
    both = match_trips(points, nodes_df, edges_df, candidate_path=path,
                       output="gate_union")
    null_d = F.lit(None).cast("double")
    is_m = F.col("kind") == "matched"
    return both.select(
        "trip_id", "idx", "kind", "edge_id",
        F.when(is_m, F.col("frac")).otherwise(null_d).alias("frac"),
        F.when(is_m, null_d).otherwise(F.col("plon")).alias("plon"),
        F.when(is_m, null_d).otherwise(F.col("plat")).alias("plat"),
    )


def _sorted(df):
    pdf = df.toPandas().sort_values(
        ["trip_id", "kind", "idx", "edge_id"]).reset_index(drop=True)
    return pdf


@pytest.mark.parametrize("path", ["broadcast", "celljoin"])
def test_gate_union_matches_two_call_form(spark, inputs, path):
    points, nodes_df, edges_df = inputs
    a = _sorted(_two_call_union(points, nodes_df, edges_df, path))
    b = _sorted(_one_call_union(points, nodes_df, edges_df, path))
    assert len(a) > 0
    assert "offgrid" not in set(b["trip_id"])
    pd.testing.assert_frame_equal(a, b)
    # the float columns must be BIT-identical (the oracle gate hashes
    # them after rounding — any drift would flip the hash)
    for c in ("frac", "plon", "plat"):
        av, bv = a[c].values.astype(np.float64), b[c].values.astype(np.float64)
        assert np.array_equal(
            np.where(np.isnan(av), None, av),
            np.where(np.isnan(bv), None, bv)), c
