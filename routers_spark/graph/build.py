"""Network build operators (S1-S3): ways → directed edge rows, as pure
DataFrame algebra.

The reference ingests OSM PBF and expands each way's node refs into
consecutive-pair edges, a reversed twin per bidirectional way
(libs/routers_codec/src/osm/graph.rs:226-252); ways whose highway tag is
outside the 16-entry whitelist are dropped
(element/variants/mod.rs:28-47), and the road class maps to a routing
weight (parsers/primitives/road_class.rs:118-146). Here the same pipeline
runs over a DataFrame of way rows — no PBF codec (the engine's inputs are
synthesized or pre-parsed tables), but the relational shape matches: a
posexplode + lead() window for the pair expansion and a union of reversed
rows for the twins, all JVM-side.

Way schema: (way_id long, refs array<long>, highway string,
oneway boolean[, access array<struct<mode,dir,value>>]).
Edge output: (edge_id, src, dst, weight, fwd[, access]) — edge_id is
shared by a bidirectional pair's twins (the DirectionAwareEdgeId analog,
edge.rs:12-26), derived as way_id·2^16 + segment index (deterministic, no
monotonically_increasing_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from routers_spark.config import ROAD_CLASS_WEIGHT, VALID_ROADWAYS


def filter_roadways(ways_df: DataFrame, highway_col: str = "highway") -> DataFrame:
    """S3 road filter: keep ways on the 16-entry highway whitelist
    (graph.rs:226-229; road_class None → skip)."""
    return ways_df.filter(F.col(highway_col).isin(VALID_ROADWAYS))


def road_class_weight_col(highway_col: str = "highway") -> Column:
    """Road class → routing weight, the 22-class table copied verbatim
    (road_class.rs:118-146); unknown classes get the worst weight (100)."""
    expr = F.lit(100)
    for cls, w in ROAD_CLASS_WEIGHT.items():
        expr = F.when(F.col(highway_col) == cls, F.lit(w)).otherwise(expr)
    return expr.cast("int")


def ways_to_edges(ways_df: DataFrame, highway_col: str = "highway") -> DataFrame:
    """S2 way→edge expansion (graph.rs:237-252): posexplode the refs, pair
    each node with its successor via lead() over (way, position), weight
    from the road class; bidirectional ways (oneway = false) union a
    reversed twin sharing the edge_id."""
    filtered = filter_roadways(ways_df, highway_col)
    w = Window.partitionBy("way_id").orderBy("pos")
    pairs = (
        filtered.select(
            "way_id", "oneway",
            road_class_weight_col(highway_col).alias("weight"),
            *(["access"] if "access" in ways_df.columns else []),
            F.posexplode("refs").alias("pos", "src"),
        )
        .withColumn("dst", F.lead("src").over(w))
        .filter(F.col("dst").isNotNull())
        .withColumn("edge_id",
                    (F.col("way_id") * F.lit(1 << 16) + F.col("pos"))
                    .cast("long"))
    )
    extra = ["access"] if "access" in ways_df.columns else []
    fwd = pairs.select("edge_id", "src", "dst", "weight",
                       F.lit(True).alias("fwd"), *extra)
    back = (
        pairs.filter(~F.col("oneway"))
        .select("edge_id", F.col("dst").alias("src"),
                F.col("src").alias("dst"), "weight",
                F.lit(False).alias("fwd"), *extra)
    )
    return fwd.unionByName(back)
