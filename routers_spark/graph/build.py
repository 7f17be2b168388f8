"""Network build operators (S1-S3): ways → directed edge rows, as pure
DataFrame algebra.

The reference ingests OSM PBF and expands each way's node refs into
consecutive-pair edges, a reversed twin per bidirectional way
(libs/routers_codec/src/osm/graph.rs:226-252); ways whose highway tag is
outside the 16-entry whitelist are dropped
(element/variants/mod.rs:28-47), and the road class maps to a routing
weight (parsers/primitives/road_class.rs:118-146). Here the same pipeline
runs over a DataFrame of way rows — no PBF codec (the engine's inputs are
synthesized or pre-parsed tables), but the relational shape matches: an
array-side zip of each ref with its successor for the pair expansion and a
per-row direction explode for the reversed twins, all JVM-side with no
shuffle (the refs of a way are already one row).

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
    """S2 way→edge expansion (graph.rs:237-252): zip each ref with its
    successor array-side (``zip_with`` over two ``slice``s — the lead()
    window this replaces cost a full shuffle + sort by way_id, r6), weight
    from the road class; bidirectional ways (oneway = false) emit a
    reversed twin sharing the edge_id from the SAME row via a direction
    explode — the previous fwd/back union executed the whole upstream
    lineage (PBF decode included) twice. Row multiset is unchanged."""
    filtered = filter_roadways(ways_df, highway_col)
    extra = ["access"] if "access" in ways_df.columns else []
    pairs = (
        filtered.select(
            "way_id", "oneway",
            road_class_weight_col(highway_col).alias("weight"),
            *extra,
            F.posexplode(F.expr(
                "zip_with(slice(refs, 1, greatest(size(refs) - 1, 0)),"
                "         slice(refs, 2, greatest(size(refs) - 1, 0)),"
                "         (a, b) -> struct(a AS src, b AS dst))"
            )).alias("pos", "pair"),
        )
        # parity with the lead() form: a null successor (possible only via
        # null ref elements) never emits a pair
        .filter(F.col("pair.dst").isNotNull())
        .withColumn("edge_id",
                    (F.col("way_id") * F.lit(1 << 16) + F.col("pos"))
                    .cast("long"))
    )
    dirs = F.when(
        F.col("oneway"),
        F.array(F.struct(F.col("pair.src").alias("s"),
                         F.col("pair.dst").alias("d"),
                         F.lit(True).alias("fwd"))),
    ).otherwise(F.array(
        F.struct(F.col("pair.src").alias("s"),
                 F.col("pair.dst").alias("d"), F.lit(True).alias("fwd")),
        F.struct(F.col("pair.dst").alias("s"),
                 F.col("pair.src").alias("d"), F.lit(False).alias("fwd")),
    ))
    return (
        pairs.select("edge_id", "weight", *extra, F.explode(dirs).alias("e"))
        .select("edge_id", F.col("e.s").alias("src"),
                F.col("e.d").alias("dst"), "weight",
                F.col("e.fwd").alias("fwd"), *extra)
    )
