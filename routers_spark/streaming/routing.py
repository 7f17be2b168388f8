"""R10 geo routing of work: shard_of(point) = geohash precision-4 prefix.

The reference routes each observation to a per-shard matcher queue by the
geohash-4 of its point (subject ``events.match.<hash>``,
libs/routers_realtime/src/event.rs:245-252; consumers bind per shard,
bin/orchestrator.rs:532-538, bin/matcher.rs:48-55). Here the same key
becomes the repartition column, with the north rule's skew handling made
explicit: cells whose observation count exceeds ``hot_threshold`` are
salted by the stable splitmix64 hash of the event key into
``salt_buckets`` sub-lanes, so one dense downtown cell fans out across
workers instead of pinning a single task.

Scale shape: ONE Arrow-batched numpy pass for the cell key (no per-row
Python), then a window count over the same pass's output for per-cell
occupancy — a separate aggregate-and-join would recompute the kernel
lineage twice. The window's shuffle on shard is the same movement the
routing repartition needs anyway.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from routers_spark.functions.cells import geohash_str_np
from routers_spark.functions.hashing import mix_np


def route_assignments(df: DataFrame, id_col: str = "event_id",
                      lon_col: str = "lon", lat_col: str = "lat",
                      precision: int = 4, hot_threshold: int = 2000,
                      salt_buckets: int = 4) -> DataFrame:
    """Assign every row its routing lane: ``shard`` (geohash prefix of the
    point, event.rs:245-252) and ``salt`` (0 for cold cells; splitmix64 of
    the id masked to ``salt_buckets`` lanes for cells with more than
    ``hot_threshold`` rows). ``salt_buckets`` must be a power of two (mask
    == modulo under a uniform mix, partition.rs:43-45 contract).

    BATCH input only: the occupancy count is an unpartition-bounded window
    aggregate, which Spark does not support on streaming DataFrames.
    Compute assignments on a batch snapshot of recent traffic and feed
    them to :func:`route_stream` (whose join + repartition ARE
    stream-safe) — hot-cell designation is a slowly-changing property, so
    a periodically refreshed snapshot is the right cadence for it."""
    if df.isStreaming:
        raise ValueError(
            "route_assignments needs a BATCH DataFrame (its hot-cell count "
            "is a global window aggregate, unsupported on streams); compute "
            "assignments on a batch snapshot and pass them to route_stream")
    assert salt_buckets & (salt_buckets - 1) == 0

    keep = [id_col, lon_col, lat_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            gh = geohash_str_np(pdf[lon_col].values.astype(np.float64),
                                pdf[lat_col].values.astype(np.float64),
                                precision)
            salt = (mix_np(pdf[id_col].values.astype(np.int64))
                    & np.uint64(salt_buckets - 1)).astype(np.int64)
            yield pd.DataFrame({id_col: pdf[id_col].values, "shard": gh,
                                "salt_raw": salt})

    lanes = df.select(*keep).mapInPandas(
        gen, schema=f"{id_col} long, shard string, salt_raw long")
    # per-cell occupancy via a window aggregate over the SAME pass output —
    # a separate groupBy().count() + join would recompute the Arrow lineage
    # (two full kernel passes); the window's shuffle on shard is work the
    # routing repartition needs anyway
    from pyspark.sql.window import Window

    n_in_cell = F.count(F.lit(1)).over(Window.partitionBy("shard"))
    return lanes.select(
        F.col(id_col),
        "shard",
        F.when(n_in_cell > hot_threshold, F.col("salt_raw"))
        .otherwise(F.lit(0)).cast("long").alias("salt"),
    )


def route_stream(df: DataFrame, assignments: DataFrame,
                 id_col: str = "event_id",
                 n_partitions: int | None = None) -> DataFrame:
    """Repartition the stream by its routing lane — the queue-group
    load-balance analog. Dense cells spread over ``salt`` lanes; every
    other cell stays a single lane (state locality preserved)."""
    joined = df.join(assignments, id_col)
    if n_partitions:
        return joined.repartition(n_partitions, "shard", "salt")
    return joined.repartition("shard", "salt")
