"""Streaming per-cell rollup: windowed counts with a watermark.

The batch side of the engine rolls point counts up the tile pyramid
(tile_pyramid_rollup, T2); its streaming analog is the live per-cell
counter every realtime tile layer needs — tumbling event-time windows
keyed by the geohash cell, with a watermark bounding how late an
observation may arrive (late rows beyond the watermark are dropped, state
for closed windows is evicted — the standard Structured Streaming
late-data contract).

Scale shape: the only wide dependency is the streaming aggregate's own
shuffle on (window, cell); state size is bounded by watermark × live-cell
count, independent of stream length. The cell key reuses the pinned
geohash kernel through a pandas UDF (Arrow-batched, no per-row Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from routers_spark.functions.cells import geohash_str_np


def cell_count_stream(events: DataFrame, window: str = "1 minute",
                      watermark: str = "2 minutes", precision: int = 5,
                      ts_col: str = "ts", lon_col: str = "lon",
                      lat_col: str = "lat") -> DataFrame:
    """events (streaming or batch): (ts timestamp, lon double, lat double)
    → one row per (window, cell) with the observation count. With a
    streaming source, rows later than ``watermark`` behind the max seen
    event time are dropped and closed windows emit exactly once under the
    append output mode."""

    @pandas_udf("string")
    def gh(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(geohash_str_np(lon.values, lat.values, precision))

    keyed = (
        events.withWatermark(ts_col, watermark)
        if events.isStreaming else events
    )
    return (
        keyed.withColumn("cell", gh(F.col(lon_col), F.col(lat_col)))
        .groupBy(F.window(F.col(ts_col), window).alias("win"), "cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"),
                F.col("win.end").alias("window_end"), "cell", "n")
    )
