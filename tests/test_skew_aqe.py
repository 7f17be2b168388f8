"""AQE skew-join splitting — the runtime half of the north rule's skew
story (the planned half, salted repartitioning, is tested in
tests/test_celljoin.py / test_routing_window.py).

A dense-cell join (one geohash cell holding ~97% of the rows — the
downtown-LA shape) is executed under AQE with test-sized thresholds; the
final adaptive plan must show the hot partition split
(``SortMergeJoin(skew=true)``) and the result must equal the pandas
oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd


def test_aqe_splits_hot_cell_join(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        rng = np.random.default_rng(7)
        left = pd.DataFrame({
            "cell": np.concatenate([
                np.zeros(300_000, dtype=np.int64),        # the hot cell
                rng.integers(1, 81, 8000).astype(np.int64),
            ]),
        })
        left["v"] = rng.integers(0, 1000, len(left)).astype(np.int64)
        right = pd.DataFrame({"cell": np.arange(0, 81, dtype=np.int64),
                              "w": np.arange(81, dtype=np.int64)})
        j = spark.createDataFrame(left).join(
            spark.createDataFrame(right), "cell")
        n = len(j.collect())
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
    assert "isFinalPlan=true" in plan
    assert "skew=true" in plan, plan
    assert n == len(left.merge(right, on="cell"))
