"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator Spark vs DuckDB parity pairs
(see routers_spark/queries.py for the registry; SURVEY.md §2 for the
operator inventory each entry covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from routers_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the engine's core capability: HMM/Viterbi map matching
    (one matched edge per GPS point) over the deterministic fixture corpus —
    broadcast packed graph, per-trip Arrow-batched solve."""
    return _q.queries()["map_match_discretized"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
