"""Snapshot-versioned tables + resumable multi-stage jobs.

The design is Iceberg's (immutable data files + a versioned manifest whose
atomic swap is the commit; snapshot id = the version guard of the
reference's binary caches, graph.rs:58-107), implemented over plain parquet
because this environment ships no Iceberg runtime jars. On a real cluster
the same API maps 1:1 onto Iceberg tables:
  write_snapshot  -> append/overwrite commit  (new snapshot id)
  read_snapshot   -> time-travel read by snapshot id
  Pipeline.stage  -> resume-from-checkpoint: a stage keyed by
                     (name, input snapshot ids) that already committed is
                     NOT recomputed — the job-granularity analog of the
                     matcher's Continuation::reconcile (continuation.rs:32-57).

Every commit records per-partition lineage + metrics rows (north rule).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifest_dir(root: str, table: str) -> str:
    return os.path.join(root, table, "_snapshots")


def _latest_version(root: str, table: str) -> int:
    d = _manifest_dir(root, table)
    if not os.path.isdir(d):
        return 0
    versions = [int(f[1:-5]) for f in os.listdir(d)
                if f.startswith("v") and f.endswith(".json")]
    return max(versions, default=0)


def write_snapshot(df: DataFrame, root: str, table: str,
                   stage: str = "", inputs: list[str] | None = None) -> str:
    """Commit df as a new snapshot of ``table``. Data files are written to a
    unique directory first; the manifest write is the atomic commit point
    (os.rename), so a crash mid-write leaves the previous snapshot intact."""
    snap_uuid = uuid.uuid4().hex[:12]
    data_dir = os.path.join(root, table, "data", snap_uuid)
    t0 = time.perf_counter()
    with_pid = df.withColumn("_pid", F.spark_partition_id())
    with_pid.write.mode("overwrite").parquet(data_dir)
    wall_ms = int((time.perf_counter() - t0) * 1000)

    spark = df.sparkSession
    committed = spark.read.parquet(data_dir)
    part_rows = (
        committed.groupBy("_pid").count().orderBy("_pid").collect()
    )
    n_rows = sum(r["count"] for r in part_rows)

    # rows_in = total rows of the committed input snapshots (resolved from
    # their manifests; snapshot ids are "<table>-v<version>-<uuid>")
    rows_in = 0
    for sid in inputs or []:
        try:
            t, v = sid.rsplit("-", 2)[:2]
            rows_in += read_manifest(root, t, int(v[1:]))["rows"]
        except (ValueError, FileNotFoundError, KeyError):
            pass  # foreign/raw input — not a snapshot of this warehouse

    version = _latest_version(root, table) + 1
    snapshot_id = f"{table}-v{version}-{snap_uuid}"
    manifest = {
        "snapshot_id": snapshot_id,
        "version": version,
        "table": table,
        "data_dir": data_dir,
        "rows": n_rows,
        # snapshot-scoped input total, stored ONCE at manifest level —
        # summing a per-partition copy across lineage rows would overcount
        # input rows by the partition count
        "rows_in": rows_in,
        "schema": committed.drop("_pid").schema.json(),
        "stage": stage,
        "inputs": inputs or [],
        "lineage": [
            {"partition_id": int(r["_pid"]), "stage": stage,
             "rows_out": int(r["count"]),
             "wall_ms": wall_ms, "input_snapshot_ids": inputs or []}
            for r in part_rows
        ],
    }
    mdir = _manifest_dir(root, table)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".tmp-{snap_uuid}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, os.path.join(mdir, f"v{version}.json"))
    return snapshot_id


def read_manifest(root: str, table: str, version: int | None = None) -> dict:
    v = version if version is not None else _latest_version(root, table)
    if v == 0:
        raise FileNotFoundError(f"no snapshots for table {table!r}")
    with open(os.path.join(_manifest_dir(root, table), f"v{v}.json")) as f:
        return json.load(f)


def read_snapshot(spark: SparkSession, root: str, table: str,
                  version: int | None = None) -> DataFrame:
    m = read_manifest(root, table, version)
    return spark.read.parquet(m["data_dir"]).drop("_pid")


def lineage_rows(root: str, table: str) -> list[dict]:
    """All committed lineage rows across snapshots of a table."""
    out = []
    v = _latest_version(root, table)
    for i in range(1, v + 1):
        out.extend(read_manifest(root, table, i)["lineage"])
    return out


@dataclass
class StageResult:
    snapshot_id: str
    table: str
    recomputed: bool


class Pipeline:
    """Resumable multi-stage job. Each stage's identity is
    (stage name, input snapshot ids): if a snapshot of the stage's output
    table already committed with exactly those inputs, the stage is skipped
    and the committed snapshot is reused — the resume contract of the north
    rule. Kill the process between stages and rerun: completed stages never
    recompute."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _find_committed(self, table: str, stage: str,
                        inputs: list[str]) -> dict | None:
        v = _latest_version(self.root, table)
        for i in range(v, 0, -1):
            m = read_manifest(self.root, table, i)
            if m["stage"] == stage and m["inputs"] == inputs:
                return m
        return None

    def stage(self, name: str, table: str, build_fn,
              inputs: list[str] | None = None) -> StageResult:
        inputs = inputs or []
        hit = self._find_committed(table, name, inputs)
        if hit is not None:
            return StageResult(hit["snapshot_id"], table, recomputed=False)
        df = build_fn(self.spark)
        sid = write_snapshot(df, self.root, table, stage=name, inputs=inputs)
        return StageResult(sid, table, recomputed=True)

    def read(self, table: str, version: int | None = None) -> DataFrame:
        return read_snapshot(self.spark, self.root, table, version)
