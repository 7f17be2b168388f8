"""Resumability: kill-after-stage then rerun → committed stages are not
recomputed and outputs are identical (BASELINE.md resumability gate)."""

import pandas as pd
import pytest

from routers_spark.io.checkpoint import (
    Pipeline,
    lineage_rows,
    read_manifest,
    read_snapshot,
    write_snapshot,
)


def test_snapshot_roundtrip(spark, tmp_path):
    root = str(tmp_path)
    pdf = pd.DataFrame({"k": range(100), "v": [f"x{i}" for i in range(100)]})
    df = spark.createDataFrame(pdf).repartition(4)
    sid = write_snapshot(df, root, "t1", stage="ingest")
    assert sid.startswith("t1-v1-")
    back = read_snapshot(spark, root, "t1").toPandas().sort_values("k")
    assert list(back["k"]) == list(range(100))
    m = read_manifest(root, "t1")
    assert m["rows"] == 100
    # per-partition lineage rows present with the stage name
    lin = lineage_rows(root, "t1")
    assert sum(r["rows_out"] for r in lin) == 100
    assert all(r["stage"] == "ingest" for r in lin)
    assert len(lin) == 4


def test_snapshot_versions_accumulate(spark, tmp_path):
    root = str(tmp_path)
    df1 = spark.range(10).withColumnRenamed("id", "k")
    df2 = spark.range(20).withColumnRenamed("id", "k")
    write_snapshot(df1, root, "t", stage="a")
    write_snapshot(df2, root, "t", stage="b")
    # time travel: v1 still readable
    assert read_snapshot(spark, root, "t", version=1).count() == 10
    assert read_snapshot(spark, root, "t", version=2).count() == 20
    assert read_manifest(root, "t")["version"] == 2


def test_pipeline_resume_skips_committed_stages(spark, tmp_path):
    root = str(tmp_path)
    calls = {"a": 0, "b": 0}

    def build_a(s):
        calls["a"] += 1
        return s.range(50).withColumnRenamed("id", "k")

    def run_until(stage_limit):
        p = Pipeline(spark, root)
        ra = p.stage("stage_a", "tbl_a", build_a)
        if stage_limit == 1:
            return ra, None
        def build_b(s):
            calls["b"] += 1
            a = p.read("tbl_a")
            return a.selectExpr("k", "k * 2 AS doubled")
        rb = p.stage("stage_b", "tbl_b", build_b, inputs=[ra.snapshot_id])
        return ra, rb

    # first run "crashes" after stage a
    ra1, _ = run_until(1)
    assert ra1.recomputed and calls == {"a": 1, "b": 0}
    # rerun the whole job: stage a is NOT recomputed, b runs once
    ra2, rb2 = run_until(2)
    assert not ra2.recomputed
    assert ra2.snapshot_id == ra1.snapshot_id
    assert rb2.recomputed
    assert calls == {"a": 1, "b": 1}
    # a third full run recomputes nothing
    ra3, rb3 = run_until(2)
    assert not ra3.recomputed and not rb3.recomputed
    assert calls == {"a": 1, "b": 1}
    out = read_snapshot(spark, root, "tbl_b").toPandas().sort_values("k")
    assert list(out["doubled"]) == [2 * k for k in range(50)]


def test_changed_input_triggers_recompute(spark, tmp_path):
    root = str(tmp_path)
    p = Pipeline(spark, root)
    ra = p.stage("a", "ta", lambda s: s.range(5))
    rb1 = p.stage("b", "tb", lambda s: p.read("ta"), inputs=[ra.snapshot_id])
    # new upstream snapshot → stage b's identity changes → recompute
    ra2_sid = write_snapshot(spark.range(7), root, "ta", stage="a")
    rb2 = p.stage("b", "tb", lambda s: p.read("ta"), inputs=[ra2_sid])
    assert rb1.snapshot_id != rb2.snapshot_id
    assert rb2.recomputed
    assert read_snapshot(spark, root, "tb").count() == 7
