"""Dump .explain("formatted") for declared queries into plans/<tag>/.

Usage: python tools/explain_all.py <tag> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt (suffix via PLAN_SUFFIX env,
default "before"). Explain only — no execution (queries whose builder
itself runs eager fixture jobs still run those, same as any invocation).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from routers_spark import queries as Q  # noqa: E402
from routers_spark.session import get_spark  # noqa: E402


def explain_formatted(df) -> str:
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return jqe.explainString(mode.fromString("formatted"))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    names = sys.argv[2:]
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(f"local[{cpus}]", app_name="explain_all",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = Q.queries()
    for name in names or sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            txt = explain_formatted(df)
        except Exception as e:  # noqa: BLE001
            txt = f"EXPLAIN FAILED: {e!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"[explain] {name} -> {path} ({len(txt)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
