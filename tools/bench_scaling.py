"""Scaling-efficiency evidence (north rule: throughput efficiency >= 0.8
from N to 4N executors).

No real cluster exists in this sandbox, so the same job runs at two
parallelism levels — local[8] and local[32] — on the same input (the
sanctioned proxy per BASELINE.md). Each level runs bench.py in a fresh
process (fresh JVM, no warm-cache bleed); efficiency =
(T_8 / T_32) / 4 per query and for the suite.

Usage: python tools/bench_scaling.py [sf_dir] [out_json]
Writes the two runs + efficiencies as JSON and prints a markdown table for
BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_level(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_scaling.json"
    r8 = run_level(8, sf_dir)
    r32 = run_level(32, sf_dir)
    effs = {}
    for q, t8 in r8["queries"].items():
        t32 = r32["queries"].get(q)
        if t32:
            effs[q] = round((t8 / t32) / 4.0, 3)
    total_eff = round((r8["value"] / r32["value"]) / 4.0, 3)
    result = {
        "sf": sf_dir,
        "local8": r8,
        "local32": r32,
        "per_query_efficiency": effs,
        "suite_efficiency": total_eff,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)

    print("| query | local[8] s | local[32] s | efficiency (T8/T32)/4 |")
    print("|---|---|---|---|")
    for q in r8["queries"]:
        print(f"| {q} | {r8['queries'][q]} | {r32['queries'][q]} | {effs.get(q)} |")
    print(f"| **suite total** | {r8['value']} | {r32['value']} | **{total_eff}** |")
    print(f"\nnorth-star rows/s: local[8]={r8['north_star_rows_per_sec']} "
          f"local[32]={r32['north_star_rows_per_sec']}")


if __name__ == "__main__":
    main()
