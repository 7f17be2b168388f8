"""Assemble BENCH_SCALING_r5.json from individual window runs (round-4
verdict Next #6: ONE committed artifact that encodes the host-noise spread
honestly — windows inline, median as the headline, never a single cherry-
picked run).

Usage:
  python tools/assemble_scaling_record.py out.json window1.json [window2.json ...] \
      [--curve c8.json c16.json c32.json]

Each window file is a tools/bench_scaling.py output; the optional curve
files are raw tools/scaling_job.py lines at 8/16/32 cores from one session
window (the per-doubling signal, less exposed to 4x-window contention).
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    out_path = sys.argv[1]
    args = sys.argv[2:]
    curve_files: list[str] = []
    if "--curve" in args:
        i = args.index("--curve")
        curve_files = args[i + 1:]
        args = args[:i]

    windows = []
    for p in args:
        with open(p) as f:
            w = json.load(f)
        row = {
            "suite_efficiency": w["overall_efficiency"],
            "match_efficiency": w["per_stage_efficiency"]["match"],
            "tile_efficiency": w["per_stage_efficiency"]["tile"],
            "local8_sec": round(w["local8"]["match_sec"]
                                + w["local8"]["tile_sec"], 2),
            "local32_sec": round(w["local32"]["match_sec"]
                                 + w["local32"]["tile_sec"], 2),
            "north_star_rows_per_sec_local32":
                w["local32"]["rows_per_sec"],
        }
        if "levels" in w:
            row["levels"] = w["levels"]
        if "cpu_calibration" in w:
            # same-window pure-ALU multiprocessing spin at the two worker
            # counts: the scaling the HOST delivers on plain CPU work —
            # the ceiling every Spark number in the window lives under
            row["cpu_ceiling_same_window"] = (
                w["cpu_calibration"]["cpu_ceiling_8_to_32"])
        windows.append(row)

    effs = [w["suite_efficiency"] for w in windows]
    record = {
        "protocol": ("same job (60k-trip match + 64M-row JVM tile pass, "
                     "sf0.1) at local[8] and local[32], fresh JVM per "
                     "level, best-of-2 per stage; efficiency = "
                     "(T_8/T_32)/4; one row per window, run on a host "
                     "with documented +/-30% same-code noise"),
        "windows": windows,
        "suite_efficiency_median": round(statistics.median(effs), 3),
        "suite_efficiency_min": min(effs),
        "suite_efficiency_max": max(effs),
    }

    if curve_files:
        pts = []
        for p in curve_files:
            with open(p) as f:
                pts.append(json.load(f))
        pts.sort(key=lambda r: r["cpus"])
        doublings = []
        for a, b in zip(pts, pts[1:]):
            ta = a["match_sec"] + a["tile_sec"]
            tb = b["match_sec"] + b["tile_sec"]
            doublings.append({
                "from_cpus": a["cpus"], "to_cpus": b["cpus"],
                "efficiency": round(ta / tb / (b["cpus"] / a["cpus"]), 3),
            })
        record["doubling_curve"] = {
            "note": ("8->16->32 in ONE session window: the per-doubling "
                     "signal is less exposed to cross-window host drift "
                     "than the 4x composite"),
            "levels": pts,
            "per_doubling_efficiency": doublings,
        }

    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({"median": record["suite_efficiency_median"],
                      "windows": effs}))


if __name__ == "__main__":
    main()
