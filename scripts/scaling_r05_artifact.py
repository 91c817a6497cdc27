#!/usr/bin/env python3
"""SCALING_r05.json — multi-chip scaling artifact, led by the defensible
numbers (VERDICT r4 item 7).

The r4 artifact led with measured rows from 8 virtual CPU devices
oversubscribing 4 physical cores — numbers that measure host
oversubscription, not interconnect, and needed a 40-line caveat. This
artifact inverts the structure:

  1. ANALYTIC BOUND (lead): collectives enumerated from the optimized
     sharded HLO (platform-independent GSPMD output), priced against v5e
     ICI / DCN with zero overlap assumed, at the r5 measured single-chip
     compute point (0.17 ms/window pure compute — the conservative
     choice: a smaller compute term makes collectives loom larger).
  2. MEASURED 1-DEVICE CONTROLS: the only virtual-CPU rows that measure
     anything real here (no collectives, no oversubscription).
  3. A one-line pointer to SCALING_r04.json for the oversubscribed-mesh
     diagnostics, clearly labeled as host pathology measurements.

Run on CPU:  timeout 3600 python scripts/scaling_r05_artifact.py
"""

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# r5 serving compute, v5e fetch-last ladder (docs/ROUND5.md): 0.159-0.170
# ms/window; use the faster end so the collective share is bounded from
# above (conservative for the efficiency bound)
os.environ.setdefault("ANALYTIC_T_WINDOW", "0.159e-3")

import scripts.scaling_analytic as SA  # noqa: E402  (reads the env above)

WEAK = REPO / "scripts" / "weak_scaling.py"


def analytic_rows() -> list[dict]:
    rows = []
    for n_ch, n_time, wps, cps in [(8, 1, 1, 1), (8, 1, 1, 4),
                                   (1, 8, 1, 1), (1, 8, 4, 1),
                                   (2, 4, 4, 1)]:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count="
                            f"{n_ch * n_time}").strip()
        p = subprocess.run(
            [sys.executable, str(SA.__file__), str(n_ch), str(n_time),
             str(wps), str(cps)],
            capture_output=True, text=True, env=env, timeout=2400)
        if p.returncode != 0:
            print(f"({n_ch},{n_time}) wps={wps} FAILED:"
                  f"\n{p.stderr[-1200:]}", file=sys.stderr)
            continue
        inv = json.loads(p.stdout.strip().splitlines()[-1])
        row = SA.analyze(inv)
        row["collectives"] = [
            {"op": o["op"], "bytes": o["bytes"],
             "result_type": o["result_type"]}
            for o in row["collectives"]]
        rows.append(row)
        print(f"({n_ch},{n_time}) wps={wps} cps={cps}: "
              f"eff >= {row['efficiency_bound_ici']:.4f} ICI / "
              f"{row['efficiency_bound_dcn_worst_case']:.4f} DCN",
              file=sys.stderr, flush=True)
    return rows


def control_rows() -> list[dict]:
    rows = []
    for axis, wps in [("channel", 1), ("time", 1), ("time", 4)]:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            " --xla_force_host_platform_device_count=1"
                            ).strip()
        p = subprocess.run(
            [sys.executable, str(WEAK), "--one", axis, "1",
             "--wps", str(wps)],
            capture_output=True, text=True, env=env, timeout=2400)
        if p.returncode != 0:
            print(f"control {axis} wps={wps} FAILED:\n{p.stderr[-1200:]}",
                  file=sys.stderr)
            continue
        row = json.loads(p.stdout.strip().splitlines()[-1])
        row["wins_per_shard"] = wps
        rows.append(row)
        print(f"control {axis} wps={wps}: {row.get('step_s')} s/step",
              file=sys.stderr, flush=True)
    return rows


def main():
    doc = {
        "harness": "scripts/scaling_r05_artifact.py",
        "headline": {
            "summary": ("channel-sharded scaling is embarrassingly "
                        "parallel (one scalar psum per step); time-"
                        "sharded scaling pays a chained halo ppermute "
                        "bounded below. All bounds assume ZERO compute/"
                        "communication overlap at the r5 measured "
                        "compute point."),
            "method": ("collective ops + payload bytes enumerated from "
                       "the optimized sharded HLO (GSPMD output is "
                       "platform-independent; only codegen differs), "
                       "priced at v5e ICI ~45 GB/s/link, DCN 50 Gbps, "
                       "1 us/round"),
            "t_compute_per_window_s": float(
                os.environ["ANALYTIC_T_WINDOW"]),
            "rows": analytic_rows(),
            "pod_4096ch": SA.pod_rows(),
        },
        "measured_single_device_controls": {
            "note": ("virtual-CPU, 1 device, zero collectives — the "
                     "only rows this 4-core host can measure cleanly; "
                     "they pin the per-step compute the analytic rows "
                     "divide by and show wps block-size sensitivity "
                     "without mesh sync effects"),
            "rows": control_rows(),
        },
        "diagnostics": {
            "note": ("SCALING_r04.json retains the 2-8 oversubscribed "
                     "virtual-device measurements; they measure 4-core "
                     "HOST oversubscription + CPU multi-window codegen "
                     "pathologies, NOT interconnect cost, and are kept "
                     "only as environment diagnostics."),
        },
    }
    out = REPO / "SCALING_r05.json"
    out.write_text(json.dumps(doc, indent=1) + "\n")
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
