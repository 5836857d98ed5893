"""Kernel section A/B: time the fused blind rotation with sections disabled
(CUFHE_PALLAS_SKIP breaks correctness, timing only) to locate the
non-overlapped VPU tail. Spawns one subprocess per config so the env knob
re-specializes the kernel each time.

Run: python benchmarks/kernel_ab.py [params [batch]]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    pname = sys.argv[1] if len(sys.argv) > 1 else ""
    batch = sys.argv[2] if len(sys.argv) > 2 else "4096"
    rows = []
    for skip, depth in [("", ""), ("rot", ""), ("shear", ""), ("mxu", ""),
                        ("chain", ""), ("", "0"), ("rot", "0")]:
        env = os.environ.copy()
        env["BENCH_BATCH"] = batch
        env["BENCH_ITERS"] = "4"
        if pname:
            env["BENCH_PARAMS"] = pname
        if skip:
            env["CUFHE_PALLAS_SKIP"] = skip
        else:
            env.pop("CUFHE_PALLAS_SKIP", None)
        if depth:
            env["CUFHE_KAR_DEPTH"] = depth
        else:
            env.pop("CUFHE_KAR_DEPTH", None)
        r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           env=env, capture_output=True, text=True,
                           timeout=1200)
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"skip={skip or 'none'} depth={depth or 'auto'} FAILED:\n"
                  f"{r.stdout[-500:]}\n{r.stderr[-500:]}", file=sys.stderr)
            continue
        rec = json.loads(line[-1])
        rows.append({"skip": skip or "none", "depth": depth or "auto",
                     "gates_per_sec": rec["value"],
                     "ms_per_batch": rec["ms_per_batch"]})
        print(json.dumps(rows[-1]))
    full = next((r for r in rows if r["skip"] == "none"
                 and r["depth"] == "auto"), None)
    if full:
        for r in rows:
            r["ms_saved_vs_full"] = round(full["ms_per_batch"]
                                          - r["ms_per_batch"], 1)
        print(json.dumps({"summary": rows}))


if __name__ == "__main__":
    main()
