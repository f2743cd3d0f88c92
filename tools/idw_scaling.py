"""Contention-robust two-width scaling of the IDW interpolation path
(tools/idw_leg.py) — the same alternating min-of-k protocol as
pip_scaling.py, with hardware-ceiling probes bracketing every rep and
an order-free output DIGEST checked identical across every leg.

Usage: python tools/idw_scaling.py [n_small] [n_big] [reps] [n_pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import hw_ceiling  # noqa: E402  (pins BLAS env)


def leg(cpus: int, n_pages: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-u",
         os.path.join(os.path.dirname(__file__), "idw_leg.py"),
         str(cpus), str(n_pages)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in reversed(out.stdout.splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(out.stderr[-1500:])


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    n_pages = int(sys.argv[4]) if len(sys.argv) > 4 else 12_000_000

    legs = {"small": [], "big": []}
    probes = []
    for r in range(reps):
        probes.append(
            {"small": round(hw_ceiling(n_small), 1),
             "big": round(hw_ceiling(n_big), 1)}
        )
        legs["small"].append(leg(n_small, n_pages))
        legs["big"].append(leg(n_big, n_pages))
        print(json.dumps({"rep": r, "probe": probes[-1],
                          "small": legs["small"][-1],
                          "big": legs["big"][-1]}), flush=True)

    best_s = min(l["idw_sec"] for l in legs["small"])
    best_b = min(l["idw_sec"] for l in legs["big"])
    digests = {l["digest"] for l in legs["small"]} | {
        l["digest"] for l in legs["big"]
    }
    rows = {l["rows"] for l in legs["small"]} | {l["rows"] for l in legs["big"]}
    factor = n_big / n_small
    hw_sp = max(p["big"] for p in probes) / max(p["small"] for p in probes)
    print(json.dumps({
        "metric": "idw_scaling_min_of_k",
        "n_small": n_small,
        "n_big": n_big,
        "reps": reps,
        "n_pages": n_pages,
        "small_sec": best_s,
        "big_sec": best_b,
        "speedup": round(best_s / best_b, 3),
        "efficiency": round(best_s / best_b / factor, 3),
        "hw_ceiling_speedup_best": round(hw_sp, 3),
        "efficiency_vs_hw": round(best_s / best_b / hw_sp, 3),
        "output_identical_across_all_legs": len(digests) == 1 and len(rows) == 1,
        "probes": probes,
    }))


if __name__ == "__main__":
    main()
