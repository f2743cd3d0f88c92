"""Two-cluster-size scaling evidence (north rule): run bench.py at N and
4N cores on the SAME input and report throughput + scaling efficiency.

Also verifies the correctness side of the rule: tile assignments from the
spatial pipeline are identical at both parallelism levels (checked via
order-insensitive content hash inside bench's pip_tile counts + the
dedicated pytest test_tile_assignment_parallelism_invariant).

Usage: python tools/scaling_bench.py [sf_dir] [n_small] [n_big]
Writes JSON to stdout and appends a markdown row block to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    # Size the (single-JVM) driver so cached inputs never evict during
    # the heavier scaling workloads — the box has 128 GiB.
    env.setdefault("SPARK_DRIVER_MEMORY", "32g")
    if os.environ.get("SPARK_GRAFT_N_PAGES"):
        env["SPARK_GRAFT_N_PAGES"] = os.environ["SPARK_GRAFT_N_PAGES"]
    out = subprocess.run(
        [sys.executable, "-u", "bench.py"],
        env=env,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=3600,
    )
    for line in reversed(out.stdout.splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no bench JSON; stderr tail: {out.stderr[-2000:]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_big = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    small = run(n_small, sf_dir)
    big = run(n_big, sf_dir)

    factor = n_big / n_small
    report = {"sf_dir": sf_dir, "n_small": n_small, "n_big": n_big, "queries": {}}
    total_s = small["value"]
    total_b = big["value"]
    report["total"] = {
        "small_sec": total_s,
        "big_sec": total_b,
        "speedup": round(total_s / total_b, 3),
        "efficiency": round(total_s / total_b / factor, 3),
    }
    for q in small["queries"]:
        ts, tb = small["queries"][q], big["queries"][q]
        report["queries"][q] = {
            "small_sec": ts,
            "big_sec": tb,
            "speedup": round(ts / tb, 3) if tb else None,
            "efficiency": round(ts / tb / factor, 3) if tb else None,
        }
    report["counts_match"] = small["counts"] == big["counts"]
    report["pip_rows_per_sec"] = {
        "small": small["pip_rows_per_sec"],
        "big": big["pip_rows_per_sec"],
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
