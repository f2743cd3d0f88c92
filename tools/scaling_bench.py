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
import multiprocessing as mp
import os
import subprocess
import sys
import time

# Single-threaded BLAS for probe processes (set BEFORE numpy loads —
# forked children inherit the parent's loaded OpenBLAS config). A
# default-BLAS probe process spawns n_cpu threads and the k-process
# "ceiling" measures thread-thrash, not the machine: measured here,
# 1-proc default-BLAS ran 0.6x the single-threaded speed and the 2->8
# "ceiling" read 1.2x on a box that scales 7.2x with the pin.
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def _burn(q) -> None:
    import numpy as np

    a = np.random.rand(600, 600)
    t0 = time.time()
    n = 0
    while time.time() - t0 < 5:
        a = a @ a
        a /= np.linalg.norm(a)
        n += 1
    q.put(n)


def hw_ceiling(procs: int) -> float:
    """Spark-free hardware probe: total matmul iterations/sec achieved
    by ``procs`` independent processes. The sandbox VM's EFFECTIVE core
    count varies with host contention; Spark scaling efficiency is only
    interpretable against the ceiling measured AT THE SAME TIME."""
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_burn, args=(q,)) for _ in range(procs)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return sum(q.get() for _ in ps) / 5.0


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

    # Hardware ceiling bracketing each leg: ceiling speedup is the best
    # ANY perfectly-parallel job could achieve in this window.
    hw_small_pre = hw_ceiling(n_small)
    hw_big_pre = hw_ceiling(n_big)
    small = run(n_small, sf_dir)
    big = run(n_big, sf_dir)
    hw_small_post = hw_ceiling(n_small)
    hw_big_post = hw_ceiling(n_big)
    hw_speedup = round(
        ((hw_big_pre + hw_big_post) / 2) / ((hw_small_pre + hw_small_post) / 2), 3
    )

    factor = n_big / n_small
    report = {
        "sf_dir": sf_dir,
        "n_small": n_small,
        "n_big": n_big,
        "hw_ceiling_iters_per_sec": {
            "small_pre": round(hw_small_pre, 1),
            "big_pre": round(hw_big_pre, 1),
            "small_post": round(hw_small_post, 1),
            "big_post": round(hw_big_post, 1),
        },
        "hw_ceiling_speedup": hw_speedup,
        "queries": {},
    }
    total_s = small["value"]
    total_b = big["value"]
    report["total"] = {
        "small_sec": total_s,
        "big_sec": total_b,
        "speedup": round(total_s / total_b, 3),
        "efficiency": round(total_s / total_b / factor, 3),
        "efficiency_vs_hw": (
            round(total_s / total_b / hw_speedup, 3) if hw_speedup else None
        ),
    }
    for q in small["queries"]:
        ts, tb = small["queries"][q], big["queries"][q]
        sp = round(ts / tb, 3) if tb else None
        report["queries"][q] = {
            "small_sec": ts,
            "big_sec": tb,
            "speedup": sp,
            "efficiency": round(ts / tb / factor, 3) if tb else None,
            # vs what the box could actually deliver in this window
            "efficiency_vs_hw": (
                round(sp / hw_speedup, 3) if sp and hw_speedup else None
            ),
        }
    report["counts_match"] = small["counts"] == big["counts"]
    report["pip_rows_per_sec"] = {
        "small": small["pip_rows_per_sec"],
        "big": big["pip_rows_per_sec"],
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
