"""EXECUTOR scaling (the north rule's N vs 4N, multi-runtime form):
1 executor (local[8] JVM) over the full input vs 4 CONCURRENT
executors (4 × local[8] JVMs) over disjoint quarters of the SAME
input — separate heaps, GCs, and python-worker pools, which is what
"4N executors" actually means on a cluster. tools/pip_scaling.py's
single-JVM thread scaling conflates the engine with one-runtime
artifacts (one GC/allocator serving 32 threads); a real 4N deployment
runs 4 runtimes, co-located or not.

The PIP path is zero-shuffle (broadcast index, map-only pages pass),
so static file assignment to executors is exactly the scheduling a
Spark cluster performs with these partitions; each executor builds
its own index copy (what a broadcast does per executor) and the legs
synchronize at a file barrier so the timed sections overlap fully.

speedup = T(1 executor) / max_k T(4 executors, quarter k), both
min-of-reps; efficiency = speedup / 4. Spark-free hw probes bracket
each rep (tools/scaling_bench.hw_ceiling).

Usage: python tools/executor_scaling.py [reps] [n_pages] [cpus_per_exec]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scaling_bench import hw_ceiling  # noqa: E402  (pins BLAS env)

_LEG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pip_exec_leg.py")


def _prepare_pages(n_pages: int, out_dir: str, n_files: int = 32) -> None:
    from pyspark.sql import functions as F

    from osm_spark.data.pages import PagesSpec, pages_df
    from osm_spark.session import get_spark

    spark = get_spark(app_name="exec-scaling-prep", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    n_countries = max(int(40 * 0.1), 2)
    (
        pages_df(spark, PagesSpec(n_pages=n_pages, n_countries=n_countries))
        .select("url", "text")
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    spark.stop()


def _run_group(cpus: int, pages_dir: str, n_shards: int) -> list[dict]:
    barrier = tempfile.mkdtemp(prefix="exec_barrier_")
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", _LEG, str(cpus), pages_dir,
             str(k), str(n_shards), barrier],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for k in range(n_shards)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=3600)
        parsed = None
        for line in reversed(stdout.splitlines()):
            if line.startswith("{"):
                parsed = json.loads(line)
                break
        if parsed is None:
            raise RuntimeError(stderr[-1500:])
        outs.append(parsed)
    shutil.rmtree(barrier, ignore_errors=True)
    return outs


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 12_000_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    pages_dir = os.environ.get(
        "EXEC_SCALING_PAGES_DIR", "/tmp/exec_scaling_pages"
    )
    if not os.path.isdir(pages_dir) or not os.listdir(pages_dir):
        print(json.dumps({"stage": "prep", "n_pages": n_pages}), flush=True)
        _prepare_pages(n_pages, pages_dir)

    one, four, probes = [], [], []
    for r in range(reps):
        probes.append(
            {"small": round(hw_ceiling(cpus), 1),
             "big": round(hw_ceiling(4 * cpus), 1)}
        )
        g1 = _run_group(cpus, pages_dir, 1)
        g4 = _run_group(cpus, pages_dir, 4)
        one.append(g1[0])
        four.append(g4)
        print(json.dumps({"rep": r, "probe": probes[-1], "one": g1[0],
                          "four": g4}), flush=True)

    t1 = min(l["assign_sec"] for l in one)
    t4 = min(max(s["assign_sec"] for s in g) for g in four)
    rows1 = {l["rows"] for l in one}
    rows4 = {sum(s["rows"] for s in g) for g in four}
    hw_sp = max(p["big"] for p in probes) / max(p["small"] for p in probes)
    speedup = t1 / t4
    print(
        json.dumps(
            {
                "metric": "pip_assign_executor_scaling_min_of_k",
                "n_executors_small": 1,
                "n_executors_big": 4,
                "cpus_per_executor": cpus,
                "reps": reps,
                "n_pages": n_pages,
                "one_exec_sec": t1,
                "four_exec_sec": t4,
                "speedup": round(speedup, 3),
                "efficiency": round(speedup / 4, 3),
                "hw_ceiling_speedup_best": round(hw_sp, 3),
                "efficiency_vs_hw": round(speedup / hw_sp, 3),
                "rows_identical_across_all_legs": rows1 == rows4
                and len(rows1) == 1,
                "rows": sorted(rows1 | rows4),
                "probes": probes,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
