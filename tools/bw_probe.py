"""Memory-bandwidth ceiling probe.

The PIP assignment kernel is a streaming numpy workload: its parallel
speedup is bounded by the host's MEMORY BANDWIDTH, not its core count.
This probe measures that ceiling directly — N independent processes
each stream a 256 MB float64 array (read+reduce) for a fixed wall
window; the aggregate GB/s at each N is the best any bandwidth-bound
kernel can do at that parallelism.

Round-4 context: after the sandbox host rebooted, integer spin scales
8→32 procs at 3.0× while THIS probe stops scaling around 2-8 streams —
which is why scaling evidence is reported at 2 vs 8 cores with the
probe attached (BENCH.md). On a real multi-executor cluster each
executor brings its own memory controllers, so the per-node ceiling
does not bind the fleet: N→4N EXECUTORS multiplies bandwidth by 4,
unlike N→4N threads on one box.

Usage: python tools/bw_probe.py [procs ...]   (default: 1 2 8 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

ARR_MB = 256
WINDOW_S = 4.0


def _stream(_: int) -> float:
    import numpy as np

    a = np.ones(ARR_MB * 1024 * 1024 // 8, dtype=np.float64)
    t0 = time.time()
    passes = 0
    while time.time() - t0 < WINDOW_S:
        # one read-stream pass (sum forces the full array through
        # the memory hierarchy; result unused)
        float(a.sum())
        passes += 1
    return passes * ARR_MB / (time.time() - t0)  # MB/s read


def main() -> None:
    widths = [int(x) for x in sys.argv[1:]] or [1, 2, 8, 32]
    out = {}
    for n in widths:
        with mp.Pool(n) as pool:
            rates = pool.map(_stream, range(n))
        out[str(n)] = round(sum(rates) / 1024, 2)  # GB/s aggregate
    base = out[str(widths[0])]
    print(
        json.dumps(
            {
                "metric": "memory_bandwidth_gbps_by_procs",
                "arr_mb": ARR_MB,
                "aggregate_gbps": out,
                "scaling_vs_first": {
                    k: round(v / base, 2) for k, v in out.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
