"""Random-GATHER throughput probe — the access-pattern twin of
tools/bw_probe.py (streaming). The PIP assignment kernel's hot loop is
searchsorted + fancy-index gathers over the broadcast index: DRAM
LATENCY-bound random access, not streaming bandwidth. On one socket,
gather throughput saturates once outstanding misses cover the
latency×bandwidth product — typically at FAR fewer cores than
streaming saturates — so a gather-bound job's thread/executor scaling
on a single box is capped by THIS number, not by bw_probe's.

N processes each: one 256 MB float64 array + a fixed pseudo-random
int64 index permutation (chunked gathers, numpy); report aggregate
gathered MB/s at each width and the scaling ratios.

Usage: python tools/gather_probe.py [procs ...]   (default: 1 2 8 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[_v] = "1"

ARR_MB = 256
CHUNK = 1 << 20  # 1M gathers per op
WINDOW_S = 4.0


def _gather(seed: int) -> float:
    import numpy as np

    n = ARR_MB * 1024 * 1024 // 8
    a = np.ones(n, dtype=np.float64)
    # deterministic scattered indices: odd-multiplier LCG mod n covers
    # the array with a cache-hostile stride pattern
    idx = (np.arange(CHUNK, dtype=np.int64) * 2654435761 + seed * 97) % n
    t0 = time.time()
    gathered = 0
    while time.time() - t0 < WINDOW_S:
        float(a[idx].sum())
        gathered += CHUNK * 8
    return gathered / (time.time() - t0) / 1024 / 1024  # MB/s gathered


def main() -> None:
    widths = [int(x) for x in sys.argv[1:]] or [1, 2, 8, 32]
    out = {}
    for n in widths:
        with mp.Pool(n) as pool:
            rates = pool.map(_gather, range(n))
        out[str(n)] = round(sum(rates) / 1024, 2)  # GB/s aggregate
    base_w, base = widths[0], out[str(widths[0])]
    print(
        json.dumps(
            {
                "metric": "random_gather_gbps_by_procs",
                "arr_mb": ARR_MB,
                "chunk_gathers": CHUNK,
                "aggregate_gbps": out,
                "scaling_vs_first": {
                    k: round(v / base, 2) for k, v in out.items()
                },
                "first_width": base_w,
            }
        )
    )


if __name__ == "__main__":
    main()
