"""Input-scale demonstration of WHY the whole-surface 8v32 sweep's
per-leg efficiency sits below 0.8 at sf0.1 (VERDICT r4 next #2's
"probe-backed root cause per exception").

Claim: the sub-0.8 legs are bench-INPUT-SIZE artifacts — a 3-20 s leg
with dozens of stages carries a fixed serial floor (stage scheduling,
driver coordination, broadcast pickup) that 4× cores cannot touch;
the PARALLEL fraction scales. Proof shape: run the same leg at 1× and
4× input at both widths. If the leg were shuffle- or skew-bound,
efficiency would stay flat or fall with input; if it is floor-bound,
efficiency must RISE toward the hw ceiling as input amortizes the
floor — which is exactly what the r4 north-rule PIP run showed
(3.334× at 12M pages vs ~2× at 1M).

Leg: kmeans (GEMM assignment + update shuffle over clustered
vectors) at 1x/4x/8x input — the second input-scale point next to the
r4 north-rule PIP run (1M pages ~2x -> 12M pages 3.334x at 4x cores).
(A knn_points variant was tried and dropped: at bench shapes that leg
is ~pure per-job floor at BOTH scales — 3.5 s flat from 1M to 4M
points — so it measures nothing but the floor itself.)

Usage: python tools/amdahl_demo.py [small_cores] [big_cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def hw_ceiling(n_small: int, n_big: int) -> float:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "sb", os.path.join(os.path.dirname(__file__), "scaling_bench.py")
    )
    sb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sb)
    return round(sb.hw_ceiling(n_big) / sb.hw_ceiling(n_small), 3)


def run_legs(cores: int, scale: int) -> dict:
    """One fresh session: kmeans + knn_points at ``scale``× the bench
    input. Returns leg wall times + output fingerprints."""
    from osm_spark.data.vectors import clustered_vectors
    from osm_spark.session import get_spark
    from osm_spark.text.kmeans import kmeans_fit, kmeans_summary

    spark = get_spark(
        app_name=f"amdahl-{cores}-{scale}",
        master=f"local[{cores}]",
        shuffle_partitions=max(32, cores),
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cores": cores, "scale": scale}
    try:
        emb = clustered_vectors(spark, 100_000 * scale).persist()
        emb.count()
        t0 = time.time()
        cents = kmeans_fit(emb, k=16, n_iters=3, kernel="numpy")
        n = kmeans_summary(emb, cents).count()
        out["kmeans_sec"] = round(time.time() - t0, 2)
        out["kmeans_fp"] = [n, sum(c[0] for c in cents)]
        emb.unpersist()

    finally:
        spark.stop()
    return out


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    factor = n_big / n_small
    report: dict = {"legs": []}
    report["hw_pre"] = hw_ceiling(n_small, n_big)
    for scale in (1, 4, 8):
        s = run_legs(n_small, scale)
        b = run_legs(n_big, scale)
        for leg in ("kmeans",):
            assert s[f"{leg}_fp"] == b[f"{leg}_fp"], (leg, scale)
            sp = round(s[f"{leg}_sec"] / b[f"{leg}_sec"], 3)
            report["legs"].append(
                {
                    "leg": leg,
                    "scale": scale,
                    "small_sec": s[f"{leg}_sec"],
                    "big_sec": b[f"{leg}_sec"],
                    "speedup": sp,
                    "efficiency": round(sp / factor, 3),
                }
            )
        print(json.dumps(report["legs"][-1:]), flush=True)
    report["hw_post"] = hw_ceiling(n_small, n_big)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
