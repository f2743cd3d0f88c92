"""Bounded-round single-source shortest paths — weighted crawl distance.

The weighted companion of X99's BFS (text/bfs.py): hop count treats a
spam redirect and an editorial link alike; with per-edge costs (link
quality, latency, inverse co-citation weight) the frontier metric
becomes "cheapest path from the seed set", the crawl-budget
allocator's actual objective.

Algorithm: synchronous Bellman-Ford rounds (Pregel SSSP) —

    d_0(v)   = 0 for seeds, absent otherwise
    d_r(v)   = min( d_{r-1}(v),  min over edges (u→v): d_{r-1}(u) + w )

run for a FIXED round budget R. The bound is the contract (exactly
X99's depth-bound rule): d_R is the exact cheapest cost over paths of
≤ R edges — well-defined on any graph (no negative weights by
contract), convergence-independent, and what makes the recursive
oracle terminate on cycles. If the graph converges before R, extra
rounds are no-ops and d_R is the true shortest path.

Distributed shape (driver-round loop, X99 contract): per round ONE
equi-join (dist ⋈ edges on src) + one map-side-combinable
groupBy(node).min — the relaxation is monotone so partial aggregation
is exact; localCheckpoint truncates lineage. Cost per round = the
frontier-adjacent edge volume; at web scale rounds are few (R ~ the
crawl-depth budget) and the join is AQE-splittable on hub sources.

Exactness: int64 weights and costs, min-fold — order-free, engine-
and parallelism-exact (q159 replays the identical round structure as
a recursive CTE with self-loop carry edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sssp(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """(node, dist) — exact cheapest cost over paths of ≤ ``rounds``
    edges from any seed; nodes unreachable within the bound are
    absent. Weights must be ≥ 0 int64 (negative weights would make
    the bounded semantics path-length-dependent)."""
    if rounds < 0:
        raise ValueError("rounds must be ≥ 0")
    e = edges.select(
        F.col(src).alias("u"),
        F.col(dst).alias("v"),
        F.col(weight).cast("long").alias("w"),
    )
    dist = seeds.select(
        F.col(seeds.columns[0]).alias("node"),
        F.lit(0).cast("long").alias("dist"),
    ).distinct().localCheckpoint(eager=True)
    for _ in range(rounds):
        relaxed = (
            dist.join(e, dist["node"] == e["u"])
            .select(F.col("v").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist
