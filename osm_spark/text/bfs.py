"""Bounded-depth BFS over a link graph — crawl-frontier analysis.

Shortest hop distance from a seed set over directed edges: the
crawl-depth question every corpus audit asks ("how far from the seed
list does this page sit?" — depth correlates with quality and drives
crawl budgeting / frontier pruning).

Frontier BFS, the driver-coordinated loop every iterative operator
here uses (pagerank / components / kNN-frontier):

    dist₀ = seeds at depth 0
    frontier_{h} = (frontier_{h-1} ⋈ edges).dst  \\  dist   (anti-join)
    dist += frontier_h at depth h

Each round is one equi-join + distinct + one broadcast-free anti-join
— all shuffles keyed on the url, AQE-splittable. Rounds are bounded
by ``max_depth`` (the contract: pages farther than max_depth are NOT
reported — that bound is what makes a recursive-CTE oracle terminate
on cyclic graphs, and BFS order guarantees every reported depth is
the true shortest). The frontier shrinks monotonically toward the
graph's periphery; handles are localCheckpoint-truncated per round so
Catalyst analysis stays O(1) per round (the components lesson).

Scale: at 10^12 pages the per-round frontier join is the same shape
as one pagerank sweep; max_depth rounds total. An empty frontier
short-circuits (one cheap limit(1) probe per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_depths(
    seeds: DataFrame,
    edges: DataFrame,
    max_depth: int = 8,
    node_col: str = "url",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(url, depth) — min hop distance from ``seeds`` for every node
    reachable within ``max_depth`` (seeds at 0; farther nodes absent).
    """
    if max_depth < 0:
        raise ValueError("max_depth must be >= 0")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    dist = (
        seeds.select(F.col(node_col).alias("url"))
        .distinct()
        .withColumn("depth", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = dist.select("url")
    for h in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["url"] == e["_s"])
            .select(F.col("_d").alias("url"))
            .distinct()
            .join(dist.select("url"), "url", "left_anti")
            .withColumn("depth", F.lit(h).cast("long"))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("url")
    return dist
