"""k-core extraction — the graph-cohesion peel.

The k-core of a graph is the maximal subgraph where every vertex has
degree ≥ k INSIDE the subgraph — the standard "dense nucleus" cut for
link-farm localization and crawl prioritization (a page ranked high
by triangles/PageRank but outside every 3-core is hub-adjacent, not
community-embedded). Computed by the classic peel: repeatedly delete
vertices of degree < k; the fixpoint is unique (order-independent),
which is what makes the operator engine- and parallelism-exact.

Distributed shape: a driver-coordinated fixpoint loop (the X99
BFS / kNN-frontier contract) — per round

    deg   = ONE map-side-combinable groupBy over edge endpoints
    weak  = deg < k           (broadcastable: it only shrinks)
    edges = edges ⟕anti weak on a  ⟕anti weak on b

with a localCheckpoint each round to truncate lineage, stopping when
no vertex is weak. Round count is bounded by the peel depth
(≤ longest degeneracy chain, in practice tens); each round's cost is
one aggregate + two anti-joins over the CURRENT edge set, which only
shrinks. At web scale the first round deletes the degree-1 tail —
most of the graph — so later rounds run on the dense core only.

No reference counterpart; graph extension surface (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.text.triangles import undirected_simple


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 200,
) -> DataFrame:
    """The k-core's undirected canonical edge set (a < b). Unique
    fixpoint of the peel; empty DataFrame when no k-core exists."""
    if k < 1:
        raise ValueError("k must be ≥ 1")
    cur = undirected_simple(edges, src, dst).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        deg = (
            cur.select(F.explode(F.array("a", "b")).alias("node"))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
        )
        weak = deg.where(F.col("deg") < k).select("node")
        n_weak = weak.count()
        if n_weak == 0:
            return cur
        nxt = cur.join(
            F.broadcast(weak.withColumnRenamed("node", "a")), "a", "left_anti"
        ).join(
            F.broadcast(weak.withColumnRenamed("node", "b")), "b", "left_anti"
        ).select("a", "b")
        cur = nxt.localCheckpoint(eager=True)
        if cur.isEmpty():
            return cur
    raise RuntimeError(f"k_core did not converge in {max_rounds} rounds")


def k_core_nodes(
    edges: DataFrame, k: int, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, core_deg) for every vertex of the k-core — core_deg is
    the degree INSIDE the core (≥ k by definition)."""
    core = k_core(edges, k, src, dst)
    return (
        core.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("core_deg"))
    )
