"""Distributed triangle counting — degree-oriented wedge join.

Triangles are the graph-quality primitive the crawl surface still
lacked (clustering coefficient, spam-farm detection — link farms are
triangle-dense, organic link neighborhoods are sparse): alongside
pagerank.py (centrality), hits.py (hub/authority), components.py
(connectivity) and bfs.py (reachability).

Algorithm (the standard MapReduce formulation, Cohen 2009 /
Suri-Vassilvitskii "last reducer"): orient every undirected edge from
its lower-RANK endpoint to its higher-rank endpoint, where rank is
the total order (degree, id). Every triangle then has exactly ONE
wedge (u→v, u→w) whose apex u is its minimum-rank vertex, so counting
triangles = joining the wedge set against the oriented edge set —
no triangle is produced twice, no orientation case analysis.

Why this survives a 10^12-edge web graph: wedge fan-out at a vertex
is C(out_deg, 2), and degree orientation caps out-degree at O(√m) for
ANY graph (a vertex of undirected degree d only keeps neighbors of
rank above it) — the mega-hub that would generate 10^10 wedges under
naive pairing generates none, because every neighbor of a hub
outranks nothing: the hub sits at the TOP of the rank order and
receives edges instead of emitting wedges. Shuffle budget: one
distinct + one degree groupBy + two equi-joins, all AQE-splittable.

Exactness: counts are integers; ranks are a pure function of the edge
set; output is engine-portable bit-for-bit (q148 oracle re-derives
orientation and the wedge join relationally in SQL).

No reference counterpart; training-data / crawl extension surface
(SURVEY §2.9 graph ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_simple(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Canonical undirected simple edge set: (a < b), self-loops
    dropped, one row per unordered pair (one map-side-combinable
    distinct)."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def oriented_edges(und: DataFrame) -> DataFrame:
    """(u, v, rku, rkv) with rank(u) < rank(v), rank = (degree, id)."""
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        und.join(deg.withColumnRenamed("node", "a"), "a")
        .withColumnRenamed("deg", "deg_a")
        .join(deg.withColumnRenamed("node", "b"), "b")
        .withColumnRenamed("deg", "deg_b")
    )
    ra = F.struct(F.col("deg_a").alias("d"), F.col("a").alias("n"))
    rb = F.struct(F.col("deg_b").alias("d"), F.col("b").alias("n"))
    return e.select(
        F.when(ra < rb, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(ra < rb, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(ra < rb, ra).otherwise(rb).alias("rku"),
        F.when(ra < rb, rb).otherwise(ra).alias("rkv"),
    )


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(x, y, z) triangle rows, each exactly once; z is the min-rank
    apex (the wedge center u), x/y the oriented wedge endpoints."""
    o = oriented_edges(undirected_simple(edges, src, dst))
    w1 = o.select(
        F.col("u"), F.col("v").alias("x"), F.col("rkv").alias("rkx")
    )
    w2 = o.select(
        F.col("u"), F.col("v").alias("y"), F.col("rkv").alias("rky")
    )
    wedges = w1.join(w2, "u").where(F.col("rkx") < F.col("rky"))
    closing = o.select(F.col("u").alias("x"), F.col("v").alias("y"))
    return wedges.join(closing, ["x", "y"]).select(
        F.col("u").alias("z"), "x", "y"
    )


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, n_tri) for every node in ≥1 triangle — each triangle
    credits all three vertices. Total triangles = sum(n_tri) / 3."""
    t = triangles(edges, src, dst)
    return (
        t.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
