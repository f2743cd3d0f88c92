"""Integer fixed-point PageRank over the page graph.

Iterative-algorithm operator (the builder brief's "custom operators"
class): rank mass flows along the link graph for a fixed number of
rounds. Floating-point PageRank is NOT reproducible across engines or
cluster sizes — ``sum(double)`` depends on partitioning order — so
this implementation defines PageRank on 64-bit integers:

    SCALE      = 10^12 total mass units
    base       = SCALE div n                      (per-node start mass)
    teleport   = ((100 - damping_pct) * base) div 100
    contrib(u) = rank(u) div outdeg(u)            (u with outlinks)
    dangle     = sum(rank(u) for outdeg(u) = 0)
    rank'(v)   = teleport
               + (damping_pct * (sum contrib(u->v) + dangle div n)) div 100

Every operation is int64 add/div; integer sums are order-independent,
so the result is bit-identical at any parallelism — exactly the
property the north rule's "identical output at N and 4N executors"
demands, and what lets a plain SQL oracle (q81) reproduce the engine
output hash-exactly. Mass is not exactly conserved (floor division
leaks < 1 unit per node per round); the contract is determinism, not
conservation.

Scale shape per iteration (the 100-TB view):

- ``edges ⋈ ranks on src``: the edge list is loop-INVARIANT — it is
  repartitioned on src and persisted ONCE; each round only the ranks
  side shuffles to meet it (one exchange).
- ``groupBy dst``: map-side-combinable integer sum (one exchange).
  In-degree skew (mega-hubs) collapses map-side.
- dangling mass: one scalar aggregate per round over the anti-join of
  ranks vs link sources — a driver-side int, broadcast back into the
  plan. K scalar jobs for K rounds, each a partial-agg tree.
- Each round's ranks are persisted and the previous round's handle is
  released once its successor is materialized, so the per-round cost
  is ONE rank-shuffle + one scalar job — without this, round i's
  dangling-mass aggregate would recompute the whole chain from round
  0 (O(K²) total). The final ranks are eagerly ``localCheckpoint``-ed
  so every loop-scoped persist (edge fan-out, node set, intermediate
  ranks) can be released before returning; ``checkpoint_every``
  additionally truncates lineage mid-loop for large K (at planet
  scale you would checkpoint ranks into a ManifestTable instead —
  same hook).

No reference analog; SURVEY §2-ext (iterative fixed-point, same
driver-loop pattern as J3 recursive relations and kNN radius
expansion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


WEIGHT_Q = 10**6  # per-source weight quantization (parts-per-million)


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
    checkpoint_every: int = 0,
    weight: str | None = None,
) -> DataFrame:
    """(url, rank) after ``iterations`` integer PageRank rounds.

    ``nodes``: one row per url (the full vertex set — pages nobody
    links to still hold teleport mass). ``edges``: distinct directed
    (src, dst), self-loop-free (:func:`osm_spark.text.links.page_edges`).

    ``weight``: optional positive int64 edge-weight column (e.g. the
    host graph's n_links) — mass then flows proportional to weight.
    To stay in int64 for ANY weight magnitude (rank*w could reach
    10^12 * 10^9 unweighted-style), each edge's share of its source is
    pre-quantized to parts-per-million: wn = (w * 10^6) div W(src),
    contrib = (rank * wn) div 10^6 ≤ SCALE * 10^6 < 2^63. The ppm
    floor is part of the operator's DEFINED semantics (like the
    unweighted div-outdeg floor): deterministic at any parallelism and
    reproducible by a plain SQL oracle (q91)."""
    n = nodes.count()
    if n == 0:
        return nodes.select("url", F.lit(0).cast("long").alias("rank"))
    base = SCALE // n
    teleport = (100 - damping_pct) * base // 100

    # tiny (one row per linking page) but read every round by the
    # dangle anti-join — persist, or each round re-scans raw edges
    if weight is None:
        out_deg = (
            edges.groupBy("src").agg(F.count("*").alias("outdeg")).persist()
        )
        fan_src = edges.join(out_deg, "src").select(
            "src", "dst", F.expr("outdeg").alias("_den")
        )
        contrib_expr = "rank div _den"
    else:
        out_deg = (
            edges.groupBy("src")
            .agg(F.sum(weight).alias("outdeg"))
            .persist()
        )
        fan_src = edges.join(out_deg, "src").select(
            "src",
            "dst",
            F.expr(f"({weight} * {WEIGHT_Q}L) div outdeg").alias("_den"),
        )
        contrib_expr = f"(rank * _den) div {WEIGHT_Q}"
    # loop-invariant join input: partitioned by src once, reused every
    # round (only the ranks side shuffles to meet it)
    fan = fan_src.repartition("src").persist()
    node_set = nodes.select("url").repartition("url").persist()

    ranks = node_set.select(
        "url", F.lit(base).cast("long").alias("rank")
    ).persist()
    superseded: list[DataFrame] = []
    for i in range(iterations):
        # scalar job; also materializes this round's persisted ranks,
        # after which the previous round's handle is safe to drop
        dangle = (
            ranks.join(out_deg, ranks["url"] == out_deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("d"))
            .collect()[0]["d"]
        )
        for old in superseded:
            old.unpersist()
        superseded = [ranks]
        shared = int(dangle) // n
        contribs = (
            ranks.join(fan, ranks["url"] == fan["src"])
            .select(
                F.col("dst").alias("url"),
                F.expr(contrib_expr).alias("contrib"),
            )
        )
        sums = contribs.groupBy("url").agg(F.sum("contrib").alias("s"))
        ranks = (
            node_set.join(sums, "url", "left")
            .select(
                "url",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * (coalesce(s, 0L) + {shared})) div 100"
                    )
                ).cast("long").alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
        ranks = ranks.persist()
    # eager cut: materialize the result, then release every handle the
    # loop pinned (ADVICE r3 knn pattern — no persists outlive the call)
    out = ranks.localCheckpoint(eager=True)
    for df in superseded + [ranks, fan, node_set, out_deg]:
        df.unpersist()
    return out
