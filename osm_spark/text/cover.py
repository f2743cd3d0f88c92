"""Greedy maximum-coverage selection — diversity-first corpus picking.

"Pick k documents that together cover as much vocabulary as
possible" — the submodular data-selection primitive (max-coverage /
facility-location family) behind diverse-subset curation: dedup keeps
what's NOT redundant, this picks what's MOST additive. The greedy
algorithm is the canonical choice: (1 − 1/e)-optimal (Nemhauser et
al. 1978), and — crucial for the oracle — fully deterministic under a
fixed tie rule.

Algorithm: k rounds; each round scores every remaining document by
its MARGINAL coverage (tokens not covered by previously chosen docs)
and picks the max, ties to the lowest id. The chosen doc's tokens
join the covered set.

Distributed shape (driver-coordinated rounds, the pagerank/BFS/kNN-
frontier pattern): the token table (doc, token distinct pairs) is
computed once and persisted; each round is

    marginal = tokens ⟕anti covered        (covered is a TOKEN set —
                                            ≤ vocabulary rows, not corpus)
    scores   = ONE map-side-combinable groupBy(doc).count()
    winner   = TakeOrdered 1 (count desc, id asc)

so per-round cost is one anti-join + one combinable aggregate, and
the only thing that ever reaches the driver is the winner's id (k
ids total). The covered set grows as a token DataFrame — never a
driver-side collection — so a 10^9-type vocabulary is fine; k is the
round count, the driver-loop contract shared with BFS (X99).

No reference counterpart; training-data extension surface
(SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def greedy_max_coverage(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> list[tuple[int, int, int]]:
    """Greedy k-cover: [(chosen_id, marginal_gain, covered_total)]
    per round, in pick order. Stops early when no document adds
    coverage (every remaining doc ⊆ covered)."""
    tok = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(F.col(tokens_col))).alias("token"),
        )
        .distinct()
        .persist()
    )
    tok.count()
    spark = docs.sparkSession
    covered = spark.createDataFrame([], "token string")
    chosen: list[tuple[int, int, int]] = []
    chosen_ids: set = set()
    total = 0
    try:
        for _ in range(k):
            marginal = tok
            if chosen_ids:
                marginal = marginal.where(
                    ~F.col("id").isin(*chosen_ids)
                )
            marginal = marginal.join(covered, "token", "left_anti")
            top = (
                marginal.groupBy("id")
                .agg(F.count("*").alias("gain"))
                .orderBy(F.col("gain").desc(), F.col("id").asc())
                .limit(1)
                .collect()
            )
            if not top or top[0]["gain"] == 0:
                break
            win, gain = top[0]["id"], int(top[0]["gain"])
            total += gain
            chosen.append((win, gain, total))
            chosen_ids.add(win)
            covered = covered.unionByName(
                tok.where(F.col("id") == win).select("token")
            ).distinct()
            # truncate the growing union/distinct lineage (X99 pattern)
            covered = covered.localCheckpoint(eager=True)
    finally:
        tok.unpersist()
    return chosen
