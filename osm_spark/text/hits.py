"""Integer fixed-point HITS (hubs & authorities) over the page graph.

Kleinberg's HITS is the second classic link-analysis fixed point next
to PageRank (text/pagerank.py) — hubs point at good authorities,
authorities are pointed at by good hubs:

    a'(v) = Σ_{u→v} h(u)        (authority from OLD hubs)
    h'(u) = Σ_{u→v} a'(v)       (hub from NEW authorities — the
                                 standard sequential sweep)

followed by a per-round normalization (without one the scores grow
exponentially). Floating-point HITS (L2 normalization) is NOT
reproducible across engines or cluster sizes, so this implementation
defines the operator on int64 with MAX-normalization — a standard
HITS variant (converges to the same principal-eigenvector direction;
only the scaling differs):

    d      = max(1, (max(raw) + SCALE - 1) div SCALE)
    score  = raw div d                     → scores in [0, SCALE]

The divisor-first form never MULTIPLIES a raw sum, so there is no
rank·SCALE overflow anywhere: the only bound is the raw sums
themselves, Σ h ≤ n·SCALE < 2^63 ⇔ n < 9.2·10^12 nodes — planet-safe.
Integer sums are order-free, so the result is bit-identical at any
parallelism, and a plain unrolled-CTE SQL oracle (q124) reproduces the
engine output hash-exactly.

Scale shape per round (the 100-TB view, mirroring pagerank.py):

- the edge list is loop-INVARIANT — repartitioned once per join side
  (src for the hub update, dst for the authority update) and persisted;
  each round only the score side shuffles to meet it.
- both updates are ONE equi-join + one map-side-combinable integer
  groupBy; in-degree skew (mega-authorities) collapses map-side.
- normalization costs ONE scalar driver job per round, not two: the
  authority divisor is a driver-side literal (its max() collect is the
  round's single materializing action), while the hub divisor is
  FOLDED INTO THE PLAN as a broadcast 1-row max aggregate over the
  persisted raw hub sums — same floor-div arithmetic, zero extra job
  launches (pinned by test_hits_one_scalar_job_per_round).
- each round's frames are persisted, the superseded round released
  after its successor materializes; the final frame is eagerly
  localCheckpoint-ed so no loop persist outlives the call.

No reference analog; SURVEY §2-ext iterative fixed-point family
(pagerank, J3 recursive closure, kNN radius expansion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**6


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    checkpoint_every: int = 0,
) -> DataFrame:
    """(url, hub, authority) after ``iterations`` integer HITS rounds.

    ``nodes``: one row per url (the full vertex set — isolated pages
    score 0/0). ``edges``: distinct directed (src, dst),
    self-loop-free (:func:`osm_spark.text.links.page_edges`). Scores
    are int64 in [0, SCALE]; every round the best authority (resp.
    hub) holds ~SCALE and everything else is its floor-divided
    fraction. ``checkpoint_every``: localCheckpoint both score frames
    every K rounds (lineage truncation for large iteration counts —
    the pagerank.py hook).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    # Distinct column names per fan table: both derive from the same
    # edges frame, and the authority frame (which carries the a-side
    # lineage) joins the h-side fan — unaliased shared exprIds would
    # trip Spark's ambiguous-self-join check.
    by_src = edges.select(
        F.col("src").alias("a_src"), F.col("dst").alias("a_dst")
    ).repartition("a_src").persist()
    by_dst = edges.select(
        F.col("src").alias("h_src"), F.col("dst").alias("h_dst")
    ).repartition("h_dst").persist()
    node_set = nodes.select("url").repartition("url").persist()

    hub = node_set.select(
        "url", F.lit(SCALE).cast("long").alias("hub")
    ).persist()
    auth = None
    superseded: list[DataFrame] = []

    def _complete(raw: DataFrame) -> DataFrame:
        """raw(url, s) → node_set-complete int64 sums (missing → 0)."""
        return node_set.join(raw, "url", "left").select(
            "url", F.expr("coalesce(s, 0L)").alias("s")
        )

    def _normalize_literal(raw: DataFrame, col: str, d: int) -> DataFrame:
        return _complete(raw).select(
            "url", F.expr(f"s div {d}").cast("long").alias(col)
        )

    def _normalize_in_plan(raw: DataFrame, col: str) -> DataFrame:
        """Same floor-div normalization, but the divisor is a broadcast
        1-row max over ``raw`` folded into the plan — no driver job.
        ``raw`` must be a lineage-truncated leaf (lazy localCheckpoint):
        it is referenced by BOTH the aggregate branch and the join
        branch, and a non-leaf plan would double in size every round
        (exponential logical-plan growth → analyzer OOM)."""
        mx = raw.agg(
            F.coalesce(F.max("s"), F.lit(0)).cast("long").alias("_m")
        )
        d = F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"(_m + {SCALE - 1}) div {SCALE}").cast("long"),
        )
        return (
            _complete(raw)
            .crossJoin(F.broadcast(mx))
            .select("url", F.expr("s").alias("s"), d.alias("_d"))
            .select(
                "url", F.expr("s div _d").cast("long").alias(col)
            )
        )

    for i in range(iterations):
        # Name-based USING joins: the score frames carry the fan
        # tables' lineage from round 2 on, so dataset-qualified refs
        # would trip Spark's ambiguous-self-join check.
        a_raw = (
            hub.withColumnRenamed("url", "a_src")
            .join(by_src, "a_src")
            .groupBy("a_dst")
            .agg(F.sum("hub").alias("s"))
            .withColumnRenamed("a_dst", "url")
        ).persist()
        # THE round's one scalar job: max of the raw authority sums.
        # Evaluating it materializes a_raw — and, through its lineage,
        # the previous round's lazily-normalized hub and everything
        # behind it (all persisted → each filled exactly once).
        m = a_raw.agg(F.coalesce(F.max("s"), F.lit(0)).alias("m")).collect()[
            0
        ]["m"]
        d_a = max(1, (int(m) + SCALE - 1) // SCALE)
        new_auth = _normalize_literal(a_raw, "authority", d_a).persist()
        # Lazy localCheckpoint: truncates h_raw's logical plan to a
        # leaf WITHOUT launching a job (the RDD computes — and is
        # stored by the caching layer — on its first action, which is
        # the next round's scalar job or the final join). This keeps
        # per-round plan growth linear despite the double reference
        # inside _normalize_in_plan, and replaces a persist(): the
        # checkpointed blocks are released by the ContextCleaner when
        # the superseded frame's reference drops.
        h_raw = (
            new_auth.withColumnRenamed("url", "h_dst")
            .join(by_dst, "h_dst")
            .groupBy("h_src")
            .agg(F.sum("authority").alias("s"))
            .withColumnRenamed("h_src", "url")
        ).localCheckpoint(eager=False)
        new_hub = _normalize_in_plan(h_raw, "hub").persist()
        # a_raw's scalar job materialized the whole previous round; the
        # superseded frames are now safe to release (pagerank pattern).
        for old in superseded:
            old.unpersist()
        superseded = [hub] + ([auth] if auth is not None else [])
        hub, auth = new_hub, new_auth
        superseded += [a_raw]
        # lineage truncation for large K (the pagerank checkpoint_every
        # hook): the eager localCheckpoint materializes from the
        # just-persisted frames, so it costs one cheap scan and caps
        # the logical-plan depth at checkpoint_every rounds.
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            old_h, old_a = hub, auth
            hub = hub.localCheckpoint(eager=True)
            auth = auth.localCheckpoint(eager=True)
            superseded += [old_h, old_a]

    out = hub.join(auth, "url").select(
        "url", "hub", "authority"
    ).localCheckpoint(eager=True)
    for df in superseded + [hub, auth, by_src, by_dst, node_set]:
        df.unpersist()
    return out
