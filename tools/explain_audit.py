"""Physical-plan audit: capture .explain("formatted") for the headline
queries and check the properties the 100-TB design depends on:

- parquet scans carry PushedFilters + a pruned ReadSchema;
- small dimensions join via BroadcastHashJoin (never shuffle the page
  side for them);
- Catalyst-only operator families (filters, dedup hashing, langid,
  tiles) contain NO Python evaluation nodes — the page side crosses
  into Python only where the design says so (the fused PIP index pass);
- WholeStageCodegen spans exist on the hot paths.

Writes PLANS.md (per-query formatted plan + verdicts) and prints one
JSON summary line. Run: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import json
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def codegen_summary(df) -> str:
    """First line of explain('codegen'): 'Found N WholeStageCodegen
    subtrees.' (the formatted mode hides codegen ids under AQE)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("codegen")
    first = buf.getvalue().splitlines()
    return first[0] if first else ""


# query name -> (must_contain, must_not_contain, min_codegen_subtrees)
CHECKS = {
    "q01_pricing_summary": (["PushedFilters: [IsNotNull(l_shipdate)",
                             "ReadSchema: struct<l_quantity"],
                            ["ArrowEvalPython", "BatchEvalPython"], 1),
    "q02_count_by_kind": ([], ["EvalPython"], 1),
    "q04_member_resolution": (["BroadcastHashJoin"], ["EvalPython"], 1),
    "q13_composite_filter": (["PushedFilters"], ["EvalPython"], 1),
    "q30_dedup_exact": ([], ["EvalPython"], 1),
    "q31_minhash": ([], ["EvalPython"], 1),
    "q36_langid": ([], ["EvalPython"], 1),
    "q22_tile_assign": (["BroadcastHashJoin"], [], 0),
    # r4 page-graph / text-index family: pure Catalyst end to end
    "q80_extract_links": ([], ["EvalPython"], 1),
    "q82_degrees": ([], ["EvalPython"], 1),
    "q84_vocab_topk": (["TakeOrderedAndProject"], ["EvalPython"], 1),
    "q85_inverted_index": ([], ["EvalPython"], 1),
    "q86_conjunctive_search": ([], ["EvalPython"], 1),
    "q87_bm25_search": (["TakeOrderedAndProject"], ["EvalPython"], 1),
    # struct-max picks SortAggregate (struct agg buffer) — still
    # partial-aggregated map-side; the pin is no-Python + codegen scan
    "q88_latest_snapshot": ([], ["EvalPython"], 1),
    "q89_host_graph": ([], ["EvalPython"], 1),
    # r4 temporal family: pure Catalyst — as-of is window-over-union
    # (no BroadcastNestedLoopJoin: the inequality-join plan it exists
    # to avoid), range join is an equi-join after the bucket rewrite
    "q92_asof_join": (["Window"], ["EvalPython", "BroadcastNestedLoopJoin",
                                   "CartesianProduct"], 1),
    "q93_range_join": ([], ["EvalPython", "BroadcastNestedLoopJoin",
                            "CartesianProduct"], 1),
    "q94_time_rollup": (["Expand"], ["EvalPython"], 1),
    # r4 LM scoring: broadcast model, no Python
    "q96_lm_score": (["BroadcastHashJoin"], ["EvalPython"], 1),
    # r4 hotspot clustering: per-point labeling is the 100-TB path —
    # point-scale morton projection + ONE broadcast join of the
    # cells-scale cluster map (computed behind a localCheckpoint);
    # the point table itself never shuffles and never crosses into
    # Python
    "q114_hotspot_points": (["BroadcastHashJoin"], ["EvalPython"], 1),
    # radius distance join: disk fan-out + broadcast cell equi-join,
    # no loop, no Python, no nested-loop join
    "q115_distance_join": (["BroadcastHashJoin"],
                           ["EvalPython", "BroadcastNestedLoopJoin",
                            "CartesianProduct"], 1),
    # geo sessionization: ONE window shuffle, all signals lag() in it
    "q116_geo_sessions": (["Window"], ["EvalPython"], 1),
    # IDW interpolation: ONE broadcast grid equi-join (value threaded
    # through via data_cols) + map-side-combinable groupBy, no Python,
    # no nested-loop join
    "q123_idw_interpolate": (["BroadcastHashJoin"],
                             ["EvalPython", "BroadcastNestedLoopJoin",
                              "CartesianProduct"], 1),
    # focal raster stats: cells-scale fan-out + one groupBy, no Python
    "q126_focal_stats": ([], ["EvalPython"], 1),
    # geohash bucketing: pure-Catalyst bit interleave + base32 concat
    "q127_geohash_buckets": ([], ["EvalPython"], 1),
    # full-corpus k-means census: Catalyst assignment folds + ONE
    # map-side-combinable groupBy(cid); no Python, no cross join
    "q134_kmeans": (["HashAggregate"],
                    ["EvalPython", "CartesianProduct",
                     "BroadcastNestedLoopJoin"], 1),
    # spatio-temporal join: one grid radius join, struct passthrough,
    # no Python, no join-back against the event table
    "q140_st_cooccur": ([], ["EvalPython", "CartesianProduct",
                             "BroadcastNestedLoopJoin"], 1),
    # r4s2 marching squares: occupied-cell fan-out + one combinable
    # groupBy + literal segment table — pure Catalyst, zero joins
    "q147_isolines": (["HashAggregate"],
                      ["EvalPython", "CartesianProduct", "Join"], 1),
    # r4s2 triangle counting: degree groupBy + two equi-joins, no
    # Python, no nested-loop join
    "q148_host_triangles": ([], ["EvalPython", "CartesianProduct",
                                 "BroadcastNestedLoopJoin"], 1),
    # r4s2 random projection: plan-literal ± sums, zero shuffle on
    # the vector side, no Python
    "q153_random_projection": ([], ["EvalPython", "Exchange"], 1),
    # r4s2 exact Jaccard join: prefix-token equi-joins only — no
    # Python, no cross product (the brute form it replaces)
    "q154_jaccard_join": ([], ["EvalPython", "CartesianProduct",
                               "BroadcastNestedLoopJoin"], 1),
    # r4s2 KMV distinct (window kernel in q149 is relational; the
    # pin: no cross join, single-pass aggregation after distinct)
    "q150_kmv_intersect": ([], ["EvalPython"], 1),
    # r5 haversine point kNN: sphere quantization + chord² are pure
    # Catalyst int64 expressions — no Python, no cartesian anywhere
    "q164_knn_points_haversine": ([], ["EvalPython", "CartesianProduct",
                                       "BroadcastNestedLoopJoin"], 1),
    # r5 haversine radius join: one cell equi-join + exact chord²
    # filter, the data side broadcast
    "q165_distance_join_haversine": (["BroadcastHashJoin"],
                                     ["EvalPython", "CartesianProduct"], 1),
    # r5 haversine sessionization: one window pass, no joins, no
    # Python (chord² is a lag expression)
    "q168_geo_sessions_haversine": (["Window"],
                                    ["EvalPython", "Join"], 1),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from osm_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    qs = E.queries()
    results = {}
    sections = []
    for name, (must, must_not, min_cg) in CHECKS.items():
        df = qs[name](spark, sf_dir)
        plan = formatted_plan(df)
        # AQE wraps everything in AdaptiveSparkPlan and defers codegen
        # to execution; disable it for the probe so the static codegen
        # structure is visible.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            cg = codegen_summary(qs[name](spark, sf_dir))
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        n_cg = 0
        if "WholeStageCodegen subtrees" in cg:
            n_cg = int(cg.split()[1])
        missing = [m for m in must if m not in plan]
        present = [m for m in must_not if m in plan]
        ok = not missing and not present and n_cg >= min_cg
        results[name] = {
            "ok": ok,
            "missing_required": missing,
            "forbidden_present": present,
            "codegen_subtrees": n_cg,
        }
        sections.append(
            f"## {name}\n\nverdict: {'OK' if ok else 'FAIL'} "
            f"(required: {must}; forbidden: {must_not}; {cg.strip() or 'no codegen info'})\n\n"
            f"```\n{plan.strip()}\n```\n"
        )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write(
            "# PLANS — physical-plan audit of headline queries\n\n"
            "Generated by tools/explain_audit.py. Each section shows the\n"
            "`.explain(\"formatted\")` output and the properties checked\n"
            "(filter pushdown, broadcast joins, JVM-only page paths,\n"
            "whole-stage codegen). The fused PIP path (q21/q50-series) is\n"
            "deliberately a single mapInPandas — its plan is one\n"
            "ArrowEvalPython-free scan + one MapInPandas node; see\n"
            "SCALE.md for why that IS the design.\n\n"
            + "\n".join(sections)
        )
    n_ok = sum(1 for r in results.values() if r["ok"])
    print(json.dumps({"checked": len(results), "ok": n_ok, "results": results}))


if __name__ == "__main__":
    main()
