"""Physical-plan property pins (the 100-TB contract): pushdown reaches
the scan, small dims broadcast, Catalyst-only families never cross into
Python. Full audit artifact: tools/explain_audit.py → PLANS.md."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

SF_DIR = "/root/testdata/sf0.001"


def test_plan_properties(spark):
    import __spark_entry__ as E
    from explain_audit import CHECKS, codegen_summary, formatted_plan

    qs = E.queries()
    for name in (
        "q01_pricing_summary",
        "q04_member_resolution",
        "q13_composite_filter",
        "q36_langid",
    ):
        must, must_not, min_cg = CHECKS[name]
        df = qs[name](spark, SF_DIR)
        plan = formatted_plan(df)
        for m in must:
            assert m in plan, (name, m)
        for m in must_not:
            assert m not in plan, (name, m)
        if min_cg:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try:
                cg = codegen_summary(qs[name](spark, SF_DIR))
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", "true")
            assert "WholeStageCodegen subtrees" in cg
            assert int(cg.split()[1]) >= min_cg, (name, cg)


def test_pip_index_plan_is_single_python_pass(spark, world):
    """The fused PIP path's whole plan is: scan → project → ONE
    MapInPandas — no join, no exchange on the page side."""
    from osm_spark.data.pages import PagesSpec, pages_df
    from osm_spark.plans.spatial_pipeline import run_spatial_pipeline
    from explain_audit import formatted_plan

    sp = run_spatial_pipeline(
        spark,
        pages_df(spark, PagesSpec(n_pages=100, n_countries=1)),
        world["locations"],
        world["kept"],
        max_level=11,
    )
    plan = formatted_plan(sp["pip"])
    assert "MapInPandas" in plan
    for forbidden in ("Exchange", "Join", "Generate"):
        assert forbidden not in plan, forbidden
