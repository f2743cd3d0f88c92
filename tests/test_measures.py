"""Catalyst-native geometry measures (spatial/measures.py): closed-form
checks plus bit-exact parity with the DuckDB window-function oracle."""


def _rect(x0, y0, w, h):
    return [
        [float(x0), float(y0)],
        [float(x0 + w), float(y0)],
        [float(x0 + w), float(y0 + h)],
        [float(x0), float(y0 + h)],
        [float(x0), float(y0)],
    ]


def test_measures_closed_form(spark):
    from osm_spark.spatial.measures import polygon_measures

    df = spark.createDataFrame(
        [
            (1, [[_rect(0, 0, 10, 6), _rect(2, 2, 3, 2)]]),  # rect + hole
            (2, [[_rect(-4, -3, 4, 3)], [_rect(100, 100, 1, 1)]]),
        ],
        "rel_id long, shape array<array<array<array<double>>>>",
    )
    rows = {
        (r["rel_id"], r["poly_idx"]): r for r in polygon_measures(df).collect()
    }
    r10 = rows[(1, 0)]
    assert r10["area"] == 60.0 - 6.0
    assert r10["perimeter"] == 2 * (10 + 6) + 2 * (3 + 2)
    assert r10["n_rings"] == 2 and r10["n_points"] == 10
    assert (r10["lon_min"], r10["lat_min"], r10["lon_max"], r10["lat_max"]) == (
        0.0, 0.0, 10.0, 6.0,
    )
    r21 = rows[(2, 1)]
    assert r21["area"] == 1.0 and r21["perimeter"] == 4.0


def test_measures_winding_invariant(spark):
    """CW and CCW ring orientations give the same unsigned measures."""
    from osm_spark.spatial.measures import polygon_measures

    ccw = _rect(0, 0, 5, 4)
    cw = list(reversed(ccw))
    df = spark.createDataFrame(
        [(1, [[ccw]]), (2, [[cw]])],
        "rel_id long, shape array<array<array<array<double>>>>",
    )
    rows = {r["rel_id"]: r for r in polygon_measures(df).collect()}
    assert rows[1]["area"] == rows[2]["area"] == 20.0
    assert rows[1]["perimeter"] == rows[2]["perimeter"] == 18.0


def test_measures_plan_is_catalyst_only(spark):
    """The measures projection must contain no Python eval nodes —
    it is sold as a zero-UDF, whole-stage-codegen surface."""
    from osm_spark.spatial.measures import polygon_measures

    df = spark.createDataFrame(
        [(1, [[_rect(0, 0, 2, 2)]])],
        "rel_id long, shape array<array<array<array<double>>>>",
    )
    plan = polygon_measures(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_measures_degenerate_ring_is_zero(spark):
    """1-point 'ring': sequence(0,-1) counts DOWN in Spark — the guard
    must yield 0 area/perimeter, not a null-poisoned fold."""
    from osm_spark.spatial.measures import polygon_measures

    df = spark.createDataFrame(
        [(1, [[[[3.0, 4.0]]]])],
        "rel_id long, shape array<array<array<array<double>>>>",
    )
    r = polygon_measures(df).first()
    assert r["area"] == 0.0 and r["perimeter"] == 0.0
    assert r["n_points"] == 1


def test_q57_matches_duckdb_oracle(spark):
    import duckdb

    import __spark_entry__ as entrymod

    df = entrymod.queries()["q57_geometry_measures"](spark, "")
    srows = {tuple(r) for r in df.collect()}
    orows = {
        tuple(r)
        for r in duckdb.sql(
            entrymod.oracle_sql()["q57_geometry_measures"]
        ).fetchall()
    }
    assert len(srows) == 4
    assert srows == orows
