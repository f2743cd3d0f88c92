"""Golden-file pin of the final JSONL output for the 1-country world.

The golden file is generated once (tools/gen_golden.py), reviewed, and
committed; any change to ring order, winding, coordinates, centroids,
tag handling or doc shape shows up as a diff here. This is the engine's
analog of the reference's golden tree dumps (poly_test.go:81-88).
"""

import json
from pathlib import Path

GOLDEN = Path(__file__).parent / "golden" / "boundaries_1country.jsonl"


def test_boundaries_match_golden(world):
    from osm_spark.operators.geojson import to_jsonl

    lines = [r.line for r in to_jsonl(world["boundaries"]).collect()]
    got = [json.loads(l) for l in lines]
    expected = [json.loads(l) for l in GOLDEN.read_text().splitlines()]
    assert len(got) == len(expected)
    for g, e in zip(got, expected):
        assert g == e, f"doc {g.get('_id')} differs"
