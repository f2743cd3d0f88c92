"""Generate the golden JSONL fixture for tests/test_golden_jsonl.py.
Run once after an intentional semantic change; review the diff before
committing."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from osm_spark.data.worldgen import WorldSpec, world_dataframes
from osm_spark.operators.geojson import to_jsonl
from osm_spark.plans.pipeline import run_boundaries_pipeline
from osm_spark.session import get_spark


def main() -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    nodes, ways, rels, cfg = world_dataframes(spark, WorldSpec(n_countries=1))
    out = run_boundaries_pipeline(spark, nodes, ways, rels, cfg)
    lines = [r.line for r in to_jsonl(out["boundaries"]).collect()]
    dest = Path(__file__).resolve().parents[1] / "tests" / "golden"
    dest.mkdir(exist_ok=True)
    (dest / "boundaries_1country.jsonl").write_text("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} docs")


if __name__ == "__main__":
    main()
