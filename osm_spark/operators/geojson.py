"""P8 + S6 + A4 — final document projection, JSONL sink, ISO check.

build_boundaries mirrors the ``geojson`` command (main.go:195-267 +
makeJsonRelation geojson.go:302-336): relations ⋈ locations ⋈ centroids
(inner joins encode the both-must-exist skip, geojson.go:798-806), with
the reference's validations as error side-outputs:
- empty coordinates        -> "empty relation"   (geojson.go:306-310)
- admin_level outside 1..11 and place not city/town
                           -> "unexpected admin_level" (geojson.go:323-331)

Output field semantics (RelationJson geojson.go:227-239): id is a
STRING; admin_level / ISO codes are omitted when empty (modeled as
nulls — to_json drops null fields); ``tags`` is the ORIGINAL tag list
(makeJsonRelation appends rel.Tags, NOT the patched tags — patches only
feed the ISO/name/filter logic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_boundaries(
    kept: DataFrame, locations: DataFrame, centroids: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """(boundaries, errors). kept must carry the derived tag columns."""
    rel = kept.select(
        F.col("id").alias("rel_id"),
        "name_norm",
        "admin_level",
        "place",
        "iso2",
        "iso3",
        "tags",
    )
    df = rel.join(locations, "rel_id").join(
        centroids.select("rel_id", "lon", "lat"), "rel_id"
    )

    empty = F.size("shape") == 0
    level_ok = F.col("admin_level").between(1, 11)
    place_ok = F.col("place").isin("city", "town")
    errors = df.where(empty | (~level_ok & ~place_ok)).select(
        F.col("rel_id").alias("root_id"),
        F.when(empty, F.lit("empty relation"))
        .otherwise(F.lit("unexpected admin_level"))
        .alias("error"),
    )
    boundaries = df.where(~empty & (level_ok | place_ok)).select(
        F.col("rel_id").cast("string").alias("id"),
        F.col("name_norm").alias("name"),
        F.when(level_ok, F.col("admin_level")).alias("admin_level"),
        F.nullif("iso2", F.lit("")).alias("country_iso2"),
        F.nullif("iso3", F.lit("")).alias("country_iso3"),
        F.struct(F.col("lon"), F.col("lat")).alias("center"),
        F.struct(
            F.lit("multipolygon").alias("type"), F.col("shape").alias("coordinates")
        ).alias("shape"),
        F.col("tags"),
    )
    return boundaries, errors


def to_jsonl(boundaries: DataFrame) -> DataFrame:
    """One ES-bulk doc per line ({_id,_type,_source}, main.go:196-200,
    248-254). Deterministic file order is pinned by relation id (the
    reference emits stream order; we choose a stable total order)."""
    doc = F.struct(
        F.col("id").alias("_id"),
        F.lit("boundary").alias("_type"),
        F.struct(
            "id",
            "name",
            "admin_level",
            "country_iso2",
            "country_iso3",
            "center",
            "shape",
            "tags",
        ).alias("_source"),
    )
    return boundaries.orderBy(F.col("id").cast("long")).select(
        F.to_json(doc).alias("line")
    )


def check_iso_codes(kept: DataFrame) -> tuple[DataFrame, DataFrame]:
    """A4 — the ``check`` command (main.go:654-709): among admin_level=2
    relations, report duplicate ISO2/ISO3 assignments and missing codes."""
    l2 = kept.where(F.col("admin_level") == 2).select("id", "iso2", "iso3")
    dups = (
        l2.where(F.col("iso2") != "")
        .groupBy("iso2")
        .agg(F.count("*").alias("n"), F.sort_array(F.collect_list("id")).alias("rel_ids"))
        .where(F.col("n") > 1)
    )
    missing = l2.where((F.col("iso2") == "") | (F.col("iso3") == "")).select(
        "id", "iso2", "iso3"
    )
    return dups, missing
