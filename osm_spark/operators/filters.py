"""F1 + P1-P5 — relation filtering and tag projections, fully JVM-side.

Replicates ignoreRelation (geojson.go:685-764) and the tag accessors
(geojson.go:259-300) as Catalyst expressions over the relations table —
no Python in this path; whole-stage codegen end to end.

Error semantics: the reference distinguishes silent skips (return
true, nil) from errors (duplicate tag geojson.go:250, unknown boundary
geojson.go:755-757). Errors become a side-output DataFrame instead of
aborting the job (print-and-continue, main.go:120-124).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.config import EngineConfig


def _patched_tags_col(cfg: EngineConfig):
    """tags array with per-relation patch entries appended
    (patchTags geojson.go:654-683)."""
    if not cfg.tag_patches:
        return F.col("tags")
    whens = None
    for rid, kv in sorted(cfg.tag_patches.items()):
        extra = F.array(
            *[
                F.struct(F.lit(k).alias("key"), F.lit(v).alias("value"))
                for k, v in sorted(kv.items())
            ]
        )
        cond = F.col("id") == F.lit(rid)
        whens = F.when(cond, extra) if whens is None else whens.when(cond, extra)
    patch = whens.otherwise(F.array().cast("array<struct<key:string,value:string>>"))
    return F.concat(F.col("tags"), patch)


def with_tag_columns(relations: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Adds derived tag columns. Input schema: id, refs, tags(array<struct>).

    - ``tmap``: patched tags as a map (P1 tag lookup becomes map access)
    - ``dup_tag``: duplicate tag key present (NewRelationTags error)
    - ``name_norm``: name with trailing "(" suffix stripped + trimmed (P2)
    - ``admin_level``: parsed level, -1 on absent/non-uint (P3)
    - ``iso2`` / ``iso3``: ISO code extraction with fallback (P4)
    - ``place``, ``rel_type``, ``boundary_l``
    """
    patched = _patched_tags_col(cfg)
    df = relations.withColumn("tags_patched", patched)
    df = df.withColumn(
        "dup_tag",
        F.size("tags_patched")
        != F.size(F.array_distinct(F.expr("transform(tags_patched, x -> x.key)"))),
    )
    # map_from_entries would throw on duplicates (ANSI); guard with dup_tag.
    df = df.withColumn(
        "tmap",
        F.when(~F.col("dup_tag"), F.map_from_entries("tags_patched")),
    )
    t = F.col("tmap")
    df = (
        df.withColumn(
            "name_norm",
            F.trim(F.regexp_replace(F.coalesce(t["name"], F.lit("")), r"\(.*$", "")),
        )
        .withColumn(
            "admin_level",
            F.when(
                t["admin_level"].rlike(r"^[0-9]+$"),
                F.coalesce(t["admin_level"].try_cast("int"), F.lit(-1)),
            ).otherwise(F.lit(-1)),
        )
        .withColumn("place", F.coalesce(t["place"], F.lit("")))
        .withColumn("rel_type", F.coalesce(t["type"], F.lit("")))
        .withColumn("boundary_l", F.lower(F.coalesce(t["boundary"], F.lit(""))))
        .withColumn(
            "iso2",
            F.coalesce(F.nullif(t["ISO3166-1"], F.lit("")), t["ISO3166-1:alpha2"], F.lit("")),
        )
        .withColumn("iso3", F.coalesce(t["ISO3166-1:alpha3"], F.lit("")))
    )
    return df


def split_kept_relations(
    relations: DataFrame, cfg: EngineConfig
) -> tuple[DataFrame, DataFrame]:
    """(kept, errors) per ignoreRelation (geojson.go:685-764).

    kept keeps the derived tag columns; errors has (id, error).
    Check order mirrors the reference: duplicate tags error first, then
    id blacklist, type, admin_level/place, name, boundary lists (unknown
    non-empty boundary value = error, geojson.go:755-757).
    """
    df = with_tag_columns(relations, cfg)

    blacklisted = F.col("id").isin(*cfg.blacklist) if cfg.blacklist else F.lit(False)
    bad_type = F.col("rel_type").isin("collection", "multilinestring")
    level_ok = F.col("admin_level").between(1, 8) | F.col("place").isin("city", "town")
    named = F.col("name_norm") != ""
    b = F.col("boundary_l")
    b_known = (b == "") | b.isin(*(cfg.boundary_accepted | cfg.boundary_rejected))
    b_ok = (b == "") | b.isin(*cfg.boundary_accepted)

    errors = df.where(
        F.col("dup_tag")
        | (~blacklisted & ~bad_type & level_ok & named & ~b_known)
    ).select(
        "id",
        F.when(F.col("dup_tag"), F.lit("duplicate tag"))
        .otherwise(F.concat(F.lit("unknown boundary value: '"), b, F.lit("'")))
        .alias("error"),
    )
    kept = df.where(
        ~F.col("dup_tag") & ~blacklisted & ~bad_type & level_ok & named & b_known & b_ok
    )
    return kept, errors
