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
    # P2a — diagnostic name, Relation.Name() parity (parser.go:395-411):
    # a faithful ORDERED fold over the RAW (unpatched) tag array: the
    # plain "name" tag wins the moment it is seen; otherwise exactly one
    # "name:*" tag supplies the name; a SECOND "name:*" tag returns ""
    # immediately — even if a plain "name" follows later in tag order
    # (the reference's early return). Used only where the reference uses
    # rel.Name()/rel.String(): error/diagnostic strings (main.go:122,365,
    # geojson.go:504) — NOT in the keep/drop filter, which the reference
    # drives off RelationTags.Name() (map-based "name" lookup only,
    # geojson.go:259-268, called at geojson.go:749).
    df = df.withColumn(
        "name_diag",
        F.expr(
            """
            aggregate(
              tags,
              named_struct('done', false, 'result', '', 'names', 0),
              (acc, x) -> CASE
                WHEN acc.done THEN acc
                WHEN x.key = 'name'
                  THEN named_struct('done', true, 'result', x.value,
                                    'names', acc.names)
                WHEN x.key LIKE 'name:%' AND acc.names >= 1
                  THEN named_struct('done', true, 'result', '',
                                    'names', acc.names + 1)
                WHEN x.key LIKE 'name:%'
                  THEN named_struct('done', false, 'result', x.value,
                                    'names', acc.names + 1)
                ELSE acc END,
              acc -> acc.result)
            """
        ),
    )
    # Raw admin_level tag string for rel.String() parity (parser.go:412:
    # getTag over raw tags, "" when absent; first occurrence wins).
    df = df.withColumn(
        "admin_level_raw",
        F.expr(
            "coalesce(filter(tags, x -> x.key = 'admin_level')[0].value, '')"
        ),
    )
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

    # rel.String() parity for the error text (geojson.go:755-757 +
    # parser.go:417-419): "unknown boundary value for Name(id)[level=x]"
    # — Name here is the diagnostic name WITH the name:* fallback.
    rel_str = F.concat(
        F.col("name_diag"), F.lit("("), F.col("id").cast("string"),
        F.lit(")[level="), F.col("admin_level_raw"), F.lit("]"),
    )
    errors = df.where(
        F.col("dup_tag")
        | (~blacklisted & ~bad_type & level_ok & named & ~b_known)
    ).select(
        "id",
        F.when(F.col("dup_tag"), F.lit("duplicate tag"))
        .otherwise(
            F.concat(
                F.lit("unknown boundary value for "), rel_str,
                F.lit(": '"), b, F.lit("'"),
            )
        )
        .alias("error"),
    )
    kept = df.where(
        ~F.col("dup_tag") & ~blacklisted & ~bad_type & level_ok & named & b_known & b_ok
    )
    return kept, errors
