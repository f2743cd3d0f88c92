"""Engine configuration: the reference's hardcoded relation tables as data.

The reference (pmezard/osm) bakes a set of OSM-planet-specific constants
into code: a relation blacklist (geojson.go:690-737), flagged recursive
relations (geojson.go:515-522), the subarea-built France relation
(geojson.go:483-513, main.go:342-344), per-relation tag patches
(geojson.go:654-683), per-relation ring patches (geojson.go:460-481) and
the boundary-tag accept/reject lists (geojson.go:546-635).

In this engine they are *configuration*, so the synthetic test world can
exercise every special-case branch with its own ids while
``reference_config()`` preserves the reference's exact planet behavior.
"""

from __future__ import annotations

from dataclasses import dataclass, field


Point = tuple[int, int]  # fixed-point 1e-7 degree (lon, lat)


@dataclass(frozen=True)
class EngineConfig:
    # Relations unconditionally ignored (dedup of dual representations,
    # disputed areas, crashes) — geojson.go:690-737.
    blacklist: frozenset = frozenset()
    # Relations whose geometry recursively includes inner/outer
    # sub-relation ways — isRecursiveRelation geojson.go:515-522.
    recursive_ids: frozenset = frozenset()
    # Relations built from their role="subarea" sub-relations, each sub
    # assembled separately and the polygon lists concatenated —
    # buildSpecialRelations geojson.go:483-513.
    subarea_ids: frozenset = frozenset()
    # rel id -> extra tags appended (ISO fixes) — patchTags geojson.go:654-683.
    tag_patches: dict = field(default_factory=dict)
    # assembly-context rel id -> synthetic closing segments appended after
    # its rings — patchRings geojson.go:460-481.
    ring_patches: dict = field(default_factory=dict)
    # boundary tag accept/reject lists — geojson.go:546-635. A non-empty
    # boundary value in neither list is an ERROR (geojson.go:755-757).
    boundary_accepted: frozenset = frozenset()
    boundary_rejected: frozenset = frozenset()


# Boundary values accepted / rejected by the reference (data tables from
# geojson.go:546-635; these are config values, not code).
_REFERENCE_ACCEPTED = frozenset(
    {
        "administrative", "administative", "admniistrative", "adminsitrative",
        "administrative;wenfeng", "land_area", "landuse", "cdp", "postal_code",
        "territorial", "suburb", "borough", "neighbourhood", "political",
        "maritime", "adminstrative", "admininstrative", "adm", "civil",
        "region", "area", "local_authority", "public", "civil_parish", "city",
        "civic", "quarter", "place", "urban", "ceremonial", "municipality",
        "union_council",
    }
)
_REFERENCE_REJECTED = frozenset(
    {
        "administrative_fraction", "national_park", "park", "state_park",
        "protected_area", "forestry", "religious_administration",
        "religioius_administration", "religious_adminsitration", "religious",
        "religous_administration", "rreligious_administration", "statistical",
        "census", "historical_administrative", "old_administrative",
        "obsolete_administrative", "obsolete_boundary", "historic:administrative",
        "historic", "historical", "traditional", "conflict", "disputed",
        "claim", "aboriginal_lands", "aboriginal lands", "rescue_unit",
        "inherited", "local", "police", "a", "judical", "school", "college",
        "water", "refugee_camp", "kimmirut", "el mdina", "ezzouhour",
        "bir ali ben khalifa",
    }
)


def reference_config() -> EngineConfig:
    """The reference's planet-specific constants, verbatim."""
    return EngineConfig(
        blacklist=frozenset(
            {
                2202162,  # France with water areas (keep 11980)
                1401905,  # Tuamotu-Gambier, crashes geos
                62781, 51477,  # Germany duplicates (keep 1111111)
                1124039,  # Monaco with water areas
                936128,  # Poland (keep 49715)
                52411,  # Belgium (keep 937244)
                1711283,  # Jersey land area
                270009,  # Guernsey (keep 6571872)
                2850940, 4263589,  # Philippines maritime (keep 443174)
                5441968,  # Sahrawi Arab Democratic Republic
                3263728,  # British Sovereign Base Areas
                6858045,  # Liberland
            }
        ),
        recursive_ids=frozenset({1111111, 1362232}),  # Germany, France métropolitaine
        subarea_ids=frozenset({11980}),  # France
        tag_patches={
            937244: {"ISO3166-1:alpha2": "BE", "ISO3166-1:alpha3": "BEL"},
            1711283: {"ISO3166-1:alpha2": "JE", "ISO3166-1:alpha3": "JEY"},
            6571872: {"ISO3166-1:alpha2": "GG", "ISO3166-1:alpha3": "GBG"},
            2850940: {"ISO3166-1:alpha2": "PH", "ISO3166-1:alpha3": "PHL"},
            4263589: {"ISO3166-1:alpha2": "PH", "ISO3166-1:alpha3": "PHL"},
        },
        ring_patches={
            1362232: [  # Metropolitan France polygon is not closed
                [(-17641958, 433431448), (-17668244, 433425557)],
                [(37501395, 434237009), (37469067, 434193643)],
            ],
        },
        boundary_accepted=_REFERENCE_ACCEPTED,
        boundary_rejected=_REFERENCE_REJECTED,
    )


# Roles on relation-type refs that are skipped without error —
# IgnoredRelations geojson.go:352-362.
IGNORED_RELATION_ROLES = frozenset(
    {"", "subarea", "subarea:FIXME", "collection", "disused:subarea",
     "admin_centre", "label"}
)

# Way roles that are dropped from ring assembly without error —
# IgnoredRingRoles geojson.go:95-101.
IGNORED_RING_ROLES = frozenset({"admin_centre"})
