"""J2/J3/J4 + A2 — relation→way resolution and multipolygon assembly.

The reference resolves members via BoltDB point lookups inside a worker
pool (geojson.go:394-445, main.go:83-110). Here the bulk path is a chain
of DataFrame joins and assembly is one grouped-map Arrow UDF:

    kept relations --posexplode(refs)--> way members
        ⋈ ways_geom on way_id                        (J2)
    groupBy(rel_id).applyInPandas(assemble)          (A2)

Ring input ORDER is semantic (it fixes output ring order, P9): the
reference assembles, per relation, its own ways sorted by way id first,
then sub-relation rings sorted by sub id, each sub contributing its own
sub-sub rings BEFORE its own ways (collectRelationWays recursion order,
geojson.go:414-445 vs buildRelationPolygons geojson.go:524-543). We
encode that order as a lexicographic ``skey`` array:

    root-level ways:             [1, way_id]
    root-level sub-relation S:   prefix [2, S]
    inside S (depth>=1):           sub-subs get marker 1, ways marker 2
    ring patches:                [9, i]   (appended last, patchRings)

Recursive (J3, isRecursiveRelation geojson.go:515-522) and subarea-built
(J4, buildSpecialRelations geojson.go:483-513) relations are resolved by
a DRIVER-SIDE closure: the flagged set is tiny by nature (the reference
hardcodes exactly three planet relations), so their member expansion is
metadata-scale — a few small ``collect``s against the relations table —
while every per-way geometry row stays distributed. This deliberately
avoids a Catalyst fixpoint loop whose stage count would dwarf the data.

Subarea relations assemble each subarea member SEPARATELY (one
buildRelationPolygons per sub, polygon lists concatenated in original
ref order, geojson.go:492-511) — modeled as a ``grp`` column: the UDF
assembles each (relation, grp) group on its own and concatenates in grp
order. Missing subarea subs are silently skipped (geojson.go:500-502);
missing recursive subs are errors (geojson.go:424-426).

Scale notes: the members⋈ways_geom join shuffles on way_id (no skew —
a way belongs to a handful of relations); the assembly groupBy shuffles
on rel_id. Giant relations (Russia: ~10^5 ring points) are a single
Arrow group — bounded and fine; the group must NEVER be salted (the
assembly is a per-relation sequential algorithm, distributed across
relations).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.config import IGNORED_RELATION_ROLES, IGNORED_RING_ROLES, EngineConfig
from osm_spark.kernels import Linestring, make_polygons, make_rings, polygons_to_coords

MAX_RELATION_DEPTH = 6

_MEMBER_SCHEMA = (
    "root_id long, grp int, skey array<long>, way_id long, role string"
)


class AssemblyError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Pure per-relation kernel (unit-testable without Spark)
# ---------------------------------------------------------------------------


def _ring_signed_area2(points) -> int:
    """2× signed shoelace area on integer micro-degree points (exact)."""
    a = 0
    n = len(points)
    for i in range(n):
        x1, y1 = points[i]
        x2, y2 = points[(i + 1) % n]
        a += x1 * y2 - x2 * y1
    return a


def build_geometry(lines: list[Linestring], crossing_mode: str = "split"):
    """Role guard + ring closing + polygon nesting (buildGeometry
    geojson.go:103-120). Note: ways with ignored ring roles (e.g.
    admin_centre) are NOT dropped — the reference only skips the role
    *validation* for them; they still participate in ring assembly.

    Returns (polygons, warnings). Buffer(0) handling (poly.go:177):
    self-TOUCHING rings (repeated vertex) are split exactly into their
    loops — byte-equivalent to the GEOS repair for the pinch class;
    rings with proper edge CROSSINGS (bowties) are split at the
    snap-to-grid crossing points (split_crossing_ring — documented
    rounding rule, ≤ half a 1e-7-degree cell of positional error).
    ``crossing_mode`` picks the post-split contract (ADVICE r3 #4):

    - ``"split"`` (default): ST_MakeValid semantics — keep every lobe.
    - ``"drop-minority-lobe"``: strict GEOS Buffer(0) parity — keep
      only the lobes whose winding matches the original ring's net
      winding (sign of the total shoelace area); the minority-wound
      lobe(s) are discarded, matching what the reference's Buffer(0)
      produces for its bowtie-accepting vector (geojson_test.go:43).

    Anything still non-simple after both repairs passes through
    unchanged with a divergence warning."""
    from osm_spark.kernels.rings import (
        is_simple_ring,
        split_crossing_ring,
        split_pinched_ring,
    )

    for line in lines:
        if line.role in ("inner", "outer", ""):
            continue
        if line.role in IGNORED_RING_ROLES:
            continue
        raise AssemblyError(f"unsupported ring role: {line.role}")
    rings = make_rings(lines)
    warnings: list[str] = []
    checked: list[Linestring] = []
    for ring in rings:
        if is_simple_ring(ring.points):
            checked.append(ring)
            continue
        def _accepted(parts: list) -> bool:
            # Accept multi-loop splits AND single-loop spike removals
            # (A-B-C-B-D-A → A-B-D-A): GEOS Buffer(0) strips the spike
            # in both cases, so a changed single loop is a repair, not
            # a pass-through (ADVICE r2 #2).
            return bool(parts) and all(is_simple_ring(p) for p in parts) and (
                len(parts) > 1 or parts[0] != ring.points
            )

        parts = split_pinched_ring(ring.points)
        kind = "self-touching"
        if not _accepted(parts):
            # Proper-crossing class: snap-to-grid split (VERDICT r2 #5).
            parts = split_crossing_ring(ring.points)
            kind = "self-crossing (snap-to-grid)"
            if _accepted(parts) and crossing_mode == "drop-minority-lobe":
                net = _ring_signed_area2(ring.points)
                kept = [
                    p for p in parts
                    if net == 0 or _ring_signed_area2(p) * net > 0
                ]
                if kept:  # never drop everything
                    dropped = len(parts) - len(kept)
                    parts = kept
                    if dropped:
                        kind += f", {dropped} minority lobe(s) dropped"
        if _accepted(parts):
            for p in parts:
                piece = Linestring(ring.id, p, ring.role)
                checked.append(piece)
            warnings.append(
                f"repaired {kind} ring (buffer(0) analog, "
                f"{len(parts)} loops): way {ring.id}"
            )
        else:
            checked.append(ring)
            warnings.append(
                f"non-simple ring kept unrepaired (buffer(0) divergence): "
                f"way {ring.id}"
            )
    return make_polygons(checked), warnings


def assemble_relation(groups: list[list[Linestring]], crossing_mode: str = "split"):
    """Assemble one relation from per-group ring sets; returns
    (coords, warnings) — the 4-nested float multipolygon coordinates
    (winding-normalized) plus buffer(0)-repair warnings."""
    polygons = []
    warnings: list[str] = []
    for lines in groups:
        polys, w = build_geometry(lines, crossing_mode=crossing_mode)
        polygons.extend(polys)
        warnings.extend(w)
    return polygons_to_coords(polygons), warnings


# ---------------------------------------------------------------------------
# Driver-side closure for flagged special relations (J3/J4)
# ---------------------------------------------------------------------------


def _collect_refs(relations: DataFrame, ids: set[int]) -> dict[int, list]:
    if not ids:
        return {}
    rows = (
        relations.where(F.col("id").isin(*ids))
        .select("id", "refs")
        .collect()
    )
    return {int(r["id"]): r["refs"] for r in rows}


def _special_members(
    relations: DataFrame,
    special_roots: list[tuple[int, bool]],  # (root_id, is_subarea)
    cfg: EngineConfig,
):
    """Expand flagged roots into (member_rows, patch_contexts, errors).

    member_rows: (root_id, grp, skey, way_id, role)
    patch_contexts: (root_id, grp, ctx_rel_id) at buildRelationPolygons
    level (ring patches apply there only).
    errors: (root_id, error_string)
    """
    members: list[tuple] = []
    patch_ctx: list[tuple[int, int, int]] = []
    errors: list[tuple[int, str]] = []

    # Breadth-wise fetch of all relation rows we will need.
    needed: set[int] = set()
    for rid, _ in special_roots:
        needed.add(rid)
    refs_by_id = _collect_refs(relations, needed)
    frontier = set()
    for rid in list(refs_by_id):
        for ref in refs_by_id[rid]:
            if ref["ref_type"] == 2:
                frontier.add(int(ref["ref_id"]))
    depth = 0
    while frontier and depth < MAX_RELATION_DEPTH:
        depth += 1
        frontier -= set(refs_by_id)
        if not frontier:
            break
        got = _collect_refs(relations, frontier)
        refs_by_id.update(got)
        frontier = {
            int(ref["ref_id"])
            for rid in got
            for ref in got[rid]
            if ref["ref_type"] == 2
        }

    def collect_way_refs(rid: int):
        """collectWayRefs (geojson.go:364-392): (way_refs, rel_refs) both
        sorted by id; error on unhandled relation-member roles."""
        way_refs, rel_refs = [], []
        for ref in refs_by_id[rid]:
            t = ref["ref_type"]
            if t == 1:
                way_refs.append((int(ref["ref_id"]), ref["role"] or ""))
            elif t == 2:
                role = ref["role"] or ""
                if role in ("inner", "outer"):
                    rel_refs.append(int(ref["ref_id"]))
                elif role not in IGNORED_RELATION_ROLES:
                    raise AssemblyError(f"cannot handle relation relation: {role}")
            elif t == 0:
                continue
            else:
                raise AssemblyError(f"unsupported reference type: {t}")
        way_refs.sort()
        rel_refs.sort()
        return way_refs, rel_refs

    def expand_sub(root_id: int, grp: int, rid: int, prefix: list[int], depth: int):
        """collectRelationWays (geojson.go:414-445): sub-sub rings BEFORE
        own ways at nested levels."""
        if depth > MAX_RELATION_DEPTH:
            raise AssemblyError(f"relation nesting too deep: {rid}")
        if rid not in refs_by_id:
            raise AssemblyError(f"cannot resolve subrelation: {rid}")
        way_refs, rel_refs = collect_way_refs(rid)
        for sub in rel_refs:
            expand_sub(root_id, grp, sub, prefix + [1, sub], depth + 1)
        for wid, role in way_refs:
            members.append((root_id, grp, prefix + [2, wid], wid, role.lower()))

    def build_relation_polygons(root_id: int, grp: int, rid: int, prefix: list[int]):
        """buildRelationPolygons (geojson.go:524-543): own ways first,
        then (recursive only) sub-relation rings; ring patches last."""
        way_refs, rel_refs = collect_way_refs(rid)
        for wid, role in way_refs:
            members.append((root_id, grp, prefix + [1, wid], wid, role.lower()))
        if rid in cfg.recursive_ids:
            for sub in rel_refs:
                expand_sub(root_id, grp, sub, prefix + [2, sub], 1)
        patch_ctx.append((root_id, grp, rid))

    for root_id, is_subarea in special_roots:
        try:
            if is_subarea:
                # buildSpecialRelations: original ref order, each subarea
                # member assembled separately; missing subs skipped.
                for pos, ref in enumerate(refs_by_id[root_id]):
                    if ref["ref_type"] != 2 or (ref["role"] or "") != "subarea":
                        continue
                    sub = int(ref["ref_id"])
                    if sub not in refs_by_id:
                        continue  # geojson.go:500-502
                    build_relation_polygons(root_id, pos, sub, [])
            else:
                build_relation_polygons(root_id, 0, root_id, [])
        except AssemblyError as exc:
            errors.append((root_id, str(exc)))
            members[:] = [m for m in members if m[0] != root_id]
            patch_ctx[:] = [p for p in patch_ctx if p[0] != root_id]

    return members, patch_ctx, errors


# ---------------------------------------------------------------------------
# Member resolution (joins)
# ---------------------------------------------------------------------------


def resolve_members(
    relations: DataFrame,
    kept: DataFrame,
    ways_geom: DataFrame,
    cfg: EngineConfig,
) -> tuple[DataFrame, DataFrame]:
    """(members, errors).

    members: (root_id, grp, skey, way_id, role, lons, lats) — every ring
    line of every assembly group, geometry resolved.
    errors:  (root_id, error) — per-relation failures (bad member role,
    unresolvable way/sub-relation/node), reference print-and-continue.
    """
    spark = relations.sparkSession
    subarea = sorted(cfg.subarea_ids)
    special = sorted(cfg.subarea_ids | cfg.recursive_ids)

    root_refs = kept.select(
        F.col("id").alias("root_id"), F.posexplode("refs").alias("pos", "ref")
    ).select(
        "root_id",
        "pos",
        F.col("ref.ref_id").alias("ref_id"),
        F.col("ref.ref_type").alias("ref_type"),
        F.col("ref.role").alias("role"),
    )
    not_special = (
        ~F.col("root_id").isin(*special) if special else F.lit(True)
    )

    # Bulk path: root-level way members of ordinary roots, skey [1, way_id].
    mem = root_refs.where((F.col("ref_type") == 1) & not_special).select(
        "root_id",
        F.lit(0).alias("grp"),
        F.array(F.lit(1).cast("long"), F.col("ref_id")).alias("skey"),
        F.col("ref_id").alias("way_id"),
        F.lower(F.col("role")).alias("role"),
    )

    # Bad relation-member roles (collectWayRefs error, geojson.go:382).
    bad_role = (
        (F.col("ref_type") == 2)
        & ~F.col("role").isin("inner", "outer")
        & ~F.col("role").isin(*IGNORED_RELATION_ROLES)
    )
    role_errors = root_refs.where(not_special & bad_role).select(
        "root_id",
        F.concat(F.lit("cannot handle relation relation: "), F.col("role")).alias(
            "error"
        ),
    )

    # Special roots (flagged recursive / subarea): driver-side closure.
    special_present = (
        [
            (int(r["id"]), int(r["id"]) in cfg.subarea_ids)
            for r in kept.select("id").where(F.col("id").isin(*special)).collect()
        ]
        if special
        else []
    )
    sp_members, patch_ctx, sp_errors = _special_members(
        relations, special_present, cfg
    )

    # Ring patches (P6, patchRings geojson.go:460-481): appended after all
    # rings of their assembly context; contexts = every ordinary root plus
    # the special-root contexts recorded above.
    patch_rows: list[tuple] = []
    if cfg.ring_patches:
        special_set = set(special)
        ordinary_ctx = [
            int(r["id"])
            for r in kept.select("id")
            .where(F.col("id").isin(*cfg.ring_patches.keys()))
            .collect()
            if int(r["id"]) not in special_set
        ]
        all_ctx = [(rid, 0, rid) for rid in ordinary_ctx] + patch_ctx
        for root_id, grp, ctx in all_ctx:
            for i, seg in enumerate(cfg.ring_patches.get(ctx, [])):
                patch_rows.append(
                    (
                        root_id,
                        grp,
                        [9, i],
                        -(i + 1),
                        "",
                        [int(p[0]) for p in seg],
                        [int(p[1]) for p in seg],
                    )
                )

    if sp_members:
        mem = mem.unionByName(spark.createDataFrame(sp_members, _MEMBER_SCHEMA))

    # J2: resolve way geometry; null lons = unresolvable way.
    mem = mem.join(ways_geom, "way_id", "left")
    way_errors = mem.where(F.col("lons").isNull()).select(
        "root_id",
        F.concat(F.lit("cannot resolve way: "), F.col("way_id")).alias("error"),
    )
    node_errors = mem.where(F.col("n_missing") > 0).select(
        "root_id", F.lit("cannot resolve node").alias("error")
    )
    mem = mem.where(F.col("lons").isNotNull() & (F.col("n_missing") == 0)).select(
        "root_id", "grp", "skey", "way_id", "role", "lons", "lats"
    )
    if patch_rows:
        mem = mem.unionByName(
            spark.createDataFrame(
                patch_rows, _MEMBER_SCHEMA + ", lons array<long>, lats array<long>"
            )
        )

    errors = role_errors.unionByName(way_errors).unionByName(node_errors)
    if sp_errors:
        errors = errors.unionByName(
            spark.createDataFrame(sp_errors, "root_id long, error string")
        )

    # A failed relation is dropped entirely (print-and-continue).
    mem = mem.join(errors.select("root_id").distinct(), "root_id", "left_anti")
    return mem, errors


# ---------------------------------------------------------------------------
# Grouped-map assembly (A2)
# ---------------------------------------------------------------------------

LOCATION_SCHEMA = (
    "rel_id long, shape array<array<array<array<double>>>>, "
    "n_polygons int, error string, warning string"
)


def _assemble_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    rel_id = int(pdf["root_id"].iloc[0])
    try:
        groups: list[list[Linestring]] = []
        for grp in sorted(pdf["grp"].unique()):
            g = pdf[pdf["grp"] == grp]
            rows = sorted(
                (
                    (tuple(int(v) for v in r.skey), r.way_id, r.role, r.lons, r.lats)
                    for r in g.itertuples()
                ),
                key=lambda t: t[0],
            )
            lines = [
                Linestring(
                    int(way_id),
                    list(zip((int(x) for x in lons), (int(y) for y in lats))),
                    role or "",
                )
                for (_, way_id, role, lons, lats) in rows
            ]
            groups.append(lines)
        coords, warns = assemble_relation(groups)
        return pd.DataFrame(
            {
                "rel_id": [rel_id],
                "shape": [coords],
                "n_polygons": [len(coords)],
                "error": [None],
                "warning": ["; ".join(warns) if warns else None],
            }
        )
    except Exception as exc:  # per-relation print-and-continue
        return pd.DataFrame(
            {"rel_id": [rel_id], "shape": [None], "n_polygons": [0],
             "error": [str(exc)], "warning": [None]}
        )


def assemble_locations(members: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(locations, errors): grouped-map assembly per relation. The group
    key is rel_id — never salt it; per-relation assembly is sequential
    by design (a reference worker, distributed across relations)."""
    out = members.groupBy("root_id").applyInPandas(_assemble_pdf, LOCATION_SCHEMA)
    locations = out.where(F.col("error").isNull()).select(
        "rel_id", "shape", "n_polygons"
    )
    # Buffer(0) repair/divergence warnings surface on the error
    # side-channel (reference prints and continues; the relation still
    # produces a location — only `error` rows drop it).
    errors = out.where(F.col("error").isNotNull()).select(
        F.col("rel_id").alias("root_id"), "error"
    ).unionByName(
        out.where(F.col("warning").isNotNull()).select(
            F.col("rel_id").alias("root_id"), F.col("warning").alias("error")
        )
    )
    return locations, errors
