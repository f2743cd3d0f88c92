"""Deterministic synthetic OSM-style mini-world ("France départements /
communes" style, FIXTURES.md §3).

Generates ``nodes`` / ``ways`` / ``relations`` tables shaped exactly like
the reference's data model (parser.go:289-295, 350-355, 388-393) and an
``EngineConfig`` whose special-case ids (blacklist, recursive, subarea,
tag/ring patches) point at world relations, so every semantic branch of
the reference pipeline is exercised without the planet's hardcoded ids.

Per country the world contains:
- an outer ring split across 5 ways (one stored reversed, one edge split
  mid-arc) — exercises arc merging G1/G2 and ring closing G3;
- a lake hole (2 L-shaped inner ways) containing an island (1 closed way)
  — depth-3 ring nesting G6-G8, island emitted as a second polygon;
- ``dept_grid²`` départements tiling the country; dept 1 is a horseshoe
  (interior-point centroid fallback G11), dept 2 is annular (centroid
  None — the centroid_test.go:74-83 case), dept 3 has an ``admin_centre``
  node ref (J5); adjacent depts share border ways (way reuse across
  relations);
- ``commune_grid²`` communes inside dept 0; commune 0 is tagged
  ``place=city`` with admin_level=9 (place exception geojson.go:742-748);
- a "metropolitan" relation built recursively from two inner/outer
  sub-relations (J3), with one edge deliberately missing and restored via
  a ring patch (P6 analog); one sub-relation is type=multilinestring;
- a "union" relation built from role=subarea dept members (J4), including
  one dangling ref to a nonexistent relation (ignored, geojson.go:500-502);
- rejects: national_park, type=collection, nameless, admin_level=10,
  an unknown boundary value (error side-output), and a blacklisted
  duplicate country representation (F1).

All coordinates are fixed-point int64 degrees ×1e7 (geojson.go:12-15).
The world is a TEST/BENCH fixture: boundary-source tables are small in
reality (~10⁶ admin relations planet-wide); the 100 TB side of the
engine is the pages table (osm_spark.data.pages), generated distributed.
"""

from __future__ import annotations

from dataclasses import dataclass

from osm_spark.config import EngineConfig

FP = 10_000_000  # fixed-point scale


@dataclass(frozen=True)
class WorldSpec:
    n_countries: int = 2
    dept_grid: int = 2  # dept count per country = dept_grid**2 (>=4 for specials)
    commune_grid: int = 2  # communes inside dept 0 = commune_grid**2
    densify: int = 0  # extra interpolated points per way segment


# Relation id blocks (deterministic, disjoint).
COUNTRY_BASE = 1_000_000
DEPT_BASE = 2_000_000
COMMUNE_BASE = 3_000_000
METRO_BASE = 4_000_000
METRO_SUB_BASE = 5_000_000
UNION_BASE = 6_000_000
REJECT_BASE = 7_000_000
DUP_BASE = 8_000_000
MISSING_SUB_ID = 9_999_999  # referenced but never generated


def country_id(c: int) -> int:
    return COUNTRY_BASE + c


def dept_id(c: int, d: int) -> int:
    return DEPT_BASE + c * 1000 + d


def commune_id(c: int, k: int) -> int:
    return COMMUNE_BASE + c * 1000 + k


class WorldBuilder:
    def __init__(self, spec: WorldSpec) -> None:
        self.spec = spec
        self.nodes: dict[tuple[int, int], int] = {}  # (lon,lat) -> id
        self.node_rows: list[dict] = []
        self.way_rows: list[dict] = []
        self.ways: dict[tuple, int] = {}  # canonical point tuple -> id
        self.rel_rows: list[dict] = []
        self._next_node = 1
        self._next_way = 1

    # --- primitive builders -------------------------------------------------

    def node(self, lon: int, lat: int, tags: list | None = None) -> int:
        nid = self.nodes.get((lon, lat))
        if nid is None:
            nid = self._next_node
            self._next_node += 1
            self.nodes[(lon, lat)] = nid
            self.node_rows.append(
                {"id": nid, "lon": lon, "lat": lat, "tags": tags or []}
            )
        return nid

    def _densify(self, points: list[tuple[int, int]]) -> list[tuple[int, int]]:
        k = self.spec.densify
        if k <= 0:
            return points
        out = [points[0]]
        for (x0, y0), (x1, y1) in zip(points, points[1:]):
            for i in range(1, k + 1):
                out.append(
                    (x0 + (x1 - x0) * i // (k + 1), y0 + (y1 - y0) * i // (k + 1))
                )
            out.append((x1, y1))
        return out

    def way(self, points: list[tuple[int, int]], shared: bool = True) -> int:
        """Create (or reuse, if ``shared``) a way through fixed-point points."""
        points = self._densify(points)
        key = tuple(points)
        rkey = tuple(reversed(points))
        if shared:
            wid = self.ways.get(key) or self.ways.get(rkey)
            if wid is not None:
                return wid
        wid = self._next_way
        self._next_way += 1
        if shared:
            self.ways[key] = wid
        self.way_rows.append(
            {"id": wid, "nodes": [self.node(x, y) for (x, y) in points], "tags": []}
        )
        return wid

    def relation(self, rid: int, refs: list[tuple[int, int, str]], tags: list[tuple[str, str]]) -> None:
        self.rel_rows.append(
            {
                "id": rid,
                "refs": [
                    {"ref_id": i, "ref_type": t, "role": r} for (i, t, r) in refs
                ],
                "tags": [{"key": k, "value": v} for (k, v) in tags],
            }
        )

    # --- shapes -------------------------------------------------------------

    def rect_edges(
        self, x0: int, y0: int, x1: int, y1: int
    ) -> list[int]:
        """4 shared edge ways of an axis-aligned rectangle (S,E,N,W)."""
        return [
            self.way([(x0, y0), (x1, y0)]),
            self.way([(x1, y0), (x1, y1)]),
            self.way([(x1, y1), (x0, y1)]),
            self.way([(x0, y1), (x0, y0)]),
        ]

    def closed_rect_way(self, x0: int, y0: int, x1: int, y1: int) -> int:
        return self.way([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)])


def deg(v: float) -> int:
    return int(round(v * FP))


def build_world(spec: WorldSpec) -> tuple[WorldBuilder, EngineConfig]:
    b = WorldBuilder(spec)
    blacklist = set()
    recursive_ids = set()
    subarea_ids = set()
    tag_patches: dict[int, dict[str, str]] = {}
    ring_patches: dict[int, list[list[tuple[int, int]]]] = {}

    for c in range(spec.n_countries):
        gx, gy = c % 16, c // 16
        x0d = -178.0 + gx * 10 + 1
        y0d = -85.0 + gy * 10 + 1
        x0, y0 = deg(x0d), deg(y0d)
        x1, y1 = deg(x0d + 8), deg(y0d + 8)
        xm = deg(x0d + 4)
        ym = deg(y0d + 4)

        # Country outer ring: S, E split in two, N stored reversed, W.
        w_s = b.way([(x0, y0), (x1, y0)])
        w_e1 = b.way([(x1, y0), (x1, ym)])
        w_e2 = b.way([(x1, ym), (x1, y1)])
        w_n_rev = b.way([(x0, y1), (x1, y1)])  # traversal needs reversal
        w_w = b.way([(x0, y1), (x0, y0)])
        outer_ways = [w_s, w_e1, w_e2, w_n_rev, w_w]

        # Lake hole (two L-shaped inner ways) + island inside it.
        lx0, ly0 = deg(x0d + 1.0), deg(y0d + 1.0)
        lx1, ly1 = deg(x0d + 2.5), deg(y0d + 2.5)
        w_lake1 = b.way([(lx0, ly0), (lx1, ly0), (lx1, ly1)])
        w_lake2 = b.way([(lx1, ly1), (lx0, ly1), (lx0, ly0)])
        w_island = b.closed_rect_way(
            deg(x0d + 1.5), deg(y0d + 1.5), deg(x0d + 2.0), deg(y0d + 2.0)
        )

        iso_i = c % 676
        iso2 = chr(65 + iso_i // 26) + chr(65 + iso_i % 26)
        iso3 = iso2 + chr(65 + c % 26)
        cid = country_id(c)
        name = f"Country {c} (terres)" if c == 0 else f"Country {c}"
        country_tags = [
            ("name", name),
            ("admin_level", "2"),
            ("boundary", "administrative"),
            ("type", "multipolygon"),
        ]
        if c == 1:
            # ISO codes supplied via tag patch instead (patchTags analog).
            tag_patches[cid] = {"ISO3166-1": iso2, "ISO3166-1:alpha3": iso3}
        else:
            country_tags += [("ISO3166-1", iso2), ("ISO3166-1:alpha3", iso3)]
        refs = [(w, 1, "outer") for w in outer_ways]
        refs += [(w_lake1, 1, "inner"), (w_lake2, 1, "inner"), (w_island, 1, "outer")]
        # A label node ref (ignored role) + an ignorable subarea rel ref.
        refs.append((b.node(xm, ym), 0, "label"))
        b.relation(cid, refs, country_tags)

        # Duplicate second representation -> blacklisted (F1 analog).
        dup_id = DUP_BASE + c
        blacklist.add(dup_id)
        b.relation(dup_id, [(w, 1, "outer") for w in outer_ways], country_tags)

        # Départements tiling the country.
        g = spec.dept_grid
        dw = (x1 - x0) // g
        dh = (y1 - y0) // g
        dept_ids = []
        for d in range(g * g):
            dx, dy = d % g, d // g
            rx0, ry0 = x0 + dx * dw, y0 + dy * dh
            rx1 = x1 if dx == g - 1 else x0 + (dx + 1) * dw
            ry1 = y1 if dy == g - 1 else y0 + (dy + 1) * dh
            did = dept_id(c, d)
            dept_ids.append(did)
            dtags = [
                ("name", f"Dept {c}.{d}"),
                ("admin_level", "6"),
                ("boundary", "administrative"),
                ("type", "multipolygon"),
            ]
            if d == 1:
                # Horseshoe: simple (non-self-touching) C-shape ring with
                # a right-opening notch — non-convex, barycenter lands in
                # the notch, exercising the interior-point fallback
                # (centroid.go:100-145). The reference's *test* horseshoe
                # (centroid_test.go:36-55) doubles back on itself and is
                # only meaningful post-buffer(0); it lives in the kernel
                # unit tests, not the assembled world.
                u = (rx1 - rx0) // 3
                v = (ry1 - ry0) // 3
                pts = [
                    (rx0, ry0), (rx0 + 3 * u, ry0), (rx0 + 3 * u, ry0 + v),
                    (rx0 + u, ry0 + v), (rx0 + u, ry0 + 2 * v),
                    (rx0 + 3 * u, ry0 + 2 * v), (rx0 + 3 * u, ry0 + 3 * v),
                    (rx0, ry0 + 3 * v), (rx0, ry0),
                ]
                w_h = b.way(pts, shared=False)
                b.relation(did, [(w_h, 1, "outer")], dtags)
            elif d == 2:
                # Annular: outer rect + centered hole (centroid -> None).
                edges = b.rect_edges(rx0, ry0, rx1, ry1)
                u = (rx1 - rx0) // 3
                v = (ry1 - ry0) // 3
                w_hole = b.closed_rect_way(rx0 + u, ry0 + v, rx1 - u, ry1 - v)
                b.relation(
                    did,
                    [(w, 1, "outer") for w in edges] + [(w_hole, 1, "inner")],
                    dtags,
                )
            elif d == 3:
                edges = b.rect_edges(rx0, ry0, rx1, ry1)
                center = b.node((rx0 + rx1) // 2, (ry0 + ry1) // 2)
                b.relation(
                    did,
                    [(w, 1, "outer") for w in edges]
                    + [(center, 0, "admin_centre")],
                    dtags,
                )
            else:
                edges = b.rect_edges(rx0, ry0, rx1, ry1)
                b.relation(did, [(w, 1, "outer") for w in edges], dtags)

        # Communes inside dept 0.
        cg = spec.commune_grid
        cx1 = x0 + dw
        cy1 = y0 + dh
        cw = (cx1 - x0) // cg
        ch = (cy1 - y0) // cg
        for k in range(cg * cg):
            kx, ky = k % cg, k // cg
            rx0, ry0 = x0 + kx * cw, y0 + ky * ch
            rx1 = cx1 if kx == cg - 1 else x0 + (kx + 1) * cw
            ry1 = cy1 if ky == cg - 1 else y0 + (ky + 1) * ch
            edges = b.rect_edges(rx0, ry0, rx1, ry1)
            if k == 0:
                ktags = [
                    ("name", f"City {c}.{k}"),
                    ("admin_level", "9"),
                    ("place", "city"),
                    ("boundary", "administrative"),
                ]
            else:
                ktags = [
                    ("name", f"Commune {c}.{k}"),
                    ("admin_level", "8"),
                    ("boundary", "administrative"),
                ]
            b.relation(commune_id(c, k), [(w, 1, "outer") for w in edges], ktags)

        # Metropolitan relation: recursive assembly from 2 sub-relations
        # (J3); right half misses its E edge, restored by ring patch (P6).
        left = [
            b.way([(x0, y0), (xm, y0)], shared=False),
            b.way([(xm, y0), (xm, y1)], shared=False),
            b.way([(xm, y1), (x0, y1)], shared=False),
            b.way([(x0, y1), (x0, y0)], shared=False),
        ]
        right = [
            b.way([(xm, y0), (x1, y0)], shared=False),
            b.way([(x1, y1), (xm, y1)], shared=False),
            b.way([(xm, y1), (xm, y0)], shared=False),
            # E edge (x1,y0)->(x1,y1) omitted -> ring patch closes it.
        ]
        sub_l = METRO_SUB_BASE + 2 * c
        sub_r = METRO_SUB_BASE + 2 * c + 1
        b.relation(
            sub_l,
            [(w, 1, "outer") for w in left],
            [("name", f"MetroWest {c}"), ("type", "multilinestring")],
        )
        b.relation(
            sub_r,
            [(w, 1, "outer") for w in right],
            [("name", f"MetroEast {c}"), ("type", "multipolygon")],
        )
        mid = METRO_BASE + c
        recursive_ids.add(mid)
        ring_patches[mid] = [[(x1, y0), (x1, y1)]]
        b.relation(
            mid,
            [(sub_l, 2, "outer"), (sub_r, 2, "outer")],
            [
                ("name", f"Metropolitan {c}"),
                ("admin_level", "3"),
                ("boundary", "administrative"),
            ],
        )

        # Union relation: built from role=subarea dept members (J4), with
        # one dangling ref that must be ignored (geojson.go:500-502).
        uid = UNION_BASE + c
        subarea_ids.add(uid)
        urefs = [(d, 2, "subarea") for d in dept_ids]
        urefs.append((MISSING_SUB_ID, 2, "subarea"))
        b.relation(
            uid,
            urefs,
            [
                ("name", f"Union {c}"),
                ("admin_level", "4"),
                ("boundary", "administrative"),
            ],
        )

        # Rejected relations (F1 branches), sharing dept-0 edge ways.
        rej = REJECT_BASE + 10 * c
        e0 = b.rect_edges(x0, y0, x0 + dw, y0 + dh)
        rrefs = [(w, 1, "outer") for w in e0]
        b.relation(rej + 0, rrefs, [("name", f"Park {c}"), ("admin_level", "4"), ("boundary", "national_park")])
        b.relation(rej + 1, rrefs, [("name", f"Coll {c}"), ("admin_level", "4"), ("type", "collection"), ("boundary", "administrative")])
        b.relation(rej + 2, rrefs, [("admin_level", "4"), ("boundary", "administrative")])  # nameless
        b.relation(rej + 3, rrefs, [("name", f"Deep {c}"), ("admin_level", "10"), ("boundary", "administrative")])
        if c == 0:
            # Unknown boundary value -> error side-output, not a skip.
            b.relation(
                rej + 4,
                rrefs,
                [("name", "Wibble"), ("admin_level", "4"), ("boundary", "wibble")],
            )
            # Localized-name-only relations: silently dropped by the
            # keep filter (RelationTags.Name() reads only "name",
            # geojson.go:259-268 @ 749) but their DIAGNOSTIC name
            # (Relation.Name(), parser.go:395-411) falls back to the
            # single name:* tag — and to "" when several exist. rej+6
            # exercises that two-name:* → "" diagnostic fold (pinned by
            # the with_tag_columns tests); per ignoreRelation order the
            # empty map-name drops it BEFORE the boundary check, so its
            # unknown boundary never reaches the error side-output.
            b.relation(
                rej + 5,
                rrefs,
                [("name:fr", "Parc du Midi"), ("admin_level", "4"),
                 ("boundary", "administrative")],
            )
            b.relation(
                rej + 6,
                rrefs,
                [("name:fr", "Zone X"), ("name:de", "Gebiet X"),
                 ("admin_level", "4"), ("boundary", "wobble")],
            )

    from osm_spark.config import _REFERENCE_ACCEPTED, _REFERENCE_REJECTED

    cfg = EngineConfig(
        blacklist=frozenset(blacklist),
        recursive_ids=frozenset(recursive_ids),
        subarea_ids=frozenset(subarea_ids),
        tag_patches=tag_patches,
        ring_patches=ring_patches,
        boundary_accepted=_REFERENCE_ACCEPTED,
        boundary_rejected=_REFERENCE_REJECTED,
    )
    return b, cfg


NODES_SCHEMA = (
    "id long, lon long, lat long, "
    "tags array<struct<key:string,value:string>>"
)
WAYS_SCHEMA = (
    "id long, nodes array<long>, "
    "tags array<struct<key:string,value:string>>"
)
RELATIONS_SCHEMA = (
    "id long, refs array<struct<ref_id:long,ref_type:int,role:string>>, "
    "tags array<struct<key:string,value:string>>"
)


def world_dataframes(spark, spec: WorldSpec):
    """(nodes, ways, relations, config) as Spark DataFrames."""
    b, cfg = build_world(spec)
    nodes = spark.createDataFrame(
        [(r["id"], r["lon"], r["lat"], [tuple(t.values()) for t in r["tags"]]) for r in b.node_rows],
        NODES_SCHEMA,
    )
    ways = spark.createDataFrame(
        [(r["id"], r["nodes"], []) for r in b.way_rows], WAYS_SCHEMA
    )
    rels = spark.createDataFrame(
        [
            (
                r["id"],
                [(f["ref_id"], f["ref_type"], f["role"]) for f in r["refs"]],
                [(t["key"], t["value"]) for t in r["tags"]],
            )
            for r in b.rel_rows
        ],
        RELATIONS_SCHEMA,
    )
    return nodes, ways, rels, cfg
