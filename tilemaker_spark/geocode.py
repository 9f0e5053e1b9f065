"""Deterministic geocoder: web-page rows -> OSM-shaped feature tables.

The graft's source stage (SURVEY.md §0.1): instead of parsing .osm.pbf
(reference: src/read_pbf.cpp), features are derived from a document
table by pure integer arithmetic on a per-document number — fully
declarative Catalyst column expressions (no Python on this path), and
reproducible in ANSI SQL for the DuckDB oracle and in pure Python for
the golden oracle (tests/oracle.py).

Emits the three stores of FIXTURES.md §2 mirroring the reference's
OSMStore (include/osm_store.h:40-137):
  geo_nodes(node_id, lon, latp, tags, src)       int32-scale x 1e7 coords
  geo_ways(way_id, refs ARRAY<LONG>, tags, src)
  geo_relations(rel_id, outer_refs, inner_refs, tags, src)

Geocode rule (seeded by doc number d):
  h  = (d * 2654435761) % 2^32
  nf = h % 4 features; for k < nf:
  hk = (h + k*1013904223) % 2^32
  h2 = ((hk // 64) * 2654435761 + 40503) % 2^32   (decorrelated from
       hk's low-bit mods — hk % 3 selects kind, so every other variant
       choice must key off h2, not hk)
  kind = hk % 3 (0 point, 1 line, 2 polygon)
  region = (h // 65536) % 64                     doc-level 8x8 block grid
  lon0  = 94710000 + (hk % 1630) * 1000 + (region % 8) * 2000000
  latp0 = 534600000 + ((hk / 7) % 3200) * 1000 + (region // 8) * 2000000
  point: 1 tagged node, tag variant h2 % 6
  line:  nv = 4 + h2 % 9 vertices, integer step+wiggle walk (steps from
         h2), waterway iff h2 % 5 == 0 else highway[h2 % 4]
  poly:  octagon of radius r = 2000 + h2 % 8000 (+ closing vertex),
         tag variant h2 % 3
         h2 % 8 == 0  -> emitted as a RELATION of two open outer ways
                         (exercises J2 ring stitching)
         h2 % 16 == 0 -> plus an inner-octagon hole way (r/3)
IDs: node_id = d*256 + k*32 + j; way_id = d*8 + k*2 (+1);
     rel_id = d*8 + k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M32 = 4294967296
MUL = 2654435761
ADD = 1013904223
H2ADD = 40503

# octagon unit offsets (index j % 8)
OCT_DX = [1, 1, 0, -1, -1, -1, 0, 1]
OCT_DY = [0, 1, 1, 1, 0, -1, -1, -1]

POI_TAGS = [("amenity", "cafe"), ("amenity", "school"), ("shop", "bakery"),
            ("shop", "supermarket"), ("place", "town"), ("amenity", "bank")]
HIGHWAY_VALS = ["primary", "secondary", "residential", "track"]
POLY_TAGS = [("building", "yes"), ("natural", "water"), ("landuse", "forest")]


def doc_num_col(df: DataFrame) -> Column:
    """Per-document number: doc_id if present, else parsed from the url
    pattern https://...{n}/page/{n} (FIXTURES.md §1)."""
    if "doc_id" in df.columns:
        return F.col("doc_id").cast("long")
    return F.regexp_extract(F.col("url"), r"page/(\d+)$", 1).cast("long")


def _h(d: Column) -> Column:
    """(d * MUL) mod 2^32 without int64 overflow at planetary ids.

    The naive product overflows a signed long once d ≥ 2^63/MUL ≈
    3.47e9 — under the north rule's 10^12-document table that is every
    doc beyond the first 0.35%. Reduce mod 2^32 first, then split the
    multiplicand into 16-bit halves so every intermediate stays below
    2^49; the result is bit-identical to the ideal d*MUL mod 2^32 for
    all NONNEGATIVE longs — doc ids by contract (for negative d the
    truncated-% decomposition a != hi*65536 + lo breaks) — and
    therefore to the old expression wherever it didn't overflow: every
    committed golden/oracle value is unchanged. The DuckDB oracle
    (queries_core._H_SQL) mirrors this split form, so query/oracle
    pairs stay comparable at planetary ids. Regression coverage across
    the overflow boundary: tests/test_pipeline.py::test_geocode_hash_overflow."""
    a = d % F.lit(M32)
    hi = F.floor(a / F.lit(65536))
    lo = a % F.lit(65536)
    return (((hi * F.lit(MUL)) % F.lit(65536)) * F.lit(65536)
            + lo * F.lit(MUL)) % F.lit(M32)


def _hk(h: Column, k: Column) -> Column:
    return (h + k * F.lit(ADD)) % F.lit(M32)


def _h2(hk: Column) -> Column:
    """Variant-selection hash, decorrelated from hk's low-bit residues."""
    return (F.floor(hk / 64) * F.lit(MUL) + F.lit(H2ADD)) % F.lit(M32)


def _seed_frame(docs: DataFrame) -> DataFrame:
    """One row per (doc, feature k) with hash, kind and anchor coords."""
    d = doc_num_col(docs)
    src = F.col("url") if "url" in docs.columns else F.col("doc_id").cast("string")
    base = docs.select(d.alias("d"), src.alias("src"), (_h(d)).alias("h"))
    feats = base.select(
        "d", "src", "h",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("k"),
    ).where(F.col("k") < F.col("h") % 4)
    hk = _hk(F.col("h"), F.col("k"))
    # doc-level region: an 8x8 grid of 0.2-degree blocks — pages cluster
    # geographically (like real web corpora), and density per block stays
    # bounded as the corpus grows instead of piling one bbox ever denser
    region = (F.col("h") / 65536).cast("long") % 64
    return feats.select(
        "d", "src", "k",
        hk.alias("hk"),
        _h2(hk).alias("h2"),
        (hk % 3).alias("kind"),
        (F.lit(94710000) + (hk % 1630) * 1000 + (region % 8) * 2000000).cast("int").alias("lon0"),
        (F.lit(534600000) + ((hk / 7).cast("long") % 3200) * 1000
         + (region / 8).cast("long") * 2000000).cast("int").alias("latp0"),
        (F.col("d") * 256 + F.col("k") * 32).alias("nid0"),
        (F.col("d") * 8 + F.col("k") * 2).alias("wid0"),
        (F.col("d") * 8 + F.col("k")).alias("rid"),
    )


def _poi_tags(hk: Column) -> Column:
    key = F.element_at(F.array(*[F.lit(k) for k, _ in POI_TAGS]), (hk % 6 + 1).cast("int"))
    val = F.element_at(F.array(*[F.lit(v) for _, v in POI_TAGS]), (hk % 6 + 1).cast("int"))
    return F.map_from_arrays(F.array(key, F.lit("name")),
                             F.array(val, F.concat(F.lit("poi-"), F.col("d"), F.lit("-"), F.col("k"))))


def _line_tags(hk: Column) -> Column:
    hw = F.element_at(F.array(*[F.lit(v) for v in HIGHWAY_VALS]), (hk % 4 + 1).cast("int"))
    return F.when(
        hk % 5 == 0,
        F.map_from_arrays(F.array(F.lit("waterway")), F.array(F.lit("stream"))),
    ).otherwise(F.map_from_arrays(F.array(F.lit("highway")), F.array(hw)))


def _poly_tags(hk: Column) -> Column:
    key = F.element_at(F.array(*[F.lit(k) for k, _ in POLY_TAGS]), (hk % 3 + 1).cast("int"))
    val = F.element_at(F.array(*[F.lit(v) for _, v in POLY_TAGS]), (hk % 3 + 1).cast("int"))
    return F.map_from_arrays(F.array(key), F.array(val))


def _line_nv(hk: Column) -> Column:
    return (F.lit(4) + hk % 9).cast("int")


def _line_step(hk: Column):
    sx = ((hk % 3) - 1) * 4000
    sy = (((hk / 3).cast("long") % 3) - 1) * 4000
    # avoid fully-degenerate zero step
    sx = F.when((hk % 3 == 1) & ((hk / 3).cast("long") % 3 == 1), F.lit(4000)).otherwise(sx)
    return sx, sy


def _poly_r(hk: Column) -> Column:
    return (F.lit(2000) + hk % 8000).cast("int")


def geocode(docs: DataFrame):
    """-> (geo_nodes, geo_ways, geo_relations) DataFrames.

    Everything below is Catalyst column expressions over
    explode(sequence(...)) — zero Python, zero shuffles (narrow plan
    pushed onto the document scan).
    """
    seeds = _seed_frame(docs)
    hk = F.col("hk")
    h2 = F.col("h2")

    # ---- points: 1 tagged node
    points = seeds.where(F.col("kind") == 0)
    point_nodes = points.select(
        F.col("nid0").alias("node_id"),
        F.col("lon0").alias("lon"),
        F.col("latp0").alias("latp"),
        _poi_tags(h2).alias("tags"),
        F.col("src"),
    )

    # ---- lines: nv shape nodes + 1 way
    lines = seeds.where(F.col("kind") == 1)
    sx, sy = _line_step(h2)
    line_nodes = (
        lines.select("*", F.explode(F.sequence(F.lit(0), _line_nv(h2) - 1)).alias("j"))
        .select(
            (F.col("nid0") + F.col("j")).alias("node_id"),
            (F.col("lon0") + F.col("j") * sx + ((hk * (F.col("j") + 1)) % 7) * 500).cast("int").alias("lon"),
            (F.col("latp0") + F.col("j") * sy + ((hk * (F.col("j") + 2)) % 5) * 500).cast("int").alias("latp"),
            F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>")).alias("tags"),
            F.col("src"),
        )
    )
    line_ways = lines.select(
        F.col("wid0").alias("way_id"),
        F.transform(F.sequence(F.lit(0), _line_nv(h2) - 1), lambda j: F.col("nid0") + j).alias("refs"),
        _line_tags(h2).alias("tags"),
        F.col("src"),
    )

    # ---- polygons: octagon ring (8 nodes; way refs close the ring)
    polys = seeds.where(F.col("kind") == 2)
    r = _poly_r(h2)
    oct_dx = F.array(*[F.lit(v) for v in OCT_DX])
    oct_dy = F.array(*[F.lit(v) for v in OCT_DY])
    poly_nodes = (
        polys.select("*", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("j"))
        .select(
            (F.col("nid0") + F.col("j")).alias("node_id"),
            (F.col("lon0") + F.element_at(oct_dx, F.col("j") + 1) * r).cast("int").alias("lon"),
            (F.col("latp0") + F.element_at(oct_dy, F.col("j") + 1) * r).cast("int").alias("latp"),
            F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>")).alias("tags"),
            F.col("src"),
        )
    )
    # inner-hole nodes for hk % 16 == 0 (smaller octagon, ids nid0+8..15)
    hole_nodes = (
        polys.where(h2 % 16 == 0)
        .select("*", F.explode(F.sequence(F.lit(0), F.lit(7))).alias("j"))
        .select(
            (F.col("nid0") + 8 + F.col("j")).alias("node_id"),
            (F.col("lon0") + F.element_at(oct_dx, F.col("j") + 1) * (r / 3).cast("int")).cast("int").alias("lon"),
            (F.col("latp0") + F.element_at(oct_dy, F.col("j") + 1) * (r / 3).cast("int")).cast("int").alias("latp"),
            F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>")).alias("tags"),
            F.col("src"),
        )
    )

    ring_refs = F.concat(
        F.transform(F.sequence(F.lit(0), F.lit(7)), lambda j: F.col("nid0") + j),
        F.array(F.col("nid0")),
    )
    # plain closed-way polygons (not relation-built)
    simple_polys = polys.where(h2 % 8 != 0)
    simple_poly_ways = simple_polys.select(
        F.col("wid0").alias("way_id"),
        ring_refs.alias("refs"),
        _poly_tags(h2).alias("tags"),
        F.col("src"),
    )

    # relation-built polygons: ring split into two OPEN ways (J2 stitch)
    rel_polys = polys.where(h2 % 8 == 0)
    half1 = F.transform(F.sequence(F.lit(0), F.lit(4)), lambda j: F.col("nid0") + j)  # 0..4
    half2 = F.concat(
        F.transform(F.sequence(F.lit(4), F.lit(7)), lambda j: F.col("nid0") + j),
        F.array(F.col("nid0")),
    )  # 4..7,0
    empty_tags = F.map_from_arrays(F.array().cast("array<string>"), F.array().cast("array<string>"))
    rel_way_a = rel_polys.select(F.col("wid0").alias("way_id"), half1.alias("refs"),
                                 empty_tags.alias("tags"), F.col("src"))
    rel_way_b = rel_polys.select((F.col("wid0") + 1).alias("way_id"), half2.alias("refs"),
                                 empty_tags.alias("tags"), F.col("src"))
    hole_refs = F.concat(
        F.transform(F.sequence(F.lit(0), F.lit(7)), lambda j: F.col("nid0") + 8 + j),
        F.array(F.col("nid0") + 8),
    )
    # hole ways get ids offset by +4 in the doc's way-id space (d*8+k*2+4 is
    # free because k<3 -> wid0 in {d*8, d*8+2, d*8+4}... use global offset)
    hole_ways = rel_polys.where(h2 % 16 == 0).select(
        (F.col("wid0") + F.lit(1) * 0 + F.lit(2 ** 40)).alias("way_id"),
        hole_refs.alias("refs"), empty_tags.alias("tags"), F.col("src"))

    relations = rel_polys.select(
        F.col("rid").alias("rel_id"),
        F.array(F.col("wid0"), F.col("wid0") + 1).alias("outer_refs"),
        F.when(h2 % 16 == 0, F.array(F.col("wid0") + F.lit(2 ** 40)))
         .otherwise(F.array().cast("array<long>")).alias("inner_refs"),
        F.map_concat(
            F.map_from_arrays(F.array(F.lit("type")), F.array(F.lit("multipolygon"))),
            _poly_tags(h2),
        ).alias("tags"),
        F.col("src"),
    )

    geo_nodes = point_nodes.unionByName(line_nodes).unionByName(poly_nodes).unionByName(hole_nodes)
    geo_ways = line_ways.unionByName(simple_poly_ways).unionByName(rel_way_a) \
                        .unionByName(rel_way_b).unionByName(hole_ways)
    return geo_nodes, geo_ways, relations
